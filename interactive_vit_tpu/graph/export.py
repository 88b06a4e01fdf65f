"""AOT graph export: compile a tapped graph into a portable artifact.

The reference can only persist graph TOPOLOGY (``static/graphs/*.json``,
written by ``/root/reference/main/views.py:21-30``); every serve re-runs
torch eager against a live model zoo. Here the staged XLA program ITSELF
becomes the deployment artifact: ``jax.export`` serializes the whole
traced graph program (every node fused into one StableHLO module, the
same program ``Executor.run`` compiles), the captures pytree (model
weights + dynamic node params) rides alongside in the repo's own
safetensors writer, and a JSON manifest pins the calling convention.

Reloading needs NO node registry, NO model zoo, and NO plugin code —
``load_artifact`` is model-code-free by construction (the math is inside
the StableHLO). Dynamic node params (class index, noise seed, conv
matrix, ...) stay runtime arguments: ``ExportedGraph.set_cap`` edits
them between calls without recompiling or re-exporting, the same
interactivity contract the live executor gives.

Artifact layout (a directory):
    program.stablehlo   jax.export serialized bytes
    captures.safetensors  flattened captures pytree (weights + dyn params)
    manifest.json       format version, platforms, input specs, out keys,
                        captures skeleton, provenance
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax

from interactive_vit_tpu.graph.executor import (
    Executor, TapSpec, resolve_taps, shape_struct,
)
from interactive_vit_tpu.graph.ir import Graph, GraphError
from interactive_vit_tpu.utils import safetensors_io

FORMAT = 1
PROGRAM_FILE = "program.stablehlo"
CAPS_FILE = "captures.safetensors"
MANIFEST_FILE = "manifest.json"


class ExportError(Exception):
    """Artifact construction / loading failure (one error type, like
    SafetensorsError/WireError — callers branch on the class)."""


# -- PartitionSpec <-> JSON ---------------------------------------------------

def _spec_to_json(spec) -> list:
    return [list(e) if isinstance(e, (list, tuple)) else e for e in spec]


def _spec_from_json(obj: list):
    from jax.sharding import PartitionSpec as P

    return P(*[tuple(e) if isinstance(e, list) else e for e in obj])


# -- captures pytree <-> (skeleton json, flat tensor dict) -------------------

def _flatten_caps(caps: Any, prefix: str, flat: Dict[str, np.ndarray]):
    """Recursively describe ``caps`` as a JSON skeleton; array leaves are
    moved into ``flat`` under path keys. Only dict/list/tuple containers
    and array-like leaves appear in a captures pytree (NodeKind.captures
    returns arrays; the executor adds stacked dicts) — anything else is a
    contract violation worth failing loudly on."""
    if isinstance(caps, dict):
        return {"t": "d",
                "v": {k: _flatten_caps(v, f"{prefix}.{k}", flat)
                      for k, v in caps.items()}}
    if isinstance(caps, (list, tuple)):
        return {"t": "l" if isinstance(caps, list) else "u",
                "v": [_flatten_caps(v, f"{prefix}.{i}", flat)
                      for i, v in enumerate(caps)]}
    try:
        arr = np.asarray(caps)
    except Exception as err:  # noqa: BLE001 — one error type
        raise ExportError(
            f"capture leaf {prefix!r} is not array-like: {err}") from err
    if prefix in flat:
        # "."-joined path keys can alias (dict keys may themselves
        # contain dots, e.g. "blocks.0"): silently overwriting would
        # deploy the WRONG weights with no error anywhere
        raise ExportError(
            f"capture path key collision at {prefix!r} — two distinct "
            f"leaves flatten to the same name")
    flat[prefix] = arr
    # dtype rides in the skeleton: the safetensors reader deliberately
    # upcasts BF16 to f32 (utils/safetensors_io._bf16_bits_to_f32), but
    # jax.export enforces the exported capture dtypes at call time — a
    # bf16 artifact would otherwise be unloadable
    return {"t": "a", "v": prefix, "dt": str(arr.dtype)}


def _unflatten_caps(skel: Any, flat: Dict[str, np.ndarray]):
    t = skel["t"]
    if t == "d":
        return {k: _unflatten_caps(v, flat) for k, v in skel["v"].items()}
    if t in ("l", "u"):
        seq = [_unflatten_caps(v, flat) for v in skel["v"]]
        return seq if t == "l" else tuple(seq)
    if t == "a":
        try:
            arr = flat[skel["v"]]
        except KeyError as err:
            raise ExportError(
                f"captures file is missing tensor {skel['v']!r}") from err
        want = skel.get("dt")
        if want and str(arr.dtype) != want:
            import ml_dtypes  # noqa: F401 — registers bfloat16 with numpy

            arr = arr.astype(np.dtype(want))
        return arr
    raise ExportError(f"bad captures skeleton tag {t!r}")


# -- export -------------------------------------------------------------------

def _generic_parse(s: str, like: np.ndarray):
    """(mode, value) rebuilding a dynamic capture leaf from its wire
    param string WITHOUT the node kind's code, or (None, None).

    Covers the interactive-edit surface: scalar ints/floats (cos A/b,
    noise seed, saliency class, patch_sim row/col) and base64 f32 arrays
    (the conv2d matrix). Verified against the kind's real ``captures()``
    at export time — only verified params become servably editable."""
    import base64 as _b64

    like = np.asarray(like)
    try:
        if like.ndim == 0:
            if np.issubdtype(like.dtype, np.integer):
                return "int", np.asarray(int(float(s)), like.dtype)
            if np.issubdtype(like.dtype, np.floating):
                return "float", np.asarray(float(s), like.dtype)
            return None, None
        raw = np.frombuffer(_b64.b64decode(s), "<f4")
        if raw.size == like.size:
            return "b64f32", raw.reshape(like.shape).astype(
                like.dtype, copy=False)
    except Exception:  # noqa: BLE001 — unparseable = not editable
        pass
    return None, None


def parse_editable(mode: str, s: str, like) -> np.ndarray:
    """Apply a recorded edit mode (the serve-from-artifact hot path).

    ``like`` may be a DEVICE array: ``ExportedGraph`` device_puts every
    capture leaf at load, and this runs per edited param on the HTTP
    handler thread. Only ``.shape``/``.dtype`` are read (both are host
    metadata on jax Arrays) — materializing the old value here would be
    a cross-thread device->host fetch per edit request (a tunnel round
    trip + the plugin's per-transfer host leak on this rig; CLAUDE.md
    traps #5/#9, advisor r4 medium)."""
    import base64 as _b64

    shape, dtype = tuple(like.shape), np.dtype(like.dtype)
    if mode == "int":
        return np.asarray(int(float(s)), dtype)
    if mode == "float":
        return np.asarray(float(s), dtype)
    if mode == "b64f32":
        return np.frombuffer(_b64.b64decode(s), "<f4").reshape(
            shape).astype(dtype, copy=False)
    raise ExportError(f"unknown edit mode {mode!r}")


def _serving_metadata(graph: Graph, reg, caps_arg) -> Dict[str, Any]:
    """Everything ``serving/export_app.py`` needs to run the reference's
    HTTP surface with NO registry/model code: the exported request shape
    (nodes + wired edges), which params are dynamic (excluded from the
    match), which of those are generically editable (verified per leaf),
    and per-name IO/contents for ``/description`` + ``/contents``."""
    nodes_meta = [{"name": n.name, "params": dict(n.params)}
                  for n in graph.nodes]
    edges_meta = []
    for n in graph.nodes:
        for ch, e in n.inputs.items():
            if e.src is not None:
                edges_meta.append(
                    [e.src.node.index, e.src.channel, n.index, ch])
    dynamic: Dict[str, list] = {}
    editable: Dict[str, Dict[str, str]] = {}
    node_io: Dict[str, Dict[str, Any]] = {}
    node_meta: List[Dict[str, Any]] = []
    for n in graph.nodes:
        try:
            kind = reg.get_node(n.name)
        except KeyError:
            continue
        # per-NODE metadata: contents/io are params-dependent (a slice
        # node renders its own spec), so /description + /contents match
        # the query params to the right exported node
        try:
            node_meta.append({"name": n.name, "params": dict(n.params),
                              "io": kind.io(n.params),
                              "contents": kind.contents(n.params)})
        except Exception:  # noqa: BLE001 — metadata is best-effort
            pass
        if n.name not in node_io:
            try:
                node_io[n.name] = {"io": kind.io(n.params),
                                   "contents": kind.contents(n.params)}
            except Exception:  # noqa: BLE001 — metadata is best-effort
                pass
        dyn = kind.dynamic_params()
        if not dyn:
            continue
        dynamic[str(n.index)] = sorted(dyn)
        caps = caps_arg.get(str(n.index))
        if not isinstance(caps, dict):
            continue
        dck = kind.dynamic_capture_keys()
        keys = set(caps) if dck is None else (set(caps) & set(dck))
        modes: Dict[str, str] = {}
        for k in keys:
            if k not in n.params or not hasattr(caps[k], "dtype"):
                continue
            mode, val = _generic_parse(n.params[k], caps[k])
            if mode is not None and np.array_equal(
                    np.asarray(val), np.asarray(caps[k])):
                modes[k] = mode
        if modes:
            editable[str(n.index)] = modes
    return {"graph_nodes": nodes_meta, "graph_edges": edges_meta,
            "dynamic_params": dynamic, "editable": editable,
            "node_io": node_io, "node_meta": node_meta}


def export_graph(
    graph: Graph,
    out_dir: str,
    taps: TapSpec = "primary",
    executor: Optional[Executor] = None,
    platforms: Optional[Sequence[str]] = None,
    provenance: Optional[Dict[str, Any]] = None,
    client_graph: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Stage ``graph`` exactly as ``Executor.run`` would and serialize the
    program + captures + manifest into ``out_dir``. Returns the manifest.

    ``platforms``: lowering targets (default: the current backend). Note
    Pallas kernel-backed node fns lower only for their native platform;
    cross-platform export of a kernel-dispatched model requires building
    the model with kernels off (the CPU dispatch default).
    """
    ex = executor or Executor()
    ex.validate(graph)
    tap_set = resolve_taps(graph, taps, ex.reg)
    staged, out_keys, caps_arg = ex._stage(graph, tap_set)

    # zero input edges is legal: generator graphs (noise/const sources)
    # export as nullary programs
    input_edges = graph.input_edges()
    mesh = getattr(ex, "mesh", None)
    mesh_json = None
    cap_shardings = None
    if mesh is not None:
        # mesh-sharded deployment: bake the executor's own placement
        # rules (TP-sharded captures per parallel/mesh.param_spec,
        # replicated single-request inputs) into the exported program's
        # in_shardings; the loader rebuilds an identical mesh and places
        # arguments the same way, so GSPMD collectives ride ICI exactly
        # as in live mesh serving
        from jax.sharding import NamedSharding, PartitionSpec as P

        from interactive_vit_tpu.parallel.mesh import param_shardings

        cap_shardings = param_shardings(caps_arg, mesh)
        mesh_json = {"axes": list(mesh.axis_names),
                     "shape": [int(mesh.shape[a]) for a in mesh.axis_names]}

        def in_struct(t):
            s = shape_struct(t)
            return jax.ShapeDtypeStruct(
                s.shape, s.dtype, sharding=NamedSharding(mesh, P()))

        in_structs = tuple(in_struct(e.tensor) for _, _, e in input_edges)
        cap_structs = jax.tree.map(
            lambda a, sh: jax.ShapeDtypeStruct(
                np.shape(a), np.asarray(a).dtype, sharding=sh),
            caps_arg, cap_shardings)
    else:
        in_structs = tuple(shape_struct(e.tensor) for _, _, e in input_edges)
        cap_structs = jax.tree.map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype),
            caps_arg)

    try:
        exp = jax.export.export(
            jax.jit(staged),
            platforms=list(platforms) if platforms else None,
        )(in_structs, cap_structs)
        blob = exp.serialize()
    except ExportError:
        raise
    except Exception as err:  # noqa: BLE001 — one error type out
        raise ExportError(f"program export failed: {err}") from err

    flat: Dict[str, np.ndarray] = {}
    skel = _flatten_caps(caps_arg, "c", flat)
    cap_specs = None
    if cap_shardings is not None:
        cap_specs = {}

        def walk_specs(sh, prefix):
            if isinstance(sh, dict):
                for k, v in sh.items():
                    walk_specs(v, f"{prefix}.{k}")
            elif isinstance(sh, (list, tuple)):
                for i, v in enumerate(sh):
                    walk_specs(v, f"{prefix}.{i}")
            else:
                cap_specs[prefix] = _spec_to_json(sh.spec)

        walk_specs(cap_shardings, "c")

    manifest = {
        "format": FORMAT,
        "jax_version": jax.__version__,
        "platforms": list(exp.platforms),
        "inputs": [
            {"node": n.index, "name": n.name, "channel": ch,
             "shape": list(np.shape(e.tensor)),
             "dtype": str(shape_struct(e.tensor).dtype)}
            for n, ch, e in input_edges
        ],
        "out_keys": [[i, ch] for i, ch in out_keys],
        "captures_skeleton": skel,
        "mesh": mesh_json,
        "capture_specs": cap_specs,
        "provenance": provenance or {},
    }
    # serving metadata: serve-from-artifact mode (serving/export_app.py)
    # matches requests against the exported shape and routes verified
    # dynamic-param edits — all with no registry/model code at serve time
    manifest.update(_serving_metadata(graph, ex.reg, caps_arg))
    # self-test record: seeded inputs -> per-output summary statistics,
    # so a deployed fleet can verify artifact integrity (program bytes +
    # captures + calling convention) with NO model code and NO live
    # executor (`ExportedGraph.selftest`; ivt-run-exported --selftest).
    # Summary stats, not checksums: backend/lowering differences move
    # floats by rounding, never by distribution.
    if mesh is None:
        try:
            import jax.numpy as jnp

            rng = np.random.default_rng(0)
            feeds = tuple(
                jnp.asarray(rng.random([int(d) for d in np.shape(
                    e.tensor)]).astype(np.float32),
                    shape_struct(e.tensor).dtype)
                for _, _, e in input_edges)
            flat_out = jax.jit(staged)(feeds, caps_arg)
            stats = {}
            for key, v in flat_out.items():  # keys are "i/ch" strings
                a = np.asarray(v, np.float32)
                stats[key] = {
                    "shape": list(a.shape),
                    "mean": float(a.mean()),
                    "std": float(a.std()),
                    "absmax": float(np.abs(a).max()),
                }
            manifest["selftest"] = {"input_seed": 0, "stats": stats}
        except Exception as err:  # noqa: BLE001 — selftest is optional
            manifest["selftest"] = None
            logger_msg = f"selftest record skipped: {err}"
            print(logger_msg)
    if client_graph is not None:
        # the original saved-graph JSON (viewers included) rides along so
        # the export server's /list_graphs + /load_graph can boot the
        # frontend against this exact workflow
        manifest["client_graph"] = client_graph

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, PROGRAM_FILE), "wb") as f:
        f.write(blob)
    safetensors_io.save_file(
        flat, os.path.join(out_dir, CAPS_FILE),
        metadata={"format": str(FORMAT)})
    with open(os.path.join(out_dir, MANIFEST_FILE), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# -- load / run ---------------------------------------------------------------

class ExportedGraph:
    """A reloaded artifact: ``__call__(*inputs)`` runs the program.

    Model-code-free: only jax + the artifact bytes. Dynamic node params
    live in the captures pytree — ``set_cap(node_index, name, value)``
    edits one (e.g. the saliency class index, a conv matrix) and the next
    call uses it, no recompile (captures are runtime arguments, the same
    design the live executor uses)."""

    INPUT_CACHE_BUDGET = 64 * 1024 * 1024

    def __init__(self, path: str):
        from collections import OrderedDict

        self.path = path
        self._in_cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self._in_cache_bytes = 0
        self._jitted_call = None  # built lazily on first __call__
        try:
            with open(os.path.join(path, MANIFEST_FILE)) as f:
                self.manifest = json.load(f)
        except OSError as err:
            raise ExportError(f"{path}: no readable manifest: {err}") from err
        if self.manifest.get("format") != FORMAT:
            raise ExportError(
                f"{path}: unsupported artifact format "
                f"{self.manifest.get('format')!r} (this build reads "
                f"{FORMAT})")
        try:
            with open(os.path.join(path, PROGRAM_FILE), "rb") as f:
                blob = f.read()
        except OSError as err:
            raise ExportError(f"{path}: no program bytes: {err}") from err
        try:
            self._exp = jax.export.deserialize(bytearray(blob))
        except Exception as err:  # noqa: BLE001
            raise ExportError(
                f"{path}: program deserialization failed: {err}") from err
        flat = safetensors_io.load_file(os.path.join(path, CAPS_FILE))
        self.caps = _unflatten_caps(
            self.manifest["captures_skeleton"], flat)
        self.out_keys: List[Tuple[int, str]] = [
            (int(i), ch) for i, ch in self.manifest["out_keys"]]
        self.mesh = None
        self._cap_specs: Optional[Dict[str, list]] = None
        mesh_json = self.manifest.get("mesh")
        if mesh_json:
            need = int(np.prod(mesh_json["shape"]))
            devs = jax.devices()
            if len(devs) < need:
                raise ExportError(
                    f"{path}: program was exported for a "
                    f"{mesh_json['shape']} mesh ({need} devices); this "
                    f"host has {len(devs)}")
            # rebuild through the SAME topology-aware constructor the
            # exporter used (mesh_utils.create_device_mesh): a raw
            # devices()[:n].reshape would put axis neighbors on
            # non-adjacent chips and collectives would leave ICI
            from interactive_vit_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh(
                dict(zip(mesh_json["axes"], mesh_json["shape"])),
                devices=devs[:need])
            if list(self.mesh.axis_names) != list(mesh_json["axes"]):
                raise ExportError(
                    f"{path}: mesh axes {mesh_json['axes']} are not "
                    f"reconstructible (make_mesh builds "
                    f"{list(self.mesh.axis_names)})")
            self._cap_specs = self.manifest["capture_specs"] or {}
            self.caps = self._place(self.caps, "c")
        else:
            # single-device: captures live ON DEVICE from load. Leaving
            # them as host numpy re-uploads the whole weights tree every
            # call (vit_b16: 173 MB/request ≈ 3.3 s over the tunnel —
            # measured; the live executor device_puts captures once too)
            self.caps = jax.device_put(self.caps)

    def _device_input(self, arr: np.ndarray):
        """Content-addressed device placement for call inputs — the same
        rule the live executor applies (executor._device_input): repeated
        calls with an unchanged image must not pay a fresh host->device
        transfer (one 600 KB device_put is ~39 ms over the tunnel)."""
        import hashlib

        a = np.ascontiguousarray(arr)
        key = (hashlib.blake2b(a.tobytes(), digest_size=16).digest(),
               a.shape, str(a.dtype))
        hit = self._in_cache.get(key)
        if hit is not None:
            self._in_cache.move_to_end(key)
            return hit
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            # single-request inputs replicate, matching the executor's
            # mesh placement (_place_inputs batched=False)
            dev = jax.device_put(a, NamedSharding(self.mesh, P()))
        else:
            dev = jax.device_put(a)
        self._in_cache[key] = dev
        self._in_cache_bytes += a.nbytes
        while self._in_cache_bytes > self.INPUT_CACHE_BUDGET:
            _, old = self._in_cache.popitem(last=False)
            self._in_cache_bytes -= old.nbytes
        return dev

    def _leaf_sharding(self, path: str):
        from jax.sharding import NamedSharding, PartitionSpec as P

        spec = (self._cap_specs or {}).get(path)
        return NamedSharding(
            self.mesh, _spec_from_json(spec) if spec else P())

    def _place(self, caps, prefix: str):
        """Device-put every capture leaf per its recorded PartitionSpec
        (the executor's own TP layout, baked at export time)."""
        if isinstance(caps, dict):
            return {k: self._place(v, f"{prefix}.{k}")
                    for k, v in caps.items()}
        if isinstance(caps, (list, tuple)):
            seq = [self._place(v, f"{prefix}.{i}")
                   for i, v in enumerate(caps)]
            return type(caps)(seq)
        return jax.device_put(caps, self._leaf_sharding(prefix))

    @property
    def input_specs(self) -> List[Dict[str, Any]]:
        return self.manifest["inputs"]

    def set_cap(self, node_index: int, name: str, value) -> None:
        """Edit one dynamic node param (shape/dtype must match the
        exported one — the program's calling convention is static)."""
        node = self.caps.get(str(node_index))
        if node is None or not isinstance(node, dict) or name not in node:
            have = sorted(
                f"{i}:{k}" for i, c in self.caps.items()
                if isinstance(c, dict) for k in c)
            raise ExportError(
                f"no capture {node_index}:{name}; artifact has {have}")
        old = node[name]
        if not hasattr(old, "dtype"):
            raise ExportError(
                f"capture {node_index}:{name} is a weights subtree, not a "
                f"scalar/array dynamic param — only leaf params are "
                f"editable")
        arr = np.asarray(value, dtype=old.dtype)
        if arr.shape != old.shape:
            raise ExportError(
                f"capture {node_index}:{name} has shape {old.shape}, "
                f"got {arr.shape} (shapes are baked into the program)")
        if self.mesh is not None:
            arr = jax.device_put(
                arr, self._leaf_sharding(f"c.{node_index}.{name}"))
        node[name] = arr

    def __call__(self, *inputs, caps: Optional[Any] = None,
                 want: Optional[set] = None,
                 ) -> Dict[int, Dict[str, np.ndarray]]:
        """Run the program. ``caps`` overrides the captures pytree for
        THIS call only (serve-from-artifact routes per-request dynamic
        param edits this way — concurrent requests with different edits
        must not race on the shared ``self.caps``).

        ``want``: optional set of ``(node_index, channel)`` keys to
        FETCH from the device — the program still computes every
        exported output (the artifact is one frozen executable; there
        is no per-request DCE), but only the requested taps pay the
        device->host transfer. On a tunneled device that transfer
        dominates: fetching all 16 vit_b16 primary outputs measured
        ~3.4 s/request vs ~50 ms for the head logits alone."""
        specs = self.manifest["inputs"]
        if len(inputs) != len(specs):
            raise ExportError(
                f"program takes {len(specs)} inputs "
                f"({[s['name'] for s in specs]}), got {len(inputs)}")
        args = []
        for x, spec in zip(inputs, specs):
            arr = np.asarray(x)
            if list(arr.shape) != spec["shape"]:
                raise ExportError(
                    f"input for {spec['name']}:{spec['channel']} has "
                    f"shape {list(arr.shape)}, program was exported for "
                    f"{spec['shape']}")
            arr = arr.astype(spec["dtype"], copy=False)
            args.append(self._device_input(arr))
        try:
            # THROUGH jit, not Exported.call directly: the raw call
            # re-stages its wrapper on every invocation (~3.3 s/request
            # of host work measured on vit_b16 — 70x the live server's
            # 46 ms). jit traces it once and then dispatches the cached
            # executable.
            if self._jitted_call is None:
                self._jitted_call = jax.jit(
                    lambda inputs, c: self._exp.call(inputs, c))
            flat = self._jitted_call(
                tuple(args), self.caps if caps is None else caps)
        except Exception as err:  # noqa: BLE001
            raise ExportError(f"exported program failed: {err}") from err
        if want is not None:
            flat = {k: v for k, v in flat.items()
                    if tuple(k.split("/", 1)) in
                    {(str(i), ch) for i, ch in want}}
        return Executor.split_single(jax.device_get(flat))


    def selftest(self, rel_tol: float = 5e-2) -> Dict[str, Any]:
        """Self-contained integrity check: replay the manifest's seeded
        inputs and compare per-output summary statistics (mean/std/
        absmax) against the values recorded at export — corrupt capture
        bytes, a truncated program, or a broken calling convention all
        move the distributions wildly, while backend/lowering float
        rounding does not. NO model code, NO live executor needed (the
        deploy-fleet counterpart of ``ivt-export --check``).

        Returns {"ok": bool, "checked": n, "worst": {...}} or raises
        ExportError when the artifact has no selftest record."""
        rec = self.manifest.get("selftest")
        if not rec:
            raise ExportError(
                f"{self.path}: no selftest record in the manifest "
                f"(mesh artifacts and pre-r4 exports don't carry one)")
        rng = np.random.default_rng(int(rec["input_seed"]))
        feeds = [rng.random(s["shape"]).astype(np.float32)
                 for s in self.manifest["inputs"]]
        outs = self(*feeds)
        worst = {"key": None, "metric": None, "rel": 0.0}
        checked = 0
        for key, exp in rec["stats"].items():
            i, ch = key.split("/", 1)
            a = np.asarray(outs[int(i)][ch], np.float32)
            if list(a.shape) != exp["shape"]:
                return {"ok": False, "checked": checked,
                        "worst": {"key": key, "metric": "shape",
                                  "got": list(a.shape),
                                  "want": exp["shape"]}}
            scale = max(abs(exp["absmax"]), 1e-6)
            for metric, got in (("mean", float(a.mean())),
                                ("std", float(a.std())),
                                ("absmax", float(np.abs(a).max()))):
                rel = abs(got - exp[metric]) / scale
                if rel > worst["rel"]:
                    worst = {"key": key, "metric": metric,
                             "rel": rel, "got": got,
                             "want": exp[metric]}
            checked += 1
        return {"ok": worst["rel"] <= rel_tol, "checked": checked,
                "worst": worst}


def load_artifact(path: str) -> ExportedGraph:
    return ExportedGraph(path)
