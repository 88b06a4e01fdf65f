"""Model plugin tier: expose a functional jax model as tappable graph nodes.

Analog of the reference's ``Model`` / ``ModelNode`` pair
(``/root/reference/main/context.py:38-129``), which enumerated a torch
module's leaf submodules and registered each as a node kind named
``"<model>:<submodule.path>"``. Here a model is an ordered list of named pure
functions over param subtrees (see ``models/vit.py:layer_fns``); each becomes
a ``LayerNodeKind`` whose weights travel as executor *captures* (jit
arguments), so a whole chain of layer nodes stages into one fused XLA program
with weights resident in HBM.

Extra tap channels: a layer may declare outputs beyond the flowing "o"
(attention blocks add "attn"). The reference's IO contract was always
``{ins:["o"], outs:["o"]}`` (``context.py:94-96``); this is a compatible
superset — clients that only wire "o" see exactly the old behavior.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

from interactive_vit_tpu.graph.registry import NodeKind, Registry
from interactive_vit_tpu.wire.schema import GraphLibrary, generate_model_graph_json

logger = logging.getLogger(__name__)

# (layer_name, extra_out_channels, fn(params_subtree, ins_dict) -> outs_dict)
LayerSpec = Tuple[str, List[str], Callable]


def dequant_grad_twin(fn: Callable) -> Callable:
    """Wrap a layer fn for gradient replays over a QUANTIZED param tree:
    int8 leaf-dicts dequantize inline (a traced int8*scale multiply) so
    the replayed math is clean dense bf16 — full gradient flow, where the
    serving path's activation-quantization round() would zero it a.e."""
    import functools

    from interactive_vit_tpu.ops.quant import (
        dequantize_weight, is_quantized, is_w8a8,
    )

    def dq(obj, dtype):
        if is_quantized(obj) or is_w8a8(obj):
            # the model's activation dtype, NOT f32: an f32 weight would
            # make mm_precision pick HIGHEST, whose 6-pass emulation
            # compiles pathologically on this backend at model scale
            return dequantize_weight(obj, dtype=dtype)
        if isinstance(obj, dict):
            return {k: dq(v, dtype) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return type(obj)(dq(v, dtype) for v in obj)
        return obj

    def act_dtype(obj):
        import jax
        import jax.numpy as jnp

        for leaf in jax.tree.leaves(obj):
            dt = getattr(leaf, "dtype", None)
            if dt is not None and jnp.issubdtype(dt, jnp.floating):
                return dt
        return jnp.float32

    @functools.wraps(fn)
    def run(p, ins, **kw):
        return fn(dq(p, act_dtype(p)), ins, **kw)

    return run


class LayerNodeKind(NodeKind):
    """One model layer as a graph node kind (analog of ``ModelNode``).

    ``fold_group``: non-None marks this kind as *pipeline-foldable* — all
    kinds sharing a group string run the SAME computation parameterized
    only by their captures (e.g. every ``vit_b16:blocks.i``). The executor
    may replace an untapped chain of same-group nodes with one GPipe
    schedule over a mesh "stage" axis (``parallel/pipeline.py``).
    """

    def __init__(self, model: "JaxModel", layer_name: str,
                 extra_outs: List[str], fn: Callable,
                 fold_group: Optional[str] = None,
                 grad_fn_impl: Optional[Callable] = None):
        super().__init__(model.prefix() + layer_name)
        self.model = model
        self.layer_name = layer_name
        self._extra = list(extra_outs)
        self._fn = fn
        self.fold_group = fold_group
        # differentiable twin: same layer math on the XLA path (no Pallas
        # kernels — they have no AD rules — and quantized weights
        # dequantized inline). Used ONLY inside gradient replays
        # (executor eval_one in_replay); None = fn is already safe.
        self._grad_fn_impl = grad_fn_impl

    def fold_fn(self) -> Optional[Callable]:
        """(params, x) -> y single-layer callable for pipeline folding;
        extras disabled (folding only applies to untapped chains)."""
        if self.fold_group is None:
            return None
        f, kw = self._fn, self._kw(frozenset())

        def layer(p, x):
            return f(p, {"o": x}, **kw)["o"]

        return layer

    def io(self, params):
        # layers with an "r" (rollout) extra also ACCEPT an optional "r"
        # input: the rollout flows along the chain like the activation
        ins = ["o"] + (["r"] if "r" in self._extra else [])
        return {"ins": ins, "outs": ["o"] + self._extra}

    def extra_outs(self, params):
        return list(self._extra)

    # the rollout-carry input is optional (executor skips the missing-input
    # check for exactly this channel; "o" stays required so an unwired
    # block still gets the structured "missing input 'o'" attribution)
    @property
    def optional_inputs(self):
        return {"r"} if "r" in self._extra else frozenset()

    def contents(self, params):
        html = (f"<p>{self.get_name()}</p> "
                f"<p>{self.model.describe(self.layer_name)}</p>")
        if "attn" in self._extra:
            # selective head taps (VERDICT r2 #3): a JSON head list limits
            # the emitted attention maps to those heads ([B,|sel|,N,N]);
            # empty = all heads. NetNode binds data-param inputs.
            import html as _html

            cur = params.get("attn_heads", "")
            html += (f"<label>tap heads <input data-param=\"attn_heads\" "
                     f"type=\"text\" size=\"8\" "
                     f"value=\"{_html.escape(cur)}\" "
                     f"placeholder=\"all, e.g. [0,5]\"></label>")
        return html

    def captures(self, params):
        caps = self.model.layer_params(self.layer_name)
        # Executor convention: None means "stateless"; use an empty dict
        # sentinel only when there really are no params.
        return caps if caps else None

    def fn(self, params):
        return self._bind(self._fn, params)

    def grad_safe_fn(self, params):
        """``fn`` for gradient replays: jax.grad re-traces the node, so
        the math must be differentiable — Pallas custom calls (no AD
        rule) and activation-quantized matmuls (round(): zero gradient
        a.e.) are swapped for their XLA twin when the model provides
        one (``JaxModel(grad_layers=...)``)."""
        return self._bind(self._grad_fn_impl or self._fn, params)

    def _bind(self, f, params):
        taps = set((params.get("__taps__") or "").split(","))
        want = frozenset(taps & set(self._extra))

        if self.captures(params) is None:
            def run_stateless(ins):
                outs = f({}, ins, **self._kw(want, params))
                return self._filter(outs, want)
            return run_stateless

        def run(ins, caps):
            outs = f(caps, ins, **self._kw(want, params))
            return self._filter(outs, want)

        return run

    @functools.cached_property
    def _takes_node_params(self) -> bool:
        """Layer fns opting into node params (e.g. attn_heads) declare a
        ``node_params`` keyword; detected once per kind."""
        import inspect

        try:
            return "node_params" in inspect.signature(self._fn).parameters
        except (TypeError, ValueError):
            return False

    def _kw(self, want: frozenset, params=None) -> Dict[str, Any]:
        # layers with extra taps accept the wanted-extras set; plain don't
        kw: Dict[str, Any] = {"want": want} if self._extra else {}
        if params is not None and self._takes_node_params:
            kw["node_params"] = params
        return kw

    def _filter(self, outs: Dict[str, Any], want: frozenset) -> Dict[str, Any]:
        return {ch: v for ch, v in outs.items()
                if ch == "o" or ch in want}


class JaxModel:
    """A named model: ordered layers + params, registerable as node kinds.

    Parity with the reference ``Model`` (``context.py:38-112``):
    ``list_node_names``, per-layer ``contents``/``io``/compute, and
    auto-generation of the chained graph JSON into the graph library on
    first registration (``context.py:98-108``).
    """

    def __init__(
        self,
        name: str,
        layers: Sequence[LayerSpec],
        params: Any,
        layer_params_fn: Callable[[Any, str], Any],
        descriptions: Optional[Dict[str, str]] = None,
        category_names: Optional[List[str]] = None,
        fold_groups: Optional[Dict[str, str]] = None,
        grad_layers: Optional[Dict[str, Callable]] = None,
        extra_kinds: Optional[List["NodeKind"]] = None,
    ):
        self.name = name
        self.layers = list(layers)
        self.params = params
        self._layer_params_fn = layer_params_fn
        self.descriptions = descriptions or {}
        self.category_names = category_names
        # layer_name -> fold group (pipeline-foldable uniform layers)
        self.fold_groups = fold_groups or {}
        # layer_name -> differentiable twin fn (same LayerSpec fn
        # contract) for gradient replays; layers absent here replay
        # through their regular fn
        self.grad_layers = grad_layers or {}
        # fully-formed NodeKinds registered WITH the model but outside
        # the chained layer sequence (e.g. the ViT family's ``:attrib``
        # attention-attribution node, models/attrib.py)
        self.extra_kinds = list(extra_kinds or [])

    def prefix(self) -> str:
        return self.name + ":"

    def get_name(self) -> str:
        return self.name

    def list_node_names(self) -> List[str]:
        return [self.prefix() + lname for lname, _, _ in self.layers]

    def layer_params(self, layer_name: str) -> Any:
        return self._layer_params_fn(self.params, layer_name)

    def describe(self, layer_name: str) -> str:
        return self.descriptions.get(layer_name, layer_name)

    def generate_graph_json(self) -> Dict:
        """Chained layer nodes in a sqrt-grid; appends a category sink when
        the model has class names (parity with ``vgg16.py:16-29``)."""
        obj = generate_model_graph_json(self.list_node_names())
        if self.category_names is not None:
            i = len(obj["nodes"])
            w = max(1, int(i ** 0.5))
            obj["nodes"].append(
                {
                    "instance": {"kind": "category", "cats": self.category_names},
                    "pos": {"x": (i % w) * 200, "y": (i // w) * 200},
                }
            )
            obj["edges"].append(
                {
                    "in_port": {"node": i - 1, "channel": "o"},
                    "out_port": {"node": i, "channel": "o"},
                }
            )
        return obj

    def generate_saliency_graph_json(self) -> Dict:
        """The model chain plus the gradient-tap workflow: a ``saliency``
        node (Grad×input heatmap of the winning class wrt the image) and
        a ``dream`` node (gradient-ascent feature visualization), each
        feeding an ``img_view``. Only meaningful for classifier models
        (raises if the chain has no ``:head`` layer). No reference analog
        — the reference server ran under ``torch.no_grad``."""
        obj = self.generate_graph_json()
        head = next(
            (i for i, n in enumerate(obj["nodes"])
             if n["instance"].get("endpoint", "").endswith(":head")),
            None,
        )
        if head is None:
            raise ValueError(f"{self.name} has no :head node — saliency "
                             f"demo needs a classifier chain")
        hx = obj["nodes"][head]["pos"]["x"]
        hy = obj["nodes"][head]["pos"]["y"]

        def add(inst, dx, dy):
            obj["nodes"].append(
                {"instance": inst, "pos": {"x": hx + dx, "y": hy + dy}})
            return len(obj["nodes"]) - 1

        def wire(a, ach, b, bch):
            obj["edges"].append({"in_port": {"node": a, "channel": ach},
                                 "out_port": {"node": b, "channel": bch}})

        sal = add({"kind": "net_node", "endpoint": "saliency",
                   "params": {"target": "max", "mode": "gradxinput"}},
                  220, 120)
        sal_view = add({"kind": "img_view"}, 440, 120)
        wire(head, "o", sal, "o")
        wire(sal, "o", sal_view, "o")
        dream = add({"kind": "net_node", "endpoint": "dream",
                     "params": {"target": "class", "class": "0",
                                "steps": "32", "lr": "0.05"}},
                    220, 280)
        dream_view = add({"kind": "img_view"}, 440, 280)
        wire(head, "o", dream, "o")
        wire(dream, "o", dream_view, "o")
        occ = add({"kind": "net_node", "endpoint": "occlusion",
                   "params": {"target": "max", "patch": "32",
                              "stride": "16"}},
                  220, 440)
        occ_view = add({"kind": "img_view"}, 440, 440)
        wire(head, "o", occ, "o")
        wire(occ, "o", occ_view, "o")
        if any(k.get_name().endswith(":attrib") for k in self.extra_kinds):
            # Chefer attention attribution wires from the EMBED node's
            # token stream (it re-runs the trunk internally, see
            # models/attrib.py)
            emb = next(
                (i for i, n in enumerate(obj["nodes"])
                 if n["instance"].get("endpoint", "").endswith(":embed")),
                None)
            if emb is not None:
                att = add({"kind": "net_node",
                           "endpoint": self.name + ":attrib",
                           "params": {"target": "max"}}, 220, 600)
                att_view = add({"kind": "img_view"}, 440, 600)
                wire(emb, "o", att, "o")
                wire(att, "o", att_view, "o")
        return obj

    def _kind_cls(self, layer_name: str) -> type:
        """Node-kind class for ``layer_name``; subclass hook (the text
        model swaps in prompt/pool kinds without re-implementing register)."""
        return LayerNodeKind

    def register(self, reg: Registry,
                 graph_lib: Optional[GraphLibrary] = None) -> None:
        if graph_lib is not None and not graph_lib.exists(self.name + ".json"):
            try:
                graph_lib.save(self.name + ".json", self.generate_graph_json())
                logger.info("generated graph %s.json", self.name)
            except Exception as e:  # noqa: BLE001 — parity: log and continue
                logger.error("could not generate graph %s: %s", self.name, e)
        for lname, extra, fn in self.layers:
            self._kind_cls(lname)(
                self, lname, extra, fn,
                fold_group=self.fold_groups.get(lname),
                grad_fn_impl=self.grad_layers.get(lname)).register(reg)
        for kind in self.extra_kinds:
            kind.register(reg)
