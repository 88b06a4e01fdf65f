"""Round-3 serving soak: multi-model mixed clients, sustained minutes.

Robustness evidence for the production-serving story: boot ONE server
with four model families (vit_t16, dino_s16, vgg16, resnet50), drive it
with mixed concurrent clients — classification chains, dense-feature
views with PER-CLIENT dynamic params, raw-op graphs — for several
minutes, and record error counts, latency drift, host RSS growth, and
executor cache behavior. Emits JSONL to /tmp/r3_soak.jsonl.
"""

import json
import resource
import threading
import time
import urllib.request

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_soak.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.serving.server import build_app  # noqa: E402
from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, Response, encode_message,
)

DURATION_S = 420.0
app = build_app(models=("vit_t16", "dino_s16", "vgg16", "resnet50",
                        "vit_moe_s16"),
                graphs_dir="/tmp/soak_graphs", dtype_name="bfloat16",
                max_batch=8, max_wait_ms=5.0)
httpd = app.serve("127.0.0.1", 0, background=True)
base = f"http://127.0.0.1:{httpd.server_address[1]}"


def chain_request(model, n_layers_spec, taps_last=True, extra=None,
                  img_hw=224, seed=0, resp_dtype="bf16"):
    obj = app.graphs.load(model + ".json")
    insts = [n["instance"] for n in obj["nodes"]
             if n["instance"]["kind"] == "net_node"]
    nodes = [{"endpoint": i["endpoint"], "params": dict(i.get("params", {}))}
             for i in insts]
    edges = [{"out_port": {"node": 0, "channel": "o"}, "tensor": 0}]
    for i in range(1, len(nodes)):
        edges.append({"out_port": {"node": i, "channel": "o"},
                      "in_port": {"node": i - 1, "channel": "o"}})
    req = {"nodes": nodes, "edges": edges,
           "taps": [{"node": len(nodes) - 1, "channel": "o"}],
           "resp_dtype": resp_dtype}
    if extra:
        extra(req)
    img = np.random.default_rng(seed).random((3, img_hw, img_hw),
                                             dtype=np.float32)
    return bytes(encode_message(REQUEST_MAGIC, req, [img]))


def dino_features(req, seed=0):
    """Splice pca_view + patch_sim with PER-REQUEST dynamic queries."""
    nodes = req["nodes"]
    norm_i = next(i for i, n in enumerate(nodes)
                  if n["endpoint"].endswith(":norm"))
    pca_i, sim_i = len(nodes), len(nodes) + 1
    nodes.append({"endpoint": "pca_view", "params": {"skip": "1"}})
    nodes.append({"endpoint": "patch_sim",
                  "params": {"row": str(1 + seed % 13),
                             "col": str(1 + (seed * 3) % 13)}})
    req["edges"].append({"out_port": {"node": pca_i, "channel": "o"},
                         "in_port": {"node": norm_i, "channel": "o"}})
    req["edges"].append({"out_port": {"node": sim_i, "channel": "o"},
                         "in_port": {"node": norm_i, "channel": "o"}})
    req["taps"] = [{"node": pca_i, "channel": "o"},
                   {"node": sim_i, "channel": "o"}]


def moe_scrub(req, seed=0):
    """Tap a ROTATING block's attention (and the MoE router on odd
    blocks): each distinct block is its own program signature, so this
    client exercises the speculative tap warmer + compile-cache LRU
    under sustained mixed load (round-3 features)."""
    blk = seed % 12
    nodes = req["nodes"]
    bi = next(i for i, n in enumerate(nodes)
              if n["endpoint"].endswith(f":blocks.{blk}"))
    req["taps"].append({"node": bi, "channel": "attn"})
    if blk % 2 == 1:
        req["taps"].append({"node": bi, "channel": "experts"})


CLIENTS = [
    ("vit_t16", lambda i: chain_request("vit_t16", None, seed=i)),
    ("moe_scrub", lambda i: chain_request(
        "vit_moe_s16", None, extra=lambda r: moe_scrub(r, i), seed=i)),
    ("dino_feat", lambda i: chain_request(
        "dino_s16", None, extra=lambda r: dino_features(r, i), seed=i)),
    ("dino_feat", lambda i: chain_request(
        "dino_s16", None, extra=lambda r: dino_features(r, i + 7), seed=i)),
    ("vgg16", lambda i: chain_request("vgg16", None, seed=i)),
    ("resnet50", lambda i: chain_request("resnet50", None, seed=i)),
]

lat = {name: [] for name, _ in CLIENTS}
errors = {name: 0 for name, _ in CLIENTS}
lock = threading.Lock()
stop_at = time.perf_counter() + DURATION_S


def client(name, make, cid):
    i = 0
    while time.perf_counter() < stop_at:
        try:
            body = make(cid * 1009 + i)
            t0 = time.perf_counter()
            req = urllib.request.Request(base + "/compute", data=body,
                                         method="POST")
            with urllib.request.urlopen(req, timeout=600) as r:
                Response.decode(r.read())
            with lock:
                lat[name].append(time.perf_counter() - t0)
        except Exception as e:  # noqa: BLE001
            with lock:
                errors[name] += 1
                if errors[name] <= 2:
                    emit(stage="client_error", name=name, err=repr(e)[:200])
        i += 1


threads = [threading.Thread(target=client, args=(nm, mk, ci), daemon=True)
           for ci, (nm, mk) in enumerate(CLIENTS)]
t_start = time.perf_counter()
for t in threads:
    t.start()

def _vm_rss_mb() -> int:
    """CURRENT resident set (ru_maxrss is the monotone high-water mark —
    it cannot distinguish a leak from one transient peak)."""
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) // 1024
    return -1


rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
cur0 = _vm_rss_mb()
while time.perf_counter() < stop_at:
    time.sleep(60)
    snap = app.metrics.snapshot()
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    cur = _vm_rss_mb()
    emit(stage="tick", t=round(time.perf_counter() - t_start),
         requests=snap["counters"].get("compute_requests", 0),
         batches=snap["counters"].get("batches", 0),
         errors=dict(errors), mean_batch=round(snap["mean_batch_size"], 2),
         compute_p50_ms=round(snap["compute_p50_ms"], 1),
         exec_cache=app.executor.cache_info(),
         rss_mb=rss // 1024, rss_growth_mb=(rss - rss0) // 1024,
         vmrss_mb=cur, vmrss_growth_mb=cur - cur0)
for t in threads:
    t.join(timeout=120)

summary = {}
for name, xs in lat.items():
    if xs:
        xs = sorted(xs)
        summary[name] = {"n": len(xs),
                         "p50_ms": round(xs[len(xs) // 2] * 1e3, 1),
                         "p95_ms": round(xs[int(len(xs) * .95)] * 1e3, 1)}
emit(stage="summary", per_client=summary, errors=dict(errors),
     wall_s=round(time.perf_counter() - t_start, 1))
httpd.shutdown()
app.batcher.stop()
emit(stage="done")
