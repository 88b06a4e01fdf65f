"""Round-3: serving soak over the NEW families — convnext_t, dinov2
(served at the derived @224 resolution: the @res path under sustained
load), plus vit_t16 as the control. Mixed concurrent clients for
5 minutes; errors, latency, RSS. Emits /tmp/r3_soak_families.jsonl.
"""

import threading
import time
import urllib.request

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_soak_families.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.serving.server import build_app  # noqa: E402
from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, Response, encode_message,
)

DURATION_S = 300.0
app = build_app(models=("vit_t16", "convnext_t", "dinov2_s14@224"),
                graphs_dir="/tmp/soak2_graphs", dtype_name="bfloat16",
                max_batch=8, max_wait_ms=5.0)
httpd = app.serve("127.0.0.1", 0, background=True)
base = f"http://127.0.0.1:{httpd.server_address[1]}"


def chain_request(model, tap_endswith=None, tap_channel="o", seed=0):
    obj = app.graphs.load(model + ".json")
    insts = [n["instance"] for n in obj["nodes"]
             if n["instance"]["kind"] == "net_node"]
    nodes = [{"endpoint": i["endpoint"],
              "params": dict(i.get("params", {}))} for i in insts]
    edges = [{"out_port": {"node": 0, "channel": "o"}, "tensor": 0}]
    for i in range(1, len(nodes)):
        edges.append({"out_port": {"node": i, "channel": "o"},
                      "in_port": {"node": i - 1, "channel": "o"}})
    taps = [{"node": len(nodes) - 1, "channel": "o"}]
    if tap_endswith:
        ti = next(i for i, n in enumerate(nodes)
                  if n["endpoint"].endswith(tap_endswith))
        taps.append({"node": ti, "channel": tap_channel})
    req = {"nodes": nodes, "edges": edges, "taps": taps,
           "resp_dtype": "bf16"}
    img = np.random.default_rng(seed).random((3, 224, 224),
                                             dtype=np.float32)
    return bytes(encode_message(REQUEST_MAGIC, req, [img]))


CLIENTS = [
    ("vit_t16", lambda i: chain_request("vit_t16", seed=i)),
    ("convnext_stage", lambda i: chain_request(
        "convnext_t", tap_endswith=f":stages.2.{i % 9}", seed=i)),
    ("convnext", lambda i: chain_request("convnext_t", seed=i)),
    ("dinov2_attn", lambda i: chain_request(
        "dinov2_s14@224", tap_endswith=f":blocks.{i % 12}",
        tap_channel="attn", seed=i)),
    ("dinov2", lambda i: chain_request("dinov2_s14@224", seed=i)),
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
                    emit(stage="client_error", name=name,
                         err=repr(e)[:300])
        i += 1


threads = [threading.Thread(target=client, args=(nm, mk, ci), daemon=True)
           for ci, (nm, mk) in enumerate(CLIENTS)]
t_start = time.perf_counter()
for t in threads:
    t.start()
while time.perf_counter() < stop_at:
    time.sleep(60)
    snap = app.metrics.snapshot()
    emit(stage="tick", t=round(time.perf_counter() - t_start),
         requests=snap["counters"].get("compute_requests", 0),
         errors=dict(errors),
         compute_p50_ms=round(snap["compute_p50_ms"], 1))
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
