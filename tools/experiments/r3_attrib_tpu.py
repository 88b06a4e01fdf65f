"""On-chip drive of the Chefer attribution node (models/attrib.py).

Serves vit_b16 + vit_t16 (bf16, fused kernels — the headline serving
config) in-process and POSTs /compute requests whose graph carries the
``:attrib`` node wired from the embed output, per CLAUDE.md trap #1 one
process owns the chip for the whole run. Emits JSONL to
/tmp/r3_attrib_tpu.jsonl:

- cold/warm wall latency of the attrib program (fwd + one backward of the
  whole trunk + relevance chain, staged in the same jitted program),
- contract checks (heat in (0,1], relevance diag >= 1, finite),
- bf16 parity: attrib-trunk logits vs the fused-kernel chain's logits
  (different numeric paths — report max-abs-diff + top-1 agreement),
- dynamic class scrub stays on the cached program (warm latency).
"""

import json
import time
import urllib.request

import numpy as np

from _harness import make_emit, setup_jax  # noqa: E402

emit = make_emit("/tmp/r3_attrib_tpu.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.serving.server import build_app  # noqa: E402
from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, Response, encode_message,
)

app = build_app(models=("vit_t16", "vit_b16"), graphs_dir="/tmp/attrib_tpu_graphs",
                dtype_name="bfloat16", max_batch=8, max_wait_ms=3.0)
httpd = app.serve("127.0.0.1", 0, background=True)
base = f"http://127.0.0.1:{httpd.server_address[1]}"
emit(stage="serving", base=base)


def attrib_request(model, cls="3", taps_head=True):
    obj = app.graphs.load(model + ".json")
    # derive wiring from the saved graph's EDGE LIST, not node-list
    # order (a graph-generator reorder would silently mis-wire the
    # chain — advisor r3). idx_map: saved index -> request index.
    idx_map, nodes = {}, []
    for i, n in enumerate(obj["nodes"]):
        inst = n["instance"]
        if inst["kind"] != "net_node":
            continue
        idx_map[i] = len(nodes)
        nodes.append({"endpoint": inst["endpoint"],
                      "params": dict(inst.get("params", {}))})
    edges, fed = [], set()
    for e in obj["edges"]:
        s, d = e["in_port"]["node"], e["out_port"]["node"]
        if s in idx_map and d in idx_map:
            edges.append(
                {"out_port": {"node": idx_map[d],
                              "channel": e["out_port"]["channel"]},
                 "in_port": {"node": idx_map[s],
                             "channel": e["in_port"]["channel"]}})
            fed.add(idx_map[d])
    root = next(i for i in sorted(idx_map.values()) if i not in fed)
    edges.insert(0, {"out_port": {"node": root, "channel": "o"},
                     "tensor": 0})
    emb = next(i for i, n in enumerate(nodes)
               if n["endpoint"].endswith(":embed"))
    head = next(i for i, n in enumerate(nodes)
                if n["endpoint"].endswith(":head"))
    att = len(nodes)
    nodes.append({"endpoint": f"{model}:attrib",
                  "params": {"target": "class", "class": cls}})
    edges.append({"out_port": {"node": att, "channel": "o"},
                  "in_port": {"node": emb, "channel": "o"}})
    taps = [{"node": att, "channel": "o"}, {"node": att, "channel": "rel"},
            {"node": att, "channel": "logits"}]
    if taps_head:
        taps.append({"node": head, "channel": "o"})
    req = {"nodes": nodes, "edges": edges, "taps": taps,
           "resp_dtype": "f32"}
    img = np.random.default_rng(7).random((3, 224, 224), dtype=np.float32)
    return req, att, head, img


def post(req, img):
    body = bytes(encode_message(REQUEST_MAGIC, req, [img]))
    t = time.time()
    r = urllib.request.Request(
        base + "/compute", data=body,
        headers={"Content-Type": "application/octet-stream"})
    raw = urllib.request.urlopen(r, timeout=1800).read()
    return Response.decode(raw), time.time() - t


for model in ("vit_t16", "vit_b16"):
    try:
        req, att, head, img = attrib_request(model)
        outs, t_cold = post(req, img)
        heat = outs[att]["o"]
        rel = outs[att]["rel"]
        la, lh = outs[att]["logits"], outs[head]["o"]
        agree = bool(np.argmax(la, -1)[0] == np.argmax(lh, -1)[0])
        _, t_warm = post(req, img)
        req["nodes"][att]["params"]["class"] = "9"
        outs9, t_scrub = post(req, img)
        emit(stage="attrib", model=model,
             cold_s=round(t_cold, 2), warm_s=round(t_warm, 3),
             scrub_s=round(t_scrub, 3),
             heat_shape=list(heat.shape),
             heat_min=float(heat.min()), heat_max=float(heat.max()),
             rel_min=float(rel.min()),
             rel_diag_ok=bool(np.all(
                 np.diagonal(rel, axis1=1, axis2=2) >= 1 - 1e-3)),
             finite=bool(np.isfinite(rel).all()),
             logits_maxdiff=float(np.abs(la - lh).max()),
             top1_agree=agree,
             scrub_changed=bool(
                 np.abs(outs9[att]["rel"] - rel).max() > 1e-6))
    except Exception as e:  # noqa: BLE001 — keep the sweep alive
        emit(stage="error", model=model, err=str(e)[:800])

emit(stage="done")
httpd.shutdown()
