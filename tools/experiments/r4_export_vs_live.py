"""Round-4: from-export vs live serving latency on the same workload.

The experiment that caught the 3396 ms/request from-export hot path
(host-numpy captures re-uploading 173 MB per call + per-call re-staging
+ all-output fetches) and verified the fix: after device-resident
captures, a cached jit wrapper, and want=-filtered fetches, the export
server reads 41.9 ms p50 vs the live server's 47.6 ms (vit_b16,
sequential singles, same tunnel). Boots both servers as subprocesses
(one TPU owner at a time), 30 requests each, prints one JSON line.

Run: python tools/experiments/r4_export_vs_live.py
(needs /tmp/vit_b16_aot_r4 — `ivt-export vit_b16 --dtype bfloat16
--out /tmp/vit_b16_aot_r4` first).
"""

import json, subprocess, sys, time, urllib.request
import numpy as np
sys.path.insert(0, "/root/repo")
from interactive_vit_tpu.wire.codec import REQUEST_MAGIC, Response, encode_message

def wait_up(base, proc, t=900):
    dl = time.monotonic() + t
    while True:
        try:
            urllib.request.urlopen(base + "/health", timeout=5).read(); return
        except Exception:
            if proc.poll() is not None: raise RuntimeError("server died")
            if time.monotonic() > dl: raise RuntimeError("timeout")
            time.sleep(1)

def chain_body(obj, seed):
    idx_map, nodes = {}, []
    for i, n in enumerate(obj["nodes"]):
        inst = n["instance"]
        if inst["kind"] != "net_node": continue
        idx_map[i] = len(nodes)
        nodes.append({"endpoint": inst["endpoint"], "params": dict(inst.get("params", {}))})
    edges, fed = [], set()
    for e in obj["edges"]:
        s, d = e["in_port"]["node"], e["out_port"]["node"]
        if s in idx_map and d in idx_map:
            edges.append({"out_port": {"node": idx_map[d], "channel": e["out_port"]["channel"]},
                          "in_port": {"node": idx_map[s], "channel": e["in_port"]["channel"]}})
            fed.add(idx_map[d])
    root = next(i for i in sorted(idx_map.values()) if i not in fed)
    edges.insert(0, {"out_port": {"node": root, "channel": "o"}, "tensor": 0})
    req = {"nodes": nodes, "edges": edges,
           "taps": [{"node": len(nodes) - 1, "channel": "o"}], "resp_dtype": "bf16"}
    # the exported program is batch-1 [1,3,224,224]; the unbatched client
    # tensor auto-expands on the export server and the live server alike
    img = np.random.default_rng(seed).random((1, 3, 224, 224), dtype=np.float32)
    return bytes(encode_message(REQUEST_MAGIC, req, [img]))

def drive(base, obj, n=30):
    walls = []
    for i in range(n):
        b = chain_body(obj, 100 + i)
        t0 = time.monotonic()
        r = urllib.request.Request(base + "/compute", data=b, method="POST")
        urllib.request.urlopen(r, timeout=900).read()
        walls.append(time.monotonic() - t0)
    walls.sort()
    return {"p50_ms": round(walls[len(walls)//2]*1e3, 1),
            "p95_ms": round(walls[int(len(walls)*0.95)]*1e3, 1),
            "first_ms": round(walls[0]*1e3, 1)}

out = {}
# 1) from-export
srv = subprocess.Popen([sys.executable, "-m", "interactive_vit_tpu.serving.server",
    "--from-export", "/tmp/vit_b16_aot_r4", "--port", "8975"],
    cwd="/root/repo", stdout=open("/tmp/r4_xsl.log","w"), stderr=subprocess.STDOUT)
try:
    t0 = time.monotonic()
    wait_up("http://127.0.0.1:8975", srv)
    out["export_boot_s"] = round(time.monotonic() - t0, 1)
    obj = json.loads(urllib.request.urlopen("http://127.0.0.1:8975/load_graph/vit_b16.json").read())
    b = chain_body(obj, 0)
    t0 = time.monotonic()
    urllib.request.urlopen(urllib.request.Request("http://127.0.0.1:8975/compute", data=b, method="POST"), timeout=900).read()
    out["export_first_response_s"] = round(time.monotonic() - t0, 1)
    out["export"] = drive("http://127.0.0.1:8975", obj)
finally:
    srv.kill(); srv.wait()
# 2) live
srv = subprocess.Popen([sys.executable, "-m", "interactive_vit_tpu.serving.server",
    "--models", "vit_b16", "--dtype", "bfloat16", "--port", "8976",
    "--jit-cache", "/tmp/ivt_jit_cache", "--graphs-dir", "/tmp/evl_graphs"],
    cwd="/root/repo", stdout=open("/tmp/r4_lvl.log","w"), stderr=subprocess.STDOUT)
try:
    t0 = time.monotonic()
    wait_up("http://127.0.0.1:8976", srv)
    out["live_boot_s"] = round(time.monotonic() - t0, 1)
    obj = json.loads(urllib.request.urlopen("http://127.0.0.1:8976/load_graph/vit_b16.json").read())
    b = chain_body(obj, 0)
    t0 = time.monotonic()
    urllib.request.urlopen(urllib.request.Request("http://127.0.0.1:8976/compute", data=b, method="POST"), timeout=900).read()
    out["live_first_response_s"] = round(time.monotonic() - t0, 1)
    out["live"] = drive("http://127.0.0.1:8976", obj)
finally:
    srv.kill(); srv.wait()
print(json.dumps(out))
