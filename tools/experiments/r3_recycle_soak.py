"""Round-3: on-chip serving soak THROUGH worker recycles.

The axon tunnel plugin leaks ~0.58 MB host RSS per device transfer
(CLAUDE.md; isolated by tools/experiments/leak_repro.py), so every prior
soak's RSS grew linearly. This soak boots the REAL server entry point as
a subprocess with ``--recycle-after-requests`` and drives mixed clients
across multiple exec generations, recording:

- error count (target: 0 — the listen-socket handoff must not drop
  mid-restart requests),
- the RSS sawtooth (each generation's /metrics rss_mb resets),
- the generation-swap pause as seen by clients (max request latency),
- steady-state compute_p50 per generation (persistent jit cache should
  make post-recycle latency equal to pre-recycle).

The soak client itself NEVER imports jax: the TPU is exclusive-access
(CLAUDE.md trap #1) and the server subprocess owns it. Emits JSONL to
/tmp/r3_recycle_soak.jsonl.
"""

import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, "/root/repo")

from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, Response, encode_message,
)

OUT = "/tmp/r3_recycle_soak.jsonl"
PORT = 8971
BASE = f"http://127.0.0.1:{PORT}"
DURATION_S = float(os.environ.get("SOAK_S", "480"))
BUDGET = int(os.environ.get("RECYCLE_AFTER", "600"))
N_CLIENTS = 6


def emit(**kw):
    kw["t"] = round(time.time(), 3)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def get_json(path, timeout=60):
    with urllib.request.urlopen(BASE + path, timeout=timeout) as r:
        return json.loads(r.read())


def chain_request(graph_obj, seed=0, img_hw=224, tap_attn=None):
    insts = [n["instance"] for n in graph_obj["nodes"]
             if n["instance"]["kind"] == "net_node"]
    nodes = [{"endpoint": i["endpoint"], "params": dict(i.get("params", {}))}
             for i in insts]
    edges = [{"out_port": {"node": 0, "channel": "o"}, "tensor": 0}]
    for i in range(1, len(nodes)):
        edges.append({"out_port": {"node": i, "channel": "o"},
                      "in_port": {"node": i - 1, "channel": "o"}})
    taps = [{"node": len(nodes) - 1, "channel": "o"}]
    if tap_attn is not None:
        taps.append({"node": tap_attn, "channel": "attn"})
    req = {"nodes": nodes, "edges": edges, "taps": taps,
           "resp_dtype": "bf16"}
    img = np.random.default_rng(seed).random((3, img_hw, img_hw),
                                             dtype=np.float32)
    return bytes(encode_message(REQUEST_MAGIC, req, [img]))


def main():
    open(OUT, "w").close()
    env = dict(os.environ)  # PYTHONPATH carries the axon plugin
    server = subprocess.Popen(
        [sys.executable, "-m", "interactive_vit_tpu.serving.server",
         "--models", "vit_t16,dino_s16", "--dtype", "bfloat16",
         "--port", str(PORT), "--max-batch", "8", "--max-wait-ms", "5",
         "--recycle-after-requests", str(BUDGET),
         "--jit-cache", "/tmp/ivt_jit_cache",
         "--graphs-dir", "/tmp/recycle_soak_graphs"]
        + (["--platform", "cpu"]
           if os.environ.get("SOAK_PLATFORM") == "cpu" else []),
        env=env, cwd="/root/repo",
        stdout=open("/tmp/r3_recycle_server.log", "w"),
        stderr=subprocess.STDOUT,
    )
    emit(stage="server_spawned", pid=server.pid, budget=BUDGET)
    try:
        deadline = time.monotonic() + 600
        while True:
            try:
                snap = get_json("/metrics", timeout=10)
                break
            except Exception:
                if time.monotonic() > deadline:
                    raise RuntimeError("server never came up")
                if server.poll() is not None:
                    raise RuntimeError("server died at boot")
                time.sleep(2)
        emit(stage="server_up", rss_mb=snap["rss_mb"])

        graphs = {m: get_json(f"/load_graph/{m}.json")
                  for m in ("vit_t16", "dino_s16")}

        stop = time.monotonic() + DURATION_S
        stats = {"ok": 0, "err": 0, "max_lat": 0.0}
        lock = threading.Lock()
        errors = []

        def client(ci):
            model = "vit_t16" if ci % 2 == 0 else "dino_s16"
            # half the vit clients also tap a mid-block attention map
            tap = 5 if (model == "vit_t16" and ci % 4 == 0) else None
            i = 0
            while time.monotonic() < stop:
                body = chain_request(graphs[model], seed=ci * 1000 + i,
                                     tap_attn=tap)
                t0 = time.monotonic()
                try:
                    req = urllib.request.Request(
                        BASE + "/compute", data=body, method="POST")
                    with urllib.request.urlopen(req, timeout=300) as r:
                        Response.decode(r.read())
                    dt = time.monotonic() - t0
                    with lock:
                        stats["ok"] += 1
                        stats["max_lat"] = max(stats["max_lat"], dt)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        stats["err"] += 1
                        errors.append(f"{type(e).__name__}: {e}"[:200])
                i += 1

        threads = [threading.Thread(target=client, args=(ci,), daemon=True)
                   for ci in range(N_CLIENTS)]
        for t in threads:
            t.start()

        seen_gens = {}
        while time.monotonic() < stop:
            time.sleep(5)
            try:
                snap = get_json("/metrics", timeout=120)
            except Exception as e:  # noqa: BLE001 — mid-recycle poll
                emit(stage="metrics_stall", err=str(e)[:120])
                continue
            gen = snap["generation"]
            seen_gens.setdefault(gen, {"first_rss": snap["rss_mb"]})
            seen_gens[gen]["last_rss"] = snap["rss_mb"]
            seen_gens[gen]["compute_p50_ms"] = snap["compute_p50_ms"]
            with lock:
                ok, err = stats["ok"], stats["err"]
            emit(stage="sample", gen=gen, rss_mb=snap["rss_mb"],
                 compute_p50_ms=snap["compute_p50_ms"],
                 served=snap["counters"].get("compute_requests", 0),
                 ok=ok, err=err)
        for t in threads:
            t.join(timeout=330)
        emit(stage="done", ok=stats["ok"], err=stats["err"],
             max_lat_s=round(stats["max_lat"], 2),
             generations={str(k): v for k, v in seen_gens.items()},
             errors=errors[:10])
    finally:
        server.kill()
        server.wait(timeout=30)


if __name__ == "__main__":
    main()
