"""Batcher/pipeline efficiency under the production mix (VERDICT r4 #4).

The r4 round artifact showed the micro-batcher mostly idle under the
production workload: ``mean_batch_size 2.0`` of max 8, and
``queue_p50 154 ms`` ~= ``compute_p50 152 ms`` — each request waits
about one full dispatch group behind (depth-1 pipeline). Nobody had
measured whether deeper dispatch pipelining, a longer group-collection
window, or the signature diversity itself is what holds wire_p50 there,
or whether the tunnel RTT floor makes all of it moot. This sweep holds
the r4 bench workload shape (3 families, 8 clients, bf16, taps mix) and
varies ONE knob per run:

    base     depth-1 pipeline, max_wait 5 ms   (the shipped config)
    depth2   --pipeline-depth 2                 (two groups in flight)
    depth3   --pipeline-depth 3
    wait15   --max-wait-ms 15                   (3x collection window)
    onemodel all clients on vit_t16             (kills signature
             diversity — attributes mean_batch to the mix, not the
             batcher)

Reports per run: client wall p50/p95, server wire/request/compute/queue
p50, mean_batch_size, rate. Outcome feeds either a landed default or a
measured ruled-out entry in CLAUDE.md (the dh=64-closure standard).

Run (owns the TPU; serialize with all other chip use):

    python tools/experiments/r5_batcher_sweep.py
    SWEEP_S=90 SWEEP_CONFIGS=base,depth2 python tools/experiments/r5_batcher_sweep.py
"""

import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from serving_bench_round import chain_request  # noqa: E402

PORT = int(os.environ.get("SWEEP_PORT", "8973"))
BASE = f"http://127.0.0.1:{PORT}"
DUR = float(os.environ.get("SWEEP_S", "90"))
N_CLIENTS = 8
MODELS = ["vit_t16", "dino_s16", "resnet50"]

CONFIGS = {
    "base": {"args": [], "models": MODELS},
    "depth2": {"args": ["--pipeline-depth", "2"], "models": MODELS},
    "depth3": {"args": ["--pipeline-depth", "3"], "models": MODELS},
    "wait15": {"args": ["--max-wait-ms", "15"], "models": MODELS},
    "onemodel": {"args": [], "models": ["vit_t16"]},
}


def get_json(path, timeout=60):
    with urllib.request.urlopen(BASE + path, timeout=timeout) as r:
        return json.loads(r.read())


def run_config(name, cfg):
    extra = (["--platform", "cpu"]
             if os.environ.get("SWEEP_PLATFORM") == "cpu" else [])
    args = [sys.executable, "-m", "interactive_vit_tpu.serving.server",
            "--models", ",".join(MODELS), "--dtype", "bfloat16",
            "--port", str(PORT), "--max-batch", "8",
            "--max-wait-ms", "5", "--no-speculate",
            "--warm-inventory", "",
            "--jit-cache", "/tmp/ivt_jit_cache",
            "--graphs-dir", "/tmp/serving_bench_graphs",
            ] + cfg["args"] + extra
    # later flags win in argparse? NO — argparse keeps the LAST
    # occurrence, so cfg overrides of --max-wait-ms must come after
    server = subprocess.Popen(
        args, env=dict(os.environ), cwd=_REPO,
        stdout=open(f"/tmp/r5_batcher_{name}.log", "w"),
        stderr=subprocess.STDOUT)
    try:
        deadline = time.monotonic() + 900
        while True:
            try:
                get_json("/health", timeout=10)
                break
            except Exception:
                if server.poll() is not None:
                    raise RuntimeError(
                        f"server died: /tmp/r5_batcher_{name}.log")
                if time.monotonic() > deadline:
                    raise RuntimeError("server never came up")
                time.sleep(2)
        graphs = {m: get_json(f"/load_graph/{m}.json") for m in MODELS}

        # deterministic warm (same discipline as the round bench):
        # every signature x power-of-two bucket the clients will ship
        warm_models = sorted(set(cfg["models"]))
        for m in warm_models:
            taps = [None] + ([5] if m == "vit_t16" else [])
            for tap in taps:
                for burst in (1, 2, 4, 8):
                    def one(k):
                        req = urllib.request.Request(
                            BASE + "/compute",
                            data=chain_request(graphs[m], seed=k,
                                               tap_attn=tap),
                            method="POST")
                        urllib.request.urlopen(req, timeout=1800).read()
                    ts = [threading.Thread(target=one, args=(k,))
                          for k in range(burst)]
                    for t in ts:
                        t.start()
                    for t in ts:
                        t.join()
        print(f"[{name}] warmed", flush=True)

        walls, errors = [], []
        lock = threading.Lock()
        stop = time.monotonic() + DUR

        def client(ci):
            model = cfg["models"][ci % len(cfg["models"])]
            tap = 5 if (model == "vit_t16" and ci % 6 == 0) else None
            i = 0
            while time.monotonic() < stop:
                body = chain_request(graphs[model], seed=ci * 1009 + i,
                                     tap_attn=tap)
                t0 = time.monotonic()
                try:
                    req = urllib.request.Request(
                        BASE + "/compute", data=body, method="POST")
                    urllib.request.urlopen(req, timeout=600).read()
                    with lock:
                        walls.append(time.monotonic() - t0)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(str(e)[:120])
                i += 1

        threads = [threading.Thread(target=client, args=(ci,),
                                    daemon=True)
                   for ci in range(N_CLIENTS)]
        t0 = time.monotonic()
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=DUR + 630)
        wall = time.monotonic() - t0
        snap = get_json("/metrics", timeout=120)
        walls.sort()
        return {
            "requests": len(walls), "errors": len(errors),
            "rate_rps": round(len(walls) / wall, 2),
            "wall_p50_ms": round(walls[len(walls) // 2] * 1e3, 1)
            if walls else -1,
            "wall_p95_ms": round(walls[int(len(walls) * .95)] * 1e3, 1)
            if walls else -1,
            "wire_p50_ms": round(snap.get("wire_p50_ms", -1), 2),
            "request_p50_ms": round(snap.get("request_p50_ms", -1), 2),
            "compute_p50_ms": round(snap.get("compute_p50_ms", -1), 2),
            "queue_p50_ms": round(snap.get("queue_p50_ms", -1), 2),
            "mean_batch_size": round(snap.get("mean_batch_size", -1), 2),
            "server_args": cfg["args"],
            "client_models": sorted(set(cfg["models"])),
        }
    finally:
        server.kill()
        server.wait(timeout=30)


def main() -> int:
    names = [n for n in os.environ.get(
        "SWEEP_CONFIGS", ",".join(CONFIGS)).split(",") if n]
    out = {"duration_s": DUR, "clients": N_CLIENTS, "runs": {}}
    for name in names:
        print(f"=== {name} ===", flush=True)
        try:
            out["runs"][name] = run_config(name, CONFIGS[name])
        except Exception as err:  # noqa: BLE001
            out["runs"][name] = {"error": str(err)[:300]}
        print(json.dumps(out["runs"][name]), flush=True)
        time.sleep(3)  # let the port free up
    path = os.path.join(_REPO, "tools/experiments/r5_batcher_sweep.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
