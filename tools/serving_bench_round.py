"""Round-tracked serving benchmark -> SERVING_r{N}.json (VERDICT r3 #1a).

Production-shaped config: the REAL server entry point as a subprocess
(worker recycling ON, tap speculation ON, persistent jit cache), three
model families served concurrently, 8 mixed clients over the binary wire
protocol. Records the serving-tier numbers that previously evaporated
into ROADMAP prose: ``server_compute_p50_ms`` (the tunnel-independent
regression gate), ``mean_batch_size``, error count, the RSS bound across
worker generations, and the speculation counters.

Run (owns the TPU; serialize with all other chip use):

    make serving-bench            # = python tools/serving_bench_round.py
    SERVING_S=120 ROUND=4 python tools/serving_bench_round.py

The client tier never imports jax (the server subprocess owns the
exclusive-access chip — CLAUDE.md trap #1).
"""

import json
import os
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, Response, encode_message,
)

PORT = int(os.environ.get("SERVING_PORT", "8972"))
BASE = f"http://127.0.0.1:{PORT}"
DURATION_S = float(os.environ.get("SERVING_S", "600"))
# sized for 1-2 recycles inside the (default 10 min) window: each
# generation boot costs ~2-4 min (model registration is tunnel-bound;
# the inventory warm itself is ~10-20 s parallelized), so smaller
# budgets spend the window booting (the r5 1200-budget attempt recycled
# 3x and no generation reached steady state)
RECYCLE_AFTER = int(os.environ.get("RECYCLE_AFTER", "2000"))
N_CLIENTS = int(os.environ.get("SERVING_CLIENTS", "8"))
ROUND = int(os.environ.get("ROUND", "5"))
MODELS = ["vit_t16", "dino_s16", "resnet50"]


def get_json(path, timeout=60):
    with urllib.request.urlopen(BASE + path, timeout=timeout) as r:
        return json.loads(r.read())


def chain_request(graph_obj, seed=0, tap_attn=None):
    # wiring derived from the saved graph's EDGE LIST, not node-list
    # order (a graph-generator reorder would silently mis-wire the
    # round artifact — the advisor-r3 class fixed in r3_attrib_tpu)
    idx_map, nodes = {}, []
    for i, n in enumerate(graph_obj["nodes"]):
        inst = n["instance"]
        if inst["kind"] != "net_node":
            continue
        idx_map[i] = len(nodes)
        nodes.append({"endpoint": inst["endpoint"],
                      "params": dict(inst.get("params", {}))})
    edges, fed = [], set()
    for e in graph_obj["edges"]:
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
    taps = [{"node": len(nodes) - 1, "channel": "o"}]
    if tap_attn is not None:
        taps.append({"node": tap_attn, "channel": "attn"})
    req = {"nodes": nodes, "edges": edges, "taps": taps,
           "resp_dtype": "bf16"}
    img = np.random.default_rng(seed).random((3, 224, 224),
                                             dtype=np.float32)
    return bytes(encode_message(REQUEST_MAGIC, req, [img]))


def main() -> int:
    env = dict(os.environ)  # PYTHONPATH carries the axon plugin
    extra = (["--platform", "cpu"]
             if os.environ.get("SERVING_PLATFORM") == "cpu" else [])
    # fresh inventory per bench run: the warm loop being measured is the
    # one gen-0 builds DURING this run, not a stale file's
    inv_path = f"/tmp/ivt_warm_inventory_bench_{PORT}.json"
    if os.path.exists(inv_path):
        os.remove(inv_path)
    server = subprocess.Popen(
        [sys.executable, "-m", "interactive_vit_tpu.serving.server",
         "--models", ",".join(MODELS), "--dtype", "bfloat16",
         "--port", str(PORT), "--max-batch", "8", "--max-wait-ms", "5",
         "--recycle-after-requests", str(RECYCLE_AFTER),
         "--speculate-buckets", "1,4",
         "--warm-inventory", inv_path, "--warm-budget-s", "90",
         "--jit-cache", "/tmp/ivt_jit_cache",
         "--graphs-dir", "/tmp/serving_bench_graphs"] + extra,
        env=env, cwd=_REPO,
        stdout=open("/tmp/serving_bench_server.log", "w"),
        stderr=subprocess.STDOUT,
    )
    print(f"server pid {server.pid}; waiting for boot", flush=True)
    result = {"round": ROUND, "config": {
        "models": MODELS, "clients": N_CLIENTS,
        "duration_s": DURATION_S, "recycle_after": RECYCLE_AFTER,
        "speculate_buckets": [1, 4], "dtype": "bfloat16",
        "resp_dtype": "bf16", "max_batch": 8,
        "warm_inventory": True, "scrub_client": True,
    }}
    try:
        deadline = time.monotonic() + 900
        while True:
            try:
                get_json("/health", timeout=10)
                break
            except Exception:
                if server.poll() is not None:
                    raise RuntimeError(
                        "server died at boot — see "
                        "/tmp/serving_bench_server.log")
                if time.monotonic() > deadline:
                    raise RuntimeError("server never came up")
                time.sleep(2)

        graphs = {m: get_json(f"/load_graph/{m}.json") for m in MODELS}

        # deterministic warm pass: for each request SIGNATURE the
        # clients will ship, fire bursts of 1/2/4/8 concurrent
        # identical-signature requests so every power-of-two vmapped
        # bucket program compiles BEFORE the timed window (a cold
        # tunnel compile mid-run inflated compute_p50 to 1.9 s on the
        # first r4 attempt — the single-request warm was not enough)
        warm_cases = [("vit_t16", None), ("vit_t16", 5),
                      ("dino_s16", None), ("resnet50", None)]
        for m, tap in warm_cases:
            for burst in (1, 2, 4, 8):
                t0 = time.monotonic()

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
                print(f"warmed {m} tap={tap} burst={burst} in "
                      f"{time.monotonic() - t0:.1f}s", flush=True)

        latencies: list = []
        scrub_walls: list = []  # the scrub client's per-request walls
        errors: list = []
        lock = threading.Lock()
        stop = time.monotonic() + DURATION_S

        def client(ci):
            model = MODELS[ci % len(MODELS)]
            tap = 5 if (model == "vit_t16" and ci % 6 == 0) else None
            i = 0
            while time.monotonic() < stop:
                body = chain_request(graphs[model], seed=ci * 1009 + i,
                                     tap_attn=tap)
                t0 = time.monotonic()
                try:
                    req = urllib.request.Request(
                        BASE + "/compute", data=body, method="POST")
                    with urllib.request.urlopen(req, timeout=600) as r:
                        Response.decode(r.read())
                    with lock:
                        latencies.append(time.monotonic() - t0)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}"[:160])
                i += 1

        def scrub_client():
            """A user scrubbing a viewer across vit_t16's blocks: each
            step ships a NEW tap signature — exactly the interaction
            the speculative warmer exists for (VERDICT r4 weak #2:
            the artifact must show whether scrub steps find their
            program pre-warmed). Dwell between steps gives the
            anti-starvation override a window to warm siblings."""
            # request-graph indices of the attn-capable block nodes
            # (chain_request keeps net-node order: transform, embed,
            # blocks.0..N, head — derive, don't hardcode)
            blocks = [i for i, n in enumerate(
                nd for nd in graphs["vit_t16"]["nodes"]
                if nd["instance"]["kind"] == "net_node")
                if ":blocks." in n["instance"]["endpoint"]]
            step = 0
            while time.monotonic() < stop:
                tap = blocks[step % len(blocks)]
                body = chain_request(graphs["vit_t16"],
                                     seed=777000 + step, tap_attn=tap)
                t0 = time.monotonic()
                try:
                    req = urllib.request.Request(
                        BASE + "/compute", data=body, method="POST")
                    with urllib.request.urlopen(req, timeout=600) as r:
                        Response.decode(r.read())
                    with lock:
                        wall = time.monotonic() - t0
                        latencies.append(wall)
                        scrub_walls.append(wall)
                except Exception as e:  # noqa: BLE001
                    with lock:
                        errors.append(f"{type(e).__name__}: {e}"[:160])
                step += 1
                # dwell like a human scrubbing layer-by-layer
                time.sleep(min(8.0, max(0.0, stop - time.monotonic())))

        threads = [threading.Thread(target=client, args=(ci,),
                                    daemon=True)
                   for ci in range(N_CLIENTS - 1)]
        threads.append(threading.Thread(target=scrub_client,
                                        daemon=True))
        t_start = time.monotonic()
        for t in threads:
            t.start()

        rss_samples, generations = [], set()
        last_by_gen: dict = {}
        while time.monotonic() < stop:
            time.sleep(5)
            try:
                snap = get_json("/metrics", timeout=120)
            except Exception:
                continue  # mid-recycle poll
            rss_samples.append(snap["rss_mb"])
            generations.add(snap["generation"])
            # histograms RESET at each worker recycle, so the final
            # snapshot may cover only the fresh generation's re-staging
            # surge; keep the last snapshot per generation and report
            # steady state from the one that served the most requests
            last_by_gen[snap["generation"]] = snap
        for t in threads:
            t.join(timeout=630)
        wall = time.monotonic() - t_start
        # the final snapshot can land mid-generation-boot; on a bad
        # tunnel phase backend init alone runs many minutes (CLAUDE.md
        # trap #1) — retry under a deadline, then fall back to the last
        # snapshot seen so ONE slow boot can't void the whole artifact
        snap = None
        snap_deadline = time.monotonic() + 900
        while snap is None:
            try:
                snap = get_json("/metrics", timeout=120)
            except Exception:
                if time.monotonic() > snap_deadline:
                    print("final /metrics never answered (generation "
                          "stuck booting on a bad tunnel phase?); "
                          "using the last poll snapshot", flush=True)
                    snap = max(last_by_gen.values(),
                               key=lambda s: s.get("generation", 0))
                    break
                time.sleep(5)
        last_by_gen[snap["generation"]] = snap
        steady = max(
            last_by_gen.values(),
            key=lambda s: s["counters"].get("compute_requests", 0))
        # the post-recycle generation with the MOST evidence (>=300
        # served requests): the gate's subject. The FINAL generation is
        # usually mid-drain at window end (its histogram is only the
        # backlog burst from its own boot) — gating on it measured the
        # boot outage, not post-recycle steady state (first r5 runs).
        post_cands = [s2 for g, s2 in last_by_gen.items() if g > 0
                      and s2["counters"].get("compute_requests", 0) >= 300]
        post = (max(post_cands,
                    key=lambda s2: s2["counters"]["compute_requests"])
                if post_cands else None)

        # quiet-phase probe: sequential single requests per model on the
        # now-idle warm server — the per-model steady-state number a
        # round-over-round regression comparison can actually use
        # (under load, compute_p50 spans the pipelined dispatch window
        # and queue_p50 the burst backlog; both scale with load shape).
        # Phase-attributed via the X-IVT-Timing response header so a
        # wall anomaly (r4: vit_t16 75.7 ms vs dino_s16 36.4) can be
        # pinned to server phases vs tunnel/client (VERDICT r4 weak #6).
        quiet = {}
        quiet_phases = {}
        for m in MODELS:
            walls, phases = [], {}
            probe_errs = 0
            for i in range(20):
                body = chain_request(graphs[m], seed=900000 + i)
                t0 = time.monotonic()
                req = urllib.request.Request(
                    BASE + "/compute", data=body, method="POST")
                try:
                    with urllib.request.urlopen(req, timeout=600) as r:
                        r.read()
                        hdr = r.headers.get("X-IVT-Timing", "")
                except Exception:
                    probe_errs += 1
                    if probe_errs >= 2:
                        break  # quiet probes are context — don't void
                    continue  # the artifact on a flaky phase
                walls.append(time.monotonic() - t0)
                for kv in hdr.split(";"):
                    if "=" in kv:
                        k, v = kv.split("=", 1)
                        try:
                            phases.setdefault(k, []).append(float(v))
                        except ValueError:
                            pass
            walls.sort()
            quiet[m] = (round(walls[len(walls) // 2] * 1e3, 1)
                        if walls else -1)
            quiet_phases[m] = {
                k: round(sorted(v)[len(v) // 2], 2)
                for k, v in phases.items() if k != "batch"}
            # client wall minus server wall = network + client decode —
            # the tunnel-attribution residual the r4 artifact lacked
            if "wall" in quiet_phases[m]:
                quiet_phases[m]["client_overhead"] = round(
                    quiet[m] - quiet_phases[m]["wall"], 2)

        lat = sorted(latencies)
        scrub_walls.sort()
        # speculation evidence (VERDICT r4 weak #2): lifetime counters
        # aggregate across worker generations (carried through the
        # recycle exec in the inventory file), so they survive the
        # final snapshot being a fresh generation. Warm-served = a
        # request arriving to find its program already speculatively
        # compiled — THE product metric; cache_restores split persistent
        # -cache deserializes from fresh XLA compiles.
        life = snap.get("lifetime", {})
        spec_evidence = {
            "compiled": life.get(
                "speculative_compiled",
                snap.get("speculative_compiled", 0)),
            "cache_restores": life.get(
                "speculative_cache_restores",
                snap.get("speculative_cache_restores", 0)),
            "warm_served": life.get(
                "speculative_warm_served",
                snap["counters"].get("speculative_warm_served", 0)),
            "warm_sigs": life.get(
                "speculative_warm_sigs",
                snap["counters"].get("speculative_warm_sigs", 0)),
            "observations": life.get(
                "speculative_observations",
                snap["counters"].get("speculative_observations", 0)),
        }
        result.update({
            "requests": len(lat),
            "errors": len(errors),
            "error_samples": errors[:5],
            "wall_p50_ms": round(lat[len(lat) // 2] * 1e3, 1)
            if lat else -1,
            "wall_p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 1)
            if lat else -1,
            "rate_rps": round(len(lat) / wall, 1),
            # the per-REQUEST server-side gate (decode -> encode inside
            # the handler, no network), from the longest-serving
            # generation's last snapshot: THE regression comparator
            "server_wire_p50_ms": round(
                steady.get("wire_p50_ms", -1), 2),
            "server_request_p50_ms": round(
                steady.get("request_p50_ms", -1), 2),
            "steady_state_generation": steady.get("generation", -1),
            # final-snapshot values (may cover only a fresh post-recycle
            # generation's re-staging surge — context, not a gate)
            "final_gen_wire_p50_ms": round(
                snap.get("wire_p50_ms", -1), 2),
            # per-GROUP pipelined dispatch window + burst backlog —
            # load-shape-dependent; recorded for context, not a gate
            "server_compute_p50_ms": round(steady["compute_p50_ms"], 2),
            "server_compute_p95_ms": round(
                steady.get("compute_p95_ms", -1), 2),
            "queue_p50_ms": round(steady.get("queue_p50_ms", -1), 2),
            # sequential warm singles per model on the idle server,
            # phase-attributed (decode/queue/compute/encode/wall server-
            # side + client_overhead = network/client residual)
            "quiet_wall_p50_ms": quiet,
            "quiet_phases_p50_ms": quiet_phases,
            # the scrub client: p50 of layer-scrub steps (each a new tap
            # signature — speculation's target interaction)
            "scrub_requests": len(scrub_walls),
            "scrub_wall_p50_ms": round(
                scrub_walls[len(scrub_walls) // 2] * 1e3, 1)
            if scrub_walls else -1,
            "scrub_wall_p95_ms": round(
                scrub_walls[int(len(scrub_walls) * 0.95)] * 1e3, 1)
            if scrub_walls else -1,
            "mean_batch_size": round(snap["mean_batch_size"], 2),
            "rss_mb_max": max(rss_samples) if rss_samples else -1,
            "rss_mb_last": snap["rss_mb"],
            "generations_seen": sorted(generations),
            "speculation": spec_evidence,
            "inventory_warmed_final_gen": snap["counters"].get(
                "inventory_warmed", 0),
            "speculator_recoveries": snap.get(
                "speculator_recoveries", 0),
            "platform": "cpu" if extra else "tpu",
        })
        # GATES (r5): zero errors, AND a post-recycle generation that
        # served a real sample (>=300 requests under load) holds wire
        # p50 within 2x the overall steady p50 (or a 750 ms rig floor —
        # one tunnel round trip + one re-stage; the r4 surge read
        # 4137 ms vs 360 steady with NO post-recycle warm). Applies
        # only when a recycle produced such a generation; the final
        # snapshot stays recorded as context (it is usually mid-drain).
        gates = {"no_errors": len(errors) == 0 and len(lat) > 0}
        if post is not None and result["server_wire_p50_ms"] > 0:
            pw = post.get("wire_p50_ms", -1)
            result["post_recycle_generation"] = post["generation"]
            result["post_recycle_requests"] = \
                post["counters"]["compute_requests"]
            result["post_recycle_wire_p50_ms"] = round(pw, 2)
            limit = max(2.0 * result["server_wire_p50_ms"], 750.0)
            result["post_recycle_wire_p50_limit_ms"] = round(limit, 1)
            gates["post_recycle_wire_p50"] = 0 <= pw <= limit
        result["gates"] = gates
        result["ok"] = all(gates.values())
    finally:
        server.kill()
        server.wait(timeout=30)

    out = os.path.join(_REPO, f"SERVING_r{ROUND:02d}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out}: ok={result.get('ok')} "
          f"wall_p50={result.get('wall_p50_ms')}ms "
          f"compute_p50={result.get('server_compute_p50_ms')}ms "
          f"errors={result.get('errors')}", flush=True)
    return 0 if result.get("ok") else 1


if __name__ == "__main__":
    sys.exit(main())
