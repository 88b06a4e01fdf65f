"""Round-3: drive POST /profile against a live TPU server.

Validates the serving-side profiler on real hardware: boot the server
with vit_b16 (bf16, kernels on), POST a maps-on chain request to
``/profile``, and check the returned device-time budget shows the Pallas
custom-call share and roughly matches the docs/kernels.md breakdown
(fused block ~3.2 ms + MLP fusions ~4.4 ms per batch-32 step; here batch
1, so numbers scale down but the category mix should hold).

Client never imports jax (TPU is exclusive; the server owns it).
"""

import json
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np

sys.path.insert(0, "/root/repo")

from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, encode_message,
)

PORT = 8972
BASE = f"http://127.0.0.1:{PORT}"
MODEL = os.environ.get("PROFILE_MODEL", "vit_b16")


def get_json(path, timeout=60):
    with urllib.request.urlopen(BASE + path, timeout=timeout) as r:
        return json.loads(r.read())


def chain_request(graph_obj, tap_attn=5, img_hw=224):
    insts = [n["instance"] for n in graph_obj["nodes"]
             if n["instance"]["kind"] == "net_node"]
    nodes = [{"endpoint": i["endpoint"], "params": dict(i.get("params", {}))}
             for i in insts]
    edges = [{"out_port": {"node": 0, "channel": "o"}, "tensor": 0}]
    for i in range(1, len(nodes)):
        edges.append({"out_port": {"node": i, "channel": "o"},
                      "in_port": {"node": i - 1, "channel": "o"}})
    taps = [{"node": len(nodes) - 1, "channel": "o"},
            {"node": tap_attn, "channel": "attn"}]
    req = {"nodes": nodes, "edges": edges, "taps": taps,
           "resp_dtype": "bf16"}
    img = np.random.default_rng(0).random((3, img_hw, img_hw),
                                          dtype=np.float32)
    return bytes(encode_message(REQUEST_MAGIC, req, [img]))


def main():
    env = dict(os.environ)
    server = subprocess.Popen(
        [sys.executable, "-m", "interactive_vit_tpu.serving.server",
         "--models", MODEL, "--dtype", "bfloat16",
         "--port", str(PORT), "--no-speculate",
         "--jit-cache", "/tmp/ivt_jit_cache",
         "--graphs-dir", "/tmp/profile_tpu_graphs"]
        + (["--platform", "cpu"]
           if os.environ.get("PROFILE_PLATFORM") == "cpu" else []),
        env=env, cwd="/root/repo",
        stdout=open("/tmp/r3_profile_server.log", "w"),
        stderr=subprocess.STDOUT,
    )
    try:
        deadline = time.monotonic() + 900
        while True:
            try:
                get_json("/metrics", timeout=10)
                break
            except Exception:
                if server.poll() is not None or time.monotonic() > deadline:
                    raise RuntimeError("server did not come up")
                time.sleep(3)
        graph = get_json(f"/load_graph/{MODEL}.json")
        body = chain_request(graph)
        t0 = time.monotonic()
        req = urllib.request.Request(BASE + "/profile?iters=5&top=12",
                                     data=body, method="POST")
        with urllib.request.urlopen(req, timeout=900) as r:
            rep = json.loads(r.read())
        rep["endpoint_wall_s"] = round(time.monotonic() - t0, 1)
        print(json.dumps(rep, indent=2), flush=True)
        total = rep["total_device_us"]
        cc = rep["by_category_us"].get("custom-call", 0.0)
        print(f"\ndevice total {total / rep['iters'] / 1e3:.3f} ms/request; "
              f"custom-call (Pallas) share "
              f"{100.0 * cc / total if total else 0:.1f}%", flush=True)
    finally:
        server.kill()
        server.wait(timeout=30)


if __name__ == "__main__":
    main()
