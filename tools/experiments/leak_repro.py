"""Serving-path memory-leak repro on the CPU backend.

The TPU soak shows VmRSS growing ~0.8 MB/request (linear, 3941 requests
-> +3.1 GB) with every server-side cache bounded. This drives the same
/compute path in-process on CPU with (a) tiny cos graphs (no big
tensors: plumbing-only) and (b) vit_t16-with-distinct-images (the soak
shape), sampling VmRSS + tracemalloc top allocation sites per phase.
"""
import gc
import sys
import tracemalloc

sys.path.insert(0, "/root/repo")
import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def vmrss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024
    return -1.0


from interactive_vit_tpu.graph.ir import Graph
from interactive_vit_tpu.graph.registry import Registry
from interactive_vit_tpu.ops.node_ops import register_builtin
from interactive_vit_tpu.serving.app import App
from interactive_vit_tpu.wire.codec import Request, Response

reg = Registry()
register_builtin(reg)
from interactive_vit_tpu.models import vit as vit_mod
from interactive_vit_tpu.models.vit_plugin import make_vit_model

cfg = vit_mod.ViTConfig("vit_leak", img_size=64, patch=16, width=64,
                        depth=2, heads=4, num_classes=10)
vit_mod.VARIANTS["vit_leak"] = cfg
make_vit_model("vit_leak").register(reg)

app = App(reg=reg, graphs_dir="/tmp")
httpd = app.serve("127.0.0.1", 0, background=True)
import urllib.request

base = f"http://127.0.0.1:{httpd.server_address[1]}"


def post(body):
    return urllib.request.urlopen(
        urllib.request.Request(base + "/compute", data=body), timeout=120
    ).read()


def cos_graph(x):
    g = Graph()
    n = g.add_node("cos", {"A": "2.0"})
    g.add_input(x, n, "o")
    return g


def vit_graph(img):
    g = Graph()
    prev = None
    nodes = []
    for lname in ["vit_leak:transform", "vit_leak:embed",
                  "vit_leak:blocks.0", "vit_leak:blocks.1",
                  "vit_leak:norm", "vit_leak:head"]:
        n = g.add_node(lname)
        nodes.append(n)
        if prev is not None:
            g.connect(prev, "o", n, "o")
        prev = n
    g.add_input(img, nodes[0], "o")
    return g


def phase(name, make_body, n, warmup=5):
    for i in range(warmup):
        post(make_body(i))
    gc.collect()
    tracemalloc.start(10)
    snap0 = tracemalloc.take_snapshot()
    r0 = vmrss_mb()
    for i in range(n):
        post(make_body(100 + i))
    gc.collect()
    r1 = vmrss_mb()
    snap1 = tracemalloc.take_snapshot()
    tracemalloc.stop()
    print(f"\n== {name}: {n} requests, VmRSS {r0:.0f} -> {r1:.0f} MB "
          f"({(r1 - r0) * 1024 / n:.0f} KB/req)")
    for st in snap1.compare_to(snap0, "traceback")[:6]:
        if st.size_diff < 256 * 1024:
            continue
        print(f"  +{st.size_diff / 1e6:.1f} MB / {st.count_diff} blocks")
        for line in st.traceback.format()[-4:]:
            print("   ", line)


rng = np.random.default_rng(0)

# (a) plumbing only: same tiny graph, same bytes each time
x = np.linspace(0, 1, 64, dtype=np.float32)
body_same = bytes(Request.encode(cos_graph(x)))
phase("cos, identical request", lambda i: body_same, 300)

# (b) distinct tiny inputs (input-cache path, tiny tensors)
phase("cos, distinct 64-float inputs",
      lambda i: bytes(Request.encode(cos_graph(
          np.full(64, i, np.float32)))), 300)

# (c) the soak shape: distinct images through a model chain
phase("vit, distinct 64px images",
      lambda i: bytes(Request.encode(vit_graph(
          rng.random((3, 64, 64), dtype=np.float32)))), 200)

httpd.shutdown()
app.batcher.stop()
print("\ndone")
