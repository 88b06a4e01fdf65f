"""Round-3: the on-chip accuracy oracle (VERDICT r2 #4, chip half).

Trains REAL vit_t16 (1000-class, 224 px) on the v5e to memorize a fixed
256-image / 64-class patterned set, exports through the native
safetensors path, then serves it in-process and measures top-1 through
the FULL wire + executor + batcher path. Emits JSONL to /tmp/r3_oracle.jsonl.
"""

import os
import tempfile
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_oracle.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.models import vit  # noqa: E402
from interactive_vit_tpu.tools import train as T  # noqa: E402

out_dir = "/tmp/r3_oracle_ckpt"
st_path = os.path.join(out_dir, "vit_t16_oracle.safetensors")
os.makedirs(out_dir, exist_ok=True)

t0 = time.time()
T.main([
    "--variant", "vit_t16", "--steps", "600", "--batch", "64",
    "--lr", "1e-3", "--warmup", "50", "--clip-norm", "1.0",
    "--memorize", "256", "--distinct-classes", "64",
    "--eval-every", "200", "--log-every", "100",
    "--export-safetensors", st_path,
])
emit(stage="trained", wall_s=round(time.time() - t0, 1))

# serve it: full wire + executor + batcher, concurrent clients
import threading  # noqa: E402
import urllib.request  # noqa: E402

from interactive_vit_tpu.graph.ir import Graph  # noqa: E402
from interactive_vit_tpu.serving.server import build_app  # noqa: E402
from interactive_vit_tpu.wire.codec import Request, Response  # noqa: E402

app = build_app(models=("vit_t16",), ckpts={"vit_t16": st_path},
                dtype_name="float32", max_wait_ms=5.0)
httpd = app.serve("127.0.0.1", 0, background=True)
base = f"http://127.0.0.1:{httpd.server_address[1]}"

images, labels = T.pattern_set(0, 256, 224, 1000, 64)
chain = (["vit_t16:embed"]
         + [f"vit_t16:blocks.{i}" for i in range(12)]
         + ["vit_t16:norm", "vit_t16:head"])


def make_graph(img):
    g = Graph()
    nodes = [g.add_node(nm) for nm in chain]
    for a, b in zip(nodes, nodes[1:]):
        g.connect(a, "o", b, "o")
    g.add_input(img, nodes[0], "o")
    return g


n_eval = 64  # 64 of the 256 memorized images, concurrent batches of 8
preds = [None] * n_eval


def worker(i):
    body = Request.encode(make_graph(images[i]))
    req = urllib.request.Request(base + "/compute", data=body,
                                 method="POST")
    with urllib.request.urlopen(req, timeout=600) as r:
        outs = Response.decode(r.read())
    logits = [v for sub in outs.values() for v in sub.values()
              if v.ndim == 2 and v.shape[-1] == 1000]
    preds[i] = int(np.asarray(logits[-1]).argmax())


t0 = time.time()
for lo in range(0, n_eval, 8):
    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(lo, lo + 8)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
acc = float(np.mean([p == int(l) for p, l in zip(preds, labels[:n_eval])]))
emit(stage="served_top1", acc=acc, n=n_eval,
     wall_s=round(time.time() - t0, 1))
httpd.shutdown()
app.batcher.stop()
emit(stage="done")
