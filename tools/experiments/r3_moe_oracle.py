"""Round-3: the MoE family's end-to-end accuracy oracle on-chip.

Mirrors r3_oracle.py for vit_moe_s16: train on the v5e to memorize a
fixed 256-image / 64-class patterned set (Switch aux loss in the
objective — parallel/train.loss_fn routes MoE configs automatically),
export through the native safetensors path (rank-3 expert weights),
serve with --ckpt semantics, and measure top-1 through the FULL wire +
executor + batcher path. Additionally taps the router channel on every
MoE block to report post-training expert utilization (a collapsed
router would show one dominant expert despite the aux loss).

Emits JSONL to /tmp/r3_moe_oracle.jsonl.
"""

import os
import threading
import time
import urllib.request

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_moe_oracle.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.tools import train as T  # noqa: E402

out_dir = "/tmp/r3_moe_oracle_ckpt"
st_path = os.path.join(out_dir, "vit_moe_s16_oracle.safetensors")
os.makedirs(out_dir, exist_ok=True)

t0 = time.time()
T.main([
    "--variant", "vit_moe_s16", "--steps", "600", "--batch", "64",
    "--lr", "1e-3", "--warmup", "50", "--clip-norm", "1.0",
    "--memorize", "256", "--distinct-classes", "64",
    "--eval-every", "200", "--log-every", "100",
    "--export-safetensors", st_path,
])
emit(stage="trained", wall_s=round(time.time() - t0, 1))

from interactive_vit_tpu.graph.ir import Graph  # noqa: E402
from interactive_vit_tpu.serving.server import build_app  # noqa: E402
from interactive_vit_tpu.wire.codec import Request, Response  # noqa: E402

app = build_app(models=("vit_moe_s16",), ckpts={"vit_moe_s16": st_path},
                dtype_name="float32", max_wait_ms=5.0)
httpd = app.serve("127.0.0.1", 0, background=True)
base = f"http://127.0.0.1:{httpd.server_address[1]}"

images, labels = T.pattern_set(0, 256, 224, 1000, 64)
chain = (["vit_moe_s16:embed"]
         + [f"vit_moe_s16:blocks.{i}" for i in range(12)]
         + ["vit_moe_s16:norm", "vit_moe_s16:head"])
MOE_BLOCKS = [i for i in range(12) if i % 2 == 1]


def make_graph(img):
    g = Graph()
    nodes = [g.add_node(nm) for nm in chain]
    for a, b in zip(nodes, nodes[1:]):
        g.connect(a, "o", b, "o")
    g.add_input(img, nodes[0], "o")
    return g


n_eval = 64
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

# expert utilization after training: explicit router taps on every MoE
# block for a batch of 8 memorized images through the same wire path
from interactive_vit_tpu.wire.codec import (  # noqa: E402
    REQUEST_MAGIC, encode_message,
)

img_batch = np.stack([images[i] for i in range(8)])
nodes_json = [{"endpoint": nm, "params": {}} for nm in chain]
edges_json = [{"out_port": {"node": 0, "channel": "o"}, "tensor": 0}]
for i in range(1, len(chain)):
    edges_json.append({"out_port": {"node": i, "channel": "o"},
                       "in_port": {"node": i - 1, "channel": "o"}})
obj = {"nodes": nodes_json, "edges": edges_json,
       "taps": [{"node": 1 + b, "channel": "experts"}
                for b in MOE_BLOCKS]}
body = bytes(encode_message(REQUEST_MAGIC, obj, [img_batch]))
hreq = urllib.request.Request(base + "/compute", data=body, method="POST")
with urllib.request.urlopen(hreq, timeout=600) as r:
    outs = Response.decode(r.read())
util = {}
for b in MOE_BLOCKS:
    gates = np.asarray(outs[1 + b]["experts"], dtype=np.float32)
    # [B, E, gh, gw] heatmaps -> argmax expert per patch -> usage counts
    assign = gates.argmax(axis=1).reshape(-1)
    counts = np.bincount(assign, minlength=gates.shape[1])
    util[f"blocks.{b}"] = {
        "active_experts": int((counts > 0).sum()),
        "max_share": round(float(counts.max() / counts.sum()), 3),
    }
emit(stage="expert_utilization", util=util)
httpd.shutdown()
app.batcher.stop()
emit(stage="done")
