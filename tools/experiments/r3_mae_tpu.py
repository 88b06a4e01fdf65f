"""Round-3: MAE pretraining on-chip — the self-supervised subsystem proof.

One process (CLAUDE.md trap #1), three stages, JSONL to /tmp/r3_mae.jsonl:

1. Pretrain mae_t16 (224 px, 196 patches, 75% mask) on a fixed 512-image
   patterned set on the v5e; log step throughput.
2. Held-out linear probe on frozen CLS features: pretrained vs random-init
   encoder (the SSL evidence), plus a probe on a NOISIER variant of the
   set where pixel shortcuts are weaker.
3. Export encoder + full tree, reload the full tree through the mae
   plugin, and run the reconstruct node through the executor on-chip
   (seed scrub = dynamic capture, second run must be a cache hit).
"""

import os
import time

import numpy as np

from _harness import make_emit, setup_jax

emit = make_emit("/tmp/r3_mae.jsonl")
jax = setup_jax()
emit(stage="start", devices=str(jax.devices()))

from interactive_vit_tpu.models import mae  # noqa: E402
from interactive_vit_tpu.tools import pretrain as P  # noqa: E402
from interactive_vit_tpu.tools import train as T  # noqa: E402

out_dir = "/tmp/r3_mae_ckpt"
os.makedirs(out_dir, exist_ok=True)
enc_path = os.path.join(out_dir, "mae_t16_enc.safetensors")
full_path = os.path.join(out_dir, "mae_t16_full.safetensors")

STEPS = int(os.environ.get("MAE_STEPS", "800"))
t0 = time.time()
P.main([
    "--variant", "mae_t16", "--steps", str(STEPS), "--batch", "64",
    "--lr", "1.5e-3", "--warmup", "50",
    "--memorize", "512", "--distinct-classes", "64",
    "--dtype", "bfloat16", "--log-every", "50",
    "--export-encoder", enc_path, "--export-safetensors", full_path,
])
emit(stage="pretrained", steps=STEPS, wall_s=round(time.time() - t0, 1),
     imgs_per_s=round(STEPS * 64 / (time.time() - t0), 1))

# -- probe: pretrained vs random encoder, clean and noisy sets ------------
import jax.numpy as jnp  # noqa: E402

from interactive_vit_tpu.models.weights import from_native_flat  # noqa: E402
from interactive_vit_tpu.utils.safetensors_io import load_file  # noqa: E402

cfg = mae.resolve_variant("mae_t16")
tree = from_native_flat(load_file(full_path))
tree.setdefault("enc", {}).setdefault("head", {})
rand = mae.init_params(jax.random.key(99), cfg, dtype=jnp.bfloat16)

images, labels = T.pattern_set(0, 512, 224, 64, 64)
rng = np.random.default_rng(7)
noisy = images + rng.normal(size=images.shape).astype(np.float32) * 0.5

enc_jit = jax.jit(lambda p, im: mae.encode(p, im, cfg, None)[:, 0])


def feats(params, imgs):
    out = []
    for i in range(0, len(imgs), 64):
        out.append(np.asarray(
            enc_jit(params, jnp.asarray(imgs[i:i + 64])), np.float32))
    return np.concatenate(out)


for tag, data in (("clean", images), ("noisy", noisy)):
    acc = P.linear_probe(feats(tree, data), labels, 64)
    acc0 = P.linear_probe(feats(rand, data), labels, 64)
    emit(stage="probe", set=tag, pretrained=round(acc, 4),
         random_init=round(acc0, 4))

# -- serve the reconstruction node through the executor -------------------
from interactive_vit_tpu.graph.executor import Executor  # noqa: E402
from interactive_vit_tpu.graph.ir import Graph  # noqa: E402
from interactive_vit_tpu.graph.registry import Registry  # noqa: E402
from interactive_vit_tpu.models.mae_plugin import make_mae_model  # noqa: E402

reg = Registry()
make_mae_model("mae_t16", params=tree, dtype=jnp.bfloat16).register(reg)
ex = Executor(reg)


def run_once(seed):
    g = Graph()
    r = g.add_node("mae_t16:reconstruct", {"seed": seed})
    g.add_input(images[:1], r, "o")
    t = time.time()
    out = ex.run(g, taps={(r.index, ch)
                          for ch in ("o", "masked", "err", "mask")})
    wall = time.time() - t
    err = float(np.asarray(out[r.index]["err"], np.float32).sum()
                / np.asarray(out[r.index]["mask"], np.float32).sum())
    return wall, err


w1, err1 = run_once("1")
w2, err2 = run_once("2")   # dynamic seed: must be a cache hit
emit(stage="reconstruct_node", cold_s=round(w1, 2), warm_s=round(w2, 2),
     masked_mse_seed1=round(err1, 4), masked_mse_seed2=round(err2, 4))

# random-init reconstruction error for scale (should be much worse)
reg2 = Registry()
make_mae_model("mae_t16", params=rand, dtype=jnp.bfloat16).register(reg2)
ex2 = Executor(reg2)
g = Graph()
r = g.add_node("mae_t16:reconstruct", {"seed": "1"})
g.add_input(images[:1], r, "o")
out = ex2.run(g, taps={(r.index, "err"), (r.index, "mask")})
err0 = float(np.asarray(out[r.index]["err"], np.float32).sum()
             / np.asarray(out[r.index]["mask"], np.float32).sum())
emit(stage="reconstruct_baseline", random_init_mse=round(err0, 4),
     trained_mse=round(err1, 4))
emit(stage="done")
print("r3_mae_tpu complete")
