"""Round-4: the s8 score-dot fused block, measured (VERDICT r3 #5).

The one live single-chip candidate from the round-3 dot probes
(docs/kernels.md "dh=64 attention-dot probes": s8 batched dots 1.47x
bf16 in-fusion; score+PV ~35-40% of block time => ~+5% headline
ceiling). This experiment delivers the two halves the VERDICT asked for:

1. PERF: bench.py sweeps (maps-on and maps-off) with --block auto vs
   --block int8-scores, each in its own subprocess (one TPU process at
   a time; same methodology as every headline number).
2. FIDELITY on the TRAINED oracle (not random weights): quantized
   scores perturb the softmax, so the SERVED MAPS change — top-1
   agreement, logit MAE, per-layer attention-map MAE and rollout MAE
   vs the bf16 fused block on the memorize-oracle vit_t16.

Emits JSONL to /tmp/r4_int8_scores.jsonl. Synthetic-oracle caveat
applies (README "Accuracy caveat").
"""

import functools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r4_int8_scores.jsonl"
CKPT = "/tmp/r4_oracle_ckpt/vit_t16_oracle.safetensors"


def emit(**kw):
    kw["t"] = round(time.time(), 3)
    with open(OUT, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def fidelity():
    import numpy as np
    import jax
    import jax.numpy as jnp

    from interactive_vit_tpu.models import vit
    from interactive_vit_tpu.tools.convert import convert
    from interactive_vit_tpu.ops import fused_block as fb
    from interactive_vit_tpu.tools import train as T
    from interactive_vit_tpu.utils.safetensors_io import load_file

    if not os.path.exists(CKPT):
        os.makedirs(os.path.dirname(CKPT), exist_ok=True)
        t0 = time.time()
        T.main(["--variant", "vit_t16", "--steps", "600", "--batch",
                "64", "--lr", "1e-3", "--warmup", "50", "--clip-norm",
                "1.0", "--memorize", "256", "--distinct-classes", "64",
                "--eval-every", "200", "--log-every", "100",
                "--export-safetensors", CKPT])
        emit(stage="oracle_trained", wall_s=round(time.time() - t0, 1))

    cfg = vit.VARIANTS["vit_t16"]
    params = convert("vit_t16", "auto", load_file(CKPT))
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "astype") and jnp.issubdtype(
            jnp.asarray(x).dtype, jnp.floating) else x, params)
    images, labels = T.pattern_set(0, 256, cfg.img_size,
                                   cfg.num_classes, 64)

    def run(block_impl, batch=64):
        @jax.jit
        def fn(p, x):
            out = vit.forward(p, x, cfg, want_attn=True,
                              block_impl=block_impl)
            return out["logits"], out["attn"], out["rollout"]

        logits, attns, rolls = [], [], []
        for lo in range(0, len(labels), batch):
            x = jnp.asarray(images[lo:lo + batch], jnp.bfloat16)
            lg, at, ro = fn(params, x)
            logits.append(np.asarray(lg, np.float32))
            attns.append(np.asarray(jnp.stack(at) if isinstance(
                at, (list, tuple)) else at, np.float32))
            rolls.append(np.asarray(ro, np.float32))
        return (np.concatenate(logits),
                np.concatenate(attns, axis=1),
                np.concatenate(rolls))

    lg_a, at_a, ro_a = run(fb.fused_attn_block)
    lg_b, at_b, ro_b = run(functools.partial(fb.fused_attn_block,
                                             int8_scores=True))
    pa, pb = lg_a.argmax(-1), lg_b.argmax(-1)
    order = np.sort(lg_a, -1)
    emit(stage="fidelity",
         top1_bf16=float((pa == labels).mean()),
         top1_s8=float((pb == labels).mean()),
         agreement=float((pa == pb).mean()),
         margin_p50=float(np.median(order[:, -1] - order[:, -2])),
         logit_mae=float(np.mean(np.abs(lg_a - lg_b))),
         logit_mae_rel=float(np.mean(np.abs(lg_a - lg_b))
                             / (np.std(lg_a) + 1e-9)),
         attn_mae=float(np.mean(np.abs(at_a - at_b))),
         attn_max=float(np.max(np.abs(at_a - at_b))),
         rollout_mae=float(np.mean(np.abs(ro_a - ro_b))),
         rollout_max=float(np.max(np.abs(ro_a - ro_b))))


def perf():
    cases = ([(True, b, "bfloat16") for b in ("auto", "int8-scores")]
             + [(False, b, "bfloat16") for b in ("auto", "int8-scores")]
             # the all-s8 composition: W8A8 MLP + s8 score dots — both
             # hot paths on the int8 MXU rate
             + [(True, b, "int8w8a8") for b in ("auto", "int8-scores")])
    for maps, block, dtype in cases:
        if True:
            cmd = [sys.executable, "bench.py", "--variant", "vit_b16",
                   "--block", block, "--dtype", dtype]
            if not maps:
                cmd.append("--no-attn-maps")
            t0 = time.time()
            r = subprocess.run(cmd, cwd="/root/repo",
                               capture_output=True, text=True,
                               timeout=2400)
            line = [ln for ln in r.stdout.strip().splitlines()
                    if ln.startswith("{")]
            emit(stage="bench", maps=maps, block=block, dtype=dtype,
                 wall_s=round(time.time() - t0, 1),
                 result=json.loads(line[-1]) if line else None,
                 stderr_tail=r.stderr[-300:] if not line else "")


if __name__ == "__main__":
    open(OUT, "w").close()
    fidelity()
    perf()
    emit(stage="done")
