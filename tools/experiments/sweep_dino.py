"""DINO feature-extractor throughput on the real chip (single process).

  1. dino_s16 (197 tokens, D=384): maps on/off
  2. dino_s8  (785 tokens, D=384): the longest sequence served — past
     ROWFULL_MAX_N, so maps-off rides the online-softmax kernel; maps-on
     exercises the headwise/row-resident tap path at N=785
  3. dino_b16 (197 tokens, D=768) maps on — ViT-B-class feature extractor

Writes JSON lines to /tmp/r3_dino.jsonl, traces under /tmp/r3_traces/.
"""

from _harness import make_emit, model_sweep, setup_jax

emit = make_emit("/tmp/r3_dino.jsonl")
jax = setup_jax()

emit(stage="start", devices=str(jax.devices()))

model_sweep(emit, "dino_s16", "bf16", True, [32, 64, 128], trace_batch=64)
model_sweep(emit, "dino_s16", "bf16", False, [64, 128])

model_sweep(emit, "dino_s8", "bf16", False, [8, 16, 32], trace_batch=16)
model_sweep(emit, "dino_s8", "bf16", True, [4, 8, 16])

model_sweep(emit, "dino_b16", "bf16", True, [32, 64])

emit(stage="done")
