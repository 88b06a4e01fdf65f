"""Off-grid batch knees (single TPU process).

The ViT-B bf16 sweep had its knee AT batch 96 while 64/112/128 all read
~4050 — power-of-two-only sweeps miss it (docs/kernels.md "batch-96
knee"). Probe the same gaps for the other families whose curves peaked
at the largest batch tried. Writes /tmp/r3_knees.jsonl.
"""

from _harness import make_emit, model_sweep, setup_jax

emit = make_emit("/tmp/r3_knees.jsonl")
jax = setup_jax()

emit(stage="start", devices=str(jax.devices()))

# dino_s16 peaked at 128 (largest tried): go higher + the 96 gap
model_sweep(emit, "dino_s16", "bf16", True, [96, 160, 192, 256])

# dino_s8 maps-on peaked at 16 (largest tried)
model_sweep(emit, "dino_s8", "bf16", True, [24, 32])

# vit_l16 maps-on: 16 was the cap (32 OOMs); probe 20/24
model_sweep(emit, "vit_l16", "bf16", True, [20, 24])

emit(stage="done")
