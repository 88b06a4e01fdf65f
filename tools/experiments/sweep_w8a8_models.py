"""W8A8 MLP kernel across model families (single TPU process).

Extends the ViT-B measurements (docs/kernels.md) to the DINO family and
ViT-L maps-on: the MLP share of FLOPs grows with width, so the int8 MXU
rate should pay more at D=768/1024 than at D=384.

Writes JSON lines to /tmp/r3_w8a8_models.jsonl.
"""

from _harness import make_emit, model_sweep, setup_jax

emit = make_emit("/tmp/r3_w8a8_models.jsonl")
jax = setup_jax()

emit(stage="start", devices=str(jax.devices()))

# DINO family: bf16 numbers exist (sweep_dino); W8A8 deltas
model_sweep(emit, "dino_s16", "w8a8kern", True, [64, 128],
            quant="mlp_w8a8")
model_sweep(emit, "dino_b16", "w8a8kern", True, [32, 64],
            quant="mlp_w8a8")

# ViT-L maps-on W8A8 (bf16: 371 @ b16; maps-off w8a8: 400.6 @ b32)
model_sweep(emit, "vit_l16", "w8a8kern", True, [8, 16],
            quant="mlp_w8a8")

emit(stage="done")
