"""Ops tier: Pallas TPU kernels + jnp reference paths + graph node kinds."""
