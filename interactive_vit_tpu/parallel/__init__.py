"""Parallel tier: device meshes, sharding rules, sharded train/infer steps."""
