"""Utilities: checkpointing, tracing/profiling, numeric debugging."""
