"""Serving tier: HTTP endpoints, micro-batcher, metrics."""
