"""Graph tier: IR, node-kind registry, and the staging executor."""
