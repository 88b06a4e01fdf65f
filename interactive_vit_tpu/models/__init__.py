"""Model tier: functional pytree models exposed as tappable graph nodes."""
