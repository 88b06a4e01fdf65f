"""Wire tier: the binary tensor protocol and the graph JSON schema."""
