"""Session-level services: secrets, D1 attach (views), D1 batched writes."""
