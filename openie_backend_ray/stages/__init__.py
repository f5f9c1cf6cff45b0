"""Ray Data pipeline stages (map_batches bodies and actor-pool classes)."""
