"""Ray Data stages: `map_batches` wrappers around the pure kernel."""
