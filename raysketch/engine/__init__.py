"""Ray Data execution layer: pipelines, aggregation, shuffle, checkpointing."""
