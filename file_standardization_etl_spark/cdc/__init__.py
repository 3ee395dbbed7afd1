"""CDC core: change-event model, last-writer-wins dedup, validation split,
and the exactly-once MERGE batch pipeline."""
