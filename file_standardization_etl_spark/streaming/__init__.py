"""Structured Streaming front-end: tail the change-log directory and feed
micro-batches into the exactly-once apply pipeline."""
