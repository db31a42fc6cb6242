"""Structured Streaming queries (tumbling / session windows, stateful dedup)."""
