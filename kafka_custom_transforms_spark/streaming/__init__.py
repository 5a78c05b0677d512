"""Structured Streaming integration: envelope sources, stateful dedup."""
