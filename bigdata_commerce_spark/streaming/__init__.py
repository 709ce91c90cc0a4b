"""Structured Streaming pipelines (reference reqs 7-10)."""
