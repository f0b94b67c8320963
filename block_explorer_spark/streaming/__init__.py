"""Structured Streaming shell around the batch engine."""
