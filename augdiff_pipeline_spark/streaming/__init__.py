"""Structured Streaming front-end for the minutely replication feed."""
