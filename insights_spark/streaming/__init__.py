"""Structured Streaming ingestion — the reference's replication loop, stream-ified."""
