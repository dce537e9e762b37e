"""Structured Streaming operators: incremental document ingest (the blob
trigger analog) and watermarked windowed aggregation (SURVEY.md §2B B13)."""
