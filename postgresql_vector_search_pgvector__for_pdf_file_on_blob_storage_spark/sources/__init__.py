"""Sources: parquet fixtures (tables.py), binary-file document ingest
(binary.py — the blob-container analog, SURVEY.md §2A row 1)."""
