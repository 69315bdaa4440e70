"""Sources: batch and streaming ingest connectors (SURVEY.md §2.1)."""
