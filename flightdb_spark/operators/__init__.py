"""Operators: derived columns, as-of joins, geo intersection, sampling,
track selection, dedup, similarity, multimodal (SURVEY.md §2)."""
