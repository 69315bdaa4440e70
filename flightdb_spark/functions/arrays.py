"""Array-expression helpers shared across query modules."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def index_sequence(n: Column) -> Column:
    """``[0, 1, ..., n-1]``, EMPTY when ``n <= 0``.

    Spark's ``sequence(0, n-1)`` is DESCENDING ``[0, -1]`` for n = 0
    (DuckDB's ``range(0)`` is empty) — the textops.py:34 footgun that
    silently fabricates rows for inputs shorter than one unit. Every
    index-sliced segmentation (q130 segments, q154 frames) goes
    through this guard so sub-unit inputs produce no rows, matching
    their oracles."""
    return F.when(
        n >= 1, F.sequence(F.lit(0), (n - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
