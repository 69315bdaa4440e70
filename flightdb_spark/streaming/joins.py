"""Watermarked stream-stream joins.

The attribution join a real event pipeline runs at ingest: clicks
joined to the impression that preceded them within a bounded horizon,
both sides unbounded streams. Spark's stream-stream join keeps each
side's rows in state until the watermark plus the join's time bound
proves no future match can arrive, then evicts — the only state
discipline that survives an unbounded 100 TB/day feed. The time-range
predicate is REQUIRED (an unconstrained stream-stream join would buffer
both streams forever); this module makes it structural.

Batch parity: the same function body works on bounded DataFrames (the
watermark is a no-op), so tests compare stream output against the
batch twin row for row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_within_horizon(
    leads: DataFrame,
    follows: DataFrame,
    *,
    key: str = "user_id",
    ts_col: str = "ts",
    horizon: str = "10 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join each ``follows`` row (e.g. a click) to every ``leads`` row
    (e.g. an impression) with the same key whose timestamp falls within
    [follow_ts - horizon, follow_ts]. ``how`` may be 'inner' or
    'leftOuter' (left = follows; unmatched follows emit once the
    watermark passes — Spark requires the watermark + time bound for
    outer stream-stream joins so it can declare a row unmatched).

    State bound: each side holds ``watermark + horizon`` of data per
    key, independent of total stream length."""
    if how not in ("inner", "leftOuter", "left_outer", "left"):
        raise ValueError(
            f"how={how!r} unsupported: unmatched LEAD rows would emit with a "
            "NULL key/follow_id — only 'inner' and 'leftOuter' (left = "
            "follows) are meaningful for attribution"
        )
    lead = (
        leads.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("lead_key"),
            F.col(ts_col).alias("lead_ts"),
            F.col("event_id").alias("lead_id"),
        )
    )
    follow = (
        follows.withWatermark(ts_col, watermark)
        .select(
            F.col(key).alias("follow_key"),
            F.col(ts_col).alias("follow_ts"),
            F.col("event_id").alias("follow_id"),
        )
    )
    cond = (
        (F.col("lead_key") == F.col("follow_key"))
        & (F.col("lead_ts") <= F.col("follow_ts"))
        & (F.col("lead_ts") >= F.col("follow_ts") - F.expr(f"INTERVAL {horizon}"))
    )
    joined = follow.join(lead, cond, how)
    return joined.select(
        F.col("follow_key").alias(key),
        "follow_id",
        "follow_ts",
        "lead_id",
        "lead_ts",
    )
