"""Watermarked stream-stream interval joins.

The streaming twin of the batch as-of/funnel queries (q79/q80): two
live event streams joined on a key plus an event-time interval, e.g.
"purchase within 30 minutes after the click". Spark's stream-stream
join buffers both sides in state; the watermarks PLUS the range
condition are what let it evict state — without them the buffers grow
forever, which is the 100 TB/day failure mode. With them, a left row
is dropped from state once the right watermark passes
``left_ts + horizon``, so state is bounded by rate x horizon.

The reference has no streaming joins (its ingest is single-key state,
fgae/addtrackfragment.go); this is engine-native Structured Streaming
(SURVEY §2.9's Spark mapping), no Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "l_ts",
    right_ts: str = "r_ts",
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner-join two streams on ``key`` where the right event falls in
    ``(left_ts, left_ts + horizon]``. Both sides get ``watermark`` of
    late-data tolerance; the interval bound makes the join state
    evictable (append output mode works because a match is final once
    emitted)."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] > lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, "inner").select(
        lw[key].alias(key),
        lw[left_ts].alias(left_ts),
        rw[right_ts].alias(right_ts),
        (F.unix_micros(rw[right_ts]) - F.unix_micros(lw[left_ts])).alias("lag_us"),
    )


def click_purchase_attribution(
    events: DataFrame,
    *,
    horizon: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Split one raw event stream into clicks and purchases and
    attribute each purchase to the clicks it followed within
    ``horizon`` — the streaming form of q80's conversion funnel (there:
    a batch forward as-of; here: every qualifying pair, emitted as soon
    as both sides arrive)."""
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("l_ts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("r_user"), F.col("ts").alias("r_ts")
    )
    lw = clicks.withWatermark("l_ts", watermark)
    rw = purchases.withWatermark("r_ts", watermark)
    cond = (
        (lw["user_id"] == rw["r_user"])
        & (rw["r_ts"] > lw["l_ts"])
        & (rw["r_ts"] <= lw["l_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return lw.join(rw, cond, "inner").select(
        "user_id",
        F.col("l_ts").alias("click_ts"),
        F.col("r_ts").alias("purchase_ts"),
        (F.unix_micros("r_ts") - F.unix_micros("l_ts")).alias("lag_us"),
    )
