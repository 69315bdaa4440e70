"""Watermarked streaming aggregates over the events stream.

Streaming twins of the batch registry queries: tumbling-window counts
(q19/q20's window shape) and session-window stats (q14's shape), both
bounded by event-time watermarks so state is evicted once late data can
no longer arrive — the only state discipline that survives 100 TB/day
ingest. Late rows inside the watermark merge into their window; rows
later than the watermark are dropped by design (reference behavior:
fdb's ingest tolerates misordered fragments within a bounded horizon,
SURVEY §2.9).

All aggregation is built-in windowed groupBy — no Python in the path;
``applyInPandasWithState`` is reserved for genuinely custom state
machines (streaming/assembly.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    stream: DataFrame,
    *,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window event counts per event_type with late-data
    tolerance = ``watermark``. Output one row per (window, event_type)
    in append-compatible update mode; state for a window is dropped once
    the watermark passes its end."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_user_stats(
    stream: DataFrame,
    *,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user session stats with a ``gap`` inactivity timeout
    (session_window — dynamic-length windows that extend while events
    keep arriving within the gap). A session closes, emits, and frees
    its state when the watermark passes (last event + gap)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_col).alias("first_ts"),
            F.max(ts_col).alias("last_ts"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("sess_start"),
            "n_events",
            "first_ts",
            "last_ts",
        )
    )


def enrich_stream_static(
    stream: DataFrame,
    dim: DataFrame,
    *,
    key: str = "user_id",
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against
    the (re-read-per-batch) static dimension. Spark broadcasts a
    small dim automatically, so the streaming side never shuffles and
    there is no state to watermark — the dim IS the state, refreshed
    from storage each batch. The streaming twin of the airframe/
    schedule enrichment joins (operators/enrich.py)."""
    return stream.join(F.broadcast(dim), key, how)


def sliding_window_stats(
    stream: DataFrame,
    *,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """SLIDING-window stats per event_type — the third windowing mode
    beside tumbling (windowed_event_counts) and session
    (sessionized_user_stats): each event lands in window/slide
    overlapping windows (2 here), the shape behind moving-average
    dashboards and the streaming twin of q262's trailing frame. Late
    rows inside the watermark merge into every window that covers
    them; state for a window is freed once the watermark passes its
    end. Overlap multiplies state by window/slide — at 100 TB keep
    that ratio small and let the watermark do the eviction.

    Built-in windowed groupBy only; sums ride DECIMAL so merged
    emissions are order-free."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
