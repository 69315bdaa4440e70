"""Streaming-design & engine-surface batch 43 (q327-q329): the
watermark-lateness audit (how late do events actually arrive, and
what would each watermark setting drop?), the nearest-direction
as-of join (registering operators/asof.asof_join_nearest under the
oracle gate — backward and forward variants are already gated via
q16/q79 and the funnel queries), and null-safe join semantics
(Spark `<=>` vs ANSI equality — the engine-surface behavior every
dimension join with nullable keys depends on).

Determinism: lateness is exact integer seconds from a per-key
running max; nearest-gap aggregates use the unique min |gap| per
row; null-safe group counts are exact integers with explicit
NULLS FIRST ordering on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# ---------------------------------------------------------------------------
# q327 — watermark lateness audit


@query(
    "q327_watermark_lateness",
    oracle="""
    WITH arr AS (
      SELECT user_id, event_id, epoch_us(ts) AS eu,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS runmax
      FROM events
    ),
    late AS (SELECT runmax - eu AS late_us FROM arr),
    bucketed AS (
      SELECT CASE WHEN late_us <= 0 THEN 'a_on_time'
                  WHEN late_us <= 3600000000 THEN 'b_within_1h'
                  WHEN late_us <= 21600000000 THEN 'c_within_6h'
                  WHEN late_us <= 86400000000 THEN 'd_within_24h'
                  ELSE 'e_over_24h' END AS bucket,
             late_us
      FROM late
    ),
    tot AS (SELECT COUNT(*) AS n FROM bucketed)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(COUNT(*) * 1.0 / MAX(t.n), 6) AS frac,
           CAST(MAX(late_us) AS BIGINT) AS max_late_us
    FROM bucketed, tot t
    GROUP BY bucket ORDER BY bucket
    """,
)
def q327_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit: replaying events in arrival order
    (event_id) per user, how far behind the per-key high-water mark
    does each event's timestamp arrive? The bucket table (on-time /
    1h / 6h / 24h / worse) is exactly the evidence used to size a
    Structured Streaming `withWatermark` — every bucket a candidate
    setting would DROP is visible with its mass (streaming/
    assembly.py consumes the same tolerance; this measures it from
    data). Scale: one user-partitioned running max (no global
    window), then a 5-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    eu = F.unix_micros("ts")
    late = ev.select((F.max(eu).over(w) - eu).alias("late_us"))
    bucket = (
        F.when(F.col("late_us") <= 0, "a_on_time")
        .when(F.col("late_us") <= 3_600_000_000, "b_within_1h")
        .when(F.col("late_us") <= 21_600_000_000, "c_within_6h")
        .when(F.col("late_us") <= 86_400_000_000, "d_within_24h")
        .otherwise("e_over_24h")
    )
    bucketed = late.select(bucket.alias("bucket"), "late_us")
    tot = bucketed.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("late_us").cast("bigint").alias("max_late_us"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_events",
            F.round(F.col("n_events") * 1.0 / F.col("nn"), 6).alias("frac"),
            "max_late_us",
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q328 — nearest-direction as-of join


@query(
    "q328_asof_nearest",
    oracle="""
    WITH clicks AS (
      SELECT user_id, event_id, epoch_us(ts) AS eu
      FROM events WHERE event_type = 'click'
    ),
    buys AS (
      SELECT user_id, epoch_us(ts) AS eu FROM events
      WHERE event_type = 'purchase'
    ),
    gaps AS (
      SELECT c.user_id, c.event_id,
             MIN(ABS(c.eu - b.eu)) AS min_gap_us
      FROM clicks c JOIN buys b ON b.user_id = c.user_id
      GROUP BY c.user_id, c.event_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_clicks,
           CAST(SUM(CASE WHEN min_gap_us = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_simultaneous,
           ROUND(SUM(min_gap_us) * 1.0 / COUNT(*) / 1000000, 6) AS avg_gap_s,
           CAST(MAX(min_gap_us) AS BIGINT) AS max_gap_us
    FROM gaps
    """,
)
def q328_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join (either direction, backward wins
    ties — pandas merge_asof 'nearest'): every click matched to its
    temporally closest purchase by the same user, summarized as
    match count and gap statistics. Registers
    operators/asof.asof_join_nearest under the oracle gate; the
    oracle verifies through the direction-free identity min |gap| —
    per-click unique, so tie-breaking between equidistant matches
    can't leak into the hash. Scale: two user-keyed window passes
    (the second reuses the first's partitioning), never a time-theta
    join; the oracle's per-user pair join is the small-data anchor."""
    from ..operators.asof import asof_join_nearest

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("buy_value")
    )
    j = asof_join_nearest(
        clicks, buys, on="user_id", value_cols=("buy_value",)
    )
    matched = j.filter(F.col("ts_asof").isNotNull()).select(
        F.abs(F.unix_micros("ts") - F.unix_micros("ts_asof")).alias("gap_us")
    )
    return matched.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matched_clicks"),
        F.sum(F.when(F.col("gap_us") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_simultaneous"),
        F.round(
            F.sum("gap_us") * 1.0 / F.count(F.lit(1)) / 1000000, 6
        ).alias("avg_gap_s"),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


# ---------------------------------------------------------------------------
# q329 — null-safe join semantics


@query(
    "q329_nullsafe_join",
    oracle="""
    WITH a AS (
      SELECT CASE WHEN o_orderkey % 10 = 0 THEN NULL
                  ELSE o_orderpriority END AS k,
             CAST(COUNT(*) AS BIGINT) AS na
      FROM orders GROUP BY 1
    ),
    b AS (
      SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS k,
             CAST(COUNT(*) AS BIGINT) AS nb
      FROM orders GROUP BY 1
    )
    SELECT a.k AS key, a.na, b.nb,
           CAST(a.na * b.nb AS BIGINT) AS n_pairs
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    ORDER BY key NULLS FIRST
    """,
)
def q329_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe join semantics: two order-derived dimensions with
    deliberately NULLed keys joined with Spark's `<=>` (DuckDB's
    IS NOT DISTINCT FROM) so the NULL group MATCHES itself instead
    of silently dropping — the engine-surface behavior that decides
    whether unknown-bucket rows survive a dimension join. The output
    exposes the NULL-NULL pair mass first (explicit NULLS FIRST on
    both engines, where default sort order differs). Scale: two
    5-key aggregates and a broadcast null-safe equi-join."""
    o = load_table(spark, sf_dir, "orders")
    key = F.when(F.col("o_orderkey") % 10 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    key_b = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
        F.col("o_orderpriority")
    )
    a = o.groupBy(key.alias("k")).agg(
        F.count(F.lit(1)).cast("bigint").alias("na")
    )
    b = o.groupBy(key_b.alias("kb")).agg(
        F.count(F.lit(1)).cast("bigint").alias("nb")
    )
    return (
        a.join(F.broadcast(b), F.col("k").eqNullSafe(F.col("kb")))
        .select(
            F.col("k").alias("key"),
            "na",
            "nb",
            (F.col("na") * F.col("nb")).cast("bigint").alias("n_pairs"),
        )
        .orderBy(F.col("key").asc_nulls_first())
    )
