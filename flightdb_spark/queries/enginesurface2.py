"""Engine-surface batch 57 (q365-q366): Spark's native Datasketches
HLL aggregate measured against exact distinct counts (rows-only —
DuckDB's approx_count_distinct is a different sketch, so the oracle
can't hash-match; the accuracy bound is pinned in tests instead),
and the window-function parity battery (first/last/nth value with
IGNORE NULLS, dense_rank, percent_rank, cume_dist — the surfaces a
SQL port exercises first, verified cell-exact against DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# ---------------------------------------------------------------------------
# q365 — HLL sketch accuracy (rows-only: engine-native sketch)


@query("q365_hll_sketch")
def q365_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-native HyperLogLog (Datasketches hll_sketch_agg,
    lgConfigK = 12) per event type, reported beside the exact
    distinct user count and the relative error — the engine's own
    approximate-distinct surface, exercised end-to-end (build,
    estimate) the way a 100 TB pipeline would replace
    COUNT(DISTINCT) for dashboards. Rows-only by necessity: DuckDB's
    approx sketch is a different algorithm; the HLL error bound
    (~1.6% at lgK 12, asserted < 5% in tests) is the correctness
    contract instead. Scale: sketches merge associatively map-side —
    the whole point of replacing exact distinct at scale."""
    ev = load_table(spark, sf_dir, "events")
    sk = ev.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").alias(
            "hll_estimate"
        ),
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct"),
    )
    return sk.select(
        "event_type",
        F.col("hll_estimate").cast("bigint").alias("hll_estimate"),
        "exact_distinct",
        F.round(
            F.abs(
                F.col("hll_estimate").cast("double")
                - F.col("exact_distinct")
            )
            / F.col("exact_distinct"),
            6,
        ).alias("rel_error"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q366 — window-function parity battery


@query(
    "q366_window_battery",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN event_type = 'error' THEN NULL
                  ELSE ROUND(value, 6) END AS v
      FROM events
    ),
    windowed AS (
      SELECT user_id, event_id,
             FIRST_VALUE(v IGNORE NULLS) OVER w AS first_v,
             LAST_VALUE(v IGNORE NULLS) OVER w2 AS last_v,
             NTH_VALUE(v, 3 IGNORE NULLS) OVER w2 AS third_v,
             DENSE_RANK() OVER w AS dr,
             PERCENT_RANK() OVER w AS pr,
             CUME_DIST() OVER w AS cd
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             w2 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id % 10 AS user_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(CAST(SUM(CAST(ROUND(first_v, 6) AS DECIMAL(38,6)))
             AS DOUBLE), 4) AS sum_first,
           ROUND(CAST(SUM(CAST(ROUND(last_v, 6) AS DECIMAL(38,6)))
             AS DOUBLE), 4) AS sum_last,
           ROUND(CAST(SUM(CAST(ROUND(COALESCE(third_v, 0), 6)
             AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_third,
           CAST(SUM(dr) AS BIGINT) AS sum_dense_rank,
           ROUND(CAST(SUM(CAST(ROUND(pr, 9) AS DECIMAL(38,9))) AS DOUBLE),
             4) AS sum_pct_rank,
           ROUND(CAST(SUM(CAST(ROUND(cd, 9) AS DECIMAL(38,9))) AS DOUBLE),
             4) AS sum_cume_dist
    FROM windowed GROUP BY 1 ORDER BY 1
    """,
)
def q366_window_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function parity battery: FIRST_VALUE / LAST_VALUE /
    NTH_VALUE with IGNORE NULLS (error-event values are nulled so the
    skip logic actually fires), DENSE_RANK, PERCENT_RANK and
    CUME_DIST over user-ordered frames, checksummed per user bucket
    so every cell of every function participates in the hash — the
    window surfaces a SQL port exercises first, proven cell-exact
    against DuckDB. Scale: one user shuffle shared by both frames;
    checksums ride rounded DECIMAL."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "error", F.lit(None))
        .otherwise(F.round("value", 6))
        .alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    w2 = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    windowed = base.select(
        "user_id",
        F.first("v", ignorenulls=True).over(w).alias("first_v"),
        F.last("v", ignorenulls=True).over(w2).alias("last_v"),
        F.nth_value("v", 3, ignoreNulls=True).over(w2).alias("third_v"),
        F.dense_rank().over(w).alias("dr"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
    d6 = "decimal(38,6)"
    return (
        windowed.groupBy((F.col("user_id") % 10).alias("user_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(
                F.sum(F.round("first_v", 6).cast(d6)).cast("double"), 4
            ).alias("sum_first"),
            F.round(
                F.sum(F.round("last_v", 6).cast(d6)).cast("double"), 4
            ).alias("sum_last"),
            F.round(
                F.sum(
                    F.round(F.coalesce(F.col("third_v"), F.lit(0)), 6).cast(
                        d6
                    )
                ).cast("double"),
                4,
            ).alias("sum_third"),
            F.sum("dr").cast("bigint").alias("sum_dense_rank"),
            F.round(
                F.sum(F.round("pr", 9).cast("decimal(38,9)")).cast("double"),
                4,
            ).alias("sum_pct_rank"),
            F.round(
                F.sum(F.round("cd", 9).cast("decimal(38,9)")).cast("double"),
                4,
            ).alias("sum_cume_dist"),
        )
        .orderBy("user_bucket")
    )
