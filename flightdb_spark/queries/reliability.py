"""Reliability batch 52 (q351-q352): SRE analytics over the event
stream — SLO burn rate (error-budget consumption in fast and slow
windows, the Google-SRE multiwindow alert) and MTBF/MTTR (mean time
between failure runs and mean time to recover, from gaps-and-islands
over error events).

Determinism: rates are exact count ratios; durations are exact
microsecond differences; every mean divides once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

SLO_TARGET = 0.80  # tolerated non-error rate (synthetic stream is ~20% error)
# budget computed ONCE in Python and inlined as the same double literal
# into both engines (DuckDB would otherwise evaluate 1 - 0.8 in exact
# DECIMAL while Spark uses binary doubles — a boundary-flipping skew)
_BUDGET = 1 - SLO_TARGET

# ---------------------------------------------------------------------------
# q351 — SLO burn rate, multiwindow


@query(
    "q351_slo_burn_rate",
    oracle=f"""
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS h,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS errs
      FROM events GROUP BY 1
    ),
    windowed AS (
      SELECT h, n, errs,
             SUM(errs) OVER w6 AS errs6, SUM(n) OVER w6 AS n6
      FROM hourly
      WINDOW w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW)
    ),
    rated AS (
      SELECT h,
             errs * 1.0 / n AS err_rate_1h,
             errs6 * 1.0 / n6 AS err_rate_6h
      FROM windowed
    )
    SELECT CAST(h AS TIMESTAMP) AS hour,
           ROUND(err_rate_1h, 6) AS err_rate_1h,
           ROUND(err_rate_6h, 6) AS err_rate_6h,
           ROUND(err_rate_1h / CAST({_BUDGET!r} AS DOUBLE), 6) AS burn_1h,
           ROUND(err_rate_6h / CAST({_BUDGET!r} AS DOUBLE), 6) AS burn_6h,
           CAST(CASE WHEN err_rate_1h / CAST({_BUDGET!r} AS DOUBLE) > 1.5
                      AND err_rate_6h / CAST({_BUDGET!r} AS DOUBLE) > 1.2
                     THEN 1 ELSE 0 END AS INT) AS page
    FROM rated ORDER BY hour
    """,
)
def q351_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO burn rate with multiwindow alerting: hourly error rate and
    its 6-hour trailing rate, each expressed as a multiple of the
    error budget (1 - SLO), paging only when BOTH the fast window
    (>1.5x) and the slow window (>1.2x) burn hot — the standard
    multiwindow-multi-burn-rate alert that suppresses blips without
    missing sustained burns. Scale: one hour-keyed aggregate then an
    ordered window over the tiny hourly table (global by nature, but
    bounded by calendar hours — same class as q339's allowlisted
    daily lag)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("h")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("bigint")
        .alias("errs"),
    )
    w6 = W.orderBy("h").rowsBetween(-5, 0)
    windowed = hourly.select(
        "h",
        "n",
        "errs",
        F.sum("errs").over(w6).alias("errs6"),
        F.sum("n").over(w6).alias("n6"),
    )
    r1 = F.col("errs") * 1.0 / F.col("n")
    r6 = F.col("errs6") * 1.0 / F.col("n6")
    budget = _BUDGET
    return windowed.select(
        F.col("h").alias("hour"),
        F.round(r1, 6).alias("err_rate_1h"),
        F.round(r6, 6).alias("err_rate_6h"),
        F.round(r1 / budget, 6).alias("burn_1h"),
        F.round(r6 / budget, 6).alias("burn_6h"),
        F.when((r1 / budget > 1.5) & (r6 / budget > 1.2), 1)
        .otherwise(0)
        .cast("int")
        .alias("page"),
    ).orderBy("hour")


# ---------------------------------------------------------------------------
# q352 — MTBF / MTTR from error runs


@query(
    "q352_mtbf_mttr",
    oracle="""
    WITH seq AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err,
             ROW_NUMBER() OVER w AS rn
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, is_err, ts,
             rn - ROW_NUMBER() OVER (PARTITION BY user_id, is_err
                                     ORDER BY rn) AS grp
      FROM seq
    ),
    failure_runs AS (
      SELECT user_id, grp,
             MIN(epoch_us(ts)) AS run_start,
             MAX(epoch_us(ts)) AS run_end
      FROM runs WHERE is_err = 1
      GROUP BY user_id, grp
    ),
    spaced AS (
      SELECT user_id,
             run_end - run_start AS repair_us,
             run_start - LAG(run_end) OVER (PARTITION BY user_id
                                            ORDER BY run_start) AS between_us
      FROM failure_runs
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_failure_runs,
           ROUND(SUM(repair_us) * 1.0 / COUNT(*) / 1000000, 4) AS mttr_s,
           ROUND(SUM(between_us) * 1.0 / COUNT(between_us) / 1000000, 4)
             AS mtbf_s
    FROM spaced
    """,
)
def q352_mtbf_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTBF / MTTR from the event stream: consecutive error events
    per user collapse into failure runs (gaps-and-islands), MTTR is
    the mean run duration, MTBF the mean gap from one run's end to
    the next run's start — the two reliability numbers every
    incident review quotes, computed exactly in microseconds. Scale:
    user-partitioned windows share one shuffle; the run table is
    small; one global 1-row reduction."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "ts",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias(
            "is_err"
        ),
        F.row_number().over(w).alias("rn"),
    )
    wg = W.partitionBy("user_id", "is_err").orderBy("rn")
    grouped = seq.withColumn("grp", F.col("rn") - F.row_number().over(wg))
    failure_runs = (
        grouped.filter(F.col("is_err") == 1)
        .groupBy("user_id", "grp")
        .agg(
            F.min(F.unix_micros("ts")).alias("run_start"),
            F.max(F.unix_micros("ts")).alias("run_end"),
        )
    )
    wl = W.partitionBy("user_id").orderBy("run_start")
    spaced = failure_runs.select(
        (F.col("run_end") - F.col("run_start")).alias("repair_us"),
        (F.col("run_start") - F.lag("run_end").over(wl)).alias("between_us"),
    )
    return spaced.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_failure_runs"),
        F.round(
            F.sum("repair_us") * 1.0 / F.count(F.lit(1)) / 1_000_000, 4
        ).alias("mttr_s"),
        F.round(
            F.sum("between_us") * 1.0 / F.count("between_us") / 1_000_000, 4
        ).alias("mtbf_s"),
    )
