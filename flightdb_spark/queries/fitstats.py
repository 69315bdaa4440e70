"""Fit-statistics batch 32 (q297-q298): Poisson goodness-of-fit for
the basket-size distribution (the "is arrival count really Poisson"
check capacity models assume) and same-weekday seasonal anomaly
flags (deviation vs the day-of-week baseline — the seasonal twin of
q262's trailing-window z).

Determinism: the Poisson pmf is ONE rounded transcendental term per
bucket (exp(-λ + k·lnλ) / k!, factorial exact on both engines,
rounded 9 dp — two finer than the 6-dp chi terms, §5); seasonal
baselines are exact DECIMAL moments per (type, weekday) assembled
straight-line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q297 — Poisson goodness-of-fit


@query(
    "q297_poisson_gof",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
      FROM lineitem GROUP BY l_orderkey
    ),
    hist AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS observed FROM sizes GROUP BY k
    ),
    fit AS (
      SELECT CAST(SUM(k * observed) AS DOUBLE)
             / CAST(SUM(observed) AS DOUBLE) AS lam,
             CAST(SUM(observed) AS BIGINT) AS n
      FROM hist
    ),
    expected AS (
      SELECT h.k, h.observed, f.n,
             ROUND(exp(-f.lam + h.k * ln(f.lam)) / factorial(CAST(h.k AS INTEGER)),
                   9) AS pmf
      FROM hist h CROSS JOIN fit f
    )
    SELECT k, observed,
           ROUND(n * pmf, 4) AS expected,
           ROUND(CASE WHEN n * pmf > 0
                 THEN (observed - n * pmf) * (observed - n * pmf) / (n * pmf)
                 ELSE 0.0 END, 6) AS chi_term
    FROM expected
    ORDER BY k
    """,
)
def q297_poisson_gof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson goodness-of-fit for basket sizes: the per-order line
    count histogram against the Poisson(λ = mean) expectation, with
    per-bucket chi-square terms (their sum vs χ²(df) is the test —
    shipped at bucket grain so the analyst can pool sparse tails).
    The pmf is computed in ONE log-space transcendental per bucket —
    exp(-λ + k·lnλ)/k!, with factorial() exact integers on both
    engines and pow() deliberately avoided (§5) — rounded at 9 dp,
    two finer than the 6-dp chi terms.

    Plan: one shuffle to order sizes, one to the k-bounded histogram;
    λ and n are a single broadcast row; everything after is
    bucket-bounded."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    sizes = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    hist = sizes.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    fit = hist.agg(
        (
            F.sum(F.col("k") * F.col("observed")).cast("double")
            / F.sum("observed").cast("double")
        ).alias("lam"),
        F.sum("observed").cast("bigint").alias("n"),
    )
    pmf = F.round(
        F.exp(-F.col("lam") + F.col("k") * F.log("lam"))
        / F.factorial(F.col("k").cast("int")),
        9,
    )
    expected = hist.join(F.broadcast(fit)).withColumn("pmf", pmf)
    exp_n = F.col("n") * F.col("pmf")
    chi = F.when(
        exp_n > 0, (F.col("observed") - exp_n) * (F.col("observed") - exp_n) / exp_n
    ).otherwise(0.0)
    return expected.select(
        "k",
        "observed",
        F.round(exp_n, 4).alias("expected"),
        F.round(chi, 6).alias("chi_term"),
    ).orderBy("k")


# ---------------------------------------------------------------------------
# q298 — same-weekday seasonal anomalies


@query(
    "q298_seasonal_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(dayofweek(date_trunc('day', ts)) + 1 AS BIGINT) AS dow,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS v
      FROM events GROUP BY event_type, day, dow
    ),
    baseline AS (
      SELECT event_type, dow,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS DECIMAL(38,2))) AS s1,
             SUM(CAST(v * v AS DECIMAL(38,4))) AS s2
      FROM daily GROUP BY event_type, dow
      HAVING COUNT(*) >= 3
    ),
    scored AS (
      SELECT d.event_type, d.day, d.dow, d.v,
             (CAST(b.n AS DOUBLE) - 1.0) AS m,
             (CAST(b.s1 AS DOUBLE) - CAST(d.v AS DOUBLE)) AS lo_s1,
             (CAST(b.s2 AS DOUBLE)
              - CAST(d.v AS DOUBLE) * CAST(d.v AS DOUBLE)) AS lo_s2
      FROM daily d JOIN baseline b
        ON b.event_type = d.event_type AND b.dow = d.dow
    ),
    z AS (
      SELECT event_type, day, dow, v,
             (CAST(v AS DOUBLE) - lo_s1 / m)
             / sqrt((m * lo_s2 - lo_s1 * lo_s1) / (m * (m - 1.0))) AS seasonal_z
      FROM scored WHERE m >= 3 AND (m * lo_s2 - lo_s1 * lo_s1) > 0
    )
    SELECT event_type, day, dow,
           ROUND(CAST(v AS DOUBLE), 2) AS daily_value,
           ROUND(seasonal_z, 6) AS seasonal_z
    FROM z WHERE ABS(seasonal_z) > 2.0
    ORDER BY event_type, day
    """,
)
def q298_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-weekday seasonal anomalies: each day's revenue per event
    type scored against the LEAVE-ONE-OUT baseline of the other days
    sharing its weekday — a Monday judged against the other Mondays,
    which catches the "normal for a Tuesday, alarming for a Sunday"
    cases q262's trailing window smears over. Leave-one-out matters
    doubly here: with only 4-5 same-weekday days in the span, a
    self-including baseline caps |z| at (n-1)/sqrt(n) ~ 1.79 and NO
    threshold could ever fire. Flags |z| > 2.0 from exact DECIMAL
    moments with the day's own contribution subtracted; weekday
    numbering uses Spark's 1=Sunday convention (q281 alignment).

    Plan: one shuffle to the (type, day) dailies; the 35-row
    (type, weekday) baseline re-aggregates the same partials and
    broadcasts back; the z is straight-line per row."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.dayofweek(F.date_trunc("day", "ts")).cast("bigint").alias("dow"),
    ).agg(F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).alias("v"))
    baseline = (
        daily.groupBy("event_type", "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("v").cast("decimal(38,2)")).alias("s1"),
            F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)")).alias("s2"),
        )
        .filter(F.col("n") >= 3)
        .select(
            F.col("event_type").alias("bet"),
            F.col("dow").alias("bdow"),
            "n",
            "s1",
            "s2",
        )
    )
    joined = daily.join(
        F.broadcast(baseline),
        (F.col("event_type") == F.col("bet")) & (F.col("dow") == F.col("bdow")),
    )
    # LEAVE-ONE-OUT baseline: a day scored against a baseline that
    # CONTAINS it has |z| hard-capped at (n-1)/sqrt(n) (~1.79 for the
    # 4-5 same-weekday days a one-month span holds) — no threshold
    # could fire. Removing the day from its own moments unbounds z.
    m = F.col("n").cast("double") - 1.0
    lo_s1 = F.col("s1").cast("double") - F.col("v").cast("double")
    lo_s2 = (
        F.col("s2").cast("double")
        - F.col("v").cast("double") * F.col("v").cast("double")
    )
    z = (F.col("v").cast("double") - lo_s1 / m) / F.sqrt(
        (m * lo_s2 - lo_s1 * lo_s1) / (m * (m - 1.0))
    )
    return (
        joined.filter(
            (m >= 3) & ((m * lo_s2 - lo_s1 * lo_s1) > 0) & (F.abs(z) > 2.0)
        )
        .select(
            "event_type",
            "day",
            "dow",
            F.round(F.col("v").cast("double"), 2).alias("daily_value"),
            F.round(z, 6).alias("seasonal_z"),
        )
        .orderBy("event_type", "day")
    )
