"""Monetization batch 30 (q292-q293): the cohort LTV curve (cumulative
revenue per user by cohort age — the payback-period table under every
acquisition-spend decision) and an anomaly-detection ensemble (z-score,
MAD and CUSUM votes combined — the consensus alarm that cuts
single-detector false positives).

Determinism: revenue rides 6-dp DECIMAL sums; the cumulative-by-age
window runs over the WEEKS-bounded (cohort, age) grid; ensemble
thresholds compare straight-line doubles from exact decimal moments,
and every detector's vote is an integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_DEC6 = "decimal(38,6)"


# ---------------------------------------------------------------------------
# q292 — cohort LTV curve


@query(
    "q292_cohort_ltv",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(date_trunc('week', ts) AS DATE)) AS cohort_week
      FROM events GROUP BY user_id
    ),
    cohort_sizes AS (
      SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_users
      FROM firsts GROUP BY cohort_week
    ),
    rev AS (
      SELECT f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                  CAST(date_trunc('week', e.ts) AS DATE)) AS BIGINT) AS age,
             SUM(CAST(ROUND(e.value, 6) AS DECIMAL(38,6))) AS rev6
      FROM events e JOIN firsts f USING (user_id)
      WHERE e.event_type = 'purchase'
      GROUP BY f.cohort_week, age
    ),
    curve AS (
      SELECT r.cohort_week, r.age, s.n_users,
             SUM(r.rev6) OVER (PARTITION BY r.cohort_week ORDER BY r.age
                               ROWS UNBOUNDED PRECEDING) AS cum_rev6
      FROM rev r JOIN cohort_sizes s USING (cohort_week)
    )
    SELECT cohort_week, age, n_users,
           ROUND(CAST(cum_rev6 AS DOUBLE), 2) AS cum_revenue,
           ROUND(CAST(cum_rev6 AS DOUBLE) / CAST(n_users AS DOUBLE), 4)
             AS ltv_per_user
    FROM curve
    ORDER BY cohort_week, age
    """,
)
def q292_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: cumulative purchase revenue per user by
    cohort age — the table that answers "how many weeks until a
    cohort pays back its acquisition cost", and the revenue twin of
    q162's retention triangle / q280's decay fit. Revenue accumulates
    in 6-dp DECIMAL; the running total is a cohort-partitioned window
    over the WEEKS-bounded (cohort, age) grid, not over users.

    Plan: one user-keyed shuffle builds cohorts; the purchase rollup
    rides the co-partitioned user join then aggregates to the tiny
    (cohort, age) grid; cohort sizes broadcast back."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("week", "ts").cast("date")).alias("cohort_week")
    )
    cohort_sizes = firsts.groupBy("cohort_week").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )
    rev = (
        ev.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .groupBy(
            "cohort_week",
            (
                F.datediff(F.date_trunc("week", "ts").cast("date"), F.col("cohort_week"))
                / 7
            )
            .cast("bigint")
            .alias("age"),
        )
        .agg(F.sum(F.round(F.col("value"), 6).cast(_DEC6)).alias("rev6"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = rev.join(F.broadcast(cohort_sizes), "cohort_week").withColumn(
        "cum_rev6", F.sum("rev6").over(w)
    )
    return curve.select(
        "cohort_week",
        "age",
        "n_users",
        F.round(F.col("cum_rev6").cast("double"), 2).alias("cum_revenue"),
        F.round(
            F.col("cum_rev6").cast("double") / F.col("n_users").cast("double"), 4
        ).alias("ltv_per_user"),
    ).orderBy("cohort_week", "age")


# ---------------------------------------------------------------------------
# q293 — anomaly-detection ensemble


@query(
    "q293_anomaly_ensemble",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS v
      FROM events WHERE event_type = 'purchase' GROUP BY day
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(v AS DECIMAL(38,2))) AS s1,
             SUM(CAST(v * v AS DECIMAL(38,4))) AS s2
      FROM daily
    ),
    med AS (
      SELECT v AS median_v FROM daily ORDER BY v, day
      LIMIT 1 OFFSET (SELECT CAST(CEIL(COUNT(*) / 2.0) AS BIGINT) - 1 FROM daily)
    ),
    madt AS (
      SELECT ad AS mad_v FROM (
        SELECT ABS(CAST(d.v AS DOUBLE) - CAST(m.median_v AS DOUBLE)) AS ad,
               d.day
        FROM daily d CROSS JOIN med m
      ) ORDER BY ad, day
      LIMIT 1 OFFSET (SELECT CAST(CEIL(COUNT(*) / 2.0) AS BIGINT) - 1 FROM daily)
    ),
    scored AS (
      SELECT d.day, d.v,
             (CAST(d.v AS DOUBLE) - CAST(st.s1 AS DOUBLE) / CAST(st.n AS DOUBLE))
             / sqrt((CAST(st.n AS DOUBLE) * CAST(st.s2 AS DOUBLE)
                     - CAST(st.s1 AS DOUBLE) * CAST(st.s1 AS DOUBLE))
                    / (CAST(st.n AS DOUBLE) * (CAST(st.n AS DOUBLE) - 1.0))) AS z,
             (CAST(d.v AS DOUBLE) - CAST(m.median_v AS DOUBLE))
             / NULLIF(1.4826 * CAST(md.mad_v AS DOUBLE), 0.0) AS mz,
             SUM(CAST(d.v AS DECIMAL(38,2))) OVER (ORDER BY d.day
                                                   ROWS UNBOUNDED PRECEDING)
               AS cum_v
      FROM daily d CROSS JOIN stats st CROSS JOIN med m CROSS JOIN madt md
    ),
    voted AS (
      SELECT day, v, z, mz,
             CAST(CASE WHEN ABS(z) > 1.5 THEN 1 ELSE 0 END AS BIGINT)
             + CAST(CASE WHEN ABS(mz) > 2.5 THEN 1 ELSE 0 END AS BIGINT)
             + CAST(CASE WHEN ABS(CAST(cum_v AS DOUBLE)
                              - (ROW_NUMBER() OVER (ORDER BY day))
                                * ((SELECT CAST(s1 AS DOUBLE) FROM stats)
                                   / (SELECT CAST(n AS DOUBLE) FROM stats)))
                         > 2.0 * sqrt((SELECT (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))
                                      FROM stats))
                              * sqrt(ROW_NUMBER() OVER (ORDER BY day))
                    THEN 1 ELSE 0 END AS BIGINT) AS votes
      FROM scored
    )
    SELECT day, ROUND(CAST(v AS DOUBLE), 2) AS daily_value,
           ROUND(z, 6) AS zscore, ROUND(mz, 6) AS mad_zscore,
           votes
    FROM voted WHERE votes >= 2
    ORDER BY day
    """,
)
def q293_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly-detection ensemble over the daily purchase-revenue
    series: three detectors vote — global z-score (|z| > 1.5),
    MAD-robust z (|v - median| / (1.4826·MAD) > 2.5, q116's robust
    scale), and a CUSUM-style drift test (|cumulative - k·mean| >
    2σ·sqrt(k), q138's shape) — and a day alarms only on >= 2 votes,
    the consensus rule that suppresses single-detector noise.
    Medians are rank-selected order statistics on a total (value,
    day) order; the cumulative sum is DECIMAL over the calendar-
    bounded daily table.

    Plan: one shuffle to the ~30-row daily table; global stats,
    median and MAD are single-row frames broadcast back; every score
    is straight-line; the calendar-bounded running sum follows §15."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    daily = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).alias("v"))
    )
    stats = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("v").cast("decimal(38,2)")).alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)")).alias("s2"),
    )
    w_rank = Window.orderBy("v", "day")
    ranked = daily.join(F.broadcast(stats)).withColumn(
        "rk", F.row_number().over(w_rank)
    )
    med = ranked.filter(
        F.col("rk") == F.ceil(F.col("n") / 2.0).cast("bigint")
    ).select(F.col("v").alias("median_v"))
    with_med = daily.join(F.broadcast(med))
    w_ad = Window.orderBy("ad", "day")
    ad_ranked = (
        with_med.withColumn(
            "ad", F.abs(F.col("v").cast("double") - F.col("median_v").cast("double"))
        )
        .join(F.broadcast(stats))
        .withColumn("adrk", F.row_number().over(w_ad))
    )
    madt = ad_ranked.filter(
        F.col("adrk") == F.ceil(F.col("n") / 2.0).cast("bigint")
    ).select(F.col("ad").alias("mad_v"))

    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd
    var = (
        nd * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (nd * (nd - 1.0))
    w_cum = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_rn = Window.orderBy("day")
    scored = (
        daily.join(F.broadcast(stats))
        .join(F.broadcast(med))
        .join(F.broadcast(madt))
        .withColumn("z", (F.col("v").cast("double") - mean) / F.sqrt(var))
        .withColumn(
            "mz",
            (F.col("v").cast("double") - F.col("median_v").cast("double"))
            / F.nullif(1.4826 * F.col("mad_v").cast("double"), F.lit(0.0)),
        )
        .withColumn("cum_v", F.sum(F.col("v").cast("decimal(38,2)")).over(w_cum))
        .withColumn("k", F.row_number().over(w_rn))
    )
    cusum_dev = F.abs(
        F.col("cum_v").cast("double") - F.col("k") * mean
    ) > 2.0 * F.sqrt(var) * F.sqrt(F.col("k").cast("double"))
    votes = (
        F.when(F.abs("z") > 1.5, 1).otherwise(0).cast("bigint")
        + F.when(F.abs("mz") > 2.5, 1).otherwise(0).cast("bigint")
        + F.when(cusum_dev, 1).otherwise(0).cast("bigint")
    )
    return (
        scored.withColumn("votes", votes)
        .filter(F.col("votes") >= 2)
        .select(
            "day",
            F.round(F.col("v").cast("double"), 2).alias("daily_value"),
            F.round("z", 6).alias("zscore"),
            F.round("mz", 6).alias("mad_zscore"),
            "votes",
        )
        .orderBy("day")
    )
