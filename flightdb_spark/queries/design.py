"""Design & count-model batch 58 (q367-q369): the power/MDE table
(minimum sample size to detect each effect size — the question every
experiment design review starts with, completing q330-q333's
readout suite), the overdispersion diagnostic (variance/mean of
per-user event counts with a method-of-moments negative-binomial r —
what q297's Poisson GOF rejects, this quantifies), and the
zero-inflation check (observed zero share vs the Poisson-implied
e^-lambda).

Determinism: z constants are Python-inlined literals; moments
accumulate as exact integers (counts) or rounded DECIMAL; e^-lambda
is one exp() per output row on identical double inputs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

_Z_ALPHA = 1.959964  # two-sided 5%
_Z_BETA = 0.841621  # 80% power
MDES = [0.01, 0.02, 0.05, 0.10]

# ---------------------------------------------------------------------------
# q367 — power / MDE table


@query(
    "q367_power_mde",
    oracle=f"""
    WITH users AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
      FROM events GROUP BY user_id
    ),
    base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(c) AS DOUBLE) / COUNT(*) AS p
      FROM users
    ),
    mdes AS (SELECT unnest([{", ".join(repr(m) for m in MDES)}]) AS mde)
    SELECT m.mde,
           ROUND(b.p, 6) AS base_rate,
           CAST(CEIL(2 * POWER({_Z_ALPHA!r} + {_Z_BETA!r}, 2)
                * b.p * (1 - b.p) / (m.mde * m.mde)) AS BIGINT)
             AS required_n_per_arm,
           b.n // 2 AS available_n_per_arm,
           CAST(CASE WHEN b.n // 2 >= 2 * POWER({_Z_ALPHA!r} + {_Z_BETA!r}, 2)
                * b.p * (1 - b.p) / (m.mde * m.mde)
                THEN 1 ELSE 0 END AS INT) AS powered
    FROM mdes m, base b
    ORDER BY m.mde
    """,
)
def q367_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Power analysis table: for each minimum detectable effect (1, 2,
    5, 10 points of conversion), the per-arm sample size needed at
    80% power / 5% two-sided alpha — n = 2(z_a + z_b)^2 p(1-p)/MDE^2
    with the z constants Python-inlined — next to the population
    actually available per arm and a powered/underpowered verdict.
    The design table read BEFORE launching what q330-q333 read out
    AFTER. Scale: one user aggregate to a single (n, p) row, a
    4-row literal MDE grid."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("c")
    )
    base = users.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        (F.sum("c").cast("double") / F.count(F.lit(1))).alias("p"),
    )
    mdes = spark.createDataFrame([(m,) for m in MDES], ["mde"])
    k = 2 * (_Z_ALPHA + _Z_BETA) ** 2
    req = k * F.col("p") * (1 - F.col("p")) / (F.col("mde") * F.col("mde"))
    return (
        mdes.join(F.broadcast(base))
        .select(
            "mde",
            F.round("p", 6).alias("base_rate"),
            F.ceil(req).cast("bigint").alias("required_n_per_arm"),
            F.expr("n div 2").cast("bigint").alias("available_n_per_arm"),
            F.when(F.expr("n div 2") >= req, 1)
            .otherwise(0)
            .cast("int")
            .alias("powered"),
        )
        .orderBy("mde")
    )


# ---------------------------------------------------------------------------
# q368 — overdispersion / negative-binomial moments


@query(
    "q368_overdispersion",
    oracle="""
    WITH counts AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS k FROM events
      GROUP BY user_id
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(k) AS DOUBLE) AS s1,
             CAST(SUM(k * k) AS DOUBLE) AS s2
      FROM counts
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(s1 / n, 6) AS mean_events,
           ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS var_events,
           ROUND((s2 / n - (s1 / n) * (s1 / n)) / (s1 / n), 6)
             AS dispersion_index,
           ROUND(CASE WHEN s2 / n - (s1 / n) * (s1 / n) > s1 / n
                 THEN (s1 / n) * (s1 / n)
                      / (s2 / n - (s1 / n) * (s1 / n) - s1 / n)
                 ELSE NULL END, 6) AS nb_r_moments
    FROM mom
    """,
)
def q368_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overdispersion diagnostic for per-user event counts: the
    dispersion index Var/Mean (1 = Poisson; > 1 = overdispersed) and
    the method-of-moments negative-binomial size r = mu^2 /
    (var - mu) when overdispersed — the distribution-choice evidence
    q297's chi-square verdict doesn't itself provide. Exact integer
    moments; every output assembles once. Scale: one user aggregate,
    one 1-row reduction."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )
    mom = counts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("k").cast("double").alias("s1"),
        F.sum(F.col("k") * F.col("k")).cast("double").alias("s2"),
    )
    mu = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mu * mu
    return mom.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.round(mu, 6).alias("mean_events"),
        F.round(var, 6).alias("var_events"),
        F.round(var / mu, 6).alias("dispersion_index"),
        F.round(
            F.when(var > mu, mu * mu / (var - mu)).otherwise(F.lit(None)), 6
        ).alias("nb_r_moments"),
    )


# ---------------------------------------------------------------------------
# q369 — zero-inflation check (daily purchase counts per user)


@query(
    "q369_zero_inflation",
    oracle="""
    WITH grid AS (
      SELECT u.user_id, d.d
      FROM (SELECT DISTINCT user_id FROM events) u
      CROSS JOIN (SELECT DISTINCT CAST(ts AS DATE) AS d FROM events) d
    ),
    daily AS (
      SELECT user_id, CAST(ts AS DATE) AS d, COUNT(*) AS k
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, CAST(ts AS DATE)
    ),
    full_ AS (
      SELECT g.user_id, g.d, COALESCE(dl.k, 0) AS k
      FROM grid g LEFT JOIN daily dl
        ON dl.user_id = g.user_id AND dl.d = g.d
    ),
    mom AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(k) AS DOUBLE) AS s1,
             CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS DOUBLE)
               AS zeros
      FROM full_
    )
    SELECT CAST(n AS BIGINT) AS n_user_days,
           ROUND(s1 / n, 6) AS lambda_hat,
           ROUND(zeros / n, 6) AS zero_share,
           ROUND(EXP(-(s1 / n)), 6) AS poisson_zero_share,
           ROUND(zeros / n - EXP(-(s1 / n)), 6) AS excess_zeros
    FROM mom
    """,
)
def q369_zero_inflation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-inflation check on daily per-user purchase counts over the
    full user x day grid: the observed zero share against the
    Poisson-implied e^-lambda at the fitted mean — positive excess
    zeros is the classic evidence for a zero-inflated / hurdle model
    (the modeling fork q368's dispersion index alone can't decide).
    Scale: the grid is |users| x |days| CONCEPTUALLY but is computed
    as two distinct-aggregates and a broadcast cross count — only
    the nonzero (user, day) cells and four scalars are ever
    materialized on the Spark side."""
    ev = load_table(spark, sf_dir, "events")
    grid = ev.agg(
        (
            F.countDistinct("user_id")
            * F.countDistinct(F.col("ts").cast("date"))
        )
        .cast("bigint")
        .alias("n")
    )
    daily = ev.filter(F.col("event_type") == "purchase").groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.count(F.lit(1)).alias("k"))
    nz = daily.agg(
        F.count(F.lit(1)).alias("nz_cells"),
        F.sum("k").cast("double").alias("s1"),
    )
    n = F.col("n")
    return nz.crossJoin(F.broadcast(grid)).select(
        n.alias("n_user_days"),
        F.round(F.col("s1") / n, 6).alias("lambda_hat"),
        F.round((n - F.col("nz_cells")) / n.cast("double"), 6).alias(
            "zero_share"
        ),
        F.round(F.exp(-(F.col("s1") / n)), 6).alias("poisson_zero_share"),
        F.round(
            (n - F.col("nz_cells")) / n.cast("double")
            - F.exp(-(F.col("s1") / n)),
            6,
        ).alias("excess_zeros"),
    )
