"""Experimentation batch 44 (q330-q333): the A/B-platform statistics
the repo was still missing around q149's basic test and q249's CUPED
— sample-ratio-mismatch detection (the guardrail that invalidates an
experiment before any metric is read), Welch's unequal-variance t
with the Welch-Satterthwaite df, Wilson score intervals for
conversion rates (the CI that behaves at small n and extreme p), and
Wald's SPRT (the sequential test that says WHEN a decision could
have been called).

Variant assignment reuses the q64 md5-bucket discipline (identical
16-bit bucket arithmetic on both engines); every log constant in the
SPRT is computed once in Python and inlined as the same literal into
both the Spark expression and the DuckDB oracle, so transcendental
library differences can't leak in.

Determinism: all moments accumulate per-row-rounded DECIMAL; each
statistic assembles once in double and rounds at the edge.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# md5-bucket variant assignment (q64 discipline): 16-bit bucket, parity.
_VARIANT_DUCK = """
    users AS (
      SELECT user_id,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                       ::BIGINT % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant,
             COUNT(*) AS n_events,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    )
"""


def _users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    ).select(
        "user_id",
        F.when(bucket % 2 == 0, "A").otherwise("B").alias("variant"),
        "n_events",
        "converted",
    )


# ---------------------------------------------------------------------------
# q330 — sample-ratio mismatch

CHI2_CRIT_1DF_5PCT = 3.841459  # literal critical value, both engines


@query(
    "q330_srm_check",
    oracle=f"""
    WITH {_VARIANT_DUCK},
    counts AS (
      SELECT
        SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS na,
        SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS nb
      FROM users
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND(POWER(na - (na + nb) / 2.0, 2) / ((na + nb) / 2.0)
                 + POWER(nb - (na + nb) / 2.0, 2) / ((na + nb) / 2.0), 6)
             AS chi2,
           CAST(CASE WHEN POWER(na - (na + nb) / 2.0, 2) / ((na + nb) / 2.0)
                 + POWER(nb - (na + nb) / 2.0, 2) / ((na + nb) / 2.0)
                 > {CHI2_CRIT_1DF_5PCT} THEN 1 ELSE 0 END AS INT) AS srm_flag
    FROM counts
    """,
)
def q330_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio mismatch: chi-square of the observed variant split
    against the designed 50/50 — the first guardrail every experiment
    readout runs, because a biased assignment invalidates all
    downstream metrics no matter how significant they look. Flagged
    at the 5% critical value (literal constant on both engines).
    Scale: one user-level aggregate then a 2-cell reduction."""
    u = _users(spark, sf_dir)
    counts = u.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0)).alias("nb"),
    )
    e = (F.col("na") + F.col("nb")) / 2.0
    chi2 = F.pow(F.col("na") - e, 2) / e + F.pow(F.col("nb") - e, 2) / e
    return counts.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.round(chi2, 6).alias("chi2"),
        F.when(chi2 > CHI2_CRIT_1DF_5PCT, 1).otherwise(0).cast("int").alias(
            "srm_flag"
        ),
    )


# ---------------------------------------------------------------------------
# q331 — Welch's t-test


@query(
    "q331_welch_ttest",
    oracle=f"""
    WITH {_VARIANT_DUCK},
    purch AS (
      SELECT u.variant, CAST(ROUND(e.value, 6) AS DECIMAL(38,6)) AS x,
             CAST(ROUND(e.value * e.value, 9) AS DECIMAL(38,9)) AS xx
      FROM events e JOIN users u ON u.user_id = e.user_id
      WHERE e.event_type = 'purchase'
    ),
    mom AS (
      SELECT variant, COUNT(*) AS n,
             CAST(SUM(x) AS DOUBLE) AS s1, CAST(SUM(xx) AS DOUBLE) AS s2
      FROM purch GROUP BY variant
    ),
    wide AS (
      SELECT a.n AS n1, a.s1 / a.n AS m1,
             (a.s2 - a.s1 * a.s1 / a.n) / (a.n - 1) AS v1,
             b.n AS n2, b.s1 / b.n AS m2,
             (b.s2 - b.s1 * b.s1 / b.n) / (b.n - 1) AS v2
      FROM mom a, mom b WHERE a.variant = 'A' AND b.variant = 'B'
    )
    SELECT CAST(n1 AS BIGINT) AS n_a, CAST(n2 AS BIGINT) AS n_b,
           ROUND(m1, 6) AS mean_a, ROUND(m2, 6) AS mean_b,
           ROUND((m1 - m2) / SQRT(v1 / n1 + v2 / n2), 6) AS t_stat,
           ROUND(POWER(v1 / n1 + v2 / n2, 2)
                 / (POWER(v1 / n1, 2) / (n1 - 1)
                    + POWER(v2 / n2, 2) / (n2 - 1)), 4) AS welch_df
    FROM wide
    """,
)
def q331_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test on purchase values between the
    variants, with the Welch-Satterthwaite degrees of freedom — the
    test to reach for when group variances differ (q149's pooled test
    assumes they don't; q192's Mann-Whitney drops normality; this
    completes the two-sample family). Scale: one variant-keyed moment
    aggregate (6/9-dp DECIMAL sums) and single-row assembly."""
    u = _users(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(u.select("user_id", "variant")), "user_id")
        .select(
            "variant",
            F.round("value", 6).cast("decimal(38,6)").alias("x"),
            F.round(F.col("value") * F.col("value"), 9)
            .cast("decimal(38,9)")
            .alias("xx"),
        )
    )
    mom = purch.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum("xx").cast("double").alias("s2"),
    )
    a = mom.filter(F.col("variant") == "A").select(
        F.col("n").alias("n1"),
        (F.col("s1") / F.col("n")).alias("m1"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
         / (F.col("n") - 1)).alias("v1"),
    )
    b = mom.filter(F.col("variant") == "B").select(
        F.col("n").alias("n2"),
        (F.col("s1") / F.col("n")).alias("m2"),
        ((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
         / (F.col("n") - 1)).alias("v2"),
    )
    wide = a.join(b)
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return wide.select(
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n2").cast("bigint").alias("n_b"),
        F.round("m1", 6).alias("mean_a"),
        F.round("m2", 6).alias("mean_b"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            4,
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# q332 — Wilson score intervals

_Z = 1.959964  # 95% two-sided, literal on both engines


@query(
    "q332_wilson_ci",
    oracle=f"""
    WITH {_VARIANT_DUCK},
    conv AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS k
      FROM users GROUP BY variant
    )
    SELECT variant, n, k,
           ROUND(CAST(k AS DOUBLE) / n, 6) AS rate,
           ROUND((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2 * n)
                  - {_Z} * SQRT((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_Z} * {_Z} / (4.0 * n * n)))
                 / (1 + {_Z} * {_Z} / n), 6) AS wilson_lo,
           ROUND((CAST(k AS DOUBLE) / n + {_Z} * {_Z} / (2 * n)
                  + {_Z} * SQRT((CAST(k AS DOUBLE) / n)
                        * (1 - CAST(k AS DOUBLE) / n) / n
                        + {_Z} * {_Z} / (4.0 * n * n)))
                 / (1 + {_Z} * {_Z} / n), 6) AS wilson_hi
    FROM conv ORDER BY variant
    """,
)
def q332_wilson_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson 95% score intervals for per-variant user conversion
    (any purchase): the interval that stays inside [0, 1] and keeps
    coverage at small n or extreme rates, where the plus/minus Wald
    interval fails — what an experiment scorecard should print next
    to every rate. Scale: one user aggregate, one 2-key aggregate,
    closed-form assembly."""
    u = _users(spark, sf_dir)
    conv = u.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("k"),
    )
    p = F.col("k").cast("double") / F.col("n")
    z2n = _Z * _Z / F.col("n")
    center = p + z2n / 2
    halfw = _Z * F.sqrt(
        p * (1 - p) / F.col("n") + _Z * _Z / (4.0 * F.col("n") * F.col("n"))
    )
    return conv.select(
        "variant",
        "n",
        "k",
        F.round(p, 6).alias("rate"),
        F.round((center - halfw) / (1 + z2n), 6).alias("wilson_lo"),
        F.round((center + halfw) / (1 + z2n), 6).alias("wilson_hi"),
    ).orderBy("variant")


# ---------------------------------------------------------------------------
# q333 — Wald's SPRT

SPRT_P0 = 0.18
SPRT_P1 = 0.22
# log constants computed ONCE here and inlined as identical literals
# into both engines (library ln() may differ in the last ulp)
_LLR_POS = math.log(SPRT_P1 / SPRT_P0)
_LLR_NEG = math.log((1 - SPRT_P1) / (1 - SPRT_P0))
_LN_A = math.log((1 - 0.05) / 0.05)  # accept H1 boundary (alpha=beta=.05)
_LN_B = math.log(0.05 / (1 - 0.05))  # accept H0 boundary


@query(
    "q333_sprt",
    oracle=f"""
    WITH daily AS (
      SELECT CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                       ::BIGINT % 2 = 0 THEN 'A' ELSE 'B' END AS variant,
             CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS k
      FROM events GROUP BY 1, 2
    ),
    walk AS (
      SELECT variant, d,
             SUM(k * {_LLR_POS!r} + (n - k) * {_LLR_NEG!r})
               OVER (PARTITION BY variant ORDER BY d
                     ROWS UNBOUNDED PRECEDING) AS llr
      FROM daily
    ),
    dec AS (
      SELECT variant,
             MIN(CASE WHEN llr >= {_LN_A!r} THEN d END) AS d_h1,
             MIN(CASE WHEN llr <= {_LN_B!r} THEN d END) AS d_h0,
             MAX(d) AS d_last
      FROM walk GROUP BY variant
    ),
    final AS (
      SELECT w.variant, w.llr AS final_llr, dec.d_h1, dec.d_h0
      FROM walk w JOIN dec ON dec.variant = w.variant AND w.d = dec.d_last
    )
    SELECT variant,
           ROUND(final_llr, 6) AS final_llr,
           CASE WHEN d_h1 IS NOT NULL AND (d_h0 IS NULL OR d_h1 <= d_h0)
                THEN 'accept_h1'
                WHEN d_h0 IS NOT NULL THEN 'accept_h0'
                ELSE 'continue' END AS decision,
           LEAST(COALESCE(d_h1, DATE '9999-12-31'),
                 COALESCE(d_h0, DATE '9999-12-31')) AS decision_day
    FROM final ORDER BY variant
    """,
)
def q333_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test per variant: the
    cumulative log-likelihood ratio of daily conversion counts under
    H1 (p = {SPRT_P1}) vs H0 (p = {SPRT_P0}), with alpha = beta = 5%
    boundaries — the sequential design that tells you the FIRST day a
    decision was available instead of waiting out a fixed horizon.
    All four log constants are computed once in Python and inlined
    identically into both engines. Scale: one (variant, day)
    aggregate, a 2-partition running sum, and a 2-row decision
    assembly. decision_day is a sentinel date when the walk never
    crossed (the 'continue' row)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10
    ).cast("bigint")
    daily = ev.groupBy(
        F.when(bucket % 2 == 0, "A").otherwise("B").alias("variant"),
        F.col("ts").cast("date").alias("d"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    w = (
        W.partitionBy("variant")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    walk = daily.select(
        "variant",
        "d",
        F.sum(
            F.col("k") * _LLR_POS + (F.col("n") - F.col("k")) * _LLR_NEG
        )
        .over(w)
        .alias("llr"),
    )
    dec = walk.groupBy(F.col("variant").alias("dvariant")).agg(
        F.min(F.when(F.col("llr") >= _LN_A, F.col("d"))).alias("d_h1"),
        F.min(F.when(F.col("llr") <= _LN_B, F.col("d"))).alias("d_h0"),
        F.max("d").alias("d_last"),
    )
    final = walk.join(
        F.broadcast(dec),
        (F.col("variant") == F.col("dvariant"))
        & (F.col("d") == F.col("d_last")),
    ).select(F.col("variant").alias("v"), F.col("llr"), "d_h1", "d_h0")
    sentinel = F.lit("9999-12-31").cast("date")
    return final.select(
        F.col("v").alias("variant"),
        F.round("llr", 6).alias("final_llr"),
        F.when(
            F.col("d_h1").isNotNull()
            & (F.col("d_h0").isNull() | (F.col("d_h1") <= F.col("d_h0"))),
            "accept_h1",
        )
        .when(F.col("d_h0").isNotNull(), "accept_h0")
        .otherwise("continue")
        .alias("decision"),
        F.least(
            F.coalesce(F.col("d_h1"), sentinel),
            F.coalesce(F.col("d_h0"), sentinel),
        ).alias("decision_day"),
    ).orderBy("variant")
