"""Method-comparison batch 189 (q1012-q1016) — the measurement-
agreement toolkit (Bland & Altman 1986; Deming regression; Lin 1989
concordance; McNemar 1947; Schuirmann 1987 TOST): does a NEW
measurement pipeline agree with the reference one? The classic
clinical framing maps directly onto data-engineering migrations
(old vs new pricing pipeline, v1 vs v2 feature extractor).

Reference method A = order total in exact cents
(ROUND(o_totalprice*100)); candidate method B = A + a planted
deterministic bias-and-proportional-error term derived from md5 of
the order key (fixed +500c offset, ±0.005% proportional error) — so
both engines see identical integer pairs and the agreement statistics
have known structure (mean bias ~ +500c, near-perfect concordance
within segments).

All sums are EXACT (bigint / DECIMAL(38) per-row products); the
combined moments (Sxx, Syy, Sxy) become doubles only at the terminal
statistic — the same IEEE expression over the same exact sums in both
engines:

- q1012 Bland-Altman per market segment: mean difference, SD of
  differences from exact moments, 1.96-sigma limits of agreement and
  the % of orders inside them;
- q1013 Deming regression (lambda=1) per segment: slope =
  ((Syy-Sxx) + sqrt((Syy-Sxx)^2 + 4 Sxy^2)) / (2 Sxy), intercept
  through the means — the errors-in-both-variables line;
- q1014 Lin's concordance correlation per segment: CCC =
  2 Sxy / (Sxx + Syy + n (xbar-ybar)^2), with Pearson r alongside —
  how far agreement falls below correlation;
- q1015 McNemar's paired flag test per segment: methods flag
  high-value orders at a literal threshold; b/c discordant counts and
  the continuity-corrected statistic max(|b-c|-1,0)^2/(b+c) as an exact
  rational;
- q1016 TOST equivalence per segment: is |mean diff - 500c| within a
  literal ±200c margin at the literal 1.645 critical value — the
  two-one-sided-tests verdict as computed columns.

100 TB shape: ONE orders scan joined to the customer dim for the
segment (the canonical star shuffle), aggregated to 5 segment rows of
exact moments; every statistic is arithmetic on those 5 rows.

Determinism: integer cents end-to-end; md5-derived perturbations;
DECIMAL(38) exact sums; one terminal double expression per statistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

FLAG_CENTS = 15_000_000  # 150k dollars
MARGIN_CENTS = 200
BIAS_CENTS = 500


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _pair_cte(d: str) -> str:
    """(segment, a_cents, b_cents) per order: the reference and the
    planted candidate measurement, both exact bigints."""
    if d == "spark":
        mill = (
            "CAST(conv(substring(md5(concat(CAST(o.o_orderkey AS STRING),"
            " '_mc')), 1, 4), 16, 10) AS BIGINT) % 1001 - 500"
        )
    else:
        mill = (
            "(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR) || '_mc'),"
            " 1, 4))::BIGINT) % 1001 - 500"
        )
    return f"""pairs AS (
      SELECT c.c_mktsegment AS segment,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS a_cents,
             CAST(ROUND(o.o_totalprice * 100) AS BIGINT) + {BIAS_CENTS}
               + CAST(FLOOR(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)
                            * ({mill}) / 10000000.0) AS BIGINT) AS b_cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )"""


def _mom_cte(d: str) -> str:
    """Exact per-segment moment sums. Per-row squares fit bigint
    (cents <= ~6e7 -> squares <= 4e15); the SUMs are DECIMAL(38,0) so
    no scale ever overflows them."""
    dec = "DECIMAL(38,0)"
    return f"""moments AS (
      SELECT segment,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(a_cents AS {dec})) AS {dec}) AS sx,
             CAST(SUM(CAST(b_cents AS {dec})) AS {dec}) AS sy,
             CAST(SUM(CAST(a_cents * a_cents AS {dec})) AS {dec}) AS sxx,
             CAST(SUM(CAST(b_cents * b_cents AS {dec})) AS {dec}) AS syy,
             CAST(SUM(CAST(a_cents * b_cents AS {dec})) AS {dec}) AS sxy,
             CAST(SUM(CAST(b_cents - a_cents AS {dec})) AS {dec}) AS sd,
             CAST(SUM(CAST((b_cents - a_cents) * (b_cents - a_cents)
                           AS {dec})) AS {dec}) AS sdd
      FROM pairs GROUP BY segment
    )"""


def _q1012_sql(d: str) -> str:
    return f"""
    WITH {_pair_cte(d)},
    {_mom_cte(d)},
    stats AS (
      SELECT segment, n,
             CAST(sd AS DOUBLE) / n AS mean_diff,
             SQRT((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                   - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
               AS sd_diff
      FROM moments
    ),
    lims AS (
      SELECT segment, n, mean_diff, sd_diff,
             mean_diff - 1.96 * sd_diff AS loa_lower,
             mean_diff + 1.96 * sd_diff AS loa_upper
      FROM stats
    )
    SELECT l.segment, l.n, l.mean_diff, l.sd_diff, l.loa_lower, l.loa_upper,
           CAST(SUM(CASE WHEN (p.b_cents - p.a_cents) > l.loa_lower
                          AND (p.b_cents - p.a_cents) < l.loa_upper
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
    FROM pairs p JOIN lims l ON l.segment = p.segment
    GROUP BY l.segment, l.n, l.mean_diff, l.sd_diff, l.loa_lower, l.loa_upper
    ORDER BY l.segment
    """


@query("q1012_bland_altman", oracle=_q1012_sql("duckdb"))
def q1012_bland_altman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bland-Altman agreement per segment: mean difference and
    1.96-sigma limits of agreement from EXACT difference moments, plus
    the count of orders whose difference falls inside the limits
    (~95% when differences are roughly normal). Two passes over the
    pair CTE (moments, then the inside-count against the 5 limit
    rows) — both single star joins."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_q1012_sql("spark"))


def _q1013_sql(d: str) -> str:
    return f"""
    WITH {_pair_cte(d)},
    {_mom_cte(d)},
    cent AS (
      SELECT segment, n,
             CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS cxx,
             CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS cyy,
             CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cxy,
             CAST(sx AS DOUBLE) / n AS xbar,
             CAST(sy AS DOUBLE) / n AS ybar
      FROM moments
    )
    SELECT segment, n,
           ((cyy - cxx) + SQRT((cyy - cxx) * (cyy - cxx) + 4.0 * cxy * cxy))
             / (2.0 * cxy) AS deming_slope,
           ybar - ((cyy - cxx) + SQRT((cyy - cxx) * (cyy - cxx)
                                      + 4.0 * cxy * cxy))
                  / (2.0 * cxy) * xbar AS deming_intercept,
           xbar, ybar
    FROM cent
    ORDER BY segment
    """


@query("q1013_deming_regression", oracle=_q1013_sql("duckdb"))
def q1013_deming_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deming regression (errors in both variables, lambda=1) per
    segment: slope from the centered-moment quadratic, intercept
    through the means. The centered moments are doubles OF exact
    DECIMAL sums, so both engines evaluate identical IEEE expressions;
    the planted ~1.0025x proportional structure shows up as slope
    slightly above 1."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_q1013_sql("spark"))


def _q1014_sql(d: str) -> str:
    return f"""
    WITH {_pair_cte(d)},
    {_mom_cte(d)},
    cent AS (
      SELECT segment, n,
             CAST(sxx AS DOUBLE) / n
               - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n) AS vx,
             CAST(syy AS DOUBLE) / n
               - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS vy,
             CAST(sxy AS DOUBLE) / n
               - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n) AS cxy,
             CAST(sx AS DOUBLE) / n - CAST(sy AS DOUBLE) / n AS dmean
      FROM moments
    )
    SELECT segment, n,
           2.0 * cxy / (vx + vy + dmean * dmean) AS lin_ccc,
           cxy / SQRT(vx * vy) AS pearson_r,
           (2.0 * cxy / (vx + vy + dmean * dmean)) / (cxy / SQRT(vx * vy))
             AS bias_correction_factor
    FROM cent
    ORDER BY segment
    """


@query("q1014_lin_concordance", oracle=_q1014_sql("duckdb"))
def q1014_lin_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lin's concordance correlation per segment — the agreement
    coefficient that penalizes location/scale shift, with Pearson r
    and the bias-correction factor C_b = CCC/r alongside. Population
    (1/n) moments; one terminal double expression each."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_q1014_sql("spark"))


def _q1015_sql(d: str) -> str:
    return f"""
    WITH {_pair_cte(d)},
    flags AS (
      SELECT segment,
             CASE WHEN a_cents > {FLAG_CENTS} THEN 1 ELSE 0 END AS fa,
             CASE WHEN b_cents > {FLAG_CENTS} THEN 1 ELSE 0 END AS fb
      FROM pairs
    )
    SELECT segment,
           CAST(SUM(CASE WHEN fa = 1 AND fb = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS both_flag,
           CAST(SUM(CASE WHEN fa = 1 AND fb = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS b_discordant,
           CAST(SUM(CASE WHEN fa = 0 AND fb = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS c_discordant,
           CAST(SUM(CASE WHEN fa = 0 AND fb = 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS neither_flag,
           CAST(GREATEST(ABS(SUM(CASE WHEN fa = 1 AND fb = 0 THEN 1 ELSE 0 END)
                     - SUM(CASE WHEN fa = 0 AND fb = 1 THEN 1 ELSE 0 END)) - 1, 0)
                * GREATEST(ABS(SUM(CASE WHEN fa = 1 AND fb = 0 THEN 1 ELSE 0 END)
                       - SUM(CASE WHEN fa = 0 AND fb = 1 THEN 1 ELSE 0 END)) - 1, 0)
             AS BIGINT) AS mcnemar_num,
           CAST(SUM(CASE WHEN fa <> fb THEN 1 ELSE 0 END) AS BIGINT)
             AS mcnemar_den
    FROM flags
    GROUP BY segment
    ORDER BY segment
    """


@query("q1015_mcnemar_flags", oracle=_q1015_sql("duckdb"))
def q1015_mcnemar_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test on high-value flags (literal 150k-dollar
    threshold): the 2x2 concordance table per segment and the
    continuity-corrected statistic max(|b-c|-1,0)^2 / (b+c) carried as
    an exact integer rational (num/den columns). The planted +bias means
    b_cents crosses the threshold first — c dominates b."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_q1015_sql("spark"))


def _q1016_sql(d: str) -> str:
    return f"""
    WITH {_pair_cte(d)},
    {_mom_cte(d)},
    stats AS (
      SELECT segment, n,
             CAST(sd AS DOUBLE) / n AS mean_diff,
             SQRT(((CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE)
                    - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE))
                   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))
                  / n) AS se_diff
      FROM moments
    )
    SELECT segment, n, mean_diff, se_diff,
           (mean_diff - ({BIAS_CENTS} - {MARGIN_CENTS})) / se_diff AS t_lower,
           (({BIAS_CENTS} + {MARGIN_CENTS}) - mean_diff) / se_diff AS t_upper,
           CAST(CASE WHEN (mean_diff - ({BIAS_CENTS} - {MARGIN_CENTS}))
                          / se_diff > 1.645
                      AND (({BIAS_CENTS} + {MARGIN_CENTS}) - mean_diff)
                          / se_diff > 1.645
                THEN 1 ELSE 0 END AS INT) AS equivalent
    FROM stats
    ORDER BY segment
    """


@query("q1016_tost_equivalence", oracle=_q1016_sql("duckdb"))
def q1016_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence per segment: both one-sided t statistics for
    the difference against the declared bias window 500c +/- 200c,
    with the literal 1.645 critical value — the migration sign-off
    question ('is the new pipeline within the agreed tolerance?') as
    computed columns. The standard error comes from the same exact
    moments as q1012."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_q1016_sql("spark"))
