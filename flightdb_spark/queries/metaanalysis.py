"""Meta-analysis batch 130 (q716-q720) — the evidence-pooling
machinery an experimentation/epidemiology pipeline runs when the
same effect is measured in several strata ("studies" = ship years
1995-2001; effect = log odds ratio of a line being RETURNED given a
deep discount, from each year's exact 2x2 table):

- q716 forest table: per study, the 2x2 cells, odds ratio, log-OR,
  inverse-variance weight, and the 95% CI;
- q717 fixed-effect pooling: inverse-variance weighted mean log-OR,
  its SE and z — the common-effect answer;
- q718 heterogeneity: Cochran's Q, I^2, and the DerSimonian-Laird
  tau^2 — is one number even the right summary?;
- q719 random-effects pooling: DL-weighted mean with tau^2 widening,
  against the fixed-effect answer;
- q720 leave-one-out sensitivity: the pooled estimate with each
  study removed — which year drives the conclusion.

100 TB shape: ONE scan reduces the fact table to 7 exact 2x2 tables;
everything downstream runs on that bounded study table. Discount
exposure is an integer-cents comparison (FLOOR(discount*100+0.5) >
5), never a float threshold.

Determinism: cell counts exact; the inverse-variance weight uses the
integer identity w = abcd / (bcd + acd + abd + abc) with DECIMAL(19)
products (overflow-safe at any SF); ln-OR rounds at 7 dp, every
weighted term at 9 dp into DECIMAL sums (§1/§5); leave-one-out
subtracts the SAME rounded per-study terms the totals accumulated,
so the arithmetic is closed over the rounded representation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )


def _studies_cte() -> str:
    """Per ship-year exact 2x2: exposure = discount > 5 cents/unit
    (integer compare), outcome = returnflag R."""
    return """cells AS (
      SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
             CAST(SUM(CASE WHEN CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) > 5
                            AND l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS a,
             CAST(SUM(CASE WHEN CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) > 5
                            AND l_returnflag <> 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS b,
             CAST(SUM(CASE WHEN CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) <= 5
                            AND l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS c,
             CAST(SUM(CASE WHEN CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) <= 5
                            AND l_returnflag <> 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS d
      FROM lineitem
      GROUP BY CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)
    ),
    studies AS (
      SELECT yr, a, b, c, d,
             ROUND(ln(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                      / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE))), 7)
               AS lnor,
             -- w = 1/(1/a+1/b+1/c+1/d) = abcd / (bcd+acd+abd+abc),
             -- exact integer numerator/denominator via DECIMAL(19)
             CAST(CAST(a AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0))
                  * CAST(c AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))
                  AS DOUBLE)
               / CAST(CAST(b AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
                        * CAST(d AS DECIMAL(19,0))
                      + CAST(a AS DECIMAL(19,0)) * CAST(c AS DECIMAL(19,0))
                        * CAST(d AS DECIMAL(19,0))
                      + CAST(a AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0))
                        * CAST(d AS DECIMAL(19,0))
                      + CAST(a AS DECIMAL(19,0)) * CAST(b AS DECIMAL(19,0))
                        * CAST(c AS DECIMAL(19,0)) AS DOUBLE) AS w
      FROM cells
      WHERE a > 0 AND b > 0 AND c > 0 AND d > 0
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(CAST(ROUND(w, 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS sw,
             CAST(SUM(CAST(ROUND(w * lnor, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS swl,
             CAST(SUM(CAST(ROUND(w * lnor * lnor, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS swll,
             CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS sww
      FROM studies
    )"""


# ---------------------------------------------------------------------------
# q716 — forest table

_FOREST_SQL = f"""
    WITH {_studies_cte()}
    SELECT yr, a, b, c, d,
           CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
             / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) AS odds_ratio,
           ROUND(lnor, 6) AS log_or,
           ROUND(w, 4) AS iv_weight,
           ROUND(exp(lnor - CAST(1.96 AS DOUBLE) / sqrt(w)), 5) AS ci_lo,
           ROUND(exp(lnor + CAST(1.96 AS DOUBLE) / sqrt(w)), 5) AS ci_hi
    FROM studies
    ORDER BY yr
    """


@query("q716_forest_table", oracle=_FOREST_SQL)
def q716_forest_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The forest-plot table: per ship-year 2x2 cells, odds ratio
    (unrounded exact-integer rational), log-OR, inverse-variance
    weight (the exact abcd identity), and the Wald 95% CI. Seven
    rows; one fact-table pass."""
    _views(spark, sf_dir)
    return spark.sql(_FOREST_SQL)


# ---------------------------------------------------------------------------
# q717 — fixed-effect pooled estimate

_FE_SQL = f"""
    WITH {_studies_cte()}
    SELECT k AS n_studies,
           ROUND(swl / sw, 6) AS pooled_log_or,
           ROUND(exp(swl / sw), 6) AS pooled_odds_ratio,
           ROUND(CAST(1 AS DOUBLE) / sqrt(sw), 6) AS pooled_se,
           ROUND(swl / sw * sqrt(sw), 6) AS z_stat
    FROM sums
    """


@query("q717_fixed_effect_pooled", oracle=_FE_SQL)
def q717_fixed_effect_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-variance fixed-effect pooling: the weighted mean
    log-OR across the seven year-studies, its SE = 1/sqrt(sum w) and
    z. The common-effect answer — valid exactly when q718 says the
    studies are homogeneous."""
    _views(spark, sf_dir)
    return spark.sql(_FE_SQL)


# ---------------------------------------------------------------------------
# q718 — heterogeneity (Q, I^2, DL tau^2)

_HET_SQL = f"""
    WITH {_studies_cte()}
    SELECT k AS n_studies,
           ROUND(swll - swl * swl / sw, 5) AS cochran_q,
           CAST(k - 1 AS BIGINT) AS df,
           ROUND(GREATEST(CAST(0 AS DOUBLE),
                 (swll - swl * swl / sw - CAST(k - 1 AS DOUBLE))
                 / (swll - swl * swl / sw)), 5) AS i_squared,
           ROUND(GREATEST(CAST(0 AS DOUBLE),
                 (swll - swl * swl / sw - CAST(k - 1 AS DOUBLE))
                 / (sw - sww / sw)), 6) AS dl_tau_squared
    FROM sums
    """


@query("q718_heterogeneity", oracle=_HET_SQL)
def q718_heterogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heterogeneity diagnostics: Cochran's Q (computed by the
    expansion Q = sum w l^2 - (sum w l)^2 / sum w over the DECIMAL-
    accumulated moments), I^2, and the DerSimonian-Laird tau^2 =
    (Q - df) / (sum w - sum w^2 / sum w), floored at 0."""
    _views(spark, sf_dir)
    return spark.sql(_HET_SQL)


# ---------------------------------------------------------------------------
# q719 — random-effects pooled estimate

_RE_SQL = f"""
    WITH {_studies_cte()},
    tau AS (
      SELECT GREATEST(CAST(0 AS DOUBLE),
             (swll - swl * swl / sw - CAST(k - 1 AS DOUBLE))
             / (sw - sww / sw)) AS tau2,
             swl / sw AS fe_pooled
      FROM sums
    ),
    re_terms AS (
      SELECT /*+ BROADCAST(t) */
             t.fe_pooled, t.tau2,
             CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE)
                                 / (CAST(1 AS DOUBLE) / s.w + t.tau2), 9)
                           AS DECIMAL(38,9))) AS DOUBLE) AS swr,
             CAST(SUM(CAST(ROUND(s.lnor
                                 / (CAST(1 AS DOUBLE) / s.w + t.tau2), 9)
                           AS DECIMAL(38,9))) AS DOUBLE) AS swrl
      FROM studies s CROSS JOIN tau t
      GROUP BY t.fe_pooled, t.tau2
    )
    SELECT ROUND(tau2, 6) AS dl_tau_squared,
           ROUND(swrl / swr, 6) AS re_pooled_log_or,
           ROUND(exp(swrl / swr), 6) AS re_pooled_odds_ratio,
           ROUND(CAST(1 AS DOUBLE) / sqrt(swr), 6) AS re_pooled_se,
           ROUND(fe_pooled, 6) AS fe_pooled_log_or
    FROM re_terms
    """


@query("q719_random_effects_pooled", oracle=_RE_SQL)
def q719_random_effects_pooled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DerSimonian-Laird random-effects pooling: each study's weight
    widens to 1/(1/w + tau^2), so heterogeneous studies pull the
    pooled estimate toward the unweighted mean and widen its SE —
    shown against the fixed-effect answer. Weighted terms accumulate
    at 9 dp into DECIMAL sums (§1)."""
    _views(spark, sf_dir)
    return spark.sql(_RE_SQL)


# ---------------------------------------------------------------------------
# q720 — leave-one-out sensitivity

_LOO_SQL = f"""
    WITH {_studies_cte()}
    SELECT /*+ BROADCAST(t) */ s.yr AS left_out_year,
           ROUND((t.swl - CAST(ROUND(s.w * s.lnor, 9) AS DOUBLE))
                 / (t.sw - CAST(ROUND(s.w, 9) AS DOUBLE)), 6)
             AS pooled_without,
           ROUND(t.swl / t.sw, 6) AS pooled_full,
           ROUND((t.swl - CAST(ROUND(s.w * s.lnor, 9) AS DOUBLE))
                 / (t.sw - CAST(ROUND(s.w, 9) AS DOUBLE))
                 - t.swl / t.sw, 6) AS influence
    FROM studies s CROSS JOIN sums t
    ORDER BY s.yr
    """


@query("q720_leave_one_out", oracle=_LOO_SQL)
def q720_leave_one_out(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out sensitivity: the fixed-effect pooled log-OR with
    each year-study removed, and its influence on the full estimate.
    The subtraction uses exactly the ROUND(.,9) terms the totals
    accumulated, so LOO arithmetic is closed over the rounded
    representation — no re-derivation drift."""
    _views(spark, sf_dir)
    return spark.sql(_LOO_SQL)
