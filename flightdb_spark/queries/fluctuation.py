"""Fluctuation-scaling batch 129 (q711-q715) — Taylor's power law and
dispersion analytics over per-part daily demand (exact integer
quantities), the variance structure an inventory/forecast pipeline
must know before it picks a noise model:

- q711 Taylor's-law fit: ln(variance) vs ln(mean) across parts — the
  slope b (1 = Poisson-like, 2 = proportional/clustered) via the
  7 dp ln-term DECIMAL moment contract (q282 elasticity pattern);
- q712 dispersion census: per-part index of dispersion classified
  under/Poisson-ish/over by EXACT integer cross-multiplication
  (§3 — never a float threshold);
- q713 aggregation scaling: weekly-total variance vs 7x daily
  variance — the temporal-correlation read (ratio > 1 = positively
  autocorrelated demand), zero-fill handled analytically through
  horizon-count moments (zeros add nothing to sums);
- q714 Taylor outliers: the parts furthest off the fitted power law
  (residual in log space), top-10;
- q715 overdispersed top-10: the highest-dispersion parts above
  volume floors — the SKUs a Poisson forecaster gets most wrong.

100 TB shape: ONE reduction of lineitem to per-part integer moments
(n, sum, sumsq at daily and weekly grain); the Taylor fit is a
second bounded aggregate over per-part ln terms; top-ks are
TakeOrdered. No windows at all.

Determinism: all moments exact BIGINT; ln terms round at 7 dp into
DECIMAL(38,7) sums (§5 two-finer contract; outputs at 5-6 dp);
class thresholds are integer cross-multiplications; per-part
dispersion ratios quantize via FLOOR(x*1e6 + 0.5) when averaged
(q666 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MIN_DAYS = 10  # parts need this many active days to enter the fit


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )


def _us(dialect: str) -> str:
    return (
        "unix_micros(CAST(l_shipdate AS TIMESTAMP))"
        if dialect == "spark"
        else "epoch_us(l_shipdate)"
    )


def _mom_cte(dialect: str) -> str:
    """Per-part exact daily-demand moments over ACTIVE days."""
    day = (
        f"CAST(FLOOR(CAST({_us(dialect)} AS DOUBLE)"
        f" / CAST(86400000000 AS DOUBLE)) AS BIGINT)"
    )
    return f"""daily AS (
      SELECT l_partkey AS pk, {day} AS d,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem
      GROUP BY l_partkey, {day}
    ),
    mom AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(q) AS BIGINT) AS sq,
             CAST(SUM(q * q) AS BIGINT) AS sq2
      FROM daily GROUP BY pk
    )"""


# shared: variance numerator n*sq2 - sq^2 (exact, >= 0), var = ./(n(n-1))
_MEAN = "CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)"
_VAR = (
    "CAST(n * sq2 - sq * sq AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))"
)


def _fit_cte(dialect: str) -> str:
    """ln-term moment sums for the Taylor OLS (7 dp contract)."""
    return f"""{_mom_cte(dialect)},
    lnterms AS (
      SELECT pk,
             ROUND(ln({_MEAN}), 7) AS lm,
             ROUND(ln({_VAR}), 7) AS lv
      FROM mom
      WHERE n >= {MIN_DAYS} AND n * sq2 - sq * sq > 0
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS np,
             CAST(SUM(CAST(lm AS DECIMAL(38,7))) AS DOUBLE) AS slm,
             CAST(SUM(CAST(lv AS DECIMAL(38,7))) AS DOUBLE) AS slv,
             CAST(SUM(CAST(ROUND(lm * lv, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS slmlv,
             CAST(SUM(CAST(ROUND(lm * lm, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS slmlm
      FROM lnterms
    ),
    coef AS (
      SELECT np,
             (CAST(np AS DOUBLE) * slmlv - slm * slv)
               / (CAST(np AS DOUBLE) * slmlm - slm * slm) AS b,
             (slv - (CAST(np AS DOUBLE) * slmlv - slm * slv)
                    / (CAST(np AS DOUBLE) * slmlm - slm * slm) * slm)
               / CAST(np AS DOUBLE) AS a
      FROM fit
    )"""


# ---------------------------------------------------------------------------
# q711 — Taylor's-law fit


def _q711_sql(dialect: str) -> str:
    return f"""
    WITH {_fit_cte(dialect)}
    SELECT np AS n_parts,
           ROUND(b, 5) AS taylor_exponent,
           ROUND(a, 5) AS taylor_intercept_ln
    FROM coef
    """


@query("q711_taylor_law", oracle=_q711_sql("duck"))
def q711_taylor_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taylor's power law: the log-log OLS slope of daily-demand
    variance on mean across parts with >= 10 active days. b near 1 is
    Poisson-like independence, b near 2 is proportional (clustered)
    fluctuation — the exponent picks the forecaster's error model.
    ln terms at 7 dp into DECIMAL sums, outputs at 5 dp (§5)."""
    _views(spark, sf_dir)
    return spark.sql(_q711_sql("spark"))


# ---------------------------------------------------------------------------
# q712 — dispersion census


def _q712_sql(dialect: str) -> str:
    # D = var/mean > 1.2  <=>  5*(n*sq2 - sq^2) > 6*(n-1)*sq  (exact)
    over = "5 * (n * sq2 - sq * sq) > 6 * (n - 1) * sq"
    under = "5 * (n * sq2 - sq * sq) < 4 * (n - 1) * sq"
    return f"""
    WITH {_mom_cte(dialect)},
    classed AS (
      SELECT pk, n, sq, sq2,
             CASE WHEN {over} THEN 'overdispersed'
                  WHEN {under} THEN 'underdispersed'
                  ELSE 'poisson_like' END AS klass,
             CAST(FLOOR(({_VAR}) / ({_MEAN})
                        * CAST(1000000 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS d_micro
      FROM mom WHERE n >= {MIN_DAYS}
    )
    SELECT klass,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(d_micro) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / CAST(1000000 AS DOUBLE) AS avg_dispersion
    FROM classed
    GROUP BY klass
    ORDER BY klass
    """


@query("q712_dispersion_census", oracle=_q712_sql("duck"))
def q712_dispersion_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-of-dispersion census: each part's daily-demand
    variance/mean classified under (< 0.8) / Poisson-ish / over
    (> 1.2) — thresholds tested as exact integer cross-products (§3),
    the per-class average accumulated as FLOOR micro-units."""
    _views(spark, sf_dir)
    return spark.sql(_q712_sql("spark"))


# ---------------------------------------------------------------------------
# q713 — aggregation scaling (weekly vs daily variance)


def _q713_sql(dialect: str) -> str:
    # horizon day/week counts are global scalars; zero-filled moments
    # need only the ACTIVE sums (zeros contribute nothing to sq/sq2).
    return f"""
    WITH {_mom_cte(dialect)},
    weekly AS (
      SELECT pk,
             CAST(FLOOR(CAST(d AS DOUBLE) / CAST(7 AS DOUBLE)) AS BIGINT)
               AS wk,
             CAST(SUM(q) AS BIGINT) AS q
      FROM daily GROUP BY pk,
               CAST(FLOOR(CAST(d AS DOUBLE) / CAST(7 AS DOUBLE)) AS BIGINT)
    ),
    wmom AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS nw,
             CAST(SUM(q) AS BIGINT) AS swq,
             CAST(SUM(q * q) AS BIGINT) AS swq2
      FROM weekly GROUP BY pk
    ),
    horizon AS (
      SELECT CAST(MAX(d) - MIN(d) + 1 AS BIGINT) AS nd_full,
             CAST(FLOOR(CAST(MAX(d) AS DOUBLE) / CAST(7 AS DOUBLE))
                  - FLOOR(CAST(MIN(d) AS DOUBLE) / CAST(7 AS DOUBLE))
                  + 1 AS BIGINT) AS nw_full
      FROM daily
    ),
    ratios AS (
      SELECT /*+ BROADCAST(h) */ m.pk,
             -- zero-filled variances over the full horizon
             (CAST(h.nd_full AS DOUBLE) * CAST(m.sq2 AS DOUBLE)
              - CAST(m.sq AS DOUBLE) * CAST(m.sq AS DOUBLE))
               / (CAST(h.nd_full AS DOUBLE)
                  * CAST(h.nd_full - 1 AS DOUBLE)) AS var_d,
             (CAST(h.nw_full AS DOUBLE) * CAST(w.swq2 AS DOUBLE)
              - CAST(w.swq AS DOUBLE) * CAST(w.swq AS DOUBLE))
               / (CAST(h.nw_full AS DOUBLE)
                  * CAST(h.nw_full - 1 AS DOUBLE)) AS var_w
      FROM mom m
      JOIN wmom w ON w.pk = m.pk
      CROSS JOIN horizon h
      WHERE m.n >= {MIN_DAYS} AND m.n * m.sq2 - m.sq * m.sq > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN var_w > CAST(7 AS DOUBLE) * var_d
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_positively_corr,
           CAST(SUM(CASE WHEN var_w < CAST(7 AS DOUBLE) * var_d
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_negatively_corr,
           CAST(SUM(CAST(FLOOR(var_w / (CAST(7 AS DOUBLE) * var_d)
                               * CAST(1000000 AS DOUBLE)
                               + CAST(0.5 AS DOUBLE)) AS BIGINT))
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / CAST(1000000 AS DOUBLE) AS avg_scaling_ratio
    FROM ratios
    """


@query("q713_aggregation_scaling", oracle=_q713_sql("duck"))
def q713_aggregation_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal aggregation scaling: weekly-total variance vs 7x
    daily variance per part, zero-filled analytically over the global
    horizon (absent days/weeks add nothing to the sums, so only the
    horizon counts enter). Ratio above 1 = positively autocorrelated
    demand — weekly forecasts can't just scale daily noise by 7."""
    _views(spark, sf_dir)
    return spark.sql(_q713_sql("spark"))


# ---------------------------------------------------------------------------
# q714 — Taylor outliers


def _q714_sql(dialect: str) -> str:
    return f"""
    WITH {_fit_cte(dialect)}
    SELECT /*+ BROADCAST(c) */ l.pk AS partkey,
           ROUND(l.lm, 5) AS ln_mean,
           ROUND(l.lv, 5) AS ln_var,
           ROUND(l.lv - (c.a + c.b * l.lm), 5) AS residual
    FROM lnterms l CROSS JOIN coef c
    ORDER BY ROUND(ABS(l.lv - (c.a + c.b * l.lm)), 5) DESC, l.pk ASC
    LIMIT 10
    """


@query("q714_taylor_outliers", oracle=_q714_sql("duck"))
def q714_taylor_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten parts furthest off the fitted Taylor line in log
    space — demand whose variance structure doesn't match its volume
    class (promo-driven spikes above, contract-steady flows below).
    Ranked on the 5 dp-rounded |residual| with key tie-break (§4)."""
    _views(spark, sf_dir)
    return spark.sql(_q714_sql("spark"))


# ---------------------------------------------------------------------------
# q715 — overdispersed top-10


def _q715_sql(dialect: str) -> str:
    return f"""
    WITH {_mom_cte(dialect)}
    SELECT pk AS partkey, n AS active_days, sq AS total_qty,
           ROUND(({_VAR}) / ({_MEAN}), 6) AS dispersion_index
    FROM mom
    WHERE n >= 20 AND sq >= 100
    ORDER BY ROUND(({_VAR}) / ({_MEAN}), 6) DESC, pk ASC
    LIMIT 10
    """


@query("q715_overdispersed_topk", oracle=_q715_sql("duck"))
def q715_overdispersed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten most overdispersed parts above volume floors (>= 20
    active days, >= 100 units): the SKUs where a Poisson safety-stock
    formula underestimates worst. Rank on the rounded dispersion
    index, part tie-break, TakeOrdered."""
    _views(spark, sf_dir)
    return spark.sql(_q715_sql("spark"))
