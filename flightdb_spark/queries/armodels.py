"""AR-model batch 108 (q606-q610) — autoregressive fitting on the
daily revenue series via EXACT autocovariances: the series is integer
cents (per-row FLOOR(x*100+0.5)), deviations are scaled by n
(d_i = n*x_i - S, still integer), and every lagged cross-product
accumulates in DECIMAL(38,0) (operands widened to DECIMAL(19,0)
first — DuckDB multiplies narrow decimals in int64 and overflows,
the q245 lesson). Every correlation r_k is then ONE double division
of two exact integers, so Yule-Walker algebra is bit-deterministic.

- q606 autocovariance table: C_k and r_k for k = 0..7 (lag joins are
  equi-joins on the day index — no window anywhere);
- q607 AR(1) fit: phi = r1, innovation-variance ratio 1 - r1^2,
  mean-reversion half-life ln(1/2)/ln|phi|;
- q608 AR(2) Yule-Walker: phi1 = r1(1-r2)/(1-r1^2),
  phi2 = (r2-r1^2)/(1-r1^2), with the stationarity-triangle checks;
- q609 PACF 1..3 by the Durbin-Levinson closed forms;
- q610 one-step backtest: in-sample AR(1) predictions vs the naive
  random-walk and mean-only baselines (SSE ratios), lag features via
  an i-1 equi-join.

100 TB shape: ONE aggregate collapses the corpus to the bounded
daily table; all lag structure after that is equi-joins on the
bounded table (<= 8 x days rows) — no global window, no allowlist
entry needed. The DECIMAL(38,0) moments survive sf0.1+ magnitudes
where BIGINT products would overflow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MAX_LAG = 7


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _dev_cte(dialect: str) -> str:
    """Daily cents with n-scaled integer deviations d = n*x - S."""
    return f"""daily0 AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    mind AS (
      SELECT MIN(d) AS d0, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s
      FROM daily0
    ),
    dev AS (
      SELECT CAST({_days(dialect, 'm.d0', 'x.d')} AS BIGINT) AS i,
             x.cents, m.n, m.s,
             CAST(m.n * x.cents - m.s AS BIGINT) AS dv
      FROM daily0 x CROSS JOIN mind m
    )"""


def _cov_cte(dialect: str) -> str:
    """C_k = sum over i of dv_i * dv_{i+k}, DECIMAL(38,0)-exact."""
    lags = ", ".join(f"({k})" for k in range(0, MAX_LAG + 1))
    return f"""{_dev_cte(dialect)},
    lags(k) AS (VALUES {lags}),
    cov AS (
      SELECT l.k,
             SUM(CAST(x.dv AS DECIMAL(19,0)) * CAST(y.dv AS DECIMAL(19,0)))
               AS c,
             CAST(COUNT(*) AS BIGINT) AS n_terms
      FROM dev x
      CROSS JOIN lags l
      JOIN dev y ON y.i = x.i + l.k
      GROUP BY l.k
    ),
    r AS (
      SELECT MAX(CASE WHEN c.k = 0 THEN c.n_terms END) AS n_days,
             MAX(CASE WHEN c.k = 1 THEN CAST(c.c AS DOUBLE) END)
               / MAX(CASE WHEN c.k = 0 THEN CAST(c.c AS DOUBLE) END) AS r1,
             MAX(CASE WHEN c.k = 2 THEN CAST(c.c AS DOUBLE) END)
               / MAX(CASE WHEN c.k = 0 THEN CAST(c.c AS DOUBLE) END) AS r2,
             MAX(CASE WHEN c.k = 3 THEN CAST(c.c AS DOUBLE) END)
               / MAX(CASE WHEN c.k = 0 THEN CAST(c.c AS DOUBLE) END) AS r3
      FROM cov c
    )"""


# ---------------------------------------------------------------------------
# q606 — autocovariance table


def _acov_sql(dialect: str) -> str:
    return f"""
    WITH {_cov_cte(dialect)}
    SELECT c.k AS lag, c.n_terms,
           ROUND(CAST(c.c AS DOUBLE)
                 / (SELECT CAST(c0.c AS DOUBLE) FROM cov c0 WHERE c0.k = 0), 6)
             AS r_k
    FROM cov c
    ORDER BY lag
    """


@query("q606_autocovariance_table", oracle=_acov_sql("duck"))
def q606_autocovariance_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The autocorrelation table r_0..r_7 from exact DECIMAL(38,0)
    lagged cross-products of n-scaled integer deviations — each r_k
    is one double division of two exact integers. Lag joins are
    equi-joins on the bounded day index (8 x days rows); the corpus
    is touched by exactly one aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_acov_sql("spark"))


# ---------------------------------------------------------------------------
# q607 — AR(1) fit


def _ar1_sql(dialect: str) -> str:
    return f"""
    WITH {_cov_cte(dialect)}
    SELECT n_days,
           ROUND(r1, 6) AS phi,
           ROUND(1.0 - r1 * r1, 6) AS innovation_var_ratio,
           CASE WHEN r1 > 0 AND r1 < 1
                THEN ROUND(ln(0.5) / ln(r1), 4)
                ELSE CAST(NULL AS DOUBLE) END AS half_life_days
    FROM r
    """


@query("q607_ar1_fit", oracle=_ar1_sql("duck"))
def q607_ar1_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) by Yule-Walker: phi = r1 (exact-integer-ratio double),
    the innovation variance ratio 1 - r1^2, and the mean-reversion
    half-life ln(1/2)/ln(phi) (a ratio of two libm lns on identical
    doubles, rounded at 4 dp; guarded to phi in (0,1))."""
    _views(spark, sf_dir)
    return spark.sql(_ar1_sql("spark"))


# ---------------------------------------------------------------------------
# q608 — AR(2) Yule-Walker


def _ar2_sql(dialect: str) -> str:
    return f"""
    WITH {_cov_cte(dialect)}
    SELECT n_days,
           ROUND(r1 * (1.0 - r2) / (1.0 - r1 * r1), 6) AS phi1,
           ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS phi2,
           CAST(CASE WHEN (r2 - r1 * r1) / (1.0 - r1 * r1) > -1
                      AND (r2 - r1 * r1) / (1.0 - r1 * r1)
                          + r1 * (1.0 - r2) / (1.0 - r1 * r1) < 1
                      AND (r2 - r1 * r1) / (1.0 - r1 * r1)
                          - r1 * (1.0 - r2) / (1.0 - r1 * r1) < 1
                     THEN 1 ELSE 0 END AS BIGINT) AS stationary,
           ROUND(1.0 - (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * r1
                     - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2, 6)
             AS innovation_var_ratio
    FROM r
    """


@query("q608_ar2_yule_walker", oracle=_ar2_sql("duck"))
def q608_ar2_yule_walker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) by Yule-Walker closed form: phi1 = r1(1-r2)/(1-r1^2),
    phi2 = (r2-r1^2)/(1-r1^2), the stationarity-triangle flags
    (phi2 > -1, phi1+phi2 < 1, phi2-phi1 < 1) as exact 0/1 on
    identical doubles, and 1 - phi1 r1 - phi2 r2."""
    _views(spark, sf_dir)
    return spark.sql(_ar2_sql("spark"))


# ---------------------------------------------------------------------------
# q609 — PACF via Durbin-Levinson


def _pacf_sql(dialect: str) -> str:
    return f"""
    WITH {_cov_cte(dialect)}
    SELECT n_days,
           ROUND(r1, 6) AS pacf1,
           ROUND((r2 - r1 * r1) / (1.0 - r1 * r1), 6) AS pacf2,
           -- Durbin-Levinson step 3 with a11=r1, a22=(r2-r1^2)/(1-r1^2),
           -- a21 = r1(1-r2)/(1-r1^2):
           ROUND((r3 - (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * r2
                      - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r1)
                 / (1.0 - (r1 * (1.0 - r2) / (1.0 - r1 * r1)) * r1
                        - ((r2 - r1 * r1) / (1.0 - r1 * r1)) * r2), 6)
             AS pacf3
    FROM r
    """


@query("q609_pacf", oracle=_pacf_sql("duck"))
def q609_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelations at lags 1..3 by the Durbin-Levinson
    recursion unrolled to closed forms in r1..r3 — the AR-order
    selection diagnostic. Every input correlation is an exact-integer
    ratio, so the nested algebra is IEEE-identical on both engines."""
    _views(spark, sf_dir)
    return spark.sql(_pacf_sql("spark"))


# ---------------------------------------------------------------------------
# q610 — one-step backtest


def _backtest_sql(dialect: str) -> str:
    return f"""
    WITH {_cov_cte(dialect)},
    lagged AS (
      SELECT x.i, x.dv AS d_now, y.dv AS d_prev
      FROM dev x JOIN dev y ON y.i = x.i - 1
    ),
    sse AS (
      -- BROADCAST hint reaches Spark only (a comment to DuckDB): the
      -- 1-row r side must not plan as CartesianProduct
      SELECT /*+ BROADCAST(r) */
        SUM(CAST(l.d_now AS DECIMAL(19,0)) * CAST(l.d_now AS DECIMAL(19,0)))
          AS sse_mean,
        SUM(CAST(l.d_now - l.d_prev AS DECIMAL(19,0))
            * CAST(l.d_now - l.d_prev AS DECIMAL(19,0))) AS sse_naive,
        -- AR(1) residual d_now - phi*d_prev, phi = r1 (double): exact
        -- algebra via doubles on identical inputs
        SUM(CAST(ROUND((CAST(l.d_now AS DOUBLE) - r.r1 * l.d_prev)
                       * (CAST(l.d_now AS DOUBLE) - r.r1 * l.d_prev), 4)
                 AS DECIMAL(38,4))) AS sse_ar1,
        CAST(COUNT(*) AS BIGINT) AS n_steps
      FROM lagged l CROSS JOIN r
      GROUP BY r.r1
    )
    SELECT n_steps,
           ROUND(CAST(sse_ar1 AS DOUBLE) / CAST(sse_mean AS DOUBLE), 6)
             AS ar1_vs_mean,
           ROUND(CAST(sse_ar1 AS DOUBLE) / CAST(sse_naive AS DOUBLE), 6)
             AS ar1_vs_naive,
           ROUND(CAST(sse_naive AS DOUBLE) / CAST(sse_mean AS DOUBLE), 6)
             AS naive_vs_mean
    FROM sse
    """


@query("q610_ar1_backtest", oracle=_backtest_sql("duck"))
def q610_ar1_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-sample one-step AR(1) backtest: SSE of phi*prev predictions
    vs the mean-only and random-walk baselines, as three ratios.
    Baseline SSEs are exact DECIMAL sums of integer squares; the
    AR(1) residual squares are rounded at 4 dp then DECIMAL-
    accumulated (the ln-contract treatment applied to products).
    Lag features come from an i-1 equi-join on the bounded day
    table — no window."""
    _views(spark, sf_dir)
    return spark.sql(_backtest_sql("spark"))
