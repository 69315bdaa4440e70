"""Portfolio-theory batch 133 (q731-q735) — mean-variance analytics
over brand revenue series, the Markowitz toolkit a revenue-planning
desk runs when it treats brands as assets:

- q731 per-brand monthly return moments: mean, variance, volatility
  over month-over-month revenue returns;
- q732 pairwise covariance/correlation for the top-5 revenue brands
  (the upper triangle of the covariance matrix);
- q733 minimum-variance two-asset weights per top-5 pair (closed
  form w* = (s_b^2 - s_ab) / (s_a^2 + s_b^2 - 2 s_ab)) with the
  achieved portfolio variance and the diversification benefit;
- q734 Sharpe-style ranking: mean / volatility per brand (zero risk
  free rate), the table a planner reads top-down;
- q735 max drawdown per brand on the cumulative revenue index:
  running peak, deepest trough, and when it happened.

100 TB shape: everything derives from ONE fact pass to a
(brand, month) cents table (25 brands x ~80 months, one shuffle with
map-side combine); returns are a brand-partitioned LAG over that
bounded spine; pair queries join the 25x80 spine to itself on month
gated by brand rank (<= 10 pairs x 80 months). No window ever sees
fact rows, and no pair join is unbounded.

Determinism (DETERMINISM.md contract): revenue quantized to BIGINT
cents at the source; returns quantized at 9 dp (`0.0 + ROUND(x, 9)`
for the -0.0 rule) BEFORE accumulation; all sums are exact
DECIMAL(38,9) over the quantized terms; means/variances/weights are
terminal straight-line double expressions emitted UNROUNDED (q666
lesson); drawdowns compare integers and break argmax ties by MIN
month. Returns are defined over CONSECUTIVE month indices only
(m = prev_m + 1) so sparse low-SF months never create phantom
long-gap returns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BASE_MONTH = 1995 * 12  # orders/lineitem span 1995-01..2001-08
TOP_N = 5


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _rev_cte() -> str:
    """(brand, month-index, cents) + 9dp-quantized consecutive-month returns."""
    return f"""rev AS (
      SELECT p.p_brand AS brand,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 - {BASE_MONTH})
               AS m,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand,
               (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1 - {BASE_MONTH})
    ),
    lagged AS (
      SELECT brand, m, cents,
             LAG(cents) OVER (PARTITION BY brand ORDER BY m) AS prev,
             LAG(m) OVER (PARTITION BY brand ORDER BY m) AS prev_m
      FROM rev
    ),
    ret AS (
      SELECT brand, m,
             0.0 + ROUND(CAST(cents AS DOUBLE) / prev - 1, 9) AS r
      FROM lagged
      WHERE prev IS NOT NULL AND prev > 0 AND m = prev_m + 1
    )"""


def _moments_cte() -> str:
    """Per-brand exact moment sums over the quantized returns."""
    return f"""{_rev_cte()},
    mom AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(r AS DECIMAL(38,9))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(0.0 + ROUND(r * r, 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS s2
      FROM ret GROUP BY brand
    )"""


# ---------------------------------------------------------------------------
# q731 — per-brand return moments

_Q731_SQL = f"""
    WITH {_moments_cte()}
    SELECT brand,
           n AS n_returns,
           s1 / n AS mean_return,
           (s2 - s1 * s1 / n) / (n - 1) AS var_return,
           SQRT((s2 - s1 * s1 / n) / (n - 1)) AS volatility
    FROM mom
    WHERE n >= 2
    ORDER BY brand
    """


@query("q731_brand_return_moments", oracle=_Q731_SQL)
def q731_brand_return_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue return mean/variance/volatility per
    brand. One fact pass to the (brand, month) spine, one
    brand-partitioned LAG, exact DECIMAL moment sums over 9dp-quantized
    returns, terminal unrounded doubles."""
    _views(spark, sf_dir)
    return spark.sql(_Q731_SQL)


# ---------------------------------------------------------------------------
# q732 — top-5 pairwise covariance / correlation

_REV_VIEW = "portfolio_rev_mv"

# Spark-side replacement for _rev_cte(): the same three CTE names over
# the materialized (brand, month, cents) spine. The pair queries
# reference `rev` via top5 AND twice via the tret self-join, so Catalyst
# inlining re-ran the lineitem x part corpus aggregate ~3x per query
# (P3 pattern, guide §2.4); the oracle keeps the single-statement text.
_REV_MV_CTE = f"""rev AS (
      SELECT brand, m, cents FROM {_REV_VIEW}
    ),
    lagged AS (
      SELECT brand, m, cents,
             LAG(cents) OVER (PARTITION BY brand ORDER BY m) AS prev,
             LAG(m) OVER (PARTITION BY brand ORDER BY m) AS prev_m
      FROM rev
    ),
    ret AS (
      SELECT brand, m,
             0.0 + ROUND(CAST(cents AS DOUBLE) / prev - 1, 9) AS r
      FROM lagged
      WHERE prev IS NOT NULL AND prev > 0 AND m = prev_m + 1
    )"""


def _rev_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE fact pass -> checkpointed (brand, month, cents) spine
    (<= 25 brands x ~80 months)."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_rev_cte()} SELECT brand, m, cents FROM rev")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_REV_VIEW)


def _pair_cte(series: str | None = None) -> str:
    """Joint moments for top-5 brand pairs over common months."""
    return f"""{series or _rev_cte()},
    top5 AS (
      SELECT brand FROM (
        SELECT brand, CAST(SUM(cents) AS BIGINT) AS tot
        FROM rev GROUP BY brand
      ) g ORDER BY tot DESC, brand ASC LIMIT {TOP_N}
    ),
    tret AS (
      SELECT /*+ BROADCAST(t) */ r.brand, r.m, r.r
      FROM ret r JOIN top5 t ON t.brand = r.brand
    ),
    pair AS (
      SELECT a.brand AS brand_a, b.brand AS brand_b,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(a.r AS DECIMAL(38,9))) AS DOUBLE) AS sa,
             CAST(SUM(CAST(b.r AS DECIMAL(38,9))) AS DOUBLE) AS sb,
             CAST(SUM(CAST(0.0 + ROUND(a.r * a.r, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS saa,
             CAST(SUM(CAST(0.0 + ROUND(b.r * b.r, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS sbb,
             CAST(SUM(CAST(0.0 + ROUND(a.r * b.r, 9) AS DECIMAL(38,9)))
                  AS DOUBLE) AS sab
      FROM tret a JOIN tret b ON b.m = a.m AND a.brand < b.brand
      GROUP BY a.brand, b.brand
    )"""


def _q732_sql(series: str | None = None) -> str:
    return f"""
    WITH {_pair_cte(series)}
    SELECT brand_a, brand_b, n AS n_common_months,
           (sab - sa * sb / n) / (n - 1) AS covariance,
           (sab - sa * sb / n)
             / SQRT((saa - sa * sa / n) * (sbb - sb * sb / n))
             AS correlation
    FROM pair
    WHERE n >= 2
    ORDER BY brand_a, brand_b
    """


_Q732_SQL = _q732_sql()


@query("q732_return_covariance", oracle=_Q732_SQL)
def q732_return_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance/correlation matrix for the top-5
    revenue brands' return series, joined on common months. The pair
    join runs on the bounded (5 brands x months) spine, never facts."""
    _rev_view(spark, sf_dir)
    return spark.sql(_q732_sql(_REV_MV_CTE))


# ---------------------------------------------------------------------------
# q733 — minimum-variance two-asset weights

def _q733_sql(series: str | None = None) -> str:
    return f"""
    WITH {_pair_cte(series)},
    stats AS (
      SELECT brand_a, brand_b, n,
             (saa - sa * sa / n) / (n - 1) AS va,
             (sbb - sb * sb / n) / (n - 1) AS vb,
             (sab - sa * sb / n) / (n - 1) AS cab
      FROM pair WHERE n >= 2
    )
    SELECT brand_a, brand_b,
           (vb - cab) / (va + vb - 2 * cab) AS w_a,
           1 - (vb - cab) / (va + vb - 2 * cab) AS w_b,
           (va * vb - cab * cab) / (va + vb - 2 * cab) AS min_portfolio_var,
           CASE WHEN va < vb THEN va ELSE vb END
             - (va * vb - cab * cab) / (va + vb - 2 * cab)
             AS variance_reduction
    FROM stats
    ORDER BY brand_a, brand_b
    """


_Q733_SQL = _q733_sql()


@query("q733_min_variance_weights", oracle=_Q733_SQL)
def q733_min_variance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form minimum-variance weights for each top-5 brand pair
    (w_a = (vb - cov)/(va + vb - 2 cov), shorting allowed), the achieved
    portfolio variance (va*vb - cov^2)/(va + vb - 2 cov), and the
    reduction vs holding the less-volatile brand alone. Pure terminal
    arithmetic on q732's exact moment sums."""
    _rev_view(spark, sf_dir)
    return spark.sql(_q733_sql(_REV_MV_CTE))


# ---------------------------------------------------------------------------
# q734 — Sharpe-style ranking

_Q734_SQL = f"""
    WITH {_moments_cte()}
    SELECT brand,
           s1 / n AS mean_return,
           SQRT((s2 - s1 * s1 / n) / (n - 1)) AS volatility,
           (s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1)) AS sharpe
    FROM mom
    WHERE n >= 2 AND s2 - s1 * s1 / n > 0
    ORDER BY (s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1)) DESC, brand
    """


@query("q734_sharpe_ranking", oracle=_Q734_SQL)
def q734_sharpe_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean/volatility (Sharpe at zero risk-free) per brand, ranked.
    No rank column — the ordering is presentation; the hash gate is
    order-insensitive and every value is a terminal double from exact
    sums."""
    _views(spark, sf_dir)
    return spark.sql(_Q734_SQL)


# ---------------------------------------------------------------------------
# q735 — max drawdown on the cumulative revenue index

def _q735_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _rev_cte()},
    peaked AS (
      SELECT brand, m, cents,
             MAX(cents) OVER (PARTITION BY brand ORDER BY m
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS peak
      FROM rev
    ),
    dd AS (
      SELECT brand, m,
             CAST(peak - cents AS BIGINT) AS gap_cents,
             peak,
             0.0 + (CAST(peak - cents AS DOUBLE) / peak) AS ddown
      FROM peaked
    ),
    mx AS (
      SELECT brand, MAX(ddown) AS max_dd FROM dd GROUP BY brand
    )
    SELECT x.brand,
           x.max_dd AS max_drawdown,
           CAST(MIN(d.m) AS BIGINT) AS trough_month_idx,
           -- gap from the SAME row as the reported month (earliest
           -- tied month), not an independent MIN over tied rows —
           -- keeps the two columns mutually consistent when the max
           -- ratio recurs under different peaks
           CAST(MIN_BY(d.gap_cents, d.m) AS BIGINT) AS trough_gap_cents
    FROM mx x JOIN dd d ON d.brand = x.brand AND d.ddown = x.max_dd
    GROUP BY x.brand, x.max_dd
    ORDER BY x.brand
    """


_Q735_SQL = _q735_sql()


@query("q735_max_drawdown", oracle=_Q735_SQL)
def q735_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deepest peak-to-trough drawdown of each brand's monthly revenue
    index: brand-partitioned running peak (bounded spine), drawdown as
    an exact integer gap over the integer peak, argmax tie broken by
    the EARLIEST month; both reported columns come from that ONE
    tie-broken row (MIN month + MIN_BY gap on month — double equality
    of identically-computed values is engine-stable)."""
    _rev_view(spark, sf_dir)
    return spark.sql(_q735_sql(_REV_MV_CTE))
