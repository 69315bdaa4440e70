"""Panel-econometrics batch 128 (q706-q710) — the fixed-effects
toolkit a causal-inference pipeline runs on repeated observations:
the customer x year panel (1995-2000, zeros filled) with x = yearly
order count and y = yearly revenue (exact cents). "Does more orders
mean more revenue?" answers differently within a customer than
across customers — that split is the whole point of panel methods:

- q706 pooled vs within (FE) vs between estimators: the three
  textbook slopes from exact moment sums;
- q707 first-difference estimator: the FD slope over adjacent-year
  deltas — FE's robustness twin (they diverge under serial
  correlation in the errors);
- q708 Hausman-style contrast + the exact pooled decomposition
  identity: pooled_num = nc * within_num + between_num, emitted with
  its (zero) residual;
- q709 variance decomposition: within vs between share of x and y
  variation — how much identification each estimator actually has;
- q710 customer fixed effects top-10: alpha_i = ybar_i - b_w xbar_i,
  the per-customer intercepts FE absorbs.

100 TB shape: one aggregate to (customer, year) cells; per-customer
moment reduction; every estimator is a ratio of two scalar DECIMAL
sums. The FD lag window partitions by customer. No global windows.

Determinism: the scaled-integer identities 6W_xy = 6*SXY - sum(Sx_i
Sy_i) etc. keep every numerator/denominator an EXACT integer
(DECIMAL(19)x DECIMAL(19) products, q245 pattern); slopes are single
divisions of decimal-cast sums, display-rounded at 4-6 dp because
those sums exceed 2^53 (the q679 one-ulp cast lesson); the q708
identity residual is computed IN DECIMAL and is exactly zero.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

YEARS = (1995, 1996, 1997, 1998, 1999, 2000)
T = len(YEARS)


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("orders", "customer"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _cells_cte() -> str:
    years_union = " UNION ALL ".join(
        f"SELECT {y} AS yr" if i == 0 else f"SELECT {y}"
        for i, y in enumerate(YEARS)
    )
    return f"""yearly AS (
      SELECT o_custkey AS ck,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(COUNT(*) AS BIGINT) AS x,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS y
      FROM orders
      WHERE o_orderdate >= DATE '{YEARS[0]}-01-01'
        AND o_orderdate < DATE '{YEARS[-1] + 1}-01-01'
      GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
    ),
    grid AS (
      SELECT /*+ BROADCAST(y) */ c.c_custkey AS ck, y.yr
      FROM customer c CROSS JOIN ({years_union}) y
    ),
    cells AS (
      SELECT g.ck, g.yr,
             COALESCE(t.x, CAST(0 AS BIGINT)) AS x,
             COALESCE(t.y, CAST(0 AS BIGINT)) AS y
      FROM grid g LEFT JOIN yearly t ON t.ck = g.ck AND t.yr = g.yr
    )"""


def _moments_cte() -> str:
    """Per-customer and grand exact moment sums; every cross product
    widens through DECIMAL(19,0) so nothing overflows int64/int128."""
    return f"""{_cells_cte()},
    peri AS (
      SELECT ck,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
               AS sxy
      FROM cells GROUP BY ck
    ),
    tots AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nc,
             CAST(SUM(sx) AS BIGINT) AS tsx,
             CAST(SUM(sy) AS BIGINT) AS tsy,
             CAST(SUM(sxx) AS BIGINT) AS tsxx,
             SUM(sxy) AS tsxy,
             SUM(CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)))
               AS s_sxsy,
             SUM(CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)))
               AS s_sxsx
      FROM peri
    ),
    est AS (
      SELECT nc, tsx, tsy, tsxx, tsxy, s_sxsy, s_sxsx,
             -- 6*W_xy and 6*W_xx (within, x-demeaned per customer)
             CAST({T} AS DECIMAL(38,0)) * tsxy - s_sxsy AS wnum,
             CAST({T} AS DECIMAL(38,0)) * CAST(tsxx AS DECIMAL(19,0))
               - s_sxsx AS wden,
             -- 6*nc*B_xy and 6*nc*B_xx (between customer means)
             CAST(nc AS DECIMAL(19,0)) * s_sxsy
               - CAST(tsx AS DECIMAL(19,0)) * CAST(tsy AS DECIMAL(19,0))
               AS bnum,
             CAST(nc AS DECIMAL(19,0)) * s_sxsx
               - CAST(tsx AS DECIMAL(19,0)) * CAST(tsx AS DECIMAL(19,0))
               AS bden,
             -- N*T_xy and N*T_xx (pooled, grand-demeaned), N = 6*nc
             CAST({T} AS DECIMAL(38,0)) * CAST(nc AS DECIMAL(19,0)) * tsxy
               - CAST(tsx AS DECIMAL(19,0)) * CAST(tsy AS DECIMAL(19,0))
               AS pnum,
             CAST({T} AS DECIMAL(38,0)) * CAST(nc AS DECIMAL(19,0))
               * CAST(tsxx AS DECIMAL(19,0))
               - CAST(tsx AS DECIMAL(19,0)) * CAST(tsx AS DECIMAL(19,0))
               AS pden
      FROM tots
    )"""


# ---------------------------------------------------------------------------
# q706 — pooled vs within vs between

_SLOPES_SQL = f"""
    WITH {_moments_cte()}
    SELECT nc AS n_customers,
           ROUND(CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE)
                 / CAST(100 AS DOUBLE), 4) AS pooled_dollars_per_order,
           ROUND(CAST(wnum AS DOUBLE) / CAST(wden AS DOUBLE)
                 / CAST(100 AS DOUBLE), 4) AS within_dollars_per_order,
           ROUND(CAST(bnum AS DOUBLE) / CAST(bden AS DOUBLE)
                 / CAST(100 AS DOUBLE), 4) AS between_dollars_per_order
    FROM est
    """


@query("q706_panel_estimators", oracle=_SLOPES_SQL)
def q706_panel_estimators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled OLS, within (fixed-effects), and between estimators of
    dollars-per-order on the customer x year panel. Every numerator
    and denominator is an exact scaled-integer DECIMAL sum; each
    slope is one division, display-rounded because the sums exceed
    2^53 (q679 cast lesson)."""
    _views(spark, sf_dir)
    return spark.sql(_SLOPES_SQL)


# ---------------------------------------------------------------------------
# q707 — first-difference estimator

_FD_SQL = f"""
    WITH {_cells_cte()},
    diffs AS (
      SELECT ck,
             x - LAG(x) OVER (PARTITION BY ck ORDER BY yr) AS dx,
             y - LAG(y) OVER (PARTITION BY ck ORDER BY yr) AS dy
      FROM cells
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_diffs,
             SUM(CAST(dx AS DECIMAL(19,0)) * CAST(dy AS DECIMAL(19,0)))
               AS sdxdy,
             CAST(SUM(dx * dx) AS BIGINT) AS sdxdx
      FROM diffs WHERE dx IS NOT NULL
    )
    SELECT n_diffs,
           ROUND(CAST(sdxdy AS DOUBLE) / CAST(sdxdx AS DOUBLE)
                 / CAST(100 AS DOUBLE), 4) AS fd_dollars_per_order
    FROM mom
    """


@query("q707_first_difference", oracle=_FD_SQL)
def q707_first_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first-difference estimator: regress adjacent-year revenue
    deltas on order-count deltas (lag window per customer, §8-safe:
    yr is unique per customer). FE and FD coincide under exogeneity
    with T=2 and diverge under serially correlated errors — the
    standard robustness pairing to q706's within slope."""
    _views(spark, sf_dir)
    return spark.sql(_FD_SQL)


# ---------------------------------------------------------------------------
# q708 — Hausman-style contrast + exact decomposition identity

_HAUSMAN_SQL = f"""
    WITH {_moments_cte()}
    SELECT ROUND(CAST(wnum AS DOUBLE) / CAST(wden AS DOUBLE)
                 / CAST(100 AS DOUBLE)
                 - CAST(bnum AS DOUBLE) / CAST(bden AS DOUBLE)
                   / CAST(100 AS DOUBLE), 4) AS within_minus_between,
           -- pooled_num == nc * within_num + between_num, EXACTLY, in
           -- DECIMAL arithmetic — the within/between decomposition
           CAST(pnum - (CAST(nc AS DECIMAL(19,0)) * wnum + bnum)
                AS DOUBLE) AS identity_residual,
           CAST(nc AS DECIMAL(19,0)) * wnum + bnum = pnum
             AS identity_holds
    FROM est
    """


@query("q708_hausman_contrast", oracle=_HAUSMAN_SQL)
def q708_hausman_contrast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hausman direction: within minus between slope (a large gap
    means customer effects correlate with order volume, so random-
    effects pooling would be biased), plus the EXACT decomposition
    identity pooled_num = nc * within_num + between_num verified in
    DECIMAL arithmetic — the residual column is identically zero."""
    _views(spark, sf_dir)
    return spark.sql(_HAUSMAN_SQL)


# ---------------------------------------------------------------------------
# q709 — variance decomposition

_VARDECOMP_SQL = f"""
    WITH {_moments_cte()},
    ydecomp AS (
      SELECT est.nc,
             -- reuse the x machinery for y via the same identities
             CAST({T} AS DECIMAL(38,0))
               * (SELECT SUM(CAST(y AS DECIMAL(19,0))
                             * CAST(y AS DECIMAL(19,0))) FROM cells)
               - (SELECT SUM(CAST(sy AS DECIMAL(19,0))
                             * CAST(sy AS DECIMAL(19,0))) FROM peri)
               AS wyy,
             CAST(est.nc AS DECIMAL(19,0))
               * (SELECT SUM(CAST(sy AS DECIMAL(19,0))
                             * CAST(sy AS DECIMAL(19,0))) FROM peri)
               - CAST(est.tsy AS DECIMAL(19,0))
                 * CAST(est.tsy AS DECIMAL(19,0)) AS byy,
             est.wden AS wxx, est.bden AS bxx
      FROM est
    )
    SELECT ROUND(CAST(wxx AS DOUBLE)
                 / (CAST(wxx AS DOUBLE)
                    + CAST(bxx AS DOUBLE) / CAST(nc AS DOUBLE)), 9)
             AS x_within_share,
           ROUND(CAST(wyy AS DOUBLE)
                 / (CAST(wyy AS DOUBLE)
                    + CAST(byy AS DOUBLE) / CAST(nc AS DOUBLE)), 9)
             AS y_within_share
    FROM ydecomp
    """


@query("q709_variance_decomposition", oracle=_VARDECOMP_SQL)
def q709_variance_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within vs between variance shares of x (orders) and y
    (revenue): how much of the variation lives inside customer
    histories vs across customers — the identification budget of the
    FE and between estimators respectively. Scaled-integer sums, one
    terminal expression each, 9 dp display (the sums exceed 2^53)."""
    _views(spark, sf_dir)
    return spark.sql(_VARDECOMP_SQL)


# ---------------------------------------------------------------------------
# q710 — customer fixed effects top-10

_ALPHA_SQL = f"""
    WITH {_moments_cte()}
    SELECT /*+ BROADCAST(e) */ p.ck AS custkey,
           CAST(p.sx AS DOUBLE) / CAST({T} AS DOUBLE) AS mean_orders,
           ROUND((CAST(p.sy AS DOUBLE) / CAST({T} AS DOUBLE)
                  - (CAST(e.wnum AS DOUBLE) / CAST(e.wden AS DOUBLE))
                    * (CAST(p.sx AS DOUBLE) / CAST({T} AS DOUBLE)))
                 / CAST(100 AS DOUBLE), 4) AS fixed_effect_dollars
    FROM peri p CROSS JOIN est e
    ORDER BY ROUND((CAST(p.sy AS DOUBLE) / CAST({T} AS DOUBLE)
                    - (CAST(e.wnum AS DOUBLE) / CAST(e.wden AS DOUBLE))
                      * (CAST(p.sx AS DOUBLE) / CAST({T} AS DOUBLE)))
                   / CAST(100 AS DOUBLE), 4) DESC,
             p.ck ASC
    LIMIT 10
    """


@query("q710_fixed_effects_topk", oracle=_ALPHA_SQL)
def q710_fixed_effects_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten largest customer fixed effects alpha_i = ybar_i -
    b_within * xbar_i — the per-customer intercepts the FE estimator
    absorbs; large alphas are customers whose revenue level exceeds
    what their order volume explains. Ranked on the rounded effect
    with the key tie-break (§4), TakeOrdered."""
    _views(spark, sf_dir)
    return spark.sql(_ALPHA_SQL)
