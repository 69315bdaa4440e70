"""Empirical-copula batch 140 (q766-q770) — the dependence-structure
toolkit over the (quantity, discount) pair of the lineitem fact,
computed entirely on the DISCRETE SUPPORT (50 x 11 distinct values)
so every margin, joint CDF, and dependence measure is an exact
integer ratio — no corpus sort, no n^2, no float accumulation:

- q766 margin tables: distinct values with counts and empirical CDF
  for both variables (bounded inequality joins over <= 50 rows);
- q767 the empirical copula lattice: C(u, v) at every joint support
  cell beside the independence surface u*v, with the exact
  integer-numerator deviation;
- q768 Blomqvist beta: quadrant concordance around the exact
  empirical medians, tie mass reported separately;
- q769 a lattice Schweizer-Wolff sigma: cell-probability-weighted
  sum of |C - uv| with EXACT integer numerators (|n*c - fx*fy| over
  n^3), so the dependence index is a terminal double of one integer
  ratio;
- q770 tail-concentration functions L(q) = C(q,q)/q and
  R(q) = (1 - 2q + C(q,q))/(1 - q) on a 9-point q grid via exact
  support quantiles.

100 TB shape: ONE fact pass aggregates to the 550-cell joint support
(map-side combine absorbs everything); margins, lattice CDFs, and
quadrants are inequality joins among <= 550-row tables with
BROADCAST hints (BNLJ over bounded operands, the q607 idiom). The
support is the value DOMAIN, so nothing here grows with the fact
table.

Determinism: quantity and discount-percent are exact integers
(FLOOR(d*100 + 0.5)); every count is BIGINT; every CDF and measure
is a terminal integer ratio; the only sums are integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )


def _cells_cte() -> str:
    """Joint support cells + margins + total, all exact integers."""
    return """pts AS (
      SELECT CAST(l_quantity AS BIGINT) AS x,
             CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS y
      FROM lineitem
    ),
    cells AS (
      SELECT x, y, CAST(COUNT(*) AS BIGINT) AS c
      FROM pts GROUP BY x, y
    ),
    mx AS (
      SELECT x, CAST(SUM(c) AS BIGINT) AS cx FROM cells GROUP BY x
    ),
    my AS (
      SELECT y, CAST(SUM(c) AS BIGINT) AS cy FROM cells GROUP BY y
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)"""


def _cdf_cte() -> str:
    """Cumulative margins via bounded inequality joins (no windows)."""
    return f"""{_cells_cte()},
    fx AS (
      SELECT /*+ BROADCAST(b) */ a.x, CAST(SUM(b.cx) AS BIGINT) AS fx
      FROM mx a JOIN mx b ON b.x <= a.x
      GROUP BY a.x
    ),
    fy AS (
      SELECT /*+ BROADCAST(b) */ a.y, CAST(SUM(b.cy) AS BIGINT) AS fy
      FROM my a JOIN my b ON b.y <= a.y
      GROUP BY a.y
    )"""


def _lattice_cte() -> str:
    """Joint CDF counts at every support cell (bounded cell x cell join)."""
    return f"""{_cdf_cte()},
    jc AS (
      SELECT /*+ BROADCAST(b) */ a.x, a.y,
             CAST(SUM(b.c) AS BIGINT) AS cc
      FROM cells a JOIN cells b ON b.x <= a.x AND b.y <= a.y
      GROUP BY a.x, a.y
    )"""


# ---------------------------------------------------------------------------
# q766 — margin tables

_Q766_SQL = f"""
    WITH {_cdf_cte()}
    SELECT 'quantity' AS variable, f.x AS value,
           m.cx AS freq,
           CAST(f.fx AS DOUBLE) / t.n AS ecdf
    FROM fx f JOIN mx m ON m.x = f.x CROSS JOIN tot t
    UNION ALL
    SELECT 'discount_pct' AS variable, f.y AS value,
           m.cy AS freq,
           CAST(f.fy AS DOUBLE) / t.n AS ecdf
    FROM fy f JOIN my m ON m.y = f.y CROSS JOIN tot t
    ORDER BY variable, value
    """


@query("q766_copula_margins", oracle=_Q766_SQL)
def q766_copula_margins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both margins on their discrete support: value, frequency, and
    exact empirical CDF. Cumulatives come from bounded inequality
    joins over the <= 50-row distinct-value tables — no global
    window, no corpus sort."""
    _views(spark, sf_dir)
    return spark.sql(_Q766_SQL)


# ---------------------------------------------------------------------------
# q767 — the empirical copula lattice

_Q767_SQL = f"""
    WITH {_lattice_cte()}
    SELECT j.x AS qty, j.y AS disc_pct,
           CAST(f1.fx AS DOUBLE) / t.n AS u,
           CAST(f2.fy AS DOUBLE) / t.n AS v,
           CAST(j.cc AS DOUBLE) / t.n AS copula_c,
           CAST(j.cc * t.n - f1.fx * f2.fy AS BIGINT) AS dev_num,
           CAST(j.cc * t.n - f1.fx * f2.fy AS DOUBLE) / (CAST(t.n AS DOUBLE)
             * t.n) AS c_minus_uv
    FROM jc j
    JOIN fx f1 ON f1.x = j.x
    JOIN fy f2 ON f2.y = j.y
    CROSS JOIN tot t
    ORDER BY j.x, j.y
    """


@query("q767_copula_lattice", oracle=_Q767_SQL)
def q767_copula_lattice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The empirical copula at every joint support cell: C(u,v), the
    independence surface u*v, and the deviation with its EXACT integer
    numerator n*count - fx*fy (positive = positive quadrant
    dependence at that corner)."""
    _views(spark, sf_dir)
    return spark.sql(_Q767_SQL)


# ---------------------------------------------------------------------------
# q768 — Blomqvist beta

_Q768_SQL = f"""
    WITH {_cdf_cte()},
    medx AS (
      SELECT MIN(f.x) AS xm FROM fx f CROSS JOIN tot t
      WHERE 2 * f.fx >= t.n
    ),
    medy AS (
      SELECT MIN(f.y) AS ym FROM fy f CROSS JOIN tot t
      WHERE 2 * f.fy >= t.n
    ),
    quad AS (
      SELECT
        CAST(SUM(CASE WHEN p.x > mx2.xm AND p.y > my2.ym THEN 1 ELSE 0 END)
             AS BIGINT) AS n_pp,
        CAST(SUM(CASE WHEN p.x < mx2.xm AND p.y < my2.ym THEN 1 ELSE 0 END)
             AS BIGINT) AS n_mm,
        CAST(SUM(CASE WHEN p.x > mx2.xm AND p.y < my2.ym THEN 1 ELSE 0 END)
             AS BIGINT) AS n_pm,
        CAST(SUM(CASE WHEN p.x < mx2.xm AND p.y > my2.ym THEN 1 ELSE 0 END)
             AS BIGINT) AS n_mp,
        CAST(SUM(CASE WHEN p.x = mx2.xm OR p.y = my2.ym THEN 1 ELSE 0 END)
             AS BIGINT) AS n_tie
      FROM pts p CROSS JOIN medx mx2 CROSS JOIN medy my2
    )
    SELECT n_pp AS concordant_hi, n_mm AS concordant_lo,
           n_pm + n_mp AS discordant, n_tie AS on_median_lines,
           CAST(n_pp + n_mm - n_pm - n_mp AS DOUBLE)
             / (n_pp + n_mm + n_pm + n_mp) AS blomqvist_beta
    FROM quad
    """


@query("q768_blomqvist_beta", oracle=_Q768_SQL)
def q768_blomqvist_beta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrant dependence around the exact empirical medians
    (smallest support value with 2F >= n): concordant/discordant
    quadrant counts, the tie mass on the median lines reported (not
    silently split), and beta over the off-median mass."""
    _views(spark, sf_dir)
    return spark.sql(_Q768_SQL)


# ---------------------------------------------------------------------------
# q769 — lattice Schweizer-Wolff sigma

_Q769_SQL = f"""
    WITH {_lattice_cte()},
    dev AS (
      SELECT /*+ BROADCAST(t) */
             c.c,
             ABS(CAST(j.cc * t.n - f1.fx * f2.fy AS BIGINT)) AS adev,
             t.n AS n
      FROM jc j
      JOIN cells c ON c.x = j.x AND c.y = j.y
      JOIN fx f1 ON f1.x = j.x
      JOIN fy f2 ON f2.y = j.y
      CROSS JOIN tot t
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(SUM(c * adev) AS BIGINT) AS weighted_dev_num,
           12 * CAST(SUM(c * adev) AS DOUBLE)
             / (CAST(MAX(n) AS DOUBLE) * MAX(n) * MAX(n)) AS sw_sigma_lattice,
           CAST(MAX(adev) AS DOUBLE) / (CAST(MAX(n) AS DOUBLE) * MAX(n))
             AS sup_dev
    FROM dev
    """


@query("q769_schweizer_wolff", oracle=_Q769_SQL)
def q769_schweizer_wolff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A lattice Schweizer-Wolff dependence index: 12 x the
    cell-probability-weighted mean of |C - uv| over the joint support,
    every term an exact integer (|n*cc - fx*fy|, weight c), one
    terminal division by n^3 — plus the sup-norm deviation
    (Kolmogorov-style dependence). Zero only under independence."""
    _views(spark, sf_dir)
    return spark.sql(_Q769_SQL)


# ---------------------------------------------------------------------------
# q770 — tail concentration

_QS = [5, 10, 15, 20, 25, 30, 35, 40, 45]  # q in percent


_Q770_SQL = f"""
    WITH {_cdf_cte()},
    qs(qpct) AS (VALUES {', '.join(f'({q})' for q in _QS)}),
    xq AS (
      SELECT q.qpct, MIN(f.x) AS xv
      FROM qs q CROSS JOIN tot t JOIN fx f ON 100 * f.fx >= q.qpct * t.n
      GROUP BY q.qpct
    ),
    yq AS (
      SELECT q.qpct, MIN(f.y) AS yv
      FROM qs q CROSS JOIN tot t JOIN fy f ON 100 * f.fy >= q.qpct * t.n
      GROUP BY q.qpct
    ),
    cq AS (
      SELECT x.qpct,
             CAST(SUM(CASE WHEN p.x <= x.xv AND p.y <= y.yv
                           THEN 1 ELSE 0 END) AS BIGINT) AS cboth,
             CAST(SUM(CASE WHEN p.x <= x.xv THEN 1 ELSE 0 END) AS BIGINT)
               AS cx_at_q,
             CAST(SUM(CASE WHEN p.y <= y.yv THEN 1 ELSE 0 END) AS BIGINT)
               AS cy_at_q
      FROM pts p CROSS JOIN xq x JOIN yq y ON y.qpct = x.qpct
      GROUP BY x.qpct
    )
    SELECT c.qpct,
           CAST(c.cboth AS DOUBLE) / t.n AS c_qq,
           (CAST(c.cboth AS DOUBLE) / t.n)
             / (CAST(c.qpct AS DOUBLE) / 100) AS lower_tail_l,
           (1 - CAST(c.cx_at_q AS DOUBLE) / t.n
              - CAST(c.cy_at_q AS DOUBLE) / t.n
              + CAST(c.cboth AS DOUBLE) / t.n)
             / (1 - CAST(c.qpct AS DOUBLE) / 100) AS upper_tail_r
    FROM cq c CROSS JOIN tot t
    ORDER BY c.qpct
    """


@query("q770_tail_concentration", oracle=_Q770_SQL)
def q770_tail_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-concentration profile: L(q) = C(q,q)/q and the survival-
    copula R(q) = (1 - Fx(q) - Fy(q) + C)/(1-q) on a 9-point grid,
    with quantiles taken exactly on the discrete support (smallest
    value with 100F >= q*n — integer comparisons). Both tend to q
    under independence and to 1 under comonotonicity."""
    _views(spark, sf_dir)
    return spark.sql(_Q770_SQL)
