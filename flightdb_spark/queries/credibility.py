"""Buhlmann-credibility batch 122 (q676-q680) — the experience-rating
machinery an insurance/forecasting pipeline runs: how much should a
unit's OWN history weigh against the book average? Risks = customers
(or market segments), exposure years 1995-2000, X_ij = customer i's
order total (exact cents) in year j, absent years counting as 0:

- q676 variance components: EPV (expected process variance, the
  within-customer noise), VHM (variance of hypothetical means, the
  real between-customer spread), the credibility constant k =
  EPV/VHM and Z = n/(n+k);
- q677 credibility premiums top-10: P_i = Z m_i + (1-Z) m — the
  shrinkage estimator, ranked by exact integer history;
- q678 shrinkage backtest: train on 1995-1997, score 1998-2000 —
  MSE of raw mean vs credibility premium vs grand mean (the premium
  should beat both ends, that is the Buhlmann theorem in the data);
- q679 segment-level credibility: the same machinery with market
  segments as risks (5 risks x 6 years), VHM<=0 pinned to Z=0;
- q680 balance audit: credibility premiums preserve the grand total
  (sum_i P_i = sum_i m_i algebraically) and compress the range —
  both emitted with exact accumulators.

100 TB shape: one aggregate reduces orders to (customer, year) cells
(bounded by customers x 6); the all-customer grid is a broadcast
BNLJ of the 6-row year table against the customer dim; every moment
is a single pass over the bounded cell table. Nothing iterates, no
window is corpus-wide.

Determinism: all money exact BIGINT cents; squared terms widen to
DECIMAL(19,0) x DECIMAL(19,0) -> DECIMAL(38,0) sums (q245/q673
pattern); the within-variance numerator is the INTEGER identity
30 s_i^2 = 6*sumsq - sum^2 (no per-row division); backtest squared
errors accumulate as BIGINT FLOOR(err^2 * 1e4 + 0.5) micro-units.
The DECIMAL(38,0) moment sums exceed 2^53, and the two engines'
decimal->double casts can differ by ONE ULP there (observed on q679:
z flipped in the 16th digit) — so every z-derived or moment-derived
output is display-rounded with a half-window far above the ulp
(dollars2 at 2 dp, premiums at 4 dp, z at 9 dp); only exact-integer
rationals (means of BIGINT sums) are emitted unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

YEARS = (1995, 1996, 1997, 1998, 1999, 2000)


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("orders", "customer"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _years_union(years) -> str:
    return " UNION ALL ".join(
        f"SELECT {y} AS yr" if i == 0 else f"SELECT {y}"
        for i, y in enumerate(years)
    )


def _cells_cte(years=YEARS) -> str:
    """Complete (customer, year) cell table with absent years as 0 —
    the exposure grid credibility needs (a customer with no orders IS
    information)."""
    lo, hi = years[0], years[-1] + 1
    return f"""yearly AS (
      SELECT o_custkey AS ck,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= DATE '{lo}-01-01'
        AND o_orderdate < DATE '{hi}-01-01'
      GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
    ),
    grid AS (
      SELECT /*+ BROADCAST(y) */ c.c_custkey AS ck, y.yr
      FROM customer c CROSS JOIN ({_years_union(years)}) y
    ),
    cells AS (
      SELECT g.ck, g.yr, COALESCE(t.cents, CAST(0 AS BIGINT)) AS x
      FROM grid g LEFT JOIN yearly t ON t.ck = g.ck AND t.yr = g.yr
    )"""


def _comp_cte(n_years: int) -> str:
    """Variance components over the cell table: per-customer exact
    (sum, sumsq), then EPV/VHM numerators as exact DECIMAL sums.
    With n years: n*(n-1)*s_i^2 = n*sumsq - sum^2 (integer identity)."""
    n = n_years
    return f"""peri AS (
      SELECT ck, CAST(SUM(x) AS BIGINT) AS sx,
             SUM(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
               AS sx2
      FROM cells GROUP BY ck
    ),
    tots AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nc,
             CAST(SUM(sx) AS BIGINT) AS tot,
             SUM(CAST({n} AS DECIMAL(38,0)) * sx2
                 - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)))
               AS wnum
      FROM peri
    ),
    vh AS (
      SELECT /*+ BROADCAST(c) */
             SUM(CAST(c.nc * p.sx - c.tot AS DECIMAL(19,0))
                 * CAST(c.nc * p.sx - c.tot AS DECIMAL(19,0))) AS vnum
      FROM peri p CROSS JOIN tots c
    ),
    comp AS (
      SELECT /*+ BROADCAST(v) */ t.nc, t.tot, t.wnum, v.vnum,
             -- EPV = mean of s_i^2 = wnum / (n(n-1) nc)
             CAST(t.wnum AS DOUBLE)
               / (CAST({n * (n - 1)} AS DOUBLE) * CAST(t.nc AS DOUBLE))
               AS epv,
             -- VHM = sum (m_i - mbar)^2/(nc-1) - EPV/n
             CAST(v.vnum AS DOUBLE)
               / (CAST({n * n} AS DOUBLE) * CAST(t.nc AS DOUBLE)
                  * CAST(t.nc AS DOUBLE) * CAST(t.nc - 1 AS DOUBLE))
               - CAST(t.wnum AS DOUBLE)
                 / (CAST({n * (n - 1)} AS DOUBLE) * CAST(t.nc AS DOUBLE))
                 / CAST({n} AS DOUBLE) AS vhm
      FROM tots t CROSS JOIN vh v
    ),
    cred AS (
      SELECT nc, tot, epv, vhm,
             CASE WHEN vhm <= CAST(0 AS DOUBLE) THEN CAST(0 AS DOUBLE)
                  ELSE CAST({n} AS DOUBLE)
                       / (CAST({n} AS DOUBLE) + epv / vhm)
             END AS z
      FROM comp
    )"""


# ---------------------------------------------------------------------------
# q676 — variance components

_COMP_SQL = f"""
    WITH {_cells_cte()},
    {_comp_cte(6)}
    SELECT nc AS n_customers,
           CAST(6 AS BIGINT) AS n_years,
           CAST(tot AS DOUBLE) / (CAST(6 AS DOUBLE) * CAST(nc AS DOUBLE))
             / CAST(100 AS DOUBLE) AS grand_mean_dollars,
           ROUND(epv / CAST(10000 AS DOUBLE), 2) AS epv_dollars2,
           ROUND(vhm / CAST(10000 AS DOUBLE), 2) AS vhm_dollars2,
           ROUND(epv / vhm, 6) AS k_constant,
           ROUND(z, 9) AS credibility_z
    FROM cred
    """


@query("q676_buhlmann_components", oracle=_COMP_SQL)
def q676_buhlmann_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric Buhlmann variance components over customer-year
    order totals: EPV (within-customer process noise), VHM (true
    between-customer spread), k = EPV/VHM, Z = n/(n+k). A tiny Z says
    individual history is mostly noise at this exposure — exactly the
    shrinkage a pricing pipeline must apply."""
    _views(spark, sf_dir)
    return spark.sql(_COMP_SQL)


# ---------------------------------------------------------------------------
# q677 — credibility premiums (top 10 by history)

_PREMIUM_SQL = f"""
    WITH {_cells_cte()},
    {_comp_cte(6)}
    SELECT /*+ BROADCAST(c) */ p.ck AS custkey,
           CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE) / CAST(100 AS DOUBLE)
             AS raw_mean_dollars,
           ROUND(c.z * (CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE))
                 / CAST(100 AS DOUBLE)
                 + (CAST(1 AS DOUBLE) - c.z)
                   * (CAST(c.tot AS DOUBLE)
                      / (CAST(6 AS DOUBLE) * CAST(c.nc AS DOUBLE)))
                   / CAST(100 AS DOUBLE), 4) AS credibility_premium_dollars
    FROM peri p CROSS JOIN cred c
    ORDER BY p.sx DESC, p.ck ASC
    LIMIT 10
    """


@query("q677_credibility_premiums", oracle=_PREMIUM_SQL)
def q677_credibility_premiums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer credibility premiums P_i = Z m_i + (1-Z) m for the
    ten heaviest histories. The top-k orders by the EXACT integer
    six-year total (premium is monotone in it since Z >= 0), with the
    customer key as tie-break — TakeOrderedAndProject, no global
    sort, no double-ordering hazard."""
    _views(spark, sf_dir)
    return spark.sql(_PREMIUM_SQL)


# ---------------------------------------------------------------------------
# q678 — shrinkage backtest

_BACKTEST_SQL = f"""
    WITH {_cells_cte((1995, 1996, 1997))},
    {_comp_cte(3)},
    test AS (
      SELECT o_custkey AS ck,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE o_orderdate >= DATE '1998-01-01'
        AND o_orderdate < DATE '2001-01-01'
      GROUP BY o_custkey
    ),
    scored AS (
      SELECT /*+ BROADCAST(c) */
             p.ck,
             CAST(p.sx AS DOUBLE) / CAST(3 AS DOUBLE) AS raw_pred,
             c.z * (CAST(p.sx AS DOUBLE) / CAST(3 AS DOUBLE))
               + (CAST(1 AS DOUBLE) - c.z)
                 * (CAST(c.tot AS DOUBLE)
                    / (CAST(3 AS DOUBLE) * CAST(c.nc AS DOUBLE)))
               AS cred_pred,
             CAST(c.tot AS DOUBLE)
               / (CAST(3 AS DOUBLE) * CAST(c.nc AS DOUBLE)) AS grand_pred,
             CAST(COALESCE(t.cents, CAST(0 AS BIGINT)) AS DOUBLE)
               / CAST(3 AS DOUBLE) AS target
      FROM peri p
      CROSS JOIN cred c
      LEFT JOIN test t ON t.ck = p.ck
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(FLOOR((raw_pred - target) * (raw_pred - target)
                               / CAST(1000000 AS DOUBLE)
                               + CAST(0.5 AS DOUBLE)) AS BIGINT))
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS mse_raw_dollars2,
           CAST(SUM(CAST(FLOOR((cred_pred - target) * (cred_pred - target)
                               / CAST(1000000 AS DOUBLE)
                               + CAST(0.5 AS DOUBLE)) AS BIGINT))
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS mse_credibility_dollars2,
           CAST(SUM(CAST(FLOOR((grand_pred - target) * (grand_pred - target)
                               / CAST(1000000 AS DOUBLE)
                               + CAST(0.5 AS DOUBLE)) AS BIGINT))
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS mse_grand_dollars2
    FROM scored
    """


@query("q678_shrinkage_backtest", oracle=_BACKTEST_SQL)
def q678_shrinkage_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-sample test of the credibility theorem: fit Z on
    1995-1997, predict each customer's 1998-2000 yearly mean with the
    raw mean, the credibility premium, and the grand mean; report
    per-customer MSE of each. Squared errors (cents^2) quantize to
    BIGINT units of 1e6 cents^2 = 100 dollars^2 per row (FLOOR(x+0.5))
    so the accumulation is exact on any partitioning."""
    _views(spark, sf_dir)
    return spark.sql(_BACKTEST_SQL)


# ---------------------------------------------------------------------------
# q679 — segment-level credibility

_SEGMENT_SQL = f"""
    WITH cells AS (
      SELECT c.c_mktsegment AS ck,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS x
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE o.o_orderdate >= DATE '1995-01-01'
        AND o.o_orderdate < DATE '2001-01-01'
      GROUP BY c.c_mktsegment,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
    ),
    {_comp_cte(6)}
    SELECT /*+ BROADCAST(c) */ p.ck AS segment,
           CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE) / CAST(100 AS DOUBLE)
             AS raw_mean_dollars,
           ROUND(c.z * (CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE))
                 / CAST(100 AS DOUBLE)
                 + (CAST(1 AS DOUBLE) - c.z)
                   * (CAST(c.tot AS DOUBLE)
                      / (CAST(6 AS DOUBLE) * CAST(c.nc AS DOUBLE)))
                   / CAST(100 AS DOUBLE), 4) AS premium_dollars,
           ROUND(c.z, 9) AS credibility_z
    FROM peri p CROSS JOIN cred c
    ORDER BY p.ck
    """


@query("q679_segment_credibility", oracle=_SEGMENT_SQL)
def q679_segment_credibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buhlmann credibility with market segments as the risks (5
    risks x 6 years): segment yearly means shrink toward the book
    mean with the Z the 5-risk variance components support; VHM <= 0
    (segments indistinguishable) pins Z = 0 via an integer-free CASE
    identical in both engines. With few, large risks Z runs much
    higher than q676's per-customer Z — exposure is what buys
    credibility."""
    _views(spark, sf_dir)
    return spark.sql(_SEGMENT_SQL)


# ---------------------------------------------------------------------------
# q680 — balance audit

_BALANCE_SQL = f"""
    WITH {_cells_cte()},
    {_comp_cte(6)}
    SELECT /*+ BROADCAST(c) */
           CAST(c.tot AS DOUBLE) / CAST(6 AS DOUBLE) / CAST(100 AS DOUBLE)
             AS total_raw_dollars,
           CAST(SUM(CAST(FLOOR(
               (c.z * (CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE))
                + (CAST(1 AS DOUBLE) - c.z)
                  * (CAST(c.tot AS DOUBLE)
                     / (CAST(6 AS DOUBLE) * CAST(c.nc AS DOUBLE))))
               + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS total_premium_dollars,
           MIN(CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE)
               / CAST(100 AS DOUBLE)) AS min_raw_dollars,
           MAX(CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE)
               / CAST(100 AS DOUBLE)) AS max_raw_dollars,
           ROUND(MIN(c.z * (CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE))
                 / CAST(100 AS DOUBLE)
                 + (CAST(1 AS DOUBLE) - c.z)
                   * (CAST(c.tot AS DOUBLE)
                      / (CAST(6 AS DOUBLE) * CAST(c.nc AS DOUBLE)))
                   / CAST(100 AS DOUBLE)), 4) AS min_premium_dollars,
           ROUND(MAX(c.z * (CAST(p.sx AS DOUBLE) / CAST(6 AS DOUBLE))
                 / CAST(100 AS DOUBLE)
                 + (CAST(1 AS DOUBLE) - c.z)
                   * (CAST(c.tot AS DOUBLE)
                      / (CAST(6 AS DOUBLE) * CAST(c.nc AS DOUBLE)))
                   / CAST(100 AS DOUBLE)), 4) AS max_premium_dollars
    FROM peri p CROSS JOIN cred c
    GROUP BY c.tot
    """


@query("q680_credibility_balance", oracle=_BALANCE_SQL)
def q680_credibility_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The credibility balance property: premiums redistribute but
    preserve the book total (sum_i P_i = sum_i m_i algebraically —
    the emitted totals agree to cents-level quantization), while the
    premium range compresses hard relative to the raw-mean range —
    the visible effect of shrinkage. Per-customer premiums quantize
    to whole cents (FLOOR(x+0.5)) before the exact sum."""
    _views(spark, sf_dir)
    return spark.sql(_BALANCE_SQL)
