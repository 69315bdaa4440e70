"""Auction-theory batch 120 (q666-q670) — the sealed-bid auction
analytics a procurement/marketplace pipeline runs, with each part as
an auction and its suppliers' unit prices as the bids (bid = per
(part, supplier) MIN unit price, quantized to integer MICRO-dollars):

- q666 second-price (Vickrey) procurement census per brand: lowest
  bid wins, pays the SECOND-lowest — total first-price vs clearing
  cost and the average money-left-on-table;
- q667 reserve-price grid: forward-auction revenue at five reserve
  levels around the mean top bid (cleared count, revenue with the
  max(second, reserve) clearing rule);
- q668 bid dispersion by auction depth: how the winner's margin
  shrinks as bidder count grows — the competition curve;
- q669 revenue-equivalence audit: observed second-price revenue vs
  the (n-1)/n-shaded first-price BNE benchmark, by depth;
- q670 money-left-on-table top-10: the auctions with the widest
  first-to-second gap (rank on the integer gap, part tie-break).

100 TB shape: ONE aggregate reduces the fact table to (part,
supplier) bids; ranking windows partition by part (bounded by
suppliers-per-part, never corpus-wide); the reserve grid is a 5-row
broadcast BNLJ against the per-part top-2 table — no shuffle grows
with the grid.

Determinism — this batch's first draft is a case study (it FAILED
the oracle three ways before landing here): the per-row bid
ROUND(price/qty, 4) hit TRUE halfway digits (a 2 dp price over
qty 8 has exact scale 5 ending in 5), flipping per-row bids 1e-4
between Spark's HALF_UP and DuckDB's binary rounding, and terminal
ROUNDed averages flipped on exact-rational halfway quotients. The
fix is the round-6 FLOOR lesson taken end-to-end: bids are BIGINT
micro-dollars via FLOOR(cents * 10000 / qty + 0.5) (FLOOR of an
identical double is bit-identical on both engines; ROUND is not);
every sum/min/max/comparison downstream is exact integer; dollars
appear only as terminal micro/1e6 divisions, never re-rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MICRO = 1_000_000  # micro-dollars per dollar


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _bids_cte() -> str:
    """(part, supplier) -> one sealed bid in exact BIGINT micro-dollars:
    MIN over the supplier's lines of FLOOR(cents*10000/qty + 0.5).
    Integer MIN is order-free; FLOOR of identical doubles is
    bit-identical across engines (round-6 lesson), unlike ROUND."""
    return """bids AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             MIN(CAST(FLOOR(
                 CAST(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                      AS DOUBLE)
                 * CAST(10000 AS DOUBLE) / CAST(l_quantity AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS bid
      FROM lineitem
      GROUP BY l_partkey, l_suppkey
    )"""


def _top2_cte(order: str) -> str:
    """Per-part best and second bid among >= 2 bidders; `order` ASC for
    procurement (lowest wins), DESC for forward auctions. The rank
    window partitions by part (bounded by bidders-per-part)."""
    return f"""{_bids_cte()},
    ranked AS (
      SELECT partkey, suppkey, bid,
             ROW_NUMBER() OVER (PARTITION BY partkey
                                ORDER BY bid {order}, suppkey ASC) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY partkey) AS BIGINT)
               AS n_bidders
      FROM bids
    ),
    top2 AS (
      SELECT partkey, n_bidders,
             MAX(CASE WHEN rk = 1 THEN bid END) AS best,
             MAX(CASE WHEN rk = 2 THEN bid END) AS second
      FROM ranked
      WHERE rk <= 2 AND n_bidders >= 2
      GROUP BY partkey, n_bidders
    )"""


# ---------------------------------------------------------------------------
# q666 — Vickrey procurement census per brand

_VICKREY_SQL = f"""
    WITH {_top2_cte("ASC")}
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_auctions,
           CAST(SUM(t.best) AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS first_price_cost,
           CAST(SUM(t.second) AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS clearing_cost,
           CAST(SUM(t.second - t.best) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS avg_money_on_table
    FROM top2 t JOIN part p ON p.p_partkey = t.partkey
    GROUP BY p.p_brand
    ORDER BY brand
    """


@query("q666_vickrey_census", oracle=_VICKREY_SQL)
def q666_vickrey_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-price sealed-bid procurement per brand: the winner
    (lowest bid) is paid the second-lowest, so the brand's clearing
    cost exceeds its first-price cost by exactly the runner-up gap —
    the incentive-compatibility premium, averaged per auction. All
    money is exact BIGINT micro-dollars until the terminal division."""
    _views(spark, sf_dir)
    return spark.sql(_VICKREY_SQL)


# ---------------------------------------------------------------------------
# q667 — reserve-price grid (forward auction)

# --- Spark-side staging (oracle keeps the single-statement CTE form) --------
#
# q667 references `top2` twice (the mean-anchor aggregate AND the
# revenue sweep), so the corpus bid aggregate + rank window re-ran per
# reference under Catalyst inlining (P3 pattern, guide §2.4). The
# part-grain top2 table is materialized once; anchor/grid/sweep run on
# the checkpoint.

_TOP2D_VIEW = "auctions_top2d_mv"
_TOP2D_MV_CTE = f"""top2 AS (
      SELECT partkey, n_bidders, best, second FROM {_TOP2D_VIEW}
    )"""


def _top2d_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE bids pass + rank window -> checkpointed per-part top2."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_top2_cte('DESC')} "
        "SELECT partkey, n_bidders, best, second FROM top2"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_TOP2D_VIEW)


def _reserve_sql(top2: str | None = None) -> str:
    return f"""
    WITH {top2 or _top2_cte("DESC")},
    anchor AS (
      SELECT CAST(FLOOR(CAST(SUM(best) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS mean_best
      FROM top2
    ),
    grid AS (
      SELECT CAST(m.k AS BIGINT) AS mult_pct,
             CAST(FLOOR(CAST(a.mean_best AS DOUBLE) * CAST(m.k AS DOUBLE)
                        / CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS reserve
      FROM anchor a
      JOIN (SELECT 60 AS k UNION ALL SELECT 80 UNION ALL SELECT 100
            UNION ALL SELECT 120 UNION ALL SELECT 140) m ON 1 = 1
    )
    SELECT /*+ BROADCAST(g) */ g.mult_pct,
           CAST(g.reserve AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS reserve_price,
           CAST(SUM(CASE WHEN t.best >= g.reserve THEN 1 ELSE 0 END)
                AS BIGINT) AS cleared,
           CAST(SUM(CASE WHEN t.best >= g.reserve
                    THEN GREATEST(t.second, g.reserve)
                    ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
             / CAST({MICRO} AS DOUBLE) AS revenue
    FROM top2 t CROSS JOIN grid g
    GROUP BY g.mult_pct, g.reserve
    ORDER BY g.mult_pct
    """


_RESERVE_SQL = _reserve_sql()


@query("q667_reserve_price_grid", oracle=_RESERVE_SQL)
def q667_reserve_price_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward second-price auction revenue under five reserve prices
    (60..140% of the mean winning bid): an auction clears when the top
    bid meets the reserve and pays max(second bid, reserve) — integer
    comparisons on micro-dollar bids, so no boundary can flip between
    engines. The revenue curve's interior maximum is Myerson's
    exclusion principle in the data. Grid join is a 5-row broadcast
    BNLJ."""
    _top2d_view(spark, sf_dir)
    return spark.sql(_reserve_sql(_TOP2D_MV_CTE))


# ---------------------------------------------------------------------------
# q668 — bid dispersion by auction depth

_DISPERSION_SQL = f"""
    WITH {_top2_cte("ASC")}
    SELECT n_bidders,
           CAST(COUNT(*) AS BIGINT) AS n_auctions,
           CAST(SUM(second - best) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS avg_gap,
           CAST(SUM(CAST(FLOOR(
                 CAST(second - best AS DOUBLE) / CAST(best AS DOUBLE)
                 * CAST({MICRO} AS DOUBLE)
                 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS avg_rel_margin
    FROM top2
    GROUP BY n_bidders
    ORDER BY n_bidders
    """


@query("q668_bid_dispersion_by_depth", oracle=_DISPERSION_SQL)
def q668_bid_dispersion_by_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The competition curve: average absolute and relative gap
    between the two best procurement bids, grouped by bidder count.
    Deeper auctions should show tighter margins — the empirical
    signature of Bertrand competition. Relative margins accumulate as
    BIGINT micro-ratios (FLOOR(x*1e6 + 0.5)), never summed doubles."""
    _views(spark, sf_dir)
    return spark.sql(_DISPERSION_SQL)


# ---------------------------------------------------------------------------
# q669 — revenue-equivalence audit

_REVEQ_SQL = f"""
    WITH {_top2_cte("DESC")}
    SELECT n_bidders,
           CAST(COUNT(*) AS BIGINT) AS n_auctions,
           CAST(SUM(second) AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS second_price_revenue,
           CAST(SUM(CAST(FLOOR(
                 CAST(best AS DOUBLE)
                 * (CAST(n_bidders - 1 AS DOUBLE)
                    / CAST(n_bidders AS DOUBLE))
                 + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS DOUBLE)
             / CAST({MICRO} AS DOUBLE) AS shaded_first_price_revenue
    FROM top2
    GROUP BY n_bidders
    ORDER BY n_bidders
    """


@query("q669_revenue_equivalence_audit", oracle=_REVEQ_SQL)
def q669_revenue_equivalence_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue equivalence in the data: observed second-price revenue
    vs the first-price BNE benchmark where each winner shades to
    (n-1)/n of their value (the uniform-IPV equilibrium bid). Where
    the two columns diverge, the IPV assumptions do not hold for that
    depth — the standard empirical-auctions diagnostic. Shaded bids
    quantize to BIGINT micro-dollars per row before summing."""
    _views(spark, sf_dir)
    return spark.sql(_REVEQ_SQL)


# ---------------------------------------------------------------------------
# q670 — money-left-on-table top-10

_MLOT_SQL = f"""
    WITH {_top2_cte("ASC")}
    SELECT t.partkey, p.p_brand AS brand, t.n_bidders,
           CAST(t.best AS DOUBLE) / CAST({MICRO} AS DOUBLE) AS best_bid,
           CAST(t.second AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS second_bid,
           CAST(t.second - t.best AS DOUBLE) / CAST({MICRO} AS DOUBLE)
             AS money_on_table
    FROM top2 t JOIN part p ON p.p_partkey = t.partkey
    ORDER BY t.second - t.best DESC, t.partkey ASC
    LIMIT 10
    """


@query("q670_money_on_table_topk", oracle=_MLOT_SQL)
def q670_money_on_table_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten procurement auctions with the widest gap between the
    winning and runner-up bids — where a posted price (or a better
    reserve) would have saved the most. Top-k orders by the exact
    INTEGER gap with the part key as total tie-break (§4); compiles
    to TakeOrderedAndProject, never a global sort."""
    _views(spark, sf_dir)
    return spark.sql(_MLOT_SQL)
