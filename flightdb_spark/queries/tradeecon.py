"""Trade-economics batch 124 (q686-q690) — the bilateral-flow
analytics an international-trade (or internal transfer-pricing)
pipeline runs, with supplier nations as origins, customer nations as
destinations, and lineitem revenue (exact BIGINT cents) as the flow:

- q686 trade corridors: the top-15 origin->destination flows with
  exact shares of world trade;
- q687 gravity residuals: which corridors over/under-trade relative
  to the frictionless gravity benchmark flow_ij ~ exports_i *
  imports_j / total (the unit-elasticity gravity model);
- q688 shift-share decomposition: each origin nation's 1996->2000
  revenue change split into national-growth, industry-mix (brand),
  and competitive-shift components — an exact additive identity;
- q689 revealed comparative advantage: Balassa RCA per (nation,
  brand), the double share ratio, top-10 specializations;
- q690 Grubel-Lloyd intra-industry trade: per nation PAIR, how
  two-way (vs one-way) the trade relationship is.

100 TB shape: ONE join tree reduces the fact table to a <= 25x25
nation flow matrix (or 25-nation x 25-brand cells for shift-share) —
dimension joins are broadcasts against the fact scan; everything
after the first aggregate runs on bounded tables. No corpus-wide
windows.

Determinism: flows are exact BIGINT cents; gravity ln terms round at
6 dp (one transcendental per emitted cell, §5); shift-share
components quantize per-cell to BIGINT hundredths-of-a-cent
(FLOOR(x*100 + 0.5)) before summing so the 25-cell accumulation is
order-free; RCA and GL ratios are straight-line doubles over exact
integers, GL emitted unrounded (pure rational), RCA ranked on its
6 dp rounding with key tie-breaks (§4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "customer", "supplier", "nation", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _flows_cte() -> str:
    """Origin-nation x destination-nation revenue matrix (<= 625 cells)."""
    return """flows AS (
      SELECT s.s_nationkey AS onat, c.c_nationkey AS dnat,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, c.c_nationkey
    )"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form; DuckDB materializes CTEs natively) -----------------------------------
#
# Catalyst inlines CTEs per reference, so `flows` (the 4-table corpus
# join+aggregate) re-ran once per marginal: q686 2x (flows + tot),
# q687 4x (flows, exp_i, imp_j, tot), q690 3x (both pair sides + the
# name joins' input). Same for the shift-share / RCA `cells`. The P3
# fix (guide §2.4): materialize the bounded matrix (<= 625 rows) once
# per query; every marginal and ratio then runs on the checkpoint.

_FLOWS_VIEW = "tradeecon_flows_mv"
_FLOWS_MV_CTE = f"""flows AS (
      SELECT onat, dnat, cents FROM {_FLOWS_VIEW}
    )"""


def _flows_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE fact-table reduction -> checkpointed flow matrix view."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_flows_cte()} SELECT onat, dnat, cents FROM flows")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_FLOWS_VIEW)


# ---------------------------------------------------------------------------
# q686 — trade corridors

def _corridor_sql(flows: str | None = None) -> str:
    return f"""
    WITH {flows or _flows_cte()},
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM flows)
    SELECT /*+ BROADCAST(t) */
           no.n_name AS origin, nd.n_name AS destination,
           CAST(f.cents AS DOUBLE) / CAST(100 AS DOUBLE) AS flow_dollars,
           CAST(f.cents AS DOUBLE) / CAST(t.t AS DOUBLE) AS world_share
    FROM flows f
    JOIN nation no ON no.n_nationkey = f.onat
    JOIN nation nd ON nd.n_nationkey = f.dnat
    CROSS JOIN tot t
    ORDER BY f.cents DESC, no.n_name ASC, nd.n_name ASC
    LIMIT 15
    """


_CORRIDOR_SQL = _corridor_sql()


@query("q686_trade_corridors", oracle=_CORRIDOR_SQL)
def q686_trade_corridors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifteen largest origin->destination revenue corridors with
    their exact share of world trade. One fact-table reduction to the
    bounded nation matrix; name joins are broadcasts; top-k orders by
    exact integer cents with name tie-breaks."""
    _flows_view(spark, sf_dir)
    return spark.sql(_corridor_sql(_FLOWS_MV_CTE))


# ---------------------------------------------------------------------------
# q687 — gravity residuals

def _gravity_sql(flows: str | None = None) -> str:
    return f"""
    WITH {flows or _flows_cte()},
    exp_i AS (
      SELECT onat, CAST(SUM(cents) AS BIGINT) AS ex FROM flows GROUP BY onat
    ),
    imp_j AS (
      SELECT dnat, CAST(SUM(cents) AS BIGINT) AS im FROM flows GROUP BY dnat
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM flows)
    SELECT f.onat AS origin_key, f.dnat AS dest_key,
           CAST(f.cents AS DOUBLE) / CAST(100 AS DOUBLE) AS flow_dollars,
           ROUND(CAST(e.ex AS DOUBLE) * CAST(i.im AS DOUBLE)
                 / CAST(t.t AS DOUBLE) / CAST(100 AS DOUBLE), 2)
             AS gravity_flow_dollars,
           ROUND(ln(CAST(f.cents AS DOUBLE) * CAST(t.t AS DOUBLE)
                    / (CAST(e.ex AS DOUBLE) * CAST(i.im AS DOUBLE))), 6)
             AS log_residual
    FROM flows f
    JOIN exp_i e ON e.onat = f.onat
    JOIN imp_j i ON i.dnat = f.dnat
    CROSS JOIN tot t
    WHERE f.cents > 0
    ORDER BY ROUND(ln(CAST(f.cents AS DOUBLE) * CAST(t.t AS DOUBLE)
                      / (CAST(e.ex AS DOUBLE) * CAST(i.im AS DOUBLE))), 6)
               DESC,
             f.onat ASC, f.dnat ASC
    LIMIT 10
    """


_GRAVITY_SQL = _gravity_sql()


@query("q687_gravity_residuals", oracle=_GRAVITY_SQL)
def q687_gravity_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity-model residuals: each corridor's log deviation from
    the frictionless benchmark exports_i * imports_j / total — the
    unit-elasticity gravity prediction. The ten most over-trading
    corridors, ranked on the 6 dp-rounded residual with key
    tie-breaks (§4). All marginals are exact integer sums; one ln per
    cell."""
    _flows_view(spark, sf_dir)
    return spark.sql(_gravity_sql(_FLOWS_MV_CTE))


# ---------------------------------------------------------------------------
# q688 — shift-share decomposition

_SS_CELLS_CTE = """cells AS (
      SELECT s.s_nationkey AS nat, p.p_brand AS brand,
             CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 1996
                      THEN CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                                AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS e96,
             CAST(SUM(CASE WHEN EXTRACT(YEAR FROM l.l_shipdate) = 2000
                      THEN CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                                AS BIGINT)
                      ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS e00
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE EXTRACT(YEAR FROM l.l_shipdate) IN (1996, 2000)
      GROUP BY s.s_nationkey, p.p_brand
    )"""

_SS_CELLS_VIEW = "tradeecon_sscells_mv"
_SS_CELLS_MV_CTE = f"""cells AS (
      SELECT nat, brand, e96, e00 FROM {_SS_CELLS_VIEW}
    )"""


def _ss_cells_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE two-year fact reduction -> checkpointed shift-share cells."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_SS_CELLS_CTE} SELECT nat, brand, e96, e00 FROM cells")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_SS_CELLS_VIEW)


def _shiftshare_sql(cells: str | None = None) -> str:
    return f"""
    WITH {cells or _SS_CELLS_CTE},
    kbrand AS (
      SELECT brand, CAST(SUM(e96) AS BIGINT) AS k96,
             CAST(SUM(e00) AS BIGINT) AS k00
      FROM cells GROUP BY brand
    ),
    tot AS (
      SELECT CAST(SUM(e96) AS BIGINT) AS t96,
             CAST(SUM(e00) AS BIGINT) AS t00
      FROM cells
    ),
    parts AS (
      SELECT /*+ BROADCAST(k), BROADCAST(t) */
             c.nat,
             c.e00 - c.e96 AS actual_cents,
             -- national effect: e96 * g, quantized per cell
             CAST(FLOOR(CAST(c.e96 AS DOUBLE)
                        * (CAST(t.t00 AS DOUBLE) / CAST(t.t96 AS DOUBLE)
                           - CAST(1 AS DOUBLE))
                        * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS ns_h,
             -- industry mix: e96 * (g_k - g)
             CAST(FLOOR(CAST(c.e96 AS DOUBLE)
                        * (CAST(k.k00 AS DOUBLE) / CAST(k.k96 AS DOUBLE)
                           - CAST(t.t00 AS DOUBLE) / CAST(t.t96 AS DOUBLE))
                        * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS im_h,
             -- competitive shift: (e00 - e96) - e96 * g_k = the cell's
             -- actual growth beyond its industry's national rate
             CAST(FLOOR((CAST(c.e00 - c.e96 AS DOUBLE)
                         - CAST(c.e96 AS DOUBLE)
                           * (CAST(k.k00 AS DOUBLE) / CAST(k.k96 AS DOUBLE)
                              - CAST(1 AS DOUBLE)))
                        * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS rs_h
      FROM cells c
      JOIN kbrand k ON k.brand = c.brand
      CROSS JOIN tot t
      WHERE c.e96 > 0 AND k.k96 > 0
    )
    SELECT /*+ BROADCAST(n) */ n.n_name AS nation,
           CAST(SUM(p.actual_cents) AS DOUBLE) / CAST(100 AS DOUBLE)
             AS actual_change_dollars,
           CAST(SUM(p.ns_h) AS DOUBLE) / CAST(10000 AS DOUBLE)
             AS national_effect_dollars,
           CAST(SUM(p.im_h) AS DOUBLE) / CAST(10000 AS DOUBLE)
             AS industry_mix_dollars,
           CAST(SUM(p.rs_h) AS DOUBLE) / CAST(10000 AS DOUBLE)
             AS competitive_shift_dollars
    FROM parts p JOIN nation n ON n.n_nationkey = p.nat
    GROUP BY n.n_name
    ORDER BY n.n_name
    """


_SHIFTSHARE_SQL = _shiftshare_sql()


@query("q688_shift_share", oracle=_SHIFTSHARE_SQL)
def q688_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of each supplier nation's 1996->2000
    revenue change: national growth effect + industry (brand) mix +
    competitive shift, summing to the actual change up to the per-cell
    hundredth-of-a-cent quantization. Each component quantizes to
    BIGINT before the 25-cell sum (order-free, q666 lesson); rates
    come from exact integer marginals."""
    _ss_cells_view(spark, sf_dir)
    return spark.sql(_shiftshare_sql(_SS_CELLS_MV_CTE))


# ---------------------------------------------------------------------------
# q689 — revealed comparative advantage

_RCA_CELLS_CTE = """cells AS (
      SELECT s.s_nationkey AS nat, p.p_brand AS brand,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY s.s_nationkey, p.p_brand
    )"""

_RCA_CELLS_VIEW = "tradeecon_rcacells_mv"
_RCA_CELLS_MV_CTE = f"""cells AS (
      SELECT nat, brand, cents FROM {_RCA_CELLS_VIEW}
    )"""


def _rca_cells_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE fact reduction -> checkpointed (nation, brand) cells."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_RCA_CELLS_CTE} SELECT nat, brand, cents FROM cells")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_RCA_CELLS_VIEW)


def _rca_sql(cells: str | None = None) -> str:
    return f"""
    WITH {cells or _RCA_CELLS_CTE},
    bynat AS (
      SELECT nat, CAST(SUM(cents) AS BIGINT) AS natc FROM cells GROUP BY nat
    ),
    bybrand AS (
      SELECT brand, CAST(SUM(cents) AS BIGINT) AS brc FROM cells GROUP BY brand
    ),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM cells)
    SELECT /*+ BROADCAST(nn) */ nn.n_name AS nation, c.brand,
           CAST(c.cents AS DOUBLE) / CAST(100 AS DOUBLE) AS flow_dollars,
           ROUND((CAST(c.cents AS DOUBLE) / CAST(b.natc AS DOUBLE))
                 / (CAST(k.brc AS DOUBLE) / CAST(t.t AS DOUBLE)), 6)
             AS rca
    FROM cells c
    JOIN bynat b ON b.nat = c.nat
    JOIN bybrand k ON k.brand = c.brand
    JOIN nation nn ON nn.n_nationkey = c.nat
    CROSS JOIN tot t
    WHERE c.cents >= 100000
    ORDER BY ROUND((CAST(c.cents AS DOUBLE) / CAST(b.natc AS DOUBLE))
                   / (CAST(k.brc AS DOUBLE) / CAST(t.t AS DOUBLE)), 6) DESC,
             nn.n_name ASC, c.brand ASC
    LIMIT 10
    """


_RCA_SQL = _rca_sql()


@query("q689_revealed_advantage", oracle=_RCA_SQL)
def q689_revealed_advantage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa revealed comparative advantage: the ten strongest
    (nation, brand) specializations by RCA = (cell/nation) /
    (brand/world) among cells above a $1k floor. All four operands
    are exact integer sums; ranked on the 6 dp-rounded ratio with
    name/brand tie-breaks (§4)."""
    _rca_cells_view(spark, sf_dir)
    return spark.sql(_rca_sql(_RCA_CELLS_MV_CTE))


# ---------------------------------------------------------------------------
# q690 — Grubel-Lloyd intra-industry trade

def _gl_sql(flows: str | None = None) -> str:
    return f"""
    WITH {flows or _flows_cte()},
    pairs AS (
      SELECT a.onat AS nat_lo, a.dnat AS nat_hi,
             a.cents AS ab, b.cents AS ba
      FROM flows a JOIN flows b
        ON b.onat = a.dnat AND b.dnat = a.onat AND a.onat < a.dnat
    )
    SELECT /*+ BROADCAST(nl), BROADCAST(nh) */
           nl.n_name AS nation_a, nh.n_name AS nation_b,
           CAST(ab + ba AS DOUBLE) / CAST(100 AS DOUBLE)
             AS total_trade_dollars,
           CAST(ab AS DOUBLE) / CAST(100 AS DOUBLE) AS a_to_b_dollars,
           CAST(ba AS DOUBLE) / CAST(100 AS DOUBLE) AS b_to_a_dollars,
           CAST(1 AS DOUBLE)
             - CAST(ABS(ab - ba) AS DOUBLE) / CAST(ab + ba AS DOUBLE)
             AS grubel_lloyd
    FROM pairs
    JOIN nation nl ON nl.n_nationkey = nat_lo
    JOIN nation nh ON nh.n_nationkey = nat_hi
    ORDER BY ab + ba DESC, nl.n_name ASC, nh.n_name ASC
    LIMIT 15
    """


_GL_SQL = _gl_sql()


@query("q690_grubel_lloyd", oracle=_GL_SQL)
def q690_grubel_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grubel-Lloyd intra-industry trade index per nation pair:
    GL = 1 - |X_ab - X_ba| / (X_ab + X_ba), 1 = perfectly two-way,
    0 = one-way. The fifteen biggest trading pairs by exact total.
    The pair join runs on the bounded flow matrix (<= 625 rows); GL
    is an unrounded exact-integer rational."""
    _flows_view(spark, sf_dir)
    return spark.sql(_gl_sql(_FLOWS_MV_CTE))
