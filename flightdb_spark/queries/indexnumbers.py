"""Index-number batch 118 (q656-q660) — the price/quantity index
theory a pricing or CPI pipeline runs, over per-part unit values
(revenue cents / quantity, both exact integer sums; the quotient is
rounded at 4 dp per part before any cross-year arithmetic, then every
index is a ratio of DECIMAL-accumulated products — the DETERMINISM.md
product treatment):

- q656 Laspeyres & Paasche: base-1996 vs current-2000 price indexes
  over the parts traded in BOTH years (base-weighted vs
  current-weighted);
- q657 Fisher ideal index: sqrt(L*P), one terminal transcendental,
  with the L/P spread that motivates it;
- q658 chained Laspeyres: year-over-year links 1996->2001 and their
  running product (a product of <=5 identical doubles);
- q659 value decomposition: value ratio = Laspeyres price x Paasche
  quantity (the exact identity, emitted with its residual which must
  be ~0);
- q660 unit-value mix effect: the brand-level unit-value index vs the
  part-level Laspeyres — the gap IS the composition shift.

100 TB shape: one (part, year) aggregate feeds every index; the
cross-year joins are per-part equi-joins on the bounded part
dimension; chaining multiplies a <=6-row table. The corpus is
scanned once per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BASE_YEAR = 1996
CURR_YEAR = 2000


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _py_cte() -> str:
    """Per (part, year): exact integer cents and quantity, unit value
    rounded at 4 dp (one rational -> double per cell)."""
    return """py AS (
      SELECT l_partkey AS partkey,
             CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty,
             ROUND(CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT))
                        AS DOUBLE)
                   / SUM(CAST(l_quantity AS BIGINT)), 4) AS unit_value
      FROM lineitem
      GROUP BY l_partkey, EXTRACT(YEAR FROM l_shipdate)
    )"""


_PY_VIEW = "idxnum_py_mv"

# Spark-side replacement for _py_cte(): same CTE name, a bounded scan of
# the materialized (part, year) table. Every index query references `py`
# 2-3x (self-joins across years), and Catalyst inlining re-ran the
# lineitem aggregate per reference (P3 pattern, guide §2.4); the oracle
# keeps the single-statement text (DuckDB materializes CTEs).
_PY_MV_CTE = f"""py AS (
      SELECT partkey, yr, cents, qty, unit_value FROM {_PY_VIEW}
    )"""


def _py_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE lineitem aggregate -> checkpointed (part, year) unit-value
    table; every cross-year join runs on the bounded part dimension."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_py_cte()} SELECT partkey, yr, cents, qty, unit_value FROM py"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_PY_VIEW)


def _lp_terms(series: str | None = None) -> str:
    """Common-parts join + the four DECIMAL-accumulated index sums."""
    return f"""{series or _py_cte()},
    matched AS (
      SELECT b.partkey,
             b.unit_value AS p0, b.qty AS q0,
             c.unit_value AS p1, c.qty AS q1
      FROM py b JOIN py c
        ON c.partkey = b.partkey AND b.yr = {BASE_YEAR} AND c.yr = {CURR_YEAR}
    ),
    sums AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
             SUM(CAST(ROUND(p1 * q0, 4) AS DECIMAL(38,4))) AS p1q0,
             SUM(CAST(ROUND(p0 * q0, 4) AS DECIMAL(38,4))) AS p0q0,
             SUM(CAST(ROUND(p1 * q1, 4) AS DECIMAL(38,4))) AS p1q1,
             SUM(CAST(ROUND(p0 * q1, 4) AS DECIMAL(38,4))) AS p0q1
      FROM matched
    )"""


# ---------------------------------------------------------------------------
# q656 — Laspeyres & Paasche

def _lp_sql(series: str | None = None) -> str:
    return f"""
    WITH {_lp_terms(series)}
    SELECT n_parts,
           ROUND(CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE), 6)
             AS laspeyres,
           ROUND(CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE), 6)
             AS paasche,
           ROUND(CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE)
                 - CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE), 6)
             AS lp_spread
    FROM sums
    """


_LP_SQL = _lp_sql()


@query("q656_laspeyres_paasche", oracle=_LP_SQL)
def q656_laspeyres_paasche(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres (base-weighted) and Paasche (current-weighted) price
    indexes between 1996 and 2000 over parts traded in both years:
    per-part unit values rounded once at 4 dp, index sums accumulated
    in DECIMAL(38,4), each index ONE terminal division. The spread is
    the substitution-bias signature."""
    _py_view(spark, sf_dir)
    return spark.sql(_lp_sql(_PY_MV_CTE))


# ---------------------------------------------------------------------------
# q657 — Fisher ideal

def _fisher_sql(series: str | None = None) -> str:
    return f"""
    WITH {_lp_terms(series)}
    SELECT n_parts,
           ROUND(sqrt((CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE))
                      * (CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE))), 6)
             AS fisher_ideal,
           ROUND(CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE), 6)
             AS laspeyres,
           ROUND(CAST(p1q1 AS DOUBLE) / CAST(p0q1 AS DOUBLE), 6) AS paasche
    FROM sums
    """


_FISHER_SQL = _fisher_sql()


@query("q657_fisher_index", oracle=_FISHER_SQL)
def q657_fisher_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Fisher ideal index sqrt(Laspeyres * Paasche) — the
    geometric mean that passes the time-reversal test. One terminal
    sqrt on an identical double; everything upstream is the q656
    DECIMAL machinery."""
    _py_view(spark, sf_dir)
    return spark.sql(_fisher_sql(_PY_MV_CTE))


# ---------------------------------------------------------------------------
# q658 — chained Laspeyres


def _chain_sql(dialect: str, series: str | None = None) -> str:
    return f"""
    WITH {series or _py_cte()},
    links AS (
      SELECT b.yr AS from_yr, b.yr + 1 AS to_yr,
             CAST(COUNT(*) AS BIGINT) AS n_parts,
             ROUND(CAST(SUM(CAST(ROUND(c.unit_value * b.qty, 4)
                                 AS DECIMAL(38,4))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(b.unit_value * b.qty, 4)
                                   AS DECIMAL(38,4))) AS DOUBLE), 6) AS link
      FROM py b JOIN py c
        ON c.partkey = b.partkey AND c.yr = b.yr + 1
      WHERE b.yr >= {BASE_YEAR} AND b.yr < {CURR_YEAR + 1}
      GROUP BY b.yr
    ),
    chained AS (
      SELECT /*+ BROADCAST(b) */ a.from_yr, a.to_yr, a.n_parts, a.link,
             -- running product over the <=6-row link table: product =
             -- product of links up to this row (bounded triangle join)
             ROUND(CAST(exp(SUM(CAST(ROUND(ln(b.link), 9)
                                     AS DECIMAL(38,9)))) AS DOUBLE), 6)
               AS chained_index
      FROM links a JOIN links b ON b.from_yr <= a.from_yr
      GROUP BY a.from_yr, a.to_yr, a.n_parts, a.link
    )
    SELECT from_yr, to_yr, n_parts, link, chained_index
    FROM chained
    ORDER BY from_yr
    """


@query("q658_chained_laspeyres", oracle=_chain_sql("duck"))
def q658_chained_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year chained Laspeyres links 1996->2001 with the
    running chained index (the product computed as exp of a
    ln-contract sum over the bounded link table — products of doubles
    are order-sensitive, sums of 9 dp-rounded logs are not). Each
    link joins adjacent years on the part dimension."""
    _py_view(spark, sf_dir)
    return spark.sql(_chain_sql("spark", _PY_MV_CTE))


# ---------------------------------------------------------------------------
# q659 — value decomposition

def _decomp_sql(series: str | None = None) -> str:
    return f"""
    WITH {_lp_terms(series)}
    SELECT n_parts,
           ROUND(CAST(p1q1 AS DOUBLE) / CAST(p0q0 AS DOUBLE), 6)
             AS value_ratio,
           ROUND(CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE), 6)
             AS laspeyres_price,
           ROUND(CAST(p1q1 AS DOUBLE) / CAST(p1q0 AS DOUBLE), 6)
             AS paasche_quantity,
           -- the identity V = L_p * P_q holds exactly on the unrounded
           -- ratios; the residual shows only display rounding
           ROUND(CAST(p1q1 AS DOUBLE) / CAST(p0q0 AS DOUBLE)
                 - (CAST(p1q0 AS DOUBLE) / CAST(p0q0 AS DOUBLE))
                   * (CAST(p1q1 AS DOUBLE) / CAST(p1q0 AS DOUBLE)), 6)
             AS identity_residual
    FROM sums
    """


_DECOMP_SQL = _decomp_sql()


@query("q659_value_decomposition", oracle=_DECOMP_SQL)
def q659_value_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-number identity: value ratio = Laspeyres price index
    x Paasche quantity index, emitted with its residual (which must
    print 0.0 — the identity is exact before display rounding). The
    standard decomposition of revenue change into price and volume."""
    _py_view(spark, sf_dir)
    return spark.sql(_decomp_sql(_PY_MV_CTE))


# ---------------------------------------------------------------------------
# q660 — unit-value mix effect

def _mix_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _py_cte()},
    branded AS (
      SELECT p.p_brand AS brand, y.yr,
             CAST(SUM(y.cents) AS BIGINT) AS cents,
             CAST(SUM(y.qty) AS BIGINT) AS qty
      FROM py y JOIN part p ON p.p_partkey = y.partkey
      WHERE y.yr IN ({BASE_YEAR}, {CURR_YEAR})
      GROUP BY p.p_brand, y.yr
    ),
    uv AS (
      SELECT b.brand,
             ROUND(CAST(c.cents AS DOUBLE) / c.qty, 4) AS uv1,
             ROUND(CAST(b.cents AS DOUBLE) / b.qty, 4) AS uv0,
             b.qty AS q0
      FROM branded b JOIN branded c
        ON c.brand = b.brand AND b.yr = {BASE_YEAR} AND c.yr = {CURR_YEAR}
    )
    SELECT brand,
           ROUND(uv1 / uv0, 6) AS unit_value_index,
           q0 AS base_qty
    FROM uv
    ORDER BY unit_value_index DESC, brand
    LIMIT 10
    """


_MIX_SQL = _mix_sql()


@query("q660_unit_value_mix", oracle=_MIX_SQL)
def q660_unit_value_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand-level unit-value indexes 1996->2000: the unit-value
    index confounds price change with mix shift (which parts sold),
    which is exactly why q656 matches parts first — the divergence
    between this table and q656's Laspeyres is the composition
    effect, visible brand by brand."""
    _py_view(spark, sf_dir)
    return spark.sql(_mix_sql(_PY_MV_CTE))
