"""Rank-mobility batch 127 (q701-q705) — the transition-matrix
machinery an economic-mobility (or customer-tiering) pipeline runs:
customers move between revenue bands from 1996 to 2000, and the
matrix says whether tiers are sticky or churning:

- q701 the mobility matrix itself: 6x6 band-to-band counts and
  row shares (band 0 = inactive that year; band edges are fixed
  literal cents so the banding is value-based, scale-safe, and
  identical on any engine — no quantile ranks over a dimension that
  grows with the corpus);
- q702 Shorrocks mobility index: M = (m - trace(P)) / (m - 1), 0 =
  perfectly immobile, 1+ = perfect mixing;
- q703 Bartholomew index: average band distance moved, an
  integer-numerator exact rational;
- q704 persistence by market segment: stay / move-up / move-down
  shares per segment;
- q705 origin -> destiny: expected 2000 band given the 1996 band —
  the regression-to-the-middle read of the matrix.

100 TB shape: one aggregate reduces orders to (customer, band96,
band00); every matrix statistic runs on the bounded 36-cell table.
The banding CASE is map-side; no windows, no quantile sort.

Determinism: bands from integer cent comparisons against literal
edges; counts exact; Shorrocks' trace accumulates per-row
ROUND(p_ii, 12) into DECIMAL(38,12) (six rationals with different
denominators — never raw double SUM, §1); Bartholomew's numerator is
a pure integer; expected-band and shares are unrounded exact
rationals (q666 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# Fixed band edges in cents (≈ the sf-invariant quintile scale of the
# synthetic data). Band 0 = inactive; bands 1..5 by value.
EDGES = (20_000_000, 40_000_000, 60_000_000, 80_000_000)
N_BANDS = 6  # 0..5
Y_FROM, Y_TO = 1996, 2000


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("orders", "customer"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _band_expr(col: str) -> str:
    cases = [f"WHEN {col} IS NULL OR {col} = 0 THEN CAST(0 AS BIGINT)"]
    for i, e in enumerate(EDGES):
        cases.append(f"WHEN {col} < CAST({e} AS BIGINT) THEN CAST({i + 1} AS BIGINT)")
    cases.append(f"ELSE CAST({len(EDGES) + 1} AS BIGINT)")
    return "CASE " + " ".join(cases) + " END"


def _pairs_cte() -> str:
    return f"""yearly AS (
      SELECT o_custkey AS ck,
             CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) IN ({Y_FROM}, {Y_TO})
      GROUP BY o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
    ),
    paired AS (
      SELECT c.c_custkey AS ck, c.c_mktsegment AS seg,
             {_band_expr("a.cents")} AS band_from,
             {_band_expr("b.cents")} AS band_to
      FROM customer c
      LEFT JOIN yearly a ON a.ck = c.c_custkey AND a.yr = {Y_FROM}
      LEFT JOIN yearly b ON b.ck = c.c_custkey AND b.yr = {Y_TO}
    ),
    matrix AS (
      SELECT band_from, band_to, CAST(COUNT(*) AS BIGINT) AS n
      FROM paired GROUP BY band_from, band_to
    ),
    rows_ AS (
      SELECT band_from, CAST(SUM(n) AS BIGINT) AS rowtot
      FROM matrix GROUP BY band_from
    )"""


# --- Spark-side staging (oracle keeps the single-statement CTE text) --------
#
# `yearly` (the orders aggregate) is referenced TWICE in `paired` (the
# 1996 and 2000 left joins) and `matrix`/`rows_` re-expand the whole
# chain again per reference, so Catalyst inlining re-ran the corpus
# pass 2-4x per query (P3 pattern, guide §2.4). Materialize yearly once
# (customer x 2 years grain), then the 36-cell matrix.

_YEARLY_VIEW = "mobility_yearly_mv"
_MATRIX_VIEW = "mobility_matrix_mv"

_PAIRS_MV_CTE = f"""yearly AS (
      SELECT ck, yr, cents FROM {_YEARLY_VIEW}
    ),
    paired AS (
      SELECT c.c_custkey AS ck, c.c_mktsegment AS seg,
             {_band_expr("a.cents")} AS band_from,
             {_band_expr("b.cents")} AS band_to
      FROM customer c
      LEFT JOIN yearly a ON a.ck = c.c_custkey AND a.yr = {Y_FROM}
      LEFT JOIN yearly b ON b.ck = c.c_custkey AND b.yr = {Y_TO}
    ),
    matrix AS (
      SELECT band_from, band_to, CAST(COUNT(*) AS BIGINT) AS n
      FROM paired GROUP BY band_from, band_to
    ),
    rows_ AS (
      SELECT band_from, CAST(SUM(n) AS BIGINT) AS rowtot
      FROM matrix GROUP BY band_from
    )"""

_MATRIX_MV_CTE = f"""matrix AS (
      SELECT band_from, band_to, n FROM {_MATRIX_VIEW}
    ),
    rows_ AS (
      SELECT band_from, CAST(SUM(n) AS BIGINT) AS rowtot
      FROM matrix GROUP BY band_from
    )"""


def _yearly_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE orders aggregate -> checkpointed (customer, year, cents)."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_pairs_cte()} SELECT ck, yr, cents FROM yearly")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_YEARLY_VIEW)


def _matrix_view(spark: SparkSession, sf_dir: str) -> None:
    """The 36-cell band matrix, checkpointed; every matrix statistic
    (q701-q703, q705) runs on this bounded table."""
    _yearly_view(spark, sf_dir)
    df = spark.sql(
        f"WITH {_PAIRS_MV_CTE} SELECT band_from, band_to, n FROM matrix"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_MATRIX_VIEW)


# ---------------------------------------------------------------------------
# q701 — the mobility matrix


def _matrix_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _pairs_cte()}
    SELECT m.band_from, m.band_to, m.n,
           CAST(m.n AS DOUBLE) / CAST(r.rowtot AS DOUBLE) AS row_share
    FROM matrix m JOIN rows_ r ON r.band_from = m.band_from
    ORDER BY m.band_from, m.band_to
    """


_MATRIX_SQL = _matrix_sql()


@query("q701_mobility_matrix", oracle=_MATRIX_SQL)
def q701_mobility_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 1996 -> 2000 revenue-band transition matrix over ALL
    customers (band 0 = inactive): counts and row-stochastic shares.
    Fixed literal band edges make the banding a map-side CASE — no
    quantile rank over the growing customer dimension."""
    _matrix_view(spark, sf_dir)
    return spark.sql(_matrix_sql(_MATRIX_MV_CTE))


# ---------------------------------------------------------------------------
# q702 — Shorrocks index

def _shorrocks_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _pairs_cte()},
    diag AS (
      SELECT m.band_from,
             CAST(m.n AS DOUBLE) / CAST(r.rowtot AS DOUBLE) AS p_stay
      FROM matrix m JOIN rows_ r ON r.band_from = m.band_from
      WHERE m.band_to = m.band_from
    )
    SELECT CAST({N_BANDS} AS BIGINT) AS n_bands,
           ROUND(CAST(SUM(CAST(ROUND(p_stay, 12) AS DECIMAL(38,12)))
                      AS DOUBLE), 9) AS trace_p,
           ROUND((CAST({N_BANDS} AS DOUBLE)
                  - CAST(SUM(CAST(ROUND(p_stay, 12) AS DECIMAL(38,12)))
                         AS DOUBLE))
                 / CAST({N_BANDS - 1} AS DOUBLE), 9) AS shorrocks_m
    FROM diag
    """


_SHORROCKS_SQL = _shorrocks_sql()


@query("q702_shorrocks_index", oracle=_SHORROCKS_SQL)
def q702_shorrocks_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shorrocks' mobility index M = (m - trace(P)) / (m - 1) over
    the row-stochastic band matrix: 0 = everyone stays put, 1 =
    mixing as if origin didn't matter. The six diagonal rationals
    accumulate via ROUND(p,12) -> DECIMAL (different denominators —
    a raw double SUM would be partial-agg order-sensitive)."""
    _matrix_view(spark, sf_dir)
    return spark.sql(_shorrocks_sql(_MATRIX_MV_CTE))


# ---------------------------------------------------------------------------
# q703 — Bartholomew index

def _bartholomew_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _pairs_cte()},
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM matrix)
    SELECT /*+ BROADCAST(t) */
           CAST(SUM(m.n * ABS(m.band_from - m.band_to)) AS BIGINT)
             AS total_band_distance,
           t.t AS n_customers,
           CAST(SUM(m.n * ABS(m.band_from - m.band_to)) AS DOUBLE)
             / CAST(t.t AS DOUBLE) AS bartholomew_index
    FROM matrix m CROSS JOIN tot t
    GROUP BY t.t
    """


_BARTHOLOMEW_SQL = _bartholomew_sql()


@query("q703_bartholomew_index", oracle=_BARTHOLOMEW_SQL)
def q703_bartholomew_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bartholomew's mobility index: the average number of bands a
    customer moved — an exact integer numerator (sum of n * |i - j|)
    over the customer count, emitted as an unrounded rational."""
    _matrix_view(spark, sf_dir)
    return spark.sql(_bartholomew_sql(_MATRIX_MV_CTE))


# ---------------------------------------------------------------------------
# q704 — persistence by segment

def _segment_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _pairs_cte()}
    SELECT seg AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CASE WHEN band_to = band_from THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS stay_share,
           CAST(SUM(CASE WHEN band_to > band_from THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS up_share,
           CAST(SUM(CASE WHEN band_to < band_from THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS down_share
    FROM paired
    GROUP BY seg
    ORDER BY seg
    """


_SEGMENT_SQL = _segment_sql()


@query("q704_segment_persistence", oracle=_SEGMENT_SQL)
def q704_segment_persistence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band persistence by market segment: the share of customers who
    stayed, moved up, or moved down between 1996 and 2000. The three
    shares partition 1 exactly (integer counts over one denominator)."""
    _yearly_view(spark, sf_dir)
    return spark.sql(_segment_sql(_PAIRS_MV_CTE))


# ---------------------------------------------------------------------------
# q705 — origin -> destiny

def _destiny_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _pairs_cte()}
    SELECT m.band_from,
           r.rowtot AS n_customers,
           CAST(SUM(m.n * m.band_to) AS DOUBLE) / CAST(r.rowtot AS DOUBLE)
             AS expected_band_to,
           CAST(SUM(CASE WHEN m.band_to = m.band_from THEN m.n
                    ELSE CAST(0 AS BIGINT) END) AS DOUBLE)
             / CAST(r.rowtot AS DOUBLE) AS stay_share
    FROM matrix m JOIN rows_ r ON r.band_from = m.band_from
    GROUP BY m.band_from, r.rowtot
    ORDER BY m.band_from
    """


_DESTINY_SQL = _destiny_sql()


@query("q705_origin_destiny", oracle=_DESTINY_SQL)
def q705_origin_destiny(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin -> destiny: the expected 2000 band conditional on the
    1996 band (an exact integer-weighted mean per row) with each
    origin's stay share — low origins drifting up and high origins
    drifting down is regression to the middle made visible."""
    _matrix_view(spark, sf_dir)
    return spark.sql(_destiny_sql(_MATRIX_MV_CTE))
