"""Cross-price-elasticity batch 155 (q841-q845) — the brand-pair
demand system a pricing team estimates on the monthly panel: how one
brand's sold quantity responds to ANOTHER brand's average price
(q282 covers the row-level own-price slope per type; this batch is
the PANEL cross matrix between the top-5 brands, within-brand
demeaned so brand level effects drop out).

- q841 the (brand, month) panel: quantity, average unit price, and
  their within-brand demeaned nano-quantized logs;
- q842 the 5x5 elasticity matrix (own on the diagonal): OLS slope of
  brand A's demeaned log quantity on brand B's demeaned log price
  over common months;
- q843 substitution census: each off-diagonal cell classified
  substitute (slope > +0.1), complement (< -0.1), or neutral;
- q844 Slutsky-style symmetry audit: slope(A,B) beside slope(B,A)
  per unordered pair with the absolute asymmetry;
- q845 Lerner markup table: the inverse-elasticity pricing rule
  1/|own elasticity| per brand, with the inelastic-demand flag
  (|e| < 1, where the monopoly rule breaks).

100 TB shape: one fact pass to the 25-brand monthly panel; the pair
regressions join the 5-brand panel to itself on month (<= 25 pairs x
~80 months). Nothing beyond the panel ever shuffles.

Determinism: quantities/prices exact integers (micro-cent unit
price); logs FLOOR-nano-quantized (q761 lesson); within-brand means
exact integer ratios; demeaned cross products re-quantized to nano
BIGINTs before summation; slopes terminal doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BASE_MONTH = 1995 * 12
NANO = "1000000000"
SUB_THRESHOLD = "0.1e0"


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _nq(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * {NANO} + 0.5) AS BIGINT)"


MICRO = "1000000"


def _mq(expr: str) -> str:
    """Micro quantizer for the demeaned panel values: moment PRODUCTS
    must stay under 2^53 (q679/q804 lesson) — nano x nano over 80
    months lands at 2e19 and the DECIMAL->double cast flips an ulp."""
    return f"CAST(FLOOR(({expr}) * {MICRO} + 0.5) AS BIGINT)"


def _panel_cte() -> str:
    """Top-5 brand monthly panel with demeaned log qty/price (nano)."""
    return f"""cells AS (
      SELECT p.p_brand AS b,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
               - {BASE_MONTH}) AS m,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0
      GROUP BY p.p_brand,
               (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
                 - {BASE_MONTH})
    ),
    top5 AS (
      SELECT b FROM (
        SELECT b, CAST(SUM(cents) AS BIGINT) AS tot FROM cells GROUP BY b
      ) g ORDER BY tot DESC, b ASC LIMIT 5
    ),
    panel0 AS (
      SELECT /*+ BROADCAST(t) */ c.b, c.m, c.qty,
             {_nq('LN(CAST(c.qty AS DOUBLE))')} AS lq_n,
             {_nq('LN(CAST(FLOOR(CAST(c.cents AS DOUBLE) * 10000 / c.qty '
                  '+ 0.5) AS BIGINT))')} AS lp_n
      FROM cells c JOIN top5 t ON t.b = c.b
    ),
    bmeans AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lq_n) AS BIGINT) AS slq,
             CAST(SUM(lp_n) AS BIGINT) AS slp
      FROM panel0 GROUP BY b
    ),
    panel AS (
      SELECT p.b, p.m,
             {_mq('(p.lq_n - CAST(bm.slq AS DOUBLE) / bm.n)'
                  f' / CAST({NANO} AS DOUBLE)')} AS dlq,
             {_mq('(p.lp_n - CAST(bm.slp AS DOUBLE) / bm.n)'
                  f' / CAST({NANO} AS DOUBLE)')} AS dlp
      FROM panel0 p JOIN bmeans bm ON bm.b = p.b
    )"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form) -----------------------------------------------------------------------
#
# `cells` (the lineitem x part corpus aggregate) is referenced by top5
# AND panel0, panel0 by bmeans AND panel, and the xmom pair join
# references panel twice (q844's symmetry join twice more) — Catalyst
# inlining compounded to ~8 corpus passes per query (92 Exchanges in
# q842's before plan). Materialize the <= 5-brand x month panel once
# per query (P3 pattern, guide §2.4).

_PANEL_VIEW = "crossprice_panel_mv"
_PANEL_MV_CTE = f"""panel AS (
      SELECT b, m, dlq, dlp FROM {_PANEL_VIEW}
    )"""


def _panel_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE corpus pass -> checkpointed demeaned monthly panel."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_panel_cte()} SELECT b, m, dlq, dlp FROM panel")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_PANEL_VIEW)


def _matrix_cte(staged: bool = False) -> str:
    """All 25 ordered-pair OLS slopes over common months."""
    return f"""{_PANEL_MV_CTE if staged else _panel_cte()},
    xmom AS (
      SELECT a.b AS qb, c.b AS pb,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a.dlq) AS BIGINT) AS sy,
             CAST(SUM(c.dlp) AS BIGINT) AS sx,
             CAST(SUM(a.dlq * c.dlp) AS BIGINT) AS sxy,
             CAST(SUM(c.dlp * c.dlp) AS BIGINT) AS sxx
      FROM panel a JOIN panel c ON c.m = a.m
      GROUP BY a.b, c.b
    ),
    slopes AS (
      SELECT qb, pb, n,
             (CAST(n AS DOUBLE) * sxy - CAST(sy AS DOUBLE) * sx)
               / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
               AS slope
      FROM xmom
    )"""


# ---------------------------------------------------------------------------
# q841 — the panel

_Q841_SQL = f"""
    WITH {_panel_cte()}
    SELECT b AS brand, m AS month_idx,
           CAST(dlq AS DOUBLE) / {MICRO} AS demeaned_log_qty,
           CAST(dlp AS DOUBLE) / {MICRO} AS demeaned_log_price
    FROM panel
    ORDER BY b, m
    """


@query("q841_price_qty_panel", oracle=_Q841_SQL)
def q841_price_qty_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The top-5 brand monthly demand panel: within-brand demeaned
    log quantity and log average unit price (nano-quantized at every
    stage), the input to the elasticity matrix."""
    _views(spark, sf_dir)
    return spark.sql(_Q841_SQL)


# ---------------------------------------------------------------------------
# q842 — the elasticity matrix

def _q842_sql(staged: bool = False) -> str:
    return f"""
    WITH {_matrix_cte(staged)}
    SELECT qb AS quantity_brand, pb AS price_brand, n AS n_months,
           slope AS elasticity,
           CASE WHEN qb = pb THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS is_own
    FROM slopes
    ORDER BY qb, pb
    """


_Q842_SQL = _q842_sql()


@query("q842_elasticity_matrix", oracle=_Q842_SQL)
def q842_elasticity_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 5x5 demand matrix: OLS slope of each brand's demeaned log
    quantity on each brand's demeaned log price over common months —
    own-price on the diagonal, cross-price off it. Micro-quantized
    demeaned values keep every moment product under 2^53 (exact
    BIGINT sums — the q804 lesson)."""
    _panel_view(spark, sf_dir)
    return spark.sql(_q842_sql(staged=True))


# ---------------------------------------------------------------------------
# q843 — substitution census

def _q843_sql(staged: bool = False) -> str:
    return f"""
    WITH {_matrix_cte(staged)}
    SELECT CASE WHEN slope > CAST({SUB_THRESHOLD} AS DOUBLE)
                THEN 'substitute'
                WHEN slope < -CAST({SUB_THRESHOLD} AS DOUBLE)
                THEN 'complement'
                ELSE 'neutral' END AS relation,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CAST(FLOOR(slope * 1000000 + 0.5) AS BIGINT))
                AS DOUBLE) / 1000000 / COUNT(*) AS mean_elasticity
    FROM slopes
    WHERE qb <> pb
    GROUP BY CASE WHEN slope > CAST({SUB_THRESHOLD} AS DOUBLE)
                THEN 'substitute'
                WHEN slope < -CAST({SUB_THRESHOLD} AS DOUBLE)
                THEN 'complement'
                ELSE 'neutral' END
    ORDER BY relation
    """


_Q843_SQL = _q843_sql()


@query("q843_substitution_census", oracle=_Q843_SQL)
def q843_substitution_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 off-diagonal cells classified substitute / complement /
    neutral at the +-0.1 threshold, with micro-quantized mean
    elasticity per class (order-free sums)."""
    _panel_view(spark, sf_dir)
    return spark.sql(_q843_sql(staged=True))


# ---------------------------------------------------------------------------
# q844 — symmetry audit

def _q844_sql(staged: bool = False) -> str:
    return f"""
    WITH {_matrix_cte(staged)}
    SELECT a.qb AS brand_a, a.pb AS brand_b,
           a.slope AS slope_ab,
           z.slope AS slope_ba,
           ABS(a.slope - z.slope) AS abs_asymmetry,
           CASE WHEN SIGN(a.slope) = SIGN(z.slope) THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS same_sign
    FROM slopes a JOIN slopes z ON z.qb = a.pb AND z.pb = a.qb
    WHERE a.qb < a.pb
    ORDER BY a.qb, a.pb
    """


_Q844_SQL = _q844_sql()


@query("q844_slutsky_symmetry", oracle=_Q844_SQL)
def q844_slutsky_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-effect symmetry: slope(A on B's price) beside slope(B on
    A's price) per unordered pair — Slutsky symmetry says compensated
    effects match; the asymmetry column measures how far these
    uncompensated estimates drift."""
    _panel_view(spark, sf_dir)
    return spark.sql(_q844_sql(staged=True))


# ---------------------------------------------------------------------------
# q845 — Lerner markup table

def _q845_sql(staged: bool = False) -> str:
    return f"""
    WITH {_matrix_cte(staged)}
    SELECT qb AS brand,
           slope AS own_elasticity,
           CASE WHEN ABS(slope) > 1
                THEN CAST(1 AS DOUBLE) / ABS(slope)
                ELSE CAST(NULL AS DOUBLE) END AS lerner_markup,
           CASE WHEN ABS(slope) <= 1 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS inelastic_flag
    FROM slopes
    WHERE qb = pb
    ORDER BY qb
    """


_Q845_SQL = _q845_sql()


@query("q845_lerner_markup", oracle=_Q845_SQL)
def q845_lerner_markup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inverse-elasticity pricing rule per brand: Lerner index
    1/|e| where demand is elastic, NULL with an explicit flag where
    |e| <= 1 (the monopoly rule has no interior solution there —
    surfaced, not hidden)."""
    _panel_view(spark, sf_dir)
    return spark.sql(_q845_sql(staged=True))
