"""Aggregation-paradox batch 143 (q781-q785) — the guardrail audits
an analytics platform runs before anyone trusts a pooled number:
Simpson reversals, weighting reversals, ecological inflation,
Berkson selection, and mix-shift decomposition, each computed with
exact integer moments so "the sign flipped" is never a float
artifact.

- q781 Simpson screen: the size->log-unit-price association pooled
  vs within brands — pooled slope, within (FE) slope, and the census
  of brands whose own slope disagrees in sign with the pooled one;
- q782 weighting reversal: brand mean unit price line-weighted vs
  quantity-weighted, with the exact Kendall distance between the two
  brand rankings (integer cross-multiplied sign tests, never a float
  compare);
- q783 ecological inflation: the row-level correlation of
  (size, log unit price) beside the brand-aggregate-level
  correlation of the same pair — the ecological-fallacy
  amplification ratio;
- q784 Berkson selection: cov(quantity, discount) overall vs inside
  the selected stratum qty + disc >= 40 — conditioning on a sum
  manufactures negative dependence between independent variables
  (test-asserted);
- q785 mix-shift decomposition: the change in overall mean unit
  price between the first and second half of the shipping window
  split EXACTLY into within-brand price change and brand-mix change
  (Oaxaca-style counterfactual middle term).

100 TB shape: every query is one or two fact passes into bounded
(brand / stratum) aggregates; q782's ranking distance is a 300-pair
join over the 25-row brand table; nothing windows or pairs the fact
table.

Determinism: money in integer micro-cents, logs nano-quantized with
FLOOR (q761 lesson), all moment sums exact integers/DECIMAL(38,0),
Kendall sign tests cross-multiplied in BIGINT (no division), and
terminal slopes/correlations straight-line doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

NANO = "1000000000"
BERKSON_CUT = 40


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _nq(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * {NANO} + 0.5) AS BIGINT)"


def _rows_cte() -> str:
    return f"""rows0 AS (
      SELECT p.p_brand AS brand,
             CAST(p.p_size AS BIGINT) AS x,
             CAST(l.l_quantity AS BIGINT) AS qty,
             CAST(FLOOR(l.l_discount * 100 + 0.5) AS BIGINT) AS disc,
             l.l_shipdate AS sd,
             CAST(FLOOR(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                  * CAST(10000 AS DOUBLE) / CAST(l.l_quantity AS BIGINT)
                  + 0.5) AS BIGINT) AS unit_mc,
             {_nq('LN(CAST(FLOOR(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) '
                  'AS BIGINT) * CAST(10000 AS DOUBLE) '
                  '/ CAST(l.l_quantity AS BIGINT) + 0.5) AS BIGINT))')} AS yn
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0
    )"""


# ---------------------------------------------------------------------------
# q781 — Simpson screen

_Q781_SQL = f"""
    WITH {_rows_cte()},
    bcells AS (
      SELECT brand,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yn) AS BIGINT) AS syn,
             CAST(SUM(x) AS BIGINT) AS sx
      FROM rows0 GROUP BY brand
    ),
    dm AS (
      SELECT r.brand,
             {_nq('(r.yn / CAST(1000000000 AS DOUBLE)'
                  ' - CAST(c.syn AS DOUBLE) / 1000000000 / c.n)'
                  ' * (r.x - CAST(c.sx AS DOUBLE) / c.n)')} AS xy,
             {_nq('(r.x - CAST(c.sx AS DOUBLE) / c.n)'
                  ' * (r.x - CAST(c.sx AS DOUBLE) / c.n)')} AS xx
      FROM rows0 r JOIN bcells c ON c.brand = r.brand
    ),
    slopes AS (
      SELECT brand,
             CAST(SUM(xy) AS BIGINT) AS sxy,
             CAST(SUM(xx) AS BIGINT) AS sxx
      FROM dm GROUP BY brand
    ),
    fe AS (
      SELECT CAST(SUM(sxy) AS DOUBLE) / CAST(SUM(sxx) AS DOUBLE) AS b_fe
      FROM slopes
    ),
    pooled AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(yn) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM rows0
    ),
    pslope AS (
      SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * sy)
               / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                  * 1000000000) AS b
      FROM pooled
    )
    SELECT p.b AS pooled_slope,
           f.b_fe AS within_fe_slope,
           CAST(SUM(CASE WHEN SIGN(CAST(s.sxy AS DOUBLE)) * SIGN(p.b) < 0
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS brands_sign_opposed,
           CAST(COUNT(*) AS BIGINT) AS n_brands,
           CASE WHEN SIGN(p.b) * SIGN(f.b_fe) < 0 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS simpson_reversal
    FROM slopes s CROSS JOIN pslope p CROSS JOIN fe f
    GROUP BY p.b, f.b_fe
    """


@query("q781_simpson_screen", oracle=_Q781_SQL)
def q781_simpson_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does pooling reverse the size-price association? Pooled OLS
    slope vs the per-brand-weighted within slope, the count of brands
    whose own slope opposes the pooled sign, and the reversal flag.
    All moments exact; slopes terminal doubles."""
    _views(spark, sf_dir)
    return spark.sql(_Q781_SQL)


# ---------------------------------------------------------------------------
# q782 — weighting reversal

_Q782_SQL = f"""
    WITH {_rows_cte()},
    means AS (
      SELECT brand,
             CAST(SUM(unit_mc) AS BIGINT) AS s_line,
             CAST(COUNT(*) AS BIGINT) AS n_line,
             CAST(SUM(qty * unit_mc) AS BIGINT) AS s_qty,
             CAST(SUM(qty) AS BIGINT) AS n_qty
      FROM rows0 GROUP BY brand
    ),
    pairs AS (
      SELECT /*+ BROADCAST(b) */
        CASE WHEN SIGN(CAST(a.s_line AS DECIMAL(38,0)) * b.n_line
                       - CAST(b.s_line AS DECIMAL(38,0)) * a.n_line)
                  * SIGN(CAST(a.s_qty AS DECIMAL(38,0)) * b.n_qty
                         - CAST(b.s_qty AS DECIMAL(38,0)) * a.n_qty) < 0
             THEN 1 ELSE 0 END AS discordant,
        CASE WHEN CAST(a.s_line AS DECIMAL(38,0)) * b.n_line
                    = CAST(b.s_line AS DECIMAL(38,0)) * a.n_line
               OR CAST(a.s_qty AS DECIMAL(38,0)) * b.n_qty
                    = CAST(b.s_qty AS DECIMAL(38,0)) * a.n_qty
             THEN 1 ELSE 0 END AS tied
      FROM means a JOIN means b ON a.brand < b.brand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(discordant) AS BIGINT) AS rank_flips,
           CAST(SUM(tied) AS BIGINT) AS tied_pairs,
           CAST(SUM(discordant) AS DOUBLE) / COUNT(*)
             AS normalized_kendall_distance
    FROM pairs
    """


@query("q782_weighting_reversal", oracle=_Q782_SQL)
def q782_weighting_reversal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much the brand price ranking changes when you weight by
    quantity instead of lines: exact Kendall distance between the two
    rankings via BIGINT cross-multiplied mean comparisons (s_a*n_b vs
    s_b*n_a — no division, no float)."""
    _views(spark, sf_dir)
    return spark.sql(_Q782_SQL)


# ---------------------------------------------------------------------------
# q783 — ecological inflation

_Q783_SQL = f"""
    WITH {_rows_cte()},
    row_mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(yn) AS BIGINT) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CAST(yn AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0)) AS syy
      FROM rows0
    ),
    bagg AS (
      SELECT brand,
             {_nq('CAST(SUM(x) AS DOUBLE) / COUNT(*)')} AS mxn,
             {_nq('CAST(SUM(yn) AS DOUBLE) / COUNT(*)'
                  ' / CAST(1000000000 AS DOUBLE)')} AS myn
      FROM rows0 GROUP BY brand
    ),
    agg_mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(mxn) AS BIGINT) AS sx,
             CAST(SUM(myn) AS BIGINT) AS sy,
             CAST(SUM(CAST(mxn AS DECIMAL(38,0)) * myn) AS DECIMAL(38,0))
               AS sxy,
             CAST(SUM(CAST(mxn AS DECIMAL(38,0)) * mxn) AS DECIMAL(38,0))
               AS sxx,
             CAST(SUM(CAST(myn AS DECIMAL(38,0)) * myn) AS DECIMAL(38,0))
               AS syy
      FROM bagg
    )
    SELECT
      (CAST(r.n AS DOUBLE) * CAST(r.sxy AS DOUBLE)
        - CAST(r.sx AS DOUBLE) * r.sy)
        / SQRT((CAST(r.n AS DOUBLE) * CAST(r.sxx AS DOUBLE)
                - CAST(r.sx AS DOUBLE) * r.sx)
               * (CAST(r.n AS DOUBLE) * CAST(r.syy AS DOUBLE)
                  - CAST(r.sy AS DOUBLE) * r.sy)) AS row_level_corr,
      (CAST(a.n AS DOUBLE) * CAST(a.sxy AS DOUBLE)
        - CAST(a.sx AS DOUBLE) * a.sy)
        / SQRT((CAST(a.n AS DOUBLE) * CAST(a.sxx AS DOUBLE)
                - CAST(a.sx AS DOUBLE) * a.sx)
               * (CAST(a.n AS DOUBLE) * CAST(a.syy AS DOUBLE)
                  - CAST(a.sy AS DOUBLE) * a.sy)) AS brand_level_corr
    FROM row_mom r CROSS JOIN agg_mom a
    """


@query("q783_ecological_corr", oracle=_Q783_SQL)
def q783_ecological_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same (size, log price) correlation at row level and at
    brand-aggregate level — aggregate correlations are routinely far
    larger in magnitude (the ecological fallacy); reading the second
    as the first is the audited mistake. Brand means nano-quantized
    before the 25-point moment pass."""
    _views(spark, sf_dir)
    return spark.sql(_Q783_SQL)


# ---------------------------------------------------------------------------
# q784 — Berkson selection

_Q784_SQL = f"""
    WITH {_rows_cte()},
    lab AS (
      SELECT qty, disc,
             CASE WHEN qty + disc >= {BERKSON_CUT} THEN 1 ELSE 0 END AS sel
      FROM rows0
    ),
    mom AS (
      SELECT sel,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qty) AS BIGINT) AS sx,
             CAST(SUM(disc) AS BIGINT) AS sy,
             CAST(SUM(qty * disc) AS BIGINT) AS sxy
      FROM lab GROUP BY sel
    ),
    overall AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(qty) AS BIGINT) AS sx,
             CAST(SUM(disc) AS BIGINT) AS sy,
             CAST(SUM(qty * disc) AS BIGINT) AS sxy
      FROM lab
    )
    SELECT m.sel AS selected_stratum,
           m.n AS n_rows,
           (CAST(m.n AS DOUBLE) * m.sxy - CAST(m.sx AS DOUBLE) * m.sy)
             / (CAST(m.n AS DOUBLE) * m.n) AS cov_qty_disc,
           (CAST(o.n AS DOUBLE) * o.sxy - CAST(o.sx AS DOUBLE) * o.sy)
             / (CAST(o.n AS DOUBLE) * o.n) AS cov_overall
    FROM mom m CROSS JOIN overall o
    ORDER BY m.sel
    """


@query("q784_berkson_selection", oracle=_Q784_SQL)
def q784_berkson_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Berkson's paradox made measurable: quantity and discount are
    generated independently (covariance ~0 overall), but conditioning
    on qty + disc >= {cut} manufactures NEGATIVE covariance inside the
    selected stratum (test-asserted). Exact integer moments per
    stratum.""".format(cut=BERKSON_CUT)
    _views(spark, sf_dir)
    return spark.sql(_Q784_SQL)


# ---------------------------------------------------------------------------
# q785 — mix-shift decomposition

def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _q785_sql(dialect: str) -> str:
    return f"""
    WITH {_rows_cte()},
    split0 AS (
      SELECT CAST(MIN(sd) AS DATE) AS d0, CAST(MAX(sd) AS DATE) AS d1
      FROM rows0
    ),
    lab AS (
      SELECT r.brand, r.unit_mc,
             CASE WHEN 2 * {_days(dialect, 's.d0', 'r.sd')}
                       <= {_days(dialect, 's.d0', 's.d1')}
                  THEN 0 ELSE 1 END AS half
      FROM rows0 r CROSS JOIN split0 s
    ),
    cell AS (
      SELECT brand, half,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(unit_mc) AS BIGINT) AS s
      FROM lab GROUP BY brand, half
    ),
    tot AS (
      SELECT half, CAST(SUM(n) AS BIGINT) AS nt FROM cell GROUP BY half
    ),
    wide AS (
      SELECT c.brand,
             MAX(CASE WHEN c.half = 0 THEN CAST(c.n AS DOUBLE) / t.nt END)
               AS w0,
             MAX(CASE WHEN c.half = 1 THEN CAST(c.n AS DOUBLE) / t.nt END)
               AS w1,
             MAX(CASE WHEN c.half = 0 THEN CAST(c.s AS DOUBLE) / c.n END)
               AS m0,
             MAX(CASE WHEN c.half = 1 THEN CAST(c.s AS DOUBLE) / c.n END)
               AS m1
      FROM cell c JOIN tot t ON t.half = c.half
      GROUP BY c.brand
    ),
    filled AS (
      SELECT brand,
             COALESCE(w0, CAST(0 AS DOUBLE)) AS w0,
             COALESCE(w1, CAST(0 AS DOUBLE)) AS w1,
             COALESCE(m0, COALESCE(m1, CAST(0 AS DOUBLE))) AS m0,
             COALESCE(m1, COALESCE(m0, CAST(0 AS DOUBLE))) AS m1
      FROM wide
    )
    SELECT
      (CAST(SUM(CAST(FLOOR(w1 * m1 * 1000 + 0.5) AS BIGINT)) AS DOUBLE)
        - SUM(CAST(FLOOR(w0 * m0 * 1000 + 0.5) AS BIGINT))) / 1000
        AS total_change_mc,
      CAST(SUM(CAST(FLOOR(w0 * (m1 - m0) * 1000 + 0.5) AS BIGINT))
        AS DOUBLE) / 1000 AS within_brand_change_mc,
      CAST(SUM(CAST(FLOOR((w1 - w0) * m1 * 1000 + 0.5) AS BIGINT))
        AS DOUBLE) / 1000 AS mix_shift_change_mc,
      (CAST(SUM(CAST(FLOOR(w0 * (m1 - m0) * 1000 + 0.5) AS BIGINT))
         AS DOUBLE)
        + SUM(CAST(FLOOR((w1 - w0) * m1 * 1000 + 0.5) AS BIGINT))
        - (CAST(SUM(CAST(FLOOR(w1 * m1 * 1000 + 0.5) AS BIGINT)) AS DOUBLE)
           - SUM(CAST(FLOOR(w0 * m0 * 1000 + 0.5) AS BIGINT)))) / 1000
        AS decomposition_residual
    FROM filled
    """


@query("q785_mix_shift", oracle=_q785_sql("duckdb"))
def q785_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The change in overall mean unit price between the two halves of
    the shipping window, decomposed exactly into within-brand price
    change (base-period weights) and brand-mix shift (end-period
    means): Delta = sum w0 (m1-m0) + sum (w1-w0) m1, residual 0 by
    identity (test-asserted). Missing cells carry the other half's
    mean so absent brands contribute only through the weight term."""
    _views(spark, sf_dir)
    return spark.sql(_q785_sql("spark"))
