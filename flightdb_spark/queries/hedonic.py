"""Hedonic-pricing batch 139 (q761-q765) — quality-adjusted price
measurement over parts, the method statistical agencies use for CPI
components whose goods change composition (Griliches' hedonic
regression): log unit price regressed on observable attributes, the
attribute effect stripped out, and the residual tracked over time.

- q761 the size premium: pooled within-(brand, month) OLS slope of
  log unit price on p_size (Frisch-Waugh within-cell demeaning, so
  brand and month composition can't bias the slope), plus per-brand
  slopes;
- q762 quality-adjusted monthly price index: monthly mean of
  size-adjusted then brand-adjusted log price, exponentiated against
  the base month (a SEQUENTIAL adjustment — size slope, then brand
  shift — documented as such, not joint two-way FE);
- q763 attribute premium table: size-adjusted mean log unit price by
  p_type;
- q764 variance decomposition: how much of log-price variance the
  (brand, month) cells absorb and how much the size slope explains
  within cells;
- q765 slope stability: the monthly hedonic slope series against the
  pooled slope, with its extreme deviation.

100 TB shape: one fact pass to row-level (brand, month, size, y);
cell statistics are a single (brand, month) aggregate (bounded:
25 brands x ~80 months); everything downstream joins facts back to
that broadcast-sized cell table. No windows over facts, no pair
joins anywhere.

Determinism: unit price in exact integer micro-cents
(FLOOR(cents*1e4/qty + 0.5), the q666 money contract); y is a
DETERMINISTIC SERIES log of that integer quantized to BIGINT
NANO-units via FLOOR(lnhat*1e9 + 0.5). Engine LN() is NOT used on the
load-bearing path (r8 rederivation, closing the DETERMINISM.md "LN
1-ulp class" residual): measured on the real price domain, JVM LN and
libm LN diverge by one ulp on ~0.45% of arguments while OTHER
arguments land exactly on FLOOR boundaries — correctness held only
because the two sets happened not to intersect. lnhat(p) instead
computes ln(p) = k*ln2 + 2*atanh((m-1)/(m+1)) with k = exact bit
length - 1, m = p/2^k in [1,2), and the atanh as a 10-term Horner
polynomial of repr-inlined double literals: every operation is an
IEEE-correctly-rounded +,-,*,/ with identical expression structure on
both engines, so the result is bit-identical BY CONSTRUCTION (series
truncation error < 1e-11 relative — economically indistinguishable
from true ln; tests/test_hedonic_quantizer_bound.py asserts the
cross-engine bit-equality mechanically). Every accumulated term
(demeaned products, adjusted prices) is nano-quantized the same way
and summed as exact integers; slopes, indices, and R^2 are terminal
straight-line doubles emitted unrounded.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BASE_MONTH = 1995 * 12
NANO = "1000000000"  # 1e9 exact integer literal


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _nq(expr: str) -> str:
    """Quantize a double expression to BIGINT nano-units (FLOOR, not
    ROUND — identical on both engines given identical input doubles)."""
    return f"CAST(FLOOR(({expr}) * {NANO} + 0.5) AS BIGINT)"


# Deterministic series log (the r8 rederivation — see module
# docstring): ln(p) = kk*ln2 + 2*atanh((mm-1)/(mm+1)) with kk the
# exact bit length - 1 and mm = p / 2^kk in [1, 2), so z < 1/3 and the
# truncated atanh Horner polynomial is accurate to < 1e-11 relative.
# Every constant is a repr-inlined double literal; every operation is
# an IEEE correctly-rounded +,-,*,/ evaluated op-by-op on both engines
# (no FMA fusion in either vectorized kernel or JVM codegen), so the
# value is bit-identical by construction — engine LN() never runs.
_LN2 = repr(math.log(2.0))
_ATANH_COEFS = [repr(1.0 / k) for k in (3, 5, 7, 9, 11, 13, 15, 17, 19)]


def _lnhat_expr() -> str:
    """ln-hat over columns kk (BIGINT), z, z2 (DOUBLE)."""
    horner = f"CAST({_ATANH_COEFS[-1]} AS DOUBLE)"
    for c in reversed(_ATANH_COEFS[:-1]):
        horner = f"(CAST({c} AS DOUBLE) + z2 * {horner})"
    return (
        f"CAST(kk AS DOUBLE) * CAST({_LN2} AS DOUBLE)"
        f" + CAST(2 AS DOUBLE) * z * (CAST(1 AS DOUBLE) + z2 * {horner})"
    )


def _rows_cte() -> str:
    return f"""rows0 AS (
      SELECT brand, ptype, m, x, yn,
             CAST(yn AS DOUBLE) / {NANO} AS y
      FROM (
        SELECT brand, ptype, m, x,
               {_nq(_lnhat_expr())} AS yn
        FROM (
          SELECT brand, ptype, m, x, kk, z, z * z AS z2
          FROM (
            SELECT brand, ptype, m, x, kk,
                   (mm - CAST(1 AS DOUBLE)) / (mm + CAST(1 AS DOUBLE)) AS z
            FROM (
              SELECT brand, ptype, m, x, kk,
                     CAST(up AS DOUBLE)
                       / CAST((CAST(1 AS BIGINT) << kk) AS DOUBLE) AS mm
              FROM (
                SELECT brand, ptype, m, x, up,
                       LENGTH(bin(up)) - 1 AS kk
                FROM (
                  SELECT p.p_brand AS brand,
                         p.p_type AS ptype,
                         (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
                           - {BASE_MONTH}) AS m,
                         CAST(p.p_size AS BIGINT) AS x,
                         CAST(FLOOR(
                           CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                           * CAST(10000 AS DOUBLE)
                           / CAST(l.l_quantity AS BIGINT) + 0.5) AS BIGINT)
                           AS up
                  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                  WHERE l.l_quantity > 0
                ) z0
              ) z1
            ) z2t
          ) z3
        ) z4
      ) z5
    )"""


_ROWS_VIEW = "hedonic_rows_mv"
# Spark-side replacement for _rows_cte(): a bounded scan of the
# materialized row table (see _rows_view).
_ROWS_VIEW_CTE = f"""rows0 AS (
      SELECT brand, ptype, m, x, yn, y FROM {_ROWS_VIEW}
    )"""


def _rows_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize rows0 — the lineitem x part corpus pass with the
    10-term deterministic-log polynomial — ONCE per query
    (localCheckpoint -> temp view). Under CTE inlining every
    rows0/dm/adj reference re-ran that pass (q762 expanded it ~6x;
    plans/r09/q762_hedonic_index_before.txt shows 180 Exchanges — the
    P3 pattern, guide §2.4). The ORACLE keeps the original
    single-statement text."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_rows_cte()} SELECT brand, ptype, m, x, yn, y FROM rows0"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_ROWS_VIEW)


_ADJ_VIEW = "hedonic_adj_mv"


def _adj_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the size-adjusted rows (yan = y - pooled_b * x,
    nano-quantized) once: q762/q763 reference `adj` three times each
    (per-group aggregate, grand total, re-join), and every reference
    re-expanded pooled -> dm -> rows0 even with rows0 materialized."""
    _rows_view(spark, sf_dir)
    df = spark.sql(
        f"""WITH {_pooled_cte(_ROWS_VIEW_CTE)},
    adjall AS (
      SELECT r.brand, r.ptype, r.m,
             {_nq('r.y - p.b * r.x')} AS yan
      FROM rows0 r CROSS JOIN pooled p
    )
    SELECT brand, ptype, m, yan FROM adjall"""
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_ADJ_VIEW)


def _demeaned_cte(series: str | None = None) -> str:
    """Within-(brand, month) demeaned x and y; products in nano-units."""
    return f"""{series or _rows_cte()},
    cells AS (
      SELECT brand, m,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yn) AS BIGINT) AS syn,
             CAST(SUM(x) AS BIGINT) AS sx
      FROM rows0 GROUP BY brand, m
    ),
    dm AS (
      SELECT r.brand, r.m,
             {_nq('(r.y - CAST(c.syn AS DOUBLE) / NANOLIT / c.n)'
                  ' * (r.x - CAST(c.sx AS DOUBLE) / c.n)')} AS xy,
             {_nq('(r.x - CAST(c.sx AS DOUBLE) / c.n)'
                  ' * (r.x - CAST(c.sx AS DOUBLE) / c.n)')} AS xx,
             {_nq('(r.y - CAST(c.syn AS DOUBLE) / NANOLIT / c.n)'
                  ' * (r.y - CAST(c.syn AS DOUBLE) / NANOLIT / c.n)')} AS yy
      FROM rows0 r JOIN cells c ON c.brand = r.brand AND c.m = r.m
    )""".replace("NANOLIT", NANO)


def _pooled_cte(series: str | None = None) -> str:
    return f"""{_demeaned_cte(series)},
    pooled AS (
      SELECT CAST(SUM(xy) AS DOUBLE) / CAST(SUM(xx) AS DOUBLE) AS b
      FROM dm
    )"""


# ---------------------------------------------------------------------------
# q761 — the size premium

def _q761_sql(series: str | None = None) -> str:
    return f"""
    WITH {_demeaned_cte(series)},
    per_brand AS (
      SELECT brand,
             CAST(SUM(xy) AS BIGINT) AS sxy,
             CAST(SUM(xx) AS BIGINT) AS sxx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM dm GROUP BY brand
    ),
    tot AS (
      SELECT CAST(SUM(xy) AS BIGINT) AS sxy,
             CAST(SUM(xx) AS BIGINT) AS sxx
      FROM dm
    )
    SELECT p.brand,
           p.n AS n_lines,
           CAST(p.sxy AS DOUBLE) / p.sxx AS brand_slope,
           CAST(t.sxy AS DOUBLE) / t.sxx AS pooled_slope
    FROM per_brand p CROSS JOIN tot t
    WHERE p.sxx > 0
    ORDER BY p.brand
    """


@query("q761_size_premium", oracle=_q761_sql())
def q761_size_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hedonic size slope of log unit price, within-(brand, month)
    demeaned (Frisch-Waugh): per-brand slopes beside the pooled slope.
    Cell means are exact integer ratios; demeaned products are
    FLOOR-nano-quantized and summed as exact BIGINTs."""
    _rows_view(spark, sf_dir)
    return spark.sql(_q761_sql(_ROWS_VIEW_CTE))


# ---------------------------------------------------------------------------
# q762 — quality-adjusted price index

def _q762_sql(series: str | None = None, adj_src: str | None = None) -> str:
    if adj_src is not None:
        head = f"""
    WITH adj AS (
      SELECT brand, m, yan FROM {adj_src}
    ),
    brand_eff AS ("""
    else:
        head = f"""
    WITH {_pooled_cte(series)},
    adj AS (
      SELECT r.brand, r.m,
             {_nq('r.y - p.b * r.x')} AS yan
      FROM rows0 r CROSS JOIN pooled p
    ),
    brand_eff AS ("""
    return head + f"""
      SELECT brand,
             CAST(SUM(yan) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM adj GROUP BY brand
    ),
    grand AS (
      SELECT CAST(SUM(yan) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM adj
    ),
    adj2 AS (
      SELECT a.m,
             a.yan - {_nq('CAST(b.s AS DOUBLE) / NANOLIT / b.n'
                          ' - CAST(g.s AS DOUBLE) / NANOLIT / g.n')} AS yqn
      FROM adj a
      JOIN brand_eff b ON b.brand = a.brand
      CROSS JOIN grand g
    ),
    monthly AS (
      SELECT m,
             CAST(SUM(yqn) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM adj2 GROUP BY m
    ),
    base AS (
      SELECT CAST(s AS DOUBLE) / {NANO} / n AS mu0
      FROM monthly ORDER BY m ASC LIMIT 1
    )
    SELECT mo.m AS month_idx, mo.n AS n_lines,
           CAST(mo.s AS DOUBLE) / {NANO} / mo.n AS mean_adj_log_price,
           0.0 + ROUND(EXP(CAST(mo.s AS DOUBLE) / {NANO} / mo.n - b.mu0), 9)
             AS hedonic_index
    FROM monthly mo CROSS JOIN base b
    ORDER BY mo.m
    """.replace("NANOLIT", NANO)


@query("q762_hedonic_index", oracle=_q762_sql())
def q762_hedonic_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-adjusted monthly price index: log unit price minus the
    pooled size effect, minus the brand shift (sequential adjustment,
    all in exact nano-units), averaged per month and exponentiated
    against the first month. Composition changes in size and brand no
    longer move the index."""
    _adj_view(spark, sf_dir)
    return spark.sql(_q762_sql(adj_src=_ADJ_VIEW))


# ---------------------------------------------------------------------------
# q763 — attribute premium by type

def _q763_sql(series: str | None = None, adj_src: str | None = None) -> str:
    if adj_src is not None:
        head = f"""
    WITH adj AS (
      SELECT ptype, yan FROM {adj_src}
    ),
    per_type AS ("""
    else:
        head = f"""
    WITH {_pooled_cte(series)},
    adj AS (
      SELECT r.ptype,
             {_nq('r.y - p.b * r.x')} AS yan
      FROM rows0 r CROSS JOIN pooled p
    ),
    per_type AS ("""
    return head + f"""
      SELECT ptype,
             CAST(SUM(yan) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM adj GROUP BY ptype
    ),
    grand AS (
      SELECT CAST(SUM(yan) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM adj
    )
    SELECT t.ptype,
           t.n AS n_lines,
           CAST(t.s AS DOUBLE) / {NANO} / t.n AS mean_adj_log_price,
           CAST(t.s AS DOUBLE) / {NANO} / t.n
             - CAST(g.s AS DOUBLE) / {NANO} / g.n AS premium_log,
           0.0 + ROUND(EXP(CAST(t.s AS DOUBLE) / {NANO} / t.n
               - CAST(g.s AS DOUBLE) / {NANO} / g.n) - 1, 9) AS premium_pct
    FROM per_type t CROSS JOIN grand g
    ORDER BY t.ptype
    """


@query("q763_type_premium", oracle=_q763_sql())
def q763_type_premium(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-adjusted price premium by part type: mean adjusted log
    price per type against the grand mean, in log points and percent.
    One aggregate over the nano-quantized adjusted rows."""
    _adj_view(spark, sf_dir)
    return spark.sql(_q763_sql(adj_src=_ADJ_VIEW))


# ---------------------------------------------------------------------------
# q764 — variance decomposition

def _q764_sql(series: str | None = None) -> str:
    return f"""
    WITH {_demeaned_cte(series)},
    within AS (
      SELECT CAST(SUM(xy) AS BIGINT) AS sxy,
             CAST(SUM(xx) AS BIGINT) AS sxx,
             CAST(SUM(yy) AS BIGINT) AS syy,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM dm
    ),
    total AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(yn) AS BIGINT) AS s1n,
             CAST(SUM({_nq('y * y')}) AS BIGINT) AS s2n
      FROM rows0
    )
    SELECT t.n AS n_lines,
           CAST(t.s2n AS DOUBLE) / {NANO}
             - (CAST(t.s1n AS DOUBLE) / {NANO})
               * (CAST(t.s1n AS DOUBLE) / {NANO}) / t.n AS ss_total,
           CAST(w.syy AS DOUBLE) / {NANO} AS ss_within_cells,
           (CAST(t.s2n AS DOUBLE) / {NANO}
             - (CAST(t.s1n AS DOUBLE) / {NANO})
               * (CAST(t.s1n AS DOUBLE) / {NANO}) / t.n)
             - CAST(w.syy AS DOUBLE) / {NANO} AS ss_between_cells,
           1 - (CAST(w.syy AS DOUBLE) / {NANO})
             / (CAST(t.s2n AS DOUBLE) / {NANO}
                - (CAST(t.s1n AS DOUBLE) / {NANO})
                  * (CAST(t.s1n AS DOUBLE) / {NANO}) / t.n) AS cell_r2,
           (CAST(w.sxy AS DOUBLE) * w.sxy / w.sxx) / w.syy AS within_size_r2
    FROM within w CROSS JOIN total t
    """


@query("q764_variance_decomposition", oracle=_q764_sql())
def q764_variance_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where log unit-price variance lives: between (brand, month)
    cells vs within, and how much of the within part the size slope
    explains (b^2 Sxx / Syy). Sum-of-squares identities over the same
    nano-quantized terms the slope uses, so the shares are internally
    consistent."""
    _rows_view(spark, sf_dir)
    return spark.sql(_q764_sql(_ROWS_VIEW_CTE))


# ---------------------------------------------------------------------------
# q765 — monthly slope stability

def _q765_sql(series: str | None = None) -> str:
    return f"""
    WITH {_demeaned_cte(series)},
    per_month AS (
      SELECT m,
             CAST(SUM(xy) AS BIGINT) AS sxy,
             CAST(SUM(xx) AS BIGINT) AS sxx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM dm GROUP BY m
    ),
    tot AS (
      SELECT CAST(SUM(xy) AS BIGINT) AS sxy,
             CAST(SUM(xx) AS BIGINT) AS sxx
      FROM dm
    )
    SELECT pm.m AS month_idx,
           pm.n AS n_lines,
           CAST(pm.sxy AS DOUBLE) / pm.sxx AS month_slope,
           CAST(t.sxy AS DOUBLE) / t.sxx AS pooled_slope,
           ABS(CAST(pm.sxy AS DOUBLE) / pm.sxx
               - CAST(t.sxy AS DOUBLE) / t.sxx) AS abs_deviation
    FROM per_month pm CROSS JOIN tot t
    WHERE pm.sxx > 0
    ORDER BY pm.m
    """


@query("q765_slope_stability", oracle=_q765_sql())
def q765_slope_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hedonic slope re-estimated per month against the pooled
    slope — the drift diagnostic that says whether one quality
    adjustment can serve the whole window. Bounded by months; exact
    integer sums throughout."""
    _rows_view(spark, sf_dir)
    return spark.sql(_q765_sql(_ROWS_VIEW_CTE))
