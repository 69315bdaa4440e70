"""Synthetic-control batch 109 (q611-q615) — the comparative case
study estimator (Abadie-style) re-expressed as an EXACT grid argmin,
the q356 grid-search family applied to causal inference: EUROPE is
"treated" at 1999-Q1 and a synthetic EUROPE is built from the other
four regions' quarterly revenue with simplex weights in tenths
(w1+w2+w3+w4 = 10, 286 grid rows). All pre-period algebra is exact:
revenue is integer cents on a DENSE quarter spine (COALESCE 0), the
synthetic series is sum(w_d * x_d) (integer, 10x scale), residuals
are 10*y - synth (integer), SSEs accumulate in DECIMAL(38,0), and
every reported gap divides an exact BIGINT sum ONCE at the end. The
best weight vector is a TakeOrdered LIMIT 1 on (sse, w1, w2, w3) —
no global window; donor slots come from a 4-row triangle join, not
a rank window.

- q611 fit: argmin weights + pre-period SSE/RMSE;
- q612 effect: per post-period year, average treated-minus-synthetic
  gap in dollars;
- q613 placebo tests: the same fit with EACH region pseudo-treated
  (5 grid argmins in one plan, rank windows partitioned by unit) —
  is the true unit's gap extreme among placebos?;
- q614 pre-trend match: per pre-period year actual-vs-synthetic gap;
- q615 donor importance: leave-one-donor-out refits (grid filtered
  to that donor's weight = 0) and the SSE inflation of removal.

100 TB shape: one aggregate collapses orders to (region x quarter)
cents; spine/grid joins run on bounded tables (5 regions x ~27
quarters x 286 grid rows); argmins are TakeOrdered or per-unit
partitioned ranks. The corpus is scanned exactly once per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TREATED = "EUROPE"
TREAT_QIDX = 1999 * 4  # quarters with qidx >= this are post-period

# simplex grid: w1+w2+w3+w4 = 10, step 0.1 (stored as integer tenths)
_GRID = [
    (w1, w2, w3, 10 - w1 - w2 - w3)
    for w1 in range(11)
    for w2 in range(11 - w1)
    for w3 in range(11 - w1 - w2)
]
assert len(_GRID) == 286


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("orders", "customer", "nation", "region"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _grid_values() -> str:
    return ", ".join(
        f"({i}, {a}, {b}, {c}, {d})" for i, (a, b, c, d) in enumerate(_GRID)
    )


def _spine_views(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 135-row dense (region x quarter) spine ONCE per
    query (localCheckpoint -> temp view): every CTE reference to
    `dense`/`regions`/`quarters` otherwise re-expands the 4-table
    corpus aggregate under CTE inlining (q613 re-ran it ~6x — the P3
    pattern, guide §2.4). The ORACLE keeps the original single-statement
    text; only the Spark-side plan is staged."""
    _views(spark, sf_dir)
    dense = spark.sql(
        f"WITH {_series_cte()} SELECT region, qidx, cents FROM dense"
    ).localCheckpoint(eager=True)
    dense.createOrReplaceTempView("sc_dense")


# Spark-side replacement for _series_cte(): the same three CTE names,
# each a bounded scan of the materialized spine.
_SPINE_CTE = """rev AS (
      SELECT region, qidx, cents FROM sc_dense
    ),
    quarters AS (SELECT DISTINCT qidx FROM sc_dense),
    regions AS (SELECT DISTINCT region FROM sc_dense),
    dense AS (
      SELECT region, qidx, cents FROM sc_dense
    )"""


def _series_cte() -> str:
    """Dense (region x quarter) revenue cents; qidx = year*4 + (q-1)."""
    return """rev AS (
      SELECT r.r_name AS region,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) * 4
                  + EXTRACT(QUARTER FROM o.o_orderdate) - 1 AS BIGINT) AS qidx,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      GROUP BY r.r_name,
               EXTRACT(YEAR FROM o.o_orderdate) * 4
               + EXTRACT(QUARTER FROM o.o_orderdate) - 1
    ),
    quarters AS (SELECT DISTINCT qidx FROM rev),
    regions AS (SELECT DISTINCT region FROM rev),
    dense AS (
      SELECT /*+ BROADCAST(q) */ g.region, q.qidx, COALESCE(r.cents, 0) AS cents
      FROM regions g CROSS JOIN quarters q
      LEFT JOIN rev r ON r.region = g.region AND r.qidx = q.qidx
    )"""


def _fit_ctes(series: str | None = None) -> str:
    """Grid SSE over the pre-period + LIMIT-1 argmin for the fixed
    treated unit. Donor slots via a bounded triangle join (no
    window)."""
    return f"""{series or _series_cte()},
    grid(gid, w1, w2, w3, w4) AS (VALUES {_grid_values()}),
    donors AS (
      SELECT /*+ BROADCAST(b) */ a.region, CAST(COUNT(*) AS BIGINT) AS slot
      FROM regions a JOIN regions b
        ON b.region <= a.region AND b.region <> '{TREATED}'
      WHERE a.region <> '{TREATED}'
      GROUP BY a.region
    ),
    synth AS (
      SELECT /*+ BROADCAST(g) */ g.gid, d0.qidx,
             CAST(SUM(CASE dn.slot WHEN 1 THEN g.w1 WHEN 2 THEN g.w2
                                   WHEN 3 THEN g.w3 ELSE g.w4 END * d0.cents)
                  AS BIGINT) AS synth10
      FROM dense d0
      JOIN donors dn ON dn.region = d0.region
      CROSS JOIN grid g
      GROUP BY g.gid, d0.qidx
    ),
    treated AS (
      SELECT qidx, cents FROM dense WHERE region = '{TREATED}'
    ),
    sse AS (
      SELECT s.gid,
             SUM(CAST(10 * t.cents - s.synth10 AS DECIMAL(19,0))
                 * CAST(10 * t.cents - s.synth10 AS DECIMAL(19,0))) AS pre_sse
      FROM synth s JOIN treated t ON t.qidx = s.qidx
      WHERE s.qidx < {TREAT_QIDX}
      GROUP BY s.gid
    ),
    best AS (
      SELECT e.gid, e.pre_sse, g.w1, g.w2, g.w3, g.w4
      FROM sse e JOIN grid g ON g.gid = e.gid
      ORDER BY e.pre_sse, g.w1, g.w2, g.w3
      LIMIT 1
    )"""


# ---------------------------------------------------------------------------
# q611 — fit

def _fit_sql(series: str | None = None) -> str:
    return f"""
    WITH {_fit_ctes(series)},
    npre AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM quarters WHERE qidx < {TREAT_QIDX}
    )
    SELECT /*+ BROADCAST(npre) */ b.w1, b.w2, b.w3, b.w4,
           CAST(b.pre_sse AS DOUBLE) AS pre_sse_scaled,
           -- RMSE in dollars: sqrt(sse / n) / (10 scale * 100 cents)
           ROUND(sqrt(CAST(b.pre_sse AS DOUBLE) / npre.n) / 1000.0, 2)
             AS pre_rmse_dollars
    FROM best b CROSS JOIN npre
    """


@query("q611_synthetic_control_fit", oracle=_fit_sql())
def q611_synthetic_control_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic-control fit: simplex weights (integer tenths)
    over the four donor regions minimizing exact pre-period SSE
    (DECIMAL(38,0)), argmin as TakeOrdered with a full weight
    tie-break. sqrt is the single terminal transcendental on an
    identical double."""
    _spine_views(spark, sf_dir)
    return spark.sql(_fit_sql(_SPINE_CTE))


# ---------------------------------------------------------------------------
# q612 — post-period effect


def _effect_sql(dialect: str, series: str | None = None) -> str:
    yr = "(t.qidx div 4)" if dialect == "spark" else "(t.qidx // 4)"
    return f"""
    WITH {_fit_ctes(series)},
    bsynth AS (
      SELECT s.qidx, s.synth10 FROM synth s JOIN best b ON b.gid = s.gid
    )
    SELECT CAST({yr} AS BIGINT) AS year,
           CAST(COUNT(*) AS BIGINT) AS n_quarters,
           -- exact BIGINT gap sum, ONE terminal division
           ROUND(CAST(SUM(10 * t.cents - s.synth10) AS DOUBLE)
                 / (1000.0 * COUNT(*)), 2) AS avg_gap_dollars
    FROM treated t JOIN bsynth s ON s.qidx = t.qidx
    WHERE t.qidx >= {TREAT_QIDX}
    GROUP BY {yr}
    ORDER BY year
    """


@query("q612_synthetic_control_effect", oracle=_effect_sql("duck"))
def q612_synthetic_control_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimated treatment effect: per post-period year, the
    average treated-minus-synthetic revenue gap in dollars (exact
    BIGINT gap sums, one terminal division). The best-weight
    synthetic series is re-derived by the same TakeOrdered argmin."""
    _spine_views(spark, sf_dir)
    return spark.sql(_effect_sql("spark", _SPINE_CTE))


# ---------------------------------------------------------------------------
# q613 — placebo tests

def _placebo_sql(series: str | None = None) -> str:
    return f"""
    WITH {series or _series_cte()},
    grid(gid, w1, w2, w3, w4) AS (VALUES {_grid_values()}),
    units AS (SELECT region AS treated_u FROM regions),
    donors AS (
      SELECT /*+ BROADCAST(u), BROADCAST(b) */
             u.treated_u, a.region, CAST(COUNT(*) AS BIGINT) AS slot
      FROM units u
      JOIN regions a ON a.region <> u.treated_u
      JOIN regions b ON b.region <= a.region AND b.region <> u.treated_u
      GROUP BY u.treated_u, a.region
    ),
    synth AS (
      SELECT /*+ BROADCAST(g) */ dn.treated_u, g.gid, d0.qidx,
             CAST(SUM(CASE dn.slot WHEN 1 THEN g.w1 WHEN 2 THEN g.w2
                                   WHEN 3 THEN g.w3 ELSE g.w4 END * d0.cents)
                  AS BIGINT) AS synth10
      FROM dense d0
      JOIN donors dn ON dn.region = d0.region
      CROSS JOIN grid g
      GROUP BY dn.treated_u, g.gid, d0.qidx
    ),
    sse AS (
      SELECT s.treated_u, s.gid,
             SUM(CAST(10 * t.cents - s.synth10 AS DECIMAL(19,0))
                 * CAST(10 * t.cents - s.synth10 AS DECIMAL(19,0))) AS pre_sse
      FROM synth s
      JOIN dense t ON t.region = s.treated_u AND t.qidx = s.qidx
      WHERE s.qidx < {TREAT_QIDX}
      GROUP BY s.treated_u, s.gid
    ),
    best AS (
      SELECT treated_u, gid FROM (
        SELECT e.treated_u, e.gid,
               ROW_NUMBER() OVER (PARTITION BY e.treated_u
                                  ORDER BY e.pre_sse, g.w1, g.w2, g.w3) AS rn
        FROM sse e JOIN grid g ON g.gid = e.gid
      ) r WHERE rn = 1
    )
    SELECT s.treated_u AS unit,
           ROUND(CAST(SUM(10 * t.cents - s.synth10) AS DOUBLE)
                 / (1000.0 * COUNT(*)), 2) AS mean_gap_dollars,
           ROUND(CAST(SUM(ABS(10 * t.cents - s.synth10)) AS DOUBLE)
                 / (1000.0 * COUNT(*)), 2) AS mean_abs_gap_dollars,
           CAST(CASE WHEN s.treated_u = '{TREATED}' THEN 1 ELSE 0 END
                AS BIGINT) AS is_true_treated
    FROM synth s
    JOIN best b ON b.treated_u = s.treated_u AND b.gid = s.gid
    JOIN dense t ON t.region = s.treated_u AND t.qidx = s.qidx
    WHERE s.qidx >= {TREAT_QIDX}
    GROUP BY s.treated_u
    ORDER BY mean_abs_gap_dollars DESC, unit
    """


@query("q613_placebo_tests", oracle=_placebo_sql())
def q613_placebo_tests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Placebo inference: the full fit-and-gap pipeline run with every
    region as pseudo-treated (5 independent 286-point grid argmins in
    ONE plan — the per-unit rank window partitions by unit). If the
    true unit's post-period |gap| is not extreme among placebos, the
    'effect' is noise. All exact until the terminal division."""
    _spine_views(spark, sf_dir)
    return spark.sql(_placebo_sql(_SPINE_CTE))


# ---------------------------------------------------------------------------
# q614 — pre-trend match


def _pretrend_sql(dialect: str, series: str | None = None) -> str:
    yr = "(t.qidx div 4)" if dialect == "spark" else "(t.qidx // 4)"
    return f"""
    WITH {_fit_ctes(series)},
    bsynth AS (
      SELECT s.qidx, s.synth10 FROM synth s JOIN best b ON b.gid = s.gid
    )
    SELECT CAST({yr} AS BIGINT) AS year,
           CAST(COUNT(*) AS BIGINT) AS n_quarters,
           ROUND(CAST(SUM(10 * t.cents - s.synth10) AS DOUBLE)
                 / (1000.0 * COUNT(*)), 2) AS avg_gap_dollars,
           ROUND(CAST(SUM(ABS(10 * t.cents - s.synth10)) AS DOUBLE)
                 / (1000.0 * COUNT(*)), 2) AS avg_abs_gap_dollars
    FROM treated t JOIN bsynth s ON s.qidx = t.qidx
    WHERE t.qidx < {TREAT_QIDX}
    GROUP BY {yr}
    ORDER BY year
    """


@query("q614_pretrend_match", oracle=_pretrend_sql("duck"))
def q614_pretrend_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit diagnostics: the per-year actual-vs-synthetic gap over the
    PRE-period — the table that justifies (or indicts) the synthetic
    control before anyone reads the effect. Exact BIGINT gap sums,
    one terminal division per cell."""
    _spine_views(spark, sf_dir)
    return spark.sql(_pretrend_sql("spark", _SPINE_CTE))


# ---------------------------------------------------------------------------
# q615 — donor importance (leave-one-donor-out)

def _lodo_sql(series: str | None = None) -> str:
    return f"""
    WITH {_fit_ctes(series)},
    lodo AS (
      SELECT /*+ BROADCAST(e) */ e.excl_region, MIN(s.pre_sse) AS best_restricted_sse
      FROM sse s
      JOIN grid g ON g.gid = s.gid
      CROSS JOIN (SELECT dn.slot AS excl_slot, dn.region AS excl_region
                  FROM donors dn) e
      WHERE CASE e.excl_slot WHEN 1 THEN g.w1 WHEN 2 THEN g.w2
                             WHEN 3 THEN g.w3 ELSE g.w4 END = 0
      GROUP BY e.excl_region
    )
    SELECT /*+ BROADCAST(b) */ l.excl_region AS dropped_donor,
           CAST(CASE dn.slot WHEN 1 THEN b.w1 WHEN 2 THEN b.w2
                             WHEN 3 THEN b.w3 ELSE b.w4 END AS BIGINT)
             AS weight_tenths_in_full_fit,
           ROUND(CAST(l.best_restricted_sse AS DOUBLE)
                 / CAST(b.pre_sse AS DOUBLE), 6) AS sse_inflation
    FROM lodo l
    JOIN donors dn ON dn.region = l.excl_region
    CROSS JOIN best b
    ORDER BY sse_inflation DESC, dropped_donor
    """


@query("q615_donor_importance", oracle=_lodo_sql())
def q615_donor_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-donor-out: refit with each donor's weight pinned to 0
    (a FILTER of the same grid — no new search space) and report the
    SSE inflation its removal causes, next to the donor's weight in
    the full fit. Inflation 1.0 = the donor never mattered."""
    _spine_views(spark, sf_dir)
    return spark.sql(_lodo_sql(_SPINE_CTE))
