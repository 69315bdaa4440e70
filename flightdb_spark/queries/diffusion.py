"""Bass-diffusion batch 142 (q776-q780) — new-product adoption
modeling over the customer base (Bass 1969): a customer "adopts" at
their first order month, and the monthly adoption hazard mixes
innovation (p, external influence) with imitation (q, proportional
to installed base A/M):

    n(t) = (p + q * A(t-1)/M) * (M - A(t-1))

- q776 the adoption curve: monthly new adopters, installed base,
  penetration;
- q777 the (p, q) grid fit: one-step-ahead SSE minimized over a
  deterministic 10x10 rational grid (the synthcontrol grid-argmin
  idiom — EXACT integer SSE numerators, no float accumulation,
  total-order tie-break);
- q778 residual diagnostics for the best fit: observed vs predicted
  per month with exact-rational predictions;
- q779 peak timing: observed peak adoption month vs the Bass-implied
  t* = ln(q/p)/(p+q) and peak magnitude M(p+q)^2/(4q);
- q780 innovation-vs-imitation decomposition: each month's predicted
  adopters split into the p-driven and q-driven parts (exact
  rational shares).

100 TB shape: ONE pass reduces orders to first-order months (a
customer-keyed MIN aggregate), then everything runs on the ~80-row
monthly curve: the installed base is a bounded month<=month
inequality join (never a corpus window), and the grid fit crosses
the 80-row curve with a 100-row constant grid (broadcast). The fit
is embarrassingly parallel in grid cells.

Determinism: adopters and installed base are exact integers; the
grid is rational (p = i/1000, q = j/100), so each prediction is the
integer ratio (i*M + 10*j*A)(M - A) / (1000*M) and each squared
one-step error has the exact integer numerator (1000*M*n_t - num)^2
accumulated in DECIMAL(38,0); the argmin orders by (sse, p_idx,
q_idx) — total. Terminal doubles only at display; ln for t* is
display-rounded (q762 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

BASE_MONTH = 1995 * 12
P_IDX = list(range(1, 11))  # p = i/1000: 0.001 .. 0.010
Q_IDX = list(range(1, 11))  # q = j/100:  0.01 .. 0.10


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("orders", "customer"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _curve_cte() -> str:
    """Monthly adopters + prior installed base via bounded month join."""
    return f"""fo AS (
      SELECT o_custkey,
             CAST(MIN(year(o_orderdate) * 12 + month(o_orderdate) - 1
                  - {BASE_MONTH}) AS BIGINT) AS m
      FROM orders GROUP BY o_custkey
    ),
    mtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS mm FROM fo),
    adopt AS (
      SELECT m, CAST(COUNT(*) AS BIGINT) AS n_new
      FROM fo GROUP BY m
    ),
    base AS (
      SELECT /*+ BROADCAST(b) */ a.m, a.n_new,
             CAST(COALESCE(SUM(b.n_new), 0) AS BIGINT) AS a_prev
      FROM adopt a LEFT JOIN adopt b ON b.m < a.m
      GROUP BY a.m, a.n_new
    )"""


def _grid_cte() -> str:
    ps = ", ".join(f"({i})" for i in P_IDX)
    qs = ", ".join(f"({j})" for j in Q_IDX)
    return f"""pi(i) AS (VALUES {ps}),
    qi(j) AS (VALUES {qs}),
    grid AS (SELECT i, j FROM pi CROSS JOIN qi)"""


def _sse_cte() -> str:
    """Exact integer one-step-ahead SSE per grid cell."""
    return f"""{_curve_cte()},
    {_grid_cte()},
    err AS (
      SELECT /*+ BROADCAST(g) */ g.i, g.j,
             SUM(CAST((1000 * t.mm * b.n_new
                       - (g.i * t.mm + 10 * g.j * b.a_prev)
                         * (t.mm - b.a_prev))
                      AS DECIMAL(38,0))
                 * (1000 * t.mm * b.n_new
                    - (g.i * t.mm + 10 * g.j * b.a_prev)
                      * (t.mm - b.a_prev))) AS sse_num,
             CAST(COUNT(*) AS BIGINT) AS n_months
      FROM base b CROSS JOIN mtot t CROSS JOIN grid g
      GROUP BY g.i, g.j
    )"""


def _best_cte() -> str:
    return f"""{_sse_cte()},
    best AS (
      SELECT i, j, sse_num FROM err
      ORDER BY sse_num ASC, i ASC, j ASC LIMIT 1
    )"""


# ---------------------------------------------------------------------------
# q776 — adoption curve

_Q776_SQL = f"""
    WITH {_curve_cte()}
    SELECT b.m AS month_idx,
           b.n_new AS new_adopters,
           CAST(b.a_prev + b.n_new AS BIGINT) AS installed_base,
           CAST(b.a_prev + b.n_new AS DOUBLE) / t.mm AS penetration
    FROM base b CROSS JOIN mtot t
    ORDER BY b.m
    """


@query("q776_adoption_curve", oracle=_Q776_SQL)
def q776_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly first-order adopters, the installed base, and market
    penetration. One customer-keyed MIN aggregate, then an ~80-row
    bounded inequality join for the cumulative — never a global
    window."""
    _views(spark, sf_dir)
    return spark.sql(_Q776_SQL)


# ---------------------------------------------------------------------------
# q777 — grid fit

_Q777_SQL = f"""
    WITH {_sse_cte()}
    SELECT CAST(i AS DOUBLE) / 1000 AS p,
           CAST(j AS DOUBLE) / 100 AS q,
           CAST(sse_num AS DOUBLE)
             / (CAST(1000 AS DOUBLE) * 1000
                * (SELECT mm FROM mtot) * (SELECT mm FROM mtot))
             AS sse,
           n_months
    FROM err
    ORDER BY sse_num ASC, i ASC, j ASC
    LIMIT 10
    """


@query("q777_bass_grid_fit", oracle=_Q777_SQL)
def q777_bass_grid_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10 best (p, q) cells of the one-step-ahead Bass fit, ranked
    by EXACT integer SSE numerator (scaled by (1000 M)^2) with a total
    tie order. The grid crosses the bounded monthly curve only."""
    _views(spark, sf_dir)
    return spark.sql(_Q777_SQL)


# ---------------------------------------------------------------------------
# q778 — residual diagnostics

_Q778_SQL = f"""
    WITH {_best_cte()}
    SELECT b.m AS month_idx,
           b.n_new AS observed,
           CAST((w.i * t.mm + 10 * w.j * b.a_prev) * (t.mm - b.a_prev)
                AS DOUBLE) / (1000 * t.mm) AS predicted,
           b.n_new - CAST((w.i * t.mm + 10 * w.j * b.a_prev)
                * (t.mm - b.a_prev) AS DOUBLE) / (1000 * t.mm) AS residual
    FROM base b CROSS JOIN mtot t CROSS JOIN best w
    ORDER BY b.m
    """


@query("q778_bass_residuals", oracle=_Q778_SQL)
def q778_bass_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed vs predicted adopters per month for the winning
    (p, q): predictions are exact rationals (integer numerator over
    1000 M) emitted as terminal doubles."""
    _views(spark, sf_dir)
    return spark.sql(_Q778_SQL)


# ---------------------------------------------------------------------------
# q779 — peak timing

_Q779_SQL = f"""
    WITH {_best_cte()},
    obs AS (
      SELECT m, n_new FROM base
      ORDER BY n_new DESC, m ASC LIMIT 1
    )
    SELECT o.m AS observed_peak_month,
           o.n_new AS observed_peak_adopters,
           CAST(w.i AS DOUBLE) / 1000 AS p,
           CAST(w.j AS DOUBLE) / 100 AS q,
           0.0 + ROUND(LN(CAST(10 * w.j AS DOUBLE) / w.i)
             / (CAST(w.i AS DOUBLE) / 1000 + CAST(w.j AS DOUBLE) / 100), 6)
             AS bass_peak_time_months,
           t.mm * (CAST(w.i AS DOUBLE) / 1000 + CAST(w.j AS DOUBLE) / 100)
             * (CAST(w.i AS DOUBLE) / 1000 + CAST(w.j AS DOUBLE) / 100)
             / (4 * CAST(w.j AS DOUBLE) / 100) AS bass_peak_adopters
    FROM obs o CROSS JOIN best w CROSS JOIN mtot t
    """


@query("q779_bass_peak", oracle=_Q779_SQL)
def q779_bass_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observed peak-adoption month (total-order argmax) beside the
    Bass-implied peak time ln(q/p)/(p+q) (display-rounded LN) and
    peak magnitude M(p+q)^2/(4q) for the fitted parameters."""
    _views(spark, sf_dir)
    return spark.sql(_Q779_SQL)


# ---------------------------------------------------------------------------
# q780 — innovation vs imitation

_Q780_SQL = f"""
    WITH {_best_cte()}
    SELECT b.m AS month_idx,
           CAST(w.i * (t.mm - b.a_prev) AS DOUBLE) / 1000
             AS innovators_pred,
           CAST(10 * w.j * b.a_prev AS DOUBLE) * (t.mm - b.a_prev)
             / (1000 * t.mm) AS imitators_pred,
           CAST(w.i * t.mm AS DOUBLE)
             / (w.i * t.mm + 10 * w.j * b.a_prev) AS innovation_share
    FROM base b CROSS JOIN mtot t CROSS JOIN best w
    ORDER BY b.m
    """


@query("q780_innovation_split", oracle=_Q780_SQL)
def q780_innovation_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each month's predicted adoption split into the external
    (p-driven) and word-of-mouth (q-driven) components, with the
    innovation share p M / (p M + 10 q A) — exact rationals, so the
    share decays monotonically as the installed base grows
    (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q780_SQL)
