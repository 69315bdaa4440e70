"""Difference-in-differences batch 170 (q922-q926) — the panel
causal-inference workhorse, on the events panel (unit = user, time =
day, outcome = daily value cents): a deterministic treatment
assignment (user_id % 3 == 0) switching on at the span midpoint.
Complements causal3's event study/RDD/IV and synthcontrol with the
DiD family proper: the 2x2 estimator, its identifying assumption
(parallel pre-trends), the placebo that should find nothing, the
triple difference, and staggered adoption vs never-treated.

- q922 the 2x2 DiD: four group x period cell means and the
  interaction difference;
- q923 parallel pre-trends: per-group pre-period OLS slope from exact
  integer moments — the assumption, measured;
- q924 placebo DiD inside the pre-period (fake adoption at the pre
  midpoint) — the estimator run where the true effect is zero;
- q925 triple difference: purchase vs non-purchase outcomes sharpen
  the contrast (DDD);
- q926 staggered adoption: two cohorts adopt at 1/3 and 2/3 of the
  span; each (cohort, period) ATT is measured against the
  never-treated cohort only (the Callaway-Sant'Anna discipline that
  avoids the forbidden late-vs-early comparison).

100 TB shape: ONE user-day aggregate feeds everything; every
estimator is a bounded cell-mean table (4 cells, 2 slopes, cohort x
period grid bounded by calendar). Span anchors are 1-row broadcasts
of exact integer date arithmetic.

Determinism: outcomes are integer cents; day indexes integer date
math; cell means terminal ratios; slopes closed-form integer-moment
OLS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TREAT_MOD = 3


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _dd(d: str, a: str, b: str) -> str:
    return f"datediff({a}, {b})" if d == "spark" else f"datediff('day', {b}, {a})"


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _panel_cte(d: str) -> str:
    """user-day outcome panel with integer day index and treated flag."""
    return f"""ud AS (
      SELECT user_id,
             CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    span AS (
      SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud
    ),
    panel AS (
      SELECT /*+ BROADCAST(s) */ u.user_id, u.y,
             CAST({_dd(d, "u.day", "s.d0")} AS BIGINT) AS di,
             CAST({_dd(d, "s.d1", "s.d0")} AS BIGINT) AS nspan,
             CASE WHEN u.user_id % {TREAT_MOD} = 0 THEN 1 ELSE 0 END AS tr
      FROM ud u CROSS JOIN span s
    )"""


# ---------------------------------------------------------------------------
# q922 — 2x2 DiD


def _q922_sql(d: str) -> str:
    half = _idiv(d, "nspan", "2")
    return f"""
    WITH {_panel_cte(d)},
    cells AS (
      SELECT tr,
             CASE WHEN di > {half} THEN 1 ELSE 0 END AS post,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM panel GROUP BY tr, CASE WHEN di > {half} THEN 1 ELSE 0 END
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN tr = 1 AND post = 1 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS t_post,
        MAX(CASE WHEN tr = 1 AND post = 0 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS t_pre,
        MAX(CASE WHEN tr = 0 AND post = 1 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS c_post,
        MAX(CASE WHEN tr = 0 AND post = 0 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS c_pre,
        CAST(SUM(n_obs) AS BIGINT) AS n_obs
      FROM cells
    )
    SELECT ROUND(t_pre, 4) AS treated_pre,
           ROUND(t_post, 4) AS treated_post,
           ROUND(c_pre, 4) AS control_pre,
           ROUND(c_post, 4) AS control_post,
           ROUND((t_post - t_pre) - (c_post - c_pre), 4) AS did_cents,
           n_obs
    FROM wide
    """


@query("q922_did_2x2", oracle=_q922_sql("duckdb"))
def q922_did_2x2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 2x2 difference-in-differences: four group x period cell
    means from ONE user-day aggregate, DiD as the interaction
    difference — the estimator that removes both the level gap between
    groups and the common time shock. Exact integer sums, terminal
    cell-mean ratios."""
    _views(spark, sf_dir)
    return spark.sql(_q922_sql("spark"))


# ---------------------------------------------------------------------------
# q923 — parallel pre-trends


def _q923_sql(d: str) -> str:
    half = _idiv(d, "nspan", "2")
    return f"""
    WITH {_panel_cte(d)},
    pre AS (
      SELECT tr, di, y FROM panel WHERE di <= {half}
    ),
    mom AS (
      SELECT tr,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(di) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(di * y) AS BIGINT) AS sxy,
             CAST(SUM(di * di) AS BIGINT) AS sxx
      FROM pre GROUP BY tr
    )
    SELECT tr AS treated,
           n AS n_obs,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx), 6) AS pre_slope_cents_per_day
    FROM mom
    ORDER BY tr
    """


@query("q923_parallel_pretrends", oracle=_q923_sql("duckdb"))
def q923_parallel_pretrends(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The identifying assumption, measured: per-group OLS slope of the
    outcome on the day index over the PRE period only (closed-form from
    exact integer moments). DiD is credible only while these two
    slopes agree — the table a referee asks for first."""
    _views(spark, sf_dir)
    return spark.sql(_q923_sql("spark"))


# ---------------------------------------------------------------------------
# q924 — placebo DiD


def _q924_sql(d: str) -> str:
    half = _idiv(d, "nspan", "2")
    quarter = _idiv(d, "nspan", "4")
    return f"""
    WITH {_panel_cte(d)},
    pre AS (
      SELECT tr, di, y, nspan FROM panel WHERE di <= {half}
    ),
    cells AS (
      SELECT tr,
             CASE WHEN di > {quarter} THEN 1 ELSE 0 END AS post,
             CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(y) AS BIGINT) AS sy
      FROM pre GROUP BY tr, CASE WHEN di > {quarter} THEN 1 ELSE 0 END
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN tr = 1 AND post = 1 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS t_post,
        MAX(CASE WHEN tr = 1 AND post = 0 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS t_pre,
        MAX(CASE WHEN tr = 0 AND post = 1 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS c_post,
        MAX(CASE WHEN tr = 0 AND post = 0 THEN CAST(sy AS DOUBLE) / n_obs END)
          AS c_pre,
        CAST(SUM(n_obs) AS BIGINT) AS n_obs
      FROM cells
    )
    SELECT ROUND((t_post - t_pre) - (c_post - c_pre), 4)
             AS placebo_did_cents,
           n_obs
    FROM wide
    """


@query("q924_placebo_did", oracle=_q924_sql("duckdb"))
def q924_placebo_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The placebo: the same 2x2 estimator run entirely INSIDE the pre
    period with a fake adoption at its midpoint — no treatment turned
    on, so any 'effect' it finds is trend contamination. The magnitude
    here calibrates how seriously to take q922."""
    _views(spark, sf_dir)
    return spark.sql(_q924_sql("spark"))


# ---------------------------------------------------------------------------
# q925 — triple difference


def _q925_sql(d: str) -> str:
    half = "nspan div 2" if d == "spark" else "nspan // 2"
    return f"""
    WITH ud AS (
      SELECT user_id,
             CAST(ts AS DATE) AS day,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS grp,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS y
      FROM events
      GROUP BY user_id, CAST(ts AS DATE),
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
    ),
    span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM ud),
    panel AS (
      SELECT /*+ BROADCAST(s) */ u.grp, u.y,
             CAST({_dd(d, "u.day", "s.d0")} AS BIGINT) AS di,
             CAST({_dd(d, "s.d1", "s.d0")} AS BIGINT) AS nspan,
             CASE WHEN u.user_id % {TREAT_MOD} = 0 THEN 1 ELSE 0 END AS tr
      FROM ud u CROSS JOIN span s
    ),
    cells AS (
      SELECT tr, grp,
             CASE WHEN di > {half} THEN 1 ELSE 0 END AS post,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM panel GROUP BY tr, grp, CASE WHEN di > {half} THEN 1 ELSE 0 END
    ),
    did AS (
      SELECT grp,
             MAX(CASE WHEN tr = 1 AND post = 1
                 THEN CAST(sy AS DOUBLE) / n_obs END)
             - MAX(CASE WHEN tr = 1 AND post = 0
                   THEN CAST(sy AS DOUBLE) / n_obs END)
             - MAX(CASE WHEN tr = 0 AND post = 1
                   THEN CAST(sy AS DOUBLE) / n_obs END)
             + MAX(CASE WHEN tr = 0 AND post = 0
                   THEN CAST(sy AS DOUBLE) / n_obs END) AS did_g
      FROM cells GROUP BY grp
    )
    SELECT ROUND(MAX(CASE WHEN grp = 1 THEN did_g END), 4)
             AS did_purchase,
           ROUND(MAX(CASE WHEN grp = 0 THEN did_g END), 4)
             AS did_other,
           ROUND(MAX(CASE WHEN grp = 1 THEN did_g END)
                 - MAX(CASE WHEN grp = 0 THEN did_g END), 4)
             AS triple_diff_cents
    FROM did
    """


@query("q925_triple_diff", oracle=_q925_sql("duckdb"))
def q925_triple_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triple difference: the DiD computed separately for purchase vs
    non-purchase outcomes, then differenced again — whatever common
    shock hit both outcome types inside the treated group cancels.
    Eight cell means from one (user, day, outcome-type) aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_q925_sql("spark"))


# ---------------------------------------------------------------------------
# q926 — staggered adoption


def _q926_sql(d: str) -> str:
    third = _idiv(d, "nspan", "3")
    third2 = _idiv(d, "2 * nspan", "3")
    return f"""
    WITH {_panel_cte(d)},
    cohorts AS (
      -- cohort 1 adopts at span/3, cohort 2 at 2*span/3, cohort 0 never
      SELECT di, y, nspan,
             CASE user_id % {TREAT_MOD}
               WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 0 END AS cohort
      FROM panel
    ),
    cells AS (
      SELECT cohort,
             CASE WHEN di > {third2} THEN 2
                  WHEN di > {third} THEN 1 ELSE 0 END AS period,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM cohorts
      GROUP BY cohort,
               CASE WHEN di > {third2} THEN 2
                    WHEN di > {third} THEN 1 ELSE 0 END
    ),
    att AS (
      SELECT g.cohort, g.period,
             (CAST(g.sy AS DOUBLE) / g.n_obs
              - CAST(gb.sy AS DOUBLE) / gb.n_obs)
             - (CAST(nv.sy AS DOUBLE) / nv.n_obs
                - CAST(nvb.sy AS DOUBLE) / nvb.n_obs) AS att_gt
      FROM cells g
      JOIN cells gb ON gb.cohort = g.cohort AND gb.period = g.cohort - 1
      JOIN cells nv ON nv.cohort = 0 AND nv.period = g.period
      JOIN cells nvb ON nvb.cohort = 0 AND nvb.period = g.cohort - 1
      WHERE g.cohort > 0 AND g.period >= g.cohort
    )
    SELECT cohort, period,
           ROUND(att_gt, 4) AS att_cents
    FROM att
    ORDER BY cohort, period
    """


@query("q926_staggered_adoption", oracle=_q926_sql("duckdb"))
def q926_staggered_adoption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staggered adoption done right: cohort 1 adopts in period 1,
    cohort 2 in period 2, cohort 0 never; each (cohort, period) ATT
    compares the cohort's change since its own last pre period against
    the NEVER-TREATED cohort's change over the same window — never the
    late-vs-early comparison that poisons two-way fixed effects. A
    bounded cohort x period cell join."""
    _views(spark, sf_dir)
    return spark.sql(_q926_sql("spark"))
