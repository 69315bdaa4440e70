"""Survival-analysis batch 85 (q491-q495) — the reliability toolkit
beside q204 (Kaplan-Meier) and q407 (log-rank), on the same subjects:
signup (first event) -> first purchase, right-censored at each user's
last event, durations in whole hours:

- q491 Nelson-Aalen cumulative hazard + its variance — the estimator
  that stays stable where KM's product collapses, and the input to
  hazard-ratio eyeballing;
- q492 Weibull fit by median-rank regression (Bernard's
  approximation) on the DISTINCT-duration table — shape < 1 means
  conversion hazard falls with tenure (classic "convert early or
  never"); reported as (shape, ln_scale) so no runtime exp enters
  the estimate;
- q493 competing risks: first-purchase vs first-error as competing
  events, Aalen-Johansen cumulative incidence per cause — the curve
  pair naive per-cause KM gets WRONG (it over-counts by treating the
  competitor as censoring);
- q494 restricted mean survival time: the area under KM to a 48 h
  horizon — "expected conversion-free hours in the first two days",
  the effect measure that works when medians never cross 0.5;
- q495 conditional survival: S(t+12h)/S(t) at t = 6/12/24 h — "given
  you survived t, what's the next 12 hours" (burn-in vs wear-out at
  a glance).

Determinism: the q204 contract throughout — integer hour durations,
risk sets by prefix sums over the DISTINCT-duration table (hour-
bounded, rule 15), ln/exp only through 9-dp-rounded DECIMAL
log-space sums with exact-zero pinning (rule 14); the Weibull OLS
runs on ln-transformed exact rationals rounded at 9 dp.

100 TB shapes: one per-user aggregate (the only corpus shuffle), then
every window and join runs over the distinct-hour table — bounded by
the calendar, not the user count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

HOUR_US = 3_600_000_000
RMST_TAU_H = 48
COND_GAP_H = 12
COND_TS = (6, 12, 24)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _idiv(dialect: str) -> str:
    return "div" if dialect == "spark" else "//"


def _us(dialect: str) -> str:
    return "unix_micros" if dialect == "spark" else "epoch_us"


def _subjects(dialect: str) -> str:
    """(dur, ev) per user: q204's exact construction."""
    us, idiv = _us(dialect), _idiv(dialect)
    return f"""per_user AS (
      SELECT user_id, MIN(ts) AS t0, MAX(ts) AS tmax,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id
    ),
    subj AS (
      SELECT CASE WHEN tp IS NOT NULL
                  THEN ({us}(tp) - {us}(t0)) {idiv} {HOUR_US}
                  ELSE ({us}(tmax) - {us}(t0)) {idiv} {HOUR_US} END AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user
    )"""


def _risk_chain(dialect: str) -> str:
    """keys/tot/scan: the distinct-duration risk-set prefix chain."""
    return f"""{_subjects(dialect)},
    keys AS (
      SELECT dur, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(1 - ev) AS BIGINT) AS c
      FROM subj GROUP BY dur
    ),
    tot AS (SELECT CAST(SUM(d) + SUM(c) AS BIGINT) AS n FROM keys),
    scan AS (
      SELECT dur, d, c,
             n - (SUM(d + c) OVER (ORDER BY dur) - (d + c)) AS n_risk
      FROM keys CROSS JOIN tot
    )"""


def _km_chain(dialect: str) -> str:
    """...km: adds the log-space KM survival columns (q204's terms)."""
    return f"""{_risk_chain(dialect)},
    terms AS (
      SELECT dur, d, c, n_risk,
             CASE WHEN n_risk = d THEN CAST(0 AS DECIMAL(38,9))
                  ELSE CAST(ROUND(LN(CAST(n_risk - d AS DOUBLE) / n_risk), 9)
                            AS DECIMAL(38,9)) END AS lnterm,
             CASE WHEN n_risk = d THEN 1 ELSE 0 END AS hit_zero
      FROM scan
    ),
    km AS (
      SELECT dur, d, c, n_risk,
             SUM(lnterm) OVER (ORDER BY dur) AS cum_ln,
             MAX(hit_zero) OVER (ORDER BY dur) AS z
      FROM terms
    ),
    surv AS (
      SELECT dur, d, c, n_risk,
             CASE WHEN z = 1 THEN CAST(0.0 AS DOUBLE)
                  ELSE EXP(CAST(cum_ln AS DOUBLE)) END AS s
      FROM km
    )"""


# ---------------------------------------------------------------------------
# q491 — Nelson-Aalen


def _na_sql(dialect: str) -> str:
    return f"""
    WITH {_risk_chain(dialect)},
    na AS (
      SELECT dur, d, n_risk,
             SUM(CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 9)
                 AS DECIMAL(38,9))) OVER (ORDER BY dur) AS ch,
             SUM(CAST(ROUND(CAST(d AS DOUBLE) / (CAST(n_risk AS DOUBLE)
                 * n_risk), 12) AS DECIMAL(38,12))) OVER (ORDER BY dur) AS v
      FROM scan
    )
    SELECT CAST(dur AS BIGINT) AS duration_h,
           CAST(n_risk AS BIGINT) AS n_at_risk, d AS d_events,
           ROUND(CAST(ch AS DOUBLE), 5) AS cum_hazard,
           ROUND(CAST(v AS DOUBLE), 8) AS hazard_var
    FROM na WHERE d > 0
    """


@query("q491_nelson_aalen", oracle=_na_sql("duck"))
def q491_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson-Aalen cumulative hazard H(t) = sum d_i/n_i with its
    variance sum d_i/n_i^2 — exact rationals rounded at 9/12 dp into
    DECIMAL prefix sums over the distinct-hour table (the q204 risk
    chain without the exp). The additive twin of KM that downstream
    hazard-ratio checks want."""
    _views(spark, sf_dir)
    return spark.sql(_na_sql("spark"))


# ---------------------------------------------------------------------------
# q492 — Weibull median-rank regression


def _weibull_sql(dialect: str) -> str:
    return f"""
    WITH {_subjects(dialect)},
    evd AS (
      SELECT dur, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM subj WHERE ev = 1 AND dur >= 1 GROUP BY dur
    ),
    n_ AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM evd),
    ranked AS (
      -- mean rank per distinct duration (ties share their midpoint)
      SELECT dur, cnt,
             SUM(cnt) OVER (ORDER BY dur) - cnt
               + (cnt + CAST(1.0 AS DOUBLE)) / 2 AS i,
             n.n AS n
      FROM evd CROSS JOIN n_ n
    ),
    pts AS (
      -- Bernard's median rank F = (i - 0.3)/(n + 0.4);
      -- y = ln(-ln(1-F)), x = ln(dur): exact-rational arguments
      SELECT cnt,
             ROUND(LN(CAST(dur AS DOUBLE)), 9) AS x,
             ROUND(LN(-LN(CAST(1.0 AS DOUBLE)
                   - (i - CAST(0.3 AS DOUBLE))
                     / (n + CAST(0.4 AS DOUBLE)))), 9) AS y
      FROM ranked
    ),
    mom AS (
      SELECT CAST(SUM(cnt) AS DOUBLE) AS w,
             CAST(SUM(CAST(ROUND(cnt * x, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(cnt * y, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(cnt * x * y, 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS sxy,
             CAST(SUM(CAST(ROUND(cnt * x * x, 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS sxx
      FROM pts
    )
    SELECT CAST(w AS BIGINT) AS n_events,
           ROUND((w * sxy - sx * sy) / (w * sxx - sx * sx), 4) AS shape_k,
           ROUND(-((sy * sxx - sx * sxy) / (w * sxx - sx * sx))
                 / ((w * sxy - sx * sy) / (w * sxx - sx * sx)), 4)
             AS ln_scale
    FROM mom
    """


@query("q492_weibull_mrr", oracle=_weibull_sql("duck"))
def q492_weibull_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit by median-rank regression over uncensored
    conversions: plot ln(-ln(1-F)) on ln(t) with Bernard's median
    ranks and read shape (slope) and ln-scale (-intercept/slope) off
    a weighted closed-form OLS. Ranks collapse to MEAN rank per
    DISTINCT duration so every window runs hour-bounded, not
    user-bounded (rule 15); ln terms round at 9 dp into DECIMAL
    moments; no runtime exp (scale stays in log space)."""
    _views(spark, sf_dir)
    return spark.sql(_weibull_sql("spark"))


# ---------------------------------------------------------------------------
# q493 — competing risks (Aalen-Johansen)


def _cif_sql(dialect: str) -> str:
    us, idiv = _us(dialect), _idiv(dialect)
    return f"""
    WITH per_user AS (
      SELECT user_id, MIN(ts) AS t0, MAX(ts) AS tmax,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp,
             MIN(CASE WHEN event_type = 'error' THEN ts END) AS te
      FROM events GROUP BY user_id
    ),
    subj AS (
      SELECT CASE
               WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te)
                 THEN ({us}(tp) - {us}(t0)) {idiv} {HOUR_US}
               WHEN te IS NOT NULL
                 THEN ({us}(te) - {us}(t0)) {idiv} {HOUR_US}
               ELSE ({us}(tmax) - {us}(t0)) {idiv} {HOUR_US} END AS dur,
             CASE
               WHEN tp IS NOT NULL AND (te IS NULL OR tp <= te) THEN 1
               WHEN te IS NOT NULL THEN 2
               ELSE 0 END AS cause
      FROM per_user
    ),
    keys AS (
      SELECT dur,
             CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
             CAST(SUM(CASE WHEN cause = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM subj GROUP BY dur
    ),
    tot AS (SELECT CAST(SUM(d1 + d2 + c) AS BIGINT) AS n FROM keys),
    scan AS (
      SELECT dur, d1, d2, c,
             n - (SUM(d1 + d2 + c) OVER (ORDER BY dur) - (d1 + d2 + c))
               AS n_risk
      FROM keys CROSS JOIN tot
    ),
    terms AS (
      SELECT dur, d1, d2, n_risk,
             CASE WHEN n_risk = d1 + d2 THEN CAST(0 AS DECIMAL(38,9))
                  ELSE CAST(ROUND(LN(CAST(n_risk - d1 - d2 AS DOUBLE)
                       / n_risk), 9) AS DECIMAL(38,9)) END AS lnterm,
             CASE WHEN n_risk = d1 + d2 THEN 1 ELSE 0 END AS hit_zero
      FROM scan
    ),
    kmall AS (
      SELECT dur, d1, d2, n_risk,
             SUM(lnterm) OVER (ORDER BY dur) - lnterm AS cum_ln_prev,
             MAX(hit_zero) OVER (ORDER BY dur) AS z,
             hit_zero
      FROM terms
    ),
    incr AS (
      -- S(t-) * d_k / n_risk; S(t-) = exp of the PREVIOUS cumulative
      SELECT dur, d1, d2, n_risk,
             CASE WHEN z = 1 AND hit_zero = 0 THEN CAST(0.0 AS DOUBLE)
                  ELSE EXP(CAST(cum_ln_prev AS DOUBLE)) END AS s_prev
      FROM kmall
    ),
    cif AS (
      SELECT dur, d1, d2, n_risk,
             SUM(CAST(ROUND(s_prev * d1 / n_risk, 9) AS DECIMAL(38,9)))
               OVER (ORDER BY dur) AS cif1,
             SUM(CAST(ROUND(s_prev * d2 / n_risk, 9) AS DECIMAL(38,9)))
               OVER (ORDER BY dur) AS cif2
      FROM incr
    )
    SELECT CAST(dur AS BIGINT) AS duration_h,
           CAST(n_risk AS BIGINT) AS n_at_risk,
           d1 AS d_purchase, d2 AS d_error,
           ROUND(CAST(cif1 AS DOUBLE), 5) AS cif_purchase,
           ROUND(CAST(cif2 AS DOUBLE), 5) AS cif_error
    FROM cif WHERE d1 + d2 > 0
    """


@query("q493_competing_risks", oracle=_cif_sql("duck"))
def q493_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen-Johansen cumulative incidence with first-purchase and
    first-error as competing events: CIF_k(t) = sum S(t-) d_k/n —
    the estimator that correctly splits probability mass between
    causes where per-cause KM (competitor-as-censoring) double-counts.
    S(t-) comes from the all-cause log-space KM shifted one step
    (exact-zero pinned, rule 14); increments round at 9 dp into
    DECIMAL prefix sums over the distinct-hour table."""
    _views(spark, sf_dir)
    return spark.sql(_cif_sql("spark"))


# ---------------------------------------------------------------------------
# q494 — restricted mean survival time


def _rmst_sql(dialect: str) -> str:
    return f"""
    WITH {_km_chain(dialect)},
    steps AS (
      -- interval [dur, next_dur) carries survival s; clip at tau
      SELECT dur, s,
             LEAD(dur) OVER (ORDER BY dur) AS next_dur
      FROM surv
    ),
    clipped AS (
      SELECT s,
             LEAST(COALESCE(next_dur, {RMST_TAU_H}), {RMST_TAU_H})
               - LEAST(dur, {RMST_TAU_H}) AS width
      FROM steps
    ),
    first_seg AS (
      -- survival is 1 on [0, first event time)
      SELECT CAST(LEAST(MIN(dur), {RMST_TAU_H}) AS DOUBLE) AS w0
      FROM surv
    )
    SELECT {RMST_TAU_H} AS tau_h,
           ROUND(f.w0
                 + CAST(SUM(CAST(ROUND(c.s * c.width, 9) AS DECIMAL(38,9)))
                   AS DOUBLE), 4) AS rmst_h
    FROM clipped c CROSS JOIN first_seg f
    GROUP BY f.w0
    """


@query("q494_rmst", oracle=_rmst_sql("duck"))
def q494_rmst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restricted mean survival time to 48 h: the exact area under the
    KM step function — sum of S(t_i) x clipped interval widths plus
    the unit-survival head segment. The effect measure that stays
    defined when medians don't exist. Products round at 9 dp into one
    DECIMAL sum over the distinct-hour step table."""
    _views(spark, sf_dir)
    return spark.sql(_rmst_sql("spark"))


# ---------------------------------------------------------------------------
# q495 — conditional survival


def _cond_sql(dialect: str) -> str:
    ts = ", ".join(str(t) for t in COND_TS)
    grid = (
        f"(SELECT explode(array({ts})) AS t0)"
        if dialect == "spark"
        else f"(SELECT unnest([{ts}]) AS t0)"
    )
    return f"""
    WITH {_km_chain(dialect)},
    grid AS (SELECT t0 FROM {grid} g),
    s_at AS (
      -- step-function lookup: S at time t = survival of the last
      -- event-duration <= t (1.0 if none)
      SELECT g.t0,
             COALESCE(MAX_BY(v.s, v.dur), CAST(1.0 AS DOUBLE)) AS s_t,
             COALESCE(MAX_BY(w.s, w.dur), CAST(1.0 AS DOUBLE)) AS s_t2
      FROM grid g
      LEFT JOIN (SELECT dur, s FROM surv WHERE d > 0) v ON v.dur <= g.t0
      LEFT JOIN (SELECT dur, s FROM surv WHERE d > 0) w
        ON w.dur <= g.t0 + {COND_GAP_H}
      GROUP BY g.t0
    )
    SELECT t0 AS given_survived_h,
           ROUND(s_t, 5) AS s_t,
           ROUND(s_t2, 5) AS s_t_plus_12,
           ROUND(s_t2 / s_t, 5) AS conditional_survival
    FROM s_at
    """


@query("q495_conditional_survival", oracle=_cond_sql("duck"))
def q495_conditional_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional survival S(t+12h | survived t) = S(t+12)/S(t) at
    t = 6/12/24 h — the burn-in/wear-out table (rising conditional
    survival = the hazard front-loads; the retention analyst's
    "survive the first day and you're safe" quantified). Step lookups
    are MAX_BY over the bounded distinct-hour KM table joined to a
    3-point grid."""
    _views(spark, sf_dir)
    return spark.sql(_cond_sql("spark"))
