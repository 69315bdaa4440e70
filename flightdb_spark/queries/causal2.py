"""Causal-inference & survival batch 68 (q407-q411) — the comparison
machinery beside q204 (Kaplan-Meier), q249 (CUPED), q320 (doubly
robust), q330-q333 (A/B readouts):

- q407 log-rank test: two-cohort survival comparison on the q204
  construction (time-to-first-purchase, censored at last activity) —
  O-E and variance terms accumulated over pooled event times;
- q408 propensity stratification: ATT from activity-stratum treated/
  control contrasts under a PLANTED confounder (treatment probability
  depends on activity) — the stratified estimator that the naive
  difference gets wrong;
- q409 Cochran-Mantel-Haenszel pooled odds ratio over the same strata
  — the 2x2-per-stratum pooling that dodges Simpson's paradox
  (complements q129's independence chi-square);
- q410 mediation analysis (Baron-Kenny / product-of-coefficients):
  X -> M -> Y with closed-form OLS paths from exact moments —
  indirect effect a*b and proportion mediated;
- q411 interrupted time series: pre/post segmented regression of
  daily volume around the midpoint date — slope change and level jump
  at the interruption (the before/after causal readout for launches).

Determinism: every estimator reduces to exact integer/decimal moments
with single terminal double expressions; the log-rank per-time terms
round to 9 dp into DECIMAL (order-free sums over event times).

100 TB shapes: all five are one or two user/day-keyed aggregates with
map-side partials; windows only ever run over DISTINCT event times or
calendar days (bounded); nothing touches row pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_HOUR_US = 3_600_000_000


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _h(dialect: str, expr: str) -> str:
    """16-bit md5 hash of a string expression, both dialects."""
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 4), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 4))::BIGINT)"


def _us(dialect: str, col: str) -> str:
    return f"unix_micros({col})" if dialect == "spark" else f"epoch_us({col})"


# ---------------------------------------------------------------------------
# q407 — log-rank test


def _logrank_sql(dialect: str) -> str:
    us = lambda c: _us(dialect, c)  # noqa: E731
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH per_user AS (
      SELECT user_id, MIN(ts) AS t0, MAX(ts) AS tmax,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
      FROM events GROUP BY user_id
    ),
    subj AS (
      SELECT user_id % 2 AS grp,
             CASE WHEN tp IS NOT NULL
                  THEN ({us('tp')} - {us('t0')}) {idiv} {_HOUR_US}
                  ELSE ({us('tmax')} - {us('t0')}) {idiv} {_HOUR_US} END AS dur,
             CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM per_user
    ),
    keys AS (
      SELECT dur,
             CAST(SUM(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT) AS d0,
             CAST(SUM(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT) AS d1,
             CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m0,
             CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m1
      FROM subj GROUP BY dur
    ),
    tots AS (
      SELECT CAST(SUM(m0) AS BIGINT) AS tot0,
             CAST(SUM(m1) AS BIGINT) AS tot1 FROM keys
    ),
    scan AS (
      -- at-risk counts: everyone whose duration >= t (cumulative over
      -- the BOUNDED distinct-duration table)
      SELECT dur, d0, d1,
             tot0 - (SUM(m0) OVER (ORDER BY dur) - m0) AS n0,
             tot1 - (SUM(m1) OVER (ORDER BY dur) - m1) AS n1
      FROM keys, tots
    ),
    terms AS (
      SELECT dur, d0, d1, n0, n1, d0 + d1 AS dt, n0 + n1 AS nt,
             CAST(ROUND((d0 + d1) * CAST(n0 AS DOUBLE) / (n0 + n1), 9)
                  AS DECIMAL(38,9)) AS e0,
             CASE WHEN n0 + n1 <= 1 THEN CAST(0 AS DECIMAL(38,9))
                  ELSE CAST(ROUND(
                    (d0 + d1) * (CAST(n0 AS DOUBLE) / (n0 + n1))
                    * (CAST(n1 AS DOUBLE) / (n0 + n1))
                    * (n0 + n1 - d0 - d1) * 1.0 / (n0 + n1 - 1), 9)
                  AS DECIMAL(38,9)) END AS v
      FROM scan WHERE d0 + d1 > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
           CAST(SUM(d0) AS BIGINT) AS observed_0,
           ROUND(CAST(SUM(e0) AS DOUBLE), 6) AS expected_0,
           ROUND(CAST(SUM(v) AS DOUBLE), 6) AS variance,
           ROUND(POWER(SUM(d0) - CAST(SUM(e0) AS DOUBLE), 2)
                 / CAST(SUM(v) AS DOUBLE), 6) AS logrank_chi2
    FROM terms
    """


@query("q407_logrank_test", oracle=_logrank_sql("duck"))
def q407_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test between the two user-parity cohorts on the q204
    time-to-first-purchase construction: at every pooled event time,
    group 0's observed events vs its hypergeometric expectation and
    variance given the at-risk counts; the chi-square statistic
    (O-E)^2/V on 1 df — THE standard two-sample survival comparison
    (q204 draws one curve; this tests two against each other).
    Per-time expectation/variance terms round to 9 dp into DECIMAL.
    The at-risk scan runs over the DISTINCT-duration table (bounded by
    calendar hours — the q204 allowlist class); the corpus pass is one
    user aggregate."""
    _events_view(spark, sf_dir)
    return spark.sql(_logrank_sql("spark"))


# ---------------------------------------------------------------------------
# q408 — propensity stratification (planted confounder)


def _strata_cte(dialect: str) -> str:
    h = _h(dialect, "CAST(user_id AS STRING) || '_t'"
           if dialect == "spark" else "CAST(user_id AS VARCHAR) || '_t'")
    return f"""
    users AS (
      -- outcome must have variance at EVERY scale factor (every user
      -- purchases at least once): y = purchase-heavy user, purchases
      -- >= 20% of events (scale-free; ~half the users at any SF)
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS activity,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) * 5 >= COUNT(*)
                  THEN 1 ELSE 0 END AS y
      FROM events GROUP BY user_id
    ),
    assigned AS (
      -- CONFOUNDED treatment: more-active users are more likely
      -- treated (threshold rises with activity), so the naive
      -- difference mixes the activity effect into the treatment effect
      SELECT user_id, activity, y,
             CASE WHEN ({h}) % 100 < LEAST(30 + activity {'div' if dialect == 'spark' else '//'} 2, 90)
                  THEN 1 ELSE 0 END AS treated,
             CASE WHEN activity < 55 THEN 0
                  WHEN activity < 65 THEN 1
                  WHEN activity < 75 THEN 2
                  ELSE 3 END AS stratum
      FROM users
    )"""


def _psm_sql(dialect: str) -> str:
    return f"""
    WITH {_strata_cte(dialect)},
    cells AS (
      SELECT stratum,
             CAST(SUM(treated) AS BIGINT) AS n_t,
             CAST(SUM(1 - treated) AS BIGINT) AS n_c,
             CAST(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT)
               AS y_t,
             CAST(SUM(CASE WHEN treated = 0 THEN y ELSE 0 END) AS BIGINT)
               AS y_c
      FROM assigned GROUP BY stratum
    )
    SELECT stratum, n_t, n_c,
           ROUND(CAST(y_t AS DOUBLE) / NULLIF(n_t, 0), 6) AS rate_treated,
           ROUND(CAST(y_c AS DOUBLE) / NULLIF(n_c, 0), 6) AS rate_control,
           ROUND(CAST(y_t AS DOUBLE) / NULLIF(n_t, 0)
                 - CAST(y_c AS DOUBLE) / NULLIF(n_c, 0), 6) AS stratum_effect
    FROM cells ORDER BY stratum
    """


@query("q408_propensity_strata", oracle=_psm_sql("duck"))
def q408_propensity_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Propensity stratification under a PLANTED confounder (treatment
    probability rises with user activity): per activity-stratum
    treated/control outcome rates and within-stratum effects — the
    stratified contrast whose treated-weighted average is the ATT,
    where the naive pooled difference is biased by construction (the
    test asserts the two disagree). Pure integer counting; one user
    aggregate, 4-row output."""
    _events_view(spark, sf_dir)
    return spark.sql(_psm_sql("spark"))


# ---------------------------------------------------------------------------
# q409 — Cochran-Mantel-Haenszel pooled odds ratio


def _cmh_sql(dialect: str) -> str:
    return f"""
    WITH {_strata_cte(dialect)},
    tables_ AS (
      SELECT stratum,
             CAST(SUM(CASE WHEN treated = 1 AND y = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS a,
             CAST(SUM(CASE WHEN treated = 1 AND y = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS b,
             CAST(SUM(CASE WHEN treated = 0 AND y = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS c,
             CAST(SUM(CASE WHEN treated = 0 AND y = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS d
      FROM assigned GROUP BY stratum
    ),
    terms AS (
      SELECT stratum, a, b, c, d, a + b + c + d AS n,
             CAST(ROUND(CAST(a AS DOUBLE) * d / (a + b + c + d), 9)
                  AS DECIMAL(38,9)) AS ad_n,
             CAST(ROUND(CAST(b AS DOUBLE) * c / (a + b + c + d), 9)
                  AS DECIMAL(38,9)) AS bc_n
      FROM tables_
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
           CAST(SUM(a) AS BIGINT) AS exposed_cases,
           ROUND(CAST(SUM(ad_n) AS DOUBLE), 6) AS sum_ad_n,
           ROUND(CAST(SUM(bc_n) AS DOUBLE), 6) AS sum_bc_n,
           ROUND(CAST(SUM(ad_n) AS DOUBLE) / CAST(SUM(bc_n) AS DOUBLE), 6)
             AS cmh_odds_ratio
    FROM terms
    """


@query("q409_cmh_odds_ratio", oracle=_cmh_sql("duck"))
def q409_cmh_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran-Mantel-Haenszel pooled odds ratio over the q408 strata:
    sum(a_i d_i / n_i) / sum(b_i c_i / n_i) — the stratified 2x2
    pooling that estimates a common odds ratio free of the planted
    activity confounding (the Simpson's-paradox-proof companion to
    q129's single-table chi-square). Per-stratum terms round to 9 dp
    into DECIMAL; one user aggregate, 1-row output."""
    _events_view(spark, sf_dir)
    return spark.sql(_cmh_sql("spark"))


# ---------------------------------------------------------------------------
# q410 — mediation analysis


def _mediation_sql(dialect: str) -> str:
    h = _h(dialect, "CAST(user_id AS STRING) || '_x'"
           if dialect == "spark" else "CAST(user_id AS VARCHAR) || '_x'")
    return f"""
    WITH users AS (
      -- y = purchase-heavy user (purchase share >= 20%; scale-free so
      -- the outcome varies at every SF); the mediator is activity
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS m,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase'
                               THEN 1 ELSE 0 END) * 5 >= COUNT(*)
                  THEN 1 ELSE 0 END AS y,
             CASE WHEN ({h}) % 2 = 0 THEN 1 ELSE 0 END AS x
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(m) AS BIGINT) AS sm,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * m) AS BIGINT) AS sxm,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(m * y) AS BIGINT) AS smy,
             CAST(SUM(m * m) AS BIGINT) AS smm
      FROM users
    ),
    -- centered moments (doubles; exact integer inputs)
    cm AS (
      SELECT n,
             CAST(sxm AS DOUBLE) - CAST(sx AS DOUBLE) * sm / n AS cxm,
             CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n AS cxy,
             CAST(smy AS DOUBLE) - CAST(sm AS DOUBLE) * sy / n AS cmy,
             CAST(sx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n AS cxx,
             CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * sm / n AS cmm
      FROM mom
    ),
    paths AS (
      -- a: M ~ X;  (b, c'): Y ~ X + M by Cramer's rule on the 2x2
      -- centered normal equations; total c: Y ~ X
      SELECT n,
             cxm / cxx AS a_path,
             (cmy * cxx - cxy * cxm) / (cmm * cxx - cxm * cxm) AS b_path,
             (cxy * cmm - cmy * cxm) / (cmm * cxx - cxm * cxm) AS c_prime,
             cxy / cxx AS c_total
      FROM cm
    )
    SELECT n AS n_users,
           ROUND(a_path, 6) AS a_path,
           ROUND(b_path, 6) AS b_path,
           ROUND(c_prime, 6) AS direct_effect,
           ROUND(a_path * b_path, 6) AS indirect_effect,
           ROUND(c_total, 6) AS total_effect,
           ROUND(a_path * b_path / c_total, 6) AS prop_mediated
    FROM paths
    """


@query("q410_mediation", oracle=_mediation_sql("duck"))
def q410_mediation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baron-Kenny mediation with the product-of-coefficients: X
    (hash assignment) -> M (activity) -> Y (purchase), paths from
    closed-form OLS on exact integer moments (the two-regressor fit by
    Cramer's rule on centered 2x2 normal equations) — indirect effect
    a*b, direct effect c', and the a*b + c' = c decomposition identity
    (asserted in tests). One user aggregate; 1-row algebra."""
    _events_view(spark, sf_dir)
    return spark.sql(_mediation_sql("spark"))


# ---------------------------------------------------------------------------
# q411 — interrupted time series


def _its_sql(dialect: str) -> str:
    if dialect == "spark":
        day = "CAST(date_trunc('day', ts) AS DATE)"
        di = "datediff(day, DATE '1970-01-01')"
    else:
        day = "CAST(date_trunc('day', ts) AS DATE)"
        di = "(day - DATE '1970-01-01')"
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH daily AS (
      SELECT {day} AS day, CAST(COUNT(*) AS BIGINT) AS c FROM events
      GROUP BY 1
    ),
    idx AS (
      SELECT CAST({di} AS BIGINT) AS t, c FROM daily
    ),
    split_ AS (
      -- integer midpoint: a double /2 + CAST would round in DuckDB and
      -- truncate in Spark at odd (min+max)
      SELECT CAST((MIN(t) + MAX(t)) {idiv} 2 AS BIGINT) AS t0 FROM idx
    ),
    seg AS (
      SELECT CASE WHEN t < t0 THEN 0 ELSE 1 END AS post, t, c
      FROM idx, split_
    ),
    mom AS (
      SELECT post,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(t) AS BIGINT) AS st,
             CAST(SUM(c) AS BIGINT) AS sc,
             CAST(SUM(t * c) AS BIGINT) AS stc,
             CAST(SUM(t * t) AS BIGINT) AS stt
      FROM seg GROUP BY post
    ),
    fits AS (
      SELECT post, n,
             (n * CAST(stc AS DOUBLE) - CAST(st AS DOUBLE) * sc)
             / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st) AS slope,
             CAST(sc AS DOUBLE) / n
             - ((n * CAST(stc AS DOUBLE) - CAST(st AS DOUBLE) * sc)
                / (n * CAST(stt AS DOUBLE) - CAST(st AS DOUBLE) * st))
               * (CAST(st AS DOUBLE) / n) AS intercept
      FROM mom
    )
    SELECT t0,
           ROUND(pre.slope, 6) AS slope_pre,
           ROUND(post.slope, 6) AS slope_post,
           ROUND(post.slope - pre.slope, 6) AS slope_change,
           ROUND((post.intercept + post.slope * t0)
                 - (pre.intercept + pre.slope * t0), 6) AS level_jump
    FROM (SELECT * FROM fits WHERE post = 0) pre
    CROSS JOIN (SELECT * FROM fits WHERE post = 1) post
    CROSS JOIN split_
    """


@query("q411_interrupted_timeseries", oracle=_its_sql("duck"))
def q411_interrupted_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time series: segmented OLS of daily volume around
    the midpoint date — per-segment slope from exact integer moments,
    then the two causal readouts: slope change and the level jump at
    the interruption (both segments' fits evaluated AT t0) — the
    before/after analysis for a launch or policy change where no
    control group exists. One daily aggregate; closed-form per-segment
    fits; 1-row output."""
    _events_view(spark, sf_dir)
    return spark.sql(_its_sql("spark"))
