"""Econometrics batch 80 (q466-q470) — the quasi-experimental
estimators beside q440/q441/q307/q320 (fixed effects, DiD, CEM,
doubly-robust) that observational product data actually gets analyzed
with:

- q466 IV / 2SLS: instrument the discount-revenue relation with
  ship-month parity — closed-form Wald estimator cov(z,y)/cov(z,x)
  beside OLS, plus the first-stage F (the weak-instrument audit that
  decides whether the IV column is even usable);
- q467 regression discontinuity: local-linear intercepts on both
  sides of a price cutoff (bandwidth-limited), effect = jump at the
  cutoff;
- q468 Oaxaca-Blinder: the mean-price gap between order-status
  groups decomposed into an explained (endowment) and unexplained
  (coefficient) part via per-group one-covariate OLS;
- q469 event study: mean event value by day relative to each user's
  first purchase (-7..+7) — the leads/lags picture behind any DiD;
- q470 permutation test: md5-deterministic label permutations (19
  draws) of a user-level treatment, exact p-value (1+#extreme)/(1+B)
  for the group mean difference.

Determinism: every estimator is CLOSED-FORM over exact moments —
integer cents / counts accumulate in DECIMAL(38,0)/(38,2), convert to
DOUBLE once, and the final formula is one straight-line expression
shared verbatim between engines (rule 6). Permutation labels are hex
parity of md5 (hashes not RNG, rule 7; hex-digit membership avoids
any dialect-specific hex->int cast). Day bucketing FLOORs an exact
microsecond delta (rule 16).

100 TB shapes: all five are one or two scans with map-side partial
moment aggregates — the shuffles carry constant-size moment rows
(group count x few sums). q470's 19 permutations ride ONE scan (the
label grid multiplies the per-user aggregate, not the event table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

RDD_CUTOFF_CENTS = 25_000_000  # $250k
RDD_BANDWIDTH_CENTS = 15_000_000
EVENT_WINDOW_DAYS = 7
N_PERMS = 19
EVEN_HEX = "('0','2','4','6','8','a','c','e')"
O_CENTS = "CAST(FLOOR(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
L_CENTS = "CAST(FLOOR(l_extendedprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _grid(dialect: str, lo: int, hi: int, col: str) -> str:
    lits = ", ".join(str(v) for v in range(lo, hi + 1))
    if dialect == "spark":
        return f"(SELECT explode(array({lits})) AS {col})"
    return f"(SELECT unnest([{lits}]) AS {col})"


# ---------------------------------------------------------------------------
# q466 — IV / 2SLS with first-stage F


_IV_SQL = f"""
    WITH base AS (
      SELECT {L_CENTS} AS y,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(month(l_shipdate) % 2 AS BIGINT) AS z
      FROM lineitem
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(z AS DECIMAL(38,0))) AS DOUBLE) AS sz,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(z * y AS DECIMAL(38,0))) AS DOUBLE) AS szy,
             CAST(SUM(CAST(z * x AS DECIMAL(38,0))) AS DOUBLE) AS szx,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(z * z AS DECIMAL(38,0))) AS DOUBLE) AS szz
      FROM base
    )
    SELECT CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta_ols,
           ROUND((n * szy - sz * sy) / (n * szx - sz * sx), 6) AS beta_iv,
           ROUND(((n * szx - sz * sx) * (n * szx - sz * sx)
                  / ((n * szz - sz * sz) * (n * sxx - sx * sx)))
                 / (CAST(1.0 AS DOUBLE)
                    - (n * szx - sz * sx) * (n * szx - sz * sx)
                      / ((n * szz - sz * sz) * (n * sxx - sx * sx)))
                 * (n - 2), 4) AS first_stage_f
    FROM mom
"""


@query("q466_iv_2sls", oracle=_IV_SQL)
def q466_iv_2sls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variable (Wald/2SLS) estimate of the quantity ->
    revenue slope with ship-month parity as the instrument, beside
    plain OLS, plus the first-stage F statistic (F = r^2/(1-r^2) *
    (n-2) from the z~x correlation). On this synthetic data the
    instrument is weak BY CONSTRUCTION — the F row is the audit that
    says so, which is exactly what the estimator is for. All moments
    are exact integer DECIMAL sums converted to DOUBLE once; the
    estimator is one shared straight-line expression. One scan,
    constant-size moment row."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_IV_SQL)


# ---------------------------------------------------------------------------
# q467 — regression discontinuity


_RDD_SQL = f"""
    WITH items AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS y
      FROM lineitem GROUP BY l_orderkey
    ),
    base AS (
      SELECT ({O_CENTS} - {RDD_CUTOFF_CENTS}) AS r,
             COALESCE(i.y, 0) AS y
      FROM orders o LEFT JOIN items i ON i.l_orderkey = o.o_orderkey
      WHERE ABS({O_CENTS} - {RDD_CUTOFF_CENTS}) <= {RDD_BANDWIDTH_CENTS}
    ),
    mom AS (
      SELECT CASE WHEN r >= 0 THEN 'right' ELSE 'left' END AS side,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(r AS DECIMAL(38,0))) AS DOUBLE) AS sr,
             CAST(SUM(CAST(r * y AS DECIMAL(38,0))) AS DOUBLE) AS sry,
             CAST(SUM(CAST(r * r AS DECIMAL(38,0))) AS DOUBLE) AS srr
      FROM base GROUP BY CASE WHEN r >= 0 THEN 'right' ELSE 'left' END
    ),
    fits AS (
      SELECT side, CAST(n AS BIGINT) AS n,
             (sy * srr - sr * sry) / (n * srr - sr * sr) AS icpt
      FROM mom
    )
    SELECT {RDD_CUTOFF_CENTS} AS cutoff_cents,
           {RDD_BANDWIDTH_CENTS} AS bandwidth_cents,
           MAX(CASE WHEN side = 'left' THEN n END) AS n_left,
           MAX(CASE WHEN side = 'right' THEN n END) AS n_right,
           ROUND(MAX(CASE WHEN side = 'left' THEN icpt END), 6) AS intercept_left,
           ROUND(MAX(CASE WHEN side = 'right' THEN icpt END), 6) AS intercept_right,
           ROUND(MAX(CASE WHEN side = 'right' THEN icpt END)
                 - MAX(CASE WHEN side = 'left' THEN icpt END), 6) AS rdd_effect
    FROM fits
"""


@query("q467_regression_discontinuity", oracle=_RDD_SQL)
def q467_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression discontinuity at a $250k order-price cutoff:
    local-linear fit of items-per-order on the centered running
    variable within a $150k bandwidth on each side; effect = the jump
    between the two intercepts AT the cutoff (closed-form OLS
    intercepts from exact integer moments). No discontinuity is
    planted, so the effect hovers near zero — the estimator's null
    behavior, which the oracle pins exactly. One scan + one keyed
    count join; two moment rows."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_RDD_SQL)


# ---------------------------------------------------------------------------
# q468 — Oaxaca-Blinder decomposition


_OAXACA_SQL = f"""
    WITH items AS (
      SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
      FROM lineitem GROUP BY l_orderkey
    ),
    base AS (
      SELECT o.o_orderstatus AS g, {O_CENTS} AS y, COALESCE(i.x, 0) AS x
      FROM orders o LEFT JOIN items i ON i.l_orderkey = o.o_orderkey
      WHERE o.o_orderstatus IN ('F', 'O')
    ),
    mom AS (
      SELECT g,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx
      FROM base GROUP BY g
    ),
    fits AS (
      SELECT g, n, sy / n AS ybar, sx / n AS xbar,
             (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b,
             (sy * sxx - sx * sxy) / (n * sxx - sx * sx) AS a
      FROM mom
    )
    SELECT ROUND((o.ybar - f.ybar) / CAST(100 AS DOUBLE), 4) AS mean_gap,
           ROUND(f.b * (o.xbar - f.xbar) / CAST(100 AS DOUBLE), 4) AS explained,
           ROUND(((o.a - f.a) + (o.b - f.b) * o.xbar) / CAST(100 AS DOUBLE), 4)
             AS unexplained,
           ROUND(f.b / CAST(100 AS DOUBLE), 6) AS slope_ref,
           ROUND(o.b / CAST(100 AS DOUBLE), 6) AS slope_other
    FROM (SELECT * FROM fits WHERE g = 'F') f
    CROSS JOIN (SELECT * FROM fits WHERE g = 'O') o
"""


@query("q468_oaxaca_blinder", oracle=_OAXACA_SQL)
def q468_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca-Blinder decomposition of the mean order-price gap
    between status groups O and F with items-per-order as the
    covariate and F's coefficients as the reference: gap = explained
    (reference slope x endowment difference) + unexplained
    (coefficient shift evaluated at O's mean). The identity
    gap = explained + unexplained holds exactly (closed-form OLS per
    group from exact integer moments). Two moment rows, one join."""
    _views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_OAXACA_SQL)


# ---------------------------------------------------------------------------
# q469 — event study


def _event_sql(dialect: str) -> str:
    us = _us(dialect)
    day_us = 86_400_000_000
    return f"""
    WITH anchors AS (
      SELECT user_id, MIN({us}) AS a_us
      FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    rel AS (
      SELECT CAST(FLOOR(CAST({us} - a.a_us AS DOUBLE) / {day_us}) AS BIGINT)
               AS rel_day,
             e.value AS v
      FROM events e JOIN anchors a ON a.user_id = e.user_id
    )
    SELECT rel_day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(CAST(ROUND(v, 2) AS DECIMAL(38,2))) AS DOUBLE)
                 / COUNT(*), 4) AS mean_value
    FROM rel
    WHERE rel_day BETWEEN -{EVENT_WINDOW_DAYS} AND {EVENT_WINDOW_DAYS}
    GROUP BY rel_day
    """


@query("q469_event_study", oracle=_event_sql("duck"))
def q469_event_study(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event study around each user's FIRST purchase: mean event value
    by relative day in [-7, +7] — the leads/lags plot that must be
    flat pre-event for any DiD on this feed to be credible. Relative
    day = FLOOR of an exact integer microsecond delta over a double
    division (identical on both engines; C-style integer %/div would
    truncate negatives toward zero instead of flooring). Values
    accumulate as 2-dp DECIMAL. One anchor aggregate + one keyed join
    + one group-by — all shuffles on user_id/rel_day."""
    _views(spark, sf_dir, "events")
    return spark.sql(_event_sql("spark"))


# ---------------------------------------------------------------------------
# q470 — permutation test


def _perm_sql(dialect: str) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH users AS (
      SELECT user_id,
             CASE WHEN substr(md5(CAST(user_id AS {str_t}) || '_t'), 1, 1)
                  IN {EVEN_HEX} THEN 1 ELSE 0 END AS t,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2))) AS DOUBLE)
               / COUNT(*) AS ymean
      FROM events GROUP BY user_id
    ),
    obs AS (
      SELECT SUM(CASE WHEN t = 1 THEN CAST(ROUND(ymean, 8) AS DECIMAL(38,8))
                 ELSE CAST(0 AS DECIMAL(38,8)) END) AS s1,
             SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN t = 0 THEN CAST(ROUND(ymean, 8) AS DECIMAL(38,8))
                 ELSE CAST(0 AS DECIMAL(38,8)) END) AS s0,
             SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n0
      FROM users
    ),
    obs_d AS (
      SELECT CAST(s1 AS DOUBLE) / NULLIF(n1, 0)
             - CAST(s0 AS DOUBLE) / NULLIF(n0, 0) AS d
      FROM obs
    ),
    perms AS (
      -- permuted label = parity of an md5 hex digit (hash, not RNG)
      SELECT j.j,
             CASE WHEN substr(md5(CAST(u.user_id AS {str_t}) || '_p_'
                              || CAST(j.j AS {str_t})), 1, 1)
                  IN {EVEN_HEX} THEN 1 ELSE 0 END AS t,
             u.ymean
      FROM {_grid(dialect, 1, N_PERMS, "j")} j CROSS JOIN users u
    ),
    perm_d AS (
      SELECT j,
             CAST(SUM(CASE WHEN t = 1
                      THEN CAST(ROUND(ymean, 8) AS DECIMAL(38,8))
                      ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
               / NULLIF(SUM(CASE WHEN t = 1 THEN 1 ELSE 0 END), 0)
             - CAST(SUM(CASE WHEN t = 0
                        THEN CAST(ROUND(ymean, 8) AS DECIMAL(38,8))
                        ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE)
               / NULLIF(SUM(CASE WHEN t = 0 THEN 1 ELSE 0 END), 0) AS d
      FROM perms GROUP BY j
    )
    SELECT ROUND(o.d, 6) AS observed_diff,
           {N_PERMS} AS n_perms,
           CAST(SUM(CASE WHEN ABS(p.d) >= ABS(o.d) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_extreme,
           ROUND((CAST(1.0 AS DOUBLE)
                  + SUM(CASE WHEN ABS(p.d) >= ABS(o.d) THEN 1 ELSE 0 END))
                 / (1 + {N_PERMS}), 4) AS p_value
    FROM perm_d p CROSS JOIN obs_d o
    GROUP BY o.d
"""


@query("q470_permutation_test", oracle=_perm_sql("duck"))
def q470_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fisher-style permutation test for the difference in mean user
    value between two deterministic hash-split user cohorts (a true
    null, so the p-value should be uniform-ish — every event type
    occurs for every user in this synthetic feed, so no behavioral
    treatment separates anyone): 19 md5 label permutations, exact
    p-value
    (1 + #extreme)/(1 + B) — the add-one form that keeps the test
    valid at finite B (Phipson & Smyth 2010). The permutation grid
    multiplies the PER-USER aggregate (one row per user), never the
    event table, so B scales free of the corpus. Group means come
    from 8-dp DECIMAL sums; each diff is two terminal divisions."""
    _views(spark, sf_dir, "events")
    return spark.sql(_perm_sql("spark"))
