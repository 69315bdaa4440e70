"""Experimentation-ops batch 75 (q442-q446) — the design/monitoring
layer around q330-q333's readouts:

- q442 group-sequential monitoring: daily cumulative z-statistic of a
  null A/B against literal O'Brien-Fleming-style boundaries at 5
  looks — the peeking-safe monitor (naive daily peeking at 1.96
  inflates false positives; the widened early boundaries are the fix);
- q443 intraclass correlation + design effect: one-way ANOVA moments
  over user clusters -> ICC and DEFF = 1 + (m̄-1)ICC — the number
  that says how much a cluster-randomized experiment's effective
  sample size shrinks;
- q444 UCB1 allocation audit: per event-type "arm", mean reward +
  sqrt(2 ln N / n) exploration bonus — which arm an optimistic
  allocator pulls next and how the bonus ranks low-data arms;
- q445 novelty-effect decay: weekly treatment effect of a hash A/B
  with a PLANTED decaying lift, plus the OLS slope of effect-on-week
  — the launch-analysis pattern that separates novelty spikes from
  durable wins;
- q446 variance-reduction audit: the effect-estimator variance under
  raw difference, CUPED (pre-period covariate), and post-
  stratification, from exact moments — the table that justifies
  which adjustment a platform defaults to.

Determinism: z-statistics, ICC, UCB and variances all reduce to
exact integer/decimal moments with terminal double algebra; the OBF
boundary constants and UCB logs are literal/single expressions; the
planted decay is md5-deterministic.

100 TB shapes: everything is one or two keyed aggregates (days,
clusters, arms, weeks, strata); no windows beyond the bounded daily
table (allowlisted class).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# O'Brien-Fleming-style boundaries for 5 equally-spaced looks
# (two-sided 5%; textbook table values, literal by design)
OBF_BOUNDS = (4.877, 3.357, 2.680, 2.290, 2.031)
NOVELTY_LIFT0 = 120.0  # planted week-0 lift, decaying 30/week
NOVELTY_DECAY = 30.0


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _h(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 4), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 4))::BIGINT)"


def _uid(dialect: str, suffix: str) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return _h(dialect, f"CAST(user_id AS {str_t}) || '{suffix}'")


# ---------------------------------------------------------------------------
# q442 — group-sequential boundaries


def _obf_sql(dialect: str) -> str:
    if dialect == "spark":
        day = "CAST(date_trunc('day', ts) AS DATE)"
        looks = "(SELECT explode(array(1, 2, 3, 4, 5)) AS look)"
    else:
        day = "CAST(date_trunc('day', ts) AS DATE)"
        looks = "(SELECT unnest([1, 2, 3, 4, 5]) AS look)"
    bounds = " ".join(
        f"WHEN {i + 1} THEN {b}" for i, b in enumerate(OBF_BOUNDS)
    )
    grp = _uid(dialect, "_ab")
    return f"""
    WITH assigned AS (
      SELECT {day} AS day, value,
             CASE WHEN ({grp}) % 2 = 0 THEN 1 ELSE 0 END AS grp
      FROM events
    ),
    days_ AS (SELECT DISTINCT day FROM assigned),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM days_),
    ranked_days AS (
      SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS day_idx FROM days_
    ),
    looks_ AS (
      -- pure-integer cutoff compare: day_idx*5 <= look*n_days (a /5.0
      -- decimal would round differently across engines at exact looks)
      SELECT l.look, MAX(rd.day) AS cutoff
      FROM {looks} l, ranked_days rd, nd
      WHERE rd.day_idx * 5 <= l.look * nd.n_days
      GROUP BY l.look
    ),
    cum AS (
      SELECT l.look,
             CAST(SUM(CASE WHEN a.grp = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_t,
             CAST(SUM(CASE WHEN a.grp = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_c,
             CAST(SUM(CASE WHEN a.grp = 1
                      THEN CAST(ROUND(a.value, 2) AS DECIMAL(38,2)) END)
               AS DOUBLE) AS s_t,
             CAST(SUM(CASE WHEN a.grp = 0
                      THEN CAST(ROUND(a.value, 2) AS DECIMAL(38,2)) END)
               AS DOUBLE) AS s_c,
             CAST(SUM(CASE WHEN a.grp = 1
                      THEN CAST(ROUND(a.value * a.value, 2)
                                AS DECIMAL(38,2)) END) AS DOUBLE) AS ss_t,
             CAST(SUM(CASE WHEN a.grp = 0
                      THEN CAST(ROUND(a.value * a.value, 2)
                                AS DECIMAL(38,2)) END) AS DOUBLE) AS ss_c
      FROM looks_ l JOIN assigned a ON a.day <= l.cutoff
      GROUP BY l.look
    ),
    zs AS (
      SELECT look, n_t, n_c,
             (s_t / n_t - s_c / n_c)
             / SQRT((ss_t / n_t - (s_t / n_t) * (s_t / n_t)) / n_t
                    + (ss_c / n_c - (s_c / n_c) * (s_c / n_c)) / n_c) AS z
      FROM cum
    )
    SELECT look, n_t + n_c AS n_cum,
           ROUND(z, 6) AS z_statistic,
           CAST(CASE look {bounds} END AS DOUBLE) AS obf_boundary,
           CAST(CASE WHEN ABS(z) > (CASE look {bounds} END)
                     THEN 1 ELSE 0 END AS INT) AS crosses
    FROM zs ORDER BY look
    """


@query("q442_obf_boundaries", oracle=_obf_sql("duck"))
def q442_obf_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-sequential monitoring: the cumulative two-sample z at 5
    equally-spaced looks against literal O'Brien-Fleming-style
    boundaries — the peeking-safe alternative to checking 1.96 daily
    (which quietly multiplies the false-positive rate). The assignment
    is a null hash A/B, so no boundary should cross (asserted) — the
    null calibration of the monitor itself. Cumulative moments are
    2-dp DECIMAL sums; the day-rank window runs over the bounded
    distinct-day table."""
    _events_view(spark, sf_dir)
    return spark.sql(_obf_sql("spark"))


# ---------------------------------------------------------------------------
# q443 — intraclass correlation + design effect


def _icc_sql(dialect: str) -> str:
    return """
    WITH vals AS (
      SELECT user_id, value FROM events
    ),
    clusters AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2))) AS DOUBLE)
               AS s,
             CAST(SUM(CAST(ROUND(value * value, 2) AS DECIMAL(38,2)))
                  AS DOUBLE) AS ss
      FROM vals GROUP BY user_id
    ),
    tots AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(m) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(s, 2) AS DECIMAL(38,2))) AS DOUBLE)
               AS gs,
             CAST(SUM(CAST(ROUND(ss, 2) AS DECIMAL(38,2))) AS DOUBLE)
               AS gss,
             CAST(SUM(CAST(ROUND(s * s / m, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) AS between_raw,
             CAST(SUM(m * m) AS BIGINT) AS smm
      FROM clusters
    ),
    anova AS (
      -- SSB = sum(s_i^2/m_i) - G^2/N ; SSW = sum(x^2) - sum(s_i^2/m_i);
      -- unequal-size effective m: (N - sum(m^2)/N) / (k - 1)
      SELECT k, n,
             between_raw - gs * gs / n AS ssb,
             gss - between_raw AS ssw,
             (n - CAST(smm AS DOUBLE) / n) / (k - 1) AS m_avg
      FROM tots
    )
    SELECT k AS n_clusters, n AS n_obs,
           ROUND(m_avg, 4) AS m_effective,
           ROUND((ssb / (k - 1) - ssw / (n - k))
                 / (ssb / (k - 1) + (m_avg - 1) * (ssw / (n - k))), 6)
             AS icc,
           ROUND(1 + (CAST(n AS DOUBLE) / k - 1)
                 * GREATEST((ssb / (k - 1) - ssw / (n - k))
                   / (ssb / (k - 1) + (m_avg - 1) * (ssw / (n - k))), 0), 6)
             AS design_effect
    FROM anova
    """


@query("q443_icc_design_effect", oracle=_icc_sql("duck"))
def q443_icc_design_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation of event values within user clusters
    (one-way ANOVA moments: SSB/SSW with the unequal-cluster-size
    effective m), and the design effect DEFF = 1 + (m-1)*ICC — the
    factor a CLUSTER-randomized experiment divides its effective
    sample size by (randomize users, measure events: DEFF is why
    event-level power math overstates precision). Values are i.i.d.
    across users here, so ICC ~ 0 and DEFF ~ 1 — the null calibration
    (asserted). All moments DECIMAL-exact."""
    _events_view(spark, sf_dir)
    return spark.sql(_icc_sql("spark"))


# ---------------------------------------------------------------------------
# q444 — UCB1 allocation audit


def _ucb_sql(dialect: str) -> str:
    return """
    WITH arms AS (
      SELECT event_type AS arm,
             CAST(COUNT(*) AS BIGINT) AS n_pulls,
             CAST(SUM(CAST(ROUND(value / 1000, 6) AS DECIMAL(38,6)))
                  AS DOUBLE) AS reward_sum
      FROM events GROUP BY event_type
    ),
    tot AS (SELECT CAST(SUM(n_pulls) AS BIGINT) AS n FROM arms)
    SELECT a.arm, a.n_pulls,
           ROUND(a.reward_sum / a.n_pulls, 6) AS mean_reward,
           ROUND(SQRT(2 * LN(CAST(t.n AS DOUBLE)) / a.n_pulls), 6)
             AS exploration_bonus,
           ROUND(a.reward_sum / a.n_pulls
                 + SQRT(2 * LN(CAST(t.n AS DOUBLE)) / a.n_pulls), 6)
             AS ucb_score
    FROM arms a CROSS JOIN tot t ORDER BY a.arm
    """


@query("q444_ucb_allocation", oracle=_ucb_sql("duck"))
def q444_ucb_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UCB1 allocation audit (Auer 2002): per event-type arm, the mean
    normalized reward plus the sqrt(2 ln N / n) optimism bonus — the
    score an upper-confidence-bound allocator maximizes when picking
    the next arm, shown as the audit table (which arm is pulled next,
    and how much of its score is data vs optimism). One 5-key
    aggregate; terminal ln/sqrt per arm."""
    _events_view(spark, sf_dir)
    return spark.sql(_ucb_sql("spark"))


# ---------------------------------------------------------------------------
# q445 — novelty-effect decay


def _novelty_sql(dialect: str) -> str:
    grp = _uid(dialect, "_nv")
    if dialect == "spark":
        di = "datediff(CAST(ts AS DATE), DATE '1970-01-01')"
    else:
        di = "(CAST(ts AS DATE) - DATE '1970-01-01')"
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH lo AS (SELECT CAST(MIN({di}) AS BIGINT) AS d0 FROM events),
    assigned AS (
      SELECT (CAST({di} AS BIGINT) - l.d0) {idiv} 7 AS week,
             CASE WHEN ({grp}) % 2 = 0 THEN 1 ELSE 0 END AS grp,
             value + CASE WHEN ({grp}) % 2 = 0
                          THEN GREATEST(CAST({NOVELTY_LIFT0} AS DOUBLE)
                               - {NOVELTY_DECAY}
                                 * ((CAST({di} AS BIGINT) - l.d0) {idiv} 7),
                               CAST(0 AS DOUBLE))
                          ELSE CAST(0 AS DOUBLE) END AS y
      FROM events CROSS JOIN lo l
    ),
    weekly AS (
      SELECT week, grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy
      FROM assigned GROUP BY week, grp
    ),
    effects AS (
      SELECT week,
             MAX(CASE WHEN grp = 1 THEN sy / n END)
             - MAX(CASE WHEN grp = 0 THEN sy / n END) AS effect,
             CAST(SUM(n) AS BIGINT) AS n_week
      FROM weekly GROUP BY week
    )
    SELECT CAST(week AS BIGINT) AS week, n_week,
           ROUND(effect, 6) AS effect
    FROM effects ORDER BY week
    """


@query("q445_novelty_decay", oracle=_novelty_sql("duck"))
def q445_novelty_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty-effect decay: the weekly treatment effect of a hash A/B
    with a PLANTED decaying lift ({NOVELTY_LIFT0} units fading
    {NOVELTY_DECAY}/week) — the launch analysis that separates a
    novelty spike from a durable win by watching the effect trend
    rather than the pooled average (which would report a misleading
    blend). The decay must be visible week-over-week (asserted).
    One (week, group) aggregate; effects are terminal algebra."""
    _events_view(spark, sf_dir)
    return spark.sql(_novelty_sql("spark"))


# ---------------------------------------------------------------------------
# q446 — variance-reduction audit


def _vr_sql(dialect: str) -> str:
    grp = _uid(dialect, "_vr")
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH users AS (
      -- per-user outcome y (late-half value mass) and pre-period
      -- covariate x (early-half value mass), split by event parity
      SELECT user_id,
             CASE WHEN ({grp}) % 2 = 0 THEN 1 ELSE 0 END AS grp,
             CAST(SUM(CASE WHEN event_id % 2 = 0
                      THEN CAST(ROUND(value, 2) AS DECIMAL(38,2)) END)
               AS DOUBLE) AS y,
             CAST(SUM(CASE WHEN event_id % 2 = 1
                      THEN CAST(ROUND(value, 2) AS DECIMAL(38,2)) END)
               AS DOUBLE) AS x,
             CAST(COUNT(*) AS BIGINT) {idiv} 20 AS stratum
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS syy,
             CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS sxx,
             CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS sxy
      FROM users WHERE y IS NOT NULL AND x IS NOT NULL
    ),
    strat AS (
      SELECT CAST(SUM(CAST(ROUND(vy * (ns - 1), 6) AS DECIMAL(38,6)))
                  AS DOUBLE)
             / SUM(ns - 1) AS pooled_within_var
      FROM (
        SELECT stratum, CAST(COUNT(*) AS BIGINT) AS ns,
               (CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE)
                - CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS DOUBLE)
                  * SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) / COUNT(*))
               / (COUNT(*) - 1) AS vy
        FROM users WHERE y IS NOT NULL AND x IS NOT NULL
        GROUP BY stratum HAVING COUNT(*) > 1
      ) t
    )
    SELECT m.n AS n_users,
           ROUND((m.syy - m.sy * m.sy / m.n) / (m.n - 1), 4) AS var_raw,
           -- CUPED: var_y * (1 - rho^2)
           ROUND((m.syy - m.sy * m.sy / m.n) / (m.n - 1)
                 * (1 - POWER(m.sxy - m.sx * m.sy / m.n, 2)
                     / ((m.sxx - m.sx * m.sx / m.n)
                        * (m.syy - m.sy * m.sy / m.n))), 4) AS var_cuped,
           ROUND(s.pooled_within_var, 4) AS var_stratified
    FROM mom m CROSS JOIN strat s
    """


@query("q446_variance_reduction", oracle=_vr_sql("duck"))
def q446_variance_reduction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-reduction audit: the per-user outcome variance under
    (a) raw difference, (b) CUPED with the pre-period covariate
    (var x (1 - rho^2) — the theoretical floor of the q249 adjustment),
    and (c) post-stratification by activity band (pooled within-stratum
    variance) — the three-way table that justifies a platform's default
    adjustment (CUPED <= stratified <= raw here, asserted up to
    degrees-of-freedom noise). Exact DECIMAL moments; terminal
    algebra."""
    _events_view(spark, sf_dir)
    return spark.sql(_vr_sql("spark"))
