"""Queueing & capacity batch 86 (q496-q500) — the ops-planning math a
platform team runs on the same event feed the analytics run on,
beside q274 (peak concurrency), q351 (SLO burn), q352 (MTBF):

- q496 Little's law audit: L = lambda * W checked EMPIRICALLY —
  arrival rate and mean duration of 30-min-gap sessions (q14's
  sessionization) vs the time-average concurrency measured at 720
  independent mid-hour snapshots. The gap between L_measured and
  lambda*W is the non-stationarity signal;
- q497 Erlang-C staffing: offered load a = lambda * W from the data,
  then for each agent count c the waiting probability via the
  Erlang-B recurrence B_k = a B / (k + a B) (a CTE chain — exact
  straight-line arithmetic, no factorials, no pow) and the average
  speed of answer;
- q498 capacity headroom: hourly event-rate p50/p95/max against a
  provisioned-capacity grid — hours over capacity and headroom
  ratios (exact percentiles over the 720-row hourly table);
- q499 burst episodes: hours where the rate exceeds 2x the trailing
  24 h median, glued into episodes (gaps-and-islands on the hourly
  table) — count, longest, total burst hours;
- q500 autoscaling simulation: desired instances from a
  70%-target-utilization policy with a 3 h scale-down lag (trailing
  window max), vs the ideal — instance-hours, over-provision share,
  under-provisioned hours.

Determinism: sessions and rates are integer microsecond/count
arithmetic; the Erlang recurrence is a 16-step CTE chain of exact
IEEE ops identical on both engines (rule 6); percentiles are exact
order statistics on the bounded hourly table; medians come from
MEDIAN over 24-row windows via a bounded self-join.

100 TB shapes: ONE user-keyed session pass + ONE hourly aggregate;
everything downstream (snapshots, staffing, policy) joins literal
grids against <= 720 bounded rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

ANCHOR_US = 1_704_067_200_000_000  # 2024-01-01 UTC
SPAN_HOURS = 720  # 30 days
GAP_US = 30 * 60 * 1_000_000
HOUR_US = 3_600_000_000
ERLANG_C_GRID = (2, 4, 8, 16)
CAP_GRID = (10, 20, 40)  # events/hour provisioned capacity
UTIL_TARGET = 0.7
PER_INSTANCE = 10.0  # events/hour one instance absorbs


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _sessions(dialect: str) -> str:
    """q14's 30-minute-gap sessionization to (user, start_us, end_us)."""
    us = _us(dialect)
    return f"""seq AS (
      SELECT user_id, {us} AS t,
             CASE WHEN {us} - LAG({us}) OVER (PARTITION BY user_id
                                              ORDER BY ts, event_id)
                       > {GAP_US}
                  OR LAG({us}) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_s
      FROM events
    ),
    numbered AS (
      SELECT user_id, t,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY t) AS sid
      FROM seq
    ),
    sessions AS (
      SELECT user_id, sid, MIN(t) AS start_us, MAX(t) AS end_us
      FROM numbered GROUP BY user_id, sid
    )"""


def _hourly(dialect: str) -> str:
    us = _us(dialect)
    return f"""hourly AS (
      SELECT CAST(FLOOR(CAST({us} - {ANCHOR_US} AS DOUBLE) / {HOUR_US})
                  AS BIGINT) AS h,
             CAST(COUNT(*) AS BIGINT) AS rate
      FROM events
      WHERE {us} >= {ANCHOR_US}
        AND {us} < {ANCHOR_US} + {SPAN_HOURS} * CAST({HOUR_US} AS BIGINT)
      GROUP BY 1
    )"""


def _lw_stats(dialect: str) -> str:
    """lambda (sessions/hour), W (mean session hours), from sessions."""
    return f"""lw AS (
      SELECT CAST(COUNT(*) AS DOUBLE) / {SPAN_HOURS} AS lam,
             CAST(SUM(CAST(end_us - start_us AS DECIMAL(38,0))) AS DOUBLE)
               / COUNT(*) / {HOUR_US} AS w
      FROM sessions
    )"""


# ---------------------------------------------------------------------------
# q496 — Little's law audit


def _little_sql(dialect: str) -> str:
    if dialect == "spark":
        grid = f"(SELECT explode(sequence(0, {SPAN_HOURS - 1})) AS h)"
    else:
        grid = f"(SELECT unnest(range(0, {SPAN_HOURS})) AS h)"
    return f"""
    WITH {_sessions(dialect)},{_lw_stats(dialect)},
    snaps AS (SELECT h FROM {grid} g),
    concurrency AS (
      SELECT s.h,
             CAST(COUNT(se.user_id) AS BIGINT) AS c
      FROM snaps s
      LEFT JOIN sessions se
        ON se.start_us <= {ANCHOR_US} + s.h * CAST({HOUR_US} AS BIGINT)
                          + {HOUR_US // 2}
       AND se.end_us > {ANCHOR_US} + s.h * CAST({HOUR_US} AS BIGINT)
                       + {HOUR_US // 2}
      GROUP BY s.h
    ),
    lmeas AS (
      SELECT CAST(SUM(c) AS DOUBLE) / {SPAN_HOURS} AS l FROM concurrency
    )
    SELECT ROUND(lw.lam, 4) AS lambda_per_h,
           ROUND(lw.w, 6) AS w_hours,
           ROUND(lw.lam * lw.w, 4) AS l_littles,
           ROUND(lm.l, 4) AS l_measured,
           ROUND(ABS(lw.lam * lw.w - lm.l), 4) AS abs_gap
    FROM lw CROSS JOIN lmeas lm
    """


@query("q496_littles_law", oracle=_little_sql("duck"))
def q496_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit: lambda * W from the session table vs the
    time-average concurrency measured at 720 mid-hour snapshots (a
    left range-join of the literal snapshot grid against the bounded
    session table — at 100 TB bucket sessions by hour first, the q96
    interval-bucket shape). Mid-hour offsets avoid boundary ties;
    durations are exact integer microseconds. The gap quantifies
    non-stationarity, not estimator error."""
    _views(spark, sf_dir)
    return spark.sql(_little_sql("spark"))


# ---------------------------------------------------------------------------
# q497 — Erlang-C staffing


def _erlang_sql(dialect: str) -> str:
    c_max = max(ERLANG_C_GRID)
    chain = ["eb0 AS (SELECT lam, w, lam * w AS a, CAST(1.0 AS DOUBLE) AS b FROM lw)"]
    for k in range(1, c_max + 1):
        chain.append(
            f"eb{k} AS (SELECT lam, w, a, a * b / ({k} + a * b) AS b FROM eb{k - 1})"
        )
    picks = " UNION ALL ".join(
        f"SELECT {c} AS c, a, lam, w, b FROM eb{c}" for c in ERLANG_C_GRID
    )
    return f"""
    WITH {_sessions(dialect)},{_lw_stats(dialect)},
    {",".join(chain)},
    staff AS ({picks})
    SELECT c AS agents,
           ROUND(a, 4) AS offered_erlangs,
           ROUND(a / c, 4) AS utilization,
           ROUND(c * b / (c - a * (CAST(1.0 AS DOUBLE) - b)), 6) AS p_wait,
           ROUND(c * b / (c - a * (CAST(1.0 AS DOUBLE) - b))
                 * w / (c * (CAST(1.0 AS DOUBLE) - a / c)) * 60, 4)
             AS asa_minutes
    FROM staff
    WHERE a / c < CAST(1.0 AS DOUBLE)
    """


@query("q497_erlang_c_staffing", oracle=_erlang_sql("duck"))
def q497_erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing table from the live feed: offered load
    a = lambda * W (session arrivals x mean session hours), then per
    agent count the waiting probability via the Erlang-B recurrence
    B_k = aB/(k + aB) — a 16-step CTE chain of exact straight-line
    IEEE arithmetic (no factorials, no pow, rule 6) — converted to
    Erlang C, plus the average speed of answer. Unstable rows
    (utilization >= 1) are excluded by the formula's own domain.
    The whole table is arithmetic on ONE scalar row."""
    _views(spark, sf_dir)
    return spark.sql(_erlang_sql("spark"))


# ---------------------------------------------------------------------------
# q498 — capacity headroom


def _headroom_sql(dialect: str) -> str:
    caps = " UNION ALL ".join(f"SELECT {c} AS cap" for c in CAP_GRID)
    return f"""
    WITH {_hourly(dialect)},
    ranked AS (
      SELECT rate,
             ROW_NUMBER() OVER (ORDER BY rate, h) AS rn,
             COUNT(*) OVER () AS n
      FROM hourly
    ),
    pct AS (
      SELECT MAX(CASE WHEN rn = CAST(FLOOR(n * CAST(0.5 AS DOUBLE)) AS BIGINT) + 1
                      THEN rate END) AS p50,
             MAX(CASE WHEN rn = CAST(FLOOR(n * CAST(0.95 AS DOUBLE)) AS BIGINT) + 1
                      THEN rate END) AS p95,
             MAX(rate) AS pmax
      FROM ranked
    ),
    grid AS ({caps}),
    over_cap AS (
      SELECT g.cap,
             CAST(SUM(CASE WHEN hy.rate > g.cap THEN 1 ELSE 0 END) AS BIGINT)
               AS hours_over
      FROM grid g CROSS JOIN hourly hy
      GROUP BY g.cap
    )
    SELECT o.cap AS capacity_per_h,
           p.p50, p.p95, p.pmax,
           o.hours_over AS hours_over_capacity,
           ROUND(CAST(o.cap AS DOUBLE) / p.p95, 4) AS headroom_vs_p95
    FROM over_cap o CROSS JOIN pct p
    """


@query("q498_capacity_headroom", oracle=_headroom_sql("duck"))
def q498_capacity_headroom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity headroom table: exact p50/p95/max of the hourly event
    rate (k-th order statistics over the 720-row hourly aggregate —
    rank selection, not percentile interpolation, per the q464
    lesson) against a provisioned-capacity grid — hours over capacity
    and the p95 headroom ratio. The hourly table is the only scan
    product; the grid is literal."""
    _views(spark, sf_dir)
    return spark.sql(_headroom_sql("spark"))


# ---------------------------------------------------------------------------
# q499 — burst episodes


def _burst_sql(dialect: str) -> str:
    return f"""
    WITH {_hourly(dialect)},
    base AS (
      -- trailing 24h median via a bounded self-join on the hourly table
      SELECT a.h, a.rate,
             CAST(MEDIAN(b.rate) AS DOUBLE) AS med24
      FROM hourly a JOIN hourly b
        ON b.h BETWEEN a.h - 24 AND a.h - 1
      GROUP BY a.h, a.rate
    ),
    flagged AS (
      SELECT h, rate, med24,
             CASE WHEN rate > 2 * med24 THEN 1 ELSE 0 END AS burst
      FROM base
    ),
    islands AS (
      SELECT h, burst,
             h - ROW_NUMBER() OVER (ORDER BY h) AS grp
      FROM flagged WHERE burst = 1
    ),
    episodes AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM islands GROUP BY grp
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_episodes,
           COALESCE(CAST(MAX(len) AS BIGINT), 0) AS longest_hours,
           COALESCE(CAST(SUM(len) AS BIGINT), 0) AS total_burst_hours
    FROM episodes
    """


@query("q499_burst_episodes", oracle=_burst_sql("duck"))
def q499_burst_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection: hours whose event rate exceeds 2x the trailing
    24 h median, glued into contiguous episodes by gaps-and-islands —
    episode count, longest, and total burst hours (the capacity
    events q498's static grid cannot see). The trailing median rides
    a +/-24-row self-join on the 720-row hourly table; islands use
    the h - row_number trick over burst hours only (calendar-bounded,
    rule 15)."""
    _views(spark, sf_dir)
    return spark.sql(_burst_sql("spark"))


# ---------------------------------------------------------------------------
# q500 — autoscaling simulation


def _autoscale_sql(dialect: str) -> str:
    return f"""
    WITH {_hourly(dialect)},
    desired AS (
      -- target-utilization policy: enough instances to keep each at
      -- <= 70% of its per-instance rate
      SELECT h, rate,
             GREATEST(CAST(1 AS BIGINT),
               CAST(-FLOOR(-(rate / CAST({PER_INSTANCE * UTIL_TARGET!r}
                    AS DOUBLE))) AS BIGINT)) AS ideal_inst
      FROM hourly
    ),
    lagged AS (
      -- scale up instantly, scale down only after 3 quiet hours:
      -- provisioned = max desired over the trailing 3h window
      SELECT h, rate, ideal_inst,
             MAX(ideal_inst) OVER (ORDER BY h
                                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
               AS prov_inst
      FROM desired
    )
    SELECT CAST(SUM(ideal_inst) AS BIGINT) AS ideal_instance_hours,
           CAST(SUM(prov_inst) AS BIGINT) AS provisioned_instance_hours,
           ROUND(CAST(SUM(prov_inst - ideal_inst) AS DOUBLE)
                 / SUM(ideal_inst), 4) AS overprovision_share,
           CAST(SUM(CASE WHEN rate > prov_inst * CAST({PER_INSTANCE!r} AS DOUBLE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS hours_underprovisioned
    FROM lagged
    """


@query("q500_autoscaling_sim", oracle=_autoscale_sql("duck"))
def q500_autoscaling_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autoscaling policy simulation on the real hourly rates: desired
    instances from a 70%-target-utilization rule (ceiling via
    -FLOOR(-x), shared on both engines), provisioned = trailing-3h
    max (scale up instantly, down lazily) — total instance-hours vs
    ideal, the over-provision share the lag costs, and the hours the
    policy still under-provisions. One window over the 720-row hourly
    table; policy constants are Python literals."""
    _views(spark, sf_dir)
    return spark.sql(_autoscale_sql("spark"))
