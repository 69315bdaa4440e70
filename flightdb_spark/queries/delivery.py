"""Software-delivery-metrics batch 195 (q1042-q1046) — the DORA
four-key framework (deployment frequency, lead time for changes, mean
time to restore, change failure rate; Accelerate, Forsgren et al.
2018) read off the events stream: purchases play deployments, clicks
play the change signal, errors play incidents. The same event-stream
shapes (per-user carry-forward joins, daily censuses, literal
threshold scorecards) power any ops/telemetry pipeline.

All time arithmetic is EXACT MICROSECONDS (unix_micros / epoch_us —
the q327/q328 sub-second lesson); every rate/mean is an exact integer
rational (num/den) with one terminal double; every grade decision is
an integer cross-product against literal thresholds.

- q1042 deployment frequency: daily deploy counts with a per-day
  literal-threshold intensity class and the period summary columns;
- q1043 lead time for changes: each deploy joined to the SAME USER's
  most recent prior change signal via a partitioned carry-forward
  MAX window (no self-join); daily mean/max lead in exact micros;
- q1044 mean time to restore: each incident joined to the same
  user's next non-error event via a partitioned FOLLOWING-frame MIN;
  daily MTTR rationals plus unresolved counts;
- q1045 change failure rate: deploys followed by an incident within
  a literal 1-hour window (same user), daily exact-rational CFR;
- q1046 delivery scorecard: the four keys composed into one row with
  literal-threshold grade votes — the executive read-out.

100 TB shape: every query is ONE events pass with user-partitioned
ordered windows (the canonical keyed-stream shuffle) collapsing to a
daily (<= calendar-days) census; no self-joins, no global windows.

Determinism: exact micros; (tmic, event_id) window ordering so equal
timestamps never reorder; num/den rationals; literal thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

FAIL_WINDOW_US = 3_600_000_000  # 1 hour


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _ev_cte(d: str) -> str:
    tmic = "unix_micros(ts)" if d == "spark" else "epoch_us(ts)"
    day = (
        "CAST(date_trunc('day', ts) AS DATE)"
        if d != "spark"
        else "CAST(date_trunc('day', ts) AS DATE)"
    )
    return f"""ev AS (
      SELECT event_id, user_id, event_type,
             CAST({tmic} AS BIGINT) AS tmic,
             {day} AS day
      FROM events
    )"""


def _q1042_sql(d: str) -> str:
    return f"""
    WITH {_ev_cte(d)},
    daily AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_deploys
      FROM ev WHERE event_type = 'purchase'
      GROUP BY day
    ),
    span AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n_deploys) AS BIGINT) AS total
      FROM daily
    )
    SELECT /*+ BROADCAST(s) */ dl.day, dl.n_deploys,
           CAST(CASE WHEN dl.n_deploys >= 10 THEN 'elite'
                     WHEN dl.n_deploys >= 5 THEN 'high'
                     WHEN dl.n_deploys >= 1 THEN 'medium'
                     ELSE 'low' END AS {"STRING" if d == "spark" else "VARCHAR"})
             AS intensity,
           s.total AS period_total,
           s.n_days AS period_days,
           CAST(s.total AS DOUBLE) / s.n_days AS mean_per_day
    FROM daily dl CROSS JOIN span s
    ORDER BY dl.day
    """


@query("q1042_deployment_frequency", oracle=_q1042_sql("duckdb"))
def q1042_deployment_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DORA key 1 — deployment frequency: the daily deploy census with
    a literal-threshold intensity class and the period mean as an
    exact SUM/COUNT rational. One events pass, calendar-bounded
    output."""
    _views(spark, sf_dir)
    return spark.sql(_q1042_sql("spark"))


def _lead_cte(d: str) -> str:
    return f"""{_ev_cte(d)},
    carried AS (
      SELECT event_id, user_id, event_type, tmic, day,
             MAX(CASE WHEN event_type = 'click' THEN tmic END)
               OVER (PARTITION BY user_id ORDER BY tmic, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS last_change_tmic
      FROM ev
    ),
    leads AS (
      SELECT day, tmic - last_change_tmic AS lead_us
      FROM carried
      WHERE event_type = 'purchase' AND last_change_tmic IS NOT NULL
    )"""


def _q1043_sql(d: str) -> str:
    return f"""
    WITH {_lead_cte(d)}
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_deploys,
           CAST(SUM(lead_us) AS BIGINT) AS lead_sum_us,
           CAST(MAX(lead_us) AS BIGINT) AS lead_max_us,
           CAST(SUM(lead_us) AS DOUBLE) / COUNT(*) / 1000000.0
             AS mean_lead_sec
    FROM leads
    GROUP BY day
    ORDER BY day
    """


@query("q1043_lead_time", oracle=_q1043_sql("duckdb"))
def q1043_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DORA key 2 — lead time for changes: each deploy matched to the
    same user's most recent prior change signal by a user-partitioned
    carry-forward MAX window (the as-of join without a self-join);
    daily mean/max lead carried as exact microsecond integers."""
    _views(spark, sf_dir)
    return spark.sql(_q1043_sql("spark"))


def _q1044_sql(d: str) -> str:
    return f"""
    WITH {_ev_cte(d)},
    nexts AS (
      SELECT event_id, user_id, event_type, tmic, day,
             MIN(CASE WHEN event_type <> 'error' THEN tmic END)
               OVER (PARTITION BY user_id ORDER BY tmic, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS recovery_tmic
      FROM ev
    ),
    incidents AS (
      SELECT day,
             recovery_tmic - tmic AS restore_us,
             CASE WHEN recovery_tmic IS NULL THEN 1 ELSE 0 END AS unresolved
      FROM nexts
      WHERE event_type = 'error'
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_incidents,
           CAST(SUM(unresolved) AS BIGINT) AS n_unresolved,
           CAST(SUM(CASE WHEN unresolved = 0 THEN restore_us ELSE 0 END)
             AS BIGINT) AS restore_sum_us,
           CAST(SUM(CASE WHEN unresolved = 0 THEN restore_us ELSE 0 END)
                AS DOUBLE)
             / NULLIF(SUM(1 - unresolved), 0) / 1000000.0 AS mttr_sec
    FROM incidents
    GROUP BY day
    ORDER BY day
    """


@query("q1044_mttr", oracle=_q1044_sql("duckdb"))
def q1044_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DORA key 3 — mean time to restore: each incident matched to the
    same user's next non-error event by a FOLLOWING-frame MIN window;
    daily MTTR as an exact micros rational with unresolved incidents
    counted, never averaged in."""
    _views(spark, sf_dir)
    return spark.sql(_q1044_sql("spark"))


def _q1045_sql(d: str) -> str:
    return f"""
    WITH {_ev_cte(d)},
    nexterr AS (
      SELECT event_id, user_id, event_type, tmic, day,
             MIN(CASE WHEN event_type = 'error' THEN tmic END)
               OVER (PARTITION BY user_id ORDER BY tmic, event_id
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
               AS next_error_tmic
      FROM ev
    ),
    deploys AS (
      SELECT day,
             CASE WHEN next_error_tmic IS NOT NULL
                   AND next_error_tmic - tmic <= {FAIL_WINDOW_US}
                  THEN 1 ELSE 0 END AS failed
      FROM nexterr
      WHERE event_type = 'purchase'
    )
    SELECT day,
           CAST(COUNT(*) AS BIGINT) AS n_deploys,
           CAST(SUM(failed) AS BIGINT) AS n_failed,
           CAST(SUM(failed) AS DOUBLE) / COUNT(*) AS change_failure_rate
    FROM deploys
    GROUP BY day
    ORDER BY day
    """


@query("q1045_change_failure_rate", oracle=_q1045_sql("duckdb"))
def q1045_change_failure_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DORA key 4 — change failure rate: a deploy fails if the same
    user hits an error within the literal 1-hour window; daily CFR as
    an exact integer rational. The window join is the q1044 machinery
    pointed at errors."""
    _views(spark, sf_dir)
    return spark.sql(_q1045_sql("spark"))


def _q1046_sql(d: str) -> str:
    return f"""
    WITH {_lead_cte(d)},
    freq AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total_deploys,
             CAST(COUNT(DISTINCT day) AS BIGINT) AS active_days
      FROM ev WHERE event_type = 'purchase'
    ),
    lt AS (
      SELECT CAST(SUM(lead_us) AS BIGINT) AS lead_sum_us,
             CAST(COUNT(*) AS BIGINT) AS lead_n
      FROM leads
    ),
    rest AS (
      SELECT CAST(SUM(CASE WHEN r.recovery_tmic IS NOT NULL
                       THEN r.recovery_tmic - r.tmic ELSE 0 END) AS BIGINT)
               AS restore_sum_us,
             CAST(SUM(CASE WHEN r.recovery_tmic IS NOT NULL
                       THEN 1 ELSE 0 END) AS BIGINT) AS restored_n
      FROM (
        SELECT tmic, event_type,
               MIN(CASE WHEN event_type <> 'error' THEN tmic END)
                 OVER (PARTITION BY user_id ORDER BY tmic, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS recovery_tmic
        FROM ev
      ) r WHERE r.event_type = 'error'
    ),
    cfr AS (
      SELECT CAST(SUM(CASE WHEN f.next_error_tmic IS NOT NULL
                       AND f.next_error_tmic - f.tmic <= {FAIL_WINDOW_US}
                      THEN 1 ELSE 0 END) AS BIGINT) AS failed_n,
             CAST(COUNT(*) AS BIGINT) AS deploy_n
      FROM (
        SELECT tmic, event_type,
               MIN(CASE WHEN event_type = 'error' THEN tmic END)
                 OVER (PARTITION BY user_id ORDER BY tmic, event_id
                       ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                 AS next_error_tmic
        FROM ev
      ) f WHERE f.event_type = 'purchase'
    )
    SELECT /*+ BROADCAST(l, r, c) */ f.total_deploys, f.active_days,
           l.lead_sum_us, l.lead_n,
           r.restore_sum_us, r.restored_n,
           c.failed_n, c.deploy_n,
           CAST(f.total_deploys AS DOUBLE) / f.active_days AS deploys_per_day,
           CAST(l.lead_sum_us AS DOUBLE) / l.lead_n / 1000000.0
             AS mean_lead_sec,
           CAST(r.restore_sum_us AS DOUBLE) / r.restored_n / 1000000.0
             AS mttr_sec,
           CAST(c.failed_n AS DOUBLE) / c.deploy_n AS cfr,
           CAST(CASE WHEN f.total_deploys >= 5 * f.active_days
                THEN 1 ELSE 0 END AS INT) AS vote_frequency,
           CAST(CASE WHEN l.lead_sum_us < 3600000000 * l.lead_n
                THEN 1 ELSE 0 END AS INT) AS vote_lead,
           CAST(CASE WHEN r.restore_sum_us < 7200000000 * r.restored_n
                THEN 1 ELSE 0 END AS INT) AS vote_mttr,
           CAST(CASE WHEN c.failed_n * 100 < 15 * c.deploy_n
                THEN 1 ELSE 0 END AS INT) AS vote_cfr
    FROM freq f CROSS JOIN lt l CROSS JOIN rest r CROSS JOIN cfr c
    """


@query("q1046_delivery_scorecard", oracle=_q1046_sql("duckdb"))
def q1046_delivery_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The four-key scorecard in one row: period totals for frequency,
    lead time, restore time and failure rate, each with a literal-
    threshold grade vote decided by integer cross-products
    (lead_sum < threshold * n — never a double mean compared to a
    double). Three one-row aggregates cross-joined (broadcastable by
    construction)."""
    _views(spark, sf_dir)
    return spark.sql(_q1046_sql("spark"))
