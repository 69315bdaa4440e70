"""Stream-hygiene batch 76 (q447-q450) — the batch-side audits that
SIZE the streaming configuration (streaming/assembly.py, fifoset,
dedup_recent all carry watermark/gap constants; these queries are how
those constants get chosen from the data instead of guessed):

- q447 watermark tuning: synthesize per-event arrival delay (md5-
  deterministic heavy-tailed), and for each candidate watermark in a
  grid report the share of events a streaming aggregate would drop as
  too-late — the completeness-vs-state-size dial;
- q448 out-of-order rate: per-user arrival-order inversions relative
  to event time (adjacent inversions and their gap distribution) —
  how disordered the feed actually is, the input to any
  reorder-buffer decision;
- q449 duplicate-delivery audit: planted ~5% redelivery with hash
  delays; for each dedup-window candidate, the share of duplicates a
  dropDuplicatesWithinWatermark would catch — sizes the q20/fifoset
  TTL honestly;
- q450 session-gap sensitivity: session counts at each gap threshold
  in a grid, computed by thresholding the PRE-AGGREGATED inter-event
  gap distribution (one shuffle; a new session starts where a gap
  exceeds the threshold) — the tuning curve behind q14's 30-minute
  constant.

Determinism: all delays/duplicates are md5-derived integers; every
metric is exact integer counting with terminal divisions.

100 TB shapes: one user-keyed window pass each (the q14 shuffle);
every grid sweeps over pre-aggregated gap/delay tables, so grid size
never re-scans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

WM_GRID_MIN = (1, 5, 15, 60)
DEDUP_GRID_MIN = (1, 5, 15, 60)
SESSION_GRID_MIN = (5, 15, 30, 60, 120)
DUP_RATE_MOD = 20  # 1-in-20 events redelivered


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _h(dialect: str, suffix: str) -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    if dialect == "spark":
        return (
            f"CAST(conv(substring(md5(CAST(event_id AS {str_t}) || "
            f"'{suffix}'), 1, 4), 16, 10) AS BIGINT)"
        )
    return (
        f"(('0x' || substr(md5(CAST(event_id AS {str_t}) || '{suffix}'),"
        f" 1, 4))::BIGINT)"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _grid(dialect: str, vals: tuple) -> str:
    lits = ", ".join(str(v) for v in vals)
    if dialect == "spark":
        return f"(SELECT explode(array({lits})) AS wm_min)"
    return f"(SELECT unnest([{lits}]) AS wm_min)"


# ---------------------------------------------------------------------------
# q447 — watermark tuning


def _wm_sql(dialect: str) -> str:
    h = _h(dialect, "_d")
    return f"""
    WITH delayed AS (
      -- heavy-tailed arrival delay: 90% under 60s, tail up to ~2h
      SELECT CASE WHEN ({h}) % 10 < 9
                  THEN ({h}) % 60
                  ELSE 60 + (({h}) % 7200) END AS delay_s
      FROM events
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM delayed),
    dist AS (
      SELECT delay_s, CAST(COUNT(*) AS BIGINT) AS c
      FROM delayed GROUP BY delay_s
    )
    SELECT g.wm_min AS watermark_minutes,
           CAST(SUM(CASE WHEN d.delay_s > g.wm_min * 60 THEN d.c
                         ELSE 0 END) AS BIGINT) AS dropped_events,
           ROUND(CAST(SUM(CASE WHEN d.delay_s > g.wm_min * 60 THEN d.c
                               ELSE 0 END) AS DOUBLE) / t.n, 6)
             AS dropped_share
    FROM {_grid(dialect, WM_GRID_MIN)} g
    CROSS JOIN dist d CROSS JOIN tot t
    GROUP BY g.wm_min, t.n ORDER BY g.wm_min
    """


@query("q447_watermark_tuning", oracle=_wm_sql("duck"))
def q447_watermark_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark completeness curve: with an md5-deterministic heavy-
    tailed arrival delay (90% under a minute, tail to 2h), the share
    of events each candidate watermark would declare too-late — the
    completeness-vs-state-size dial that picks the withWatermark
    constant for streaming/assembly.py and dedup_recent (today those
    carry reference constants; this is how a NEW deployment would set
    them from its own feed). The grid sweeps the pre-aggregated delay
    distribution — one corpus pass for any grid."""
    _events_view(spark, sf_dir)
    return spark.sql(_wm_sql("spark"))


# ---------------------------------------------------------------------------
# q448 — out-of-order rate


def _ooo_sql(dialect: str) -> str:
    h = _h(dialect, "_d")
    us = _us(dialect)
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH arrivals AS (
      SELECT user_id, {us} AS ets,
             {us} + (CASE WHEN ({h}) % 10 < 9
                          THEN ({h}) % 60
                          ELSE 60 + (({h}) % 7200) END) * 1000000 AS ats
      FROM events
    ),
    seq AS (
      SELECT user_id, ets,
             LAG(ets) OVER (PARTITION BY user_id ORDER BY ats, ets) AS prev_ets
      FROM arrivals
    ),
    marked AS (
      SELECT CASE WHEN prev_ets IS NULL THEN NULL
                  WHEN ets < prev_ets THEN 1 ELSE 0 END AS inverted,
             CASE WHEN prev_ets IS NOT NULL AND ets < prev_ets
                  THEN (prev_ets - ets) {idiv} 1000000 END AS inversion_gap_s
      FROM seq
    )
    SELECT CAST(COUNT(inverted) AS BIGINT) AS n_transitions,
           CAST(SUM(inverted) AS BIGINT) AS n_inversions,
           ROUND(CAST(SUM(inverted) AS DOUBLE) / COUNT(inverted), 6)
             AS inversion_rate,
           CAST(MAX(inversion_gap_s) AS BIGINT) AS max_inversion_gap_s
    FROM marked
    """


@query("q448_out_of_order_rate", oracle=_ooo_sql("duck"))
def q448_out_of_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed disorder audit: replay each user's events in ARRIVAL order
    (event time + the q447 synthetic delay) and count adjacent
    event-time inversions and their maximum size — the reorder-buffer
    sizing input (the misordered-fragments fixture is the flight-feed
    instance of exactly this). One user-keyed window pass; integer
    microsecond arithmetic throughout."""
    _events_view(spark, sf_dir)
    return spark.sql(_ooo_sql("spark"))


# ---------------------------------------------------------------------------
# q449 — duplicate-delivery audit


def _dup_sql(dialect: str) -> str:
    h = _h(dialect, "_r")
    return f"""
    WITH dups AS (
      -- 1-in-{DUP_RATE_MOD} events redelivered after an md5 delay
      SELECT ({h}) % 1800 AS redelivery_delay_s
      FROM events WHERE ({h}) % {DUP_RATE_MOD} = 0
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_dups FROM dups),
    dist AS (
      SELECT redelivery_delay_s, CAST(COUNT(*) AS BIGINT) AS c
      FROM dups GROUP BY redelivery_delay_s
    )
    SELECT g.wm_min AS dedup_window_minutes,
           t.n_dups,
           CAST(SUM(CASE WHEN d.redelivery_delay_s <= g.wm_min * 60
                         THEN d.c ELSE 0 END) AS BIGINT) AS caught,
           ROUND(CAST(SUM(CASE WHEN d.redelivery_delay_s <= g.wm_min * 60
                               THEN d.c ELSE 0 END) AS DOUBLE) / t.n_dups,
                 6) AS capture_rate
    FROM {_grid(dialect, DEDUP_GRID_MIN)} g
    CROSS JOIN dist d CROSS JOIN tot t
    GROUP BY g.wm_min, t.n_dups ORDER BY g.wm_min
    """


@query("q449_dup_delivery_audit", oracle=_dup_sql("duck"))
def q449_dup_delivery_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-delivery capture curve: plant 1-in-{DUP_RATE_MOD}
    redeliveries with md5 delays up to 30 minutes, and for each
    candidate dedup window report the share a
    dropDuplicatesWithinWatermark / FIFOSet TTL of that size would
    catch — the honest sizing of q20's tumbling dedup and fifoset's
    2-hour reference TTL. Grid over the pre-aggregated delay
    distribution; integer counts."""
    _events_view(spark, sf_dir)
    return spark.sql(_dup_sql("spark"))


# ---------------------------------------------------------------------------
# q450 — session-gap sensitivity


def _session_sql(dialect: str) -> str:
    us = _us(dialect)
    return f"""
    WITH seq AS (
      SELECT user_id,
             ({us} - LAG({us}) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) / 1000000
               AS gap_s
      FROM events
    ),
    users_ AS (SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nu
               FROM seq),
    gaps AS (
      SELECT gap_s, CAST(COUNT(*) AS BIGINT) AS c
      FROM seq WHERE gap_s IS NOT NULL GROUP BY gap_s
    )
    -- sessions = users + gaps exceeding the threshold (each oversized
    -- gap starts one new session)
    SELECT g.wm_min AS gap_minutes,
           CAST(u.nu + SUM(CASE WHEN d.gap_s > g.wm_min * 60 THEN d.c
                                ELSE 0 END) AS BIGINT) AS n_sessions,
           ROUND(CAST(u.nu + SUM(CASE WHEN d.gap_s > g.wm_min * 60
                                      THEN d.c ELSE 0 END) AS DOUBLE)
                 / u.nu, 4) AS sessions_per_user
    FROM {_grid(dialect, SESSION_GRID_MIN)} g
    CROSS JOIN gaps d CROSS JOIN users_ u
    GROUP BY g.wm_min, u.nu ORDER BY g.wm_min
    """


@query("q450_session_gap_sensitivity", oracle=_session_sql("duck"))
def q450_session_gap_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-gap tuning curve: session counts at every gap threshold
    in the grid, from ONE user-keyed pass that pre-aggregates the
    inter-event gap distribution (sessions = users + oversized gaps —
    the gaps-and-islands identity, so no per-threshold re-
    sessionization) — the curve q14's 30-minute constant (and the
    assembly close gap) should be read off. Monotone decreasing in
    the threshold (asserted)."""
    _events_view(spark, sf_dir)
    return spark.sql(_session_sql("spark"))
