"""Behavioral-combinator batch 113 (q631-q635) — the parametric
event-sequence aggregates popularized by ClickHouse's combinator
family (windowFunnel, retention, sequenceMatch, uniqUpTo, sumMap),
re-expressed Spark-first with deterministic first-occurrence
semantics and exact microsecond gap arithmetic:

- q631 windowFunnel: max funnel depth signup->view->click->purchase
  chained from each user's EARLIEST signup, every stage inside a
  1-hour window of the anchor — depth histogram;
- q632 retention combinator: active(day0) AND active(day0+k) flag
  vectors for k in {1, 3, 7, 14}, summed;
- q633 sequenceMatch: two patterns — '(?1)(?t<300)(?2)' (signup then
  click within 300 s) and '(?1).*(?2).*(?3)' (signup, later error,
  later purchase) — matched per user with staged-min chaining;
- q634 uniqUpTo(5): per (event_type, day) distinct-user counts
  reported exactly up to 5 and saturated at 6 beyond — the bounded-
  memory distinct census and its saturation share;
- q635 sumMap as PIVOT: per user-decile, value cents pivoted into
  one column per event type (Spark groupBy().pivot() with a FIXED
  value list so the schema is deterministic; the oracle is
  conditional aggregation).

100 TB shape: every combinator is per-user aggregates chained by
user-keyed equi-joins (one exchange under user bucketing); the gap
arithmetic is exact integer microseconds (q327 lesson); the pivot is
a single 10x5 aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

FUNNEL = ("signup", "view", "click", "purchase")
WINDOW_US = 3600 * 1_000_000
MATCH_GAP_US = 300 * 1_000_000
RETENTION_OFFSETS = (1, 3, 7, 14)
UNIQ_UPTO = 5
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


# ---------------------------------------------------------------------------
# q631 — windowFunnel


def _wfunnel_sql(dialect: str) -> str:
    us = _us(dialect)
    return f"""
    WITH ev AS (SELECT user_id, event_type, {us} AS tus FROM events),
    s1 AS (
      SELECT user_id, MIN(tus) AS t1 FROM ev
      WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.tus) AS t2
      FROM ev e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL[1]}' AND e.tus > s1.t1
        AND e.tus <= s1.t1 + {WINDOW_US}
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.tus) AS t3
      FROM ev e
      JOIN s2 ON s2.user_id = e.user_id
      JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL[2]}' AND e.tus > s2.t2
        AND e.tus <= s1.t1 + {WINDOW_US}
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, MIN(e.tus) AS t4
      FROM ev e
      JOIN s3 ON s3.user_id = e.user_id
      JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL[3]}' AND e.tus > s3.t3
        AND e.tus <= s1.t1 + {WINDOW_US}
      GROUP BY e.user_id
    ),
    depth AS (
      SELECT s1.user_id,
             1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
               + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END
               + CASE WHEN s4.user_id IS NULL THEN 0 ELSE 1 END AS d
      FROM s1
      LEFT JOIN s2 ON s2.user_id = s1.user_id
      LEFT JOIN s3 ON s3.user_id = s1.user_id
      LEFT JOIN s4 ON s4.user_id = s1.user_id
    )
    SELECT CAST(d AS BIGINT) AS funnel_depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM depth
    GROUP BY d
    ORDER BY funnel_depth
    """


def _wfunnel_spark_sql() -> str:
    """One-pass windowFunnel: the staged s1->s4 MIN chain re-expanded
    each stage's lineage under CTE inlining (13 events scans, ~13
    user-grain shuffles in the static plan). A single time-ordered
    fold per user computes the same stage anchors: each stage takes
    the FIRST qualifying event in time order, which IS the MIN the
    staged form takes (strict '>' guards make equal-timestamp tie
    order irrelevant: an event at the anchor's own timestamp fails
    '>' whether it folds before or after the anchor). ONE events scan
    + ONE user exchange (guide sections 2.3/2.4; the q576 fold
    precedent)."""
    w = WINDOW_US
    stage = []
    for i, (prev_t, this_t) in enumerate(
        [("t1", "t2"), ("t2", "t3"), ("t3", "t4")], start=2
    ):
        stage.append(
            f"""'{this_t}', CASE WHEN a.{this_t} IS NULL
                  AND a.{prev_t} IS NOT NULL
                  AND e.event_type = '{FUNNEL[i - 1]}'
                  AND e.tus > a.{prev_t} AND e.tus <= a.t1 + {w}
                 THEN e.tus ELSE a.{this_t} END"""
        )
    stages = ",\n          ".join(stage)
    return f"""
    WITH ev AS (
      SELECT user_id, event_type, {_us("spark")} AS tus FROM events
      WHERE event_type IN ('{FUNNEL[0]}', '{FUNNEL[1]}',
                           '{FUNNEL[2]}', '{FUNNEL[3]}')
    ),
    arr AS (
      SELECT user_id, array_sort(collect_list(struct(tus, event_type))) AS evs
      FROM ev GROUP BY user_id
    ),
    st AS (
      SELECT user_id, aggregate(
        evs,
        named_struct('t1', CAST(NULL AS BIGINT), 't2', CAST(NULL AS BIGINT),
                     't3', CAST(NULL AS BIGINT), 't4', CAST(NULL AS BIGINT)),
        (a, e) -> named_struct(
          't1', CASE WHEN a.t1 IS NULL AND e.event_type = '{FUNNEL[0]}'
                 THEN e.tus ELSE a.t1 END,
          {stages})
      ) AS s
      FROM arr
    ),
    depth AS (
      SELECT user_id,
             1 + CASE WHEN s.t2 IS NULL THEN 0 ELSE 1 END
               + CASE WHEN s.t3 IS NULL THEN 0 ELSE 1 END
               + CASE WHEN s.t4 IS NULL THEN 0 ELSE 1 END AS d
      FROM st WHERE s.t1 IS NOT NULL
    )
    SELECT CAST(d AS BIGINT) AS funnel_depth,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM depth
    GROUP BY d
    ORDER BY funnel_depth
    """


@query("q631_window_funnel", oracle=_wfunnel_sql("duck"))
def q631_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel(1h): max funnel depth chained from each user's
    earliest signup, every later stage strictly after the previous
    AND inside one hour of the anchor (exact integer microseconds).
    ONE events pass + one user-keyed time-ordered fold (the staged
    MIN chain the oracle keeps re-expanded to 13 events scans under
    CTE inlining); each stage anchor is the first qualifying event in
    time order == the staged MIN, then a bounded depth histogram."""
    _views(spark, sf_dir)
    return spark.sql(_wfunnel_spark_sql())


# ---------------------------------------------------------------------------
# q632 — retention combinator


def _dadd(dialect: str, d: str, n: str) -> str:
    if dialect == "spark":
        return f"date_add({d}, {n})"
    return f"({d} + {n})"


def _retention_sql(dialect: str) -> str:
    actives = ", ".join(
        f"""MAX(CASE WHEN CAST(e.ts AS DATE) = {_dadd(dialect, 'm.d0', str(k))}
                 THEN 1 ELSE 0 END) AS f{k}"""
        for k in RETENTION_OFFSETS
    )
    retained = ", ".join(
        f"CAST(SUM(f0 * f{k}) AS BIGINT) AS retained_d{k}"
        for k in RETENTION_OFFSETS
    )
    ratios = ", ".join(
        f"""ROUND(CAST(SUM(f0 * f{k}) AS DOUBLE) / NULLIF(SUM(f0), 0), 6)
             AS rate_d{k}"""
        for k in RETENTION_OFFSETS
    )
    return f"""
    WITH m AS (SELECT MIN(CAST(ts AS DATE)) AS d0 FROM events),
    peruser AS (
      SELECT e.user_id,
             MAX(CASE WHEN CAST(e.ts AS DATE) = m.d0 THEN 1 ELSE 0 END) AS f0,
             {actives}
      FROM events e CROSS JOIN m
      GROUP BY e.user_id
    )
    SELECT CAST(SUM(f0) AS BIGINT) AS active_day0,
           {retained},
           {ratios}
    FROM peruser
    """


@query("q632_retention_combinator", oracle=_retention_sql("duck"))
def q632_retention_combinator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retention() combinator: per-user condition flags
    (active on day0; active on day0+k for k in 1/3/7/14) computed in
    ONE aggregate, then retained counts = sum of ANDed flags — the
    first condition gates all later ones, exactly the ClickHouse
    contract. Two aggregates total, no join beyond the broadcast
    scalar day0."""
    _views(spark, sf_dir)
    return spark.sql(_retention_sql("spark"))


# ---------------------------------------------------------------------------
# q633 — sequenceMatch


def _seqmatch_sql(dialect: str) -> str:
    us = _us(dialect)
    return f"""
    WITH ev AS (SELECT user_id, event_type, {us} AS tus FROM events),
    users AS (SELECT DISTINCT user_id FROM ev),
    p1 AS (
      -- (?1)(?t<300)(?2): a signup followed by a click within 300 s
      SELECT DISTINCT s.user_id
      FROM ev s JOIN ev c ON c.user_id = s.user_id
      WHERE s.event_type = 'signup' AND c.event_type = 'click'
        AND c.tus > s.tus AND c.tus - s.tus < {MATCH_GAP_US}
    ),
    e1 AS (
      SELECT user_id, MIN(tus) AS t FROM ev
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    e2 AS (
      SELECT e.user_id, MIN(e.tus) AS t
      FROM ev e JOIN e1 ON e1.user_id = e.user_id
      WHERE e.event_type = 'error' AND e.tus > e1.t
      GROUP BY e.user_id
    ),
    p2 AS (
      SELECT DISTINCT e.user_id
      FROM ev e JOIN e2 ON e2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.tus > e2.t
    )
    SELECT CAST((SELECT COUNT(*) FROM users) AS BIGINT) AS n_users,
           CAST((SELECT COUNT(*) FROM p1) AS BIGINT) AS match_tight_pair,
           CAST((SELECT COUNT(*) FROM p2) AS BIGINT) AS match_ordered_triple,
           CAST((SELECT COUNT(*) FROM p1 JOIN p2 ON p2.user_id = p1.user_id)
                AS BIGINT) AS match_both,
           ROUND(CAST((SELECT COUNT(*) FROM p1) AS DOUBLE)
                 / (SELECT COUNT(*) FROM users), 6) AS tight_pair_share
    """


def _seqmatch_spark_sql() -> str:
    """One-pass sequenceMatch: the users/p1/e1/e2/p2 CTEs re-expanded
    per scalar-subquery reference (14 events scans). A single
    time-ordered fold per user computes both pattern flags:

    - tight pair: track the latest signup time seen; a click matches
      when it is strictly later and within the gap. Tracking only the
      LATEST signup is sufficient (an earlier signup is farther from
      the click), and the (tus, event_type) sort puts a click before
      any equal-timestamp signup — 'click' < 'signup' — so the
      tracked signup is always strictly earlier, exactly the pair
      join's s.tus < c.tus.
    - ordered triple: first signup, then first error strictly after
      it, then any purchase strictly after that — first-qualifying-
      in-time-order == the staged MINs (strict '>' guards make equal-
      timestamp tie order irrelevant).

    The fold collects ONLY the four event types the patterns inspect
    (signup/click/error/purchase — r10 ADVICE: an unfiltered collect
    ships every event of a heavy-hitter user into one array); n_users
    (the distinct-user census over ALL events) comes from a separate
    column-pruned COUNT DISTINCT, exactly the oracle's `users` CTE.
    ONE events fold pass + one cheap distinct-count pass (guide
    sections 2.3/2.4)."""
    return f"""
    WITH ev AS (SELECT user_id, event_type, {_us("spark")} AS tus FROM events
                WHERE event_type IN ('signup', 'click', 'error', 'purchase')),
    arr AS (
      SELECT user_id, array_sort(collect_list(struct(tus, event_type))) AS evs
      FROM ev GROUP BY user_id
    ),
    st AS (
      SELECT user_id, aggregate(
        evs,
        named_struct('ls', CAST(NULL AS BIGINT), 'f1', 0,
                     't1', CAST(NULL AS BIGINT), 't2', CAST(NULL AS BIGINT),
                     'f2', 0),
        (a, e) -> named_struct(
          'ls', CASE WHEN e.event_type = 'signup' THEN e.tus ELSE a.ls END,
          'f1', CASE WHEN e.event_type = 'click' AND a.ls IS NOT NULL
                      AND e.tus > a.ls AND e.tus - a.ls < {MATCH_GAP_US}
                 THEN 1 ELSE a.f1 END,
          't1', CASE WHEN a.t1 IS NULL AND e.event_type = 'signup'
                 THEN e.tus ELSE a.t1 END,
          't2', CASE WHEN a.t2 IS NULL AND a.t1 IS NOT NULL
                      AND e.event_type = 'error' AND e.tus > a.t1
                 THEN e.tus ELSE a.t2 END,
          'f2', CASE WHEN a.t2 IS NOT NULL
                      AND e.event_type = 'purchase' AND e.tus > a.t2
                 THEN 1 ELSE a.f2 END)
      ) AS s
      FROM arr
    ),
    flags AS (
      SELECT CAST(SUM(s.f1) AS BIGINT) AS p1,
             CAST(SUM(s.f2) AS BIGINT) AS p2,
             CAST(SUM(s.f1 * s.f2) AS BIGINT) AS pb
      FROM st
    ),
    allu AS (
      SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM events
    )
    SELECT u.n AS n_users,
           f.p1 AS match_tight_pair,
           f.p2 AS match_ordered_triple,
           f.pb AS match_both,
           ROUND(CAST(f.p1 AS DOUBLE) / u.n, 6) AS tight_pair_share
    FROM flags f CROSS JOIN allu u
    """


@query("q633_sequence_match", oracle=_seqmatch_sql("duck"))
def q633_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceMatch for two patterns: '(?1)(?t<300)(?2)' (signup then
    click within 300 s, exact microseconds) and '(?1).*(?2).*(?3)'
    (signup, later error, later purchase). ONE events pass + one
    user-keyed time-ordered fold computing both flags (the oracle
    keeps the staged per-pattern CTEs, which re-expanded to 14 events
    scans under CTE inlining); the output is one census row."""
    _views(spark, sf_dir)
    return spark.sql(_seqmatch_spark_sql())


# ---------------------------------------------------------------------------
# q634 — uniqUpTo


def _uniqupto_sql(dialect: str) -> str:
    return f"""
    WITH cells AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_u
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    capped AS (
      SELECT event_type, d, exact_u,
             LEAST(exact_u, CAST({UNIQ_UPTO + 1} AS BIGINT)) AS uniq_upto
      FROM cells
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN uniq_upto <= {UNIQ_UPTO} THEN 1 ELSE 0 END)
                AS BIGINT) AS exact_cells,
           CAST(SUM(CASE WHEN uniq_upto = {UNIQ_UPTO + 1} THEN 1 ELSE 0 END)
                AS BIGINT) AS saturated_cells,
           ROUND(CAST(SUM(CASE WHEN uniq_upto = {UNIQ_UPTO + 1}
                          THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS saturation_share
    FROM capped
    GROUP BY event_type
    ORDER BY event_type
    """


@query("q634_uniq_upto", oracle=_uniqupto_sql("duck"))
def q634_uniq_upto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """uniqUpTo(5) semantics: per (event_type, day) the distinct-user
    count reported exactly while <= 5 and saturated at 6 beyond —
    the bounded-memory distinct census. The interesting output is the
    saturation share per type: how often the cheap counter would have
    sufficed."""
    _views(spark, sf_dir)
    return spark.sql(_uniqupto_sql("spark"))


# ---------------------------------------------------------------------------
# q635 — sumMap as PIVOT


def _pivot_oracle() -> str:
    cols = ", ".join(
        f"""CAST(COALESCE(SUM(CASE WHEN event_type = '{t}'
                 THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END), 0)
             AS BIGINT) AS cents_{t}"""
        for t in EVENT_TYPES
    )
    return f"""
    SELECT user_id % 10 AS user_decile, {cols}
    FROM events
    GROUP BY user_id % 10
    ORDER BY user_decile
    """


@query("q635_summap_pivot", oracle=_pivot_oracle())
def q635_summap_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sumMap(event_type -> cents) per user decile, materialized with
    Spark's groupBy().pivot() over a FIXED value list (deterministic
    schema — never let pivot infer values from data at 100 TB: the
    inference is an extra corpus pass and the column set becomes
    data-dependent). Oracle is the equivalent conditional
    aggregation."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    cents = F.floor(F.col("value") * 100 + 0.5).cast("bigint")
    piv = (
        ev.select((F.col("user_id") % 10).alias("user_decile"),
                  "event_type", cents.alias("cents"))
        .groupBy("user_decile")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum("cents"))
    )
    for t in EVENT_TYPES:
        piv = piv.withColumn(
            f"cents_{t}", F.coalesce(F.col(f"`{t}`"), F.lit(0)).cast("bigint")
        ).drop(t)
    return piv.orderBy("user_decile")
