"""Sequence-mining batch 99 (q561-q565) — the ordered-event-pattern
toolkit over user event streams (beside q14 sessionize, q198 BFS, the
q26 gaps-and-islands family): what users DO in sequence, not just how
often. This is the PrefixSpan/funnel slice of a product-analytics
engine, kept to the contiguous and first-occurrence pattern classes
that stay one-window-pass cheap at 100 TB:

- q561 frequent 2-sequences: consecutive event-type bigrams per user
  (LAG over the user timeline) with support and share;
- q562 frequent 3-sequences: the trigram extension (two LAGs), the
  longest contiguous pattern worth mining before support collapses;
- q563 Markov transition entropy: per source event-type, the entropy
  of the next-step distribution — how predictable each state is
  (ln-term contract: terms rounded to 9 dp, DECIMAL-accumulated,
  output at 5 dp — DETERMINISM.md §5/§11);
- q564 gap-constrained transitions: which bigrams survive a 5-minute
  max-gap constraint (exact microsecond arithmetic) — separates
  "same task" from "came back later";
- q565 ordered funnel paths: signup -> view -> click -> purchase as
  FIRST-OCCURRENCE subsequence matching (staged min-ts chaining),
  with per-stage user counts and conversion.

100 TB shape: every window partitions by user_id (co-keyed with the
natural bucketing of an events table); bigram/trigram supports are
map-side-partial aggregates over a 25/125-row key domain; the funnel
is three co-keyed self-joins that all collapse to one exchange under
bucketed storage (storage.py). No global window, no theta-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MAX_GAP_US = 300 * 1_000_000  # 5 minutes, exact microseconds


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _bigrams(dialect: str) -> str:
    us = _us(dialect)
    return f"""bigrams AS (
      SELECT user_id,
             LAG(event_type) OVER w AS prev_type,
             event_type AS curr_type,
             {us} - LAG({us}) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )"""


# ---------------------------------------------------------------------------
# q561 — frequent 2-sequences


def _biq_sql(dialect: str) -> str:
    return f"""
    WITH {_bigrams(dialect)},
    sup AS (
      SELECT prev_type, curr_type,
             CAST(COUNT(*) AS BIGINT) AS support,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM bigrams WHERE prev_type IS NOT NULL
      GROUP BY prev_type, curr_type
    ),
    tot AS (SELECT CAST(SUM(support) AS BIGINT) AS t FROM sup)
    SELECT s.prev_type, s.curr_type, s.support, s.n_users,
           ROUND(CAST(s.support AS DOUBLE) / tot.t, 6) AS share
    FROM sup s CROSS JOIN tot
    ORDER BY s.support DESC, s.prev_type, s.curr_type
    LIMIT 15
    """


@query("q561_frequent_2sequences", oracle=_biq_sql("duck"))
def q561_frequent_2sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top consecutive event-type bigrams across user timelines: one
    LAG window partitioned by user, a map-side-partial aggregate over
    the 25-pair key domain, TakeOrdered top-15 on (support, pair).
    The contiguous-pattern base case of sequence mining."""
    _views(spark, sf_dir)
    return spark.sql(_biq_sql("spark"))


# ---------------------------------------------------------------------------
# q562 — frequent 3-sequences


def _triq_sql(dialect: str) -> str:
    return f"""
    WITH tri AS (
      SELECT user_id,
             LAG(event_type, 2) OVER w AS t1,
             LAG(event_type, 1) OVER w AS t2,
             event_type AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT t1, t2, t3,
           CAST(COUNT(*) AS BIGINT) AS support,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM tri WHERE t1 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY support DESC, t1, t2, t3
    LIMIT 15
    """


@query("q562_frequent_3sequences", oracle=_triq_sql("duck"))
def q562_frequent_3sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top contiguous event-type trigrams (two LAGs in ONE window
    pass — Spark evaluates both lags in a single Window operator).
    Support over the 125-key domain; same bounded-aggregate economics
    as q561."""
    _views(spark, sf_dir)
    return spark.sql(_triq_sql("spark"))


# ---------------------------------------------------------------------------
# q563 — Markov transition entropy


def _entropy_sql(dialect: str) -> str:
    log2 = "LOG2" if dialect == "spark" else "log2"
    return f"""
    WITH {_bigrams(dialect)},
    cnt AS (
      SELECT prev_type, curr_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM bigrams WHERE prev_type IS NOT NULL
      GROUP BY prev_type, curr_type
    ),
    rowtot AS (
      SELECT prev_type, CAST(SUM(c) AS BIGINT) AS n FROM cnt
      GROUP BY prev_type
    )
    SELECT c.prev_type AS state,
           MAX(r.n) AS n_transitions,
           CAST(COUNT(*) AS BIGINT) AS n_next_states,
           -- -sum(p log2 p): terms at 9 dp into DECIMAL, output at 5
           ROUND(CAST(SUM(CAST(ROUND(
                 -(CAST(c.c AS DOUBLE) / r.n)
                 * {log2}(CAST(c.c AS DOUBLE) / r.n), 9)
               AS DECIMAL(38,9))) AS DOUBLE), 5) AS entropy_bits,
           ROUND(CAST(MAX(CASE WHEN c2.mx = c.c THEN c.c END) AS DOUBLE)
                 / MAX(r.n), 6) AS top_next_share
    FROM cnt c
    JOIN rowtot r ON r.prev_type = c.prev_type
    JOIN (SELECT prev_type, MAX(c) AS mx FROM cnt GROUP BY prev_type) c2
      ON c2.prev_type = c.prev_type
    GROUP BY c.prev_type
    ORDER BY c.prev_type
    """


@query("q563_transition_entropy", oracle=_entropy_sql("duck"))
def q563_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov next-step entropy per source event type —
    the predictability surface of the behavior graph (0 bits = a
    deterministic next step, log2(5) = uniform). Transcendental terms
    follow the ln contract (round at 9 dp, accumulate in DECIMAL,
    output at 5 dp) so a libm ULP can't flip the hash. Everything
    downstream of the LAG window runs on the 25-row transition
    table."""
    _views(spark, sf_dir)
    return spark.sql(_entropy_sql("spark"))


# ---------------------------------------------------------------------------
# q564 — gap-constrained transitions


def _gap_sql(dialect: str) -> str:
    return f"""
    WITH {_bigrams(dialect)}
    SELECT prev_type, curr_type,
           CAST(COUNT(*) AS BIGINT) AS support_all,
           CAST(SUM(CASE WHEN gap_us <= {MAX_GAP_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS support_5min,
           ROUND(CAST(SUM(CASE WHEN gap_us <= {MAX_GAP_US} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS capture_ratio
    FROM bigrams WHERE prev_type IS NOT NULL
    GROUP BY prev_type, curr_type
    ORDER BY prev_type, curr_type
    """


@query("q564_gap_constrained_transitions", oracle=_gap_sql("duck"))
def q564_gap_constrained_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every transition bigram with its all-time support vs the
    support under a 5-minute max-gap constraint (exact microsecond
    arithmetic — unix_micros/epoch_us, the q327 lesson), and the
    capture ratio. Separates same-session behavior from returns; the
    constraint is a map-side integer comparison on the already-
    computed lag gap."""
    _views(spark, sf_dir)
    return spark.sql(_gap_sql("spark"))


# ---------------------------------------------------------------------------
# q565 — ordered funnel paths (first-occurrence subsequence)

FUNNEL = ("signup", "view", "click", "purchase")


def _funnel_sql(dialect: str) -> str:
    return f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL[1]}' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > s2.t2
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, MIN(e.ts) AS t4
      FROM events e JOIN s3 ON s3.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL[3]}' AND e.ts > s3.t3
      GROUP BY e.user_id
    )
    SELECT 1 AS stage, '{FUNNEL[0]}' AS step,
           CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users,
           ROUND(CAST((SELECT COUNT(*) FROM s1) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s1), 6) AS conversion_from_start
    UNION ALL
    SELECT 2, '{FUNNEL[1]}', CAST((SELECT COUNT(*) FROM s2) AS BIGINT),
           ROUND(CAST((SELECT COUNT(*) FROM s2) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s1), 6)
    UNION ALL
    SELECT 3, '{FUNNEL[2]}', CAST((SELECT COUNT(*) FROM s3) AS BIGINT),
           ROUND(CAST((SELECT COUNT(*) FROM s3) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s1), 6)
    UNION ALL
    SELECT 4, '{FUNNEL[3]}', CAST((SELECT COUNT(*) FROM s4) AS BIGINT),
           ROUND(CAST((SELECT COUNT(*) FROM s4) AS DOUBLE)
                 / (SELECT COUNT(*) FROM s1), 6)
    """


@query("q565_funnel_paths", oracle=_funnel_sql("duck"))
def q565_funnel_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ordered first-occurrence funnel signup -> view -> click ->
    purchase: stage N matches the earliest stage-N event STRICTLY
    AFTER the user's stage-(N-1) first occurrence (true subsequence
    semantics, not mere presence). Four co-keyed user_id joins —
    one exchange total under user-bucketed storage — with per-stage
    user counts and conversion from the funnel start."""
    _views(spark, sf_dir)
    return spark.sql(_funnel_sql("spark"))
