"""Process-mining batch 162 (q881-q886) — event-log analysis of the
events table as a process log (case = user_id, activity = event_type,
total order inside a case = (ts, event_id)): the alpha-miner /
Celonis-style questions a process team asks of any 100 TB interaction
log. Complements seqmining's support counts (q561-q565) with TIMING
and structure: who waits where, which paths dominate, where work
loops back, and how far reality drifts from the declared process.

- q881 handoff times: the directly-follows graph with waiting-time
  statistics per edge (n, mean/min/max gap) — q561 counts support,
  this prices it;
- q882 variant analysis: top full-trace variants (the exact ordered
  activity string per case) with case counts and shares;
- q883 bottleneck ranking: edges by share of TOTAL waiting time,
  with cumulative Pareto share over the bounded (<= 25-row) edge
  table;
- q884 rework census: per activity, cases where it repeats, repeat
  rate and occurrence stats — the loop detector;
- q885 conformance fitness: transitions checked against the declared
  stage order signup < view < click < purchase (error excluded);
  per-case fitness banded into a bounded histogram;
- q886 work-in-progress: active cases per day via the +1/-1 interval
  delta trick (never a day x case join).

100 TB shape: every query is ONE shuffle of the log onto case keys
(window per case or grouped array build), then bounded aggregates —
edges <= |activities|^2 = 25 rows, variants capped by LIMIT, the WIP
spine is calendar days. Per-case windows partition by user_id, so no
global window touches the corpus; q886's day-level cumulative runs on
the bounded daily delta table.

Determinism: gaps are exact integer micros (unix_micros / epoch_us);
all counts integer; means/shares are terminal ratios; variant strings
are exact ordered concatenations tie-broken by unique event_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TOP_VARIANTS = 15
BOTTLENECK_MIN_N = 10

# Declared process order for conformance (q885): stage index per
# activity; error is unmapped (excluded from conformance checks).
_STAGE_CASE = (
    "CASE event_type WHEN 'signup' THEN 0 WHEN 'view' THEN 1 "
    "WHEN 'click' THEN 2 WHEN 'purchase' THEN 3 END"
)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(d: str) -> str:
    return "unix_micros(ts)" if d == "spark" else "epoch_us(ts)"


def _df_cte(d: str) -> str:
    """Directly-follows pairs with exact integer gaps, windowed per case."""
    return f"""hops AS (
      SELECT user_id,
             event_type AS a,
             LEAD(event_type) OVER w AS b,
             CAST(LEAD({_us(d)}) OVER w - {_us(d)} AS BIGINT) AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    df AS (SELECT * FROM hops WHERE b IS NOT NULL)"""


# ---------------------------------------------------------------------------
# q881 — directly-follows graph with waiting times


def _q881_sql(d: str) -> str:
    return f"""
    WITH {_df_cte(d)}
    SELECT a, b,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
             AS mean_gap_s,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM df
    GROUP BY a, b
    ORDER BY a, b
    """


@query("q881_handoff_times", oracle=_q881_sql("duckdb"))
def q881_handoff_times(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The directly-follows graph priced in waiting time: per (a -> b)
    activity handoff, transition count and exact-integer-micros gap
    statistics (mean as a terminal ratio). One per-case window (shuffle
    on user_id) then a <= 25-row edge aggregate — q561 gives the edge
    support, this says where the clock goes."""
    _views(spark, sf_dir)
    return spark.sql(_q881_sql("spark"))


# ---------------------------------------------------------------------------
# q882 — variant analysis


def _q882_sql(d: str) -> str:
    if d == "spark":
        trace = (
            "array_join(transform(array_sort(collect_list("
            "struct(ts, event_id, event_type))), s -> s.event_type), '>')"
        )
    else:
        trace = "string_agg(event_type, '>' ORDER BY ts, event_id)"
    return f"""
    WITH traces AS (
      SELECT user_id, {trace} AS variant,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cases FROM traces)
    SELECT /*+ BROADCAST(t) */ variant,
           CAST(COUNT(*) AS BIGINT) AS n_cases,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.n_cases), 6) AS case_share,
           CAST(MAX(n_events) AS BIGINT) AS trace_len
    FROM traces CROSS JOIN tot t
    GROUP BY variant
    ORDER BY n_cases DESC, variant
    LIMIT {TOP_VARIANTS}
    """


@query("q882_variant_analysis", oracle=_q882_sql("duckdb"))
def q882_variant_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top process variants: each case's EXACT ordered activity string
    (tie-broken by the unique event_id, so both engines build the same
    trace), counted and ranked. One case-key shuffle to traces, then a
    variant-key aggregate bounded by distinct traces; the 1-row case
    total broadcasts. The table a process team reads first: does one
    happy path dominate, or is the process a long tail of exceptions?"""
    _views(spark, sf_dir)
    return spark.sql(_q882_sql("spark"))


# ---------------------------------------------------------------------------
# q883 — bottleneck Pareto


def _q883_sql(d: str) -> str:
    return f"""
    WITH {_df_cte(d)},
    edges AS (
      SELECT a, b,
             CAST(COUNT(*) AS BIGINT) AS n_transitions,
             CAST(SUM(gap_us) AS BIGINT) AS total_wait_us
      FROM df GROUP BY a, b
      HAVING COUNT(*) >= {BOTTLENECK_MIN_N}
    ),
    tot AS (SELECT CAST(SUM(total_wait_us) AS BIGINT) AS all_wait FROM edges),
    ranked AS (
      SELECT /*+ BROADCAST(e2) */ e.a, e.b, e.n_transitions, e.total_wait_us,
             CAST(SUM(e2.total_wait_us) AS BIGINT) AS cum_wait_us
      FROM edges e JOIN edges e2
        ON (e2.total_wait_us > e.total_wait_us)
        OR (e2.total_wait_us = e.total_wait_us
            AND (e2.a < e.a OR (e2.a = e.a AND e2.b <= e.b)))
      GROUP BY e.a, e.b, e.n_transitions, e.total_wait_us
    )
    SELECT r.a, r.b, r.n_transitions, r.total_wait_us,
           ROUND(CAST(r.total_wait_us AS DOUBLE) / t.all_wait, 6)
             AS wait_share,
           ROUND(CAST(r.cum_wait_us AS DOUBLE) / t.all_wait, 6)
             AS cum_wait_share
    FROM ranked r CROSS JOIN tot t
    ORDER BY r.total_wait_us DESC, r.a, r.b
    """


@query("q883_bottleneck_ranking", oracle=_q883_sql("duckdb"))
def q883_bottleneck_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottleneck Pareto: edges ranked by their share of TOTAL waiting
    time with a cumulative share — "which two handoffs hold 80% of the
    latency". The cumulative runs as a broadcast inequality self-join
    over the AGGREGATED edge table (<= 25 rows, full (wait, a, b)
    tie-break) — bounded by the activity alphabet, never a corpus
    window."""
    _views(spark, sf_dir)
    return spark.sql(_q883_sql("spark"))


# ---------------------------------------------------------------------------
# q884 — rework census


def _q884_sql(d: str) -> str:
    return """
    WITH per_case AS (
      SELECT user_id, event_type,
             CAST(COUNT(*) AS BIGINT) AS occ
      FROM events GROUP BY user_id, event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_cases,
           CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cases_rework,
           ROUND(CAST(SUM(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS rework_rate,
           ROUND(CAST(SUM(occ) AS DOUBLE) / COUNT(*), 6) AS mean_occ,
           CAST(MAX(occ) AS BIGINT) AS max_occ
    FROM per_case
    GROUP BY event_type
    ORDER BY event_type
    """


@query("q884_rework_census", oracle=_q884_sql("duckdb"))
def q884_rework_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rework detector: per activity, how many cases execute it more
    than once (a loop back through the same step), the repeat rate and
    occurrence stats. One (case, activity) aggregate then a 5-row
    activity rollup — all counts exact integers."""
    _views(spark, sf_dir)
    return spark.sql(_q884_sql("spark"))


# ---------------------------------------------------------------------------
# q885 — conformance fitness


def _q885_sql(d: str) -> str:
    stage = _STAGE_CASE
    return f"""
    WITH staged AS (
      SELECT user_id, ts, event_id, {stage} AS stage
      FROM events
      WHERE {stage} IS NOT NULL
    ),
    hops AS (
      SELECT user_id, stage,
             LEAD(stage) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_stage
      FROM staged
    ),
    fit AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_trans,
             CAST(SUM(CASE WHEN next_stage >= stage THEN 1 ELSE 0 END)
               AS BIGINT) AS n_conform
      FROM hops WHERE next_stage IS NOT NULL
      GROUP BY user_id
    ),
    banded AS (
      SELECT CASE
               WHEN n_conform = n_trans THEN 'a_perfect'
               WHEN n_conform * 10 >= n_trans * 8 THEN 'b_high'
               WHEN n_conform * 2 >= n_trans THEN 'c_medium'
               ELSE 'd_low'
             END AS fitness_band,
             n_trans, n_conform
      FROM fit
    )
    SELECT fitness_band,
           CAST(COUNT(*) AS BIGINT) AS n_cases,
           CAST(SUM(n_trans) AS BIGINT) AS n_transitions,
           ROUND(CAST(SUM(n_conform) AS DOUBLE) / SUM(n_trans), 6)
             AS mean_conformance
    FROM banded
    GROUP BY fitness_band
    ORDER BY fitness_band
    """


@query("q885_conformance_fitness", oracle=_q885_sql("duckdb"))
def q885_conformance_fitness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformance checking against the declared stage order
    signup < view < click < purchase (error unmapped, excluded): a
    transition conforms when it never moves backwards. Per-case fitness
    = conforming/total transitions, banded by EXACT integer-ratio
    compares (n*10 >= total*8, never a double threshold) into a bounded
    4-row histogram. One per-case window + one case aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_q885_sql("spark"))


# ---------------------------------------------------------------------------
# q886 — work-in-progress (active cases per day)


def _q886_sql(d: str) -> str:
    return """
    WITH bounds AS (
      SELECT user_id,
             CAST(MIN(ts) AS DATE) AS d0,
             CAST(MAX(ts) AS DATE) AS d1
      FROM events GROUP BY user_id
    ),
    deltas AS (
      SELECT d0 AS d, 1 AS delta FROM bounds
      UNION ALL
      SELECT d1 + INTERVAL 1 DAY, -1 FROM bounds
    ),
    daily AS (
      SELECT CAST(d AS DATE) AS d, CAST(SUM(delta) AS BIGINT) AS net
      FROM deltas GROUP BY CAST(d AS DATE)
    )
    SELECT d,
           CAST(SUM(net) OVER (ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS active_cases
    FROM daily
    ORDER BY d
    """


@query("q886_wip_over_time", oracle=_q886_sql("duckdb"))
def q886_wip_over_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Work-in-progress curve: cases active per calendar day (active =
    between its first and last event), computed with the +1/-1 interval
    delta trick — one case aggregate, a 2-row-per-case delta stream,
    one day-key aggregate, then a running sum over the BOUNDED daily
    table (calendar days, never corpus rows — the q339/q354 bounded
    global-window class). No day x case join ever materializes."""
    _views(spark, sf_dir)
    return spark.sql(_q886_sql("spark"))
