"""Queue-replay batch 138 (q756-q760) — exact single-server queue
simulation over the event stream via the Lindley recursion, solved
distributively with the prefix-sum/running-min identity instead of a
sequential loop:

    W_i = max(0, W_{i-1} + s_{i-1} - a_i)   (Lindley)
        = U_i - min_{k<=i} U_k              (U = prefix sum of x,
                                             x_1 = 0, x_i = s_{i-1} - a_i)

so the whole waiting-time trace is two brand-name window functions
(SUM then running MIN) — no mutable state, no per-row loop, the same
trick operators/prefix.py exploits for cumulative scans.

Each (event_type, day) is its own queue (queues drain overnight, so
day partitions are exact, not an approximation — W resets at
midnight by construction). Service times are a deterministic integer
function of the event value (0.5 s + value-cents mod 3 s, in exact
microseconds).

- q756 waiting-time census per queue type: mean/max wait, share of
  arrivals that waited at all;
- q757 busy-period structure: gaps-and-islands over W > 0 — count,
  mean and max busy-run length;
- q758 utilization vs the Kingman approximation: measured mean wait
  against rho/(1-rho) * (ca^2+cs^2)/2 * E[s] from exact moments;
- q759 wait-by-hour-of-day profile (bounded 24-row spine per type);
- q760 concurrency snapshot + Little's-law check: number-in-system
  at each arrival via a day-partitioned interval self-join, mean L
  vs lambda * W.

100 TB shape: windows and the q760 self-join partition by
(event_type, day) — bounded partitions by construction; at cluster
scale a (type, day)-bucketed layout makes every one of them
shuffle-free. Nothing in the batch sees unbounded state.

Determinism: all times in exact BIGINT microseconds (unix_micros /
epoch_us dialect split, q327 lesson); arrival ties broken by
event_id in every window ORDER BY; waits/periods are pure integer
arithmetic; terminal means and the Kingman ratio are straight-line
doubles over integer sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

SVC_BASE_US = 500_000  # 0.5 s minimum service
SVC_MOD_US = 3_000_000  # + value-cents mod 3 s


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _wait_cte(dialect: str) -> str:
    """The Lindley trace: (queue, day, arrival order, wait_us, svc_us)."""
    return f"""arr AS (
      SELECT event_type AS q, CAST(ts AS DATE) AS d, event_id,
             CAST({_us(dialect)} AS BIGINT) AS t_us,
             CAST({SVC_BASE_US} + (CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                  % {SVC_MOD_US}) AS BIGINT) AS s_us
      FROM events
    ),
    steps AS (
      SELECT q, d, event_id, t_us, s_us,
             CASE WHEN LAG(t_us) OVER w IS NULL THEN CAST(0 AS BIGINT)
                  ELSE CAST(LAG(s_us) OVER w - (t_us - LAG(t_us) OVER w)
                       AS BIGINT) END AS x
      FROM arr
      WINDOW w AS (PARTITION BY q, d ORDER BY t_us, event_id)
    ),
    pre AS (
      SELECT q, d, event_id, t_us, s_us,
             CAST(SUM(x) OVER w AS BIGINT) AS u
      FROM steps
      WINDOW w AS (PARTITION BY q, d ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    waits AS (
      SELECT q, d, event_id, t_us, s_us,
             CAST(u - MIN(u) OVER w AS BIGINT) AS w_us
      FROM pre
      WINDOW w AS (PARTITION BY q, d ORDER BY t_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )"""


# ---------------------------------------------------------------------------
# q756 — waiting-time census

def _q756_sql(dialect: str) -> str:
    return f"""
    WITH {_wait_cte(dialect)}
    SELECT q AS queue,
           CAST(COUNT(*) AS BIGINT) AS n_arrivals,
           CAST(SUM(w_us) AS BIGINT) AS total_wait_us,
           CAST(SUM(w_us) AS DOUBLE) / COUNT(*) AS mean_wait_us,
           CAST(MAX(w_us) AS BIGINT) AS max_wait_us,
           CAST(SUM(CASE WHEN w_us > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS share_waited
    FROM waits
    GROUP BY q
    ORDER BY q
    """


@query("q756_lindley_waits", oracle=_q756_sql("duckdb"))
def q756_lindley_waits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type waiting-time census from the distributed Lindley
    trace (prefix sum + running min, both partitioned by (type, day)).
    Integer microseconds throughout; terminal exact ratios."""
    _views(spark, sf_dir)
    return spark.sql(_q756_sql("spark"))


# ---------------------------------------------------------------------------
# q757 — busy periods

def _q757_sql(dialect: str) -> str:
    return f"""
    WITH {_wait_cte(dialect)},
    flagged AS (
      SELECT q, d, event_id, t_us, w_us,
             CASE WHEN w_us = 0 THEN 1 ELSE 0 END AS starts_period
      FROM waits
    ),
    islands AS (
      SELECT q, d, w_us,
             CAST(SUM(starts_period) OVER (PARTITION BY q, d
                  ORDER BY t_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS period_id
      FROM flagged
    ),
    periods AS (
      SELECT q, d, period_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM islands GROUP BY q, d, period_id
    )
    SELECT q AS queue,
           CAST(COUNT(*) AS BIGINT) AS n_busy_periods,
           CAST(SUM(run_len) AS BIGINT) AS n_arrivals,
           CAST(SUM(run_len) AS DOUBLE) / COUNT(*) AS mean_period_len,
           CAST(MAX(run_len) AS BIGINT) AS max_period_len
    FROM periods
    GROUP BY q
    ORDER BY q
    """


@query("q757_busy_periods", oracle=_q757_sql("duckdb"))
def q757_busy_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Busy-period structure: a period starts at each zero-wait
    arrival (gaps-and-islands over the Lindley trace, running-sum
    island ids). Counts and run lengths are exact integers."""
    _views(spark, sf_dir)
    return spark.sql(_q757_sql("spark"))


# ---------------------------------------------------------------------------
# q758 — utilization vs Kingman

def _q758_sql(dialect: str) -> str:
    return f"""
    WITH {_wait_cte(dialect)},
    gaps AS (
      SELECT q, d, s_us, w_us,
             CAST(t_us - LAG(t_us) OVER (PARTITION BY q, d
                  ORDER BY t_us, event_id) AS BIGINT) AS a_us
      FROM waits
    ),
    mom AS (
      SELECT q,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(s_us) AS BIGINT) AS ss1,
             CAST(SUM(CAST(s_us AS DECIMAL(38,0)) * s_us) AS DECIMAL(38,0))
               AS ss2,
             CAST(SUM(w_us) AS BIGINT) AS sw,
             CAST(SUM(a_us) AS BIGINT) AS sa1,
             CAST(SUM(CAST(a_us AS DECIMAL(38,0)) * a_us) AS DECIMAL(38,0))
               AS sa2,
             CAST(SUM(CASE WHEN a_us IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS na
      FROM gaps GROUP BY q
    )
    SELECT q AS queue,
           CAST(ss1 AS DOUBLE) / (CAST(sa1 AS DOUBLE) / na * n) AS rho,
           CAST(sw AS DOUBLE) / n AS mean_wait_us,
           (CAST(ss1 AS DOUBLE) / (CAST(sa1 AS DOUBLE) / na * n))
             / (1 - CAST(ss1 AS DOUBLE) / (CAST(sa1 AS DOUBLE) / na * n))
             * ((CAST(na AS DOUBLE) * CAST(sa2 AS DOUBLE)
                 / (CAST(sa1 AS DOUBLE) * sa1) - 1)
                + (CAST(n AS DOUBLE) * CAST(ss2 AS DOUBLE)
                   / (CAST(ss1 AS DOUBLE) * ss1) - 1)) / 2
             * (CAST(ss1 AS DOUBLE) / n)
             AS kingman_wait_us
    FROM mom
    ORDER BY q
    """


@query("q758_kingman_check", oracle=_q758_sql("duckdb"))
def q758_kingman_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured mean wait against the Kingman G/G/1 approximation
    rho/(1-rho) * (ca^2 + cs^2)/2 * E[s], with every squared-CV term
    an exact-integer moment ratio (n*S2/S1^2 - 1). The ratio of the
    two columns is the test's sanity band."""
    _views(spark, sf_dir)
    return spark.sql(_q758_sql("spark"))


# ---------------------------------------------------------------------------
# q759 — wait by hour of day

def _q759_sql(dialect: str) -> str:
    return f"""
    WITH {_wait_cte(dialect)}
    SELECT q AS queue,
           CAST(hour(ts2) AS BIGINT) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(w_us) AS DOUBLE) / COUNT(*) AS mean_wait_us
    FROM (SELECT q, w_us,
                 CAST({'timestamp_micros(t_us)' if dialect == 'spark'
                       else 'make_timestamp(t_us)'} AS TIMESTAMP) AS ts2
          FROM waits) x
    GROUP BY q, hour(ts2)
    ORDER BY q, hr
    """


@query("q759_wait_by_hour", oracle=_q759_sql("duckdb"))
def q759_wait_by_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean wait per (queue, hour-of-day) — the 24-row staffing
    profile per type, derived from the exact integer trace."""
    _views(spark, sf_dir)
    return spark.sql(_q759_sql("spark"))


# ---------------------------------------------------------------------------
# q760 — concurrency snapshot + Little's law

def _q760_sql(dialect: str) -> str:
    return f"""
    WITH {_wait_cte(dialect)},
    sys AS (
      SELECT q, d, event_id, t_us,
             CAST(t_us + w_us + s_us AS BIGINT) AS dep_us
      FROM waits
    ),
    snap AS (
      SELECT a.q, a.d, a.event_id,
             CAST(COUNT(b.event_id) AS BIGINT) AS l_at_arrival
      FROM sys a LEFT JOIN sys b
        ON b.q = a.q AND b.d = a.d
       AND b.t_us <= a.t_us AND b.dep_us > a.t_us
       AND b.event_id <> a.event_id
      GROUP BY a.q, a.d, a.event_id
    ),
    lavg AS (
      SELECT q, CAST(SUM(l_at_arrival) AS BIGINT) AS sl,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM snap GROUP BY q
    ),
    tw AS (
      SELECT q,
             CAST(SUM(w_us + s_us) AS BIGINT) AS st,
             CAST(MAX(t_us) - MIN(t_us) AS BIGINT) AS span_us,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM waits GROUP BY q
    )
    SELECT l.q AS queue,
           CAST(l.sl AS DOUBLE) / l.n AS mean_in_system_at_arrival,
           (CAST(t.n AS DOUBLE) / t.span_us)
             * (CAST(t.st AS DOUBLE) / t.n) AS littles_l
    FROM lavg l JOIN tw t ON t.q = l.q
    ORDER BY l.q
    """


@query("q760_little_check", oracle=_q760_sql("duckdb"))
def q760_little_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Number-in-system seen by each arrival (a (type, day)-keyed
    interval self-join over bounded partitions) averaged per type,
    beside Little's-law L = lambda * (W + S) from the same trace —
    the two should agree to sampling noise (test-asserted band)."""
    _views(spark, sf_dir)
    return spark.sql(_q760_sql("spark"))
