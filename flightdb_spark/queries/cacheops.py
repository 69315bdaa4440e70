"""Cache / working-set batch 125 (q691-q695) — the locality analysis
a storage-tiering or cache-sizing pipeline runs, with parts as cache
objects and lineitem ship-days as the access stream (daily
granularity; same-day repeats collapse first, DETERMINISM.md §8):

- q691 reuse-time distribution: weeks between consecutive active
  days per part, the histogram cache sizing starts from;
- q692 working-set curve: distinct parts touched per tumbling window
  of 7/30/90 days — Denning's W(T) measured directly;
- q693 time-window hit ratios: the hit rate of a policy that caches
  an object for T days after each touch, for five T values — exactly
  P(reuse_time <= T), computed from integer gap counts;
- q694 burstiness: coefficient of variation of inter-reference gaps
  per part — bursty objects (CV >> 1) cache poorly under TTL
  policies; top-10 among parts with enough history;
- q695 hot-set concentration: the share of ALL accesses covered by
  the top-10/100/1000 most-accessed parts — the skew that decides
  whether a small hot tier wins.

100 TB shape: one DISTINCT (part, day) reduction; every window
partitions by part (bounded per-part history, never corpus-wide);
q695 selects top-k via orderBy+limit (TakeOrderedAndProject) per k —
no global rank window over the part dimension (which GROWS with
corpus, so §15's bounded-key exemption does not apply).

Determinism: day numbers are FLOOR(micros / 86.4e9) on exact integer
microseconds (unix_micros/epoch_us, §9/§16 — nonnegative, so no
div-vs-floor divergence); gaps/counts are exact integers; ratios are
unrounded exact rationals (q666 lesson); the CV ranks on its 6 dp
rounding with the part key as tie-break (§4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_WINDOWS = (7, 30, 90)
_TTLS = (7, 30, 90, 180, 365)
_HOTKS = (10, 100, 1000)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )


def _us(dialect: str, col: str) -> str:
    # l_shipdate ships as TIMESTAMP_NTZ; unix_micros needs TIMESTAMP.
    # The session zone is pinned UTC (tables.load_table), so the cast
    # is stable and matches DuckDB's epoch_us on the same instants.
    if dialect == "spark":
        return f"unix_micros(CAST({col} AS TIMESTAMP))"
    return f"epoch_us({col})"


def _acc_cte(dialect: str) -> str:
    """Distinct (part, active-day) access table — §8 tie collapse."""
    day = (
        f"CAST(FLOOR(CAST({_us(dialect, 'l_shipdate')} AS DOUBLE)"
        f" / CAST(86400000000 AS DOUBLE)) AS BIGINT)"
    )
    return f"""acc AS (
      SELECT DISTINCT l_partkey AS pk, {day} AS d
      FROM lineitem
    )"""


def _gaps_cte(dialect: str) -> str:
    """Per-part inter-reference gaps in days (first touch has none)."""
    return f"""{_acc_cte(dialect)},
    gaps AS (
      SELECT pk,
             d - LAG(d) OVER (PARTITION BY pk ORDER BY d) AS gap
      FROM acc
    )"""


# ---------------------------------------------------------------------------
# q691 — reuse-time distribution


def _q691_sql(dialect: str) -> str:
    return f"""
    WITH {_gaps_cte(dialect)},
    hist AS (
      SELECT CAST(FLOOR(CAST(gap AS DOUBLE) / CAST(7 AS DOUBLE))
                  AS BIGINT) AS week_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_gaps
      FROM gaps WHERE gap IS NOT NULL
      GROUP BY CAST(FLOOR(CAST(gap AS DOUBLE) / CAST(7 AS DOUBLE))
                    AS BIGINT)
    ),
    tot AS (SELECT CAST(SUM(n_gaps) AS BIGINT) AS n FROM hist)
    SELECT /*+ BROADCAST(t) */ h.week_bucket, h.n_gaps,
           CAST(h.n_gaps AS DOUBLE) / CAST(t.n AS DOUBLE) AS share
    FROM hist h CROSS JOIN tot t
    ORDER BY h.week_bucket
    LIMIT 20
    """


@query("q691_reuse_time_histogram", oracle=_q691_sql("duck"))
def q691_reuse_time_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-reference (reuse-time) histogram: days between
    consecutive active days per part, bucketed into weeks
    (FLOOR(gap/7), §16 — never ROUND). The lag window partitions by
    part; first touches are compulsory misses and carry no gap."""
    _views(spark, sf_dir)
    return spark.sql(_q691_sql("spark"))


# ---------------------------------------------------------------------------
# q692 — working-set curve


def _q692_sql(dialect: str) -> str:
    branches = []
    for w in _WINDOWS:
        branches.append(f"""
      SELECT CAST({w} AS BIGINT) AS window_days,
             CAST(COUNT(*) AS BIGINT) AS n_windows,
             CAST(SUM(nd) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               AS avg_working_set,
             CAST(MAX(nd) AS BIGINT) AS max_working_set
      FROM (
        SELECT CAST(FLOOR(CAST(d AS DOUBLE) / CAST({w} AS DOUBLE))
                    AS BIGINT) AS ws,
               CAST(COUNT(DISTINCT pk) AS BIGINT) AS nd
        FROM acc GROUP BY CAST(FLOOR(CAST(d AS DOUBLE)
                                     / CAST({w} AS DOUBLE)) AS BIGINT)
      ) w{w}""")
    return f"""
    WITH {_acc_cte(dialect)}
    {" UNION ALL ".join(branches)}
    ORDER BY window_days
    """


@query("q692_working_set_curve", oracle=_q692_sql("duck"))
def q692_working_set_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denning working-set curve: average and peak distinct parts per
    tumbling 7/30/90-day window. Each branch is one distinct-count
    aggregate keyed by (window); the curve's growth rate vs window
    size is the locality signature that prices a cache tier."""
    _views(spark, sf_dir)
    return spark.sql(_q692_sql("spark"))


# ---------------------------------------------------------------------------
# q693 — time-window (TTL) hit ratios


def _q693_sql(dialect: str) -> str:
    ttl_rows = " UNION ALL ".join(
        f"SELECT {t} AS ttl" if i == 0 else f"SELECT {t}"
        for i, t in enumerate(_TTLS)
    )
    return f"""
    WITH {_gaps_cte(dialect)},
    counts AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_acc,
             CAST(SUM(CASE WHEN gap IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_first
      FROM gaps
    )
    SELECT /*+ BROADCAST(c) */ CAST(t.ttl AS BIGINT) AS ttl_days,
           CAST(SUM(CASE WHEN g.gap IS NOT NULL AND g.gap <= t.ttl
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
           c.n_acc,
           CAST(SUM(CASE WHEN g.gap IS NOT NULL AND g.gap <= t.ttl
                    THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(c.n_acc AS DOUBLE) AS hit_ratio
    FROM gaps g
    CROSS JOIN ({ttl_rows}) t
    CROSS JOIN counts c
    GROUP BY t.ttl, c.n_acc
    ORDER BY t.ttl
    """


@query("q693_ttl_hit_ratios", oracle=_q693_sql("duck"))
def q693_ttl_hit_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit ratio of a cache-for-T-days-after-touch policy, for five
    TTLs: P(reuse_time <= T) over all accesses (first touches are
    compulsory misses). The TTL grid is a 5-row broadcast BNLJ; all
    counts exact integers, ratios unrounded rationals."""
    _views(spark, sf_dir)
    return spark.sql(_q693_sql("spark"))


# ---------------------------------------------------------------------------
# q694 — inter-reference burstiness


def _q694_sql(dialect: str) -> str:
    return f"""
    WITH {_gaps_cte(dialect)},
    mom AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(gap) AS BIGINT) AS sg,
             CAST(SUM(gap * gap) AS BIGINT) AS sg2
      FROM gaps WHERE gap IS NOT NULL
      GROUP BY pk
    )
    SELECT pk AS partkey, n AS n_gaps,
           CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_days,
           ROUND(sqrt((CAST(sg2 AS DOUBLE)
                       - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                         / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
                 / (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 6)
             AS cv_gap
    FROM mom
    WHERE n >= 5 AND sg > 0
    ORDER BY ROUND(sqrt((CAST(sg2 AS DOUBLE)
                         - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                           / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE))
                   / (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 6) DESC,
             pk ASC
    LIMIT 10
    """


@query("q694_reference_burstiness", oracle=_q694_sql("duck"))
def q694_reference_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ten burstiest parts by coefficient of variation of their
    inter-reference gaps (>= 5 gaps): CV >> 1 means clumped accesses
    that a TTL cache holds through dead air. Gap moments are exact
    BIGINT (gaps are small integers); one sqrt per part; ranked on
    the 6 dp rounding with key tie-break (§4)."""
    _views(spark, sf_dir)
    return spark.sql(_q694_sql("spark"))


# ---------------------------------------------------------------------------
# q695 — hot-set concentration


def _q695_sql(dialect: str) -> str:
    branches = []
    for k in _HOTKS:
        branches.append(f"""
      SELECT CAST({k} AS BIGINT) AS top_k,
             CAST(SUM(cnt) AS BIGINT) AS covered_accesses
      FROM (
        SELECT cnt FROM pcounts
        ORDER BY cnt DESC, pk ASC
        LIMIT {k}
      ) t{k}""")
    return f"""
    WITH {_acc_cte(dialect)},
    pcounts AS (
      SELECT pk, CAST(COUNT(*) AS BIGINT) AS cnt FROM acc GROUP BY pk
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM pcounts),
    hot AS (
      {" UNION ALL ".join(branches)}
    )
    SELECT /*+ BROADCAST(t) */ h.top_k, h.covered_accesses, t.n AS total_accesses,
           CAST(h.covered_accesses AS DOUBLE) / CAST(t.n AS DOUBLE)
             AS coverage
    FROM hot h CROSS JOIN tot t
    ORDER BY h.top_k
    """


@query("q695_hot_set_concentration", oracle=_q695_sql("duck"))
def q695_hot_set_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-set concentration: the share of all (part, day) accesses
    covered by the 10/100/1000 most-accessed parts. Each top-k is an
    orderBy+limit (TakeOrderedAndProject) over the aggregated part
    counts — no global rank window, because the part dimension grows
    with the corpus and §15's bounded-key exemption would not hold."""
    _views(spark, sf_dir)
    return spark.sql(_q695_sql("spark"))
