"""Bitemporal-versioning batch 101 (q571-q575) — the two-axis time
model (VALID time: when a fact was true; KNOWLEDGE/transaction time:
when the warehouse learned it) that SCD2 (q- warehouse batch) can't
express. The synthetic lineitem carries only l_shipdate, so the
knowledge axis is DERIVED deterministically: recorded_at =
valid_from + (md5(orderkey:linenumber) % 45) days — a documented
synthetic recording lag computed identically on both engines. Each
lineitem row is a VERSION of its part's street price, valid from its
ship date, known from its recorded date.

- q571 bitemporal snapshot: the (valid-asof V, known-asof T) grid —
  for 9 (V,T) points, the latest version per part with
  valid_from<=V AND recorded_at<=T, aggregated;
- q572 restatement audit: monthly revenue as FIRST REPORTED (rows
  recorded by month end) vs FINALLY KNOWN — the restatement share
  per month;
- q573 knowledge-lag profile: the recording-lag distribution in
  weekly buckets with cumulative share (bounded 7-row table);
- q574 version-interval consistency: per-part version chains —
  duplicate valid_from collisions, >60-day validity gaps, banded by
  version count;
- q575 knowledge-consistent as-of join: each shipment joined to its
  part's PRIOR price as known AT SHIP TIME vs the hindsight prior
  (plain LAG) — counting stale-knowledge rows where the two differ
  (late-arriving versions invisible at fact time).

100 TB shape: versions partition by partkey (the natural bucket
key); every window is partitioned by (grid point, partkey) or
partkey; the 9-point grid and 7-row lag-bucket tables broadcast; the
as-of self-join in q575 is per-part bounded (versions of ONE part),
the standard bucketed as-of shape. q573's cumulative share runs on
the 7-row bucket aggregate (allowlisted bounded window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

LAG_MOD_DAYS = 45
GAP_DAYS = 60


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "lineitem")).createOrReplaceTempView(
        "lineitem"
    )


def _h64(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"CAST(conv(substring(md5({expr}), 1, 8), 16, 10) AS BIGINT)"
    return f"(('0x' || substr(md5({expr}), 1, 8))::BIGINT)"


def _dadd(dialect: str, d: str, n: str) -> str:
    if dialect == "spark":
        return f"date_add({d}, CAST({n} AS INT))"
    return f"({d} + CAST({n} AS INT))"


def _ddiff(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _mtrunc(dialect: str, d: str) -> str:
    if dialect == "spark":
        return f"trunc({d}, 'MM')"
    return f"date_trunc('month', {d})"


def _ver(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    h = _h64(
        dialect,
        f"concat(CAST(l_orderkey AS {s}), ':', CAST(l_linenumber AS {s}))",
    )
    return f"""ver AS (
      SELECT l_partkey AS partkey,
             CAST(l_shipdate AS DATE) AS valid_from,
             {_dadd(dialect, 'CAST(l_shipdate AS DATE)', f'{h} % {LAG_MOD_DAYS}')}
               AS recorded_at,
             l_extendedprice AS price,
             l_orderkey, l_linenumber
      FROM lineitem
    )"""


# ---------------------------------------------------------------------------
# q571 — bitemporal snapshot grid

_GRID_DATES = ("1997-01-01", "1999-01-01", "2001-01-01")


def _div_cents(dialect: str) -> str:
    cents = "CAST(FLOOR(SUM(price) * 100 + 0.5) AS BIGINT)"
    if dialect == "spark":
        return f"({cents} div COUNT(*))"
    return f"({cents} // COUNT(*))"


def _snapshot_sql(dialect: str) -> str:
    points = ", ".join(
        f"(DATE '{v}', DATE '{t}')" for v in _GRID_DATES for t in _GRID_DATES
    )
    return f"""
    WITH {_ver(dialect)},
    grid(v, t) AS (VALUES {points}),
    eligible AS (
      SELECT g.v, g.t, ver.partkey, ver.price,
             ROW_NUMBER() OVER (
               PARTITION BY g.v, g.t, ver.partkey
               ORDER BY ver.valid_from DESC, ver.recorded_at DESC,
                        ver.l_orderkey DESC, ver.l_linenumber DESC) AS rn
      FROM ver JOIN grid g
        ON ver.valid_from <= g.v AND ver.recorded_at <= g.t
    )
    SELECT v AS valid_asof, t AS known_asof,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(SUM(price), 2) AS total_price,
           -- avg in exact integer cents: FLOOR(x+0.5) then integer div —
           -- never ROUND a double quotient (half-way 49848.97055 lesson)
           {_div_cents(dialect)} AS avg_price_cents
    FROM eligible WHERE rn = 1
    GROUP BY v, t
    ORDER BY v, t
    """


@query("q571_bitemporal_snapshot", oracle=_snapshot_sql("duck"))
def q571_bitemporal_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bitemporal snapshot grid: for each (valid-asof, known-asof)
    pair, reconstruct each part's price as the latest version both
    valid and KNOWN by then — time-travel on two axes. The 9-row grid
    broadcasts against the version table; the per-(point, part) argmax
    is a partitioned window with a full deterministic tie-break."""
    _views(spark, sf_dir)
    return spark.sql(_snapshot_sql("spark"))


# ---------------------------------------------------------------------------
# q572 — restatement audit


def _restate_sql(dialect: str) -> str:
    return f"""
    WITH {_ver(dialect)}
    SELECT {_mtrunc(dialect, 'valid_from')} AS ship_month,
           ROUND(COALESCE(SUM(CASE WHEN recorded_at <= last_day(valid_from)
                                   THEN price END), 0), 2) AS first_reported,
           ROUND(SUM(price), 2) AS final_known,
           CAST(SUM(CASE WHEN recorded_at > last_day(valid_from)
                         THEN 1 ELSE 0 END) AS BIGINT) AS late_rows,
           ROUND(1.0 - COALESCE(SUM(CASE WHEN recorded_at <= last_day(valid_from)
                                         THEN price END), 0)
                       / SUM(price), 6) AS restatement_share
    FROM ver
    GROUP BY {_mtrunc(dialect, 'valid_from')}
    ORDER BY ship_month
    """


@query("q572_restatement_audit", oracle=_restate_sql("duck"))
def q572_restatement_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly revenue as first reported (versions recorded by the
    ship month's end) vs finally known, with the per-month restatement
    share — the classic late-arriving-fact audit. One aggregate; the
    month-end comparison is a map-side expression (last_day of the
    row's own month), no join at all."""
    _views(spark, sf_dir)
    return spark.sql(_restate_sql("spark"))


# ---------------------------------------------------------------------------
# q573 — knowledge-lag profile


def _lag_sql(dialect: str) -> str:
    lag = _ddiff(dialect, "valid_from", "recorded_at")
    return f"""
    WITH {_ver(dialect)},
    lags AS (
      SELECT CAST({lag} AS BIGINT) AS lag_days FROM ver
    ),
    buckets AS (
      SELECT CASE WHEN lag_days >= 42 THEN 6
                  ELSE CAST((lag_days - (((lag_days % 7) + 7) % 7)) / 7 AS BIGINT)
             END AS week_bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MIN(lag_days) AS BIGINT) AS min_lag,
             CAST(MAX(lag_days) AS BIGINT) AS max_lag
      FROM lags GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM buckets)
    SELECT b.week_bucket, b.n, b.min_lag, b.max_lag,
           ROUND(CAST(b.n AS DOUBLE) / tot.t, 6) AS share,
           ROUND(CAST(SUM(b.n) OVER (ORDER BY b.week_bucket) AS DOUBLE)
                 / tot.t, 6) AS cum_share
    FROM buckets b CROSS JOIN tot
    ORDER BY b.week_bucket
    """


@query("q573_knowledge_lag", oracle=_lag_sql("duck"))
def q573_knowledge_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recording-lag distribution (recorded_at - valid_from) in
    weekly buckets with per-bucket share and cumulative share — how
    long until the warehouse knows what happened. The corpus reduces
    to a <=7-row bucket table in one aggregate; the cumulative window
    runs on that bounded table (allowlisted, q339 class). Bucket
    arithmetic is exact integer floor-division."""
    _views(spark, sf_dir)
    return spark.sql(_lag_sql("spark"))


# ---------------------------------------------------------------------------
# q574 — version-interval consistency


def _intervals_sql(dialect: str) -> str:
    gap = _ddiff(dialect, "valid_from", "next_from")
    return f"""
    WITH {_ver(dialect)},
    chained AS (
      SELECT partkey, valid_from,
             LEAD(valid_from) OVER (
               PARTITION BY partkey
               ORDER BY valid_from, recorded_at, l_orderkey, l_linenumber)
               AS next_from
      FROM ver
    ),
    per_part AS (
      SELECT partkey,
             CAST(COUNT(*) AS BIGINT) AS n_versions,
             CAST(COUNT(*) - COUNT(DISTINCT valid_from) AS BIGINT)
               AS dup_valid_from,
             CAST(SUM(CASE WHEN next_from IS NOT NULL
                            AND {gap} > {GAP_DAYS} THEN 1 ELSE 0 END)
                  AS BIGINT) AS long_gaps
      FROM chained GROUP BY partkey
    )
    SELECT CASE WHEN n_versions >= 40 THEN 4
                ELSE CAST((n_versions - (n_versions % 10)) / 10 AS BIGINT)
           END AS version_band,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(n_versions) AS BIGINT) AS total_versions,
           CAST(SUM(dup_valid_from) AS BIGINT) AS dup_valid_from,
           CAST(SUM(long_gaps) AS BIGINT) AS long_gaps,
           ROUND(CAST(SUM(dup_valid_from) AS DOUBLE)
                 / SUM(n_versions), 6) AS dup_share
    FROM per_part
    GROUP BY 1
    ORDER BY version_band
    """


@query("q574_version_intervals", oracle=_intervals_sql("duck"))
def q574_version_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-chain consistency per part: duplicate valid_from
    collisions (two versions claiming the same effective date) and
    >60-day validity gaps, banded by version count. One LEAD window
    partitioned by partkey, one per-part aggregate, one bounded band
    rollup — the data-quality gate before trusting temporal joins."""
    _views(spark, sf_dir)
    return spark.sql(_intervals_sql("spark"))


# ---------------------------------------------------------------------------
# q575 — knowledge-consistent as-of join vs hindsight


def _asof_sql(dialect: str) -> str:
    return f"""
    WITH {_ver(dialect)},
    facts AS (
      SELECT partkey, valid_from, recorded_at, price, l_orderkey, l_linenumber,
             LAG(price) OVER (
               PARTITION BY partkey
               ORDER BY valid_from, recorded_at, l_orderkey, l_linenumber)
               AS hindsight_prior
      FROM ver
    ),
    known AS (
      SELECT f.l_orderkey, f.l_linenumber, f.partkey, f.valid_from,
             f.hindsight_prior, v.price AS cand_price,
             ROW_NUMBER() OVER (
               PARTITION BY f.l_orderkey, f.l_linenumber, f.partkey,
                            f.valid_from
               ORDER BY v.valid_from DESC, v.recorded_at DESC,
                        v.l_orderkey DESC, v.l_linenumber DESC) AS rn
      FROM facts f
      LEFT JOIN ver v
        ON v.partkey = f.partkey
       AND (v.valid_from < f.valid_from
            OR (v.valid_from = f.valid_from
                AND (v.recorded_at < f.recorded_at
                     OR (v.recorded_at = f.recorded_at
                         AND (v.l_orderkey < f.l_orderkey
                              OR (v.l_orderkey = f.l_orderkey
                                  AND v.l_linenumber < f.l_linenumber))))))
       AND v.recorded_at <= f.valid_from
    ),
    resolved AS (
      SELECT l_orderkey, l_linenumber, valid_from, hindsight_prior,
             cand_price AS known_prior
      FROM known WHERE rn = 1
    )
    SELECT CAST(EXTRACT(YEAR FROM valid_from) AS BIGINT) AS ship_year,
           CAST(COUNT(*) AS BIGINT) AS n_facts,
           CAST(COUNT(hindsight_prior) AS BIGINT) AS with_hindsight_prior,
           CAST(COUNT(known_prior) AS BIGINT) AS with_known_prior,
           CAST(SUM(CASE WHEN (hindsight_prior IS NULL) <> (known_prior IS NULL)
                          OR hindsight_prior <> known_prior
                         THEN 1 ELSE 0 END) AS BIGINT) AS stale_rows,
           ROUND(CAST(SUM(CASE WHEN (hindsight_prior IS NULL)
                                     <> (known_prior IS NULL)
                                OR hindsight_prior <> known_prior
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS stale_share
    FROM resolved
    GROUP BY EXTRACT(YEAR FROM valid_from)
    ORDER BY ship_year
    """


@query("q575_knowledge_consistent_asof", oracle=_asof_sql("duck"))
def q575_knowledge_consistent_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each shipment joined to its part's prior price AS KNOWN AT SHIP
    TIME (versions recorded by then, strictly earlier in the version
    order) vs the hindsight prior (plain LAG over the full chain),
    counting stale-knowledge rows where late-arriving versions were
    invisible at fact time. The as-of self-join is per-partkey bounded
    (versions of one part), the standard bucketed as-of shape; both
    priors use the same total version order so the diff is purely the
    knowledge cut."""
    _views(spark, sf_dir)
    return spark.sql(_asof_sql("spark"))
