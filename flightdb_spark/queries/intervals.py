"""Interval-analytics batch 22 (q273-q275): the airspace-operations
trio re-expressed over the synthetic activity data — origin/
destination flow matrices (where do tracks start and end), peak
concurrency (the max-simultaneous-intervals sweep), and interval-
union coverage (merged busy time per day). The same three shapes
serve ops analytics anywhere: session flows, max concurrent users,
total busy seconds.

Reference basis: the airspace snapshot/occupancy family (SURVEY §2.11,
q215 occupancy curve); these add the flow-matrix and sweep-line
aggregates. Determinism: integer second arithmetic throughout; sweep
ties are totally ordered (ts, delta DESC, user) so the running count
is engine-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .synth import SYNTH_TP_CTE, synth_trackpoints


# ---------------------------------------------------------------------------
# q273 — origin/destination flow matrix


@query(
    "q273_od_matrix",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    ranked AS (
      SELECT flight_id,
             CAST(FLOOR(lat * 2) AS BIGINT) AS cell_lat,
             CAST(FLOOR(lon * 2) AS BIGINT) AS cell_lon,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM trackpoints
    ),
    ends AS (
      SELECT f.flight_id,
             f.cell_lat AS o_lat, f.cell_lon AS o_lon,
             l.cell_lat AS d_lat, l.cell_lon AS d_lon
      FROM (SELECT * FROM ranked WHERE rn_first = 1) f
      JOIN (SELECT * FROM ranked WHERE rn_last = 1) l USING (flight_id)
    )
    SELECT o_lat, o_lon, d_lat, d_lon,
           CAST(COUNT(*) AS BIGINT) AS n_flights
    FROM ends
    GROUP BY o_lat, o_lon, d_lat, d_lon
    HAVING COUNT(*) >= 2
    ORDER BY n_flights DESC, o_lat, o_lon, d_lat, d_lon
    """,
)
def q273_od_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Origin/destination flow matrix: each track's first and last
    0.5-degree grid cell (first/last by the total (ts, event_id)
    order, so ties are engine-exact), aggregated into OD-pair flow
    counts with thin flows (<2) dropped — the traffic-flow rollup
    behind route-demand and sector-load analyses.

    Plan: ONE shuffle partitions points by flight; both endpoint
    ranks ride the same partitioned sort (two window functions, one
    Exchange); the OD aggregate keys on a bounded cell-pair domain."""
    tp = synth_trackpoints(spark, sf_dir)
    w = Window.partitionBy("flight_id")
    ranked = tp.select(
        "flight_id",
        F.floor(F.col("lat") * 2).cast("bigint").alias("cell_lat"),
        F.floor(F.col("lon") * 2).cast("bigint").alias("cell_lon"),
        F.row_number()
        .over(w.orderBy("ts", "event_id"))
        .alias("rn_first"),
        F.row_number()
        .over(w.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_last"),
    )
    first = ranked.filter(F.col("rn_first") == 1).select(
        "flight_id",
        F.col("cell_lat").alias("o_lat"),
        F.col("cell_lon").alias("o_lon"),
    )
    last = ranked.filter(F.col("rn_last") == 1).select(
        "flight_id",
        F.col("cell_lat").alias("d_lat"),
        F.col("cell_lon").alias("d_lon"),
    )
    ends = first.join(last, "flight_id")
    return (
        ends.groupBy("o_lat", "o_lon", "d_lat", "d_lon")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_flights"))
        .filter(F.col("n_flights") >= 2)
        .orderBy(F.desc("n_flights"), "o_lat", "o_lon", "d_lat", "d_lon")
    )


# ---------------------------------------------------------------------------
# q274 — peak concurrency sweep


@query(
    "q274_peak_concurrency",
    oracle="""
    WITH intervals AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS s,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS e
      FROM events GROUP BY user_id, day
    ),
    pts AS (
      SELECT day, s AS t, 1 AS delta, user_id FROM intervals
      UNION ALL
      SELECT day, e AS t, -1 AS delta, user_id FROM intervals
    ),
    swept AS (
      SELECT day, t,
             SUM(delta) OVER (PARTITION BY day
                              ORDER BY t, delta DESC, user_id
                              ROWS UNBOUNDED PRECEDING) AS live
      FROM pts
    )
    SELECT day, CAST(MAX(live) AS BIGINT) AS peak_concurrency
    FROM swept
    GROUP BY day
    ORDER BY day
    """,
)
def q274_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency (max simultaneous active intervals): each
    user's daily activity span becomes a [start, end] interval; the
    classic sweep (+1 at start, -1 at end, running sum, max) gives
    the day's peak simultaneous actives — sector-load for airspace,
    max concurrent sessions for ops. Boundary ties count the starter
    as overlapping the ender (delta DESC at equal t), and the sweep
    order is TOTAL ((t, delta, user)) so the running sum is
    engine-exact.

    Plan: one shuffle to (user, day) intervals; the ±1 event stream
    is a union of projections; the sweep is a DAY-partitioned window
    (bounded by a day's interval endpoints), then a per-day max."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    intervals = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.unix_timestamp(F.min("ts")).alias("s"),
        F.unix_timestamp(F.max("ts")).alias("e"),
    )
    pts = intervals.select(
        "day", F.col("s").alias("t"), F.lit(1).alias("delta"), "user_id"
    ).unionByName(
        intervals.select(
            "day", F.col("e").alias("t"), F.lit(-1).alias("delta"), "user_id"
        )
    )
    w = (
        Window.partitionBy("day")
        .orderBy(F.col("t"), F.desc("delta"), F.col("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = pts.withColumn("live", F.sum("delta").over(w))
    return (
        swept.groupBy("day")
        .agg(F.max("live").cast("bigint").alias("peak_concurrency"))
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# q275 — interval-union coverage


@query(
    "q275_interval_coverage",
    oracle="""
    WITH intervals AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS s,
             CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) AS e
      FROM events GROUP BY user_id, day
    ),
    ordered AS (
      SELECT day, user_id, s, e,
             MAX(e) OVER (PARTITION BY day ORDER BY s, e, user_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max_e
      FROM intervals
    ),
    flagged AS (
      SELECT day, user_id, s, e,
             CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END
               AS new_island
      FROM ordered
    ),
    islands AS (
      SELECT day, s, e,
             SUM(new_island) OVER (PARTITION BY day ORDER BY s, e, user_id
                                   ROWS UNBOUNDED PRECEDING) AS island_id
      FROM flagged
    )
    SELECT day,
           CAST(COUNT(DISTINCT island_id) AS BIGINT) AS n_islands,
           CAST(SUM(island_len) AS BIGINT) AS covered_seconds
    FROM (
      SELECT day, island_id, MAX(e) - MIN(s) AS island_len
      FROM islands GROUP BY day, island_id
    )
    GROUP BY day
    ORDER BY day
    """,
)
def q275_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage: merge each day's overlapping user
    activity intervals into islands (gaps-and-islands over a running
    max of interval ends) and report merged island count + total
    covered seconds — "how much of the day was the system busy", the
    union-length aggregate naive SUM(e-s) double-counts. The island
    flag compares each start against the max end of ALL preceding
    intervals (not just the previous row — an engulfed interval must
    not split an island).

    Plan: one shuffle to (user, day) intervals; running-max, flag and
    island-id are day-partitioned windows over one sort; the island
    rollup is two bounded aggregates."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    intervals = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(
        F.unix_timestamp(F.min("ts")).alias("s"),
        F.unix_timestamp(F.max("ts")).alias("e"),
    )
    order = [F.col("s"), F.col("e"), F.col("user_id")]
    w_prev = (
        Window.partitionBy("day")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = intervals.withColumn(
        "new_island",
        F.when(
            F.max("e").over(w_prev).isNull()
            | (F.col("s") > F.max("e").over(w_prev)),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("day")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    islands = flagged.withColumn("island_id", F.sum("new_island").over(w_run))
    per_island = islands.groupBy("day", "island_id").agg(
        (F.max("e") - F.min("s")).alias("island_len")
    )
    return (
        per_island.groupBy("day")
        .agg(
            F.count_distinct("island_id").cast("bigint").alias("n_islands"),
            F.sum("island_len").cast("bigint").alias("covered_seconds"),
        )
        .orderBy("day")
    )
