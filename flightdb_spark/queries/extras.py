"""q43-q44: complaint range join + breakup rematch, oracle-checked.

q43 is the reference's complaint-count join (ui/tracks.go:349-376,
ui/api.go:172-191): external complaint timestamps bucketed onto track
line segments by time containment — a classic range join.

q44 runs the real repair operator (operators/repair.py
find_breakup_candidates) over flight spans derived from the events
table, with a pure-SQL oracle of the same semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import load_table
from . import query
from ..functions.geo import HAVERSINE_SQL
from .synth import SYNTH_TP_CTE, synth_trackpoints


@query(
    "q43_complaint_range_join",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    segs AS (
      SELECT flight_id, ts AS seg_end,
             LAG(ts) OVER (PARTITION BY flight_id ORDER BY ts, event_id) AS seg_start,
             event_id
      FROM trackpoints WHERE flight_id < 10
    ),
    complaints AS (
      SELECT ts FROM events WHERE event_type = 'click'
    )
    SELECT s.flight_id, s.event_id AS seg_id, COUNT(c.ts) AS n_complaints
    FROM segs s LEFT JOIN complaints c
      ON c.ts > s.seg_start AND c.ts <= s.seg_end
    WHERE s.seg_start IS NOT NULL
    GROUP BY s.flight_id, s.event_id
    """,
)
def q43_complaint_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complaints-per-segment range join (ts containment in the
    segment's (start, end]); the complaint side is broadcast, the
    segment side never shuffles."""
    tp = synth_trackpoints(spark, sf_dir).filter(F.col("flight_id") < 10)
    w = W.partitionBy("flight_id").orderBy("seg_end", "event_id")
    segs = (
        tp.select("flight_id", "event_id", F.col("ts").alias("seg_end"))
        .withColumn("seg_start", F.lag("seg_end").over(w))
        .filter(F.col("seg_start").isNotNull())
    )
    complaints = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(F.col("ts").alias("c_ts"))
    )
    joined = segs.join(
        F.broadcast(complaints),
        (F.col("c_ts") > F.col("seg_start")) & (F.col("c_ts") <= F.col("seg_end")),
        "left",
    )
    return joined.groupBy("flight_id", F.col("event_id").alias("seg_id")).agg(
        F.count("c_ts").alias("n_complaints")
    )


@query(
    "q44_breakup_rematch",
    oracle="""
    WITH spans AS (
      SELECT user_id AS icao_id,
             user_id || '_' || event_type AS flight_id,
             MIN(ts) AS first_ts, MAX(ts) AS last_ts
      FROM events GROUP BY user_id, event_type
    )
    SELECT a.icao_id, a.flight_id AS flight_a, b.flight_id AS flight_b,
           CAST(epoch(b.first_ts) - epoch(a.last_ts) AS BIGINT) AS gap_s
    FROM spans a JOIN spans b
      ON a.icao_id = b.icao_id AND a.flight_id <> b.flight_id
    WHERE epoch(b.first_ts) - epoch(a.last_ts) BETWEEN 0 AND 1800
    """,
)
def q44_breakup_rematch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The repair operator on flight spans derived from events: same
    airframe, later flight starting within 30 min of the earlier one's
    end (operators/repair.py; reference app/backend/batch.go:274-404)."""
    from ..operators.repair import find_breakup_candidates

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    ).select(
        F.col("user_id").cast("string").alias("icao_id"),
        F.concat_ws("_", F.col("user_id"), F.col("event_type")).alias("flight_id"),
        "first_ts",
        "last_ts",
    )
    return find_breakup_candidates(spans, max_gap_s=1800)


@query(
    "q45_market_rollup",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
    """,
)
def q45_market_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup — the reference has no grouping-sets analog
    (SURVEY §2.5 notes Spark gives them free); market-distribution
    counters generalized to subtotals + grand total."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "q46_trajectory_hausdorff",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    pts AS (
      SELECT flight_id, lat, lon FROM trackpoints WHERE flight_id < 8
    ),
    dists AS (
      SELECT a.flight_id AS flight_a, b.flight_id AS flight_b,
             a.lat AS alat, a.lon AS alon,
             MIN({HAVERSINE_SQL.format(lat1='a.lat', lon1='a.lon',
                                       lat2='b.lat', lon2='b.lon')}) AS min_d
      FROM pts a JOIN pts b ON a.flight_id <> b.flight_id
      GROUP BY a.flight_id, b.flight_id, a.lat, a.lon
    ),
    directed AS (
      SELECT flight_a, flight_b, MAX(min_d) AS h FROM dists
      GROUP BY flight_a, flight_b
    )
    SELECT LEAST(flight_a, flight_b) AS flight_a,
           GREATEST(flight_a, flight_b) AS flight_b,
           ROUND(MAX(h), 3) AS hausdorff_km
    FROM directed GROUP BY 1, 2
    """,
)
def q46_trajectory_hausdorff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory similarity: symmetric Hausdorff distance between
    flight tracks (operators/trajectory.py) — pair join + two-level
    aggregation, all JVM-side. This all-pairs form is the small-n
    oracle anchor; q47 is the grid-gated 100 TB path."""
    from ..operators.trajectory import symmetric_hausdorff

    tp = synth_trackpoints(spark, sf_dir).filter(F.col("flight_id") < 8).select(
        "flight_id", "lat", "lon"
    )
    out = symmetric_hausdorff(tp)
    return out.select(
        "flight_a", "flight_b", F.round("hausdorff_km", 3).alias("hausdorff_km")
    )


# Grid candidate generation, mirrored in SQL for the oracle: distinct
# 0.5°-cells per flight; one side expanded to its 3×3 neighborhood;
# flights sharing a cell become an unordered candidate pair.
_GRID_PAIRS_SQL = """
    cells AS (
      SELECT DISTINCT flight_id,
             CAST(FLOOR(lat / 0.5) AS BIGINT) AS cy,
             CAST(FLOOR(lon / 0.5) AS BIGINT) AS cx
      FROM pts
    ),
    cells_b AS (
      SELECT DISTINCT flight_id, cy + dy AS cy, cx + dx AS cx
      FROM cells, (VALUES (-1), (0), (1)) d1(dy), (VALUES (-1), (0), (1)) d2(dx)
    ),
    pairs AS (
      SELECT DISTINCT a.flight_id AS flight_a, b.flight_id AS flight_b
      FROM cells a JOIN cells_b b ON a.cy = b.cy AND a.cx = b.cx
      WHERE a.flight_id < b.flight_id
    )
"""


@query(
    "q47_hausdorff_grid",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    pts AS (
      SELECT flight_id, lat, lon FROM trackpoints WHERE flight_id < 12
    ),
    {_GRID_PAIRS_SQL},
    both_dirs AS (
      SELECT flight_a, flight_b FROM pairs
      UNION ALL
      SELECT flight_b, flight_a FROM pairs
    ),
    dists AS (
      SELECT p.flight_a, p.flight_b, a.lat AS alat, a.lon AS alon,
             MIN({HAVERSINE_SQL.format(lat1='a.lat', lon1='a.lon',
                                       lat2='b.lat', lon2='b.lon')}) AS min_d
      FROM both_dirs p
      JOIN pts a ON a.flight_id = p.flight_a
      JOIN pts b ON b.flight_id = p.flight_b
      GROUP BY p.flight_a, p.flight_b, a.lat, a.lon
    ),
    directed AS (
      SELECT flight_a, flight_b, MAX(min_d) AS h FROM dists
      GROUP BY flight_a, flight_b
    )
    SELECT LEAST(flight_a, flight_b) AS flight_a,
           GREATEST(flight_a, flight_b) AS flight_b,
           ROUND(MAX(h), 3) AS hausdorff_km
    FROM directed GROUP BY 1, 2
    """,
)
def q47_hausdorff_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-gated symmetric Hausdorff — the scale path: candidate pairs
    from a 0.5° cell equi-join (operators/trajectory.py
    candidate_pairs_by_grid), distances computed only through the pair
    list (directed_hausdorff_via_pairs). No point-level theta-join
    anywhere in the plan; the oracle replays the identical gating in
    SQL, so pruning divergence would fail the row-count match."""
    from ..operators.trajectory import symmetric_hausdorff_grid

    tp = synth_trackpoints(spark, sf_dir).filter(F.col("flight_id") < 12).select(
        "flight_id", "lat", "lon"
    )
    out = symmetric_hausdorff_grid(tp)
    return out.select(
        "flight_a", "flight_b", F.round("hausdorff_km", 3).alias("hausdorff_km")
    )


@query(
    "q72_cube_agg",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(o_orderstatus, 'ALL') AS status,
           COUNT(*) AS n_orders,
           ROUND(AVG(o_totalprice), 2) AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
)
def q72_cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: every grouping-set combination (q45's rollup plus the
    status-only slices). Spark compiles cube to a single Expand +
    HashAggregate — one pass over the fact table, one shuffle on the
    expanded grouping keys, regardless of how many grouping sets."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "avg_price",
        )
    )


@query(
    "q73_anti_join",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
)
def q73_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: customers with no completed ('F') order — NOT EXISTS
    as left_anti. The status filter prunes the build side BEFORE the
    join (pushdown-eligible), the hash join only tests key presence (no
    right-side row materialization), and a small build side broadcasts
    so the big side never shuffles."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_acctbal")


@query(
    "q74_exact_percentiles",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p50,
           ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p90,
           ROUND(PERCENTILE_CONT(0.99) WITHIN GROUP (ORDER BY o_totalprice), 4) AS p99
    FROM orders GROUP BY o_orderpriority
    """,
)
def q74_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (PERCENTILE_CONT):
    Spark's `percentile` aggregate sorts within the group buffer — fine
    while groups fit an executor (5 priorities here). At 100 TB use
    approx_percentile (q56's sketch shape) or a two-pass histogram;
    this is the exact anchor those approximations are judged against."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


@query(
    "q75_corr_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(CORR(value, user_id), 4) AS corr_vu,
           ROUND(COVAR_SAMP(value, user_id), 2) AS covar_vu,
           ROUND(STDDEV_SAMP(value), 4) AS sd_value
    FROM events GROUP BY event_type
    """,
)
def q75_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics per group: Pearson correlation, sample
    covariance, sample stddev — single-pass streaming aggregates
    (Welford-style merge), so the shuffle carries fixed-size moment
    buffers. Rounded to 4/2 decimals: the one-pass merge order differs
    between engines in the low bits."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("value", "user_id"), 4).alias("corr_vu"),
        F.round(F.covar_samp("value", "user_id"), 2).alias("covar_vu"),
        F.round(F.stddev_samp("value"), 4).alias("sd_value"),
    )


@query(
    "q94_local_supplier_volume",
    oracle="""
    SELECT n_name,
           ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                 AS DECIMAL(38,4))) AS DOUBLE), 2) AS revenue,
           COUNT(*) AS n_items
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q94_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): six-table join — revenue per
    nation from line items where the supplier and customer share the
    nation, one region, one order year. The declarative form lets
    Catalyst order the joins: the date filter pushes into the orders
    scan, nation/region (and at this SF customer/supplier) broadcast,
    and the only big-big join (orders⋈lineitem) shuffles on the order
    key both sides already share. Revenue accumulates per-row-rounded
    in DECIMAL (merge-order-free, engine-identical)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    joined = (
        orders.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n_regionkey"))
    )
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
    return joined.groupBy("n_name").agg(
        F.round(
            F.sum(rev.cast("decimal(38,4)")).cast("double"), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q95_winsorize",
    oracle="""
    WITH thr AS (
      SELECT event_type,
             ROUND(PERCENTILE_CONT(0.05) WITHIN GROUP (ORDER BY value), 6) AS lo,
             ROUND(PERCENTILE_CONT(0.95) WITHIN GROUP (ORDER BY value), 6) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN e.value < t.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_lo,
           CAST(SUM(CASE WHEN e.value > t.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clip_hi,
           ROUND(CAST(SUM(CAST(ROUND(LEAST(GREATEST(e.value, t.lo), t.hi), 9)
                 AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS mean_winsorized
    FROM events e JOIN thr t USING (event_type)
    GROUP BY e.event_type
    """,
)
def q95_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clip each event's value to its group's
    [p05, p95] band and report clip counts + the winsorized mean — the
    numeric outlier-taming twin of q84's detection. Exact percentiles
    (rounded to 6 so both engines agree at the boundary) come from one
    bounded aggregate broadcast back over the event stream; the
    clipped mean accumulates per-row-rounded in DECIMAL. At 100 TB
    swap the threshold pass to approx_percentile (q56's sketch shape)
    — the clip pass is unchanged."""
    ev = load_table(spark, sf_dir, "events")
    thr = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.05)"), 6).alias("lo"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(thr), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("value") < F.col("lo"), 1).otherwise(0)).alias(
                "n_clip_lo"
            ),
            F.sum(F.when(F.col("value") > F.col("hi"), 1).otherwise(0)).alias(
                "n_clip_hi"
            ),
            F.round(
                F.sum(F.round(clipped, 9).cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_winsorized"),
        )
    )
