"""Geospatial operator surface over synthetic trackpoints (see synth.py).

These put the reference's signature track algorithms behind the DuckDB
oracle gate: flown distance (track.go:216), bounding boxes
(track.go:57-65), closest approach (track.go:849-863 +
analysis/closestapproach.go), waypoint box matching
(flightpath.go:26-43), downsampling (track.go:604-631), altitude-band
runs (analysis/levelflight.go) and the box-restrictor entry/exit
outcome (intersectabletrack.go:284-364, point-based set semantics; the
exact line-crawl lives in operators/intersect.py as a pandas UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.geo import HAVERSINE_SQL, haversine_km
from . import query
from .synth import SYNTH_TP_CTE, synth_trackpoints

# Named fixes on the synthetic grid (waypoints dim table, FIXTURES.md §6;
# reference uses geo/sfo.KFixes, flightpath.go:19).
WAYPOINTS = [
    ("EPICK", 37.50, -122.00),
    ("EDDYY", 37.80, -121.50),
    ("MENLO", 38.00, -121.00),
    ("BRIXX", 37.25, -122.25),
    ("WWAVS", 38.50, -120.50),
]
WP_HALF_LAT = 0.02
WP_HALF_LON = 0.025

SFO_LAT, SFO_LON = 37.6188, -122.3754

_WP_VALUES_SQL = ", ".join(f"('{n}', {lat}, {lon})" for n, lat, lon in WAYPOINTS)


def _wp_df(spark: SparkSession):
    return spark.createDataFrame(WAYPOINTS, ["name", "wlat", "wlon"])


@query(
    "q21_flown_distance",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    steps AS (
      SELECT flight_id,
             {HAVERSINE_SQL.format(lat1="LAG(lat) OVER w", lon1="LAG(lon) OVER w",
                                   lat2="lat", lon2="lon")} AS step_km
      FROM trackpoints
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    )
    SELECT flight_id,
           ROUND(SUM(step_km), 3) AS flown_km,
           COUNT(step_km) AS n_steps
    FROM steps GROUP BY flight_id
    """,
)
def q21_flown_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance travelled along track: running haversine sum
    (DistanceTravelledKM, track.go:216; flown-distance-between-waypoints
    report family). Window lag + one groupBy — single shuffle on
    flight_id (parallelize=False: the window's hash exchange is the
    first op, a round-robin pre-split would only add a second
    full-table shuffle)."""
    tp = synth_trackpoints(spark, sf_dir, parallelize=False)
    w = W.partitionBy("flight_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    step = haversine_km(
        F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
    )
    return (
        tp.withColumn("step_km", step)
        .groupBy("flight_id")
        .agg(
            F.round(F.sum("step_km"), 3).alias("flown_km"),
            F.count("step_km").alias("n_steps"),
        )
    )


@query(
    "q22_bounding_box",
    oracle=f"""
    WITH {SYNTH_TP_CTE}
    SELECT flight_id,
           MIN(lat) AS lat_min, MAX(lat) AS lat_max,
           MIN(lon) AS lon_min, MAX(lon) AS lon_max,
           MIN(alt_ft) AS alt_min, MAX(alt_ft) AS alt_max,
           COUNT(*) AS n_points
    FROM trackpoints GROUP BY flight_id
    """,
)
def q22_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Track bounding box (FullBoundingBox, track.go:57-65) — the
    min/max pre-filter that short-circuits track-vs-track comparison
    (track.go:376-402) and prunes the restrictor crawl."""
    tp = synth_trackpoints(spark, sf_dir)
    return tp.groupBy("flight_id").agg(
        F.min("lat").alias("lat_min"),
        F.max("lat").alias("lat_max"),
        F.min("lon").alias("lon_min"),
        F.max("lon").alias("lon_max"),
        F.min("alt_ft").alias("alt_min"),
        F.max("alt_ft").alias("alt_max"),
        F.count(F.lit(1)).alias("n_points"),
    )


@query(
    "q23_waypoint_crossing",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    waypoints(name, wlat, wlon) AS (VALUES {_WP_VALUES_SQL})
    SELECT w.name,
           COUNT(*) AS n_points,
           COUNT(DISTINCT t.flight_id) AS n_flights,
           MIN(t.ts) AS first_ts
    FROM trackpoints t
    JOIN waypoints w
      ON t.lat BETWEEN w.wlat - {WP_HALF_LAT} AND w.wlat + {WP_HALF_LAT}
     AND t.lon BETWEEN w.wlon - {WP_HALF_LON} AND w.wlon + {WP_HALF_LON}
    GROUP BY w.name
    """,
)
def q23_waypoint_crossing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waypoint spatial join: points within a snap box of a named fix
    (MatchWaypoints, flightpath.go:26-43; 1 km snap box,
    flightpath.go:9-11). The waypoint dim is broadcast; the range
    predicate join never shuffles the trackpoint side."""
    tp = synth_trackpoints(spark, sf_dir)
    wp = _wp_df(spark)
    cond = (
        (F.col("lat") >= F.col("wlat") - WP_HALF_LAT)
        & (F.col("lat") <= F.col("wlat") + WP_HALF_LAT)
        & (F.col("lon") >= F.col("wlon") - WP_HALF_LON)
        & (F.col("lon") <= F.col("wlon") + WP_HALF_LON)
    )
    return (
        tp.join(F.broadcast(wp), cond)
        .groupBy("name")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.countDistinct("flight_id").alias("n_flights"),
            F.min("ts").alias("first_ts"),
        )
    )


@query(
    "q24_closest_approach",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    dists AS (
      SELECT flight_id, event_id, alt_ft,
             {HAVERSINE_SQL.format(lat1=str(SFO_LAT), lon1=str(SFO_LON),
                                   lat2="lat", lon2="lon")} AS dist_km
      FROM trackpoints
      WHERE alt_ft BETWEEN 1000 AND 20000
    ),
    ranked AS (
      SELECT flight_id, event_id, alt_ft, dist_km,
             ROW_NUMBER() OVER (PARTITION BY flight_id ORDER BY dist_km, event_id) AS rn
      FROM dists
    )
    SELECT flight_id, event_id AS closest_event_id,
           ROUND(dist_km, 6) AS closest_km, alt_ft
    FROM ranked WHERE rn = 1
    """,
)
def q24_closest_approach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closest approach to a reference point within an altitude band
    (ClosestTo, track.go:849-863; closest-approach report,
    analysis/closestapproach.go): argmin by distance with deterministic
    tie-break."""
    tp = synth_trackpoints(spark, sf_dir)
    dist = haversine_km(F.lit(SFO_LAT), F.lit(SFO_LON), F.col("lat"), F.col("lon"))
    w = W.partitionBy("flight_id").orderBy(F.col("dist_km").asc(), F.col("event_id").asc())
    return (
        tp.filter((F.col("alt_ft") >= 1000) & (F.col("alt_ft") <= 20000))
        .withColumn("dist_km", dist)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "flight_id",
            F.col("event_id").alias("closest_event_id"),
            F.round("dist_km", 6).alias("closest_km"),
            "alt_ft",
        )
    )


@query(
    "q25_sample_every",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    bucketed AS (
      SELECT flight_id, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY flight_id, epoch_us(ts) // 600000000
                                ORDER BY ts, event_id) AS rn
      FROM trackpoints
    )
    SELECT flight_id, event_id, ts FROM bucketed WHERE rn = 1
    """,
)
def q25_sample_every(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsample: ≥1 point per 10-minute bucket (SampleEvery,
    track.go:604-631 — bucketed variant; the reference's greedy exact
    variant is a pandas-UDF in operators/sampling.py)."""
    tp = synth_trackpoints(spark, sf_dir)
    bucket = F.expr("unix_micros(ts) div 600000000")
    w = W.partitionBy("flight_id", bucket).orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        tp.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("flight_id", "event_id", "ts")
    )


@query(
    "q26_altitude_band_runs",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    banded AS (
      SELECT flight_id, ts, event_id, CAST(alt_ft AS BIGINT) // 10000 AS band
      FROM trackpoints
    ),
    changes AS (
      SELECT flight_id, ts, event_id, band,
             CASE WHEN band <> COALESCE(LAG(band) OVER w, -999) THEN 1 ELSE 0 END AS changed
      FROM banded
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT flight_id, band,
             SUM(changed) OVER (PARTITION BY flight_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM changes
    ),
    islands AS (
      SELECT flight_id, band, run_id, COUNT(*) AS run_len
      FROM runs GROUP BY flight_id, band, run_id
    )
    SELECT flight_id, band, MAX(run_len) AS longest_run
    FROM islands GROUP BY flight_id, band
    """,
)
def q26_altitude_band_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive run per altitude band (level-flight detection,
    analysis/levelflight.go:29-76 + altitude stacking bands,
    analysis/altitudestacking.go:15-18) — gaps-and-islands on integer
    bands, bit-exact across engines."""
    tp = synth_trackpoints(spark, sf_dir)
    w = W.partitionBy("flight_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    banded = tp.withColumn("band", F.expr("CAST(alt_ft AS BIGINT) div 10000"))
    changed = F.when(
        F.col("band") != F.coalesce(F.lag("band").over(w), F.lit(-999)), F.lit(1)
    ).otherwise(F.lit(0))
    runs = banded.withColumn("run_id", F.sum(changed).over(wrun))
    islands = runs.groupBy("flight_id", "band", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return islands.groupBy("flight_id", "band").agg(F.max("run_len").alias("longest_run"))


@query(
    "q27_restrictor_box",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    indexed AS (
      SELECT flight_id, event_id, ts,
             CASE WHEN lat BETWEEN 37.5 AND 38.0
                   AND lon BETWEEN -122.4 AND -121.9
                   AND alt_ft BETWEEN 2000 AND 20000 THEN 1 ELSE 0 END AS inside,
             ROW_NUMBER() OVER (PARTITION BY flight_id ORDER BY ts, event_id) AS idx
      FROM trackpoints
    ),
    entries AS (
      SELECT flight_id, MIN(idx) AS entry_idx
      FROM indexed WHERE inside = 1 GROUP BY flight_id
    ),
    exits AS (
      SELECT i.flight_id, MIN(i.idx) AS exit_idx
      FROM indexed i JOIN entries e
        ON i.flight_id = e.flight_id AND i.idx > e.entry_idx AND i.inside = 0
      GROUP BY i.flight_id
    )
    SELECT e.flight_id,
           e.entry_idx,
           x.exit_idx,
           TRUE AS satisfied
    FROM entries e LEFT JOIN exits x ON e.flight_id = x.flight_id
    """,
)
def q27_restrictor_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-restrictor entry/exit outcome, set-based point semantics:
    entry = first in-region point, exit = first subsequent outside point,
    NULL exit = fell-off-end-inside (intersectabletrack.go:284-364's
    started-inside / fell-off-end cases map to entry_idx=1 / exit NULL).
    The exact line-crossing crawl with interpolation is the pandas-UDF in
    operators/intersect.py."""
    tp = synth_trackpoints(spark, sf_dir)
    w = W.partitionBy("flight_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    inside = (
        (F.col("lat") >= 37.5)
        & (F.col("lat") <= 38.0)
        & (F.col("lon") >= -122.4)
        & (F.col("lon") <= -121.9)
        & (F.col("alt_ft") >= 2000)
        & (F.col("alt_ft") <= 20000)
    ).cast("int")
    indexed = tp.withColumn("inside", inside).withColumn("idx", F.row_number().over(w))
    entries = (
        indexed.filter(F.col("inside") == 1)
        .groupBy("flight_id")
        .agg(F.min("idx").alias("entry_idx"))
    )
    exits = (
        indexed.alias("i")
        .join(
            entries.alias("e"),
            (F.col("i.flight_id") == F.col("e.flight_id"))
            & (F.col("i.idx") > F.col("e.entry_idx"))
            & (F.col("i.inside") == 0),
        )
        .groupBy(F.col("i.flight_id").alias("flight_id"))
        .agg(F.min("idx").alias("exit_idx"))
    )
    return (
        entries.join(exits, "flight_id", "left")
        .select("flight_id", "entry_idx", "exit_idx", F.lit(True).alias("satisfied"))
    )


@query(
    "q49_lines_sampled",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    bucketed AS (
      SELECT flight_id, ts, lat, lon,
             ROW_NUMBER() OVER (PARTITION BY flight_id, epoch_us(ts) // 600000000
                                ORDER BY ts, event_id) AS rn
      FROM trackpoints
    ),
    pts AS (SELECT flight_id, ts, lat, lon FROM bucketed WHERE rn = 1),
    segs AS (
      SELECT flight_id,
             LAG(ts)  OVER w AS t0, ts AS t1,
             LAG(lat) OVER w AS lat0, LAG(lon) OVER w AS lon0,
             lat AS lat1, lon AS lon1
      FROM pts
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts)
    )
    SELECT flight_id, t0, t1, lat0, lon0, lat1, lon1
    FROM segs WHERE lat0 IS NOT NULL
    """,
)
def q49_lines_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Track → line segments, ≥1 per 10-minute bucket
    (AsLinesSampledEvery, track.go:784-802): bucket-downsample then
    lag-pair consecutive survivors. The named operator behind the
    waypoint matcher's segment builder; one narrow window per flight,
    no extra shuffle beyond the sample."""
    from ..operators.trackops import as_lines_sampled_every

    tp = synth_trackpoints(spark, sf_dir).withColumn("track", F.lit("ADSB"))
    return as_lines_sampled_every(tp, 600.0, tiebreak="event_id").drop("track")


# --- q143: grid-density hotspot clustering ------------------------------------------
# DBSCAN-lite over the airspace: 0.1-deg grid cells whose point count
# exceeds 110% of the mean cell density are "core"; core cells touching
# (8-neighborhood) merge into hotspots via the same connected-components
# operator the text dedup chain uses. The congestion-cluster read the
# reference's quadtree never had.
HOT_CELL_DEG = 10  # cells per degree (0.1 deg cells)
HOT_NUM, HOT_DEN = 11, 10  # core iff n * n_cells * HOT_DEN >= total * HOT_NUM


@query(
    "q143_density_hotspots",
    oracle=f"""
    WITH RECURSIVE {SYNTH_TP_CTE},
    cells AS (
      SELECT CAST(floor(lat * {HOT_CELL_DEG}) AS BIGINT) AS cx,
             CAST(floor(lon * {HOT_CELL_DEG}) AS BIGINT) AS cy,
             COUNT(*) AS n
      FROM trackpoints GROUP BY 1, 2
    ),
    tot AS (SELECT SUM(n) AS total, COUNT(*) AS n_cells FROM cells),
    core AS (
      SELECT c.cx, c.cy, c.n,
             c.cx * 100000 + (c.cy + 50000) AS key
      FROM cells c, tot t
      WHERE c.n * t.n_cells * {HOT_DEN} >= t.total * {HOT_NUM}
    ),
    edges AS (
      SELECT a.key AS src, b.key AS dst
      FROM core a JOIN core b
        ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
    ),
    reach(key, label) AS (
      SELECT key, key FROM core
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.key
    ),
    comp AS (SELECT key, MIN(label) AS cluster_id FROM reach GROUP BY key)
    SELECT p.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(c.n) AS BIGINT) AS n_points
    FROM comp p JOIN core c ON c.key = p.key
    GROUP BY p.cluster_id
    """,
)
def q143_density_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Airspace congestion hotspots: grid cells over 110% of mean
    density, merged across the 8-neighborhood into clusters. The core
    threshold cross-multiplies integers (n * n_cells * 10 >= total *
    11) so no float decides core-ness at any scale, and the relative
    cut keeps the semantics scale-invariant. Neighbor edges come from
    a 9-way offset explode + equi-join on the shifted cell key (never
    a theta join); clustering is operators/textdedup.py's min-label
    propagation + pointer jumping over the (bounded) core-cell graph.
    """
    from ..operators.textdedup import connected_components

    tp = synth_trackpoints(spark, sf_dir)
    cells = tp.groupBy(
        F.floor(F.col("lat") * HOT_CELL_DEG).alias("cx"),
        F.floor(F.col("lon") * HOT_CELL_DEG).alias("cy"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = cells.agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_cells")
    )
    core = (
        cells.join(F.broadcast(tot))
        .filter(F.col("n") * F.col("n_cells") * HOT_DEN >= F.col("total") * HOT_NUM)
        .select(
            "cx", "cy", "n", (F.col("cx") * 100000 + F.col("cy") + 50000).alias("key")
        )
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    probes = core.select(
        F.col("key").alias("src"), "cx", "cy", F.explode(offsets).alias("o")
    ).select(
        "src",
        ((F.col("cx") + F.col("o.dx")) * 100000 + F.col("cy") + F.col("o.dy") + 50000).alias(
            "nbr_key"
        ),
    )
    edges = probes.join(
        core.select(F.col("key").alias("dst")), probes.nbr_key == F.col("dst")
    ).select("src", "dst")
    labels = connected_components(edges, src="src", dst="dst")
    return (
        labels.join(core, labels.doc_id == core.key)
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n").cast("bigint").alias("n_points"),
        )
    )
