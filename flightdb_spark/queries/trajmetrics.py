"""Trajectory-metrics batch 29 (q290-q291): path tortuosity (flown
distance over great-circle displacement — the wandering index that
separates vectoring from direct routing) and per-track convex hulls
(monotone chain, the operating-area summary). Both are fully
oracle-checked: the hull runs in exact integer hundredth-degree units
inside bounded-per-key applyInPandas, and its oracle recomputes the
same hull by the extreme-edge characterization (hash-exact since r8;
the pure-Python parity pin remains).

Reference basis: trajectory analysis family (SURVEY §2.4; track.go's
DistanceTravelledKM + bounding boxes — the hull is the tighter
operating-area summary the reference approximates with boxes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from ..functions.geo import HAVERSINE_SQL, haversine_km
from . import query
from .synth import SYNTH_TP_CTE, synth_trackpoints


# ---------------------------------------------------------------------------
# q290 — path tortuosity


@query(
    "q290_tortuosity",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    steps AS (
      SELECT flight_id, ts, event_id, lat, lon,
             CAST(ROUND({HAVERSINE_SQL.format(
                 lat1="LAG(lat) OVER w", lon1="LAG(lon) OVER w",
                 lat2="lat", lon2="lon")}, 6) AS DECIMAL(38,6)) AS step6,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY ts, event_id) AS rn_first,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY ts DESC, event_id DESC) AS rn_last
      FROM trackpoints
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    ),
    flown AS (
      SELECT flight_id,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             SUM(step6) AS flown6
      FROM steps GROUP BY flight_id
    ),
    ends AS (
      SELECT f.flight_id,
             ROUND({HAVERSINE_SQL.format(
                 lat1="f.lat", lon1="f.lon", lat2="l.lat", lon2="l.lon")}, 6)
               AS straight_km
      FROM (SELECT * FROM steps WHERE rn_first = 1) f
      JOIN (SELECT * FROM steps WHERE rn_last = 1) l USING (flight_id)
    )
    SELECT fl.flight_id, fl.n_points,
           ROUND(CAST(fl.flown6 AS DOUBLE), 3) AS flown_km,
           e.straight_km,
           ROUND(CAST(fl.flown6 AS DOUBLE) / NULLIF(e.straight_km, 0.0), 4)
             AS tortuosity
    FROM flown fl JOIN ends e USING (flight_id)
    ORDER BY fl.flight_id
    """,
)
def q290_tortuosity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path tortuosity: flown distance (6-dp-rounded DECIMAL step sums
    — order-free, unlike q21's display-grade double sum) divided by
    the great-circle displacement between the track's first and last
    points (total (ts, event_id) order). Tortuosity ~1 is a direct
    route; large values are vectoring/holding — the one-number route-
    efficiency metric beside q202's geometry simplification.

    Plan: ONE flight-partitioned Exchange carries the step lag and
    both endpoint ranks; the per-flight rollup and the endpoint join
    ride the same key. NULLIF guards a zero-displacement loop."""
    tp = synth_trackpoints(spark, sf_dir)
    wp = Window.partitionBy("flight_id")
    w = wp.orderBy("ts", "event_id")
    step6 = F.round(
        haversine_km(
            F.lag("lat").over(w), F.lag("lon").over(w), F.col("lat"), F.col("lon")
        ),
        6,
    ).cast("decimal(38,6)")
    steps = tp.select(
        "flight_id",
        "lat",
        "lon",
        step6.alias("step6"),
        F.row_number().over(w).alias("rn_first"),
        F.row_number()
        .over(wp.orderBy(F.desc("ts"), F.desc("event_id")))
        .alias("rn_last"),
    )
    flown = steps.groupBy("flight_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        F.sum("step6").alias("flown6"),
    )
    f = steps.filter(F.col("rn_first") == 1).select(
        "flight_id", F.col("lat").alias("lat_f"), F.col("lon").alias("lon_f")
    )
    l = steps.filter(F.col("rn_last") == 1).select(
        "flight_id", F.col("lat").alias("lat_l"), F.col("lon").alias("lon_l")
    )
    ends = f.join(l, "flight_id").select(
        "flight_id",
        F.round(
            haversine_km(
                F.col("lat_f"), F.col("lon_f"), F.col("lat_l"), F.col("lon_l")
            ),
            6,
        ).alias("straight_km"),
    )
    return (
        flown.join(ends, "flight_id")
        .select(
            "flight_id",
            "n_points",
            F.round(F.col("flown6").cast("double"), 3).alias("flown_km"),
            "straight_km",
            F.round(
                F.col("flown6").cast("double")
                / F.nullif(F.col("straight_km"), F.lit(0.0)),
                4,
            ).alias("tortuosity"),
        )
        .orderBy("flight_id")
    )


# ---------------------------------------------------------------------------
# q291 — convex hull (hash-verified: exact integer hull, edge-characterization oracle)


_HULL_SCHEMA = StructType(
    [
        StructField("flight_id", LongType()),
        StructField("n_points", LongType()),
        StructField("n_hull_points", IntegerType()),
        StructField("hull_area_deg2", DoubleType()),
    ]
)


def convex_hull_stats(pdf):
    """Andrew's monotone chain over one flight's (lon, lat) points in
    EXACT integer hundredth-degree units (the synth grid): cross
    products and the shoelace sum are integer arithmetic, so collinear
    popping is exact (a float chain can sign-flip a true-zero cross)
    and the area is the exact integer A2/20000. Pure function shared
    with the parity test; q291's SQL oracle recomputes the same hull
    via the extreme-edge characterization — identical integers."""
    import math

    import pandas as pd

    fid = int(pdf["flight_id"].iloc[0])
    pts = sorted(
        set(
            (int(math.floor(lo * 100 + 0.5)), int(math.floor(la * 100 + 0.5)))
            for lo, la in zip(pdf["lon"].tolist(), pdf["lat"].tolist())
        )
    )
    n = len(pdf)

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    if len(pts) <= 2:
        hull = pts
    else:
        lower, upper = [], []
        for p in pts:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        for p in reversed(pts):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        hull = lower[:-1] + upper[:-1]
    a2 = 0
    for i in range(len(hull)):
        x1, y1 = hull[i]
        x2, y2 = hull[(i + 1) % len(hull)]
        a2 += x1 * y2 - x2 * y1
    a2 = abs(a2) if len(hull) >= 3 else 0
    return pd.DataFrame(
        [(fid, n, len(hull), float(a2) / 20000.0)],
        columns=["flight_id", "n_points", "n_hull_points", "hull_area_deg2"],
    )


_Q291_ORACLE = f"""
    WITH {SYNTH_TP_CTE},
    raw AS (
      SELECT flight_id,
             CAST(FLOOR(lon * 100 + 0.5) AS BIGINT) AS x,
             CAST(FLOOR(lat * 100 + 0.5) AS BIGINT) AS y
      FROM trackpoints
    ),
    npt AS (
      SELECT flight_id, CAST(COUNT(*) AS BIGINT) AS n_points
      FROM raw GROUP BY flight_id
    ),
    pts AS (SELECT DISTINCT flight_id, x, y FROM raw),
    cnt AS (SELECT flight_id, COUNT(*) AS np FROM pts GROUP BY flight_id),
    -- extreme-edge characterization: directed edge a->b is on the CCW
    -- hull iff every other point is strictly LEFT of it (cross > 0)
    -- or collinear STRICTLY INSIDE the segment. Exact integer cross
    -- products on the hundredth-degree grid; collinear ends or
    -- beyond-segment points disqualify the edge, which reproduces the
    -- monotone chain's <=0 popping (no collinear hull vertices).
    edges AS MATERIALIZED (
      SELECT a.flight_id, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by
      FROM pts a
      JOIN pts b ON b.flight_id = a.flight_id
        AND (a.x <> b.x OR a.y <> b.y)
      WHERE NOT EXISTS (
        SELECT 1 FROM pts r
        WHERE r.flight_id = a.flight_id
          AND (r.x <> a.x OR r.y <> a.y)
          AND (r.x <> b.x OR r.y <> b.y)
          AND NOT (
            (b.x - a.x) * (r.y - a.y) - (b.y - a.y) * (r.x - a.x) > 0
            OR (
              (b.x - a.x) * (r.y - a.y) - (b.y - a.y) * (r.x - a.x) = 0
              AND (r.x - a.x) * (b.x - a.x) + (r.y - a.y) * (b.y - a.y) > 0
              AND (r.x - a.x) * (b.x - a.x) + (r.y - a.y) * (b.y - a.y)
                  < (b.x - a.x) * (b.x - a.x) + (b.y - a.y) * (b.y - a.y)
            )
          )
      )
    ),
    hull AS (
      SELECT e.flight_id,
             COUNT(DISTINCT (e.ax, e.ay)) AS n_hull,
             ABS(SUM(e.ax * e.by - e.bx * e.ay)) AS a2,
             COUNT(*) AS n_edges
      FROM edges e GROUP BY e.flight_id
    )
    SELECT n.flight_id,
           n.n_points,
           CAST(CASE WHEN c.np = 1 THEN 1 ELSE h.n_hull END AS INT)
             AS n_hull_points,
           CASE WHEN c.np <= 2 OR h.n_hull < 3 THEN CAST(0.0 AS DOUBLE)
                ELSE CAST(h.a2 AS DOUBLE) / 20000.0 END AS hull_area_deg2
    FROM npt n
    JOIN cnt c ON c.flight_id = n.flight_id
    LEFT JOIN hull h ON h.flight_id = n.flight_id
    ORDER BY n.flight_id
    """


@query("q291_convex_hull", oracle=_Q291_ORACLE)
def q291_convex_hull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-track convex hull (Andrew's monotone chain): hull vertex
    count and shoelace area in squared degrees — the tight
    operating-area summary the reference approximates with bounding
    boxes (track.go's FullBoundingBox / AsContiguousBoxes, q22/
    boxes.py). The chain scan is sequential over the sorted point
    set, so it runs per flight in Arrow-batched applyInPandas over
    the BOUNDED per-flight points, entirely in EXACT integer
    hundredth-degree units — which lets the SQL oracle recompute the
    identical hull by the O(n^3-per-flight) extreme-edge
    characterization and hash-match exactly (was rows-only before
    r8; the containment invariants remain in tests).

    Plan: one flight-keyed shuffle; Python sees (flight_id, lat, lon)
    only."""
    tp = synth_trackpoints(spark, sf_dir)

    def _apply(pdf):
        return convex_hull_stats(pdf)

    return (
        tp.select("flight_id", "lat", "lon")
        .groupBy("flight_id")
        .applyInPandas(_apply, schema=_HULL_SCHEMA)
        .orderBy("flight_id")
    )
