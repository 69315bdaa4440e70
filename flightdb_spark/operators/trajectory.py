"""Trajectory similarity — which flights flew (nearly) the same path?

The LLM-pipeline similarity-search surface (SURVEY §7 step 10) applied
to the domain's own data: track-to-track similarity via symmetric
Hausdorff distance. All set-based and JVM-side:

  directed_hausdorff(A→B) = max over a∈A of min over b∈B of dist(a,b)

expressed as a pair join + two-level aggregation (min per source point,
then max per pair). For the 100 TB path, candidate pairs come from a
coarse grid-cell equi-join (flights sharing ≥1 cell) rather than the
all-pairs cross join — the same bucket-join shape as the LSH ANN path
(queries/vector.py q42).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_km

GRID_DEG = 0.5  # coarse candidate grid (~55 km cells)


def directed_hausdorff(tp_a: DataFrame, tp_b: DataFrame) -> DataFrame:
    """Directed Hausdorff A→B per (flight_a, flight_b) pair; inputs are
    (flight_id, lat, lon) point sets."""
    a = tp_a.select(
        F.col("flight_id").alias("flight_a"),
        F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
    )
    b = tp_b.select(
        F.col("flight_id").alias("flight_b"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
    )
    d = haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
    per_point = (
        a.join(b, F.col("flight_a") != F.col("flight_b"))
        .groupBy("flight_a", "flight_b", "alat", "alon")
        .agg(F.min(d).alias("_min_d"))
    )
    return per_point.groupBy("flight_a", "flight_b").agg(
        F.max("_min_d").alias("hausdorff_km")
    )


def symmetric_hausdorff(tp: DataFrame) -> DataFrame:
    """Symmetric Hausdorff = max(directed(A→B), directed(B→A)), one row
    per unordered pair (flight_a < flight_b)."""
    d = directed_hausdorff(tp, tp)
    lo = F.least("flight_a", "flight_b").alias("flight_a")
    hi = F.greatest("flight_a", "flight_b").alias("flight_b")
    return (
        d.select(lo, hi, "hausdorff_km")
        .groupBy("flight_a", "flight_b")
        .agg(F.max("hausdorff_km").alias("hausdorff_km"))
    )


def directed_hausdorff_via_pairs(tp: DataFrame, pairs: DataFrame) -> DataFrame:
    """Directed Hausdorff flight_a→flight_b restricted to a candidate
    pair list — the 100 TB path. Points reach each other only through
    two *equi*-joins on the pair columns (never a `flight_a != flight_b`
    theta-join), so cost tracks |pairs| × points-per-flight², not n²
    over the fleet. ``pairs`` is (flight_a, flight_b), directed."""
    pts_a = tp.select(
        F.col("flight_id").alias("flight_a"),
        F.col("lat").alias("alat"),
        F.col("lon").alias("alon"),
    )
    pts_b = tp.select(
        F.col("flight_id").alias("flight_b"),
        F.col("lat").alias("blat"),
        F.col("lon").alias("blon"),
    )
    d = haversine_km(F.col("alat"), F.col("alon"), F.col("blat"), F.col("blon"))
    per_point = (
        pairs.join(pts_a, "flight_a")
        .join(pts_b, "flight_b")
        .groupBy("flight_a", "flight_b", "alat", "alon")
        .agg(F.min(d).alias("_min_d"))
    )
    return per_point.groupBy("flight_a", "flight_b").agg(
        F.max("_min_d").alias("hausdorff_km")
    )


def symmetric_hausdorff_grid(tp: DataFrame, grid_deg: float = GRID_DEG) -> DataFrame:
    """Scale-safe symmetric Hausdorff: grid candidate pairs → pair-gated
    directed distances both ways → max per unordered pair. On flights
    that share ≥1 grid cell this equals symmetric_hausdorff exactly
    (the grid only *prunes* pairs, it never changes a computed value)."""
    pairs = candidate_pairs_by_grid(tp, grid_deg)
    both = pairs.select("flight_a", "flight_b").union(
        pairs.select("flight_b", "flight_a")  # positional: reversed direction
    )
    d = directed_hausdorff_via_pairs(tp.select("flight_id", "lat", "lon"), both)
    return (
        d.select(
            F.least("flight_a", "flight_b").alias("flight_a"),
            F.greatest("flight_a", "flight_b").alias("flight_b"),
            "hausdorff_km",
        )
        .groupBy("flight_a", "flight_b")
        .agg(F.max("hausdorff_km").alias("hausdorff_km"))
    )


def candidate_pairs_by_grid(tp: DataFrame, grid_deg: float = GRID_DEG) -> DataFrame:
    """Scale path: flights sharing ≥1 coarse grid cell become candidate
    pairs (equi-join on the cell id — cost tracks co-located flights,
    never n²). One join side is expanded to its 3×3 cell neighborhood so
    tracks straddling a cell boundary still pair (the standard
    one-sided-expansion trick: expanding both sides would double-count).
    Feed the result's pairs to directed_hausdorff on the pruned sets."""
    cy = F.floor(F.col("lat") / grid_deg).cast("long")
    cx = F.floor(F.col("lon") / grid_deg).cast("long")
    a = tp.select(
        F.col("flight_id").alias("flight_a"),
        F.concat_ws(":", cy, cx).alias("cell"),
    ).distinct()
    offsets = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    neighbor_cells = F.array(
        *[F.concat_ws(":", cy + dy, cx + dx) for dy, dx in offsets]
    )
    b = (
        tp.select(F.col("flight_id").alias("flight_b"), F.explode(neighbor_cells).alias("cell"))
        .distinct()
    )
    return (
        a.join(b, "cell")
        .filter(F.col("flight_a") < F.col("flight_b"))
        .select("flight_a", "flight_b")
        .distinct()
    )
