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
from pyspark.sql import Window as W
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


# --- DTW (dynamic time warping) distance, grid-gated -------------------------------

DTW_MAX_POINTS = 64  # per-flight cap before the O(m·n) matrix
DTW_BAND = 8  # Sakoe-Chiba band half-width (after downsampling)


def dtw_via_pairs(tp: DataFrame, pairs: DataFrame) -> DataFrame:
    """DTW distance (planar-equirectangular km, symmetric step pattern,
    Sakoe-Chiba band) for each candidate flight pair — the
    time-warping-tolerant companion to directed_hausdorff_via_pairs
    (Hausdorff ignores ordering; DTW respects it, so a reversed track
    scores far instead of 0). Each flight is evenly downsampled to at
    most DTW_MAX_POINTS points JVM-side, so the Arrow stage sees a
    bounded matrix per pair; pairs come from candidate_pairs_by_grid
    (equi-join, never n²). Deterministic and ORACLE-EXACT: point order
    is (ts, lat, lon); downsample indices are exact integers; the mean
    latitude is an order-free integer micro-degree sum; per-cell costs
    quantize to integer micro-km BEFORE the DP, so the banded min-plus
    recursion runs entirely in int64 — the same numbers q213's
    unrolled SQL oracle computes (dtw_ukm is the hash-compared
    column; dtw_km is its display form)."""
    import numpy as np
    import pandas as pd

    w = W.partitionBy("flight_id").orderBy("ts", "lat", "lon")
    idx = tp.select(
        "flight_id",
        "lat",
        "lon",
        (F.row_number().over(w) - 1).alias("i"),
        F.count(F.lit(1)).over(W.partitionBy("flight_id")).alias("n"),
    )
    # even downsample: keep i=0 and every i where floor(i*K/n) advances
    # (K = cap; all-integer, engine-stable)
    keep = idx.filter(
        (F.col("n") <= DTW_MAX_POINTS)
        | (F.col("i") == 0)
        | (
            F.expr(f"i * {DTW_MAX_POINTS} div n")
            != F.expr(f"(i - 1) * {DTW_MAX_POINTS} div n")
        )
    )
    a_pts = keep.select(
        F.col("flight_id").alias("flight_a"),
        F.lit(0).alias("side"),
        "i",
        "lat",
        "lon",
    )
    b_pts = keep.select(
        F.col("flight_id").alias("flight_b"),
        F.lit(1).alias("side"),
        "i",
        "lat",
        "lon",
    )
    left = pairs.join(a_pts, "flight_a").select(
        "flight_a", "flight_b", "side", "i", "lat", "lon"
    )
    right = pairs.join(b_pts, "flight_b").select(
        "flight_a", "flight_b", "side", "i", "lat", "lon"
    )
    both = left.unionByName(right)

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        fa = int(pdf["flight_a"].iloc[0])
        fb = int(pdf["flight_b"].iloc[0])
        out = []
        g0 = pdf[pdf["side"] == 0].sort_values("i")
        g1 = pdf[pdf["side"] == 1].sort_values("i")
        if len(g0) and len(g1):
            lat0 = g0["lat"].to_numpy()
            lat1 = g1["lat"].to_numpy()
            # order-free mean latitude: exact integer micro-degree sum
            # (np.mean's pairwise summation is engine-private; the SQL
            # oracle must reproduce this value bit-for-bit)
            lat_u = np.floor(
                np.concatenate([lat0, lat1]) * 1e6 + 0.5
            ).astype(np.int64)
            mean_lat = float(lat_u.sum()) / float(len(lat_u) * 1_000_000)
            kx = 111.32 * np.cos(np.deg2rad(mean_lat))
            ax = g0["lon"].to_numpy() * kx
            ay = lat0 * 111.32
            bx = g1["lon"].to_numpy() * kx
            by = lat1 * 111.32
            m, n = len(ax), len(bx)
            band = max(DTW_BAND, abs(m - n) + 1)
            INF = 1 << 60
            prev = np.full(n + 1, INF, dtype=np.int64)
            prev[0] = 0
            for i in range(1, m + 1):
                cur = np.full(n + 1, INF, dtype=np.int64)
                lo = max(1, i - band)
                hi = min(n, i + band)
                dx = ax[i - 1] - bx[lo - 1 : hi]
                dy = ay[i - 1] - by[lo - 1 : hi]
                # element-wise sqrt (NOT np.hypot: different low bits)
                # then micro-km floor — the exact op sequence the SQL
                # oracle replays; the DP below is pure int64 min-plus
                cost = np.floor(
                    np.sqrt(dx * dx + dy * dy) * 1e6 + 0.5
                ).astype(np.int64)
                for k, j in enumerate(range(lo, hi + 1)):
                    cur[j] = cost[k] + min(prev[j], prev[j - 1], cur[j - 1])
                prev = cur
            dtw_u = int(prev[n])
            out.append((fa, fb, m, n, dtw_u, round(dtw_u / 1e6, 3)))
        return pd.DataFrame(
            out,
            columns=["flight_a", "flight_b", "n_a", "n_b", "dtw_ukm", "dtw_km"],
        )

    return both.groupBy("flight_a", "flight_b").applyInPandas(
        _one,
        "flight_a long, flight_b long, n_a int, n_b int, dtw_ukm long, dtw_km double",
    )
