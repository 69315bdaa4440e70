"""Track-vs-restrictor intersection — the reference's signature operator.

A restrictor is a box / polygon / vertical plane ("gate") with an
altitude band and an excluding flag; sets combine with ALL/ANY logic
(georestrictorset.go:17-27, intersectabletrack.go:35-55). The crawl
finds entry/exit indices where the track crosses the region
(intersectabletrack.go:284-400), with the edge cases the reference's
tests pin down: started-inside, fell-off-end-inside, single-point
tracks, and fly-through between samples (line overlaps region though
neither endpoint is inside).

Spark shape (100 TB-ready):
  1. bbox prefilter — plain range predicates on lat/lon, pushed to the
     parquet scan (replaces the reference's quadtree prune,
     intersectabletrack.go:123-141,184-226);
  2. the exact crawl — applyInPandas per flight_id group (Arrow batch,
     numpy inside), restrictors broadcast as plain Python data;
  3. set logic — boolean aggregation over per-restrictor outcomes.

Entry/exit convention (documented, test-pinned in tests/test_intersect.py):
  i_entry — index of the first point inside the region; for a pure
            fly-through segment (k→k+1 crosses, neither point inside)
            it is k, the segment start (the reference's "line contains
            region" case, intersectabletrack.go:330-340).
  i_exit  — index of the first subsequent point outside (the
            reference's "first non-contained line"); the last index if
            the track ends inside (fell-off-end).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import point_in_poly, segment_intersects_box, segments_intersect

KM_PER_DEG_LAT = 111.32
BBOX_PAD_KM = 0.5  # same +500 m pad as the quadtree prune (intersectabletrack.go:194)


@dataclass(frozen=True)
class Restrictor:
    gr_type: str  # 'squarebox' | 'verticalplane' | 'polygon'
    alt_min: float = 0.0  # 0 = unbounded (georestrictorset.go form semantics)
    alt_max: float = 0.0
    is_excluding: bool = False
    # squarebox
    center_lat: float = 0.0
    center_lon: float = 0.0
    side_km: float = 0.0
    # verticalplane (gate)
    start_lat: float = 0.0
    start_lon: float = 0.0
    end_lat: float = 0.0
    end_lon: float = 0.0
    # polygon ((lat, lon) vertices, ≤10 like georestrictorset.go:143-147)
    poly: tuple = field(default_factory=tuple)

    def bbox(self) -> tuple[float, float, float, float]:
        """(lat_min, lat_max, lon_min, lon_max) incl. pad, for prefilter."""
        if self.gr_type == "squarebox":
            half_lat = (self.side_km / 2 + BBOX_PAD_KM) / KM_PER_DEG_LAT
            half_lon = (self.side_km / 2 + BBOX_PAD_KM) / (
                KM_PER_DEG_LAT * math.cos(math.radians(self.center_lat))
            )
            return (
                self.center_lat - half_lat,
                self.center_lat + half_lat,
                self.center_lon - half_lon,
                self.center_lon + half_lon,
            )
        if self.gr_type == "verticalplane":
            lats = [self.start_lat, self.end_lat]
            lons = [self.start_lon, self.end_lon]
        else:
            lats = [p[0] for p in self.poly]
            lons = [p[1] for p in self.poly]
        pad_lat = BBOX_PAD_KM / KM_PER_DEG_LAT
        pad_lon = BBOX_PAD_KM / (KM_PER_DEG_LAT * math.cos(math.radians(sum(lats) / len(lats))))
        return (min(lats) - pad_lat, max(lats) + pad_lat, min(lons) - pad_lon, max(lons) + pad_lon)

    def _alt_ok(self, a1: float, a2: float) -> bool:
        """Altitude-band overlap of a segment (0/0 band = unbounded)."""
        if self.alt_min == 0 and self.alt_max == 0:
            return True
        lo, hi = min(a1, a2), max(a1, a2)
        amax = self.alt_max if self.alt_max > 0 else math.inf
        return hi >= self.alt_min and lo <= amax

    def _box_extent(self) -> tuple[float, float, float, float]:
        half_lat = self.side_km / 2 / KM_PER_DEG_LAT
        half_lon = self.side_km / 2 / (
            KM_PER_DEG_LAT * math.cos(math.radians(self.center_lat))
        )
        return (
            self.center_lat - half_lat,
            self.center_lat + half_lat,
            self.center_lon - half_lon,
            self.center_lon + half_lon,
        )

    def contains_point(self, lat: float, lon: float, alt: float) -> bool:
        if not self._alt_ok(alt, alt):
            return False
        if self.gr_type == "squarebox":
            lat_min, lat_max, lon_min, lon_max = self._box_extent()
            return lat_min <= lat <= lat_max and lon_min <= lon <= lon_max
        if self.gr_type == "polygon":
            return point_in_poly(lat, lon, list(self.poly))
        return False  # a plane has no interior

    def segment_hits(self, p1, p2) -> bool:
        """Does the 3D segment p1→p2 ((lat, lon, alt)) intersect the
        restrictor? 2D test + altitude-band overlap of the segment."""
        if not self._alt_ok(p1[2], p2[2]):
            return False
        a, b = (p1[0], p1[1]), (p2[0], p2[1])
        if self.gr_type == "squarebox":
            lat_min, lat_max, lon_min, lon_max = self._box_extent()
            return segment_intersects_box(a, b, lat_min, lat_max, lon_min, lon_max)
        if self.gr_type == "verticalplane":
            # a gate is *crossed*, not touched: the segment must change
            # sides of the plane line (a track coincident with the plane
            # is not an intersection — the reference "works hard" to
            # exclude that case, intersectabletrack_test.go:290-293).
            gs, ge = (self.start_lat, self.start_lon), (self.end_lat, self.end_lon)

            def orient(p, q, r):
                v = (q[1] - p[1]) * (r[0] - p[0]) - (q[0] - p[0]) * (r[1] - p[1])
                return 0 if v == 0 else (1 if v > 0 else -1)

            o1, o2 = orient(gs, ge, a), orient(gs, ge, b)
            if o1 * o2 > 0 or (o1 == 0 and o2 == 0):
                return False  # same side, or collinear along the plane
            # crossing must fall within the gate's lateral extent
            o3, o4 = orient(a, b, gs), orient(a, b, ge)
            return o3 * o4 <= 0
        # polygon: endpoint inside or edge crossing
        verts = list(self.poly)
        if point_in_poly(*a, verts) or point_in_poly(*b, verts):
            return True
        n = len(verts)
        return any(segments_intersect(a, b, verts[i], verts[(i + 1) % n]) for i in range(n))


def crawl_track(
    lats: np.ndarray, lons: np.ndarray, alts: np.ndarray, r: Restrictor
) -> tuple[int, int, bool]:
    """Entry/exit crawl over one time-ordered track. Returns
    (i_entry, i_exit, hit); indices are -1 when absent. Replicates the
    reference's crawl semantics (intersectabletrack.go:284-364 for areas,
    :371-400 for planes) under the convention in the module docstring."""
    n = len(lats)
    if n == 0:
        return -1, -1, False
    if n == 1:  # single-point subtrack (intersectabletrack.go's edge case)
        inside = r.contains_point(lats[0], lons[0], alts[0])
        return (0, 0, True) if inside else (-1, -1, False)

    inside = np.array(
        [r.contains_point(lats[i], lons[i], alts[i]) for i in range(n)], dtype=bool
    )
    entry = -1
    if inside[0]:  # started inside
        entry = 0
    else:
        for k in range(n - 1):
            if inside[k + 1]:
                entry = k + 1
                break
            if r.segment_hits(
                (lats[k], lons[k], alts[k]), (lats[k + 1], lons[k + 1], alts[k + 1])
            ):
                entry = k  # fly-through: line overlaps region
                break
    if entry == -1:
        return -1, -1, False
    if r.gr_type == "verticalplane":
        # a gate is crossed, not occupied: exit = point on the far side
        exit_i = min(entry + 1, n - 1)
        return entry, exit_i, True
    exit_i = n - 1  # fell off the end still inside
    for k in range(entry + 1, n):
        if not inside[k]:
            exit_i = k
            break
    return entry, exit_i, True


OUTCOME_SCHEMA = (
    "flight_id string, restrictor_idx int, i_entry int, i_exit int, "
    "entry_ts timestamp, exit_ts timestamp, satisfied boolean"
)


def intersect_tracks(
    tp: DataFrame, restrictors: list[Restrictor], prefilter: bool = True
) -> DataFrame:
    """Per-(flight, restrictor) intersection outcomes.

    ``tp`` is a long-format trackpoints DataFrame (flight_id, ts, lat,
    lon, alt_ft). Restrictors ride along in the closure as plain data
    (they are tiny; the reference broadcasts them the same way). With
    ``prefilter``, flights that never enter any restrictor's padded bbox
    are dropped by a pushdown-eligible semi-join before Python sees a
    row — the quadtree prune, set-based."""
    if prefilter and restrictors:
        cond = None
        for r in restrictors:
            lat_min, lat_max, lon_min, lon_max = r.bbox()
            c = (
                (F.col("lat") >= lat_min)
                & (F.col("lat") <= lat_max)
                & (F.col("lon") >= lon_min)
                & (F.col("lon") <= lon_max)
            )
            cond = c if cond is None else (cond | c)
        hits = tp.filter(cond).select("flight_id").distinct()
        tp = tp.join(F.broadcast(hits), "flight_id", "left_semi")

    rs = list(restrictors)

    def crawl_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        lats = pdf["lat"].to_numpy(dtype=np.float64)
        lons = pdf["lon"].to_numpy(dtype=np.float64)
        alts = pdf["alt_ft"].to_numpy(dtype=np.float64)
        ts = pdf["ts"].to_numpy()
        fid = pdf["flight_id"].iloc[0]
        rows = []
        for idx, r in enumerate(rs):
            i, j, hit = crawl_track(lats, lons, alts, r)
            satisfied = (not hit) if r.is_excluding else hit  # excluders invert
            rows.append(
                {
                    "flight_id": fid,
                    "restrictor_idx": idx,
                    "i_entry": i,
                    "i_exit": j,
                    "entry_ts": ts[i] if i >= 0 else None,
                    "exit_ts": ts[j] if j >= 0 else None,
                    "satisfied": satisfied,
                }
            )
        return pd.DataFrame(rows)

    return (
        tp.select("flight_id", "ts", "lat", "lon", "alt_ft")
        .groupBy("flight_id")
        .applyInPandas(crawl_group, schema=OUTCOME_SCHEMA)
    )


def satisfies_set(outcomes: DataFrame, logic: str = "all") -> DataFrame:
    """Set-level verdict per flight (ALL/ANY, intersectabletrack.go:35-55)
    plus the 'blame' restrictor — the first unsatisfied one
    (intersectabletrack.go:60-76)."""
    agg = outcomes.groupBy("flight_id").agg(
        F.min(F.col("satisfied").cast("int")).alias("_all"),
        F.max(F.col("satisfied").cast("int")).alias("_any"),
        F.min(F.when(~F.col("satisfied"), F.col("restrictor_idx"))).alias("blame_idx"),
    )
    verdict = (F.col("_all") == 1) if logic == "all" else (F.col("_any") == 1)
    return agg.select(
        "flight_id",
        verdict.alias("satisfies_set"),
        F.when(~verdict, F.col("blame_idx")).alias("blame_idx"),
    )
