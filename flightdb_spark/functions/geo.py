"""Geo math — haversine, bearing, point-in-box/poly, segment intersection.

The reference imports all of this from the external skypies/geo package
(used at trackpoint.go:8, track.go:13); it is a build item for us
(SURVEY.md §2.7). Two layers:

  - Spark Column expressions (`haversine_km`, `bearing_deg`, ...) —
    JVM-side, whole-stage-codegen, the hot path for 100 TB scans;
  - NumPy twins (`np_haversine_km`, segment/box predicates) — used
    inside pandas-UDF geometry (the restrictor entry/exit crawl,
    intersectabletrack.go:284-400).

Earth radius 6371.0 km (mean radius), consistent across both layers.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0

# SQL fragment twin (DuckDB + Spark SQL compatible) for oracle queries.
HAVERSINE_SQL = (
    "2.0 * 6371.0 * ASIN(SQRT("
    "POW(SIN(RADIANS({lat2} - {lat1}) / 2), 2) + "
    "COS(RADIANS({lat1})) * COS(RADIANS({lat2})) * "
    "POW(SIN(RADIANS({lon2} - {lon1}) / 2), 2)))"
)


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km (column expression, codegen'd)."""
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.pow(F.sin(dlat), 2) + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(
        F.sin(dlon), 2
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def bearing_deg(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Initial great-circle bearing in [0, 360)."""
    lat1r, lat2r = F.radians(lat1), F.radians(lat2)
    dlon = F.radians(lon2 - lon1)
    y = F.sin(dlon) * F.cos(lat2r)
    x = F.cos(lat1r) * F.sin(lat2r) - F.sin(lat1r) * F.cos(lat2r) * F.cos(dlon)
    return F.pmod(F.degrees(F.atan2(y, x)), F.lit(360.0))


def dist3_km(
    lat1: Column, lon1: Column, alt1_ft: Column, lat2: Column, lon2: Column, alt2_ft: Column
) -> Column:
    """3D distance: haversine ground distance + altitude leg (ft→km).
    Mirrors snapshot.LocalizeTo's 3D distance (snapshot.go:27-33)."""
    ground = haversine_km(lat1, lon1, lat2, lon2)
    dalt_km = (alt2_ft - alt1_ft) * F.lit(0.0003048)
    return F.sqrt(F.pow(ground, 2) + F.pow(dalt_km, 2))


# ---------------------------------------------------------------------------
# NumPy twins for pandas-UDF internals
# ---------------------------------------------------------------------------


def np_haversine_km(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, dtype=np.float64)) for x in (lat1, lon1, lat2, lon2))
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * np.arcsin(np.sqrt(a))


def np_bearing_deg(lat1, lon1, lat2, lon2):
    lat1, lon1, lat2, lon2 = (np.radians(np.asarray(x, dtype=np.float64)) for x in (lat1, lon1, lat2, lon2))
    y = np.sin(lon2 - lon1) * np.cos(lat2)
    x = np.cos(lat1) * np.sin(lat2) - np.sin(lat1) * np.cos(lat2) * np.cos(lon2 - lon1)
    return np.degrees(np.arctan2(y, x)) % 360.0


def point_in_box(lat, lon, lat_min, lat_max, lon_min, lon_max):
    return (lat >= lat_min) & (lat <= lat_max) & (lon >= lon_min) & (lon <= lon_max)


def point_in_poly(lat: float, lon: float, poly: list[tuple[float, float]]) -> bool:
    """Ray-casting point-in-polygon ((lat, lon) vertex list)."""
    inside = False
    n = len(poly)
    j = n - 1
    for i in range(n):
        yi, xi = poly[i]
        yj, xj = poly[j]
        if (xi > lon) != (xj > lon) and lat < (yj - yi) * (lon - xi) / (xj - xi) + yi:
            inside = not inside
        j = i
    return inside


def segments_intersect(p1, p2, p3, p4) -> bool:
    """2D segment intersection via orientation tests ((lat, lon) pairs)."""

    def orient(a, b, c):
        v = (b[1] - a[1]) * (c[0] - a[0]) - (b[0] - a[0]) * (c[1] - a[1])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    o1, o2 = orient(p1, p2, p3), orient(p1, p2, p4)
    o3, o4 = orient(p3, p4, p1), orient(p3, p4, p2)
    if o1 != o2 and o3 != o4:
        return True
    if o1 == 0 and on_seg(p1, p2, p3):
        return True
    if o2 == 0 and on_seg(p1, p2, p4):
        return True
    if o3 == 0 and on_seg(p3, p4, p1):
        return True
    return o4 == 0 and on_seg(p3, p4, p2)


def segment_intersects_box(p1, p2, lat_min, lat_max, lon_min, lon_max) -> bool:
    """Does segment p1→p2 ((lat, lon)) touch the box? Either endpoint
    inside, or the segment crosses any box edge."""
    for p in (p1, p2):
        if lat_min <= p[0] <= lat_max and lon_min <= p[1] <= lon_max:
            return True
    corners = [
        (lat_min, lon_min),
        (lat_min, lon_max),
        (lat_max, lon_max),
        (lat_max, lon_min),
    ]
    return any(
        segments_intersect(p1, p2, corners[i], corners[(i + 1) % 4]) for i in range(4)
    )
