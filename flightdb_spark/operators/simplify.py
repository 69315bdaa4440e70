"""Douglas-Peucker polyline simplification per flight track.

The reference downsamples tracks by time (SampleEvery, track.go:604)
and by distance (SampleEveryDist, track.go:639) — both keep points by
spacing, blind to shape. Douglas-Peucker keeps the points that MATTER
to the geometry (turn apexes survive, straight runs collapse), the
standard rendering/storage reduction for GPS traces. No reference
analog; this is an extension of the §2.4 track-operator family.

Shape: applyInPandas per flight (the same deliberate Arrow boundary as
the intersect crawl — per-track array recursion cannot be expressed as
a window), with all points of one flight in one group. Deviation is
planar-equirectangular km (lat/lon scaled by cos of the track's mean
latitude), exact enough at track extents and cheap; the recursion is
an explicit stack, worst case O(n^2) for pathological zigzags but
~O(n log n) on real tracks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

KM_PER_DEG = 111.32

SIMPLIFIED_SCHEMA = (
    "flight_id long, point_idx long, ts timestamp, lat double, lon double"
)


def _dp_keep_mask(x: np.ndarray, y: np.ndarray, eps: float) -> np.ndarray:
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i, j = stack.pop()
        if j <= i + 1:
            continue
        # perpendicular distance of interior points to chord (i, j)
        dx, dy = x[j] - x[i], y[j] - y[i]
        seg = np.hypot(dx, dy)
        px, py = x[i + 1 : j], y[i + 1 : j]
        if seg == 0.0:
            d = np.hypot(px - x[i], py - y[i])
        else:
            d = np.abs(dx * (y[i] - py) - (x[i] - px) * dy) / seg
        k = int(np.argmax(d))  # first max: deterministic tie-break
        if d[k] > eps:
            split = i + 1 + k
            keep[split] = True
            stack.append((i, split))
            stack.append((split, j))
    return keep


def douglas_peucker(tp: DataFrame, epsilon_km: float) -> DataFrame:
    """Simplify each flight's track to the points deviating more than
    ``epsilon_km`` from the running chords. Input needs columns
    flight_id, ts, lat, lon; output adds ``point_idx`` (the point's
    index in the original time-ordered track). Deterministic: ordering
    by (ts, lat, lon) before the scan, first-max split tie-break."""

    def _one(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "lat", "lon"], kind="mergesort").reset_index(
            drop=True
        )
        if len(pdf) <= 2:
            keep = np.ones(len(pdf), dtype=bool)
        else:
            lat = pdf["lat"].to_numpy()
            lon = pdf["lon"].to_numpy()
            y = lat * KM_PER_DEG
            x = lon * KM_PER_DEG * np.cos(np.deg2rad(lat.mean()))
            keep = _dp_keep_mask(x, y, epsilon_km)
        out = pdf.loc[keep, ["flight_id", "ts", "lat", "lon"]].copy()
        out.insert(1, "point_idx", np.flatnonzero(keep).astype("int64"))
        return out

    return (
        tp.select("flight_id", "ts", "lat", "lon")
        .groupBy("flight_id")
        .applyInPandas(_one, SIMPLIFIED_SCHEMA)
    )
