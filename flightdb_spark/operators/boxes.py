"""Contiguous-box track covers and box-cover overlap.

AsContiguousBoxes (track.go:683-761) turns a track into a chain of
lat/lon boxes approximating where the aircraft actually was: walk the
points, cut a box whenever the distance from the last cut exceeds
minSize (0.05 latlong units); chop runs longer than maxSize (0.10) into
interpolated sub-boxes; pad every box to at least minWidth (0.01) per
side. The cover is what makes track↔track overlap testing honest — a
single full bounding box over an L-shaped track claims the whole
rectangle, and two tracks in disjoint areas whose bboxes overlap would
wrongly compare as "same thing".

The reference compares two covers with geo.CompareBoxSlices (an
external package); the equivalent test here is: any box of one cover
intersects any box of the other, with confidence = the fraction of the
smaller cover's boxes that hit. Degenerate tracks (too short to emit a
box) fall back to their padded full bounding box, which reproduces
CompareInSpace's behavior for short tracks (track.go:376-402).

The numpy core feeds the assembly state machine (streaming/assembly.py);
`contiguous_boxes` wraps it per-flight for DataFrame callers
(applyInPandas, one Arrow batch per flight — same shape as the
intersection crawl).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

MIN_SIZE = 0.05  # latlong units (~3 NM) — cut a box past this span
MAX_SIZE = 0.10  # chop longer runs into interpolated sub-boxes
MIN_WIDTH = 0.01  # pad boxes to at least this wide/tall


def as_contiguous_boxes(
    ts: np.ndarray, lat: np.ndarray, lon: np.ndarray
) -> list[tuple[float, float, float, float, float, float]]:
    """Track (time-ordered) → [(lat0, lat1, lon0, lon1, t0, t1)].

    Distances are Euclidean in latlong units, as in the reference
    (LatlongDist; the constants are calibrated to that metric)."""
    n = len(ts)
    boxes: list[list[float]] = []
    i_last = 0
    for i in range(1, n):
        dist = float(np.hypot(lat[i] - lat[i_last], lon[i] - lon[i_last]))
        if dist > MAX_SIZE:
            # interpolate boxes into the gap (track.go:694-733)
            n_needed = int(dist / MAX_SIZE) + 1
            frac = 1.0 / n_needed
            for j in range(n_needed):
                f0, f1 = frac * j, frac * (j + 1)
                la0 = lat[i_last] + (lat[i] - lat[i_last]) * f0
                la1 = lat[i_last] + (lat[i] - lat[i_last]) * f1
                lo0 = lon[i_last] + (lon[i] - lon[i_last]) * f0
                lo1 = lon[i_last] + (lon[i] - lon[i_last]) * f1
                t0 = ts[i_last] + (ts[i] - ts[i_last]) * f0
                t1 = ts[i_last] + (ts[i] - ts[i_last]) * f1
                boxes.append(
                    [min(la0, la1), max(la0, la1), min(lo0, lo1), max(lo0, lo1), t0, t1]
                )
            i_last = i
        elif dist > MIN_SIZE:
            # grow a box over points i_last..i (track.go:735-747)
            la = lat[i_last : i + 1]
            lo = lon[i_last : i + 1]
            boxes.append(
                [la.min(), la.max(), lo.min(), lo.max(), ts[i_last], ts[i]]
            )
            i_last = i
        # else: too close; keep growing toward the next point
    for b in boxes:  # EnsureMinSide (track.go:755-757)
        for d in (0, 2):
            w = b[d + 1] - b[d]
            if w < MIN_WIDTH:
                pad = (MIN_WIDTH - w) / 2
                b[d] -= pad
                b[d + 1] += pad
    return [tuple(b) for b in boxes]


def _cover_or_bbox(ts, lat, lon):
    """Cover for comparison purposes: contiguous boxes, or (for tracks
    too short/slow to emit one) the padded full bounding box."""
    ts, lat, lon = np.asarray(ts, float), np.asarray(lat, float), np.asarray(lon, float)
    if len(ts) == 0:
        return []
    boxes = as_contiguous_boxes(ts, lat, lon)
    if not boxes:
        b = [lat.min(), lat.max(), lon.min(), lon.max(), ts[0], ts[-1]]
        for d in (0, 2):
            w = b[d + 1] - b[d]
            if w < MIN_WIDTH:
                pad = (MIN_WIDTH - w) / 2
                b[d] -= pad
                b[d + 1] += pad
        boxes = [tuple(b)]
    return boxes


def box_covers_overlap(cover1, cover2) -> tuple[bool, float]:
    """Space overlap of two covers (the CompareBoxSlices stand-in):
    True if any box of one intersects any box of the other; confidence
    is the hit fraction of the smaller cover."""
    if not cover1 or not cover2:
        return False, 0.0
    a = np.asarray([b[:4] for b in cover1], float)
    b = np.asarray([c[:4] for c in cover2], float)
    # pairwise interval overlap in both dims
    lat_ok = (a[:, None, 0] <= b[None, :, 1]) & (b[None, :, 0] <= a[:, None, 1])
    lon_ok = (a[:, None, 2] <= b[None, :, 3]) & (b[None, :, 2] <= a[:, None, 3])
    hits = lat_ok & lon_ok
    if not hits.any():
        return False, 0.0
    if len(a) <= len(b):
        conf = float(hits.any(axis=1).mean())
    else:
        conf = float(hits.any(axis=0).mean())
    return True, conf


def tracks_space_overlap(ts1, lat1, lon1, ts2, lat2, lon2) -> bool:
    """Track↔track space overlap at box-cover granularity."""
    ok, _conf = box_covers_overlap(
        _cover_or_bbox(ts1, lat1, lon1), _cover_or_bbox(ts2, lat2, lon2)
    )
    return ok


BOXES_SCHEMA = (
    "flight_id string, box_idx int, lat0 double, lat1 double, "
    "lon0 double, lon1 double, t0 timestamp, t1 timestamp"
)


def contiguous_boxes(tp: DataFrame) -> DataFrame:
    """Per-flight contiguous-box cover as a DataFrame op: (flight_id,
    ts, lat, lon) → one row per box. Arrow batch per flight."""

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("ts", kind="mergesort")
        fid = pdf["flight_id"].iloc[0]
        ts = pdf["ts"].astype("int64").to_numpy() / 1e9
        boxes = as_contiguous_boxes(
            ts, pdf["lat"].to_numpy(float), pdf["lon"].to_numpy(float)
        )
        return pd.DataFrame(
            [
                (fid, i, b[0], b[1], b[2], b[3],
                 pd.Timestamp(b[4], unit="s"), pd.Timestamp(b[5], unit="s"))
                for i, b in enumerate(boxes)
            ],
            columns=["flight_id", "box_idx", "lat0", "lat1", "lon0", "lon1", "t0", "t1"],
        )

    return (
        tp.select("flight_id", "ts", "lat", "lon")
        .groupBy("flight_id")
        .applyInPandas(run, schema=BOXES_SCHEMA)
    )
