"""Contiguous-box covers + track gluing plausibility, against the
reference's own scenarios (track_test.go:13-141)."""

from __future__ import annotations

import json
from datetime import datetime, timezone
from pathlib import Path

import numpy as np
import pytest

from flightdb_spark.operators.boxes import (
    as_contiguous_boxes,
    box_covers_overlap,
    tracks_space_overlap,
)
from flightdb_spark.streaming.assembly import (
    _Track,
    plausible_contribution,
    plausible_extension,
)

FIXTURE = json.loads(
    (Path(__file__).parent / "fixtures" / "gluing_tracks.json").read_text()
)


def _track(name: str) -> _Track:
    t = _Track()
    for p in FIXTURE[name]:
        ts = datetime.strptime(
            p["TimestampUTC"].replace("Z", "+0000"), "%Y-%m-%dT%H:%M:%S.%f%z"
        ).timestamp()
        t.ts.append(ts)
        t.lat.append(p["Lat"])
        t.lon.append(p["Long"])
        t.alt.append(p["Altitude"])
    return t


def _ext(a: str, b: str) -> bool:
    t1, t2 = _track(a), _track(b)
    return plausible_extension(t1, t2.ts, t2.lat, t2.lon)


def test_plausible_extension_reference_scenarios():
    # TestPlausibleExtension (track_test.go:129-136)
    assert _ext("t1a", "t1b") is True      # contiguous tracks
    assert _ext("t2a", "t2b") is False     # on different days
    assert _ext("t3a", "t3b") is False     # from the past
    assert _ext("t6a", "t6b") is True      # misordered, overlapping
    assert _ext("t7a", "t7b") is False     # took too long to cover gap


def test_plausible_contribution_accepts_past_prefix():
    # PlausibleContribution relaxes the out-of-order case (track.go:
    # 454-462): t3b precedes t3a by ~5 min, within 3x kExtensionMaxGap.
    t1, t2 = _track("t3a"), _track("t3b")
    assert plausible_contribution(t1, t2.ts, t2.lat, t2.lon) is True


def test_disjoint_areas_with_overlapping_bboxes_do_not_glue():
    # An L-shaped track's full bbox covers the whole square; a
    # concurrent track in the interior must NOT be accepted. (This is
    # the case the single-padded-bbox approximation got wrong.)
    t1 = _Track()
    n = 40
    for i in range(n):  # west edge going north
        t1.ts.append(1000.0 + i)
        t1.lat.append(37.0 + i * (1.0 / n))
        t1.lon.append(-122.0)
        t1.alt.append(10000.0)
    for i in range(n):  # north edge going east
        t1.ts.append(1000.0 + n + i)
        t1.lat.append(38.0)
        t1.lon.append(-122.0 + i * (1.0 / n))
        t1.alt.append(10000.0)
    ts2 = [1000.0 + i for i in range(2 * n)]
    lat2 = [37.2] * (2 * n)
    lon2 = [-121.2 + i * 0.001 for i in range(2 * n)]
    assert plausible_contribution(t1, ts2, lat2, lon2) is False
    # sanity: a fragment actually on the L is accepted
    ts3 = [1000.0 + i for i in range(5)]
    lat3 = [37.01 + i * 0.02 for i in range(5)]
    lon3 = [-122.0] * 5
    assert plausible_contribution(t1, ts3, lat3, lon3) is True


def test_as_contiguous_boxes_sizes():
    # A straight 1-degree run chops into >= 10 boxes (maxSize 0.10),
    # each at least minWidth (0.01) per side and within the run extent.
    ts = np.arange(11.0)
    lat = np.linspace(37.0, 38.0, 11)
    lon = np.full(11, -122.0)
    boxes = as_contiguous_boxes(ts, lat, lon)
    assert len(boxes) >= 10
    for la0, la1, lo0, lo1, t0, t1 in boxes:
        assert la1 - la0 >= 0.01 - 1e-12 and lo1 - lo0 >= 0.01 - 1e-12
        assert la1 - la0 <= 0.2 and 37.0 - 0.01 <= la0 <= la1 <= 38.0 + 0.01
        assert t1 >= t0
    # slow/short track: no boxes (all points within minSize)
    assert as_contiguous_boxes(ts[:3], np.array([37.0, 37.001, 37.002]),
                               np.array([-122.0, -122.0, -122.0])) == []


def test_box_covers_overlap_confidence():
    ts = np.arange(11.0)
    lat = np.linspace(37.0, 38.0, 11)
    lon = np.full(11, -122.0)
    c1 = as_contiguous_boxes(ts, lat, lon)
    ok, conf = box_covers_overlap(c1, c1)
    assert ok and conf == 1.0
    c2 = as_contiguous_boxes(ts, lat, np.full(11, -121.0))
    ok2, conf2 = box_covers_overlap(c1, c2)
    assert not ok2 and conf2 == 0.0
    assert tracks_space_overlap(ts, lat, lon, ts, lat, lon)
