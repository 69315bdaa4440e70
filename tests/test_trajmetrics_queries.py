"""Semantic checks for batch 29 (q290-q291): tortuosity lower bound
and the convex-hull parity + containment invariants."""

import pandas as pd

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.synth import synth_trackpoints
from flightdb_spark.queries.trajmetrics import convex_hull_stats

REGISTRY = load_registry()


def test_tortuosity_at_least_one(spark, sf_dir):
    out = REGISTRY["q290_tortuosity"].fn(spark, sf_dir).toPandas()
    ok = out[out.tortuosity.notna()]
    # flown path length can never beat the great-circle displacement
    # (tiny rounding slack: steps round at 6 dp before summing)
    assert (ok.tortuosity >= 1 - 1e-3).all()
    assert (out.flown_km >= out.straight_km - 1e-3).all()


def test_convex_hull_matches_python_and_contains(spark, sf_dir):
    out = REGISTRY["q291_convex_hull"].fn(spark, sf_dir).toPandas()
    tp = synth_trackpoints(spark, sf_dir).select("flight_id", "lat", "lon").toPandas()
    for fid, grp in list(tp.groupby("flight_id"))[:10]:
        expect = convex_hull_stats(grp.assign(flight_id=fid)).iloc[0]
        got = out[out.flight_id == fid].iloc[0]
        assert got.n_points == len(grp)
        assert got.n_hull_points == expect.n_hull_points
        assert abs(got.hull_area_deg2 - expect.hull_area_deg2) < 1e-9
        # containment: hull area <= bounding box area; vertices <= distinct pts
        bbox = (grp.lon.max() - grp.lon.min()) * (grp.lat.max() - grp.lat.min())
        assert got.hull_area_deg2 <= bbox + 1e-9
        assert got.n_hull_points <= len(set(zip(grp.lon, grp.lat)))
