"""Invariant checks for batch 96 (q546-q550, flight operations 2)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_descent_profile(spark, sf_dir):
    rows = REGISTRY["q546_descent_profile"].fn(spark, sf_dir).collect()
    assert len(rows) == 15  # one per synthetic flight at sf0.001
    for r in rows:
        assert r["n_descent_steps"] > 0
        assert 0 < r["mean_descent_fpm"] <= r["max_descent_fpm"]
        assert 0.0 <= r["steep_share"] <= 1.0


def test_level_busts_bounded(spark, sf_dir):
    rows = REGISTRY["q547_level_busts"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["n_level_busts"] <= r["n_points"]


def test_terminal_census_bands(spark, sf_dir):
    rows = REGISTRY["q548_terminal_area_census"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["airport"] in ("apt1", "apt2")
        assert r["band"] in ("terminal", "overflight")
        assert 0 < r["n_flights"] <= r["n_points"]


def test_gap_census_consistent(spark, sf_dir):
    rows = REGISTRY["q549_track_gap_census"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    for r in rows:
        assert r["median_gap_s"] > 0
        assert 0 <= r["n_break_gaps"] < r["n_gaps"]


def test_reversals_bounded(spark, sf_dir):
    rows = REGISTRY["q550_vertical_reversals"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    for r in rows:
        assert 0 <= r["n_reversals"] < r["n_moves"]
        assert 0.0 <= r["reversal_rate"] < 1.0
