"""Invariant checks for batch 77 (q451-q455, estimation sketches)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_ams_f2_estimates_bracket_truth(spark, sf_dir):
    row = REGISTRY["q451_ams_f2"].fn(spark, sf_dir).collect()[0]
    assert row["exact_f2"] > 0
    # E[X^2] = F2; with 16 sketches the mean estimator lands well
    # within an order of magnitude (std err ~ F2 * sqrt(2/16))
    assert 0.2 * row["exact_f2"] < row["ams_mean_est"] < 5 * row["exact_f2"]
    assert 0.2 * row["exact_f2"] < row["ams_median_est"] < 5 * row["exact_f2"]
    assert row["mean_rel_error"] >= 0


def test_weighted_reservoir_shape_and_priority(spark, sf_dir):
    rows = REGISTRY["q452_weighted_reservoir"].fn(spark, sf_dir).collect()
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["o_orderpriority"], []).append(r)
    assert len(by_grp) == 5
    for grp_rows in by_grp.values():
        assert sorted(r["pick"] for r in grp_rows) == [1, 2, 3]
        # picks are ordered by the priority key
        ordered = sorted(grp_rows, key=lambda r: r["pick"])
        keys = [r["priority_e9"] for r in ordered]
        assert keys == sorted(keys)


def test_hll_estimate_within_sketch_error(spark, sf_dir):
    row = REGISTRY["q453_hll_registers"].fn(spark, sf_dir).collect()[0]
    assert row["m"] == 16
    assert row["exact_ndv"] > 2.5 * 16  # outside small-range correction
    # std error for m=16 is ~26%; allow 3 sigma
    assert row["rel_error"] < 0.8


def test_countsketch_estimates_close(spark, sf_dir):
    rows = REGISTRY["q454_countsketch_heavy"].fn(spark, sf_dir).collect()
    assert len(rows) == 10
    # median-of-5 with w=256: collision noise is far below the count
    for r in rows:
        assert r["abs_error"] <= r["exact_count"]
        assert r["cs_estimate"] > 0


def test_sampled_join_size_unbiased(spark, sf_dir):
    row = REGISTRY["q455_sampled_join_size"].fn(spark, sf_dir).collect()[0]
    assert row["exact_rows"] > 0
    assert row["estimated_rows"] > 0
    # 1/16 key sample over >= 1500 keys: well under 50% off
    assert row["rel_error"] < 0.5
