"""Invariant checks for batch 82 (q476-q480, spectral/structural TS)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_periodogram_shares_sum_to_one(spark, sf_dir):
    rows = REGISTRY["q476_periodogram"].fn(spark, sf_dir).collect()
    assert sorted(r["cycles_per_28d"] for r in rows) == [1, 2, 4, 7, 14]
    assert all(r["power"] >= 0 for r in rows)
    assert abs(sum(r["power_share"] for r in rows) - 1.0) < 1e-4


def test_binseg_three_segments(spark, sf_dir):
    rows = {r["segment"]: r for r in
            REGISTRY["q477_binary_segmentation"].fn(spark, sf_dir).collect()}
    assert set(rows) <= {"root", "left", "right"}
    assert "root" in rows
    tau = rows["root"]["split_day"]
    assert 1 <= tau <= 27
    if "left" in rows:
        assert rows["left"]["split_day"] < tau
    if "right" in rows:
        assert rows["right"]["split_day"] >= tau
    assert all(r["cusum_stat"] >= 0 for r in rows.values())


def test_hurst_in_range(spark, sf_dir):
    row = REGISTRY["q478_hurst_exponent"].fn(spark, sf_dir).collect()[0]
    assert row["n_block_sizes"] == 3
    # R/S estimates on 28 points are noisy but live in (0, 1.5)
    assert 0.0 < row["hurst_exponent"] < 1.5


def test_spectral_entropy_normalized(spark, sf_dir):
    row = REGISTRY["q479_spectral_entropy"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= row["spectral_entropy"] <= 1.0 + 1e-6
    assert row["dominant_cycles_per_28d"] in (1, 2, 4, 7, 14)


def test_turning_points_sane(spark, sf_dir):
    row = REGISTRY["q480_turning_points"].fn(spark, sf_dir).collect()[0]
    assert row["n_days"] == 28
    assert 0 <= row["n_turning"] <= 26
    assert abs(row["expected_turning"] - 2 * 26 / 3) < 1e-3
