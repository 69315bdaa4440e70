"""Invariant checks for batch 67 (q402-q406)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_pacf_lag1_equals_acf1(spark, sf_dir):
    rows = REGISTRY["q402_pacf"].fn(spark, sf_dir).collect()
    assert [r["lag"] for r in rows] == [1, 2, 3]
    # Durbin-Levinson base case: phi_11 == r_1 exactly
    assert rows[0]["pacf"] == rows[0]["acf"]
    for r in rows:
        assert -1.0 <= r["acf"] <= 1.0
        assert -1.0 <= r["pacf"] <= 1.0


def test_stl_seasonal_effects_centered(spark, sf_dir):
    rows = REGISTRY["q403_stl_decomposition"].fn(spark, sf_dir).collect()
    assert [r["dow"] for r in rows] == list(range(7))
    # detrended series is near-zero-mean -> dow effects roughly cancel
    total = sum(r["seasonal_effect"] * r["n_days"] for r in rows)
    n = sum(r["n_days"] for r in rows)
    assert abs(total / n) < 5.0
    assert all(r["remainder_rms"] >= 0 for r in rows)


def test_readability_plausible_range(spark, sf_dir):
    rows = REGISTRY["q404_readability"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_hard_docs"] <= r["n_docs"]
        # short english-ish words, 15-word sentences: flesch lands in a
        # plausible band (not NaN/unbounded)
        assert -100 < r["avg_flesch"] < 206.835


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    rows = REGISTRY["q405_int8_quantization"].fn(spark, sf_dir).collect()
    assert len(rows) == 8
    mses = [r["mse"] for r in rows]
    assert mses == sorted(mses, reverse=True)
    for r in rows:
        # rounding to the nearest of 256 levels: |err| <= scale/2 and
        # mse <= (scale/2)^2; scale unknown here but err^2 >= mse sanity
        assert 0 <= r["mse"] <= r["max_abs_err"] ** 2 + 1e-12


def test_stationary_distribution_sums_to_one(spark, sf_dir):
    rows = REGISTRY["q406_stationary_distribution"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    total = sum(r["stationary_prob"] for r in rows)
    assert abs(total - 1.0) < 1e-3
    for r in rows:
        assert 0 < r["stationary_prob"] < 1
        assert 0 <= r["self_loop_prob"] <= 1
