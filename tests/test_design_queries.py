"""Invariant checks for batch 58 (q367-q369)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_power_table_monotone(spark, sf_dir):
    out = REGISTRY["q367_power_mde"].fn(spark, sf_dir).orderBy("mde").toPandas()
    assert len(out) == 4
    # larger effects need fewer samples
    assert (out.required_n_per_arm.diff().dropna() <= 0).all()
    # powered flag consistent
    expect = (out.available_n_per_arm >= out.required_n_per_arm).astype(int)
    assert (expect == out.powered).all()
    assert out.base_rate.between(0, 1).all()


def test_overdispersion_consistency(spark, sf_dir):
    row = REGISTRY["q368_overdispersion"].fn(spark, sf_dir).collect()[0]
    assert row["mean_events"] > 0
    assert row["var_events"] >= 0
    di = row["dispersion_index"]
    assert abs(di - row["var_events"] / row["mean_events"]) < 1e-4
    if di > 1:
        assert row["nb_r_moments"] is not None and row["nb_r_moments"] > 0
    else:
        assert row["nb_r_moments"] is None


def test_zero_inflation_bounds(spark, sf_dir):
    row = REGISTRY["q369_zero_inflation"].fn(spark, sf_dir).collect()[0]
    assert 0 <= row["zero_share"] <= 1
    assert 0 < row["poisson_zero_share"] <= 1
    assert abs(
        row["excess_zeros"]
        - (row["zero_share"] - row["poisson_zero_share"])
    ) < 1e-5
