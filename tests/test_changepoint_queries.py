"""Semantic invariants for batch 184 (q987-q991, changepoint
detection) beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_binary_split_gain_positive(spark, sf_dir):
    row = run("q987_binary_split", spark, sf_dir).iloc[0]
    assert row["sse_reduction"] >= 0
    assert row["split_t"] >= 1
    assert row["mean_before_cents"] > 0 and row["mean_after_cents"] > 0


def test_cusum_location_valid(spark, sf_dir):
    row = run("q988_cusum_location", spark, sf_dir).iloc[0]
    assert row["abs_cumdev_u"] == abs(row["cumdev_u"])
    assert row["abs_cumdev_u"] >= 0


def test_page_hinkley_stat_nonnegative(spark, sf_dir):
    df = run("q989_page_hinkley", spark, sf_dir)
    # cumdev minus its running min can never be negative
    assert (df["ph_stat_u"] >= 0).all()
    # the statistic at the global-max cumdev row equals max - min seen
    assert df["ph_stat_u"].max() <= (
        df["cumdev_u"].max() - df["cumdev_u"].min()
    )


def test_shift_rational_matches_double(spark, sf_dir):
    row = run("q990_shift_magnitude", spark, sf_dir).iloc[0]
    assert row["shift_den"] == row["n_before"] * row["n_after"]
    assert (
        abs(row["shift_num_u"] / row["shift_den"] - row["shift_cents"]) < 1e-6
    )
    # shift direction consistent with q987's segment means
    q987 = run("q987_binary_split", spark, sf_dir).iloc[0]
    import math

    assert math.copysign(1, row["shift_cents"]) == math.copysign(
        1, q987["mean_after_cents"] - q987["mean_before_cents"]
    )


def test_variance_ratio_consistent(spark, sf_dir):
    row = run("q991_split_variance_ratio", spark, sf_dir).iloc[0]
    assert row["var_before"] >= 0 and row["var_after"] >= 0
    assert abs(
        row["variance_ratio"] - row["var_after"] / row["var_before"]
    ) < 1e-9
