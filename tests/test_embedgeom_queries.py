"""Invariant checks for batch 91 (q521-q525, embedding geometry)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_isotropy_sample(spark, sf_dir):
    row = REGISTRY["q521_isotropy_sample"].fn(spark, sf_dir).collect()[0]
    assert row["n_pairs"] == 64 * 63 // 2
    assert -1.0 <= row["mean_cosine"] <= 1.0
    assert row["std_cosine"] >= 0.0


def test_fisher_scatters_positive(spark, sf_dir):
    row = REGISTRY["q522_fisher_separability"].fn(spark, sf_dir).collect()[0]
    assert row["n_labels"] >= 2
    assert row["within_scatter"] > 0
    assert row["between_scatter"] >= 0
    assert row["fisher_ratio"] >= 0


def test_dead_dims_census(spark, sf_dir):
    row = REGISTRY["q523_dead_dimensions"].fn(spark, sf_dir).collect()[0]
    assert row["n_dims"] == 64
    assert 0 <= row["dead_dims"] < 64
    assert row["min_variance"] <= row["max_variance"]
    assert 8 / 64 <= row["top8_variance_share"] <= 1.0


def test_intrinsic_dimension_below_ambient(spark, sf_dir):
    row = REGISTRY["q524_intrinsic_dimension"].fn(spark, sf_dir).collect()[0]
    assert row["n_anchors"] > 50
    # the 2-NN estimate is positive and at most ~ambient dimensionality
    assert 0 < row["intrinsic_dimension"] < 200


def test_participation_ratio_bounds(spark, sf_dir):
    row = REGISTRY["q525_participation_ratio"].fn(spark, sf_dir).collect()[0]
    assert row["ambient_dims"] == 64
    assert 1.0 <= row["participation_ratio"] <= 64.0
    assert 0.0 < row["pr_share"] <= 1.0
