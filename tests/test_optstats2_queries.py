"""Invariant checks for batch 71 (q422-q426)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_histogram_estimate_close(spark, sf_dir):
    row = REGISTRY["q422_histogram_selectivity"].fn(spark, sf_dir).collect()[0]
    assert row["q_error"] >= 1.0
    # a 10-bucket equi-depth histogram on a smooth column should be
    # within ~20% of truth
    assert row["q_error"] < 1.3
    assert 0 < row["actual_selectivity"] < 1


def test_sample_ndv_estimators_bracket_truth(spark, sf_dir):
    row = REGISTRY["q423_sample_ndv"].fn(spark, sf_dir).collect()[0]
    assert row["sample_ndv"] <= row["true_ndv"]
    # Chao1 and jackknife both correct upward from the sample NDV
    assert row["chao1_ndv"] >= row["sample_ndv"]
    assert row["jackknife_ndv"] >= row["sample_ndv"]


def test_runtime_filter_mostly_skippable(spark, sf_dir):
    row = REGISTRY["q424_runtime_filter_audit"].fn(spark, sf_dir).collect()[0]
    assert row["surviving_rows"] <= row["fact_rows"]
    assert row["survival_rate"] == pytest.approx(
        row["surviving_rows"] / row["fact_rows"], abs=1e-5
    )
    # URGENT is one of five priorities -> ~80% of the fact side skippable
    assert row["skippable_fraction"] > 0.6


def test_fd_key_dependency_exact(spark, sf_dir):
    rows = {r["fd"]: r for r in REGISTRY["q425_functional_dependencies"].fn(spark, sf_dir).collect()}
    # unique keys determine everything: zero violations, zero g3
    key_fd = rows["o_orderkey->o_orderpriority"]
    assert key_fd["violating_groups"] == 0
    assert key_fd["g3_error"] == 0.0
    # 5 priorities over 3 statuses cannot be functional
    assert rows["o_orderpriority->o_orderstatus"]["g3_error"] > 0


def test_cramers_v_near_zero_for_independent_columns(spark, sf_dir):
    row = REGISTRY["q426_cramers_v"].fn(spark, sf_dir).collect()[0]
    assert 0 <= row["cramers_v"] <= 1
    # the synthetic columns are independent by construction
    assert row["cramers_v"] < 0.1
    assert row["card_a"] >= 2 and row["card_b"] >= 2
