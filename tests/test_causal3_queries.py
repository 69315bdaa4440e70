"""Invariant checks for batch 80 (q466-q470, econometrics)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_iv_reports_weak_instrument(spark, sf_dir):
    row = REGISTRY["q466_iv_2sls"].fn(spark, sf_dir).collect()[0]
    assert row["n"] > 0
    assert row["beta_ols"] is not None and row["beta_iv"] is not None
    # month parity is unrelated to quantity by construction: the
    # first-stage F must scream "weak instrument"
    assert 0 <= row["first_stage_f"] < 10


def test_rdd_null_effect(spark, sf_dir):
    row = REGISTRY["q467_regression_discontinuity"].fn(spark, sf_dir).collect()[0]
    assert row["n_left"] > 10 and row["n_right"] > 10
    # no discontinuity planted: the jump is small relative to the level
    level = (row["intercept_left"] + row["intercept_right"]) / 2
    assert abs(row["rdd_effect"]) < 0.5 * level


def test_oaxaca_identity(spark, sf_dir):
    row = REGISTRY["q468_oaxaca_blinder"].fn(spark, sf_dir).collect()[0]
    # gap = explained + unexplained (up to 4-dp rounding)
    assert row["mean_gap"] == pytest.approx(
        row["explained"] + row["unexplained"], abs=5e-3
    )


def test_event_study_window(spark, sf_dir):
    rows = REGISTRY["q469_event_study"].fn(spark, sf_dir).collect()
    days = sorted(r["rel_day"] for r in rows)
    assert all(-7 <= d <= 7 for d in days)
    assert 0 in days  # the anchor day always has the purchase itself
    assert all(r["n_events"] > 0 for r in rows)


def test_permutation_pvalue_valid(spark, sf_dir):
    row = REGISTRY["q470_permutation_test"].fn(spark, sf_dir).collect()[0]
    assert row["n_perms"] == 19
    assert 0 <= row["n_extreme"] <= 19
    # add-one p-value lives in [1/20, 1]
    assert 0.05 <= row["p_value"] <= 1.0
