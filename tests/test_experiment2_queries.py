"""Invariant checks for batch 75 (q442-q446)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_obf_null_never_crosses(spark, sf_dir):
    rows = REGISTRY["q442_obf_boundaries"].fn(spark, sf_dir).collect()
    assert [r["look"] for r in rows] == [1, 2, 3, 4, 5]
    # boundaries shrink across looks; a null A/B crosses none
    bounds = [r["obf_boundary"] for r in rows]
    assert bounds == sorted(bounds, reverse=True)
    assert all(r["crosses"] == 0 for r in rows)
    ns = [r["n_cum"] for r in rows]
    assert ns == sorted(ns)


def test_icc_null_calibration(spark, sf_dir):
    row = REGISTRY["q443_icc_design_effect"].fn(spark, sf_dir).collect()[0]
    # values i.i.d. across users: ICC ~ 0, DEFF ~ 1
    assert abs(row["icc"]) < 0.1
    assert 0.9 <= row["design_effect"] < 2.0
    assert row["n_obs"] > row["n_clusters"]


def test_ucb_bonus_decreasing_in_pulls(spark, sf_dir):
    rows = REGISTRY["q444_ucb_allocation"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["exploration_bonus"] > 0
        assert r["ucb_score"] == pytest.approx(
            r["mean_reward"] + r["exploration_bonus"], abs=2e-6
        )
    # fewer pulls -> bigger bonus
    lo = min(rows, key=lambda r: r["n_pulls"])
    hi = max(rows, key=lambda r: r["n_pulls"])
    assert lo["exploration_bonus"] >= hi["exploration_bonus"]


def test_novelty_effect_decays(spark, sf_dir):
    rows = REGISTRY["q445_novelty_decay"].fn(spark, sf_dir).collect()
    assert len(rows) >= 3
    effects = [r["effect"] for r in rows]
    # the planted 120-30*week lift dominates noise early: week 0 beats
    # the last week by a wide margin
    assert effects[0] > effects[-1] + 30


def test_variance_reduction_ordering(spark, sf_dir):
    row = REGISTRY["q446_variance_reduction"].fn(spark, sf_dir).collect()[0]
    assert row["var_raw"] > 0
    # CUPED's floor never exceeds the raw variance
    assert row["var_cuped"] <= row["var_raw"] + 1e-9
    assert row["var_stratified"] > 0
