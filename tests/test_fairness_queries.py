"""Invariant checks for batch 69 (q412-q416): group-fairness audits
over the planted-bias scored population."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_parity_detects_planted_bias(spark, sf_dir):
    rows = REGISTRY["q412_demographic_parity"].fn(spark, sf_dir).collect()
    assert [r["grp"] for r in rows] == ["A", "B"]
    a, b = rows
    # the -150 mill shift must depress group B's selection rate
    assert b["selection_rate"] < a["selection_rate"]
    assert a["parity_gap"] == pytest.approx(
        a["selection_rate"] - b["selection_rate"], abs=1e-5
    )
    assert 0 < a["disparate_impact_ratio"] < 1
    # the shift is large enough to fail the four-fifths rule
    assert a["fails_four_fifths"] == 1


def test_equalized_odds_gaps(spark, sf_dir):
    rows = REGISTRY["q413_equalized_odds"].fn(spark, sf_dir).collect()
    a = next(r for r in rows if r["grp"] == "A")
    b = next(r for r in rows if r["grp"] == "B")
    # shifted scores miss true positives in group B
    assert b["tpr"] < a["tpr"]
    assert rows[0]["tpr_gap"] == pytest.approx(abs(a["tpr"] - b["tpr"]), abs=1e-5)
    for r in rows:
        assert 0 <= r["fpr"] <= r["tpr"] <= 1


def test_group_calibration_b_underconfident(spark, sf_dir):
    rows = REGISTRY["q414_group_calibration"].fn(spark, sf_dir).collect()
    # group B's shifted scores UNDER-state the outcome rate: its ECE
    # mass should exceed group A's
    ece = {"A": 0.0, "B": 0.0}
    for r in rows:
        ece[r["grp"]] += r["ece_contribution"]
    assert ece["B"] > ece["A"]


def test_threshold_sweep_monotone_coverage(spark, sf_dir):
    rows = REGISTRY["q415_threshold_sweep"].fn(spark, sf_dir).collect()
    assert [r["thr"] for r in rows] == [300, 400, 500, 600, 700]
    for r in rows:
        assert 0 <= r["parity_gap"] <= 1
        assert 0 <= r["accuracy"] <= 1


def test_reweighing_equalizes_outcome_rates(spark, sf_dir):
    rows = REGISTRY["q416_reweighing"].fn(spark, sf_dir).collect()
    assert len(rows) == 4  # 2 groups x 2 outcomes
    rates = {r["grp"]: r["weighted_outcome_rate"] for r in rows}
    # the Kamiran-Calders guarantee: weighted P(y=1 | g) identical
    assert rates["A"] == pytest.approx(rates["B"], abs=2e-6)
    assert all(r["weight"] > 0 for r in rows)
