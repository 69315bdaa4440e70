"""Invariant checks for batch 93 (q531-q535, metrics layer)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_mom_yoy_spine_complete(spark, sf_dir):
    rows = sorted(
        REGISTRY["q531_mom_yoy"].fn(spark, sf_dir).collect(),
        key=lambda r: r["month_index"],
    )
    assert [r["month_index"] for r in rows] == list(range(12, 36))
    assert all(r["revenue_cents"] >= 0 for r in rows)
    # growth columns are null only when the base month was zero
    for r in rows:
        if r["mom_growth"] is not None:
            assert r["mom_growth"] > -1.0


def test_delta_method_ci_brackets_ratio(spark, sf_dir):
    row = REGISTRY["q532_delta_method_ci"].fn(spark, sf_dir).collect()[0]
    assert 0.0 < row["ratio"] < 1.0  # purchases are a minority of events
    assert row["delta_var"] > 0
    assert row["ci_lo"] < row["ratio"] < row["ci_hi"]


def test_contribution_decomposition(spark, sf_dir):
    rows = REGISTRY["q533_contribution_analysis"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # rate + volume = total change, up to the two half-cent roundings
        assert abs(r["rate_effect_cents"] + r["volume_effect_cents"]
                   - r["total_change_cents"]) <= 2


def test_forecast_reconciliation_rows(spark, sf_dir):
    rows = REGISTRY["q534_forecast_reconciliation"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["bottom_up_fc"] > 0 and r["top_down_fc"] > 0
        assert r["bu_abs_err"] >= 0 and r["td_abs_err"] >= 0
    # top-down forecasts sum to the same total as bottom-up (coherence)
    assert sum(r["top_down_fc"] for r in rows) == pytest.approx(
        sum(r["bottom_up_fc"] for r in rows), rel=1e-6
    )


def test_anomaly_attribution(spark, sf_dir):
    rows = REGISTRY["q535_anomaly_attribution"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["baseline_mean"] > 0
        assert r["z_score"] is not None
        # delta consistency with the reported baseline
        assert abs(r["delta_vs_baseline_cents"]
                   - (r["target_rev_cents"] - round(r["baseline_mean"]))) <= 1
