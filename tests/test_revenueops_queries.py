"""Invariant checks for batch 88 (q506-q510, revenue & inventory ops)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_nrr_grr_relationship(spark, sf_dir):
    rows = REGISTRY["q506_nrr_grr"].fn(spark, sf_dir).collect()
    assert len(rows) == 12
    for r in rows:
        # GRR caps expansion: always <= NRR and <= 1
        assert r["grr"] <= r["nrr"] + 1e-9
        assert 0.0 <= r["grr"] <= 1.0
        assert r["nrr"] >= 0.0


def test_revenue_bridge_identity(spark, sf_dir):
    rows = REGISTRY["q507_revenue_bridge"].fn(spark, sf_dir).collect()
    assert len(rows) == 12
    for r in rows:
        recon = (r["prev_rev_cents"] + r["new_rev"] + r["expansion"]
                 - r["contraction"] - r["churned"])
        assert recon == r["cur_rev_cents"]  # exact, in cents


def test_cohort_payback_sane(spark, sf_dir):
    rows = REGISTRY["q508_cohort_payback"].fn(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 12
    for r in rows:
        assert r["n_customers"] > 0
        assert r["payback_months"] >= 0


def test_newsvendor_fractile(spark, sf_dir):
    row = REGISTRY["q509_newsvendor"].fn(spark, sf_dir).collect()[0]
    assert row["critical_fractile"] == pytest.approx(0.9)
    assert row["optimal_stock"] > 0
    # ~10% of days exceed the 0.9-fractile stock
    assert 0.0 <= row["stockout_share"] <= 0.2


def test_eoq_scaling(spark, sf_dir):
    rows = REGISTRY["q510_eoq_table"].fn(spark, sf_dir).collect()
    assert len(rows) == 6
    for r in rows:
        assert r["eoq_units"] > 0
        # EOQ consistency: orders/year * EOQ == annual demand
        assert r["orders_per_year"] * r["eoq_units"] == pytest.approx(
            r["annual_demand"], rel=0.05
        )
        assert r["cycle_days"] > 0
