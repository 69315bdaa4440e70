"""Invariant checks for batch 74 (q437-q441)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_dup_bands_partition_corpus(spark, sf_dir):
    from flightdb_spark.tables import load_table

    rows = REGISTRY["q437_dup_substring_bands"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert all(r["dup_band"] in (0, 8, 16, 32, 64) for r in rows)


def test_fellegi_sunter_weight_signs(spark, sf_dir):
    rows = {r["field"]: r for r in REGISTRY["q438_fellegi_sunter"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"name", "segment", "balance_band"}
    for r in rows.values():
        # matches agree more often than non-matches on every field
        assert r["m_prob"] > r["u_prob"]
        assert r["agreement_weight"] > 0
        assert r["disagreement_weight"] < 0
    # unique names are the most discriminating field
    assert rows["name"]["agreement_weight"] > rows["segment"]["agreement_weight"]


def test_horvitz_thompson_near_truth(spark, sf_dir):
    row = REGISTRY["q439_horvitz_thompson"].fn(spark, sf_dir).collect()[0]
    assert row["n_sampled"] > 0
    # design-unbiased: one deterministic draw lands near the truth
    assert 0.3 < row["ratio_to_truth"] < 2.5


def test_fixed_effects_denominator(spark, sf_dir):
    row = REGISTRY["q440_fixed_effects"].fn(spark, sf_dir).collect()[0]
    assert row["n"] > row["n_users"]
    assert row["x_within_variance"] > 0
    # hour-of-day and value are independent by construction: the
    # within estimate sits near zero
    assert abs(row["beta_within"]) < 5


def test_did_recovers_planted_lift(spark, sf_dir):
    row = REGISTRY["q441_diff_in_diff"].fn(spark, sf_dir).collect()[0]
    # the planted 100-unit lift must come back through the
    # interaction (cell-mean noise ~±40 at sf0.001)
    assert row["did_estimate"] == pytest.approx(100.0, abs=80.0)
    for c in ("treated_pre", "treated_post", "control_pre", "control_post"):
        assert row[c] is not None
