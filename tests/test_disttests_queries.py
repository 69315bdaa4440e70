"""Invariant checks for batch 73 (q432-q436)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_mmd_null_calibration(spark, sf_dir):
    row = REGISTRY["q432_mmd_drift"].fn(spark, sf_dir).collect()[0]
    # parity halves are exchangeable: MMD^2 ~ 0 (and can dip slightly
    # negative for the V-statistic on finite samples)
    assert abs(row["mmd2"]) < 0.02
    for c in ("mean_k_aa", "mean_k_bb", "mean_k_ab"):
        assert 0 < row[c] <= 1  # RBF kernel range


def test_energy_distance_null(spark, sf_dir):
    row = REGISTRY["q433_energy_distance"].fn(spark, sf_dir).collect()[0]
    assert abs(row["energy_distance"]) < 0.05
    assert row["mean_d_ab"] > 0


def test_wasserstein_nonnegative(spark, sf_dir):
    row = REGISTRY["q434_wasserstein_1d"].fn(spark, sf_dir).collect()[0]
    assert row["wasserstein_1"] >= 0
    assert row["n_a"] > 0 and row["n_b"] > 0
    # click and view values share a generator: W1 small relative to the
    # ~1000-wide value range
    assert row["wasserstein_1"] < 100


def test_sinkhorn_marginals_converge(spark, sf_dir):
    rows = REGISTRY["q435_sinkhorn_plan"].fn(spark, sf_dir).collect()
    mass = sum(r["mass"] for r in rows)
    assert mass == pytest.approx(1.0, abs=0.01)
    # the final scaling step is on u (rows), so ROW marginals equal the
    # source language distribution exactly; columns converge toward
    # uniform (epsilon=0.5 regularization keeps them loose at 5 iters)
    from flightdb_spark.tables import load_table

    langs = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .collect()
    )
    n = sum(r["count"] for r in langs)
    src_dist = {
        i: next(r["count"] for r in langs if r["lang"] == l) / n
        for i, l in enumerate(["de", "en", "es", "fr", "zh"])
    }
    row_m, col = {}, {}
    for r in rows:
        row_m[r["from_lang_idx"]] = row_m.get(r["from_lang_idx"], 0) + r["mass"]
        col[r["to_lang_idx"]] = col.get(r["to_lang_idx"], 0) + r["mass"]
    for i, m in row_m.items():
        assert m == pytest.approx(src_dist[i], abs=1e-4)
    for j, m in col.items():
        assert m == pytest.approx(0.2, abs=0.05)
    assert all(r["cost_contribution"] >= 0 for r in rows)


def test_cvm_null_small(spark, sf_dir):
    row = REGISTRY["q436_cvm_test"].fn(spark, sf_dir).collect()[0]
    assert row["cvm_statistic"] >= 0
    # same generator for both types: statistic stays in the null range
    # (CvM null expectation ~ 1/6 + small)
    assert row["cvm_statistic"] < 2.0
