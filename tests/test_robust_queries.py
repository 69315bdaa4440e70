"""Invariant checks for batch 79 (q461-q465, robust statistics)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_hampel_counts_bounded(spark, sf_dir):
    rows = REGISTRY["q461_hampel_filter"].fn(spark, sf_dir).collect()
    assert len(rows) == 15  # users at sf0.001
    for r in rows:
        assert 0 <= r["n_outliers"] <= r["n_points"]
        assert r["max_robust_z"] >= 0.0


def test_huber_between_median_and_mean(spark, sf_dir):
    rows = REGISTRY["q462_huber_mean"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # on near-uniform data the robust mean stays close to the
        # classical mean (it need not lie between mean and median —
        # asymmetric tail downweighting can push it slightly outside)
        assert abs(r["huber_mean"] - r["plain_mean"]) / r["plain_mean"] < 0.05
        assert r["n"] > 0


def test_biweight_below_classical_on_heavy_tails(spark, sf_dir):
    rows = REGISTRY["q463_biweight_midvariance"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["biweight_midvariance"] > 0
        assert r["classical_variance"] > 0


def test_qn_scale_positive(spark, sf_dir):
    rows = REGISTRY["q464_qn_scale"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["qn_raw_cents"] > 0
        assert r["qn_scale"] == pytest.approx(
            2.2219 * r["qn_raw_cents"] / 100, rel=1e-6, abs=1e-3
        )
        # <= 100 sampled rows -> <= 4950 pairs
        assert r["n_pairs"] <= 4950


def test_median_polish_residual_identity(spark, sf_dir):
    rows = REGISTRY["q465_median_polish"].fn(spark, sf_dir).collect()
    assert len(rows) == 15
    for r in rows:
        # cell = row_effect + col_effect + residual (up to 4-dp rounding)
        recon = r["row_effect"] + r["col_effect"] + r["residual"]
        assert abs(recon - r["cell_mean"]) < 5e-4
    # one sweep: every column's residual median is ~0
    by_col = {}
    for r in rows:
        by_col.setdefault(r["o_orderstatus"], []).append(r["residual"])
    for res in by_col.values():
        res.sort()
        mid = res[len(res) // 2] if len(res) % 2 else (
            res[len(res) // 2 - 1] + res[len(res) // 2]
        ) / 2
        assert abs(mid) < 5e-4
