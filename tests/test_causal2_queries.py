"""Invariant checks for batch 68 (q407-q411)."""

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_logrank_consistency(spark, sf_dir):
    row = REGISTRY["q407_logrank_test"].fn(spark, sf_dir).collect()[0]
    assert row["n_event_times"] > 0
    assert row["variance"] > 0
    assert row["logrank_chi2"] >= 0
    # parity cohorts are exchangeable: no real survival difference, so
    # the statistic should not be astronomically significant
    assert row["logrank_chi2"] < 30
    # O and E are on the same scale
    assert 0 < row["expected_0"] < 2 * row["observed_0"] + 10


def test_propensity_strata_nontrivial(spark, sf_dir):
    rows = REGISTRY["q408_propensity_strata"].fn(spark, sf_dir).collect()
    assert len(rows) == 4
    # the planted confounder: treatment share rises with the stratum
    shares = [
        r["n_t"] / (r["n_t"] + r["n_c"]) for r in rows if r["n_t"] + r["n_c"]
    ]
    assert shares[-1] > shares[0]


def test_cmh_pooled_or_positive(spark, sf_dir):
    row = REGISTRY["q409_cmh_odds_ratio"].fn(spark, sf_dir).collect()[0]
    assert row["n_strata"] >= 2
    assert row["sum_ad_n"] > 0 and row["sum_bc_n"] > 0
    assert row["cmh_odds_ratio"] > 0


def test_mediation_decomposition_identity(spark, sf_dir):
    row = REGISTRY["q410_mediation"].fn(spark, sf_dir).collect()[0]
    # Baron-Kenny identity: total = direct + indirect (exact for OLS)
    assert row["total_effect"] == pytest.approx(
        row["direct_effect"] + row["indirect_effect"], abs=5e-6
    )


def test_its_fits_both_segments(spark, sf_dir):
    row = REGISTRY["q411_interrupted_timeseries"].fn(spark, sf_dir).collect()[0]
    assert row["slope_change"] == pytest.approx(
        row["slope_post"] - row["slope_pre"], abs=1e-5
    )
