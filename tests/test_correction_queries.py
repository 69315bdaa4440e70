"""Invariant checks for batch 56 (q362-q364)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_symspell_recovers_planted_typos(spark, sf_dir):
    row = REGISTRY["q362_symspell_correction"].fn(spark, sf_dir).collect()[0]
    assert row["n_typos"] > 0
    assert row["n_with_candidate"] <= row["n_typos"]
    assert row["n_corrected"] <= row["n_with_candidate"]
    # planted typos are edit-distance 1 from a common vocab word: the
    # delete-1 index must find a candidate for essentially all of them,
    # and frequency-argmax should recover most originals
    assert row["n_with_candidate"] >= row["n_typos"] * 0.95
    assert row["correction_rate"] >= 0.5


def test_randomized_response_debias(spark, sf_dir):
    row = REGISTRY["q363_randomized_response"].fn(spark, sf_dir).collect()[0]
    assert 0 <= row["observed_rate"] <= 1
    assert 0 <= row["true_rate"] <= 1
    # the hash coin is ~fair at 25%: debiased estimate should land much
    # closer to truth than the raw observed rate does
    raw_err = abs(row["observed_rate"] - row["true_rate"])
    assert row["abs_error"] <= raw_err + 1e-9
    # estimator error is driven by the realized flip-fraction's
    # deviation from f: O(1/sqrt(n)) — bound accordingly so the tiny
    # sf0.001 population (n ~ 15) doesn't trip a fixed threshold
    assert row["abs_error"] < max(0.05, 3.0 / row["n"] ** 0.5)


def test_forecast_metrics_sane(spark, sf_dir):
    row = REGISTRY["q364_forecast_metrics"].fn(spark, sf_dir).collect()[0]
    assert row["n_days"] > 0
    assert row["mape"] >= 0
    assert 0 <= row["smape"] <= 2.0  # sMAPE is bounded by 2
    assert row["mase"] > 0
