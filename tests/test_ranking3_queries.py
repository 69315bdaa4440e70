"""Invariant checks for batch 78 (q456-q460, ranking evaluation)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_err_in_unit_range(spark, sf_dir):
    row = REGISTRY["q456_err"].fn(spark, sf_dir).collect()[0]
    assert row["k"] == 10
    # ERR is a probability-weighted reciprocal rank: (0, 1]
    assert 0.0 <= row["err"] <= 1.0


def test_rbo_bounds(spark, sf_dir):
    row = REGISTRY["q457_rbo"].fn(spark, sf_dir).collect()[0]
    assert row["p"] == 0.9
    assert 0.0 <= row["rbo"] <= 1.0
    assert 0 <= row["overlap_at_10"] <= 10


def test_alpha_ndcg_and_recall(spark, sf_dir):
    row = REGISTRY["q458_alpha_ndcg"].fn(spark, sf_dir).collect()[0]
    assert row["alpha"] == 0.5
    assert row["alpha_dcg"] >= 0.0
    assert 1 <= row["subtopics_covered"]
    assert 0.0 < row["subtopic_recall"] <= 1.0


def test_clarity_nonnegative(spark, sf_dir):
    row = REGISTRY["q459_clarity_score"].fn(spark, sf_dir).collect()[0]
    # KL divergence >= 0 (up to the 9-dp term rounding)
    assert row["clarity_bits"] >= -1e-4
    assert row["n_vocab"] > 0


def test_tau_ap_bounds_and_symmetry(spark, sf_dir):
    row = REGISTRY["q460_tau_ap"].fn(spark, sf_dir).collect()[0]
    assert row["n_common"] >= 2
    for c in ("tau_ap_lex_ref", "tau_ap_sem_ref", "tau_ap_sym"):
        assert -1.0 <= row[c] <= 1.0
    mid = (row["tau_ap_lex_ref"] + row["tau_ap_sem_ref"]) / 2
    assert abs(row["tau_ap_sym"] - mid) < 1e-5
