"""Invariant checks for batch 98 (q556-q560, multiple testing)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_holm_dominates_bonferroni(spark, sf_dir):
    r = REGISTRY["q556_bonferroni_holm"].fn(spark, sf_dir).collect()[0]
    # The procedure ladder: Bonferroni <= Holm <= naive, all <= m.
    assert r["bonferroni_rejections"] <= r["holm_rejections"]
    assert r["holm_rejections"] <= r["naive_rejections"]
    assert r["naive_rejections"] <= r["m_hypotheses"]
    assert 0 < r["n_true_signals"] < r["m_hypotheses"]


def test_bh_between_bonferroni_and_naive(spark, sf_dir):
    h = REGISTRY["q556_bonferroni_holm"].fn(spark, sf_dir).collect()[0]
    b = REGISTRY["q557_benjamini_hochberg"].fn(spark, sf_dir).collect()[0]
    assert h["bonferroni_rejections"] <= b["bh_rejections"] <= h["naive_rejections"]
    assert b["true_discoveries"] <= b["bh_rejections"]
    if b["min_unrejected_q"] is not None:
        # every unrejected hypothesis has q-value above alpha
        assert b["min_unrejected_q"] > 0.05


def test_pvalue_histogram_sums_to_m(spark, sf_dir):
    rows = REGISTRY["q558_pvalue_histogram"].fn(spark, sf_dir).collect()
    h = REGISTRY["q556_bonferroni_holm"].fn(spark, sf_dir).collect()[0]
    assert sum(r["n_pvalues"] for r in rows) == h["m_hypotheses"]
    assert sum(r["n_signals"] for r in rows) == h["n_true_signals"]
    pi0 = rows[0]["storey_pi0"]
    assert 0.0 <= pi0 <= 2.0  # estimator can exceed 1 on small m
    # signals concentrate in the first bin (shifted down by 2^10)
    first = next(r for r in rows if r["bin_idx"] == 0)
    assert first["n_signals"] == h["n_true_signals"]


def test_fdr_sweep_monotone(spark, sf_dir):
    rows = REGISTRY["q559_fdr_threshold_sweep"].fn(spark, sf_dir).collect()
    assert [r["alpha"] for r in rows] == [0.01, 0.05, 0.1, 0.2]
    nr = [r["n_rejected"] for r in rows]
    assert nr == sorted(nr)  # more alpha -> never fewer rejections
    for r in rows:
        assert r["false_discoveries"] <= r["n_rejected"]
        if r["power"] is not None:
            assert 0.0 <= r["power"] <= 1.0


def test_family_structure_consistent(spark, sf_dir):
    rows = REGISTRY["q560_family_structured_testing"].fn(spark, sf_dir).collect()
    b = REGISTRY["q557_benjamini_hochberg"].fn(spark, sf_dir).collect()[0]
    assert sum(r["flat_bh_rejections"] for r in rows) == b["bh_rejections"]
    for r in rows:
        assert 0 <= r["family_bonferroni_rejections"] <= r["family_size"]
        assert 0 <= r["flat_bh_rejections"] <= r["family_size"]
