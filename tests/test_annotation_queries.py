"""Invariant checks for batch 63 (q379-q384): inter-annotator
agreement statistics on the deterministic synthetic annotation table."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_krippendorff_alpha_range_and_signal(spark, sf_dir):
    row = REGISTRY["q379_krippendorff_alpha"].fn(spark, sf_dir).collect()[0]
    # ~70% per-rater accuracy on a 5-class problem -> substantial but
    # imperfect agreement; alpha must be strictly inside (0, 1)
    assert 0.1 < row["alpha"] < 0.95
    assert 0 < row["d_observed"] < row["d_expected"] < 1
    # missing third ratings: n_values < 3 * n_units
    assert row["n_values"] < 3 * row["n_units"]
    assert row["n_values"] > 2 * row["n_units"]


def test_annotator_bias_small_for_symmetric_noise(spark, sf_dir):
    rows = REGISTRY["q380_annotator_bias"].fn(spark, sf_dir).collect()
    assert [r["annotator"] for r in rows] == [1, 2, 3]
    # same noise process for every annotator -> TV distances are small
    assert all(0 <= r["tv_distance"] < 0.1 for r in rows)
    # annotator 3 rated ~75% of docs
    assert rows[2]["n_labels"] < rows[0]["n_labels"]


def test_pairwise_kappa_consistent(spark, sf_dir):
    rows = REGISTRY["q381_pairwise_annotator_kappa"].fn(spark, sf_dir).collect()
    assert [(r["annotator_a"], r["annotator_b"]) for r in rows] == [
        (1, 2),
        (1, 3),
        (2, 3),
    ]
    for r in rows:
        # kappa < p_o always (p_e > 0); all pairs share the noise level
        assert 0.1 < r["kappa"] < r["p_observed"] < 1.0


def test_agreement_patterns_partition_the_corpus(spark, sf_dir):
    from flightdb_spark.tables import load_table

    rows = REGISTRY["q382_item_agreement_patterns"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert {r["panel_size"] for r in rows} == {2, 3}
    # panel of 2 cannot produce 'majority'
    assert not any(
        r["panel_size"] == 2 and r["pattern"] == "majority" for r in rows
    )


def test_loo_accuracy_between_chance_and_perfect(spark, sf_dir):
    rows = REGISTRY["q383_loo_consensus_accuracy"].fn(spark, sf_dir).collect()
    assert [r["annotator"] for r in rows] == [1, 2, 3]
    for r in rows:
        assert r["n_evaluable"] <= r["n_rated"]
        # ~0.7 rater accuracy against a strict-majority consensus
        assert 0.4 < r["loo_accuracy"] < 0.95


def test_slice_error_rate_matches_noise_design(spark, sf_dir):
    rows = REGISTRY["q384_slice_error_rate"].fn(spark, sf_dir).collect()
    assert len(rows) == 15  # 5 langs x 3 annotators
    # designed error: h%10 >= 7 (30%) then 1/5 of noise picks land on
    # the true label -> ~24% expected error, uniformly across slices
    for r in rows:
        assert 0.05 < r["error_rate"] < 0.45
