"""Invariant checks for batch 83 (q481-q485, weak supervision)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_ds_recovers_quality_ordering(spark, sf_dir):
    rows = sorted(
        REGISTRY["q481_dawid_skene_quality"].fn(spark, sf_dir).collect(),
        key=lambda r: r["annotator"],
    )
    assert [r["annotator"] for r in rows] == [1, 2, 3, 4, 5]
    # planted quality gradient 90..50% shows up in true accuracy
    acc = [r["true_accuracy"] for r in rows]
    assert acc[0] > acc[-1]
    # and DS agreement tracks the same ordering at the extremes
    ds = [r["ds_agreement"] for r in rows]
    assert ds[0] > ds[-1]


def test_ds_beats_or_matches_mv(spark, sf_dir):
    row = REGISTRY["q482_label_model_comparison"].fn(spark, sf_dir).collect()[0]
    assert row["n_docs"] > 0
    assert 0.5 < row["mv_accuracy"] <= 1.0
    # with a planted quality gradient, quality weighting should not
    # lose to counting heads (allow a tiny wobble at small sf)
    assert row["ds_accuracy"] >= row["mv_accuracy"] - 0.02
    assert row["n_improved"] >= 0 and row["n_degraded"] >= 0


def test_budget_curve_shape(spark, sf_dir):
    rows = {r["n_annotators"]: r for r in
            REGISTRY["q483_annotation_budget"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 3, 5}
    # annotator 1 alone is 90% accurate — a strong baseline
    assert rows[1]["mv_accuracy"] > 0.8
    assert all(0.0 < r["mv_accuracy"] <= 1.0 for r in rows.values())


def test_difficulty_monotone_error(spark, sf_dir):
    rows = sorted(
        REGISTRY["q484_item_difficulty"].fn(spark, sf_dir).collect(),
        key=lambda r: r["n_dissenters"],
    )
    assert rows[0]["n_dissenters"] == 0
    # unanimous items are essentially never wrong; max-dissent items err most
    assert rows[0]["mv_error_rate"] < rows[-1]["mv_error_rate"]


def test_confusion_recovery_close(spark, sf_dir):
    rows = REGISTRY["q485_confusion_recovery"].fn(spark, sf_dir).collect()
    assert len(rows) == 25
    # diagonal cells: the worst annotator is ~50% accurate
    diag = [r for r in rows if r["true_c"] == r["label"]]
    assert len(diag) == 5
    mean_diag = sum(r["empirical_rate"] for r in diag) / 5
    assert 0.3 < mean_diag < 0.7
    # DS estimate tracks the empirical matrix cell-by-cell
    mean_gap = sum(r["abs_gap"] for r in rows) / 25
    assert mean_gap < 0.15
