"""Invariant checks for batch 81 (q471-q475, text-generation metrics)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_bleu_components(spark, sf_dir):
    row = REGISTRY["q471_bleu_components"].fn(spark, sf_dir).collect()[0]
    # precisions decrease with n (longer n-grams are harder to match)
    assert 1.0 >= row["p1"] >= row["p2"] >= row["p3"] >= row["p4"] > 0.0
    # the hypothesis drops tokens, so it is shorter than the reference
    assert row["hyp_len"] < row["ref_len"]
    assert row["bp_log"] < 0.0
    # geometric mean lies between p4 and p1
    assert row["p4"] <= row["bleu_geo_mean"] <= row["p1"]


def test_rouge_recall_ordering(spark, sf_dir):
    row = REGISTRY["q472_rouge_n"].fn(spark, sf_dir).collect()[0]
    assert row["n_docs"] > 0
    assert 0.0 < row["rouge2_recall"] <= row["rouge1_recall"] <= 1.0


def test_chrf_bounds(spark, sf_dir):
    row = REGISTRY["q473_chrf"].fn(spark, sf_dir).collect()[0]
    assert 0.0 < row["chr_precision"] <= 1.0
    assert 0.0 < row["chr_recall"] <= 1.0
    # F-beta lies between precision and recall
    lo = min(row["chr_precision"], row["chr_recall"])
    hi = max(row["chr_precision"], row["chr_recall"])
    assert lo - 1e-6 <= row["chrf2"] <= hi + 1e-6


def test_edit_distance_buckets(spark, sf_dir):
    rows = REGISTRY["q474_edit_distance"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r["bucket"] <= 10
        assert 0.0 <= r["mean_cer"] <= 1.1
        # mean CER sits inside its bucket (bucket = floor(10*cer))
        assert r["bucket"] / 10 - 1e-6 <= r["mean_cer"] <= (r["bucket"] + 1) / 10


def test_distinct_n_bounds(spark, sf_dir):
    rows = REGISTRY["q475_distinct_n"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["distinct_1"] <= 1.0
        assert 0.0 < r["distinct_2"] <= 1.0
        # bigrams are more distinct than unigrams in natural-ish text
        assert r["distinct_2"] >= r["distinct_1"]
