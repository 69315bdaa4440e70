"""Invariant checks for batch 50 (q348-q349): the sketch guarantees
themselves — CMS never underestimates, Bloom never false-negatives."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_countmin_one_sided(spark, sf_dir):
    out = REGISTRY["q348_countmin_sketch"].fn(spark, sf_dir).toPandas()
    assert len(out) == 10
    # the count-min guarantee: estimate >= truth, always
    assert (out.cms_estimate >= out.true_count).all()
    assert (out.overestimate == out.cms_estimate - out.true_count).all()
    assert (out.overestimate >= 0).all()


def test_bloom_no_false_negatives(spark, sf_dir):
    row = REGISTRY["q349_bloom_fpr"].fn(spark, sf_dir).collect()[0]
    # the Bloom guarantee: members always pass
    assert row["false_negatives"] == 0
    assert row["false_positives"] <= row["n_non_members"] or row[
        "n_non_members"
    ] == 0
    if row["n_non_members"]:
        assert 0.0 <= row["fpr"] <= 1.0
