"""Invariant checks for batch 92 (q526-q530, pretraining quality rules)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_gopher_rules_counts(spark, sf_dir):
    row = REGISTRY["q526_gopher_rules"].fn(spark, sf_dir).collect()[0]
    n = row["n_docs"]
    assert n > 0
    for c in ("pass_word_count", "pass_mean_word_len", "pass_stopword_frac",
              "pass_top_unigram", "pass_distinct_ratio"):
        assert 0 <= row[c] <= n
    # the intersection is at most the weakest rule
    weakest = min(row["pass_word_count"], row["pass_mean_word_len"],
                  row["pass_stopword_frac"], row["pass_top_unigram"],
                  row["pass_distinct_ratio"])
    assert row["pass_all"] <= weakest
    # at least one rule actually filters something
    assert row["pass_all"] < n


def test_ccnet_terciles(spark, sf_dir):
    rows = {r["bucket"]: r for r in
            REGISTRY["q527_ccnet_buckets"].fn(spark, sf_dir).collect()}
    # ties in the 2-dp score bins can merge a tercile at tiny SF
    assert set(rows) <= {"head", "middle", "tail"}
    assert "head" in rows and "tail" in rows
    total = sum(r["n_docs"] for r in rows.values())
    # the head tercile holds at least a third (cut at 3*cum >= n)
    assert rows["head"]["n_docs"] >= total / 3 - 1
    # head = lowest NLL (most fluent), tail = highest
    assert rows["head"]["mean_nll"] < rows["tail"]["mean_nll"]


def test_repetition_rules(spark, sf_dir):
    row = REGISTRY["q528_repetition_rules"].fn(spark, sf_dir).collect()[0]
    n = row["n_docs"]
    assert n > 0
    assert row["pass_all"] <= min(row["pass_top_unigram"],
                                  row["pass_top_bigram"],
                                  row["pass_dup_trigram"])


def test_funnel_monotone(spark, sf_dir):
    rows = REGISTRY["q529_rule_funnel"].fn(spark, sf_dir).collect()
    order = ["all_docs", "word_count", "+ mean_word_len", "+ stopword_frac",
             "+ top_unigram", "+ distinct_ratio"]
    by = {r["stage"]: r["survivors"] for r in rows}
    assert list(by) and set(by) == set(order)
    seq = [by[s] for s in order]
    assert seq == sorted(seq, reverse=True)  # funnel never grows


def test_rule_overlap_matrix(spark, sf_dir):
    rows = REGISTRY["q530_rule_overlap"].fn(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2)
    for r in rows:
        assert r["both_reject"] <= r["either_rejects"]
        assert 0.0 <= r["rejection_jaccard"] <= 1.0
