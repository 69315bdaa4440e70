"""Semantic invariants for batch 185 (q992-q996, string similarity)
beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.stringsim import PFX

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_edit_distance_bounds_and_python_parity(spark, sf_dir):
    df = run("q992_edit_distances", spark, sf_dir)
    assert (df["lev"] >= 0).all()
    assert (df["lev"] <= df["maxlen"]).all()
    assert (df["maxlen"] <= PFX).all()
    # independent Wagner-Fischer replay on a sample of 25 pairs
    def wf(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i] + [0] * len(b)
            for j, cb in enumerate(b, 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (ca != cb))
            prev = cur
        return prev[len(b)]

    docs = (
        REG["q992_edit_distances"]
        .fn(spark, sf_dir)
        .sparkSession.sql("SELECT doc_id, lower(text) AS t FROM documents")
        .toPandas()
        .set_index("doc_id")["t"]
    )
    for rec in df.head(25).itertuples(index=False):
        a = docs[rec.id_a][:PFX]
        b = docs[rec.id_b][:PFX]
        assert wf(a, b) == rec.lev


def test_similarity_histogram_partitions_pairs(spark, sf_dir):
    pairs = run("q992_edit_distances", spark, sf_dir)
    hist = run("q993_similarity_histogram", spark, sf_dir)
    assert hist["n_pairs"].sum() == len(pairs)
    assert hist["sim_decile"].between(0, 9).all()
    assert (hist["sum_sim_num"] <= hist["sum_sim_den"]).all()


def test_trigram_jaccard_bounds(spark, sf_dir):
    df = run("q994_trigram_jaccard", spark, sf_dir)
    assert df["trigram_jaccard"].between(0, 1).all()
    assert (df["n_common"] <= df[["n_grams_a", "n_grams_b"]].min(axis=1)).all()
    # identical prefixes -> jaccard 1 matches lev 0
    lev = run("q992_edit_distances", spark, sf_dir).set_index(["id_a", "id_b"])
    j = df.set_index(["id_a", "id_b"])
    both = j.join(lev, how="inner")
    assert (both.loc[both["lev"] == 0, "trigram_jaccard"] == 1.0).all()


def test_lcp_bounds(spark, sf_dir):
    df = run("q995_common_prefix", spark, sf_dir)
    assert (df["max_lcp"] <= PFX).all()
    assert (df["total_lcp"] >= df["max_lcp"]).all()
    assert (df["n_disjoint_starts"] <= df["n_pairs"]).all()


def test_metric_concordance_bounds(spark, sf_dir):
    row = run("q996_metric_concordance", spark, sf_dir).iloc[0]
    assert row["concordant"] + row["discordant"] <= row["n_pairs_of_pairs"]
    assert -1.0 <= row["kendall_tau_a"] <= 1.0
    # the two string metrics must agree far more often than not
    assert row["concordant"] > row["discordant"]
