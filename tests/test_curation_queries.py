"""Semantic checks for the curation batch-3 queries (q107-q114) beyond
the DuckDB value-parity gate: invariants of the operators themselves
that a co-refactored oracle could not catch."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_simhash_pairs_threshold_and_exact_dup_recall(spark, sf_dir):
    """Every emitted pair is within the Hamming threshold, and exact
    text duplicates (identical fingerprints, so identical bands) appear
    as distance-0 pairs — the recall floor of the pigeonhole scheme."""
    out = REGISTRY["q107_simhash_hamming_pairs"].fn(spark, sf_dir).cache()
    assert out.filter((F.col("hamming") < 0) | (F.col("hamming") > 3)).count() == 0
    assert out.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0

    docs = load_table(spark, sf_dir, "documents")
    dups = (
        docs.groupBy("text")
        .agg(F.min("doc_id").alias("a"), F.max("doc_id").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    n_dup_pairs = dups.count()
    # sf0.001 plants no exact dups; at sf0.01+ every identical-text pair
    # has an identical fingerprint and must surface at distance 0
    if n_dup_pairs > 0:
        found = dups.join(
            out.filter(F.col("hamming") == 0),
            (dups.a == out.doc_a) & (dups.b == out.doc_b),
        )
        assert found.count() == n_dup_pairs
    else:
        # recall floor still observable: distance-0 pairs of docs with
        # identical token multisets are a subset of emitted pairs — at
        # minimum the query must emit SOME pairs on this corpus
        assert out.count() > 0
    out.unpersist()


def test_source_caps_shape(spark, sf_dir):
    out = REGISTRY["q108_source_caps"].fn(spark, sf_dir).cache()
    per_src = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("rank").alias("mx")
    )
    assert per_src.filter(F.col("n") > 5).count() == 0
    assert per_src.filter(F.col("n") != F.col("mx")).count() == 0  # ranks 1..n
    # scores non-increasing with rank inside each source
    w_bad = out.alias("x").join(
        out.alias("y"),
        (F.col("x.source") == F.col("y.source"))
        & (F.col("x.rank") < F.col("y.rank"))
        & (F.col("x.score") < F.col("y.score")),
    )
    assert w_bad.count() == 0
    out.unpersist()


def test_jaccard_estimate_calibration_consistency(spark, sf_dir):
    out = REGISTRY["q109_minhash_jaccard_est"].fn(spark, sf_dir).cache()
    assert out.count() > 0
    bad_range = out.filter(
        (F.col("est_jaccard") < 0)
        | (F.col("est_jaccard") > 1)
        | (F.col("exact_jaccard") < 0)
        | (F.col("exact_jaccard") > 1)
    )
    assert bad_range.count() == 0
    # estimates quantized to 1/8 steps; abs_err is |est - exact|
    assert out.filter((F.col("est_jaccard") * 8) % 1 != 0).count() == 0
    recomputed = out.filter(
        F.abs(F.abs(F.col("est_jaccard") - F.col("exact_jaccard")) - F.col("abs_err"))
        > 1e-5
    )
    assert recomputed.count() == 0
    # candidates required >=2/8 shared seeds -> est >= 0.25 by construction
    assert out.filter(F.col("est_jaccard") < 0.25).count() == 0
    out.unpersist()


def test_keep_best_matches_cluster_membership(spark, sf_dir):
    """One keeper per q51 cluster; the keeper is a member and its score
    is the cluster max (doc_id tiebreak not directly observable here,
    but max-score membership is)."""
    kept = REGISTRY["q110_keep_best_per_cluster"].fn(spark, sf_dir).cache()
    clusters = REGISTRY["q51_dedup_clusters"].fn(spark, sf_dir).cache()
    assert kept.count() == clusters.select("cluster_id").distinct().count()
    member = kept.join(
        clusters,
        (kept.cluster_id == clusters.cluster_id)
        & (kept.kept_doc == clusters.doc_id),
        "left_semi",
    )
    assert member.count() == kept.count()
    kept.unpersist()
    clusters.unpersist()


def test_fertility_at_least_one(spark, sf_dir):
    out = REGISTRY["q111_tokenizer_fertility"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r["fertility"] >= 1.0  # every ws word is >= 1 subword token
        assert r["n_subword_tokens"] >= r["n_ws_tokens"]
        assert r["avg_word_len"] > 0


def test_char_entropy_bounds(spark, sf_dir):
    out = REGISTRY["q112_char_entropy"].fn(spark, sf_dir)
    bad = out.filter(
        (F.col("entropy_bits") < 0)
        | (F.col("entropy_bits") > F.log2(F.col("n_distinct_chars")) + 1e-6)
    )
    assert bad.count() == 0


def test_dim_stats_invariants(spark, sf_dir):
    out = REGISTRY["q113_embedding_dim_stats"].fn(spark, sf_dir)
    rows = out.collect()
    emb = load_table(spark, sf_dir, "embeddings")
    width = len(emb.select("embedding").first()["embedding"])
    n_vecs = emb.count()
    assert len(rows) == width
    for r in rows:
        assert r["n_vecs"] == n_vecs
        assert r["var_val"] >= -1e-9
        assert r["min_val"] <= r["mean_val"] <= r["max_val"]


def test_ewma_within_user_value_range(spark, sf_dir):
    """A renormalized convex combination of a user's own values stays
    within that user's [min, max]."""
    out = REGISTRY["q114_ewma"].fn(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    rng = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    bad = out.join(rng, "user_id").filter(
        (F.col("ewma") < F.col("lo") - 1e-6) | (F.col("ewma") > F.col("hi") + 1e-6)
    )
    assert bad.count() == 0
    assert out.count() == ev.count()


def test_curriculum_bins_partition_corpus(spark, sf_dir):
    out = REGISTRY["q120_curriculum_bins"].fn(spark, sf_dir).cache()
    rows = {r["bin"]: r for r in out.collect()}
    assert set(rows) == set(range(1, 11))
    assert sum(r["n_docs"] for r in rows.values()) == load_table(
        spark, sf_dir, "documents"
    ).count()
    # bins ordered by score: each bin's max <= next bin's min (ntile on
    # a total order) and mean within [min, max]
    for b in range(1, 10):
        assert rows[b]["max_score"] <= rows[b + 1]["min_score"] + 1e-9
    for r in rows.values():
        assert r["min_score"] - 1e-9 <= r["mean_score"] <= r["max_score"] + 1e-9
    out.unpersist()


def test_source_overlap_self_similarity_floor(spark, sf_dir):
    """Estimates are k/8 fractions in (0, 1]; doubling a source's docs
    into a fake mirror would give est 1.0 — here just shape checks plus
    symmetry of the pair key."""
    out = REGISTRY["q121_source_overlap"].fn(spark, sf_dir).cache()
    assert out.filter(F.col("source_a") >= F.col("source_b")).count() == 0
    bad = out.filter(
        (F.col("est_jaccard") <= 0)
        | (F.col("est_jaccard") > 1)
        | ((F.col("est_jaccard") * 8) % 1 != 0)
    )
    assert bad.count() == 0
    out.unpersist()


def test_zipf_slope_negative(spark, sf_dir):
    rows = REGISTRY["q122_zipf_slope"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["zipf_slope"] < 0  # frequency decreases with rank
        assert r["n_points"] > 10
