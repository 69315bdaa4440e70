"""End-to-end training-data pipeline: stage counts shrink monotonically,
each stage's semantics match its standalone operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from flightdb_spark import pipelines
from flightdb_spark.operators import textdedup
from flightdb_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pipeline_end_to_end(spark):
    docs = load_table(spark, SF, "documents")
    cfg = pipelines.PipelineConfig(min_chars=50)
    out = pipelines.run(docs, cfg)
    c = cfg.stage_counts
    assert c["raw"] == 500
    # monotone shrink, nothing degenerate
    assert (
        c["raw"] >= c["quality"] >= c["exact_dedup"] >= c["near_dedup"]
        >= c["spans"] >= c["fluency"] >= c["caps"] >= c["mix"]
        == c["split"] == c["annotate"]
    )
    assert c["mix"] > 0
    # survivors are real docs with intact columns + split + the
    # curriculum/packing annotations
    assert out.columns == docs.columns + [
        "split", "quality_bin", "n_tokens", "start_offset", "pack_bin"
    ]
    assert out.filter(~F.col("split").isin("train", "val", "test")).count() == 0
    assert out.join(docs, "doc_id", "semi").count() == c["mix"]
    # packing offsets are per-split contiguous: within a split, offsets
    # are the prefix sums of n_tokens in doc_id order
    import itertools

    for split in ("train", "val", "test"):
        rows = sorted(
            out.filter(F.col("split") == split)
            .select("doc_id", "n_tokens", "start_offset")
            .collect(),
            key=lambda r: r["doc_id"],
        )
        acc = 0
        for r in rows:
            assert r["start_offset"] == acc
            acc += r["n_tokens"]
    # curriculum bins partition the survivors evenly (ntile)
    bins = {r["quality_bin"] for r in out.select("quality_bin").distinct().collect()}
    assert bins <= set(range(1, 11))


def test_pipeline_near_dedup_keeps_exactly_canonicals(spark):
    docs = load_table(spark, SF, "documents")
    cfg = pipelines.PipelineConfig()
    survivors = pipelines.near_dedup(docs, cfg)
    shingled = textdedup.shingles(docs)
    sigs = textdedup.minhash_signatures(shingled, seeds=cfg.minhash_seeds)
    bands = textdedup.lsh_bands(sigs, seeds=cfg.minhash_seeds)
    clusters = textdedup.dedup_clusters(
        textdedup.lsh_candidate_pairs(bands, max_bucket=cfg.lsh_max_bucket)
    )
    n_losers = clusters.filter(~F.col("is_canonical")).count()
    assert survivors.count() == docs.count() - n_losers


def test_exact_dedup_keeps_min_doc_per_fingerprint(spark):
    rows = [(1, "same text"), (2, "same text"), (3, "other text"), (4, "SAME TEXT")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in pipelines.exact_dedup(docs).collect())
    assert kept == [1, 3]  # 2 and 4 (case-dup) collapse into 1


def test_token_budget_gate_matches_q196_semantics(spark):
    docs = load_table(spark, SF, "documents")
    cfg = pipelines.PipelineConfig(token_budget=300)
    out = pipelines.token_budget_gate(docs, cfg)
    # every source's kept set is a prefix of its quality-descending
    # order and never exceeds the budget
    n_tok = F.size(F.split("text", " "))
    per_src = (
        out.withColumn("_n", n_tok)
        .groupBy("source")
        .agg(F.sum("_n").alias("tok"))
        .collect()
    )
    assert per_src and all(r.tok <= 300 for r in per_src)
    # no-op when unset
    cfg2 = pipelines.PipelineConfig()
    assert pipelines.token_budget_gate(docs, cfg2) is docs


def test_semantic_dedup_stage_drops_planted_duplicate(spark):
    docs = spark.createDataFrame(
        [(1, "alpha text", "en", "s", 10), (2, "beta text", "en", "s", 9),
         (3, "gamma text", "en", "s", 10)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    # doc 2's embedding is identical to doc 1's -> dropped; doc 3 is
    # orthogonal -> kept. 2 centroids from the lowest ids.
    emb = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0]), (2, [1.0, 0.0, 0.0]), (3, [0.0, 1.0, 0.0])],
        "doc_id long, v array<double>",
    )
    cfg = pipelines.PipelineConfig(semantic_centroids=2, semantic_threshold=0.9)
    out = pipelines.semantic_dedup(docs, emb, cfg)
    assert sorted(r.doc_id for r in out.collect()) == [1, 3]


def test_run_with_embeddings_records_semantic_stage(spark):
    docs = load_table(spark, SF, "documents")
    emb = (
        load_table(spark, SF, "embeddings")
        .select(F.col("vec_id").alias("doc_id"),
                F.col("embedding").cast("array<double>").alias("v"))
    )
    cfg = pipelines.PipelineConfig(min_chars=50, token_budget=500)
    out = pipelines.run(docs, cfg, embeddings=emb)
    c = cfg.stage_counts
    assert c["near_dedup"] >= c["semantic"] >= c["spans"]
    assert c["caps"] >= c["budget"] >= c["mix"]
    assert out.count() == c["annotate"]
