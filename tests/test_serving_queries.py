"""Invariant checks for batch 62 (q377-q378)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_code_switching_bounds(spark, sf_dir):
    out = REGISTRY["q377_code_switching"].fn(spark, sf_dir).toPandas()
    assert len(out) == 5
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.n_docs.sum() == n_docs
    assert (out.n_mixed <= out.n_docs).all()
    assert out.mixed_rate.between(0, 1).all()
    assert out.foreign_hit_share.between(0, 1).all()


def test_prefix_sharing_bounds(spark, sf_dir):
    out = REGISTRY["q378_prefix_sharing"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(out) == n_sources
    # pairs = docs minus one per source
    assert out.n_pairs.sum() == docs.count() - n_sources
    assert (out.max_shared_prefix <= 32).all()
    assert (out.avg_shared_prefix >= 0).all()
    assert out.cacheable_token_frac.between(0, 1).all()


def test_prefix_depth_synthetic(spark):
    # hand-built: identical 3-token prefixes, mismatch at position 4
    rows = [
        (1, "s", ["a", "b", "c", "x"]),
        (2, "s", ["a", "b", "c", "y", "z"]),
        (3, "s", ["q"]),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source", "toks"])
    from pyspark.sql import Window as W

    w = W.partitionBy("source").orderBy("doc_id")
    paired = df.withColumn("prev", F.lag("toks").over(w)).filter(
        F.col("prev").isNotNull()
    )
    min_len = F.least(F.size("toks"), F.size("prev"))
    eq_list = F.expr(
        "transform(sequence(1, least(size(toks), size(prev))), "
        "i -> element_at(toks, i) = element_at(prev, i))"
    )
    pos = F.array_position(eq_list, F.lit(False))
    shared = F.when(pos > 0, pos - 1).otherwise(min_len)
    got = sorted(
        r["s"] for r in paired.select(shared.alias("s")).collect()
    )
    assert got == [0, 3]  # doc2 shares 3 tokens with doc1; doc3 shares 0
