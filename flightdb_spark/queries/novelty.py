"""Novelty batch 26 (q284-q285): train-vs-test n-gram novelty (the
memorization audit run before reporting eval numbers — how much of
the test split's text is literally present in train) and the
compression-ratio quality signal (the MassiveText/Gopher-style
repetitiveness filter: highly compressible text is boilerplate).

q284 is fully oracle-checked (hash set algebra); q285 is rows-only —
zlib is Python-side — with the ratio semantics pinned against direct
zlib calls in tests and the Spark side kept to an Arrow-batched
mapInPandas over (doc_id, text) only.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q284 — n-gram novelty (memorization audit)

NGRAM_N = 8


@query(
    "q284_ngram_novelty",
    oracle=f"""
    WITH split AS (
      SELECT doc_id, text,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       < 52429 THEN 'train' ELSE 'test' END AS part
      FROM documents
    ),
    grams AS (
      SELECT doc_id, part,
             md5(array_to_string((string_split(text, ' '))[i:i+{NGRAM_N - 1}], ' '))
               AS g
      FROM split, unnest(range(1, len(string_split(text, ' ')) - {NGRAM_N - 2}))
                    AS t(i)
      WHERE len(string_split(text, ' ')) >= {NGRAM_N}
    ),
    train_grams AS (SELECT DISTINCT g FROM grams WHERE part = 'train'),
    test_doc AS (
      SELECT doc_id, g FROM grams WHERE part = 'test'
    ),
    scored AS (
      SELECT d.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_grams,
             CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_seen
      FROM test_doc d LEFT JOIN train_grams tg ON tg.g = d.g
      GROUP BY d.doc_id
    )
    SELECT doc_id, n_grams, n_seen,
           ROUND(1.0 - n_seen * 1.0 / n_grams, 6) AS novelty
    FROM scored
    ORDER BY doc_id
    """,
)
def q284_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-vs-test 8-gram novelty (the memorization audit, Lee et
    al. 2021's framing): for every test-split document, what fraction
    of its word 8-grams never appears in the train split? Novelty
    near 0 means the "held-out" document is effectively memorized
    training text — the per-document sibling of q55's benchmark
    decontamination (which gates against an EXTERNAL suite; this
    audits the split itself) and q99's split-leakage check (which
    matches whole fingerprints; this measures partial overlap).

    Plan: one explode pass builds md5 gram keys for both splits; the
    train gram set collapses to distinct hashes and the membership
    probe is a LEFT join on the gram hash (at 100 TB: the train set
    is the big side, so this becomes a shuffle-hash join on the hash
    key — already its natural co-partitioning); one doc_id aggregate
    finishes."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    bucket = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)),1,4),16,10) as bigint)"
    )
    split = docs.select(
        "doc_id",
        "text",
        F.when(bucket < 52429, "train").otherwise("test").alias("part"),
    )
    # tokenize once into a materialized array column: the split()
    # inlined in the transform lambda re-tokenized the doc per gram
    # (no loop-invariant hoisting inside HOFs — O(len²) per doc)
    tokd = split.select(
        "doc_id", "part", F.split("text", " ").alias("w")
    ).filter(F.size("w") >= NGRAM_N)
    grams = tokd.select(
        "doc_id",
        "part",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("w") - (NGRAM_N - 1)),
                lambda i: F.md5(
                    F.concat_ws(" ", F.slice(F.col("w"), i, NGRAM_N))
                ),
            )
        ).alias("g"),
    # one corpus pass: the train-gram build and the test-side probe
    # both read this checkpoint instead of re-running the explode
    ).localCheckpoint()
    train_grams = (
        grams.filter(F.col("part") == "train").select("g").distinct()
        .withColumn("seen", F.lit(1))
    )
    test_doc = grams.filter(F.col("part") == "test").select("doc_id", "g")
    scored = (
        test_doc.join(train_grams, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("seen"), F.lit(0))).cast("bigint").alias("n_seen"),
        )
    )
    return scored.select(
        "doc_id",
        "n_grams",
        "n_seen",
        F.round(1.0 - F.col("n_seen") * 1.0 / F.col("n_grams"), 6).alias("novelty"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# q285 — compression-ratio quality signal (rows-only; zlib is Python-side)


_COMP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("raw_len", LongType()),
        StructField("compressed_len", LongType()),
        StructField("compression_ratio", DoubleType()),
    ]
)


def compression_ratios(pdf_iter: Iterator) -> Iterator:
    """mapInPandas worker: zlib level-6 ratio per document. Pure
    function shared with the parity test."""
    import zlib

    import pandas as pd

    for pdf in pdf_iter:
        raw = pdf["text"].str.encode("utf-8")
        raw_len = raw.str.len().astype("int64")
        comp_len = raw.map(lambda b: len(zlib.compress(b, 6))).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "raw_len": raw_len,
                "compressed_len": comp_len,
                "compression_ratio": (comp_len / raw_len).round(6),
            }
        )


@query("q285_compression_ratio")  # rows-only: zlib runs Python-side
def q285_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal (the MassiveText/Gopher-family
    repetitiveness filter): zlib(level 6) compressed size over raw
    size per document — highly compressible text (ratio << typical)
    is boilerplate/repetition, nearly incompressible text is noise;
    curation keeps the middle band. Runs as an Arrow-batched
    mapInPandas over exactly (doc_id, text) — the canonical
    Python-boundary shape (multimodal.decode_media's economics): the
    corpus streams through in Arrow batches, nothing shuffles, and
    the output is 4 scalar columns. Rows-only (no SQL zlib); the
    ratio semantics are pinned against direct zlib calls in
    tests/test_novelty_queries.py, and q52's exact token/bigram
    repetition fractions are the oracle-checked siblings.

    At 100 TB this is a map-only pass — the filter composes with the
    pipeline gates (pipelines.py) before any shuffle happens."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    return (
        docs.select("doc_id", "text")
        .mapInPandas(compression_ratios, schema=_COMP_SCHEMA)
        .orderBy("doc_id")
    )
