"""Semantic checks for batch 26 (q284-q285): novelty recomputation in
pure Python and the compression-ratio parity pin."""

import hashlib
import zlib

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()

N = 8


def test_ngram_novelty_matches_python(spark, sf_dir):
    out = REGISTRY["q284_ngram_novelty"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()

    def bucket(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:4], 16)

    def grams(t):
        w = t.split(" ")
        return [" ".join(w[i : i + N]) for i in range(len(w) - N + 1)]

    train = set()
    for r in docs.itertuples():
        if bucket(r.doc_id) < 52429:
            train.update(grams(r.text))
    checked = 0
    got = {r.doc_id: r for r in out.itertuples()}
    for r in docs.itertuples():
        if bucket(r.doc_id) >= 52429 and len(r.text.split(" ")) >= N:
            g = grams(r.text)
            seen = sum(1 for x in g if x in train)
            row = got[r.doc_id]
            assert row.n_grams == len(g)
            assert row.n_seen == seen
            assert abs(row.novelty - round(1 - seen / len(g), 6)) < 1e-9
            checked += 1
            if checked >= 20:
                break
    assert checked > 0


def test_compression_ratio_matches_zlib(spark, sf_dir):
    out = REGISTRY["q285_compression_ratio"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").toPandas()
    sample = docs.head(20)
    got = out.set_index("doc_id")
    for r in sample.itertuples():
        raw = r.text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        row = got.loc[r.doc_id]
        assert row.raw_len == len(raw)
        assert row.compressed_len == comp
        assert abs(row.compression_ratio - round(comp / len(raw), 6)) < 1e-9
    # repetitive text compresses better than the corpus median
    import pandas as pd

    rep = len(zlib.compress(b"spam " * 200, 6)) / len(b"spam " * 200)
    assert rep < out.compression_ratio.median()
