"""Semantic invariants for batch 192 (q1027-q1031, readability)
beyond the oracle hash gate, on sf0.001 — with a from-scratch Python
recount of one language's index panel."""

from __future__ import annotations

import re

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_counts_match_python_recount(spark, sf_dir):
    out = run("q1027_text_counts", spark, sf_dir).set_index("lang")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    for lang, g in docs.groupby("lang"):
        words = sum(t.count(" ") + 1 for t in g.text)
        letters = sum(len(t.replace(" ", "")) for t in g.text)
        syl = sum(len(re.findall(r"[aeiouy]+", t)) for t in g.text)
        sents = sum((t.count(" ") + 1 + 11) // 12 for t in g.text)
        assert out.loc[lang, "total_words"] == words
        assert out.loc[lang, "total_letters"] == letters
        assert out.loc[lang, "total_syllables"] == syl
        assert out.loc[lang, "total_sentences"] == sents


def test_flesch_band_census_covers_corpus(spark, sf_dir):
    out = run("q1028_flesch_scores", spark, sf_dir)
    counts = run("q1027_text_counts", spark, sf_dir)
    assert out.groupby("lang").n_docs.sum().sum() == counts.n_docs.sum()
    # corpus FRE is the num/den rational
    assert (
        (out.corpus_fre - out.corpus_fre_num / out.corpus_fre_den).abs()
        < 1e-12
    ).all()


def test_grade_indices_rational_consistency(spark, sf_dir):
    df = run("q1029_grade_indices", spark, sf_dir)
    for pre in ("fk", "cli", "ari"):
        num, den, g = df[f"{pre}_num"], df[f"{pre}_den"], df[f"{pre}_grade"]
        assert (den > 0).all()
        assert ((g - num / den).abs() < 1e-12).all()
    # the three indices agree on rough level for this homogeneous corpus
    assert ((df.fk_grade - df.ari_grade).abs() < 3).all()


def test_consensus_votes_partition(spark, sf_dir):
    votes = run("q1030_grade_consensus", spark, sf_dir)
    counts = run("q1027_text_counts", spark, sf_dir).set_index("lang")
    per_lang = votes.groupby("lang").n_docs.sum()
    for lang, n in per_lang.items():
        assert n == counts.loc[lang, "n_docs"]
    assert votes.n_votes.between(0, 3).all()


def test_length_correlation_bounds(spark, sf_dir):
    df = run("q1031_readability_length_corr", spark, sf_dir)
    assert (df.pearson_r.abs() <= 1 + 1e-12).all()
    assert (df.mean_chars > 0).all()
    assert (df.mean_fk_grade > 0).all()
