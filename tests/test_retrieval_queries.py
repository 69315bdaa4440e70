"""Invariant checks for batch 65 (q391-q396): LM retrieval scorers,
PRF expansion, Borda fusion, pass@k, length-controlled win rate."""

import math

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.retrieval import (
    FUSION_DEPTH,
    LM_TOPK,
    PASS_K,
    PRF_TERMS,
)
from flightdb_spark.queries.textops import BM25_TERMS

REGISTRY = load_registry()


def test_lm_scores_negative_and_sorted(spark, sf_dir):
    for name in ("q391_lm_dirichlet", "q392_lm_jelinek_mercer"):
        rows = REGISTRY[name].fn(spark, sf_dir).collect()
        assert len(rows) == LM_TOPK
        scores = [r["lm_score"] for r in rows]
        # log-probabilities: strictly negative, descending
        assert all(s < 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


def test_lm_smoothers_agree_on_top_doc_class(spark, sf_dir):
    # both smoothers should surface docs that actually contain query
    # terms at the top (smoothing-only docs rank below)
    d = REGISTRY["q391_lm_dirichlet"].fn(spark, sf_dir).collect()
    jm = REGISTRY["q392_lm_jelinek_mercer"].fn(spark, sf_dir).collect()
    from flightdb_spark.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    with_terms = {
        r["doc_id"]
        for r in docs.filter(
            F.arrays_overlap(
                F.split("text", " "),
                F.array(*[F.lit(t) for t in BM25_TERMS]),
            )
        )
        .select("doc_id")
        .collect()
    }
    assert d[0]["doc_id"] in with_terms
    assert jm[0]["doc_id"] in with_terms


def test_prf_excludes_query_terms(spark, sf_dir):
    rows = REGISTRY["q393_prf_expansion"].fn(spark, sf_dir).collect()
    assert len(rows) == PRF_TERMS
    assert all(r["term"] not in BM25_TERMS for r in rows)
    assert all(r["rocchio_weight"] > 0 for r in rows)


def test_borda_points_bounds(spark, sf_dir):
    rows = REGISTRY["q394_borda_fusion"].fn(spark, sf_dir).collect()
    for r in rows:
        assert 1 <= r["n_runs"] <= 2
        # max possible: first place in both runs
        assert 1 <= r["borda_points"] <= 2 * FUSION_DEPTH
    pts = [r["borda_points"] for r in rows]
    assert pts == sorted(pts, reverse=True)


def test_pass_at_k_matches_reference_formula(spark, sf_dir):
    rows = REGISTRY["q395_pass_at_k"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        n, c = r["n_samples"], r["n_correct"]
        if n - c >= PASS_K:
            expect = 1.0 - math.prod(
                (n - c - i) / (n - i) for i in range(PASS_K)
            )
        else:
            expect = 1.0
        assert abs(r["pass_at_k"] - expect) < 1e-5
        assert 0.0 <= r["pass_at_k"] <= 1.0


def test_lc_winrate_removes_planted_length_bias(spark, sf_dir):
    row = REGISTRY["q396_length_controlled_winrate"].fn(spark, sf_dir).collect()[0]
    assert row["n_pairs"] > 0
    assert 0.0 < row["raw_winrate"] < 1.0
    assert 0.0 < row["lc_winrate"] < 1.0
    # the planted bias tilts wins with (len_a - len_b): beta must pick
    # up a positive length effect
    assert row["beta_length"] > 0
