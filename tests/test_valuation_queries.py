"""Invariant checks for batch 66 (q397-q401): KNN-Shapley valuation,
ECE reliability, hex hotspots, contamination scan, margin sampling."""

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.valuation import (
    HEX_TOPK,
    MARGIN_BATCH,
    SHAP_TOPK,
)

REGISTRY = load_registry()


def test_knn_shapley_top_values_are_same_label(spark, sf_dir):
    rows = REGISTRY["q397_knn_shapley"].fn(spark, sf_dir).collect()
    by_probe = {}
    for r in rows:
        by_probe.setdefault(r["query_id"], []).append(r)
    assert len(by_probe) == 5  # vec_id % 100 == 0 over 500 vectors
    for probe, rs in by_probe.items():
        assert len(rs) == SHAP_TOPK
        # Shapley property: the highest-value training points for a
        # probe must share its label (helpful neighbors), and values
        # must be positive and descending
        vals = [r["shapley"] for r in sorted(rs, key=lambda r: r["rk"])]
        assert vals == sorted(vals, reverse=True)
        assert rs[0]["same_label"] == 1
        assert all(r["shapley"] > 0 for r in rs)


def test_ece_shows_planted_underconfidence(spark, sf_dir):
    rows = REGISTRY["q398_ece_reliability"].fn(spark, sf_dir).collect()
    assert [r["bin"] for r in rows] == list(range(10))
    # confidence = s^2 < s = accuracy rate: the model is UNDERconfident
    # in the upper bins (where n_b is large enough for the law of large
    # numbers at sf >= 0.01)
    upper = [r for r in rows if r["bin"] >= 5]
    assert all(r["avg_confidence"] < r["accuracy"] + 0.15 for r in upper)
    ece = sum(r["ece_contribution"] for r in rows)
    assert 0.05 < ece < 0.5  # the planted miscalibration is visible


def test_hex_smoothing_dominates_raw_counts(spark, sf_dir):
    rows = REGISTRY["q399_hexgrid_hotspots"].fn(spark, sf_dir).collect()
    assert len(rows) == HEX_TOPK
    for r in rows:
        assert r["smoothed_points"] >= r["n_points"] > 0
    sm = [r["smoothed_points"] for r in rows]
    assert sm == sorted(sm, reverse=True)


def test_contamination_scan_excludes_eval_source(spark, sf_dir):
    rows = REGISTRY["q400_contamination_scan"].fn(spark, sf_dir).collect()
    assert all(r["source"] != "src0" for r in rows)
    for r in rows:
        assert r["max_shared_grams"] <= r["total_shared_grams"]
        assert r["n_contaminated_docs"] > 0


def test_margin_batch_is_lowest_margin(spark, sf_dir):
    rows = REGISTRY["q401_margin_sampling"].fn(spark, sf_dir).collect()
    assert len(rows) == MARGIN_BATCH
    margins = [r["margin"] for r in rows]
    assert margins == sorted(margins)
    assert all(m >= 0 for m in margins)  # top1 >= top2 by construction


def test_semantic_dedup_max_cell_guard(spark, sf_dir):
    # the circuit breaker: with a tiny cap, overflowing cells emit no
    # pairs (members kept), and the capped output is a subset of the
    # exact output
    from flightdb_spark.operators import vectors
    from flightdb_spark.tables import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    exact = {
        r["vec_id"]
        for r in vectors.semantic_dedup_drops(e, n_centroids=8).collect()
    }
    capped = {
        r["vec_id"]
        for r in vectors.semantic_dedup_drops(
            e, n_centroids=8, max_cell=50
        ).collect()
    }
    assert capped <= exact
    # cells of 500 vectors over 8 centroids: at least one cell > 50,
    # so the cap must actually bite
    assert len(capped) < len(exact)
