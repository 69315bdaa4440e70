"""Invariant checks for batch 64 (q385-q390): link-prediction scores
and structural audits on the co-purchase graph."""

import math

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.graphstats import _edges

REGISTRY = load_registry()


def test_adamic_adar_scores_nonadjacent_only(spark, sf_dir):
    out = REGISTRY["q385_adamic_adar"].fn(spark, sf_dir)
    rows = out.collect()
    assert 0 < len(rows) <= 20
    # descending scores, all positive, u < v
    scores = [r["adamic_adar"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(r["u"] < r["v"] and r["adamic_adar"] > 0 for r in rows)
    # none of the returned pairs is an existing edge
    e = {(r["u"], r["v"]) for r in _edges(spark, sf_dir).collect()}
    assert all((r["u"], r["v"]) not in e for r in rows)
    # AA <= common_neighbors / ln(2) (every hub has degree >= 2)
    assert all(
        r["adamic_adar"] <= r["common_neighbors"] / math.log(2) + 1e-6
        for r in rows
    )


def test_preferential_attachment_consistency(spark, sf_dir):
    rows = REGISTRY["q386_preferential_attachment"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["pa_score"] == r["deg_u"] * r["deg_v"]
        assert r["u"] < r["v"]


def test_label_propagation_covers_all_nodes(spark, sf_dir):
    rows = REGISTRY["q387_label_propagation"].fn(spark, sf_dir).collect()
    e = _edges(spark, sf_dir)
    n_nodes = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    assert sum(r["community_size"] * r["n_communities"] for r in rows) == n_nodes


def test_rich_club_monotone_grid(spark, sf_dir):
    rows = REGISTRY["q388_rich_club"].fn(spark, sf_dir).collect()
    assert [r["k"] for r in rows] == sorted(r["k"] for r in rows)
    for r in rows:
        assert 0 <= r["phi"] <= 1.0 or r["phi"] is None
        # club sizes shrink as the threshold grows
    sizes = [r["n_k"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_triadic_closure_rate_bounds(spark, sf_dir):
    row = REGISTRY["q389_triadic_closure"].fn(spark, sf_dir).collect()[0]
    assert row["n_new_edges"] > 0
    assert 0 <= row["n_closing"] <= row["n_new_edges"]
    assert 0.0 <= row["closure_rate"] <= 1.0


def test_two_hop_reach_bounds(spark, sf_dir):
    rows = REGISTRY["q390_two_hop_reach"].fn(spark, sf_dir).collect()
    e = _edges(spark, sf_dir)
    n_nodes = (
        e.select(F.col("u").alias("n"))
        .unionByName(e.select(F.col("v").alias("n")))
        .distinct()
        .count()
    )
    for r in rows:
        # reach can never exceed |V| - 1 (self excluded)
        assert 1 <= r["min_reach"] <= r["max_reach"] <= n_nodes - 1
    assert sum(r["n_nodes"] for r in rows) == n_nodes
