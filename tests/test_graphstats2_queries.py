"""Invariant checks for batch 37 (q310-q312): triangle-mass and
score-normalization identities the per-query oracles can't see."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.graphstats import _edges

REGISTRY = load_registry()


def test_clustering_coefficient_bounds(spark, sf_dir):
    out = REGISTRY["q310_clustering_coefficient"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert out.avg_clustering.between(0, 1).all()
    assert (out.avg_degree >= 2).all()
    # node count matches nodes of degree >= 2
    und_deg = _edges(spark, sf_dir)
    deg = (
        und_deg.select(F.col("u").alias("n"))
        .unionAll(und_deg.select(F.col("v").alias("n")))
        .groupBy("n")
        .count()
    )
    assert out.n_nodes.sum() == deg.filter(F.col("count") >= 2).count()


def test_link_prediction_excludes_edges(spark, sf_dir):
    out = REGISTRY["q311_link_prediction"].fn(spark, sf_dir)
    e = _edges(spark, sf_dir)
    # no predicted link may already be an edge (u < v orientation holds)
    overlap = out.join(e, ["u", "v"], "inner").count()
    assert overlap == 0
    pdf = out.toPandas()
    assert (pdf.u < pdf.v).all()
    assert pdf.jaccard.between(0, 1).all()
    assert (pdf.common_neighbors >= 1).all()
    # sorted by score descending
    assert (pdf.jaccard.diff().dropna() <= 1e-12).all()


def test_hits_scores_normalized(spark, sf_dir):
    out = REGISTRY["q312_hits_authorities"].fn(spark, sf_dir).toPandas()
    assert (out.authority_x1000 > 0).all()
    # L1 normalization: total authority mass is 1000 (x1000 scale),
    # so the top-k sum is bounded by it
    assert out.authority_x1000.sum() <= 1000.0 + 1e-3  # 12-dp round headroom
    # descending scores
    assert (out.authority_x1000.diff().dropna() <= 1e-9).all()
