"""Invariant checks for batch 55 (q359-q361)."""

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.vector2 import HUB_TOPK, MRL_DIMS

REGISTRY = load_registry()


def test_matryoshka_full_width_is_exact(spark, sf_dir):
    out = (
        REGISTRY["q359_matryoshka_sweep"].fn(spark, sf_dir)
        .orderBy("n_dims")
        .toPandas()
    )
    assert list(out.n_dims) == MRL_DIMS
    # full width (64 = the embedding dim) IS the exact ranking
    assert abs(out.recall_at_5.iloc[-1] - 1.0) < 1e-9
    assert out.recall_at_5.between(0, 1).all()


def test_hubness_mean_is_k(spark, sf_dir):
    out = REGISTRY["q360_hubness"].fn(spark, sf_dir).toPandas()
    n_points = out.n_points.sum()
    mass = (out.k_occurrence * out.n_points).sum()
    # every point emits exactly HUB_TOPK votes => mean k-occ == k
    assert mass == n_points * HUB_TOPK
    assert (out.k_occurrence >= 0).all()


def test_largest_remainder_reconciles(spark, sf_dir):
    row = REGISTRY["q361_largest_remainder"].fn(spark, sf_dir).collect()[0]
    # the whole point: every order allocates exactly its target cents
    assert row["n_exact"] == row["n_orders"]
    assert row["total_allocated_cents"] == row["total_target_cents"]
