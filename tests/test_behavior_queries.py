"""Invariant checks for batch 42 (q324-q326)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_mrr_ranks_valid(spark, sf_dir):
    out = REGISTRY["q324_mrr"].fn(spark, sf_dir).toPandas()
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    n_probes = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 100 == 0)
        .count()
    )
    assert len(out) == n_probes
    assert (out.first_rel_rank >= 1).all()
    assert (out.first_rel_rank <= n_vecs - 1).all()
    # reciprocal rank consistent with rank
    assert (
        (out.reciprocal_rank - 1.0 / out.first_rel_rank).abs() < 1e-6
    ).all()


def test_session_edit_distance_partitions(spark, sf_dir):
    out = REGISTRY["q325_session_edit_distance"].fn(spark, sf_dir).toPandas()
    assert set(out.drift_bucket) <= {0, 1, 2, 3, 4}
    assert (out.avg_norm_distance.between(0, 1)).all()
    # transitions = (user, day) pairs minus one per user with >= 1 day
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    n_days = ud.count()
    n_users = ud.select("user_id").distinct().count()
    assert out.n_transitions.sum() == n_days - n_users


def test_embedding_drift_near_zero_on_random_split(spark, sf_dir):
    out = REGISTRY["q326_embedding_drift"].fn(spark, sf_dir).toPandas()
    assert len(out) == 64
    # vec_id parity is an arbitrary split of one distribution: smd
    # should be small everywhere (sanity of the statistic itself)
    assert out.smd.abs().max() < 0.5
    assert (out.dim == range(64)).all()
