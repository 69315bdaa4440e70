"""Invariant checks for batch 60 (q373-q374)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_shapley_efficiency(spark, sf_dir):
    out = REGISTRY["q373_shapley_attribution"].fn(spark, sf_dir).toPandas()
    assert set(out.channel) == {"click", "view", "signup"}
    # efficiency: values sum to v(grand coalition) - v(empty)
    ev = load_table(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c1"),
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c2"),
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0)).alias("c3"),
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
    )

    def rate(c1, c2, c3):
        grp = users.filter(
            (F.col("c1") == c1) & (F.col("c2") == c2) & (F.col("c3") == c3)
        )
        n = grp.count()
        return (grp.agg(F.sum("y")).collect()[0][0] or 0) / n if n else 0.0

    v111 = rate(1, 1, 1)
    v000 = rate(0, 0, 0)
    assert abs(out.shapley_value.sum() - (v111 - v000)) < 1e-4


def test_qini_uplift_structure(spark, sf_dir):
    out = REGISTRY["q374_qini_uplift"].fn(spark, sf_dir).toPandas()
    assert set(out.quintile) <= set(range(1, 6))
    assert (out.n_treated + out.n_control > 0).all()
    # uplift identity per row
    gap = (out.uplift - (out.rate_treated - out.rate_control)).abs()
    assert gap.max() < 1e-5
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert (out.n_treated + out.n_control).sum() == n_users
