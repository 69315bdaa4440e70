"""Invariant checks for batch 59 (q370-q372)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_freshness_has_a_zero_lag_table(spark, sf_dir):
    out = REGISTRY["q370_freshness_audit"].fn(spark, sf_dir).toPandas()
    assert len(out) == 3
    # the globally newest table has zero staleness
    assert out.staleness_us.min() == 0
    assert (out.staleness_us >= 0).all()
    assert (out.staleness_days >= 0).all()


def test_backlog_curve_balances(spark, sf_dir):
    out = REGISTRY["q371_backlog_curve"].fn(spark, sf_dir).toPandas()
    assert (out.peak_backlog >= out.min_backlog).all()
    assert (out.peak_backlog >= 0).all()
    # the last month after the final close drains toward zero; overall
    # min is never negative (every close has a matching open)
    assert out.min_backlog.min() >= 0


def test_recsys_coverage_partitions(spark, sf_dir):
    row = REGISTRY["q372_recsys_coverage"].fn(spark, sf_dir).collect()[0]
    n_parts = load_table(spark, sf_dir, "part").count()
    assert row["catalog_size"] == n_parts
    assert row["n_recommendable"] + row["n_cold_start"] == n_parts
    assert row["n_with_3plus"] <= row["n_recommendable"]
    assert abs(
        row["coverage"] - row["n_recommendable"] / n_parts
    ) < 1e-6
