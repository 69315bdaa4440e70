"""Invariant checks for batch 49 (q345-q347)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_order_statistics_relationships(spark, sf_dir):
    out = REGISTRY["q345_order_statistics"].fn(spark, sf_dir).toPandas()
    assert len(out) == 5
    # discrete median is a real value near the continuous one
    assert (abs(out.median_cont - out.median_disc) <= 1.0).all()
    # trimmed mean lies within [p10, p90] hence between min/max bounds
    assert (out.trimmed_mean <= out.mean_v + 50).all()
    assert (out.mode_bucket >= 0).all()


def test_spc_limits_bracket_centerline(spark, sf_dir):
    out = REGISTRY["q346_spc_xbar_chart"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.ucl_x > out.lcl_x).all()
    # flags consistent with limits
    flagged = (out.xbar > out.ucl_x) | (out.xbar < out.lcl_x)
    assert (flagged.astype(int) == out.out_of_control_x).all()
    # most points in control for an i.i.d. series
    assert out.out_of_control_x.mean() < 0.2


def test_charm_pricing_partitions(spark, sf_dir):
    out = REGISTRY["q347_charm_pricing"].fn(spark, sf_dir).toPandas()
    n_parts = load_table(spark, sf_dir, "part").count()
    assert out.n_parts.sum() == n_parts
    assert (out.n_charm <= out.n_parts).all()
    assert (out.charm_rate.between(0, 1)).all()
