"""Invariant checks for batches 25/31/32/33 (q281-q283, q294-q300):
cross-column identities the per-query oracles can't see."""

import numpy as np
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_seasonality_indices_average_to_one(spark, sf_dir):
    out = REGISTRY["q281_weekday_seasonality"].fn(spark, sf_dir).toPandas()
    assert len(out) == 7
    # day-weighted average of the indices is exactly 1
    weighted = (out.seasonal_index * out.n_days).sum() / out.n_days.sum()
    assert abs(weighted - 1.0) < 1e-4


def test_abc_xyz_partition(spark, sf_dir):
    out = REGISTRY["q283_abc_xyz_matrix"].fn(spark, sf_dir).toPandas()
    assert set(out.abc) <= {"A", "B", "C"}
    assert set(out.xyz) <= {"X", "Y", "Z"}
    li = load_table(spark, sf_dir, "lineitem")
    n_eligible = (
        li.groupBy("l_partkey", F.date_trunc("day", "l_shipdate").alias("d"))
        .count()
        .groupBy("l_partkey")
        .count()
        .filter(F.col("count") >= 5)
        .count()
    )
    assert out.n_parts.sum() == n_eligible


def test_effective_catalog_bounds(spark, sf_dir):
    row = REGISTRY["q294_effective_catalog"].fn(spark, sf_dir).collect()[0]
    # exp(H) is between 1 and the number of revenue-positive parts
    assert 1.0 <= row["effective_catalog"] <= row["n_parts"] + 1e-6
    assert 0.0 < row["diversity_ratio"] <= 1.0 + 1e-9


def test_price_ladder_ratios(spark, sf_dir):
    out = REGISTRY["q295_price_ladder"].fn(spark, sf_dir).toPandas()
    assert (out.gap_ratio >= 1.0).all()  # sorted ladder: next/prev >= 1
    assert (out.gap_high > out.gap_low).all()
    assert (out.n_points >= 2).all()


def test_share_shift_bounds(spark, sf_dir):
    out = REGISTRY["q296_share_shift"].fn(spark, sf_dir).toPandas()
    assert (out.share.between(0, 1)).all()
    assert (out.share_shift.abs() > 0.02).all()


def test_poisson_gof_structure(spark, sf_dir):
    out = REGISTRY["q297_poisson_gof"].fn(spark, sf_dir).toPandas()
    n_orders = load_table(spark, sf_dir, "orders").count()
    # every order with lines appears in exactly one bucket
    li_orders = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert out.observed.sum() == li_orders
    assert (out.chi_term >= 0).all()
    # expectations sum to ~n (truncated tail slack)
    assert abs(out.expected.sum() - li_orders) < 0.05 * li_orders


def test_perfect_order_rate_identities(spark, sf_dir):
    out = REGISTRY["q299_perfect_order_rate"].fn(spark, sf_dir).toPandas()
    assert (out.n_perfect <= out.n_on_time).all()
    assert (out.n_perfect <= out.n_clean).all()
    assert (out.perfect_rate.between(0, 1)).all()
    li_orders = (
        load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct().count()
    )
    assert out.n_orders.sum() == li_orders


def test_kpi_snapshot_consistency(spark, sf_dir):
    out = REGISTRY["q300_kpi_snapshot"].fn(spark, sf_dir).toPandas()
    kv = dict(zip(out.metric, out.value))
    assert len(kv) == 8
    assert abs(kv["avg_order_value"] - round(kv["total_revenue"] / kv["n_orders"], 4)) < 0.01
    assert kv["active_customers"] <= kv["n_orders"]
    assert 0 < kv["distinct_doc_ratio"] <= 1
    assert kv["lineitems_per_order"] >= 1
