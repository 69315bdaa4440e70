"""Invariant checks for batch 47 (q340-q341)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_ar_aging_covers_open_book(spark, sf_dir):
    out = REGISTRY["q340_ar_aging"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders")
    n_open = o.filter(F.col("o_orderstatus") == "O").count()
    assert out.n_orders.sum() == n_open
    assert abs(out.share.sum() - 1.0) < 1e-4
    total_open = (
        o.filter(F.col("o_orderstatus") == "O")
        .agg(F.sum(F.round("o_totalprice", 2)))
        .collect()[0][0]
    )
    assert abs(out.amount.sum() - float(total_open)) < 0.05


def test_revenue_recognition_conserves_mass(spark, sf_dir):
    out = REGISTRY["q341_revenue_recognition"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # total recognized = total billed for orders that have lineitems
    billed = (
        o.join(li.select("l_orderkey").distinct(),
               o.o_orderkey == F.col("l_orderkey"), "left_semi")
        .agg(F.sum(F.round("o_totalprice", 2)))
        .collect()[0][0]
    )
    # per-order rounding of the monthly share loses < nm * 5e-7 each
    assert abs(out.recognized_revenue.sum() - float(billed)) < 5.0
    # months are contiguous calendar months
    months = sorted(out.month)
    assert months[0] <= months[-1]
    assert (out.recognized_revenue > 0).all()
