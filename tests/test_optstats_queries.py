"""Invariant checks for batch 61 (q375-q376)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_join_cardinality_pkfk_near_exact(spark, sf_dir):
    out = REGISTRY["q375_join_cardinality_audit"].fn(spark, sf_dir).toPandas()
    assert len(out) == 3
    assert (out.q_error >= 1.0).all()
    # PK-FK joins under the max-ndv formula are near-exact: the
    # estimate equals |fact| when the dim key is unique and covers
    pk = out[out.join_pair == "orders_x_lineitem"].iloc[0]
    li_n = load_table(spark, sf_dir, "lineitem").count()
    assert pk.actual_rows == li_n
    assert pk.q_error < 1.5


def test_selectivity_independence_holds_here(spark, sf_dir):
    row = REGISTRY["q376_selectivity_audit"].fn(spark, sf_dir).collect()[0]
    assert 0 < row["sel_status"] < 1
    assert 0 < row["sel_priority"] < 1
    assert row["q_error"] >= 1.0
    # synthetic columns are independent: the estimate should be close
    assert row["q_error"] < 2.0
    # estimate identity
    est = row["sel_status"] * row["sel_priority"]
    assert abs(est - row["est_conj_selectivity"]) < 1e-5
