"""Invariant checks for batch 57 (q365-q366): the HLL error
contract and window-battery identities."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_hll_error_bound(spark, sf_dir):
    out = REGISTRY["q365_hll_sketch"].fn(spark, sf_dir).toPandas()
    assert len(out) == 5
    # lgConfigK=12 HLL: relative standard error ~1.6%; assert a loose 5%
    assert (out.rel_error < 0.05).all()
    assert (out.hll_estimate > 0).all()
    # exact side is genuinely exact
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in out.itertuples():
        assert exact[r.event_type] == r.exact_distinct


def test_window_battery_identities(spark, sf_dir):
    out = REGISTRY["q366_window_battery"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events")
    assert out.n_rows.sum() == ev.count()
    # cume_dist of the last row in each partition is 1; all values in
    # (0, 1]; so per-bucket sum is positive and at most n_rows
    assert (out.sum_cume_dist > 0).all()
    assert (out.sum_cume_dist <= out.n_rows + 1e-6).all()
    # percent_rank in [0, 1): strictly less than n_rows
    assert (out.sum_pct_rank < out.n_rows).all()
