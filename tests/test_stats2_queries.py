"""Invariant checks for batch 46 (q337-q339)."""

import numpy as np
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_neyman_allocation_sums_to_budget(spark, sf_dir):
    out = REGISTRY["q337_neyman_allocation"].fn(spark, sf_dir).toPandas()
    assert abs(out.neyman_alloc.sum() - 1000) < 1.0
    assert abs(out.proportional_alloc.sum() - 1000) < 1.0
    assert (out.neyman_alloc > 0).all()
    # Neyman downweights low-spread strata relative to proportional
    # (sanity: the two allocations actually differ somewhere unless all
    # sds are equal)
    if out.stratum_sd.nunique() > 1:
        assert (out.neyman_alloc - out.proportional_alloc).abs().max() > 0.01


def test_burrows_delta_bounds(spark, sf_dir):
    out = REGISTRY["q338_burrows_delta"].fn(spark, sf_dir).toPandas()
    assert len(out) == 20
    assert (out.delta >= 0).all()
    assert (out.delta.diff().dropna() >= -1e-9).all()  # ascending
    assert (out.src_a < out.src_b).all()


def test_granger_f_matches_numpy(spark, sf_dir):
    row = REGISTRY["q339_granger_f"].fn(spark, sf_dir).collect()[0]
    # rebuild in numpy
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.sum(F.round("value", 4)).cast("double").alias("y"),
        )
        .orderBy("d")
        .toPandas()
    )
    y = daily.y.to_numpy()[1:]
    yl = daily.y.to_numpy()[:-1]
    xl = daily.x.to_numpy()[:-1]
    n = len(y)
    assert row["n_days"] == n

    def rss(X):
        beta, *_ = np.linalg.lstsq(X, y, rcond=None)
        r = y - X @ beta
        return float(r @ r)

    rss_r = rss(np.column_stack([np.ones(n), yl]))
    rss_u = rss(np.column_stack([np.ones(n), yl, xl]))
    f = (rss_r - rss_u) / (rss_u / (n - 3))
    assert abs(row["rss_restricted"] - rss_r) / max(rss_r, 1) < 1e-3
    assert abs(row["rss_unrestricted"] - rss_u) / max(rss_u, 1) < 1e-3
    assert abs(row["f_stat"] - f) < max(0.01, abs(f) * 0.01)
