"""Invariant checks for batch 54 (q356-q358)."""

import numpy as np
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.ranking import QR_SLOPES, QR_TAU
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_quantile_grid_matches_numpy(spark, sf_dir):
    row = REGISTRY["q356_quantile_regression_grid"].fn(spark, sf_dir).collect()[0]
    assert row["slope"] in QR_SLOPES
    # numpy recomputation of the grid argmin
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    xy = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.max(F.round("o_totalprice", 2)).alias("y"),
        )
        .toPandas()
    )
    x, y = xy.x.to_numpy(), xy.y.to_numpy()
    losses = []
    for b in QR_SLOPES:
        r = y - b * x
        losses.append(np.where(r >= 0, QR_TAU * r, (QR_TAU - 1) * r).sum())
    assert row["slope"] == QR_SLOPES[int(np.argmin(losses))]
    # ~90% of residuals below the fitted line's prediction... i.e.,
    # roughly tau of points under: quantile property within grid error
    under = (y <= row["slope"] * x).mean()
    assert 0.75 <= under <= 1.0


def test_position_bias_curve(spark, sf_dir):
    out = REGISTRY["q357_position_bias"].fn(spark, sf_dir).toPandas()
    assert (out.ctr.between(0, 1)).all()
    p1 = out[out.position == 1]
    assert len(p1) == 1
    assert abs(p1.propensity_vs_pos1.iloc[0] - 1.0) < 1e-6
    assert (out.clicks <= out.n).all()


def test_skip_above_pair_mass(spark, sf_dir):
    out = REGISTRY["q358_skip_above_pairs"].fn(spark, sf_dir).toPandas()
    assert (out.position_gap >= 1).all()
    assert (out.n_pairs > 0).all()
    # gap-1 pairs exist whenever any click directly follows a view
    assert 1 in set(out.position_gap)
