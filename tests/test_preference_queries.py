"""Invariant checks for batch 35 (q304-q306): pair-mass conservation,
bias-rate bounds, and a numpy reimplementation of the MM iterations
pinning the Bradley-Terry fit."""

import numpy as np
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.preference import _pairs

REGISTRY = load_registry()


def test_winrate_mass_conservation(spark, sf_dir):
    out = REGISTRY["q304_pairwise_winrate"].fn(spark, sf_dir).toPandas()
    # every cross-system match contributes one win and one loss
    assert out.wins.sum() * 2 == out.matches.sum()
    n_cross = (
        _pairs(spark, sf_dir)
        .filter(F.col("a_source") != F.col("b_source"))
        .count()
    )
    assert out.matches.sum() == 2 * n_cross
    assert out.win_rate.between(0, 1).all()


def test_length_bias_bounds(spark, sf_dir):
    out = REGISTRY["q305_length_bias"].fn(spark, sf_dir).toPandas()
    assert out.longer_win_rate.between(0, 1).all()
    assert (out.longer_wins <= out.n_pairs).all()
    # unequal-length pairs only
    p = _pairs(spark, sf_dir)
    assert out.n_pairs.sum() == p.filter(
        F.col("a_chars") != F.col("b_chars")
    ).count()


def test_bradley_terry_matches_numpy_mm(spark, sf_dir):
    out = (
        REGISTRY["q306_bradley_terry"].fn(spark, sf_dir)
        .orderBy("source")
        .toPandas()
    )
    # rebuild the win matrix and run the same 3 MM iterations in numpy
    cells = (
        _pairs(spark, sf_dir)
        .filter(F.col("a_source") != F.col("b_source"))
        .groupBy("a_source", "b_source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("winner") == "a", 1).otherwise(0)).alias("wi"),
        )
        .toPandas()
    )
    srcs = sorted(out.source)
    idx = {s: k for k, s in enumerate(srcs)}
    m = len(srcs)
    N = np.zeros((m, m))
    Wv = np.zeros(m)
    for row in cells.itertuples():
        i, j = idx[row.a_source], idx[row.b_source]
        N[i, j] += row.n
        N[j, i] += row.n
        Wv[i] += row.wi
        Wv[j] += row.n - row.wi
    r = np.ones(m)
    for _ in range(3):
        denom = (N / (r[:, None] + r[None, :] + np.eye(m))).sum(axis=1)
        # eye avoids 0/0 on the (empty) diagonal; N diagonal is 0
        raw = Wv / denom
        r = np.round(raw / raw.mean(), 12)
    got = out.set_index("source").bt_strength
    for s in srcs:
        assert abs(got[s] - r[idx[s]]) < 1e-5, s
    # strengths are positive and mean-normalized
    assert (out.bt_strength > 0).all()
    assert abs(out.bt_strength.mean() - 1.0) < 1e-4
