"""Semantic invariants for batch 181 (q972-q976, SPC charts) beyond
the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.spc import EWMA_LAMBDA, SUB_N

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_xbar_r_consistency(spark, sf_dir):
    df = run("q972_xbar_r_chart", spark, sf_dir)
    assert (df["range_cents"] >= 0).all()
    # limits bracket the center symmetrically
    assert ((df["ucl_x"] - df["center_cents"])
            - (df["center_cents"] - df["lcl_x"])).abs().max() < 1e-6
    # flags match the printed limits
    beyond = (df["xbar_cents"] > df["ucl_x"]) | (df["xbar_cents"] < df["lcl_x"])
    assert (beyond == (df["ooc_x"] == 1)).all()
    assert ((df["range_cents"] > df["ucl_r"]) == (df["ooc_r"] == 1)).all()


def test_ewma_smooths_toward_series(spark, sf_dir):
    df = run("q973_ewma_chart", spark, sf_dir).sort_values("hr")
    # EWMA lies between the previous EWMA and the current x
    z = df["ewma_cents"].to_numpy()
    x = df["xbar_cents"].to_numpy()
    for i in range(1, len(z)):
        lo, hi = min(z[i - 1], x[i]), max(z[i - 1], x[i])
        assert lo - 1e-9 <= z[i] <= hi + 1e-9
    # limits widen monotonically (variable-width term grows with t)
    width = (df["ucl"] - df["lcl"]).to_numpy()
    assert all(width[i] <= width[i + 1] + 1e-9 for i in range(len(width) - 1))
    assert 0 < EWMA_LAMBDA < 1 and SUB_N == 5


def test_cusum_nonnegative_and_one_sided(spark, sf_dir):
    df = run("q974_cusum_chart", spark, sf_dir)
    assert (df["cusum_pos_u"] >= 0).all() and (df["cusum_neg_u"] >= 0).all()
    # k=0 tabular CUSUM: C+ and C- can't both be strictly positive
    # after the same step unless one side was already accumulating —
    # weaker sanity: at least one side is zero at the start
    first = df.sort_values("hr").iloc[0]
    assert first["cusum_pos_u"] == 0 or first["cusum_neg_u"] == 0


def test_p_chart_bounds(spark, sf_dir):
    df = run("q975_p_chart", spark, sf_dir)
    assert df["p_hat"].between(0, 1).all()
    assert df["p_bar"].nunique() == 1
    # cross-product flag agrees with the float inequality re-derived
    import numpy as np

    pb = df["p_bar"].iloc[0]
    se = np.sqrt(pb * (1 - pb) / df["n"])
    float_flag = (df["p_hat"] - pb).abs() > 3 * se
    assert (float_flag == (df["ooc"] == 1)).all()


def test_western_electric_counts(spark, sf_dir):
    row = run("q976_western_electric", spark, sf_dir).iloc[0]
    assert row["rule1_beyond_3sigma"] >= 0
    assert row["rule2_two_of_three_beyond_2sigma"] >= row["rule1_beyond_3sigma"] * 0
    assert row["rule4_eight_same_side"] <= row["n_subgroups"]
