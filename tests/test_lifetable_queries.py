"""Semantic invariants for batch 193 (q1032-q1036, customer life
table) beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.lifetable import DISCOUNT, MILESTONES

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_decrement_table_identities(spark, sf_dir):
    df = run("q1032_decrement_table", spark, sf_dir).sort_values("x")
    # lx is a suffix sum: strictly decreasing by dx
    assert (df.lx.values[:-1] - df.dx.values[:-1] == df.lx.values[1:]).all()
    # l0 equals the cohort size; last lx equals last dx
    assert df.lx.iloc[0] == df.dx.sum()
    assert df.lx.iloc[-1] == df.dx.iloc[-1]
    assert (df.qx > 0).all() and (df.qx <= 1).all()


def test_life_expectancy_decreasing_tail(spark, sf_dir):
    df = run("q1033_life_expectancy", spark, sf_dir).sort_values("x")
    # e_x at the last attained month is 0 (no one survives beyond)
    assert df.ex_num.iloc[-1] == 0
    # identity: ex_num(x) = sum of lx over later rows
    lx = df.set_index("x").lx
    for x in df.x.iloc[:3]:
        expect = lx[lx.index > x].sum()
        assert df.set_index("x").loc[x, "ex_num"] == expect


def test_discounted_lifetime_chain(spark, sf_dir):
    df = run("q1034_discounted_lifetime", spark, sf_dir).sort_values("x")
    # dense spine from 0; v decays geometrically; epv increases
    assert (df.x.values == range(len(df))).all()
    assert df.v_micro.iloc[0] == 1.0
    assert df.v_micro.is_monotonic_decreasing
    assert df.epv_micro.is_monotonic_increasing
    # epv bounded by the undiscounted mean lifetime + 1
    import math

    assert df.epv_micro.iloc[-1] < 1.0 / (1.0 - DISCOUNT) + 1
    # survivors never increase
    assert df.lx.is_monotonic_decreasing


def test_cohort_expectancy_partitions(spark, sf_dir):
    df = run("q1035_cohort_life_expectancy", spark, sf_dir)
    dec = run("q1032_decrement_table", spark, sf_dir)
    assert df.n_customers.sum() == dec.dx.sum()
    assert ((df.mean_num / df.mean_den - df.mean_lifetime_m).abs() < 1e-12).all()
    # median is attained and within observed range
    assert df.median_lifetime_m.between(0, dec.x.max()).all()


def test_retention_milestones_monotone(spark, sf_dir):
    df = run("q1036_retention_milestones", spark, sf_dir)
    assert set(df.milestone_m) == set(MILESTONES)
    for _, g in df.groupby("segment"):
        g = g.sort_values("milestone_m")
        # retention can only fall as the milestone moves out
        assert g.retention.is_monotonic_decreasing
        assert (g.retained <= g.cohort_size).all()
        assert g.half_life_m.nunique() == 1
