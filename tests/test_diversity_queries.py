"""Semantic invariants for batch 188 (q1007-q1011, diversity indices)
beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_simpson_bounds_and_rational(spark, sf_dir):
    df = run("q1007_simpson_concentration", spark, sf_dir)
    assert (df.simpson_d >= 0).all() and (df.simpson_d <= 1).all()
    # the terminal double IS the rational
    assert (
        (df.simpson_d - df.simpson_num / df.simpson_den).abs() < 1e-15
    ).all()
    assert ((df.gini_simpson + df.simpson_d - 1).abs() < 1e-12).all()
    # concentration needs at least 2 items per community
    assert (df.n_total >= 2).all()


def test_hill_profile_ordering(spark, sf_dir):
    df = run("q1008_hill_profile", spark, sf_dir)
    # Hill numbers are decreasing in q: q0 >= q2 >= 1/BP (Hill q=inf)
    assert (df.hill_q0 >= df.hill_q2 - 1e-9).all()
    assert (df.hill_q2 >= 1 / df.berger_parker - 1e-9).all()
    assert (df.berger_parker > 0).all() and (df.berger_parker <= 1).all()


def test_chao1_dominates_observed(spark, sf_dir):
    df = run("q1009_chao1_richness", spark, sf_dir)
    # the estimator never falls below observed richness
    assert (df.chao1 >= df.s_obs - 1e-9).all()
    # singletons/doubletons are disjoint subsets of observed species
    assert (df.f1 + df.f2 <= df.s_obs).all()
    # rare-species regime actually holds (part-level abundances)
    assert (df.f1 > 0).any()


def test_morisita_horn_symmetric_bounds(spark, sf_dir):
    df = run("q1010_morisita_horn", spark, sf_dir)
    assert len(df) == 25 * 24 // 2
    assert (df.morisita_horn >= 0).all()
    assert (df.morisita_horn <= 1 + 1e-9).all()
    # identical communities would score 1; distinct nations score < 1
    assert (df.morisita_horn < 1).all()


def test_overlap_jaccard_dice_consistency(spark, sf_dir):
    df = run("q1011_community_overlap", spark, sf_dir)
    assert len(df) == 25 * 24 // 2
    # dice = 2J/(1+J) pointwise
    expect = 2 * df.jaccard / (1 + df.jaccard)
    assert ((df.sorensen_dice - expect).abs() < 1e-12).all()
    assert (df.n_common <= df[["s_a", "s_b"]].min(axis=1)).all()
