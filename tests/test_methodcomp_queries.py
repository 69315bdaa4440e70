"""Semantic invariants for batch 189 (q1012-q1016, method comparison)
beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_bland_altman_limits_cover(spark, sf_dir):
    df = run("q1012_bland_altman", spark, sf_dir)
    assert (df.loa_lower < df.mean_diff).all()
    assert (df.loa_upper > df.mean_diff).all()
    # limits of agreement cover the bulk of orders (>= 80% even for
    # heavy-tailed planted noise)
    assert (df.n_inside >= 0.8 * df.n).all()
    # the planted +500c bias is visible in every segment
    assert (df.mean_diff > 0).all()


def test_deming_slope_near_one(spark, sf_dir):
    df = run("q1013_deming_regression", spark, sf_dir)
    # the planted perturbation is a ±0.005% proportional wiggle:
    # errors-in-variables slope stays within a tight band of 1
    assert ((df.deming_slope - 1).abs() < 0.01).all()
    # the line passes through the mean point by construction
    recon = df.deming_intercept + df.deming_slope * df.xbar
    assert ((recon - df.ybar).abs() < 1e-6 * df.ybar.abs()).all()


def test_lin_ccc_below_pearson(spark, sf_dir):
    df = run("q1014_lin_concordance", spark, sf_dir)
    # CCC <= |r| always; C_b in (0, 1]
    assert (df.lin_ccc <= df.pearson_r.abs() + 1e-12).all()
    assert (df.bias_correction_factor <= 1 + 1e-12).all()
    assert (df.bias_correction_factor > 0).all()
    # near-perfect planted agreement
    assert (df.lin_ccc > 0.99).all()


def test_mcnemar_table_partitions(spark, sf_dir):
    df = run("q1015_mcnemar_flags", spark, sf_dir)
    tot = df[["both_flag", "b_discordant", "c_discordant", "neither_flag"]].sum(
        axis=1
    )
    # 2x2 table partitions each segment's orders
    assert (tot > 0).all()
    assert (df.mcnemar_den == df.b_discordant + df.c_discordant).all()
    # clamped continuity correction: num = max(|b-c|-1, 0)^2
    expect = (
        (df.b_discordant - df.c_discordant).abs() - 1
    ).clip(lower=0) ** 2
    assert (df.mcnemar_num == expect).all()


def test_tost_consistent_with_its_t_stats(spark, sf_dir):
    df = run("q1016_tost_equivalence", spark, sf_dir)
    expect = ((df.t_lower > 1.645) & (df.t_upper > 1.645)).astype(int)
    assert (df.equivalent == expect).all()
    assert (df.se_diff > 0).all()
