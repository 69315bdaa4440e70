"""Semantic invariants for batch 186 (q997-q1001, decision curves)
beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_confusion_partitions_and_monotone(spark, sf_dir):
    df = run("q997_threshold_confusion", spark, sf_dir).sort_values("t20")
    n = (df[["tp", "fp", "fn", "tn"]].sum(axis=1)).unique()
    assert len(n) == 1  # every threshold classifies every doc
    # raising the threshold can only shrink the predicted-positive set
    assert (df["tp"] + df["fp"]).is_monotonic_decreasing
    assert df["sensitivity"].is_monotonic_decreasing
    assert df["specificity"].is_monotonic_increasing


def test_decision_curve_dominates_at_best(spark, sf_dir):
    dc = run("q998_decision_curve", spark, sf_dir)
    # model NB >= treat-all NB wherever treat-all is negative territory
    assert (dc["nb_model"] * dc["nb_den"] - dc["nb_model_num"]).abs().max() < 1e-6
    op = run("q999_operating_point", spark, sf_dir).iloc[0]
    assert op["margin_over_none"] == max(dc["nb_model"])
    assert op["margin_over_all"] >= 0 or op["nb_treat_all"] > op["nb_model"]
    # the operating point's NB matches the curve at that threshold
    row = dc.set_index("t20").loc[op["best_t20"]]
    assert abs(row["nb_model"] - op["nb_model"]) < 1e-12


def test_utility_curve_flags_exactly_the_max(spark, sf_dir):
    u = run("q1000_utility_curve", spark, sf_dir)
    mx = u["utility_cents"].max()
    assert ((u["utility_cents"] == mx) == (u["is_optimal"] == 1)).all()


def test_prevalence_sweep_monotone_in_pi(spark, sf_dir):
    s = run("q1001_prevalence_sweep", spark, sf_dir)
    assert (s["nb_den"] > 0).all()
    # at fixed threshold, standardized NB is increasing in prevalence
    # (sens >= 0 and the penalty term shrinks as pi grows)
    for _, g in s.groupby("t20"):
        g = g.sort_values("p10")
        assert g["nb_standardized"].is_monotonic_increasing
