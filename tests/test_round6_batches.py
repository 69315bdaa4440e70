"""Semantic invariants for the round-6 batches (q561-q610) beyond the
oracle hash gate: properties the DuckDB comparison cannot see (both
engines could be wrong the same way), checked on sf0.001.
"""

from __future__ import annotations

import pytest

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


# --- sequence mining -------------------------------------------------------


def test_funnel_monotone(spark, sf_dir):
    df = run("q565_funnel_paths", spark, sf_dir).sort_values("stage")
    counts = df["n_users"].tolist()
    assert all(a >= b for a, b in zip(counts, counts[1:])), counts
    assert df["conversion_from_start"].iloc[0] == 1.0


def test_transition_entropy_bounds(spark, sf_dir):
    import math

    df = run("q563_transition_entropy", spark, sf_dir)
    # 5 next-states max -> entropy within [0, log2(5)]
    assert ((df["entropy_bits"] >= 0) & (df["entropy_bits"] <= math.log2(5) + 1e-9)).all()


# --- data splits -----------------------------------------------------------


def test_purged_folds_partition_days(spark, sf_dir):
    df = run("q567_purged_kfold_embargo", spark, sf_dir)
    # every fold: test + embargo + train == all days (30 in testdata)
    tot = df[["test_days", "embargo_days", "train_days"]].sum(axis=1)
    assert (tot == tot.iloc[0]).all()
    # embargo never empty for interior folds, train never overlaps test
    assert (df["train_days"] + df["test_days"] < tot.iloc[0] + 1).all()


def test_group_split_no_leakage(spark, sf_dir):
    df = run("q569_group_split_leakage", spark, sf_dir).set_index("scheme")
    assert df.loc["group_hash", "users_spanning_splits"] == 0
    assert df.loc["group_hash", "contaminated_eval_rows"] == 0
    # the naive scheme must be visibly worse (that's the point)
    assert df.loc["row_hash", "contaminated_eval_rows"] > 0


# --- bitemporal ------------------------------------------------------------


def test_bitemporal_snapshot_monotone_in_t(spark, sf_dir):
    df = run("q571_bitemporal_snapshot", spark, sf_dir)
    # fixing valid_asof, more knowledge (later T) can only add parts
    for v, g in df.groupby("valid_asof"):
        g = g.sort_values("known_asof")
        n = g["n_parts"].tolist()
        assert all(a <= b for a, b in zip(n, n[1:])), (v, n)


def test_restatement_share_in_unit_interval(spark, sf_dir):
    df = run("q572_restatement_audit", spark, sf_dir)
    assert ((df["restatement_share"] >= 0) & (df["restatement_share"] <= 1)).all()
    assert (df["final_known"] >= df["first_reported"]).all()


# --- HMM -------------------------------------------------------------------


def test_viterbi_beats_single_state(spark, sf_dir):
    df = run("q580_switching_gain", spark, sf_dir)
    # max-plus optimum can never lose to a constrained (single-state) path
    assert (df["switching_gain"] >= 0).all()


def test_decode_margin_nonnegative(spark, sf_dir):
    df = run("q578_decode_margin", spark, sf_dir)
    assert (df["margin"] >= 0).all()


def test_forward_mass_positive(spark, sf_dir):
    df = run("q577_forward_path_mass", spark, sf_dir)
    assert (df["min_mass"] > 0).all()


# --- association rules -----------------------------------------------------


def test_rule_metrics_consistent(spark, sf_dir):
    df = run("q581_association_rules", spark, sf_dir)
    assert ((df["confidence"] > 0) & (df["confidence"] <= 1)).all()
    assert (df["lift"] > 0).all()
    # conviction is NULL only when confidence == 1
    conf1 = df["confidence"] == 1.0
    assert df.loc[~conf1, "conviction"].notna().all()


def test_negative_associations_lift_below_one(spark, sf_dir):
    df = run("q585_negative_associations", spark, sf_dir)
    assert (df["lift"] <= 1.0).all()
    assert (df["supp_ab"] >= 0).all()


# --- motifs / wavelets -----------------------------------------------------


def test_motif_distance_le_discord(spark, sf_dir):
    motifs = run("q586_motif_pairs", spark, sf_dir)
    assert (motifs["dist"] >= 0).all()
    assert (motifs["j"] - motifs["i"] >= 4).all()  # non-overlap constraint


def test_haar_energy_shares_sum_to_one(spark, sf_dir):
    df = run("q596_haar_energy_spectrum", spark, sf_dir)
    assert abs(df["energy_share"].sum() - 1.0) < 1e-4
    assert (df["energy"] >= 0).all()


def test_wavelet_spikiness_share_bounds(spark, sf_dir):
    df = run("q600_wavelet_spikiness", spark, sf_dir)
    assert ((df["fine_share"] >= 0) & (df["fine_share"] <= 1)).all()
    assert (df["fine_e"] <= df["total_e"]).all()


# --- trend + AR ------------------------------------------------------------


def test_sen_slope_within_extreme_pair_slopes(spark, sf_dir):
    df = run("q591_sen_slope", spark, sf_dir)
    row = df.iloc[0]
    assert row["slope_p05"] <= row["sen_slope_lo"] <= row["sen_slope_hi"] <= row["slope_p95"]


def test_acf_lag0_is_one_and_bounded(spark, sf_dir):
    df = run("q606_autocovariance_table", spark, sf_dir).set_index("lag")
    assert df.loc[0, "r_k"] == 1.0
    assert (df["r_k"].abs() <= 1.0 + 1e-9).all()


def test_ar2_beats_or_matches_ar1_variance(spark, sf_dir):
    ar1 = run("q607_ar1_fit", spark, sf_dir).iloc[0]
    ar2 = run("q608_ar2_yule_walker", spark, sf_dir).iloc[0]
    # Yule-Walker AR(2) innovation variance <= AR(1)'s (extra parameter
    # can only help in-sample)
    assert ar2["innovation_var_ratio"] <= ar1["innovation_var_ratio"] + 1e-9


# --- inequality ------------------------------------------------------------


def test_lorenz_convex_and_gini_bounds(spark, sf_dir):
    row = run("q601_lorenz_gini", spark, sf_dir).iloc[0]
    assert 0 <= row["lorenz_q1"] <= row["lorenz_q2"] <= row["lorenz_q3"] <= 1
    assert row["lorenz_q1"] <= 0.25 and row["lorenz_q2"] <= 0.5
    assert 0 <= row["gini"] <= 1


def test_abc_revenue_ordering(spark, sf_dir):
    df = run("q605_abc_xyz", spark, sf_dir)
    by_abc = df.groupby("abc")["revenue_cents"].sum()
    by_cnt = df.groupby("abc")["n_parts"].sum()
    if {"A", "C"} <= set(by_abc.index):
        # A-class: more revenue from fewer parts than C
        assert by_abc["A"] / by_cnt["A"] > by_abc["C"] / by_cnt["C"]


# --- inequality / AR / synthetic control -----------------------------------


def test_palma_consistent_with_lorenz(spark, sf_dir):
    row = run("q604_palma_top_shares", spark, sf_dir).iloc[0]
    assert 0 <= row["bottom40_share"] <= 0.4 + 1e-9
    assert row["top1_share"] <= row["top5_share"] <= row["top10_share"]


def test_synth_control_weights_sum(spark, sf_dir):
    row = run("q611_synthetic_control_fit", spark, sf_dir).iloc[0]
    assert row["w1"] + row["w2"] + row["w3"] + row["w4"] == 10
    assert row["pre_sse_scaled"] >= 0


def test_placebo_exactly_one_true_unit(spark, sf_dir):
    df = run("q613_placebo_tests", spark, sf_dir)
    assert len(df) == 5
    assert df["is_true_treated"].sum() == 1


def test_donor_importance_inflation_ge_one(spark, sf_dir):
    df = run("q615_donor_importance", spark, sf_dir)
    assert (df["sse_inflation"] >= 1.0 - 1e-9).all()


# --- scorecard / distsys / trees --------------------------------------------


def test_auc_informative_score(spark, sf_dir):
    row = run("q617_auc_somers", spark, sf_dir).iloc[0]
    # P(y=1|k) = k/2^20 by construction -> AUC well above chance
    assert 0.6 < row["auc"] <= 1.0
    # both sides are independently ROUND(...,6)-ed, so the identity
    # holds only to ~2 ulps of the 6th decimal
    assert abs(row["somers_d"] - (2 * row["auc"] - 1)) < 3e-6


def test_hrw_minimal_disruption(spark, sf_dir):
    df = run("q622_rendezvous_hashing", spark, sf_dir)
    assert (df["illegally_moved"] == 0).all()
    gained = df.set_index("node")["gained_keys"]
    assert gained.drop(5).sum() == 0 and gained[5] > 0


def test_merkle_localizes(spark, sf_dir):
    df = run("q623_merkle_reconciliation", spark, sf_dir).set_index("level")
    # finer levels can only have >= as many differing buckets
    assert df.loc[0, "differing_buckets"] >= df.loc[1, "differing_buckets"]
    assert df.loc[1, "differing_buckets"] >= df.loc[2, "differing_buckets"]


def test_gini_split_bounds(spark, sf_dir):
    df = run("q626_best_split_gini", spark, sf_dir)
    assert ((df["weighted_gini"] >= 0) & (df["weighted_gini"] <= 0.5)).all()


def test_oblivious_cost_nonnegative(spark, sf_dir):
    row = run("q630_oblivious_vs_greedy", spark, sf_dir).iloc[0]
    assert row["oblivious_cost"] >= -1e-9


def test_info_gain_f1_wins(spark, sf_dir):
    df = run("q627_information_gain", spark, sf_dir)
    # f1 drives the label by construction; dow is pure noise
    assert df.iloc[0]["feature"] == "f1_band"


# --- sampling / robust / calendar / index -----------------------------------


def test_hamilton_sums_to_budget(spark, sf_dir):
    df = run("q638_hamilton_allocation", spark, sf_dir)
    assert df["allocated"].sum() == 1000


def test_pps_sum_pi_is_target(spark, sf_dir):
    row = run("q639_pps_inclusion", spark, sf_dir).iloc[0]
    assert abs(row["sum_pi"] - 50.0) < 1e-4


def test_robust_scales_positive(spark, sf_dir):
    qn = run("q643_qn_scale", spark, sf_dir).iloc[0]
    sn = run("q644_sn_scale", spark, sf_dir).iloc[0]
    bw = run("q645_biweight_midvariance", spark, sf_dir).iloc[0]
    assert qn["qn_cents_unnormalized"] > 0
    assert sn["sn_cents_unnormalized"] > 0
    assert bw["biweight_midvariance_dollars2"] > 0
    assert bw["n_included"] <= bw["n_days"] * 1  # gate can only exclude


def test_promises_never_weekend(spark, sf_dir):
    df = run("q648_promise_dates", spark, sf_dir)
    assert (df["promised_weekday"] <= 4).all()
    assert (df["min_calendar_gap"] >= 3).all()
    assert (df["max_calendar_gap"] <= 5).all()
    row = run("q649_holiday_adjustment", spark, sf_dir).iloc[0]
    assert row["weekend_landings"] == 0


def test_intersection_bounds(spark, sf_dir):
    df = run("q652_intersection_cost", spark, sf_dir)
    assert (df["selectivity"] <= 1.0 + 1e-9).all()
    assert (df["galloping_cost"] > 0).all()


def test_wand_threshold_sane(spark, sf_dir):
    row = run("q653_wand_pruning", spark, sf_dir).iloc[0]
    assert row["surviving_docs"] >= 10
    assert row["candidate_docs"] >= row["surviving_docs"]


# --- reserving (chain-ladder) ------------------------------------------------


def test_triangle_cumulative_consistency(spark, sf_dir):
    df = run("q661_runoff_triangle", spark, sf_dir)
    # cumulative = prefix sum of incrementals within each origin
    for origin, g in df.groupby("origin"):
        g = g.sort_values("dev")
        assert (g["paid_cents"].cumsum() == g["cum_cents"]).all()
    # a complete triangle: origin o observed exactly to dev 2000 - o
    devs = df.groupby("origin")["dev"].max()
    assert (devs == 2000 - devs.index).all()


def test_chain_ladder_ultimate_geq_paid(spark, sf_dir):
    df = run("q663_chain_ladder_ultimates", spark, sf_dir)
    # factors >= 1 (cumulative paid grows), so IBNR >= 0 and the
    # mature 1995 cohort pins CDF = 1 exactly
    assert (df["ibnr_dollars"] >= -1e-6).all()
    assert df.set_index("origin").loc[1995, "cdf_to_ultimate"] == 1.0
    # CDF monotone: younger cohorts have more development ahead
    cdfs = df.sort_values("origin")["cdf_to_ultimate"].tolist()
    assert all(a <= b + 1e-9 for a, b in zip(cdfs, cdfs[1:]))


def test_bf_between_paid_and_prior_scale(spark, sf_dir):
    df = run("q664_bornhuetter_ferguson", spark, sf_dir)
    # BF ultimate >= paid (the reserve is nonnegative), and the BF
    # reserve shrinks to 0 for the mature cohort
    assert (df["bf_ultimate"] >= df["paid_dollars"] - 1e-6).all()
    assert abs(df.set_index("origin").loc[1995, "bf_reserve"]) < 1e-6


def test_calendar_diagonals_cover_triangle(spark, sf_dir):
    tri = run("q661_runoff_triangle", spark, sf_dir)
    diag = run("q665_calendar_diagonals", spark, sf_dir)
    obs = diag[diag["is_forecast"] == 0]
    assert obs["cents"].sum() == tri["paid_cents"].sum()
    fc = diag[diag["is_forecast"] == 1]
    assert len(fc) == 1 and fc.iloc[0]["cal_year"] == 2001
    assert fc.iloc[0]["cents"] > 0


# --- auctions ----------------------------------------------------------------


def test_vickrey_clearing_geq_first_price(spark, sf_dir):
    df = run("q666_vickrey_census", spark, sf_dir)
    # second-lowest >= lowest, per brand and on average
    assert (df["clearing_cost"] >= df["first_price_cost"] - 1e-9).all()
    assert (df["avg_money_on_table"] >= -1e-9).all()


def test_reserve_grid_monotonicity(spark, sf_dir):
    df = run("q667_reserve_price_grid", spark, sf_dir).sort_values("mult_pct")
    # raising the reserve can only shrink the cleared set
    cleared = df["cleared"].tolist()
    assert all(a >= b for a, b in zip(cleared, cleared[1:]))
    # at reserve=0-ish (60% of mean) nearly everything with best>=r clears
    assert cleared[0] > 0


def test_second_price_revenue_dominates_shaded(spark, sf_dir):
    df = run("q669_revenue_equivalence_audit", spark, sf_dir)
    # shaded first-price bid (n-1)/n * top < top, and the second bid
    # sits below the top too; both revenues positive
    assert (df["second_price_revenue"] > 0).all()
    assert (df["shaded_first_price_revenue"] > 0).all()


def test_money_on_table_sorted_and_consistent(spark, sf_dir):
    df = run("q670_money_on_table_topk", spark, sf_dir)
    gaps = df["money_on_table"].tolist()
    assert all(a >= b - 1e-12 for a, b in zip(gaps, gaps[1:]))
    assert ((df["second_bid"] - df["best_bid"] - df["money_on_table"]).abs()
            < 1e-9).all()
