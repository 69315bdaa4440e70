"""Semantic invariants for the round-6 batches (q561-q880) beyond the
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


# --- extreme-value theory ------------------------------------------------------


def test_hill_positive_and_consistent(spark, sf_dir):
    row = run("q671_hill_tail_index", spark, sf_dir).iloc[0]
    assert row["hill_estimate"] > 0
    assert abs(row["tail_index_alpha"] * row["hill_estimate"] - 1.0) < 1e-3
    assert row["k_tail"] == 200


def test_mean_excess_thresholds_increase(spark, sf_dir):
    df = run("q672_mean_excess", spark, sf_dir).sort_values("mult_pct")
    # exceedance counts shrink as the threshold rises
    n = df["n_exceed"].tolist()
    assert all(a >= b for a, b in zip(n, n[1:]))
    assert (df["threshold_dollars"].diff().dropna() > 0).all()


def test_gpd_light_tail_on_bounded_prices(spark, sf_dir):
    row = run("q673_gpd_moments", spark, sf_dir).iloc[0]
    # order totals are bounded above -> xi should come out negative-ish
    # (bounded tail); beta positive; moments finite
    assert row["n_exc"] > 0
    assert row["beta_mom_dollars"] > 0
    assert row["xi_mom"] < 0.5


def test_gumbel_return_level_above_mean_max(spark, sf_dir):
    row = run("q674_gumbel_block_maxima", spark, sf_dir).iloc[0]
    assert row["gumbel_beta_dollars"] > 0
    assert row["return_level_10y_dollars"] > row["mean_block_max_dollars"]


def test_hill_return_levels_monotone(spark, sf_dir):
    df = run("q675_hill_return_levels", spark, sf_dir).sort_values(
        "per_million", ascending=False
    )
    rl = df["return_level_dollars"].tolist()
    # rarer events -> higher return levels
    assert all(a <= b for a, b in zip(rl, rl[1:]))
    hill = run("q671_hill_tail_index", spark, sf_dir).iloc[0]
    # RL at the k/n tail anchor stays above the Hill threshold
    assert (df["return_level_dollars"] > hill["threshold_dollars"] * 0.99).all()


# --- credibility ---------------------------------------------------------------


def test_buhlmann_z_in_unit_interval(spark, sf_dir):
    row = run("q676_buhlmann_components", spark, sf_dir).iloc[0]
    assert 0.0 <= row["credibility_z"] <= 1.0
    assert row["epv_dollars2"] > 0
    # k = EPV/VHM consistent with Z = n/(n+k)
    if row["vhm_dollars2"] > 0:
        z = 6.0 / (6.0 + row["k_constant"])
        assert abs(z - row["credibility_z"]) < 1e-6


def test_premiums_shrink_toward_grand_mean(spark, sf_dir):
    comp = run("q676_buhlmann_components", spark, sf_dir).iloc[0]
    df = run("q677_credibility_premiums", spark, sf_dir)
    gm = comp["grand_mean_dollars"]
    # top-10 heaviest histories: premium strictly between grand mean and raw
    assert (df["credibility_premium_dollars"] <= df["raw_mean_dollars"] + 1e-6).all()
    assert (df["credibility_premium_dollars"] >= gm - 1e-6).all()


def test_credibility_beats_raw_oos(spark, sf_dir):
    row = run("q678_shrinkage_backtest", spark, sf_dir).iloc[0]
    # the Buhlmann point: shrinkage should not lose to the raw mean
    assert row["mse_credibility_dollars2"] <= row["mse_raw_dollars2"] + 1e-6


def test_segment_z_exceeds_customer_z(spark, sf_dir):
    seg = run("q679_segment_credibility", spark, sf_dir)
    cust = run("q676_buhlmann_components", spark, sf_dir).iloc[0]
    assert len(seg) == 5
    assert (seg["credibility_z"] == seg["credibility_z"].iloc[0]).all()


def test_balance_and_compression(spark, sf_dir):
    row = run("q680_credibility_balance", spark, sf_dir).iloc[0]
    rel = abs(row["total_premium_dollars"] - row["total_raw_dollars"]) / max(
        row["total_raw_dollars"], 1.0
    )
    assert rel < 1e-6
    raw_range = row["max_raw_dollars"] - row["min_raw_dollars"]
    prem_range = row["max_premium_dollars"] - row["min_premium_dollars"]
    assert prem_range <= raw_range + 1e-9


# --- forensic accounting --------------------------------------------------------


def test_benford2_probs_sum_to_one(spark, sf_dir):
    df = run("q681_benford_second_digit", spark, sf_dir)
    assert len(df) == 10
    assert abs(df["expected_p"].sum() - 1.0) < 1e-12
    assert abs(df["observed_p"].sum() - 1.0) < 1e-9
    assert (df["chi2_contribution"] >= 0).all()


def test_cents_endings_counts(spark, sf_dir):
    df = run("q682_cents_endings", spark, sf_dir)
    assert (df["ending"] >= 0).all() and (df["ending"] <= 99).all()
    # sorted by count desc
    n = df["n_obs"].tolist()
    assert all(a >= b for a, b in zip(n, n[1:]))


def test_round_number_patterns_complete(spark, sf_dir):
    df = run("q683_round_number_bias", spark, sf_dir)
    assert set(df["pattern"]) == {
        "ends_00", "ends_50", "ends_95", "ends_99", "whole_hundred_dollars"
    }
    assert (df["observed_p"] <= 1.0).all()


def test_threshold_straddle_shape(spark, sf_dir):
    df = run("q685_threshold_straddle", spark, sf_dir)
    assert df["threshold_dollars"].tolist() == [100000, 200000, 300000]
    assert (df["n_just_below"] >= 0).all()


# --- trade economics ------------------------------------------------------------


def test_corridor_shares(spark, sf_dir):
    df = run("q686_trade_corridors", spark, sf_dir)
    assert len(df) == 15
    assert (df["world_share"] > 0).all()
    assert df["world_share"].sum() < 1.0 + 1e-9
    f = df["flow_dollars"].tolist()
    assert all(a >= b for a, b in zip(f, f[1:]))


def test_gravity_residuals_ranked(spark, sf_dir):
    df = run("q687_gravity_residuals", spark, sf_dir)
    r = df["log_residual"].tolist()
    assert all(a >= b for a, b in zip(r, r[1:]))
    assert (df["gravity_flow_dollars"] > 0).all()


def test_shift_share_identity(spark, sf_dir):
    df = run("q688_shift_share", spark, sf_dir)
    # NS + IM + RS == actual change, up to per-cell quantization
    resid = (
        df["actual_change_dollars"]
        - df["national_effect_dollars"]
        - df["industry_mix_dollars"]
        - df["competitive_shift_dollars"]
    ).abs()
    assert (resid < 0.02).all(), resid.max()


def test_rca_floor_and_rank(spark, sf_dir):
    df = run("q689_revealed_advantage", spark, sf_dir)
    assert (df["rca"] > 0).all()
    r = df["rca"].tolist()
    assert all(a >= b for a, b in zip(r, r[1:]))
    assert (df["flow_dollars"] >= 1000).all()


def test_grubel_lloyd_bounds(spark, sf_dir):
    df = run("q690_grubel_lloyd", spark, sf_dir)
    assert ((df["grubel_lloyd"] >= 0) & (df["grubel_lloyd"] <= 1)).all()
    assert (
        (df["a_to_b_dollars"] + df["b_to_a_dollars"] - df["total_trade_dollars"])
        .abs() < 1e-6
    ).all()


# --- cache / working set --------------------------------------------------------


def test_reuse_histogram_shares(spark, sf_dir):
    df = run("q691_reuse_time_histogram", spark, sf_dir)
    assert (df["week_bucket"] >= 0).all()
    assert df["share"].sum() <= 1.0 + 1e-9


def test_working_set_grows_with_window(spark, sf_dir):
    df = run("q692_working_set_curve", spark, sf_dir).sort_values("window_days")
    ws = df["avg_working_set"].tolist()
    assert all(a <= b + 1e-9 for a, b in zip(ws, ws[1:]))
    assert (df["max_working_set"] >= df["avg_working_set"] - 1e-9).all()


def test_ttl_hit_ratio_monotone(spark, sf_dir):
    df = run("q693_ttl_hit_ratios", spark, sf_dir).sort_values("ttl_days")
    hr = df["hit_ratio"].tolist()
    assert all(a <= b + 1e-12 for a, b in zip(hr, hr[1:]))
    assert (df["hit_ratio"] <= 1.0).all()
    # all TTL rows share the same access denominator
    assert (df["n_acc"] == df["n_acc"].iloc[0]).all()


def test_hot_set_coverage_monotone(spark, sf_dir):
    df = run("q695_hot_set_concentration", spark, sf_dir).sort_values("top_k")
    cov = df["coverage"].tolist()
    assert all(a <= b + 1e-12 for a, b in zip(cov, cov[1:]))
    assert cov[-1] <= 1.0 + 1e-12


# --- group-sequential testing ---------------------------------------------------


def test_sequential_counts_monotone(spark, sf_dir):
    df = run("q696_sequential_looks", spark, sf_dir).sort_values("look")
    for col in ("na", "nb", "xa", "xb"):
        v = df[col].tolist()
        assert all(a <= b for a, b in zip(v, v[1:])), col
    # OBF boundary decreases toward Pocock-ish levels; final = C_B
    ob = df["obf_bound"].tolist()
    assert all(a >= b for a, b in zip(ob, ob[1:]))
    assert abs(ob[-1] - 2.04) < 1e-9


def test_stopped_bias_consistency(spark, sf_dir):
    row = run("q697_stopped_estimate_bias", spark, sf_dir).iloc[0]
    if row["stopped_early"] == 0:
        assert abs(row["overstatement"]) < 1e-9
        assert row["effective_look"] == 5


def test_information_fractions_reach_one(spark, sf_dir):
    df = run("q698_information_fractions", spark, sf_dir).sort_values("look")
    fr = df["information_fraction"].tolist()
    assert all(a <= b + 1e-12 for a, b in zip(fr, fr[1:]))
    assert abs(fr[-1] - 1.0) < 1e-12


def test_repeated_cis_contain_diff(spark, sf_dir):
    df = run("q699_repeated_cis", spark, sf_dir)
    assert (df["rci_lo"] <= df["diff"] + 1e-9).all()
    assert (df["rci_hi"] >= df["diff"] - 1e-9).all()
    # widths shrink with accumulating information
    w = (df.sort_values("look")["rci_hi"] - df.sort_values("look")["rci_lo"]).tolist()
    assert all(a >= b - 1e-12 for a, b in zip(w, w[1:]))


def test_aa_null_obf_no_looser_than_naive(spark, sf_dir):
    df = run("q700_aa_null_calibration", spark, sf_dir)
    # the boundary controls the rate, it does not forbid rejections —
    # but OBF can never reject where fixed-1.96 peeking would not
    # (every OBF bound >= 2.04 > 1.96)
    assert (df["obf_reject"] <= df["naive_reject"]).all()
    assert df["obf_reject"].sum() <= df["naive_reject"].sum()


# --- mobility -------------------------------------------------------------------


def test_mobility_matrix_row_stochastic(spark, sf_dir):
    df = run("q701_mobility_matrix", spark, sf_dir)
    shares = df.groupby("band_from")["row_share"].sum()
    assert ((shares - 1.0).abs() < 1e-9).all()
    # all customers accounted for
    from flightdb_spark.tables import load_table
    n_cust = load_table(spark, sf_dir, "customer").count()
    assert df["n"].sum() == n_cust


def test_shorrocks_in_range(spark, sf_dir):
    row = run("q702_shorrocks_index", spark, sf_dir).iloc[0]
    # M in [0, m/(m-1)]
    assert 0.0 <= row["shorrocks_m"] <= 6.0 / 5.0 + 1e-9
    assert abs(row["trace_p"] + 5.0 * row["shorrocks_m"] - 6.0) < 1e-6


def test_persistence_shares_partition(spark, sf_dir):
    df = run("q704_segment_persistence", spark, sf_dir)
    tot = df["stay_share"] + df["up_share"] + df["down_share"]
    assert ((tot - 1.0).abs() < 1e-9).all()


def test_destiny_bands_in_range(spark, sf_dir):
    df = run("q705_origin_destiny", spark, sf_dir)
    assert ((df["expected_band_to"] >= 0) & (df["expected_band_to"] <= 5)).all()


# --- panel econometrics ---------------------------------------------------------


def test_panel_identity_holds(spark, sf_dir):
    row = run("q708_hausman_contrast", spark, sf_dir).iloc[0]
    assert row["identity_residual"] == 0.0
    assert bool(row["identity_holds"])


def test_panel_slopes_positive(spark, sf_dir):
    row = run("q706_panel_estimators", spark, sf_dir).iloc[0]
    # more orders -> more revenue, in every estimator, on this data
    assert row["pooled_dollars_per_order"] > 0
    assert row["within_dollars_per_order"] > 0
    assert row["between_dollars_per_order"] > 0


def test_variance_shares_unit_interval(spark, sf_dir):
    row = run("q709_variance_decomposition", spark, sf_dir).iloc[0]
    assert 0.0 <= row["x_within_share"] <= 1.0
    assert 0.0 <= row["y_within_share"] <= 1.0


# --- fluctuation scaling --------------------------------------------------------


def test_taylor_exponent_sane(spark, sf_dir):
    row = run("q711_taylor_law", spark, sf_dir).iloc[0]
    assert row["n_parts"] > 0
    assert 0.0 < row["taylor_exponent"] < 3.0


def test_dispersion_census_classes(spark, sf_dir):
    df = run("q712_dispersion_census", spark, sf_dir)
    assert set(df["klass"]) <= {"overdispersed", "underdispersed", "poisson_like"}
    assert (df["avg_dispersion"] > 0).all()


def test_aggregation_ratio_positive(spark, sf_dir):
    row = run("q713_aggregation_scaling", spark, sf_dir).iloc[0]
    assert row["avg_scaling_ratio"] > 0
    assert row["n_positively_corr"] + row["n_negatively_corr"] <= row["n_parts"]


def test_taylor_outliers_sorted(spark, sf_dir):
    df = run("q714_taylor_outliers", spark, sf_dir)
    r = df["residual"].abs().tolist()
    assert all(a >= b - 1e-9 for a, b in zip(r, r[1:]))


# --- meta-analysis ---------------------------------------------------------------


def test_forest_weights_and_cis(spark, sf_dir):
    df = run("q716_forest_table", spark, sf_dir)
    assert (df["iv_weight"] > 0).all()
    assert (df["ci_lo"] <= df["odds_ratio"] + 1e-9).all()
    assert (df["ci_hi"] >= df["odds_ratio"] - 1e-9).all()


def test_pooled_within_study_range(spark, sf_dir):
    forest = run("q716_forest_table", spark, sf_dir)
    pooled = run("q717_fixed_effect_pooled", spark, sf_dir).iloc[0]
    assert forest["log_or"].min() - 1e-9 <= pooled["pooled_log_or"]
    assert pooled["pooled_log_or"] <= forest["log_or"].max() + 1e-9


def test_heterogeneity_nonnegative(spark, sf_dir):
    row = run("q718_heterogeneity", spark, sf_dir).iloc[0]
    assert row["cochran_q"] >= -1e-9
    assert 0.0 <= row["i_squared"] <= 1.0
    assert row["dl_tau_squared"] >= 0.0


def test_random_effects_se_wider(spark, sf_dir):
    fe = run("q717_fixed_effect_pooled", spark, sf_dir).iloc[0]
    re = run("q719_random_effects_pooled", spark, sf_dir).iloc[0]
    assert re["re_pooled_se"] >= fe["pooled_se"] - 1e-9


def test_loo_influences_sum_direction(spark, sf_dir):
    df = run("q720_leave_one_out", spark, sf_dir)
    assert len(df) == 7
    assert (df["pooled_full"] == df["pooled_full"].iloc[0]).all()


# --- capital budgeting -----------------------------------------------------------


def test_npv_monotone_in_rate(spark, sf_dir):
    df = run("q721_npv_census", spark, sf_dir).sort_values("rate_pct")
    npv = df["total_npv_dollars"].tolist()
    assert all(a >= b for a, b in zip(npv, npv[1:]))
    pos = df["n_positive"].tolist()
    assert all(a >= b for a, b in zip(pos, pos[1:]))


def test_irr_bracket_consistent(spark, sf_dir):
    df = run("q722_irr_bracket", spark, sf_dir)
    assert (df["npv_at_0"] >= df["npv_at_60"] - 1e-6).all()
    assert (df["irr_pct_floor"] >= -1).all()
    assert (df["irr_pct_floor"] <= 60).all()


def test_payback_discounted_no_earlier(spark, sf_dir):
    df = run("q723_payback_periods", spark, sf_dir)
    both = df.dropna()
    assert (both["discounted_payback_year"] >= both["payback_year"]).all()


def test_profitability_index_sorted(spark, sf_dir):
    df = run("q724_profitability_index", spark, sf_dir)
    pi = df["profitability_index"].tolist()
    assert all(a >= b - 1e-12 for a, b in zip(pi, pi[1:]))


def test_kendall_tau_bounds(spark, sf_dir):
    row = run("q725_ranking_stability", spark, sf_dir).iloc[0]
    assert -1.0 <= row["kendall_tau_a"] <= 1.0
    assert row["n_pairs"] == 300


# --- social choice ---------------------------------------------------------------


def test_condorcet_matrix_complete(spark, sf_dir):
    df = run("q726_condorcet_matrix", spark, sf_dir)
    assert len(df) == 10
    n_voters = (df["prefers_a"] + df["prefers_b"]).unique()
    assert len(n_voters) == 1  # every pair decided by every ballot


def test_copeland_scores_sum(spark, sf_dir):
    df = run("q727_copeland_borda", spark, sf_dir)
    assert len(df) == 5
    # 10 duels, each won by at most one side
    assert df["copeland_score"].sum() <= 10
    assert (df["is_condorcet_winner"].sum()) <= 1


def test_irv_round_structure(spark, sf_dir):
    df = run("q728_irv_rounds", spark, sf_dir)
    by_round = df.groupby("round").agg(n=("brand", "count"), v=("votes", "sum"))
    # candidate count drops by one per round; total votes conserved
    assert by_round["n"].tolist() == [5, 4, 3, 2]
    assert (by_round["v"] == by_round["v"].iloc[0]).all()


def test_rule_disagreement_bounds(spark, sf_dir):
    row = run("q729_rule_disagreement", spark, sf_dir).iloc[0]
    assert row["n_pairs"] == 10
    assert 0.0 <= row["normalized_kendall_distance"] <= 1.0


def test_approval_bounded_by_voters(spark, sf_dir):
    df = run("q730_approval_vs_plurality", spark, sf_dir)
    assert len(df) == 5
    assert (df["approval_share"] <= 1.0 + 1e-12).all()
    assert df["firsts"].sum() == 25  # every nation has a first choice


# --- portfolio (q731-q735) --------------------------------------------------


def test_return_moments_consistent(spark, sf_dir):
    df = run("q731_brand_return_moments", spark, sf_dir)
    assert (df["var_return"] >= -1e-15).all()
    assert ((df["volatility"] ** 2 - df["var_return"]).abs() < 1e-9).all()
    assert (df["n_returns"] >= 2).all()


def test_correlation_bounded(spark, sf_dir):
    df = run("q732_return_covariance", spark, sf_dir)
    assert len(df) == 10  # C(5,2) pairs
    assert (df["correlation"].abs() <= 1.0 + 1e-9).all()


def test_min_variance_dominates(spark, sf_dir):
    import pandas as pd

    w = run("q733_min_variance_weights", spark, sf_dir)
    assert ((w["w_a"] + w["w_b"] - 1).abs() < 1e-12).all()
    # the min-variance portfolio never beats ZERO but always weakly
    # beats the less-volatile single asset
    assert (w["variance_reduction"] >= -1e-15).all()
    assert (w["min_portfolio_var"] >= -1e-15).all()


def test_sharpe_is_mean_over_vol(spark, sf_dir):
    df = run("q734_sharpe_ranking", spark, sf_dir)
    assert ((df["sharpe"] - df["mean_return"] / df["volatility"]).abs() < 1e-12).all()


def test_drawdown_bounds(spark, sf_dir):
    df = run("q735_max_drawdown", spark, sf_dir)
    assert (df["max_drawdown"] >= 0).all()
    assert (df["max_drawdown"] < 1.0).all()
    assert (df["trough_gap_cents"] >= 0).all()


# --- source coding (q736-q740) ----------------------------------------------


def test_shannon_len_vs_surprisal(spark, sf_dir):
    df = run("q736_symbol_census", spark, sf_dir)
    # ceil(surprisal) == shannon length (integer search == float log)
    assert (df["shannon_len_bits"] >= df["surprisal_bits"] - 1e-9).all()
    assert (df["shannon_len_bits"] < df["surprisal_bits"] + 1.0).all()


def test_huffman_merge_weights_nondecreasing(spark, sf_dir):
    df = run("q737_huffman_merge_trace", spark, sf_dir).sort_values("round")
    w = df["merged_weight"].tolist()
    assert all(a <= b for a, b in zip(w, w[1:])), w


def test_huffman_kraft_exact(spark, sf_dir):
    df = run("q738_huffman_codebook", spark, sf_dir)
    assert df["kraft_term_x16"].sum() == 16  # full binary tree
    assert (df["code_len_bits"] >= 1).all()
    assert (df["code_len_bits"] <= 4).all()


def test_huffman_within_one_bit_of_entropy(spark, sf_dir):
    row = run("q739_compression_summary", spark, sf_dir).iloc[0]
    assert row["entropy_bits_per_symbol"] - 1e-6 <= row["avg_code_len_bits"]
    assert row["avg_code_len_bits"] < row["entropy_bits_per_symbol"] + 1.0
    assert row["huffman_total_bits"] <= row["fixed_width_total_bits"]
    assert row["kraft_x16"] == 16


def test_brand_kraft_feasible(spark, sf_dir):
    df = run("q740_brand_shannon_census", spark, sf_dir)
    assert df["kraft_term_x1048576"].sum() <= 1 << 20  # prefix-code feasible


# --- FIFO costing (q741-q745) -----------------------------------------------


def test_fifo_match_bounds(spark, sf_dir):
    df = run("q742_fifo_match_census", spark, sf_dir)
    assert (df["matched_qty"] <= df[["in_qty", "out_qty"]].min(axis=1)).all()
    assert (df["unmet_demand"] >= 0).all()
    assert (df["leftover_supply"] >= 0).all()
    # FIFO exhausts supply or demand, never both left over
    both = (df["unmet_demand"] > 0) & (df["leftover_supply"] > 0)
    assert not both.any()


def test_fifo_inventory_equals_leftover(spark, sf_dir):
    census = run("q742_fifo_match_census", spark, sf_dir)
    inv = run("q744_ending_inventory", spark, sf_dir)
    # parts with no issues at all don't appear in the census (demand-
    # driven), so leftover is a lower bound on inventory
    assert inv["inventory_qty"].sum() >= census["leftover_supply"].sum()
    assert (inv["inventory_value_mc"] >= 0).all()


def test_fifo_cogs_matches_census(spark, sf_dir):
    census = run("q742_fifo_match_census", spark, sf_dir)
    cogs = run("q743_fifo_cogs", spark, sf_dir)
    assert cogs["sold_qty"].sum() == census["matched_qty"].sum()
    assert (cogs["cogs_mc"] > 0).all()


def test_holding_period_weighted_mean(spark, sf_dir):
    df = run("q745_holding_period", spark, sf_dir)
    got = df["qty_days"] / df["matched_qty"]
    assert ((got - df["avg_holding_days"]).abs() < 1e-9).all()


# --- item-item CF (q746-q750) ------------------------------------------------


def test_jaccard_bounds(spark, sf_dir):
    df = run("q746_brand_cooccurrence", spark, sf_dir)
    assert (df["jaccard"] >= 0).all() and (df["jaccard"] <= 1.0 + 1e-12).all()
    assert (df["users_both"] <= df[["users_a", "users_b"]].min(axis=1)).all()


def test_cosine_bounds_and_symmetry_free(spark, sf_dir):
    df = run("q747_item_cosine", spark, sf_dir)
    assert (df["cosine"] > 0).all()  # counts are nonnegative
    assert (df["cosine"] <= 1.0 + 1e-12).all()
    # upper triangle only
    assert (df["brand_a"] < df["brand_b"]).all()


def test_topk_neighbors_shape(spark, sf_dir):
    df = run("q748_topk_neighbors", spark, sf_dir)
    per = df.groupby("brand")["rank"].agg(["count", "max"])
    assert (per["count"] <= 3).all()
    # within each brand, cosine nonincreasing in rank
    for _, g in df.groupby("brand"):
        s = g.sort_values("rank")["cosine"].tolist()
        assert all(a >= b - 1e-12 for a, b in zip(s, s[1:]))


def test_recommendation_never_owned(spark, sf_dir):
    recs = run("q749_user_recommendation", spark, sf_dir)
    import duckdb

    owned = duckdb.sql(
        f"""SELECT DISTINCT o.o_custkey AS u, p.p_brand AS b
        FROM '{sf_dir}/lineitem.parquet' l
        JOIN '{sf_dir}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{sf_dir}/part.parquet' p ON p.p_partkey = l.l_partkey"""
    ).df()
    owned_set = set(zip(owned["u"], owned["b"]))
    hits = [
        (u, b)
        for u, b in zip(recs["custkey"], recs["recommended_brand"])
        if (u, b) in owned_set
    ]
    assert not hits, hits[:5]
    assert (recs["score"] > 0).all()


def test_recommendation_audit_shares(spark, sf_dir):
    df = run("q750_recommendation_audit", spark, sf_dir)
    assert abs(df["share"].sum() - 1.0) < 1e-9
    assert (df["catalog_coverage"] <= 1.0).all()


# --- supply chain (q751-q755) -------------------------------------------------


def test_bullwhip_consistent(spark, sf_dir):
    df = run("q751_bullwhip_index", spark, sf_dir)
    assert (df["order_cv2_scaled"] >= 0).all()
    assert (df["ship_cv2_scaled"] > 0).all()
    got = df["order_cv2_scaled"] / df["ship_cv2_scaled"]
    assert ((got - df["bullwhip_index"]).abs() < 1e-9).all()


def test_order_gaps_nonnegative(spark, sf_dir):
    df = run("q752_order_batching", spark, sf_dir)
    assert (df["mean_gap_days"] > 0).all()
    assert (df["gap_var_biased"] >= -1e-9).all()
    assert (df["max_gap_days"] * df["n_gaps"] >= df["span_days"]).all()


def test_safety_stock_formula(spark, sf_dir):
    import math

    df = run("q753_safety_stock", spark, sf_dir)
    want = 1.645 * df["std_daily_qty"] * math.sqrt(7)
    assert ((want - df["safety_stock"]).abs() < 1e-9).all()
    assert (
        (df["reorder_point"] - 7 * df["mean_daily_qty"] - df["safety_stock"]).abs()
        < 1e-9
    ).all()


def test_fill_rates_monotone(spark, sf_dir):
    df = run("q754_service_level", spark, sf_dir)
    assert (df["fill_30d"] <= df["fill_60d"] + 1e-12).all()
    assert (df["fill_60d"] <= df["fill_90d"] + 1e-12).all()
    assert (df["fill_90d"] <= 1.0 + 1e-12).all()


def test_leadtime_demand_two_moment(spark, sf_dir):
    df = run("q755_leadtime_demand", spark, sf_dir)
    want_mean = df["mean_lead_days"] * df["mean_daily_demand"]
    assert ((want_mean - df["mean_leadtime_demand"]).abs() < 1e-9).all()
    want_var = (
        df["mean_lead_days"] * df["var_daily_demand"]
        + df["mean_daily_demand"] ** 2 * df["var_lead_days"]
    )
    assert ((want_var - df["var_leadtime_demand"]).abs() < 1e-6).all()


# --- queue replay (q756-q760) -------------------------------------------------


def test_lindley_waits_sane(spark, sf_dir):
    df = run("q756_lindley_waits", spark, sf_dir)
    assert (df["mean_wait_us"] >= 0).all()
    assert (df["max_wait_us"] >= df["mean_wait_us"] - 1e-9).all()
    assert (df["share_waited"] <= 1.0).all()


def test_busy_periods_conserve_arrivals(spark, sf_dir):
    waits = run("q756_lindley_waits", spark, sf_dir).set_index("queue")
    per = run("q757_busy_periods", spark, sf_dir).set_index("queue")
    assert (per["n_arrivals"] == waits["n_arrivals"]).all()
    assert (per["max_period_len"] >= per["mean_period_len"] - 1e-9).all()


def test_kingman_same_ballpark(spark, sf_dir):
    df = run("q758_kingman_check", spark, sf_dir)
    assert (df["rho"] > 0).all()
    # heavy-traffic approximation: same order of magnitude when rho<1
    stable = df[df["rho"] < 1]
    if len(stable):
        ratio = stable["kingman_wait_us"] / stable["mean_wait_us"].clip(lower=1)
        assert (ratio > 0).all()


def test_wait_by_hour_bounded(spark, sf_dir):
    df = run("q759_wait_by_hour", spark, sf_dir)
    assert df["hr"].between(0, 23).all()
    assert (df["mean_wait_us"] >= 0).all()


def test_little_law_agreement(spark, sf_dir):
    df = run("q760_little_check", spark, sf_dir)
    # L measured at arrivals vs lambda*(W+S): same scale (PASTA-ish)
    ratio = (df["mean_in_system_at_arrival"] + 0.01) / (df["littles_l"] + 0.01)
    assert ((ratio > 0.2) & (ratio < 5.0)).all(), ratio.tolist()


# --- hedonic pricing (q761-q765) -----------------------------------------------


def test_hedonic_slopes_finite(spark, sf_dir):
    import numpy as np

    df = run("q761_size_premium", spark, sf_dir)
    assert np.isfinite(df["brand_slope"]).all()
    assert df["pooled_slope"].nunique() == 1


def test_hedonic_index_base_one(spark, sf_dir):
    df = run("q762_hedonic_index", spark, sf_dir).sort_values("month_idx")
    assert abs(df["hedonic_index"].iloc[0] - 1.0) < 1e-9
    assert (df["hedonic_index"] > 0).all()


def test_type_premium_weighted_zero(spark, sf_dir):
    df = run("q763_type_premium", spark, sf_dir)
    # frequency-weighted premiums sum to ~0 (deviations from grand mean)
    w = (df["premium_log"] * df["n_lines"]).sum() / df["n_lines"].sum()
    assert abs(w) < 1e-6


def test_variance_decomposition_shares(spark, sf_dir):
    row = run("q764_variance_decomposition", spark, sf_dir).iloc[0]
    assert row["ss_total"] > 0
    assert 0 <= row["cell_r2"] <= 1
    assert 0 <= row["within_size_r2"] <= 1
    assert abs(row["ss_within_cells"] + row["ss_between_cells"] - row["ss_total"]) < 1e-6 * row["ss_total"]


def test_slope_stability_columns(spark, sf_dir):
    df = run("q765_slope_stability", spark, sf_dir)
    got = (df["month_slope"] - df["pooled_slope"]).abs()
    assert ((got - df["abs_deviation"]).abs() < 1e-12).all()


# --- empirical copula (q766-q770) -----------------------------------------------


def test_margins_cdf_monotone(spark, sf_dir):
    df = run("q766_copula_margins", spark, sf_dir)
    for _, g in df.groupby("variable"):
        e = g.sort_values("value")["ecdf"].tolist()
        assert all(a < b + 1e-12 for a, b in zip(e, e[1:]))
        assert abs(e[-1] - 1.0) < 1e-12


def test_copula_frechet_bounds(spark, sf_dir):
    df = run("q767_copula_lattice", spark, sf_dir)
    import numpy as np

    lower = np.maximum(df["u"] + df["v"] - 1, 0)
    upper = np.minimum(df["u"], df["v"])
    assert (df["copula_c"] >= lower - 1e-12).all()
    assert (df["copula_c"] <= upper + 1e-12).all()


def test_blomqvist_bounded(spark, sf_dir):
    row = run("q768_blomqvist_beta", spark, sf_dir).iloc[0]
    assert -1 <= row["blomqvist_beta"] <= 1


def test_sw_sigma_near_zero_for_independents(spark, sf_dir):
    row = run("q769_schweizer_wolff", spark, sf_dir).iloc[0]
    assert row["sw_sigma_lattice"] >= 0
    # quantity and discount are generated independently -> small sigma
    assert row["sw_sigma_lattice"] < 0.2


def test_tail_concentration_bounds(spark, sf_dir):
    df = run("q770_tail_concentration", spark, sf_dir)
    assert (df["lower_tail_l"] >= -1e-12).all()
    assert (df["upper_tail_r"] >= -1e-12).all()
    assert (df["c_qq"] <= 1.0).all()


# --- lexical growth (q771-q775) --------------------------------------------------


def test_heaps_curve_monotone(spark, sf_dir):
    df = run("q771_heaps_curve", spark, sf_dir).sort_values("step")
    for col in ("n_docs", "n_tokens", "vocab"):
        v = df[col].tolist()
        assert all(a <= b for a, b in zip(v, v[1:])), (col, v)
    # vocabulary grows sublinearly: TTR nonincreasing after the start
    ttr = df["type_token_ratio"].tolist()
    assert ttr[-1] <= ttr[0] + 1e-12


def test_heaps_beta_sublinear(spark, sf_dir):
    row = run("q772_heaps_fit", spark, sf_dir).iloc[0]
    assert 0 < row["heaps_beta"] < 1.2
    assert row["heaps_k"] > 0


def test_spectrum_and_gt(spark, sf_dir):
    df = run("q773_freq_spectrum", spark, sf_dir)
    assert (df["n_types_at_freq"] > 0).all()
    assert (df["gt_adjusted_count"] >= 0).all()


def test_zipf_spectrum_slope_finite(spark, sf_dir):
    import numpy as np

    row = run("q774_zipf_spectrum_fit", spark, sf_dir).iloc[0]
    # the synthetic corpus is NOT Zipfian (concentrated bigram counts,
    # few hapaxes), so only the estimator mechanics are asserted here
    assert np.isfinite(row["spectrum_slope"])
    assert row["n_spectrum_points"] > 2
    assert 0 <= row["gt_unseen_mass"] <= 1
    assert 0 <= row["hapax_type_share"] <= 1


def test_language_profiles(spark, sf_dir):
    df = run("q775_language_lexical_profile", spark, sf_dir)
    assert (df["n_types"] <= df["n_tokens"]).all()
    assert (df["herdan_c"] <= 1.0 + 1e-9).all()
    assert (df["hapax_share"] <= 1.0).all()


# --- Bass diffusion (q776-q780) ----------------------------------------------------


def test_adoption_curve_saturates(spark, sf_dir):
    df = run("q776_adoption_curve", spark, sf_dir).sort_values("month_idx")
    base = df["installed_base"].tolist()
    assert all(a < b or a == b for a, b in zip(base, base[1:]))
    assert abs(df["penetration"].iloc[-1] - 1.0) < 1e-12  # everyone adopts
    assert df["new_adopters"].sum() == df["installed_base"].iloc[-1]


def test_bass_grid_sorted_and_positive(spark, sf_dir):
    df = run("q777_bass_grid_fit", spark, sf_dir)
    sse = df["sse"].tolist()
    assert all(a <= b + 1e-12 for a, b in zip(sse, sse[1:]))
    assert (df["p"] > 0).all() and (df["q"] > 0).all()


def test_bass_residuals_identity(spark, sf_dir):
    df = run("q778_bass_residuals", spark, sf_dir)
    assert ((df["observed"] - df["predicted"] - df["residual"]).abs() < 1e-9).all()


def test_bass_peak_positive(spark, sf_dir):
    row = run("q779_bass_peak", spark, sf_dir).iloc[0]
    assert row["bass_peak_time_months"] > 0
    assert row["bass_peak_adopters"] > 0
    assert row["observed_peak_adopters"] > 0


def test_innovation_share_decays(spark, sf_dir):
    df = run("q780_innovation_split", spark, sf_dir).sort_values("month_idx")
    s = df["innovation_share"].tolist()
    assert all(a >= b - 1e-12 for a, b in zip(s, s[1:])), s[:5]
    assert (df["innovators_pred"] >= 0).all()
    assert (df["imitators_pred"] >= 0).all()


# --- aggregation paradoxes (q781-q785) -----------------------------------------------


def test_simpson_screen_shape(spark, sf_dir):
    row = run("q781_simpson_screen", spark, sf_dir).iloc[0]
    assert row["n_brands"] == 25
    assert 0 <= row["brands_sign_opposed"] <= 25
    assert row["simpson_reversal"] in (0, 1)


def test_weighting_reversal_bounds(spark, sf_dir):
    row = run("q782_weighting_reversal", spark, sf_dir).iloc[0]
    assert row["n_pairs"] == 300
    assert 0 <= row["normalized_kendall_distance"] <= 1


def test_ecological_amplification(spark, sf_dir):
    row = run("q783_ecological_corr", spark, sf_dir).iloc[0]
    assert abs(row["row_level_corr"]) <= 1 + 1e-12
    assert abs(row["brand_level_corr"]) <= 1 + 1e-12
    # size and price are independent in the synthetic data, so both
    # correlations sit near zero — the audit only asserts bounds here


def test_berkson_negative_dependence(spark, sf_dir):
    df = run("q784_berkson_selection", spark, sf_dir).set_index("selected_stratum")
    # overall covariance near zero (independent generators)
    assert abs(df.loc[1, "cov_overall"]) < 5.0
    # inside the selected stratum the covariance is pushed negative
    assert df.loc[1, "cov_qty_disc"] < df.loc[1, "cov_overall"]


def test_mix_shift_identity(spark, sf_dir):
    row = run("q785_mix_shift", spark, sf_dir).iloc[0]
    assert abs(row["decomposition_residual"]) < 0.1  # milli-unit quantization
    got = row["within_brand_change_mc"] + row["mix_shift_change_mc"]
    assert abs(got - row["total_change_mc"]) < 0.1


# --- record statistics (q786-q790) ----------------------------------------------


def test_record_census_basics(spark, sf_dir):
    df = run("q786_record_census", spark, sf_dir)
    assert (df["n_records"] >= 1).all()  # first event is a record
    assert (df["n_records"] <= df["seq_len"]).all()
    assert (df["harmonic_expectation"] >= 1 - 1e-9).all()


def test_record_population_consistency(spark, sf_dir):
    row = run("q787_record_population", spark, sf_dir).iloc[0]
    assert row["mean_records"] >= 1
    assert row["iid_variance"] >= 0
    assert 0 <= row["share_above_expectation"] <= 1


def test_record_spacing_grows(spark, sf_dir):
    df = run("q788_record_spacing", spark, sf_dir).sort_values("record_number")
    # users reaching record k+1 never exceed users reaching record k
    n = df["n_users_reaching"].tolist()
    assert all(a >= b for a, b in zip(n, n[1:]))
    assert (df["mean_gap"] >= 1).all()


def test_record_symmetry_totals(spark, sf_dir):
    row = run("q789_record_symmetry", spark, sf_dir).iloc[0]
    assert row["total_forward_records"] >= row["n_users"]
    assert row["total_backward_records"] >= row["n_users"]
    assert abs(row["sign_balance"]) <= row["n_users"]


def test_record_magnitudes_positive(spark, sf_dir):
    df = run("q790_record_magnitudes", spark, sf_dir)
    assert (df["total_jump_cents"] > 0).all()
    assert (df["mean_jump_ratio"] > 1).all()  # records strictly improve


# --- CRR real options (q791-q795) -------------------------------------------------


def test_crr_price_monotone_in_vol(spark, sf_dir):
    df = run("q791_crr_price_table", spark, sf_dir)
    for _, g in df.groupby("brand"):
        s = g.sort_values("vol_pct_per_step")["call_cents"].tolist()
        assert all(a <= b for a, b in zip(s, s[1:])), s
    assert (df["call_cents"] >= 0).all()
    assert (df["put_cents"] >= 0).all()


def test_put_call_parity_within_quantization(spark, sf_dir):
    df = run("q792_put_call_parity", spark, sf_dir)
    assert (df["parity_residual"].abs() <= 13).all()  # 13 cent-rounded nodes


def test_crr_delta_bounds(spark, sf_dir):
    df = run("q793_crr_delta", spark, sf_dir)
    assert (df["call_delta"] >= -1e-9).all()
    assert (df["call_delta"] <= 1 + 1e-9).all()


def test_implied_scenario_recovers_reference(spark, sf_dir):
    df = run("q794_implied_scenario", spark, sf_dir)
    assert (df["implied_vol_pct"] == 15).all()
    assert (df["abs_repricing_error_cents"] == 0).all()


def test_time_value_nonnegative_and_monotone(spark, sf_dir):
    df = run("q795_option_value_split", spark, sf_dir)
    assert (df["time_value_cents"] >= 0).all()
    assert (df["intrinsic_cents"] == 0).all()  # 5% OTM strikes
    for _, g in df.groupby("brand"):
        s = g.sort_values("vol_pct_per_step")["time_value_cents"].tolist()
        assert all(a <= b for a, b in zip(s, s[1:]))


# --- stable matching (q796-q800) ----------------------------------------------------


def test_preference_ranks_complete(spark, sf_dir):
    df = run("q796_matching_preferences", spark, sf_dir)
    assert len(df) == 25
    for _, g in df.groupby("brand"):
        assert sorted(g["brand_rank_of_region"]) == [1, 2, 3, 4, 5]
    for _, g in df.groupby("region"):
        assert sorted(g["region_rank_of_brand"]) == [1, 2, 3, 4, 5]


def test_stable_matching_no_blocking_pairs(spark, sf_dir):
    prefs = run("q796_matching_preferences", spark, sf_dir)
    match = run("q797_stable_matching", spark, sf_dir)
    assert len(match) == 5
    assert match["region"].nunique() == 5  # perfect matching
    # independent blocking-pair re-verification in pandas
    brk = {(r.brand, r.region): r.brand_rank_of_region for r in prefs.itertuples()}
    rrk = {(r.brand, r.region): r.region_rank_of_brand for r in prefs.itertuples()}
    mb = dict(zip(match["brand"], match["region"]))
    mr = dict(zip(match["region"], match["brand"]))
    blocking = [
        (b, r)
        for (b, r) in brk
        if brk[(b, r)] < brk[(b, mb[b])] and rrk[(b, r)] < rrk[(mr[r], r)]
    ]
    assert not blocking, blocking


def test_stable_set_census_sane(spark, sf_dir):
    row = run("q798_stable_set_census", spark, sf_dir).iloc[0]
    assert row["n_stable"] >= 1  # Gale-Shapley existence
    assert row["brand_optimal_rank_sum"] <= row["region_optimal_rank_sum"] + 25
    if row["n_stable"] == 1:
        assert row["is_unique"] == 1


def test_greedy_weakly_worse(spark, sf_dir):
    row = run("q799_greedy_instability", spark, sf_dir).iloc[0]
    assert row["greedy_blocking_pairs"] >= 0
    assert row["stable_blocking_pairs"] == 0
    assert row["greedy_brand_rank_sum"] >= 5  # rank sums are >= n


def test_price_of_stability_bounds(spark, sf_dir):
    row = run("q800_price_of_stability", spark, sf_dir).iloc[0]
    assert row["stability_cost_cents"] >= 0
    assert 0 < row["stable_efficiency"] <= 1.0


# --- reliability growth (q801-q805) -----------------------------------------------


def test_duane_points_monotone(spark, sf_dir):
    df = run("q801_duane_points", spark, sf_dir).sort_values("cutoff_idx")
    n = df["cum_failures"].tolist()
    assert all(a <= b for a, b in zip(n, n[1:]))
    assert (df["t_hours"] > 0).all()


def test_crow_amsaa_beta_band(spark, sf_dir):
    row = run("q802_crow_amsaa_fit", spark, sf_dir).iloc[0]
    # synthetic arrivals are roughly homogeneous Poisson -> beta near 1
    assert 0.5 < row["beta"] < 1.5
    assert row["verdict"] in ("improving", "deteriorating", "stable")


def test_mtbf_projection_consistent(spark, sf_dir):
    row = run("q803_mtbf_projection", spark, sf_dir).iloc[0]
    assert row["cum_mtbf_hours"] > 0
    got = row["cum_mtbf_hours"] / row["beta"]
    assert abs(got - row["inst_mtbf_hours"]) < 1e-9


def test_per_type_growth_covers_all_types(spark, sf_dir):
    df = run("q804_per_type_growth", spark, sf_dir)
    assert len(df) == 5


def test_duane_residuals_sum_zero(spark, sf_dir):
    df = run("q805_duane_residuals", spark, sf_dir)
    # OLS residuals sum to ~0 (quantization leaves micro-scale slack)
    assert abs(df["log_residual"].sum()) < 1e-3


# --- quantile sketch (q806-q810) ------------------------------------------------------


def test_histogram_cumulative_consistent(spark, sf_dir):
    df = run("q806_value_histogram", spark, sf_dir).sort_values("bucket")
    assert (df["cnt"].cumsum() == df["cum_cnt"]).all()
    assert abs(df["cum_share"].iloc[-1] - 1.0) < 1e-12


def test_exact_quantiles_monotone(spark, sf_dir):
    df = run("q807_exact_quantiles", spark, sf_dir).sort_values("pct")
    q = df["exact_quantile_cents"].tolist()
    assert all(a <= b for a, b in zip(q, q[1:]))


def test_exact_quantiles_match_numpy(spark, sf_dir):
    import duckdb

    df = run("q807_exact_quantiles", spark, sf_dir)
    vals = duckdb.sql(
        f"SELECT CAST(FLOOR(value*100+0.5) AS BIGINT) c FROM '{sf_dir}/events.parquet' ORDER BY 1"
    ).df()["c"].tolist()
    n = len(vals)
    for r in df.itertuples():
        rank = -(-r.pct * n // 100)  # ceil
        assert vals[int(rank) - 1] == r.exact_quantile_cents, (r.pct, rank)


def test_sketch_error_within_bound(spark, sf_dir):
    hist = run("q806_value_histogram", spark, sf_dir)
    err = run("q808_sketch_error", spark, sf_dir)
    bound = hist["mass_share"].max()
    assert (err["rank_error"].abs() <= bound + 1e-12).all()
    assert (err["value_error_cents"] >= 0).all()
    assert (err["value_error_cents"] < 256).all()


def test_budget_sweep_monotone(spark, sf_dir):
    df = run("q809_sketch_budget_sweep", spark, sf_dir).sort_values(
        "bucket_width_cents", ascending=False
    )
    b = df["worst_rank_error_bound"].tolist()
    assert all(a >= x for a, x in zip(b, b[1:]))  # finer buckets tighter
    n = df["n_buckets"].tolist()
    assert all(a <= x for a, x in zip(n, n[1:]))


def test_sketch_merge_exact(spark, sf_dir):
    row = run("q810_sketch_mergeability", spark, sf_dir).iloc[0]
    assert row["mismatched_buckets"] == 0
    assert row["merged_total"] == row["global_total"]


# --- Markov attribution (q811-q815) ----------------------------------------------------


def test_transition_probs_rowsum_one(spark, sf_dir):
    df = run("q811_journey_transitions", spark, sf_dir)
    sums = df.groupby("from_state")["prob"].sum()
    assert ((sums - 1.0).abs() < 1e-6).all(), sums.to_dict()


def test_removal_only_lowers_absorption(spark, sf_dir):
    df = run("q812_absorption_probability", spark, sf_dir).set_index("variant")
    full = df.loc["none", "p_convert_from_start"]
    assert 0 < full <= 1
    for v in df.index:
        if v != "none":
            assert df.loc[v, "p_convert_from_start"] <= full + 1e-9


def test_markov_shares_sum_one(spark, sf_dir):
    df = run("q813_removal_attribution", spark, sf_dir)
    assert abs(df["markov_share"].sum() - 1.0) < 1e-9
    assert (df["removal_effect"] >= -1e-12).all()


def test_attribution_models_columns_sum_one(spark, sf_dir):
    df = run("q814_attribution_models", spark, sf_dir)
    for col in ("first_touch", "last_touch", "linear_touch", "markov"):
        assert abs(df[col].sum() - 1.0) < 1e-6, col


def test_journey_patterns_rates(spark, sf_dir):
    df = run("q815_journey_patterns", spark, sf_dir)
    assert (df["conversion_rate"] >= 0).all()
    assert (df["conversion_rate"] <= 1).all()
    assert (df["n_converted"] <= df["n_users"]).all()


# --- network robustness (q816-q820) ------------------------------------------------


def test_graph_census_consistent(spark, sf_dir):
    df = run("q816_copurchase_graph", spark, sf_dir)
    assert len(df) == 25
    assert (df["degree"] >= 0).all()
    # handshake: degree sum = 2 * edges
    assert df["degree"].sum() == 2 * df["n_edges"].iloc[0]
    assert 0 <= df["density"].iloc[0] <= 1


def test_modularity_bounds(spark, sf_dir):
    df = run("q817_modularity", spark, sf_dir)
    q = df["modularity_term"].sum()
    assert -0.5 - 1e-9 <= q <= 1.0 + 1e-9
    assert (df["within_edges"] >= 0).all()


def test_conductance_bounds(spark, sf_dir):
    df = run("q818_conductance", spark, sf_dir)
    assert (df["conductance"] >= -1e-12).all()
    assert (df["conductance"] <= 1.0 + 1e-12).all()


def test_percolation_monotone(spark, sf_dir):
    df = run("q819_attack_percolation", spark, sf_dir).sort_values("hubs_removed")
    g = df["largest_component"].tolist()
    assert all(a >= b for a, b in zip(g, g[1:]))  # removals can't grow the giant
    assert (df["n_alive"] == 25 - df["hubs_removed"]).all()
    assert (df["giant_share"] <= 1.0 + 1e-12).all()


def test_attack_at_least_as_damaging(spark, sf_dir):
    df = run("q820_attack_vs_random", spark, sf_dir)
    assert (df["robustness_gap"] >= 0).all()
    assert df.loc[df["n_removed"] == 0, "robustness_gap"].iloc[0] == 0


# --- scheduling (q821-q825) --------------------------------------------------------


def test_spt_optimal_for_flow(spark, sf_dir):
    df = run("q821_spt_vs_fifo", spark, sf_dir).set_index("rule")
    assert df.loc["spt", "total_flow"] <= df.loc["fifo", "total_flow"]
    # makespan is sequence-invariant (sum of processing times)
    assert df.loc["spt", "makespan"] == df.loc["fifo", "makespan"]


def test_edd_optimal_for_max_lateness(spark, sf_dir):
    df = run("q822_edd_lateness", spark, sf_dir).set_index("rule")
    assert df.loc["edd", "max_lateness"] <= df.loc["fifo", "max_lateness"]
    assert df.loc["edd", "n_jobs"] == df.loc["fifo", "n_jobs"]


def test_wspt_optimal_for_weighted_flow(spark, sf_dir):
    df = run("q823_wspt_weighted_flow", spark, sf_dir).set_index("rule")
    assert df.loc["wspt", "weighted_flow"] <= df.loc["spt", "weighted_flow"]


def test_johnson_never_worse(spark, sf_dir):
    row = run("q824_johnson_flowshop", spark, sf_dir).iloc[0]
    assert row["machines_johnson_worse"] == 0
    assert row["total_saving"] >= 0


def test_johnson_idle_never_larger(spark, sf_dir):
    df = run("q825_flowshop_idle", spark, sf_dir).set_index("rule")
    assert df.loc["johnson", "total_idle_m2"] <= df.loc["fifo", "total_idle_m2"]
    assert (df["total_idle_m2"] >= 0).all()


# --- Kalman filter (q826-q830) -------------------------------------------------------


def test_kalman_trace_matches_sequential(spark, sf_dir):
    # re-run the textbook sequential recurrence in Python and compare
    df = run("q826_kalman_trace", spark, sf_dir)
    from flightdb_spark.queries.kalman import _gain_schedule

    gains = {t: k for t, k, g, c, pp in _gain_schedule()}
    for et, g in df.groupby("event_type"):
        g = g.sort_values("step")
        x = 0.0
        for r in g.itertuples():
            k = gains[r.step]
            x = (1 - k) * x + k * r.z_cents
            assert abs(x - r.filtered_cents) < 1e-3 * max(1.0, abs(x)), (
                et, r.step, x, r.filtered_cents)


def test_innovation_whiteness_bounds(spark, sf_dir):
    df = run("q827_innovation_whiteness", spark, sf_dir)
    assert (df["var_innovation"] >= 0).all()
    assert (df["lag1_autocorr"].abs() <= 1.0 + 1e-9).all()


def test_gain_schedule_decays(spark, sf_dir):
    df = run("q828_gain_schedule", spark, sf_dir).sort_values("step")
    gaps = df["gap_to_steady"].tolist()
    assert all(a >= b - 1e-15 for a, b in zip(gaps, gaps[1:]))
    assert (df["gain"] > 0).all() and (df["gain"] <= 1).all()


def test_kalman_vs_naive_sane(spark, sf_dir):
    df = run("q829_kalman_vs_naive", spark, sf_dir)
    assert (df["sse_kalman"] > 0).all()
    assert (df["sse_ratio"] > 0).all()
    # the filter should never be catastrophically worse than naive
    assert (df["sse_ratio"] < 10).all()


def test_coverage_in_unit_interval(spark, sf_dir):
    df = run("q830_innovation_coverage", spark, sf_dir)
    assert (df["coverage"] >= 0).all() and (df["coverage"] <= 1).all()
    assert (df["nominal"] == 0.95).all()


# --- optimal stopping (q831-q835) -----------------------------------------------------


def test_secretary_success_band(spark, sf_dir):
    row = run("q831_secretary_replay", spark, sf_dir).iloc[0]
    assert 0 < row["success_rate"] <= 1
    assert abs(row["asymptotic_rate"] - 0.36788) < 1e-9


def test_observation_sweep_shape(spark, sf_dir):
    df = run("q832_observation_sweep", spark, sf_dir)
    assert len(df) == 6
    assert (df["success_rate"] > 0).all()
    assert (df["success_rate"] <= 1).all()


def test_prophet_bound_holds(spark, sf_dir):
    row = run("q833_prophet_inequality", spark, sf_dir).iloc[0]
    # classic guarantee is 1/2; allow finite-sample slack
    assert row["capture_ratio"] > 0.45
    assert row["mean_rule_value"] <= row["mean_prophet_value"] + 1e-9


def test_pick_rank_starts_at_one(spark, sf_dir):
    df = run("q834_pick_rank_distribution", spark, sf_dir).sort_values("pick_rank")
    assert df["pick_rank"].iloc[0] == 1
    assert (df["share"] <= 1).all()


def test_secretary_beats_take_last(spark, sf_dir):
    df = run("q835_stopping_regret", spark, sf_dir).set_index("rule")
    assert df.loc["secretary_1e", "hit_rate"] >= df.loc["take_last", "hit_rate"]
    assert (df["mean_relative_regret"] >= -1e-12).all()


# --- successive halving (q836-q840) ----------------------------------------------------


def test_arm_rewards_complete(spark, sf_dir):
    df = run("q836_arm_rewards", spark, sf_dir)
    assert df["phase"].between(1, 5).all()
    assert (df["phase_revenue_cents"] > 0).all()


def test_halving_trace_schedule(spark, sf_dir):
    df = run("q837_halving_trace", spark, sf_dir).sort_values("round")
    assert df["survivors_in"].tolist() == [25, 13, 7, 4, 2]
    assert df["survivors_out"].tolist() == [13, 7, 4, 2, 1]
    # cutoffs grow as cumulative revenue accumulates
    c = df["cutoff_cents"].tolist()
    assert all(a <= b for a, b in zip(c, c[1:]))


def test_halving_pick_is_full_horizon_best(spark, sf_dir):
    row = run("q838_halving_pick", spark, sf_dir).iloc[0]
    # round 5 ranks by FULL cumulative revenue, so the survivor IS the best
    assert row["found_best"] == 1
    assert row["picked_true_rank"] == 1
    assert row["picked_total_cents"] == row["best_total_cents"]


def test_halving_regret_never_worse(spark, sf_dir):
    df = run("q839_simple_regret", spark, sf_dir).set_index("rule")
    assert (
        df.loc["halving", "simple_regret_cents"]
        <= df.loc["phase1_leader", "simple_regret_cents"]
    )
    assert (df["relative_regret"] >= -1e-12).all()


def test_budget_ledger_adds_up(spark, sf_dir):
    df = run("q840_halving_budget", spark, sf_dir).sort_values("round")
    assert df["cells_this_round"].tolist() == [25, 13, 7, 4, 2]
    assert df["cells_cumulative"].iloc[-1] == 51
    assert (df["uniform_total_cells"] == 125).all()


# --- cross-price elasticity (q841-q845) --------------------------------------------------


def test_panel_demeaned(spark, sf_dir):
    df = run("q841_price_qty_panel", spark, sf_dir)
    by_brand = df.groupby("brand")[["demeaned_log_qty", "demeaned_log_price"]].sum()
    assert (by_brand.abs() < 1e-3).all().all()  # demeaned to micro grain


def test_elasticity_matrix_complete(spark, sf_dir):
    df = run("q842_elasticity_matrix", spark, sf_dir)
    assert len(df) == 25
    assert df["is_own"].sum() == 5
    import numpy as np

    assert np.isfinite(df["elasticity"]).all()


def test_substitution_census_partitions(spark, sf_dir):
    df = run("q843_substitution_census", spark, sf_dir)
    assert df["n_pairs"].sum() == 20


def test_symmetry_pairs(spark, sf_dir):
    df = run("q844_slutsky_symmetry", spark, sf_dir)
    assert len(df) == 10
    assert (df["abs_asymmetry"] >= 0).all()


def test_lerner_rule(spark, sf_dir):
    df = run("q845_lerner_markup", spark, sf_dir)
    assert len(df) == 5
    elastic = df[df["inelastic_flag"] == 0]
    assert (elastic["lerner_markup"] > 0).all()
    assert (elastic["lerner_markup"] < 1).all()
    assert df[df["inelastic_flag"] == 1]["lerner_markup"].isna().all()


# --- selection inference (q846-q850) -------------------------------------------------------


def test_tau_bounds(spark, sf_dir):
    row = run("q846_rank_stability", spark, sf_dir).iloc[0]
    assert row["n_pairs"] == 300
    assert -1 <= row["kendall_tau_a"] <= 1
    assert row["concordant"] + row["discordant"] <= 300


def test_winners_selected_rank(spark, sf_dir):
    row = run("q847_winners_curse", spark, sf_dir).iloc[0]
    assert row["n_winners"] == 5
    assert abs(row["mean_rank_h1"] - 3.0) < 1e-12  # ranks 1..5 by selection
    assert row["mean_rank_h2"] >= 1.0


def test_rtm_slope_and_corr_consistent(spark, sf_dir):
    row = run("q848_rtm_slope", spark, sf_dir).iloc[0]
    assert -1 <= row["half_correlation"] <= 1
    # same sign by construction
    assert row["rtm_slope"] * row["half_correlation"] >= -1e-12


def test_shrinkage_never_loses_in_sample(spark, sf_dir):
    row = run("q849_shrinkage_forecast", spark, sf_dir).iloc[0]
    # OLS fit: SSE <= both baselines (unit-quantization slack)
    slack = 2 * 25  # +-0.5 unit per brand, squared interactions
    assert row["sse_shrunk"] <= row["sse_raw"] + slack
    assert row["sse_shrunk"] <= row["sse_grand_mean"] + slack


def test_repeat_champions_monotone_counts(spark, sf_dir):
    df = run("q850_repeat_champions", spark, sf_dir).sort_values("top_k")
    o = df["overlap"].tolist()
    assert all(a <= b for a, b in zip(o, o[1:]))
    assert (df["overlap"] <= df["top_k"]).all()


# --- adstock / MMM (q851-q855) -----------------------------------------------------------


def test_adstock_dominates_raw_clicks(spark, sf_dir):
    df = run("q851_adstock_series", spark, sf_dir)
    assert (df["adstocked_clicks"] >= 0).all()
    # higher lambda -> more carryover mass, day by day
    wide = df.pivot(index="day_idx", columns="lam", values="adstocked_clicks")
    assert (wide[0.7] >= wide[0.3] - 1e-6).all()


def test_adstock_regression_r2_bounds(spark, sf_dir):
    df = run("q852_adstock_regression", spark, sf_dir)
    assert len(df) == 3
    assert (df["r_squared"] >= -1e-12).all()
    assert (df["r_squared"] <= 1 + 1e-12).all()


def test_dose_response_quintiles(spark, sf_dir):
    df = run("q853_dose_response", spark, sf_dir).sort_values("quintile")
    assert df["quintile"].tolist() == [1, 2, 3, 4, 5]
    m = df["mean_adstock"].tolist()
    assert all(a <= b + 1e-9 for a, b in zip(m, m[1:]))  # binned by adstock


def test_lag_correlations_bounded(spark, sf_dir):
    df = run("q854_lag_correlations", spark, sf_dir)
    assert len(df) == 8
    assert (df["lag_correlation"].abs() <= 1 + 1e-12).all()


def test_half_life_table(spark, sf_dir):
    import math

    df = run("q855_carryover_half_life", spark, sf_dir).sort_values("lam")
    for r in df.itertuples():
        assert abs(r.half_life_days - math.log(0.5) / math.log(r.lam)) < 1e-9
        assert abs(r.window_weight_share - (1 - r.lam ** 8)) < 1e-9
    assert (df["window_weight_share"] > 0.93).all()


# --- psychometrics (q856-q860) -----------------------------------------------------------


def test_cronbach_alpha_bounds(spark, sf_dir):
    row = run("q856_cronbach_alpha", spark, sf_dir).iloc[0]
    assert row["cronbach_alpha"] <= 1.0 + 1e-12
    assert row["sum_item_variances"] > 0
    assert row["total_variance"] > 0


def test_item_total_corr_bounds(spark, sf_dir):
    df = run("q857_item_total_corr", spark, sf_dir)
    assert len(df) == 5
    assert (df["item_total_corr"].abs() <= 1 + 1e-12).all()


def test_alpha_if_deleted_consistent(spark, sf_dir):
    df = run("q858_alpha_if_deleted", spark, sf_dir)
    assert len(df) == 5
    assert df["alpha_full"].nunique() == 1
    assert ((df["alpha_without"] - df["alpha_full"] - df["alpha_gain"]).abs() < 1e-12).all()


def test_spearman_brown_steps_up(spark, sf_dir):
    row = run("q859_split_half", spark, sf_dir).iloc[0]
    r = row["split_half_corr"]
    assert abs(r) <= 1 + 1e-12
    if r > 0:
        assert row["spearman_brown"] >= r - 1e-12  # step-up for positive r


def test_interitem_matrix_consistent(spark, sf_dir):
    df = run("q860_interitem_matrix", spark, sf_dir)
    assert len(df) == 10
    assert (df["corr"].abs() <= 1 + 1e-12).all()
    assert abs(df["mean_r"].iloc[0] - df["corr"].mean()) < 1e-9


# --- capture-recapture (q861-q865) ---------------------------------------------------------


def test_lincoln_petersen_at_least_observed(spark, sf_dir):
    row = run("q861_lincoln_petersen", spark, sf_dir).iloc[0]
    assert row["n_recaptured"] <= min(row["n_marked_h1"], row["n_caught_h2"])
    assert row["lincoln_petersen"] >= row["n_recaptured"]
    assert row["chapman"] > 0


def test_schnabel_positive(spark, sf_dir):
    row = run("q862_schnabel", spark, sf_dir).iloc[0]
    assert row["total_recaptures"] > 0
    assert row["schnabel_estimate"] > 0


def test_population_by_type_ge_observed_recaptures(spark, sf_dir):
    df = run("q863_population_by_type", spark, sf_dir)
    assert len(df) == 5
    assert (df["chapman_population"] > 0).all()
    assert (df["n_recaptured"] <= df["n_observed"]).all()


def test_window_sensitivity_rows(spark, sf_dir):
    df = run("q864_window_sensitivity", spark, sf_dir)
    assert df["n_windows"].tolist() == [2, 3, 6]
    assert (df["chapman_estimate"] > 0).all()


def test_closure_shares(spark, sf_dir):
    row = run("q865_closure_audit", spark, sf_dir).iloc[0]
    assert 0 <= row["closure_violation_share"] <= 1
    assert row["only_early"] >= 0 and row["only_late"] >= 0


# --- L-moments (q866-q870) --------------------------------------------------------------


def test_rank_support_max_rank(spark, sf_dir):
    df = run("q866_rank_support_census", spark, sf_dir)
    assert (df["max_rank"] == df["n_rows"]).all()
    assert (df["n_distinct_values"] <= df["n_rows"]).all()


def test_pwm_ordering(spark, sf_dir):
    df = run("q867_pwm_table", spark, sf_dir)
    # b0 >= b1 >= b2 >= b3 for nonnegative data (weights shift mass up)
    assert (df["b0"] >= df["b1"] - 1e-9).all()
    assert (df["b1"] >= df["b2"] - 1e-9).all()
    assert (df["b2"] >= df["b3"] - 1e-9).all()


def test_lambda1_equals_mean(spark, sf_dir):
    df = run("q868_l_moments", spark, sf_dir)
    assert ((df["lambda1"] - df["direct_mean"]).abs() < 1e-3).all()
    assert (df["lambda2"] > 0).all()


def test_l_ratio_bounds(spark, sf_dir):
    df = run("q869_l_ratios", spark, sf_dir)
    assert (df["l_cv"] > 0).all() and (df["l_cv"] < 1).all()
    assert (df["tau3_l_skew"].abs() < 1).all()
    assert (df["tau4_l_kurt"].abs() < 1).all()
    # Hosking feasibility bound
    assert (df["tau4_l_kurt"] >= (5 * df["tau3_l_skew"] ** 2 - 1) / 4 - 1e-9).all()


def test_l_ratio_diagram_classification(spark, sf_dir):
    df = run("q870_l_ratio_diagram", spark, sf_dir)
    assert len(df) == 5
    assert set(df["nearest_distribution"]) <= {"uniform", "normal", "exponential"}
    assert (df["distance"] >= 0).all()


# --- composite indicators (q871-q875) -------------------------------------------------------


def test_indicator_normalization_bounds(spark, sf_dir):
    df = run("q871_indicator_table", spark, sf_dir)
    for c in ("norm_revenue", "norm_customers", "norm_consistency"):
        assert (df[c] >= -1e-9).all() and (df[c] <= 1 + 1e-9).all()
        assert abs(df[c].min()) < 1e-6 and abs(df[c].max() - 1) < 1e-6


def test_am_ge_gm(spark, sf_dir):
    df = run("q872_composite_scores", spark, sf_dir)
    # AM-GM inequality (floor-at-1 for zero pillars adds <= 1 micro-unit)
    assert (df["arithmetic_index"] >= df["geometric_index"] - 2e-6).all()


def test_weight_swing_bounds(spark, sf_dir):
    df = run("q873_weight_sensitivity", spark, sf_dir)
    assert (df["best_rank"] >= 1).all()
    assert (df["worst_rank"] <= 25).all()
    assert (df["rank_swing"] >= 0).all()


def test_normalization_distance_bounds(spark, sf_dir):
    row = run("q874_normalization_sensitivity", spark, sf_dir).iloc[0]
    assert row["n_pairs"] == 300
    assert 0 <= row["normalization_kendall_distance"] <= 1


def test_compensability_flags(spark, sf_dir):
    df = run("q875_compensability_census", spark, sf_dir)
    flagged = df[df["compensation_beneficiary"] == 1]
    assert (flagged["rank_penalty_under_gm"] >= 2).all()
    assert (df["weakest_pillar"] >= -1e-9).all()


# --- JL projection (q876-q880) --------------------------------------------------------------


def test_jl_norm_ratio_near_one(spark, sf_dir):
    df = run("q876_jl_norm_preservation", spark, sf_dir)
    assert len(df) == 3
    assert (df["mean_norm_ratio"] > 0.3).all()
    assert (df["mean_norm_ratio"] < 3.0).all()


def test_jl_distortion_shrinks_with_k(spark, sf_dir):
    df = run("q877_jl_distortion", spark, sf_dir).sort_values("k")
    spread = (df["max_ratio"] - df["min_ratio"]).tolist()
    assert spread[-1] <= spread[0] + 1e-9  # k=16 tighter than k=4
    assert (df["min_ratio"] >= 0).all()


def test_jl_epsilon_monotone(spark, sf_dir):
    df = run("q878_jl_epsilon_census", spark, sf_dir)
    for _, g in df.groupby("k"):
        s = g.sort_values("eps")["share_within"].tolist()
        assert all(a <= b + 1e-12 for a, b in zip(s, s[1:]))
    assert (df["share_within"] <= 1).all()


def test_jl_nn_preservation_bounds(spark, sf_dir):
    df = run("q879_jl_nn_preservation", spark, sf_dir)
    assert (df["preserved"] <= df["n_queries"]).all()
    assert (df["nn_preservation"] >= 0).all()


def test_jl_budget_row(spark, sf_dir):
    row = run("q880_jl_dimension_budget", spark, sf_dir).iloc[0]
    assert row["jl_bound_dims"] > 0
    assert row["worst_16"] <= row["worst_4"] + 1e-9


# --- process mining (q881-q886) --------------------------------------------------------------


def test_handoff_edges_bounded_and_positive(spark, sf_dir):
    df = run("q881_handoff_times", spark, sf_dir)
    assert len(df) <= 25  # 5x5 activity alphabet
    assert (df["n_transitions"] > 0).all()
    assert (df["min_gap_us"] <= df["max_gap_us"]).all()
    assert (df["min_gap_us"] >= 0).all()  # per-case order is monotone


def test_variant_shares_and_lengths(spark, sf_dir):
    df = run("q882_variant_analysis", spark, sf_dir)
    assert (df["case_share"] <= 1.0).all() and (df["case_share"] > 0).all()
    # trace string has trace_len activities = trace_len - 1 separators
    seps = df["variant"].str.count(">")
    assert (seps == df["trace_len"] - 1).all()


def test_bottleneck_pareto_monotone(spark, sf_dir):
    df = run("q883_bottleneck_ranking", spark, sf_dir)
    cum = df.sort_values(
        ["total_wait_us", "a", "b"], ascending=[False, True, True]
    )["cum_wait_share"].tolist()
    assert all(x <= y + 1e-9 for x, y in zip(cum, cum[1:])), cum[:5]
    assert abs(cum[-1] - 1.0) < 1e-6


def test_rework_rates_bounded(spark, sf_dir):
    df = run("q884_rework_census", spark, sf_dir)
    assert (df["n_cases_rework"] <= df["n_cases"]).all()
    assert (df["mean_occ"] >= 1).all()
    assert (df["max_occ"] >= df["mean_occ"] - 1e-9).all()


def test_conformance_bands_partition_cases(spark, sf_dir):
    df = run("q885_conformance_fitness", spark, sf_dir)
    assert (df["mean_conformance"] <= 1.0).all()
    assert (df["n_cases"] > 0).all()


def test_wip_nonnegative_and_ends_at_zero_or_more(spark, sf_dir):
    df = run("q886_wip_over_time", spark, sf_dir).sort_values("d")
    assert (df["active_cases"] >= 0).all()
    # every case opens and closes: net deltas sum to 0 past the last day
    assert df["active_cases"].iloc[-1] >= 0


# --- apportionment (q887-q891) ---------------------------------------------------------------


def test_seat_totals_are_exactly_100(spark, sf_dir):
    for q in (
        "q887_dhondt_seats",
        "q888_sainte_lague_seats",
        "q889_hamilton_seats",
        "q890_huntington_hill_seats",
    ):
        df = run(q, spark, sf_dir)
        assert df["seats"].sum() == 100, q


def test_divisor_methods_monotone_in_votes(spark, sf_dir):
    # more votes never means fewer D'Hondt seats (house monotonicity of
    # divisor methods)
    df = run("q887_dhondt_seats", spark, sf_dir).sort_values("votes")
    seats = df["seats"].tolist()
    votes = df["votes"].tolist()
    for i in range(len(df)):
        for j in range(i + 1, len(df)):
            if votes[j] > votes[i]:
                assert seats[j] >= seats[i]


def test_hamilton_within_one_of_quota(spark, sf_dir):
    df = run("q889_hamilton_seats", spark, sf_dir)
    # largest remainder satisfies quota: floor <= seats <= floor + 1
    assert ((df["seats"] - df["floor_seats"]).isin([0, 1])).all()


def test_divergence_consistent(spark, sf_dir):
    df = run("q891_apportionment_divergence", spark, sf_dir)
    mx = df[["dhondt", "sainte_lague", "hamilton", "huntington_hill"]].max(axis=1)
    mn = df[["dhondt", "sainte_lague", "hamilton", "huntington_hill"]].min(axis=1)
    assert (df["max_divergence"] == mx - mn).all()


# --- SAX / PAA (q892-q896) -------------------------------------------------------------------


def test_paa_covers_all_days(spark, sf_dir):
    df = run("q892_paa_segments", spark, sf_dir)
    assert df["seg"].between(0, 15).all()
    assert (df["n_days"] > 0).all()


def test_sax_symbols_valid(spark, sf_dir):
    df = run("q893_sax_symbols", spark, sf_dir)
    assert set(df["symbol"]) <= set("abcd")
    # z-scores of a z-normalized set are mean ~0
    assert abs(df["z"].mean()) < 0.2


def test_user_words_shape(spark, sf_dir):
    df = run("q894_user_sax_words", spark, sf_dir)
    assert (df["word"].str.len() <= 4).all()
    assert df["word"].str.fullmatch("[abcd]{1,4}").all()


def test_motif_pairs_arithmetic(spark, sf_dir):
    df = run("q895_motif_collisions", spark, sf_dir)
    assert (df["n_pairs"] == df["n_users"] * (df["n_users"] - 1) // 2).all()
    assert (df["n_users"] >= 2).all()


def test_reconstruction_error_ordering(spark, sf_dir):
    row = run("q896_paa_reconstruction", spark, sf_dir).iloc[0]
    assert row["mae_cents"] <= row["rmse_cents"] + 1e-9  # Jensen
    assert row["max_abs_err_cents"] >= row["rmse_cents"] - 1e-9


# --- quadkey (q897-q901) ---------------------------------------------------------------------


def test_quadkey_format(spark, sf_dir):
    df = run("q897_quadkey_census", spark, sf_dir)
    assert df["qk"].str.fullmatch("[0123]{12}").all()
    assert (df["n_points"] > 0).all()


def test_quadkey_rollup_conserves_points(spark, sf_dir):
    cells = run("q897_quadkey_census", spark, sf_dir)
    roll = run("q898_quadkey_rollup", spark, sf_dir)
    # parents partition the children: rollup totals cover every point
    # counted at level 12 (compare via the independent q22-style count)
    assert roll["n_points"].sum() >= cells["n_points"].sum()
    assert (roll["max_child_points"] <= roll["n_points"]).all()


def test_neighborhood_contains_self(spark, sf_dir):
    df = run("q899_neighborhood_hotspots", spark, sf_dir)
    assert (df["hood_points"] >= df["n_points"]).all()
    assert df["hood_cells"].between(1, 9).all()


def test_bbox_index_paths_agree(spark, sf_dir):
    row = run("q901_bbox_index_equivalence", spark, sf_dir).iloc[0]
    assert row["paths_agree"] == 1
    assert row["n_direct"] == row["n_via_index"]
    assert row["n_pruned_cells"] > 0  # the index actually prunes


# --- microstructure (q902-q906) --------------------------------------------------------------


def test_vwap_within_price_range(spark, sf_dir):
    df = run("q902_vwap_hourly", spark, sf_dir)
    assert (df["volume"] >= 0).all()
    ok = df[df["vwap_cents"].notna()]
    assert (ok["vwap_cents"] >= 0).all()
    # vwap is a weighted mean: bounded by the hour's own price extremes
    assert (ok["vwap_cents"] >= ok["min_px_cents"]).all()
    assert (ok["vwap_cents"] <= ok["max_px_cents"]).all()


def test_imbalance_bounded(spark, sf_dir):
    df = run("q903_orderflow_imbalance", spark, sf_dir)
    ok = df["imbalance"].dropna()
    assert ok.between(-1.0, 1.0).all()
    assert (df["buy_volume"] >= 0).all() and (df["sell_volume"] >= 0).all()


def test_volatility_signature_rows(spark, sf_dir):
    df = run("q904_volatility_signature", spark, sf_dir)
    assert sorted(df["sample_minutes"]) == [1, 5, 15, 60]
    assert (df["realized_variance"] >= 0).all()
    # finer sampling -> more returns
    d = df.set_index("sample_minutes")["n_returns"]
    assert d[1] >= d[5] >= d[15] >= d[60]


def test_roll_spread_only_on_negative_cov(spark, sf_dir):
    df = run("q906_roll_spread", spark, sf_dir)
    has = df["roll_spread_cents"].notna()
    assert (df.loc[has, "serial_cov"] < 0).all()
    assert (df.loc[has, "roll_spread_cents"] > 0).all()


# --- ledger (q907-q911) ----------------------------------------------------------------------


def test_trial_balance_residual_equals_planted_drift(spark, sf_dir):
    tb = run("q907_trial_balance", spark, sf_dir)
    ji = run("q909_journal_integrity", spark, sf_dir).iloc[0]
    # structural double-entry identity: trial-balance residual ==
    # total drift of unbalanced entries
    assert tb["balance_cents"].sum() == ji["total_drift_cents"]
    assert ji["n_unbalanced"] > 0  # the plant actually planted


def test_running_balance_matches_trial_balance(spark, sf_dir):
    rb = run("q908_running_balances", spark, sf_dir)
    tb = run("q907_trial_balance", spark, sf_dir)
    last = rb.sort_values("d").groupby("acct")["balance_cents"].last()
    want = tb.set_index("acct")["balance_cents"]
    assert (last == want.loc[last.index]).all()


def test_aging_buckets_cover_everyone(spark, sf_dir):
    df = run("q910_receivables_aging", spark, sf_dir)
    assert df["n_accounts"].sum() > 0
    assert (df["max_age_days"] >= 0).all()


def test_accrual_conserves_cash_lifetime(spark, sf_dir):
    df = run("q911_accrual_vs_cash", spark, sf_dir)
    # integer-thirds recognition is cent-exact over the lifetime
    assert df["accrual_cents"].sum() == df["cash_cents"].sum()
    assert df["recognition_shift_cents"].sum() == 0


# --- cluster validity (q912-q916) ------------------------------------------------------------


def test_inertia_decreases_in_k(spark, sf_dir):
    df = run("q912_inertia_elbow", spark, sf_dir).sort_values("k")
    ws = df["within_ss"].tolist()
    assert all(a >= b - 1e-6 for a, b in zip(ws, ws[1:])), ws
    assert (df["within_ss"] >= 0).all()


def test_davies_bouldin_positive(spark, sf_dir):
    row = run("q913_davies_bouldin", spark, sf_dir).iloc[0]
    assert row["davies_bouldin"] > 0
    assert row["worst_cluster_ratio"] >= row["davies_bouldin"]


def test_calinski_harabasz_consistent(spark, sf_dir):
    row = run("q914_calinski_harabasz", spark, sf_dir).iloc[0]
    assert row["within_ss"] > 0 and row["between_ss"] >= 0
    want = (row["between_ss"] / (row["k"] - 1)) / (
        row["within_ss"] / (row["n_total"] - row["k"])
    )
    assert abs(row["calinski_harabasz"] - want) < 1e-4


def test_centroid_separation_fields(spark, sf_dir):
    row = run("q915_centroid_separation", spark, sf_dir).iloc[0]
    assert 0 < row["min_centroid_sep"] <= row["mean_centroid_sep"] + 1e-9
    assert row["centroid_dunn"] > 0


def test_stability_retention_bounded(spark, sf_dir):
    df = run("q916_assignment_stability", spark, sf_dir)
    assert df["retention"].between(0, 1).all()
    assert (df["n_retained"] <= df["n_points"]).all()
    # the k=8 centroids are a prefix of the k=16 centroids, so their
    # own rows always retain themselves
    assert (df["n_split_into"] >= 1).all()


# --- propensity matching (q917-q921) ---------------------------------------------------------


def test_propensity_model_sane(spark, sf_dir):
    row = run("q917_propensity_model", spark, sf_dir).iloc[0]
    assert 0 <= row["r2"] <= 1
    assert row["n_treated"] > 0
    assert row["min_p_u"] <= row["max_p_u"]


def test_match_rate_and_gaps(spark, sf_dir):
    row = run("q918_caliper_match", spark, sf_dir).iloc[0]
    assert 0 < row["match_rate"] <= 1.0
    assert row["max_cell_dist"] <= 1  # own or adjacent caliper cell
    assert row["n_distinct_match_cells"] <= row["n_matched"]
    assert row["matched_control_pool"] >= row["n_matched"]


def test_balance_improves_after_matching(spark, sf_dir):
    df = run("q920_covariate_balance", spark, sf_dir).set_index("stage")
    assert abs(df.loc["b_post", "smd_balance"]) <= abs(
        df.loc["a_pre", "smd_balance"]
    ) + 0.05


def test_common_support_histogram(spark, sf_dir):
    df = run("q921_common_support", spark, sf_dir)
    assert df["bin"].between(0, 9).all()
    assert (df["n_treated"] + df["n_control"] > 0).all()


# --- difference-in-differences (q922-q926) ---------------------------------------------------


def test_did_identity(spark, sf_dir):
    row = run("q922_did_2x2", spark, sf_dir).iloc[0]
    want = (row["treated_post"] - row["treated_pre"]) - (
        row["control_post"] - row["control_pre"]
    )
    assert abs(row["did_cents"] - want) < 1e-3
    assert row["n_obs"] > 0


def test_pretrends_two_groups(spark, sf_dir):
    df = run("q923_parallel_pretrends", spark, sf_dir)
    assert sorted(df["treated"]) == [0, 1]
    assert (df["n_obs"] > 0).all()


def test_staggered_att_grid(spark, sf_dir):
    df = run("q926_staggered_adoption", spark, sf_dir)
    # cohort 1 -> periods 1,2; cohort 2 -> period 2
    assert set(zip(df["cohort"], df["period"])) == {(1, 1), (1, 2), (2, 2)}


# --- Good-Turing (q927-q931) -----------------------------------------------------------------


def test_fof_identity(spark, sf_dir):
    fof = run("q927_freq_of_freqs", spark, sf_dir)
    assert (fof["tokens_at_r"] == fof["r"] * fof["nr"]).all()
    assert (fof["nr"] > 0).all()


def test_gt_discounts_shift_mass_down(spark, sf_dir):
    df = run("q928_gt_discounts", spark, sf_dir)
    # r* > 0 always; at tiny SFs the noisy head can have N_{r+1} > N_r
    # so r* is not guaranteed below r+1 without SGT smoothing
    assert (df["r_star"] > 0).all()
    assert (df["nr_plus_1"] > 0).all()


def test_unseen_mass_bounds(spark, sf_dir):
    row = run("q929_unseen_mass", spark, sf_dir).iloc[0]
    assert 0 < row["unseen_mass_p0"] < 1
    assert abs(row["unseen_mass_p0"] + row["good_coverage"] - 1) < 1e-9
    assert row["n_hapax"] <= row["n_types"]


def test_holdout_oov_close_to_estimate(spark, sf_dir):
    row = run("q931_split_coverage", spark, sf_dir).iloc[0]
    assert 0 <= row["empirical_oov_rate"] <= 1
    assert row["oov_tokens"] <= row["test_tokens"]
    # the estimator should land within an order of magnitude of reality
    if row["empirical_oov_rate"] > 0:
        ratio = row["good_turing_estimate"] / row["empirical_oov_rate"]
        assert 0.1 < ratio < 10, ratio


# --- click models (q932-q936) ----------------------------------------------------------------


def test_position_ctr_rows(spark, sf_dir):
    df = run("q932_position_ctr", spark, sf_dir)
    assert df["pos"].between(1, 10).all()
    assert (df["n_clicks"] <= df["n_impressions"]).all()
    # deeper positions never have more impressions (sessions truncate)
    imp = df.sort_values("pos")["n_impressions"].tolist()
    assert all(a >= b for a, b in zip(imp, imp[1:]))


def test_examination_pinned_at_1(spark, sf_dir):
    df = run("q933_pbm_examination", spark, sf_dir).set_index("pos")
    assert abs(df.loc[1, "examination_prob"] - 1.0) < 1e-9
    # a deep rank can have zero clicks at tiny SFs
    assert (df["examination_prob"] >= 0).all()


def test_cascade_shares_sum_to_1(spark, sf_dir):
    df = run("q934_cascade_first_click", spark, sf_dir)
    assert abs(df["session_share"].sum() - 1.0) < 1e-6


def test_coec_expected_clicks_conserved(spark, sf_dir):
    df = run("q935_coec", spark, sf_dir)
    # expected clicks across items == observed clicks across items
    # (the position-CTR is fit on the same impressions)
    assert abs(df["expected_clicks"].sum() - df["n_clicks"].sum()) < 1e-3


def test_rbp_bounded(spark, sf_dir):
    row = run("q936_rbp_mass", spark, sf_dir).iloc[0]
    assert 0 <= row["mean_rbp"] <= 1
    assert row["max_rbp"] <= 1


# --- knapsack (q937-q941) --------------------------------------------------------------------


def test_greedy_within_budget(spark, sf_dir):
    row = run("q937_greedy_knapsack", spark, sf_dir).iloc[0]
    assert row["total_weight"] <= 20_000
    assert 0 < row["budget_utilization"] <= 1.0


def test_lp_certificate_bounds_greedy(spark, sf_dir):
    row = run("q938_lp_certificate", spark, sf_dir).iloc[0]
    assert row["greedy_v"] <= row["lp_upper_bound"] + 1e-6
    # Dantzig gap: bound - greedy < one (fractional) item's value
    assert row["lp_upper_bound"] - row["greedy_v"] <= row["next_item_value"]
    assert 0 < row["greedy_over_bound"] <= 1.0


def test_budget_curve_concave(spark, sf_dir):
    df = run("q939_budget_sensitivity", spark, sf_dir).set_index("budget_label")
    vh, vb, vd = (
        df.loc["a_half", "total_value"],
        df.loc["b_base", "total_value"],
        df.loc["c_double", "total_value"],
    )
    assert vh <= vb <= vd
    # diminishing marginal value per token (density order is sorted)
    assert (vb - vh) / 10_000 >= (vd - vb) / 20_000 - 1e-9


def test_per_source_budgets_hold(spark, sf_dir):
    df = run("q940_per_source_knapsack", spark, sf_dir)
    assert (df["tokens_used"] <= 5_000).all()
    assert (df["utilization"] <= 1.0).all()


def test_density_beats_value_greedy(spark, sf_dir):
    row = run("q941_density_vs_value_greedy", spark, sf_dir).iloc[0]
    assert row["density_wins"] == 1  # LP-optimal order never loses here


# --- proper scoring (q942-q946) --------------------------------------------------------------


def test_crps_decomposition(spark, sf_dir):
    row = run("q942_crps_ensemble", spark, sf_dir).iloc[0]
    assert row["mean_crps_cents"] >= 0
    want = row["mean_abs_component"] - row["mean_spread_component"]
    assert abs(row["mean_crps_cents"] - want) < 1e-3
    assert row["n_days"] > 0


def test_pit_shares_sum_to_1(spark, sf_dir):
    df = run("q943_pit_histogram", spark, sf_dir)
    assert abs(df["share"].sum() - 1.0) < 1e-6
    assert df["pit_rank"].between(0, 7).all()


def test_winkler_at_least_width(spark, sf_dir):
    row = run("q944_winkler_interval", spark, sf_dir).iloc[0]
    assert row["mean_winkler_cents"] >= row["mean_width_cents"] - 1e-9
    assert 0 <= row["empirical_coverage"] <= 1


def test_crps_skill_fields(spark, sf_dir):
    row = run("q945_crps_skill", spark, sf_dir).iloc[0]
    assert row["ensemble_crps_cents"] > 0
    assert row["persistence_mae_cents"] > 0
    assert row["crps_skill_score"] < 1


def test_nested_intervals_monotone(spark, sf_dir):
    df = run("q946_sharpness_coverage", spark, sf_dir).set_index("interval_label")
    assert (
        df.loc["a_full", "mean_width_cents"]
        >= df.loc["b_central50", "mean_width_cents"]
        >= df.loc["c_narrow", "mean_width_cents"]
    )
    assert (
        df.loc["a_full", "coverage"]
        >= df.loc["b_central50", "coverage"]
        >= df.loc["c_narrow", "coverage"]
    )


# --- TextTiling (q947-q951) ------------------------------------------------------------------


def test_gap_similarity_bounds(spark, sf_dir):
    row = run("q947_gap_similarity", spark, sf_dir).iloc[0]
    assert 0 <= row["min_sim"] <= row["max_sim"] <= 1
    assert 0 <= row["pooled_jaccard"] <= 1
    assert row["n_gaps"] > 0


def test_depth_scores_nonneg(spark, sf_dir):
    df = run("q948_depth_scores", spark, sf_dir)
    assert (df["depth"] >= 0).all()
    assert (df["sim"].between(0, 1)).all()


def test_boundary_census_covers_docs(spark, sf_dir):
    df = run("q949_boundary_census", spark, sf_dir)
    assert (df["n_boundaries"] >= 0).all()
    assert df["n_docs"].sum() > 0


def test_segment_lengths_positive(spark, sf_dir):
    df = run("q950_segment_lengths", spark, sf_dir)
    assert (df["len_blocks"] >= 1).all()
    assert (df["n_segments"] > 0).all()


def test_boundaries_are_less_coherent(spark, sf_dir):
    row = run("q951_coherence_validation", spark, sf_dir).iloc[0]
    if row["n_boundary_gaps"] > 0 and row["n_interior_gaps"] > 0:
        assert row["mean_sim_at_boundaries"] <= row["mean_sim_interior"] + 1e-9


# --- forgetting curve (q952-q956) -------------------------------------------------------------


def test_survival_monotone(spark, sf_dir):
    df = run("q952_gap_survival", spark, sf_dir).sort_values("hr")
    r = df["retention"].tolist()
    assert all(a >= b - 1e-9 for a, b in zip(r, r[1:]))
    assert abs(r[0] - 1.0) < 1e-6  # R(0) = everyone


def test_halflife_positive(spark, sf_dir):
    row = run("q953_exponential_fit", spark, sf_dir).iloc[0]
    assert row["lambda_per_hour"] > 0
    assert row["half_life_hours"] > 0


def test_type_halflives(spark, sf_dir):
    df = run("q954_type_half_lives", spark, sf_dir)
    assert len(df) == 5
    assert (df["half_life_hours"] > 0).all()


def test_fit_quality_bounded(spark, sf_dir):
    row = run("q955_fit_quality", spark, sf_dir).iloc[0]
    assert 0 <= row["mean_abs_dev"] <= row["max_abs_dev"] <= 1


def test_censoring_share(spark, sf_dir):
    row = run("q956_censoring_audit", spark, sf_dir).iloc[0]
    assert 0 < row["censored_share"] < 1
    assert row["mean_censored_tail_hours"] >= 0


# --- EB shrinkage (q957-q961) ----------------------------------------------------------------


def test_shrinkage_weights_bounded(spark, sf_dir):
    row = run("q957_eb_shrinkage_table", spark, sf_dir).iloc[0]
    assert 0 <= row["min_shrinkage_b"] <= row["max_shrinkage_b"] <= 1
    assert row["sigma2_within"] > 0


def test_stein_paradox_holds(spark, sf_dir):
    row = run("q958_stein_paradox", spark, sf_dir).iloc[0]
    # the aggregate MSE of the shrunk estimates must not exceed raw
    assert row["mse_eb"] <= row["mse_raw"] + 1e-6
    assert row["n_users_validated"] > 0


def test_partial_pooling_never_worst(spark, sf_dir):
    row = run("q959_pooling_spectrum", spark, sf_dir).iloc[0]
    worst = max(row["mse_no_pooling"], row["mse_complete_pooling"])
    assert row["mse_partial_pooling"] <= worst + 1e-6


def test_rank_movers_are_small_n(spark, sf_dir):
    df = run("q960_rank_movement", spark, sf_dir).sort_values("decile_moves")
    assert (df["decile_moves"] >= 0).all()
    assert df["n_users"].sum() > 0


def test_eb_rates_inside_raw_range(spark, sf_dir):
    row = run("q961_beta_binomial_rates", spark, sf_dir).iloc[0]
    assert 0 <= row["min_eb_rate"] <= row["max_eb_rate"] <= 1
    assert row["max_rate_move"] >= 0
