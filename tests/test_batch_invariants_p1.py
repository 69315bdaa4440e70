"""Semantic invariants for registry query batches — part 1 of the
split batch-invariant suite (range-agnostic: covers whatever query
ids its asserts name). Properties the DuckDB oracle hash gate cannot
see (both engines could be wrong the same way), checked on sf0.001.

Sections: sequence mining, data splits, bitemporal, HMM, association rules, motifs / wavelets, trend + AR, inequality, inequality / AR / synthetic control, scorecard / distsys / trees, sampling / robust / calendar / index, reserving (chain-ladder), auctions, extreme-value theory, credibility, forensic accounting, trade economics, cache / working set, group-sequential testing, mobility, panel econometrics.
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


