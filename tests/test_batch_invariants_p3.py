"""Semantic invariants for registry query batches — part 3 of the
split batch-invariant suite (range-agnostic: covers whatever query
ids its asserts name). Properties the DuckDB oracle hash gate cannot
see (both engines could be wrong the same way), checked on sf0.001.

Sections: CRR real options (q791-q795), stable matching (q796-q800), reliability growth (q801-q805), quantile sketch (q806-q810), Markov attribution (q811-q815), network robustness (q816-q820), scheduling (q821-q825), Kalman filter (q826-q830), optimal stopping (q831-q835), successive halving (q836-q840), cross-price elasticity (q841-q845), selection inference (q846-q850), adstock / MMM (q851-q855), psychometrics (q856-q860), capture-recapture (q861-q865), L-moments (q866-q870).
"""

from __future__ import annotations

import pytest

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()

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


