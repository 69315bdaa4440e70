"""Semantic invariants for registry query batches — part 4 of the
split batch-invariant suite (range-agnostic: covers whatever query
ids its asserts name). Properties the DuckDB oracle hash gate cannot
see (both engines could be wrong the same way), checked on sf0.001.

Sections: composite indicators (q871-q875), JL projection (q876-q880), process mining (q881-q886), apportionment (q887-q891), SAX / PAA (q892-q896), quadkey (q897-q901), microstructure (q902-q906), ledger (q907-q911), cluster validity (q912-q916), propensity matching (q917-q921), difference-in-differences (q922-q926), Good-Turing (q927-q931), click models (q932-q936), knapsack (q937-q941), proper scoring (q942-q946), TextTiling (q947-q951), forgetting curve (q952-q956), EB shrinkage (q957-q961).
"""

from __future__ import annotations

import pytest

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()

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
