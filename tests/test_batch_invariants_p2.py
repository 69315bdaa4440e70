"""Semantic invariants for registry query batches — part 2 of the
split batch-invariant suite (range-agnostic: covers whatever query
ids its asserts name). Properties the DuckDB oracle hash gate cannot
see (both engines could be wrong the same way), checked on sf0.001.

Sections: fluctuation scaling, meta-analysis, capital budgeting, social choice, portfolio (q731-q735), source coding (q736-q740), FIFO costing (q741-q745), item-item CF (q746-q750), supply chain (q751-q755), queue replay (q756-q760), hedonic pricing (q761-q765), empirical copula (q766-q770), lexical growth (q771-q775), Bass diffusion (q776-q780), aggregation paradoxes (q781-q785), record statistics (q786-q790).
"""

from __future__ import annotations

import pytest

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()

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


