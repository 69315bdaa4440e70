"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once after a warm-up action so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flightdb_spark.queries import load_registry
from flightdb_spark.session import get_spark
from flightdb_spark.tables import load_table

# Headline set: one per operator family (agg scan, join chain, top-k join,
# window derivation, as-of join, sessionization, geo, dedup, text, vector).
HEADLINE = [
    "q01_pricing_summary",
    "q08_enrichment_join",
    "q10_topk_revenue_join",
    "q13_derived_columns",
    "q16_asof_join",
    "q14_sessionize",
    "q21_flown_distance",
    "q23_waypoint_crossing",
    "q30_minhash_signatures",
    "q35_quality_score",
    "q37_media_metadata",
    "q40_cosine_topk",
    "q45_market_rollup",
    # scale paths: bucketed ANN, grid-gated trajectory sim, banded near-dup,
    # IVF ANN, CC dedup clusters, repetition filters
    "q42_lsh_ann",
    "q47_hausdorff_grid",
    "q48_lsh_near_dup",
    "q50_ivf_ann",
    "q51_dedup_clusters",
    "q52_repetition_stats",
    # round 4: ranking/scoring + deterministic split + centroid update
    "q61_tfidf_topterms",
    "q64_split_assignment",
    "q67_label_centroids",
    # round 5: span-level dedup, rolling time frames, iterative graph,
    # audio features, exact similarity join, resample, triangles
    "q81_dup_spans",
    "q85_rolling_revenue",
    "q86_pagerank",
    "q90_audio_energy",
    "q91_prefix_jaccard_join",
    "q92_resample_ffill",
    "q93_triangle_count",
    # round 5: multi-way dim join, cross-split leakage composite
    "q94_local_supplier_volume",
    "q99_split_leakage",
    # round 6: simhash banding, minhash calibration, ANN recall eval,
    # containment, source-overlap union-minhash, zipf fit, multimodal
    # packing, EWMA
    "q107_simhash_hamming_pairs",
    "q109_minhash_jaccard_est",
    "q115_ann_recall",
    "q117_shingle_containment",
    "q121_source_overlap",
    "q122_zipf_slope",
    "q123_interleaved_packing",
    "q114_ewma",
    # round 6: robust/eval additions
    "q116_mad_outliers",
    "q119_dataset_cards",
    "q124_phrase_match",
    "q126_seasonal_residuals",
    "q128_psi_drift",
    "q129_chi_square",
    # round 7: boilerplate removal, market-basket lift, distributed-
    # prefix-sum AUC, hybrid fusion, TPC-H Q3, hotspot clustering
    "q130_boilerplate_segments",
    "q133_copurchase_lift",
    "q135_auc",
    "q137_rrf_fusion",
    "q140_shipping_priority",
    "q143_density_hotspots",
    # round 7b: prefix-scan Gini, silhouette, PMI, frame dedup,
    # integrity audit
    "q148_gini",
    "q153_silhouette",
    "q157_pmi_pairs",
    "q154_frame_dedup",
    "q160_integrity_audit",
    # round 8: TPC-H Q13, grouped regression, interpolating resample,
    # scene cuts, IVM delta-join audit, integer power-iteration PCA
    "q182_order_count_distribution",
    "q184_group_ols",
    "q187_resample_interpolate",
    "q188_scene_cuts",
    "q189_ivm_delta_join",
    "q191_pca_power_iteration",
    # round 9: rank-statistic tests on the bucketed prefix scan,
    # token-budget curation, IVF-cell semantic dedup
    "q192_mann_whitney",
    "q195_benford_audit",
    "q196_token_budget",
    "q197_semantic_dedup",
    # round 9: iterative BFS, interval-join attribution, corpus KL
    "q198_bfs_hops",
    "q199_attribution",
    "q200_kl_divergence",
    # round 9: survival, one-scan corr matrix, audio VAD runs, two-scan
    # k-fold CV, skew audit, quantile normalization
    "q204_kaplan_meier",
    "q206_corr_matrix",
    "q207_audio_silence",
    "q208_cv_regression",
    "q209_skew_audit",
    "q210_quantile_normalize",
    # round 9: repeat cadence, subtotal lattice, AP, airway audit,
    # oracle-verified Python DataSource
    "q216_repeat_intervals",
    "q218_grouping_sets",
    "q220_average_precision",
    "q221_airway_conformance",
    "q217_python_datasource",
    # round 10: robust slope, trajectory clustering, perceptual-hash
    # media dedup, PQ-ADC ANN, exact span removal
    "q223_theil_sen",
    "q224_trajectory_clusters",
    "q225_ahash_neardup",
    "q226_pq_adc_topk",
    "q227_dup_span_removal",
    # round 10: rank correlations, KMV sketch audit, span corruption,
    # proximity encounters
    "q229_spearman",
    "q231_kmv_ndv",
    "q232_span_corruption",
    "q233_separation_conflicts",
    # round 11: TPC-H completion highlights
    "q237_product_type_profit",
    "q243_waiting_suppliers",
    "q244_dsir_resample",
    "q246_naive_bayes_langid",
    "q250_variant_shred",
    "q254_array_hof_battery",
    "q256_woe_iv",
    "q259_bounded_sssp",
    "q260_kmv_set_ops",
    "q262_rolling_zscore",
    "q264_audio_chunk_plan",
    "q266_modal_token_budget",
    "q267_item_similarity_topk",
    "q274_peak_concurrency",
    "q278_growth_accounting",
    "q284_ngram_novelty",
    "q292_cohort_ltv",
    "q297_poisson_gof",
    "q299_perfect_order_rate",
    # round 12: calibration/preference/causal/graph/demand/weak-label/
    # off-policy/analyst/behavior additions
    "q301_isotonic_calibration",
    "q306_bradley_terry",
    "q310_clustering_coefficient",
    "q312_hits_authorities",
    "q313_croston_forecast",
    "q316_labeling_function_stats",
    "q319_offpolicy_eval",
    "q323_llr_collocations",
    "q324_mrr",
    "q350_curation_funnel",
    "q353_ivf_nprobe_sweep",
    # round 13: agreement stats, bounded-round label propagation,
    # smoothed query-likelihood retrieval, pass@k
    "q379_krippendorff_alpha",
    "q387_label_propagation",
    "q391_lm_dirichlet",
    "q395_pass_at_k",
    # round 13: data valuation + decontamination + hex smoothing
    "q397_knn_shapley",
    "q399_hexgrid_hotspots",
    "q400_contamination_scan",
    "q402_pacf",
    "q405_int8_quantization",
    "q407_logrank_test",
    "q410_mediation",
    "q412_demographic_parity",
    "q415_threshold_sweep",
    "q417_temperature_mixing",
    "q419_target_encoding",
    "q422_histogram_selectivity",
    "q424_runtime_filter_audit",
    "q429_shard_balance",
    "q431_dedup_threshold_sweep",
    "q432_mmd_drift",
    "q434_wasserstein_1d",
    "q437_dup_substring_bands",
    "q438_fellegi_sunter",
    "q442_obf_boundaries",
    "q446_variance_reduction",
    "q447_watermark_tuning",
    "q450_session_gap_sensitivity",
    "q451_ams_f2",
    "q455_sampled_join_size",
    "q459_clarity_score",
    "q461_hampel_filter",
    "q470_permutation_test",
    "q471_bleu_components",
    "q473_chrf",
    "q476_periodogram",
    "q481_dawid_skene_quality",
    "q486_hilbert_locality",
    "q493_competing_risks",
    "q496_littles_law",
    "q501_textrank_keywords",
    "q503_rake_phrases",
    "q504_ecod_outliers",
    "q507_revenue_bridge",
    "q511_rle_runs",
    "q516_hierarchy_depths",
    "q521_isotropy_sample",
    "q526_gopher_rules",
    "q533_contribution_analysis",
    "q536_vocab_size_sweep",
    "q541_three_valued_logic",
    # round 6: spatial autocorrelation + multiple testing
    "q551_moran_i",
    "q556_bonferroni_holm",
    # round 6: sequence mining
    "q563_transition_entropy",
    # round 6: data-split design
    "q567_purged_kfold_embargo",
    # round 6: bitemporal versioning
    "q571_bitemporal_snapshot",
    # round 6: integer-semiring HMM decode
    "q576_viterbi_decode",
    # round 6: association rules
    "q582_maximal_frequent_pairs",
    # round 6: time-series motifs
    "q587_discords",
    # round 6: nonparametric trend
    "q591_sen_slope",
    # round 6: Haar multiresolution
    "q596_haar_energy_spectrum",
    # round 6: inequality / prefix-scan showcase
    "q601_lorenz_gini",
    # round 6: AR models from exact autocovariances
    "q606_autocovariance_table",
    # round 6: synthetic control
    "q613_placebo_tests",
    # round 6: scorecard evaluation
    "q617_auc_somers",
    # round 6: distributed-systems primitives
    "q623_merkle_reconciliation",
    # round 6: histogram tree splits
    "q629_depth2_tree",
    # round 6: behavioral combinators
    "q631_window_funnel",
    # round 6: sampling designs
    "q637_systematic_sample",
    # round 6: robust estimators
    "q641_hodges_lehmann",
    # round 6: business calendar
    "q646_business_minute_clock",
    # round 6: inverted-index internals
    "q653_wand_pruning",
    "q663_chain_ladder_ultimates",
    "q667_reserve_price_grid",
    "q671_hill_tail_index",
    "q678_shrinkage_backtest",
    "q681_benford_second_digit",
    "q688_shift_share",
    "q693_ttl_hit_ratios",
    "q696_sequential_looks",
    "q701_mobility_matrix",
    "q706_panel_estimators",
    "q711_taylor_law",
    "q719_random_effects_pooled",
    "q722_irr_bracket",
    "q728_irv_rounds",
    # round 6: index numbers
    "q658_chained_laspeyres",
    # round 6: portfolio / coding / FIFO / CF / supply chain
    "q732_return_covariance",
    "q739_compression_summary",
    "q742_fifo_match_census",
    "q749_user_recommendation",
    "q751_bullwhip_index",
    # round 6: queue replay / hedonic / copula
    "q756_lindley_waits",
    "q762_hedonic_index",
    "q769_schweizer_wolff",
    # round 6: lexical growth / diffusion / paradoxes
    "q771_heaps_curve",
    "q777_bass_grid_fit",
    "q785_mix_shift",
    # round 6: records / options / matching / growth / sketches / attribution
    "q789_record_symmetry",
    "q791_crr_price_table",
    "q797_stable_matching",
    "q802_crow_amsaa_fit",
    "q807_exact_quantiles",
    "q813_removal_attribution",
    # round 6: robustness / scheduling / kalman / stopping / bandits
    "q819_attack_percolation",
    "q824_johnson_flowshop",
    "q826_kalman_trace",
    "q831_secretary_replay",
    "q837_halving_trace",
    # round 6: elasticity / selection / adstock
    "q842_elasticity_matrix",
    "q848_rtm_slope",
    "q852_adstock_regression",
    # round 6: psychometrics / capture-recapture / L-moments / composite
    "q856_cronbach_alpha",
    "q861_lincoln_petersen",
    "q867_pwm_table",
    "q872_composite_scores",
    # round 7: process mining / apportionment / SAX / quadkey / microstructure
    "q881_handoff_times",
    "q883_bottleneck_ranking",
    "q887_dhondt_seats",
    "q891_apportionment_divergence",
    "q894_user_sax_words",
    "q897_quadkey_census",
    "q901_bbox_index_equivalence",
    "q902_vwap_hourly",
    "q904_volatility_signature",
    # round 7: ledger / cluster validity / propensity matching
    "q907_trial_balance",
    "q911_accrual_vs_cash",
    "q912_inertia_elbow",
    "q913_davies_bouldin",
    "q918_caliper_match",
    "q919_att_matched",
    # round 7: DiD / Good-Turing / click models
    "q922_did_2x2",
    "q926_staggered_adoption",
    "q929_unseen_mass",
    "q931_split_coverage",
    "q932_position_ctr",
    "q935_coec",
    # round 7: knapsack / proper scoring
    "q937_greedy_knapsack",
    "q941_density_vs_value_greedy",
    "q942_crps_ensemble",
    "q944_winkler_interval",
    # round 7: text tiling / forgetting curves
    "q947_gap_similarity",
    "q949_boundary_census",
    "q952_gap_survival",
    "q954_type_half_lives",
    # round 7: EB shrinkage
    "q958_stein_paradox",
    "q959_pooling_spectrum",
    # round 8: cost allocation / Elo / SPC / auction clearing /
    # revenue management / changepoints
    "q962_airport_shapley",
    "q965_shapley_shubik",
    "q968_elo_final",
    "q970_elo_k_sensitivity",
    "q973_ewma_chart",
    "q974_cusum_chart",
    "q977_auction_uncross",
    "q979_auction_surplus",
    "q982_demand_profile",
    "q985_overbooking_grid",
    "q987_binary_split",
    "q989_page_hinkley",
    "q992_edit_distances",
    "q994_trigram_jaccard",
    "q998_decision_curve",
    "q999_operating_point",
    # round 9: check-digit grid sweep, diversity star joins, agreement
    # moments, adoption curve + Bass replay, readability arithmetic,
    # life table, tornado money base
    "q1006_detection_power",
    "q1007_simpson_concentration",
    "q1010_morisita_horn",
    "q1012_bland_altman",
    "q1022_adoption_curve",
    "q1023_bass_replay",
    "q1028_flesch_scores",
    "q1031_readability_length_corr",
    "q1032_decrement_table",
    "q1037_tornado_swings",
    "q1043_lead_time",
]

# The 13 queries recorded in BENCH_r01.json (the driver's recorded baseline).
# These are the only per-query entries emitted on the final stdout line.
BASELINE_SET = frozenset(
    [
        "q01_pricing_summary",
        "q08_enrichment_join",
        "q10_topk_revenue_join",
        "q13_derived_columns",
        "q16_asof_join",
        "q14_sessionize",
        "q21_flown_distance",
        "q23_waypoint_crossing",
        "q30_minhash_signatures",
        "q35_quality_score",
        "q37_media_metadata",
        "q40_cosine_topk",
        "q45_market_rollup",
    ]
)


# --headline-core: the contention-robust profile (r7 VERDICT item 6) —
# the 13 recorded-baseline queries plus the ~40 scale-path headliners
# (every >2.6 s query in the r7 full run and every rehearsal-flagged
# family), so a bounded driver window still exercises the expensive
# plans. The full 265-query sweep remains the default.
CORE_SCALE = [
    "q819_attack_percolation",
    "q437_dup_substring_bands",
    "q749_user_recommendation",
    "q387_label_propagation",
    "q576_viterbi_decode",
    "q397_knn_shapley",
    "q728_irv_rounds",
    "q51_dedup_clusters",
    "q229_spearman",
    "q91_prefix_jaccard_join",
    "q813_removal_attribution",
    "q481_dawid_skene_quality",
    "q797_stable_matching",
    "q312_hits_authorities",
    "q224_trajectory_clusters",
    "q872_composite_scores",
    "q191_pca_power_iteration",
    "q225_ahash_neardup",
    "q259_bounded_sssp",
    "q86_pagerank",
    "q571_bitemporal_snapshot",
    "q217_python_datasource",
    "q48_lsh_near_dup",
    "q473_chrf",
    "q267_item_similarity_topk",
    "q143_density_hotspots",
    "q762_hedonic_index",
    "q613_placebo_tests",
    "q516_hierarchy_depths",
    "q81_dup_spans",
    "q187_resample_interpolate",
    "q837_halving_trace",
    "q198_bfs_hops",
    "q310_clustering_coefficient",
    "q582_maximal_frequent_pairs",
    "q223_theil_sen",
    "q109_minhash_jaccard_est",
    "q353_ivf_nprobe_sweep",
    "q93_triangle_count",
    "q107_simhash_hamming_pairs",
    "q667_reserve_price_grid",
    "q842_elasticity_matrix",
    "q117_shingle_containment",
    "q226_pq_adc_topk",
    "q197_semantic_dedup",
]


def main() -> None:
    core_mode = "--headline-core" in sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    t_reg = time.time()
    registry = load_registry()
    # recorded in BENCH_LOCAL so registry-import creep is visible per
    # round (880 eager module imports measured ~0.9 s cold in r7; the
    # lazy-load threshold is ~2 s)
    registry_load_sec = round(time.time() - t_reg, 3)
    spark = get_spark("flightdb_bench")

    # warm-up: force JVM init + parquet footer reads for every input table.
    # Never fatal: a vintage/schema surprise on one table must not zero out
    # the whole bench (BENCH_r03 was lost to an events.ts vintage change that
    # crashed this loop before any query ran).
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            load_table(spark, sf_dir, t).count()
        except Exception as exc:  # noqa: BLE001
            print(f"# warmup {t} failed: {exc}", file=sys.stderr)

    # Codegen-infrastructure warm-up: the FIRST hash aggregate / window /
    # broadcast join of a session pays Janino classloading + whole-stage
    # compilation (~1-3 s) that has nothing to do with the query being
    # timed — r6 showed q01 (first in HEADLINE) absorbing 4.18 s driver-side
    # vs 0.6 s warm. Three tiny shaped plans compile those paths up front.
    try:
        from pyspark.sql import Window as _W
        from pyspark.sql import functions as _F

        rng = spark.range(10000).select(
            (_F.col("id") % 7).alias("k"), _F.col("id").alias("v")
        )
        rng.groupBy("k").agg(_F.sum("v"), _F.avg("v"), _F.count("*")).count()
        rng.withColumn(
            "lagv", _F.lag("v").over(_W.partitionBy("k").orderBy("v"))
        ).count()
        dim = spark.range(7).select(_F.col("id").alias("k"))
        rng.join(_F.broadcast(dim), "k").count()
    except Exception as exc:  # noqa: BLE001
        print(f"# codegen warmup failed: {exc}", file=sys.stderr)

    if core_mode:
        names = [n for n in HEADLINE if n in BASELINE_SET or n in set(CORE_SCALE)]
    else:
        names = list(HEADLINE)
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in names:
        qd = registry.get(name)
        if qd is None:
            continue
        t0 = time.time()
        try:
            df = qd.fn(spark, sf_dir)
            n = df.count()  # full execution; avoids driver-side collect cost
        except Exception as exc:  # noqa: BLE001
            errors[name] = str(exc).split("\n", 1)[0][:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)
        # Inter-query isolation (OUTSIDE the timed region): release the
        # localCheckpoint blocks this query pinned in the BlockManager.
        # Every query rebuilds its temp views from scratch on call, so
        # nothing later reads them — but left in place they accumulate
        # across the ~300-query session (the r9 checkpoint-based
        # optimizations made this visible: pinned shingle/gram blocks
        # from the text family evicted and GC-thrashed later queries,
        # inflating untouched queries up to 10x late in the run;
        # standalone timings were unaffected). Each query still pays
        # its OWN materialization cost inside its timed region.
        try:
            for prdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                prdd.unpersist()
            spark.catalog.clearCache()
        except Exception as exc:  # noqa: BLE001
            print(f"# post-{name} release failed: {exc}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf

    # Full per-query map goes to a local artifact; the final stdout line must
    # stay compact because the driver parses only a bounded tail of the output
    # (BENCH_r05 came back "parsed": null when the line carried 119 entries).
    local = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": sf_val,
        "n_queries": len(timings),
        "registry_load_sec": registry_load_sec,
        "mode": "headline-core" if core_mode else "full",
    }
    local_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"
    )
    try:
        with open(local_path, "w") as fh:
            json.dump(local, fh, indent=1, sort_keys=True)
        print(f"# per-query timings -> {local_path}", file=sys.stderr)
    except OSError as exc:
        print(f"# could not write {local_path}: {exc}", file=sys.stderr)

    # Compact stdout line: totals + only the 13 queries recorded in the
    # round-1 BASELINE (BENCH_r01.json), so the driver can still compute the
    # vs-baseline ratio per query without overflowing its tail capture.
    baseline_queries = {k: v for k, v in timings.items() if k in BASELINE_SET}
    out = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": baseline_queries,
        "sf": sf_val,
        "n_queries": len(timings),
        "n_errors": len(errors),
        "baseline_total": round(sum(baseline_queries.values()), 3),
        "mode": "headline-core" if core_mode else "full",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
