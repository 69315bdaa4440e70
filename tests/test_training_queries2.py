"""Semantic checks for the training-data batch-2 queries (q81-q86)
beyond the DuckDB value-parity gate: invariants of the operators
themselves that a co-refactored oracle could not catch."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_dup_spans_exact_duplicates_fully_flagged(spark, sf_dir):
    """A doc whose full text appears verbatim elsewhere in the corpus
    has EVERY span duplicated -> dup_frac must be exactly 1.0; and the
    fraction is always within [0, 1] with n_dup <= n_spans."""
    out = REGISTRY["q81_dup_spans"].fn(spark, sf_dir).cache()
    assert out.filter(F.col("n_dup") > F.col("n_spans")).count() == 0
    assert out.filter((F.col("dup_frac") < 0) | (F.col("dup_frac") > 1)).count() == 0

    from flightdb_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    dup_texts = (
        docs.groupBy("text").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") > 1)
    )
    dup_ids = docs.join(dup_texts.select("text"), "text").select("doc_id")
    flagged = out.join(dup_ids, "doc_id")
    # every duplicated doc long enough to have spans is fully flagged
    assert flagged.filter(F.col("dup_frac") < 1.0).count() == 0
    out.unpersist()


def test_bpe_pairs_shape_and_order(spark, sf_dir):
    rows = REGISTRY["q82_bpe_pairs"].fn(spark, sf_dir).collect()
    assert len(rows) == 30
    assert all(len(r["pair"]) == 2 for r in rows)
    counts = [r["n_pair"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0


def test_quantization_error_bounded_by_half_step(spark, sf_dir):
    """|val - dequant| <= step/2 per dimension by construction, so the
    per-vector MSE is bounded by (max_step/2)^2."""
    from flightdb_spark.tables import load_table

    e = load_table(spark, sf_dir, "embeddings").select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "val")
    )
    steps = e.groupBy("dim").agg(((F.max("val") - F.min("val")) / 255).alias("step"))
    max_step = steps.agg(F.max("step")).collect()[0][0]
    out = REGISTRY["q83_quantize_embeddings"].fn(spark, sf_dir)
    bound = (max_step / 2) ** 2 * 1.0001
    assert out.filter(F.col("mse") > bound).count() == 0
    assert out.filter(F.col("n_dims") != 64).count() == 0


def test_group_outliers_beyond_three_sigma(spark, sf_dir):
    """Every emitted event really lies outside mean +- 3*sd of its own
    group, recomputed independently with plain double aggregates."""
    from flightdb_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_pop("value").alias("sd")
    )
    out = REGISTRY["q84_group_outliers"].fn(spark, sf_dir)
    joined = out.join(stats, "event_type")
    # |z| from the query vs the reference stats can differ in the last
    # ulp; 2.99 still separates outliers from the bulk decisively
    bad = joined.filter(
        F.abs((F.col("value") - F.col("m")) / F.col("sd")) < 2.99
    )
    assert bad.count() == 0
    assert out.count() > 0


def test_rolling_revenue_matches_python_recount(spark, sf_dir):
    """Recompute the 7-day rolling sum in plain Python for the busiest
    customer and compare row for row."""
    out = REGISTRY["q85_rolling_revenue"].fn(spark, sf_dir)
    busiest = (
        out.groupBy("o_custkey")
        .count()
        .orderBy(F.desc("count"), "o_custkey")
        .first()["o_custkey"]
    )
    rows = out.filter(F.col("o_custkey") == busiest).collect()
    from flightdb_spark.tables import load_table

    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") == busiest)
        .select(
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("d"),
            F.round("o_totalprice", 2).alias("p"),
        )
        .collect()
    )
    by_key = {r["o_orderkey"]: r for r in orders}
    for r in rows:
        me = by_key[r["o_orderkey"]]
        expect = round(
            sum(
                float(o["p"])
                for o in orders
                if 0 <= (me["d"] - o["d"]).days <= 6
            ),
            2,
        )
        assert abs(r["revenue_7d"] - expect) < 1e-6


def test_pagerank_top20_descending_and_supplier_heavy(spark, sf_dir):
    """Suppliers connect to ~20x more parts than parts to suppliers, so
    the top of the rank must be supplier nodes; masses are positive and
    sorted."""
    rows = REGISTRY["q86_pagerank"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    masses = [r["rank_mass"] for r in rows]
    assert masses == sorted(masses, reverse=True)
    assert all(m > 0 for m in masses)
    assert rows[0]["node"].startswith("s")


def test_shard_assignment_partitions_everything(spark, sf_dir):
    """Every doc gets exactly one shard; positions within a shard are
    the contiguous sequence 1..|shard|."""
    from flightdb_spark.tables import load_table

    out = REGISTRY["q87_shard_assignment"].fn(spark, sf_dir).cache()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.count() == n_docs
    assert out.select("doc_id").distinct().count() == n_docs
    per_shard = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
    )
    assert per_shard.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1)).count() == 0
    out.unpersist()


def test_mix_temperature_flattens_shares(spark, sf_dir):
    """Temperature sampling moves every source's share toward uniform:
    over-represented sources shrink, under-represented ones grow, and
    the re-weighted shares still sum to ~1."""
    rows = REGISTRY["q88_mix_temperature"].fn(spark, sf_dir).collect()
    uniform = 1.0 / len(rows)
    for r in rows:
        if r["share"] > uniform * 1.05:
            assert r["temp_share"] < r["share"]
        elif r["share"] < uniform * 0.95:
            assert r["temp_share"] > r["share"]
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-3
    assert sum(r["target_n"] for r in rows) <= sum(r["n_docs"] for r in rows)


def test_hard_negatives_cross_label_and_truly_hardest(spark, sf_dir):
    """Every mined negative carries a different label than its probe,
    and no other cross-label vector is more similar."""
    from flightdb_spark.tables import load_table

    rows = REGISTRY["q89_hard_negatives"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["neighbor_label"] != r["query_label"] for r in rows)

    import math

    vecs = {
        r["vec_id"]: (list(r["embedding"]), r["label"])
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b)))

    for r in rows:
        qv, ql = vecs[r["query_id"]]
        best = max(
            (round(cos(qv, v), 6), -vid)
            for vid, (v, lb) in vecs.items()
            if lb != ql and vid != r["query_id"]
        )
        assert abs(best[0] - r["cos_sim"]) < 2e-6
        assert -best[1] == r["neighbor_id"] or abs(best[0] - r["cos_sim"]) < 2e-6


def test_audio_frame_stats_pinned(spark):
    """256-sample framing over a known payload: exact integer sums and
    the short final frame."""
    from flightdb_spark.multimodal import audio_frame_stats

    payload = bytes([2] * 256 + [4] * 100)  # 1 full frame + 100-sample tail
    df = spark.createDataFrame([(1, payload)], "media_id long, blob binary")
    rows = {r["frame_idx"]: r for r in audio_frame_stats(df).collect()}
    assert set(rows) == {0, 1}
    assert (rows[0]["n_samples"], rows[0]["sum_sq"]) == (256, 256 * 4)
    assert (rows[1]["n_samples"], rows[1]["sum_sq"]) == (100, 100 * 16)


def test_audio_energy_peak_is_true_max(spark, sf_dir):
    """peak_rms is the max over the recomputed per-frame RMS stream."""
    import math

    from flightdb_spark.multimodal import audio_frame_stats, synth_media
    from flightdb_spark.queries.multimodal import _docs

    media = synth_media(_docs(spark, sf_dir)).filter(F.col("kind") == "audio")
    frames = audio_frame_stats(media).collect()
    best = {}
    for r in frames:
        v = math.sqrt(r["sum_sq"] / r["n_samples"])
        best[r["media_id"]] = max(best.get(r["media_id"], 0.0), v)
    out = REGISTRY["q90_audio_energy"].fn(spark, sf_dir).collect()
    assert len(out) == len(best)
    for r in out:
        assert abs(r["peak_rms"] - round(best[r["media_id"]], 6)) < 1e-9
