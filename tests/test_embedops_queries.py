"""Invariant checks for batch 72 (q427-q431)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_margin_mining_cross_label_only(spark, sf_dir):
    rows = REGISTRY["q427_bitext_margin_mining"].fn(spark, sf_dir).collect()
    assert 0 < len(rows) <= 15
    margins = [r["margin"] for r in rows]
    assert margins == sorted(margins, reverse=True)
    for r in rows:
        assert r["label_a"] != r["label_b"]
        assert r["vec_a"] < r["vec_b"]
        # margin normalizes by kNN mean: a mined pair beats its
        # neighborhoods, so margin ~ 1 area or above for the top list
        assert r["margin"] > 0.5


def test_memorization_risk_is_sorted_tail(spark, sf_dir):
    rows = REGISTRY["q428_memorization_risk"].fn(spark, sf_dir).collect()
    iso = [r["isolation"] for r in rows]
    assert iso == sorted(iso, reverse=True)
    assert all(0 <= x <= 2 for x in iso)


def test_shard_balance_hash_beats_range_or_ties(spark, sf_dir):
    rows = {r["strategy"]: r for r in REGISTRY["q429_shard_balance"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"hash", "range"}
    for r in rows.values():
        assert r["n_shards"] == 16
        assert r["max_over_mean"] >= 1.0
        assert r["min_mass"] <= r["max_mass"]


def test_loss_mask_fraction_matches_split(spark, sf_dir):
    rows = REGISTRY["q430_loss_mask_stats"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        # prompt = first 2/5 (floored per doc): trainable ~ 3/5
        assert 0.55 < r["trainable_frac"] < 0.7
        assert r["masked_tokens"] < r["total_tokens"]


def test_dedup_sweep_monotone(spark, sf_dir):
    rows = REGISTRY["q431_dedup_threshold_sweep"].fn(spark, sf_dir).collect()
    ths = [r["threshold"] for r in rows]
    assert ths == sorted(ths)
    drops = [r["docs_dropped"] for r in rows]
    # raising the threshold can only drop fewer docs
    assert drops == sorted(drops, reverse=True)
    # q197 parity at its threshold: the 0.25-adjacent point dominates
    assert all(0 <= r["drop_rate"] <= 1 for r in rows)
