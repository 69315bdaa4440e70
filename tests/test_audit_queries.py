"""Semantic checks for audit batch 17 (q255-q259): majority-repair
support arithmetic, the IV identity, reconciliation counts, MMR
numpy parity (the rows-only query's semantic pin), and SSSP vs a
pure-Python Bellman-Ford."""

import numpy as np
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.audit import _mmr_select
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_fd_violations_majority_math(spark, sf_dir):
    out = REGISTRY["q255_fd_violations"].fn(spark, sf_dir).toPandas()
    p = load_table(spark, sf_dir, "part").select("p_name", "p_brand").toPandas()
    for r in out.head(5).itertuples():
        sub = p[p.p_name == r.p_name]
        assert r.n_rows == len(sub)
        assert r.n_distinct_brands == sub.p_brand.nunique()
        counts = sub.p_brand.value_counts()
        top = counts.max()
        # majority is one of the max-count brands, lexicographically first
        winners = sorted(counts[counts == top].index)
        assert r.majority_brand == winners[0]
        assert abs(r.majority_support - top / len(sub)) < 1e-5


def test_woe_iv_identity(spark, sf_dir):
    out = REGISTRY["q256_woe_iv"].fn(spark, sf_dir).toPandas()
    # IV identity: iv_term == (good_share - bad_share) * woe, and the
    # shares rebuild from the counts
    g, b = out.n_good.sum(), out.n_bad.sum()
    gs = (out.n_good + 0.5) / g
    bs = (out.n_bad + 0.5) / b
    np.testing.assert_allclose(out.woe, np.round(np.log(gs / bs), 7), atol=1e-7)
    np.testing.assert_allclose(out.iv_term, np.round((gs - bs) * out.woe, 9), atol=1e-9)
    assert (out.bin.sort_values().to_numpy() == np.arange(len(out))).all()


def test_reconciliation_counts(spark, sf_dir):
    out = REGISTRY["q257_reconciliation_drift"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n_orders_with_lines = (
        o.join(li.select("l_orderkey").distinct(), o.o_orderkey == F.col("l_orderkey"))
        .count()
    )
    assert out.n_orders.sum() == n_orders_with_lines
    assert (out.n_reconciled <= out.n_orders).all()
    assert (out.mean_abs_drift >= 0).all()


def test_mmr_matches_pure_python_replay(spark, sf_dir):
    """Recompute candidates + the quantized-integer greedy from scratch
    (left-fold cosine, ROUND(.,6)*1e6 micro-units, exact bigint scores)
    and compare with the SQL unroll — the semantic pin for the
    hash-verified query. Scores are exact integers / 1e7, so equality
    is ==, not allclose."""
    out = REGISTRY["q258_mmr_rerank"].fn(spark, sf_dir).toPandas()
    emb = load_table(spark, sf_dir, "embeddings").toPandas()
    V = np.stack(emb.embedding.to_numpy()).astype("float64")
    ids = emb.vec_id.to_numpy()
    import math

    import pandas as pd

    def cos_u(a, b):
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return int(round(round(dot / (math.sqrt(na) * math.sqrt(nb)), 6) * 1e6))

    for pid in range(5):
        pv = V[ids == pid][0]
        rel_u = {int(ids[i]): cos_u(V[i], pv) for i in range(len(ids)) if ids[i] != pid}
        order = sorted(rel_u, key=lambda v: (-rel_u[v], v))[:30]
        pdf = pd.DataFrame(
            {
                "probe_id": pid,
                "vec_id": order,
                "rel_u": [rel_u[v] for v in order],
                "embedding": [V[ids == v][0] for v in order],
            }
        )
        expect = _mmr_select(pdf)
        got = out[out.probe_id == pid].sort_values("rank").reset_index(drop=True)
        assert got.vec_id.tolist() == expect.vec_id.tolist()
        assert got.mmr_score.tolist() == expect.mmr_score.tolist()
        # a diversified list never repeats an item
        assert len(got) == 10 and got.vec_id.nunique() == 10


def test_sssp_matches_python_bellman_ford(spark, sf_dir):
    out = REGISTRY["q259_bounded_sssp"].fn(spark, sf_dir).toPandas()
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .toPandas()
    )
    from collections import defaultdict

    by_order = defaultdict(set)
    for r in li.itertuples():
        by_order[r.l_orderkey].add(r.l_partkey)
    cnt = defaultdict(int)
    for parts in by_order.values():
        ps = sorted(parts)
        for i, u in enumerate(ps):
            for v in ps:
                if u != v:
                    cnt[(u, v)] += 1
    edges = {(u, v): round(1.0 / c, 6) for (u, v), c in cnt.items()}
    dist = {0: 0.0}
    for _ in range(3):
        nxt = dict(dist)
        for (u, v), w in edges.items():
            if u in dist:
                cand = dist[u] + w
                if v not in nxt or cand < nxt[v]:
                    nxt[v] = cand
        dist = nxt
    got = dict(zip(out.partkey, out.dist))
    assert set(got) == set(dist)
    for node, d in dist.items():
        assert abs(got[node] - round(d, 6)) < 2e-6, node
