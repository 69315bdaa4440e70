"""Semantic checks for mining batch 13 (q229-q235): pandas/numpy parity
for the rank statistics, KMV estimator behavior, planted span
corruption, a fabricated conflict scenario, k-core vs a pure-Python
peeling reference, and the Brier decomposition identity."""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_spearman_matches_pandas(spark, sf_dir):
    out = REGISTRY["q229_spearman"].fn(spark, sf_dir).collect()[0]
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_extendedprice")
        .toPandas()
    )
    expected = pdf["l_quantity"].rank().corr(pdf["l_extendedprice"].rank())
    assert out["n"] == len(pdf)
    assert abs(out["spearman_rho"] - expected) < 1e-6


def test_kendall_matches_pandas(spark, sf_dir):
    out = REGISTRY["q230_kendall_tau"].fn(spark, sf_dir).collect()[0]
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_linenumber")
        .toPandas()
    )
    # tau-b from the contingency table (pandas' kendall needs scipy,
    # which is absent here)
    ct = pd.crosstab(pdf["l_quantity"].astype(int), pdf["l_linenumber"].astype(int))
    M = ct.to_numpy().astype(float)
    C = D = 0.0
    r, c = M.shape
    for i in range(r):
        for j in range(c):
            C += M[i, j] * M[i + 1 :, j + 1 :].sum()
            D += M[i, j] * M[i + 1 :, :j].sum()
    n = M.sum()
    tx = M.sum(axis=1)
    ty = M.sum(axis=0)
    n0 = n * (n - 1) / 2
    n1 = (tx * (tx - 1) / 2).sum()
    n2 = (ty * (ty - 1) / 2).sum()
    expected = (C - D) / np.sqrt((n0 - n1) * (n0 - n2))
    assert out["n"] == len(pdf)
    assert abs(out["kendall_tau_b"] - expected) < 1e-6


def test_kmv_exact_fallback_and_merged(spark, sf_dir):
    from flightdb_spark.queries.mining3 import KMV_K

    rows = {r["grp"]: r for r in REGISTRY["q231_kmv_ndv"].fn(spark, sf_dir).collect()}
    assert "ALL" in rows
    exact_all = rows["ALL"]["exact_ndv"]
    # per-month exact NDVs must partition-consistently bound the union
    months = [r for g, r in rows.items() if g != "ALL"]
    assert sum(r["exact_ndv"] for r in months) >= exact_all
    for r in months:
        if r["exact_ndv"] < KMV_K:
            # under k the sketch IS the exact count
            assert r["est_ndv"] == float(r["exact_ndv"])
            assert r["rel_err"] == 0.0
    if exact_all >= KMV_K:
        # KMV with k=64: standard error ~ 1/sqrt(k-2) ≈ 13%; allow 3 sigma
        assert abs(rows["ALL"]["rel_err"]) < 0.4


def _gate(doc_id: int, pos: int, mod: int) -> bool:
    h = hashlib.md5(f"{doc_id}:{pos}".encode()).hexdigest()[:4]
    return int(h, 16) % mod == 0


def test_span_corruption_planted(spark):
    """Replicate the md5 gate in Python on a hand-built doc and check
    masked/target reconstruction exactly."""
    import flightdb_spark.queries.mining3 as m3

    toks = [f"w{i}" for i in range(30)]
    docs = spark.createDataFrame([(7, " ".join(toks))], "doc_id long, text string")
    orig = m3.load_table
    m3.load_table = lambda s, d, n: docs
    try:
        out = REGISTRY["q232_span_corruption"].fn(spark, "x").collect()[0]
    finally:
        m3.load_table = orig
    starts = [
        p
        for p in range(0, 30, m3.CORRUPT_SPAN)
        if p + m3.CORRUPT_SPAN <= 30 and _gate(7, p, m3.CORRUPT_MOD)
    ]
    masked, targets, i = [], [], 0
    p = 0
    sidx = {s: k for k, s in enumerate(starts)}
    while p < 30:
        if p in sidx:
            masked.append(f"<extra_id_{sidx[p]}>")
            targets.append(
                " ".join(
                    f"<extra_id_{sidx[p]}> {toks[q]}" if q == p else toks[q]
                    for q in range(p, p + 3)
                )
            )
            p += 3
        else:
            masked.append(toks[p])
            p += 1
    md5 = lambda t: hashlib.md5(t.encode()).hexdigest()
    assert out["n_tokens"] == 30
    assert out["n_spans"] == len(starts)
    assert out["n_masked"] == 3 * len(starts)
    assert out["masked_hash"] == md5(" ".join(masked))
    # target layout: '<extra_id_k> t1 t2 t3' per span, space-joined in
    # span order
    expected_targets = " ".join(
        f"<extra_id_{sidx[s]}> " + " ".join(toks[s : s + 3]) for s in starts
    )
    assert out["targets_hash"] == md5(expected_targets)


def test_separation_conflicts_fabricated(spark):
    """Two flights co-located in one slot conflict; a distant third
    does not; pairs are canonically ordered."""
    import datetime as dt

    import flightdb_spark.queries.mining3 as m3

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # flights 1 and 2: ~1.1 km apart, same minute, same altitude band
        (1, t0, 37.50, -122.00, 5000.0),
        (2, t0 + dt.timedelta(seconds=30), 37.51, -122.00, 5500.0),
        # flight 3: far away same slot
        (3, t0, 38.40, -121.00, 5000.0),
        # flights 1 and 2 again but in a different slot, far apart
        (1, t0 + dt.timedelta(hours=1), 37.50, -122.00, 5000.0),
        (2, t0 + dt.timedelta(hours=2), 37.50, -122.00, 5000.0),
    ]
    tp = spark.createDataFrame(
        rows, "flight_id long, ts timestamp, lat double, lon double, alt_ft double"
    )
    orig = m3.synth_trackpoints
    m3.synth_trackpoints = lambda s, d: tp
    try:
        out = REGISTRY["q233_separation_conflicts"].fn(spark, "x").collect()
    finally:
        m3.synth_trackpoints = orig
    pairs = {(r["flight_a"], r["flight_b"]): r for r in out}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)]["n_slots"] == 1
    assert 1.0 < pairs[(1, 2)]["min_d_km"] < 1.3


def _py_kcore(edges, k):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def test_kcore_against_python_reference(spark):
    from flightdb_spark.queries.mining3 import kcore

    # K4 clique + a pendant path + a triangle: 3-core = the clique only
    edges = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
        (4, 5), (5, 6),                                   # path
        (7, 8), (8, 9), (7, 9),                           # triangle
    ]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["degree"] for r in kcore(df, 3).collect()}
    assert got == _py_kcore(edges, 3)
    assert set(got) == {1, 2, 3, 4}
    # 2-core keeps the triangle too, drops the path
    got2 = {r["node"]: r["degree"] for r in kcore(df, 2).collect()}
    assert got2 == _py_kcore(edges, 2)
    assert set(got2) == {1, 2, 3, 4, 7, 8, 9}


def test_kcore_registry_runs(spark, sf_dir):
    rows = REGISTRY["q234_kcore"].fn(spark, sf_dir).collect()
    from flightdb_spark.queries.mining3 import KCORE_K

    for r in rows:
        assert r["degree"] >= KCORE_K


def test_brier_decomposition(spark, sf_dir):
    out = REGISTRY["q235_brier"].fn(spark, sf_dir).collect()[0]
    pdf = load_table(spark, sf_dir, "events").select("value", "event_type").toPandas()
    conf = pdf["value"] / 100.0
    y = (pdf["event_type"] == "purchase").astype(float)
    assert abs(out["brier"] - float(((conf - y) ** 2).mean())) < 1e-5
    assert out["reliability"] >= 0 and out["resolution"] >= 0
    assert 0 <= out["uncertainty"] <= 0.25
    # Murphy identity holds up to within-bin confidence variance
    bins = np.minimum((conf * 10).astype(int), 9)
    wbv = float(
        pd.DataFrame({"b": bins, "c": conf}).groupby("b")["c"].var(ddof=0).fillna(0).mul(
            pd.Series(bins).value_counts(normalize=True).sort_index()
        ).sum()
    )
    # the exact identity also carries a within-bin conf-outcome
    # covariance term; wbv bounds it, so allow a small residual
    lhs = out["brier"]
    rhs = out["reliability"] - out["resolution"] + out["uncertainty"] + wbv
    assert abs(lhs - rhs) < 0.01
