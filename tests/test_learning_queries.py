"""Semantic checks for learning batch 15 (q244-q249): numpy parity for
the conformal OLS fit and CUPED moments, the conformal coverage
guarantee, a planted-signal sanity check on the naive-Bayes confusion
matrix, DSIR score directionality, cross-correlation vs numpy, and the
blocked-ER subset relation against the unblocked pair set."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def _bucket16(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def test_conformal_fit_and_coverage(spark, sf_dir):
    row = REGISTRY["q245_conformal_interval"].fn(spark, sf_dir).collect()[0]
    pdf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity", "l_extendedprice")
        .toPandas()
    )
    key = (
        pdf.l_orderkey.astype(str)
        + "-"
        + pdf.l_linenumber.astype(str)
        + "-"
        + pdf.l_partkey.astype(str)
    )
    bucket = key.map(_bucket16)
    part = np.where(bucket < 39322, "train", np.where(bucket < 52429, "calib", "test"))
    tr = pdf[part == "train"]
    assert row["n_train"] == len(tr)
    assert row["n_calib"] == (part == "calib").sum()
    assert row["n_test"] == (part == "test").sum()
    # numpy OLS on the train split reproduces the implied predictions
    slope, icept = np.polyfit(tr.l_quantity, tr.l_extendedprice, 1)
    ca = pdf[part == "calib"]
    r = np.round(np.abs(ca.l_extendedprice - (icept + slope * ca.l_quantity)), 6)
    k = min(int(np.ceil(0.9 * (len(ca) + 1))), len(ca))
    qhat_np = np.sort(r.to_numpy())[k - 1]
    assert abs(row["qhat"] - qhat_np) < 1e-3
    # split conformal guarantee: coverage ~ 0.9 (finite-sample wiggle)
    assert 0.85 <= row["coverage"] <= 0.95


def test_naive_bayes_confusion_structure(spark, sf_dir):
    rows = REGISTRY["q246_naive_bayes_langid"].fn(spark, sf_dir).collect()
    total = sum(r["n_docs"] for r in rows)
    correct = sum(r["n_docs"] for r in rows if r["true_lang"] == r["pred_lang"])
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").toPandas()
    test_mask = docs.doc_id.astype(str).map(_bucket16) >= 52429
    test_langs = docs.lang[test_mask]
    # the matrix partitions the md5 test split exactly
    assert total == int(test_mask.sum())
    per_true = {}
    for r in rows:
        per_true[r["true_lang"]] = per_true.get(r["true_lang"], 0) + r["n_docs"]
    assert per_true == test_langs.value_counts().to_dict()
    # the synthetic corpus draws every lang from ONE shared vocabulary
    # (no lexical signal), so NB cannot beat the majority-class prior
    # by much — but it must not do WORSE than it either (the priors
    # are part of the model)
    majority = int(test_langs.value_counts().max())
    assert correct >= majority - max(2, total // 20)
    langs = {r["true_lang"] for r in rows} | {r["pred_lang"] for r in rows}
    assert langs <= {"en", "zh", "de", "es", "fr"}


def test_dsir_scores_favor_target_language(spark, sf_dir):
    out = REGISTRY["q244_dsir_resample"].fn(spark, sf_dir).toPandas()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang").toPandas()
    n_en = (docs.lang == "en").sum()
    kept_en = (out.lang == "en").sum()
    # the kept (score>0) set must be enriched in the target language
    assert kept_en / max(len(out), 1) > n_en / len(docs)
    # and every kept row really has a positive score
    assert (out.dsir_score > 0).all()


def test_xcorr_matches_numpy(spark, sf_dir):
    rows = REGISTRY["q247_xcorr_lags"].fn(spark, sf_dir).collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("day", "ts").cast("date").alias("day"), "event_type")
        .toPandas()
    )
    daily = (
        ev.assign(x=(ev.event_type == "click").astype(int), y=(ev.event_type == "purchase").astype(int))
        .groupby("day")[["x", "y"]]
        .sum()
        .sort_index()
    )
    for r in rows:
        lag = r["lag"]
        x = daily.x.to_numpy()[: len(daily) - lag]
        y = daily.y.to_numpy()[lag:]
        assert r["n_days"] == len(x)
        expected = np.corrcoef(x, y)[0, 1]
        assert abs(r["xcorr"] - expected) < 1e-6


def test_blocked_er_is_subset_of_exact(spark, sf_dir):
    out = REGISTRY["q248_blocked_entity_resolution"].fn(spark, sf_dir).toPandas()
    names = (
        load_table(spark, sf_dir, "part").select("p_name").distinct().toPandas().p_name.tolist()
    )

    def lev(a: str, b: str) -> int:
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    exact = {
        (a, b)
        for a in names
        for b in names
        if a < b and lev(a, b) <= 3
    }
    got = {(r.name_a, r.name_b) for r in out.itertuples()}
    # blocking can only MISS pairs whose first 4 chars differ
    assert got <= exact
    missed = exact - got
    assert all(a[:4] != b[:4] for a, b in missed)
    # and within-block recall is total
    assert all((a, b) in got for a, b in exact if a[:4] == b[:4])


def test_cuped_matches_numpy(spark, sf_dir):
    row = REGISTRY["q249_cuped"].fn(spark, sf_dir).collect()[0]
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "value")
        .toPandas()
    )
    cut = np.datetime64("2024-01-16T00:00:00")
    ev["pre"] = np.where(ev.ts.to_numpy() < cut, ev.value, 0.0)
    ev["post"] = np.where(ev.ts.to_numpy() >= cut, ev.value, 0.0)
    per = ev.groupby("user_id")[["pre", "post"]].sum()
    grp = np.array(
        ["treat" if _bucket16(str(u)) < 32768 else "control" for u in per.index]
    )
    theta = np.cov(per.pre, per.post, ddof=1)[0, 1] / np.var(per.pre, ddof=1)
    assert row["n_users"] == len(per)
    assert row["n_treat"] == (grp == "treat").sum()
    assert abs(row["theta"] - theta) < 1e-4
    raw = per.post[grp == "treat"].mean() - per.post[grp == "control"].mean()
    cuped = raw - theta * (
        per.pre[grp == "treat"].mean() - per.pre[grp == "control"].mean()
    )
    assert abs(row["effect_raw"] - raw) < 1e-3
    assert abs(row["effect_cuped"] - cuped) < 1e-3
    rho2 = np.corrcoef(per.pre, per.post)[0, 1] ** 2
    assert abs(row["var_reduction"] - rho2) < 1e-4
