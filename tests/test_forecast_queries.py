"""Semantic checks for batch 18 (q260-q263): KMV set-algebra accuracy,
Holt recurrence Python parity (the rows-only pin), rolling z-score
reconstruction, and the Laplace release's mean-preservation bound."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.forecast import _holt_forecast
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_kmv_set_ops_accuracy(spark, sf_dir):
    row = REGISTRY["q260_kmv_set_ops"].fn(spark, sf_dir).collect()[0]
    # inclusion-exclusion identities hold exactly on the exact side
    assert row["exact_inter"] == row["exact_a"] + row["exact_b"] - row["exact_union"]
    assert row["exact_union"] <= row["exact_a"] + row["exact_b"]
    # KMV relative error ~ 1/sqrt(k-1) = 0.26 at k=16; allow 4 sigma
    for est, exact in (
        (row["est_a"], row["exact_a"]),
        (row["est_b"], row["exact_b"]),
        (row["est_union"], row["exact_union"]),
    ):
        if exact >= 16:
            assert abs(est - exact) / exact < 4 / np.sqrt(15)
        else:
            assert est == float(exact)


def test_holt_matches_python(spark, sf_dir):
    out = REGISTRY["q261_holt_forecast"].fn(spark, sf_dir).toPandas()
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("v")
        )
        .toPandas()
    )
    for et, grp in daily.groupby("event_type"):
        expect = _holt_forecast(grp.assign(event_type=et))
        got = out[out.event_type == et].sort_values("h")
        assert got.h.tolist() == list(range(1, 8))
        np.testing.assert_allclose(got.yhat.to_numpy(), expect.yhat.to_numpy(), atol=1e-6)
    # forecasts extrapolate linearly: second differences are ~0
    for et, grp in out.groupby("event_type"):
        y = grp.sort_values("h").yhat.to_numpy()
        np.testing.assert_allclose(np.diff(y, 2), 0, atol=1e-3)


def test_rolling_zscore_reconstruction(spark, sf_dir):
    out = REGISTRY["q262_rolling_zscore"].fn(spark, sf_dir).toPandas()
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
            .cast("double")
            .alias("v")
        )
        .toPandas()
    )
    assert (out.zscore.abs() > 1.5).all()
    for r in out.head(5).itertuples():
        sub = daily[daily.event_type == r.event_type].sort_values("day")
        v = sub.v.to_numpy()
        days = sub.day.tolist()
        i = days.index(r.day)
        assert i >= 6
        win = v[i - 6 : i + 1]
        z = (v[i] - win.mean()) / win.std(ddof=1)
        assert abs(r.zscore - z) < 1e-4


def test_dp_noise_is_laplace_shaped(spark, sf_dir):
    out = REGISTRY["q263_dp_noisy_counts"].fn(spark, sf_dir).toPandas()
    noise = out.noisy_n - out.n
    # Laplace(b=10): mean ~0 (25 samples, sd = b*sqrt(2)=14.1 -> sem ~2.8;
    # allow 4 sem), and reproducible across runs
    assert abs(noise.mean()) < 12
    out2 = REGISTRY["q263_dp_noisy_counts"].fn(spark, sf_dir).toPandas()
    assert (out.noisy_n.to_numpy() == out2.noisy_n.to_numpy()).all()
    # inverse-CDF sanity: recompute one row's noise from the hash
    r = out.iloc[0]
    u = int(
        hashlib.md5(f"{r.event_type}|{r.week}".encode()).hexdigest()[:15], 16
    ) / float(1 << 60)
    expect = round(-10.0 * np.sign(u - 0.5) * np.log(1 - 2 * abs(u - 0.5)), 7)
    assert abs((r.noisy_n - r.n) - round(expect, 4)) < 1e-3
