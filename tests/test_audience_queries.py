"""Invariant checks for batch 53 (q353-q355)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.audience import FREQ_CAP, IVF_K, SWEEP_PROBES
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_nprobe_sweep_monotone_to_perfect(spark, sf_dir):
    out = (
        REGISTRY["q353_ivf_nprobe_sweep"].fn(spark, sf_dir)
        .orderBy("nprobe")
        .toPandas()
    )
    assert list(out.nprobe) == SWEEP_PROBES
    # recall and scanned fraction both non-decreasing in nprobe
    assert (out.recall_at_5.diff().dropna() >= -1e-9).all()
    assert (out.candidate_frac.diff().dropna() >= -1e-9).all()
    # probing ALL cells is exhaustive search: recall must be 1
    assert abs(out.recall_at_5.iloc[-1] - 1.0) < 1e-9
    assert out.candidate_frac.iloc[-1] > 0.99


def test_reach_curve_identities(spark, sf_dir):
    out = REGISTRY["q354_reach_curve"].fn(spark, sf_dir).orderBy("d").toPandas()
    ev = load_table(spark, sf_dir, "events")
    n_users = ev.select("user_id").distinct().count()
    assert out.cumulative_reach.iloc[-1] == n_users
    assert (out.new_users + out.returning_users == out.active).all()
    assert (out.cumulative_reach.diff().dropna() >= 0).all()
    assert out.new_users.sum() == n_users


def test_frequency_cap_mass(spark, sf_dir):
    out = REGISTRY["q355_frequency_cap"].fn(spark, sf_dir).toPandas()
    ev = load_table(spark, sf_dir, "events")
    n_impr = ev.filter(F.col("event_type").isin("view", "click")).count()
    assert out.impressions.sum() == n_impr
    assert (out.weekly_frequency <= FREQ_CAP + 1).all()
    assert out.corpus_over_cap_frac.between(0, 1).all()
    # over-cap fraction consistent with the histogram itself
    over = (
        out[out.weekly_frequency == FREQ_CAP + 1].impressions.sum()
        - out[out.weekly_frequency == FREQ_CAP + 1].n_user_weeks.sum()
        * FREQ_CAP
    )
    got = out.corpus_over_cap_frac.iloc[0] * n_impr
    assert abs(got - max(over, 0)) < n_impr * 1e-4 + 1
