"""Invariant checks for batch 40 (q319-q320): estimator identities
the per-query oracles can't see."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_ips_snips_identities(spark, sf_dir):
    out = REGISTRY["q319_offpolicy_eval"].fn(spark, sf_dir).toPandas()
    assert len(out) == 5
    # propensities partition: sum to 1
    assert abs(out.propensity.sum() - 1.0) < 1e-4
    # IPS scores against the DECLARED uniform logging policy (p = 1/k)
    # while SNIPS is the matched mean, so the exact identity is
    # ips = snips * (n_a * k / n) — the empirical/declared propensity
    # ratio (r7: the previous empirical-propensity IPS coincided with
    # SNIPS and carried no information)
    k = len(out)
    n = out.n_match.sum()
    want = out.snips_value * (out.n_match * k / n)
    assert (out.ips_value - want).abs().max() < 1e-3
    assert (out.n_match == out.effective_sample_size).all()
    n = load_table(spark, sf_dir, "events").count()
    assert out.n_match.sum() == n


def test_dr_reduces_to_model_mean_plus_residual(spark, sf_dir):
    dr = (
        REGISTRY["q320_doubly_robust"].fn(spark, sf_dir)
        .orderBy("policy_action")
        .toPandas()
    )
    ips = (
        REGISTRY["q319_offpolicy_eval"].fn(spark, sf_dir)
        .orderBy("policy_action")
        .toPandas()
    )
    assert len(dr) == 5
    n = load_table(spark, sf_dir, "events").count()
    assert (dr.n_terms == n).all()
    # DR should land near SNIPS for these policies (model is well
    # specified per segment; residual term corrects the rest)
    diff = (dr.dr_value - ips.snips_value).abs()
    assert diff.max() < 0.1
    assert (dr.dr_value > 0).all()
