"""Semantic invariants for batch 195 (q1042-q1046, DORA delivery
metrics) beyond the oracle hash gate, on sf0.001."""

from __future__ import annotations

from flightdb_spark.queries import load_registry

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def test_deployment_frequency_census(spark, sf_dir):
    df = run("q1042_deployment_frequency", spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_purch = ev.filter("event_type = 'purchase'").count()
    assert df.n_deploys.sum() == n_purch
    assert df.period_total.iloc[0] == n_purch
    # intensity class matches the literal thresholds
    for _, r in df.iterrows():
        expect = (
            "elite" if r.n_deploys >= 10
            else "high" if r.n_deploys >= 5
            else "medium" if r.n_deploys >= 1 else "low"
        )
        assert r.intensity == expect


def test_lead_time_positive_and_bounded(spark, sf_dir):
    df = run("q1043_lead_time", spark, sf_dir)
    assert (df.lead_sum_us > 0).all()
    assert (df.lead_max_us * df.n_deploys >= df.lead_sum_us).all()
    # mean reconstructs from the exact sum
    expect = df.lead_sum_us / df.n_deploys / 1e6
    assert ((df.mean_lead_sec - expect).abs() < 1e-9).all()


def test_mttr_excludes_unresolved(spark, sf_dir):
    df = run("q1044_mttr", spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n_err = ev.filter("event_type = 'error'").count()
    assert df.n_incidents.sum() == n_err
    resolved = df.n_incidents - df.n_unresolved
    # mttr defined exactly where something resolved
    has = df[resolved > 0]
    assert (has.restore_sum_us > 0).all()
    assert (has.mttr_sec > 0).all()


def test_cfr_bounded_and_consistent(spark, sf_dir):
    df = run("q1045_change_failure_rate", spark, sf_dir)
    assert (df.n_failed <= df.n_deploys).all()
    assert ((df.change_failure_rate >= 0) & (df.change_failure_rate <= 1)).all()
    freq = run("q1042_deployment_frequency", spark, sf_dir)
    assert df.n_deploys.sum() == freq.period_total.iloc[0]


def test_scorecard_composes_dailies(spark, sf_dir):
    sc = run("q1046_delivery_scorecard", spark, sf_dir).iloc[0]
    lead = run("q1043_lead_time", spark, sf_dir)
    cfr = run("q1045_change_failure_rate", spark, sf_dir)
    assert sc.lead_sum_us == lead.lead_sum_us.sum()
    assert sc.lead_n == lead.n_deploys.sum()
    assert sc.failed_n == cfr.n_failed.sum()
    assert sc.deploy_n == cfr.n_deploys.sum()
    # votes match their cross-product definitions
    assert sc.vote_frequency == int(sc.total_deploys >= 5 * sc.active_days)
    assert sc.vote_cfr == int(sc.failed_n * 100 < 15 * sc.deploy_n)
