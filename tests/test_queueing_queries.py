"""Invariant checks for batch 86 (q496-q500, queueing & capacity)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_littles_law_holds_approximately(spark, sf_dir):
    row = REGISTRY["q496_littles_law"].fn(spark, sf_dir).collect()[0]
    assert row["lambda_per_h"] > 0
    assert row["w_hours"] > 0
    # stationary-ish synthetic feed: snapshot L tracks lambda*W within 50%
    assert row["abs_gap"] <= max(0.5 * row["l_littles"], 0.5)


def test_erlang_c_monotone_in_agents(spark, sf_dir):
    rows = sorted(
        REGISTRY["q497_erlang_c_staffing"].fn(spark, sf_dir).collect(),
        key=lambda r: r["agents"],
    )
    assert rows, "at least one stable staffing row"
    for r in rows:
        assert 0.0 < r["utilization"] < 1.0
        assert 0.0 <= r["p_wait"] <= 1.0
        assert r["asa_minutes"] >= 0.0
    # more agents -> less waiting
    pw = [r["p_wait"] for r in rows]
    assert pw == sorted(pw, reverse=True)


def test_headroom_monotone_in_capacity(spark, sf_dir):
    rows = sorted(
        REGISTRY["q498_capacity_headroom"].fn(spark, sf_dir).collect(),
        key=lambda r: r["capacity_per_h"],
    )
    assert len(rows) == 3
    over = [r["hours_over_capacity"] for r in rows]
    assert over == sorted(over, reverse=True)
    for r in rows:
        assert r["p50"] <= r["p95"] <= r["pmax"]


def test_burst_episodes_consistent(spark, sf_dir):
    row = REGISTRY["q499_burst_episodes"].fn(spark, sf_dir).collect()[0]
    assert row["n_episodes"] >= 0
    assert row["longest_hours"] <= row["total_burst_hours"]
    if row["n_episodes"] > 0:
        assert row["longest_hours"] >= 1


def test_autoscaling_lag_costs(spark, sf_dir):
    row = REGISTRY["q500_autoscaling_sim"].fn(spark, sf_dir).collect()[0]
    # lazy scale-down can only add instance-hours
    assert row["provisioned_instance_hours"] >= row["ideal_instance_hours"]
    assert row["overprovision_share"] >= 0.0
    assert row["hours_underprovisioned"] >= 0
