"""Semantic invariants for batch 190 (q1017-q1021, CPM/PERT) beyond
the oracle hash gate, on sf0.001 — including a from-scratch
pure-Python longest-path replay."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.cpm import ACTS, EDGES

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def _python_cpm(durs):
    """From-scratch forward pass over the literal DAG."""
    preds = {}
    for u, v in EDGES:
        preds.setdefault(v, []).append(u)
    es = {a: 0 for a, *_ in ACTS}
    for _ in range(len(ACTS)):
        for a, *_ in ACTS:
            es[a] = max(
                [es[u] + durs[u] for u in preds.get(a, [])] or [0]
            )
    return es


def test_forward_pass_matches_python(spark, sf_dir):
    df = run("q1017_cpm_forward", spark, sf_dir).set_index("activity")
    durs = df.dur.to_dict()
    es = _python_cpm(durs)
    for a, v in es.items():
        assert df.loc[a, "es"] == v
    assert (df.ef == df.es + df.dur).all()
    assert df.makespan.nunique() == 1
    assert df.makespan.iloc[0] == max(es[a] + durs[a] for a in es)


def test_slack_nonnegative_and_critical_chain(spark, sf_dir):
    df = run("q1018_cpm_slack", spark, sf_dir)
    assert (df.total_float >= 0).all()
    crit = df[df.is_critical == 1].sort_values("es")
    # a critical chain exists from project start to project end
    assert crit.es.iloc[0] == 0
    assert len(crit) >= 2
    # consecutive critical activities chain without idle time
    assert (crit.es.values[1:] == crit.ef.values[:-1]).all()


def test_crash_saves_only_on_critical(spark, sf_dir):
    sens = run("q1019_crash_sensitivity", spark, sf_dir).set_index(
        "crashed_activity"
    )
    slack = run("q1018_cpm_slack", spark, sf_dir).set_index("activity")
    base = sens.loc["baseline"]
    assert base.saved_hours == 0
    for a in slack.index:
        if slack.loc[a, "is_critical"] == 0:
            # crashing a non-critical activity never shortens the project
            assert sens.loc[a, "saved_hours"] == 0
    # at least one critical activity actually saves time
    crit = [a for a in slack.index if slack.loc[a, "is_critical"] == 1]
    assert any(sens.loc[a, "saved_hours"] > 0 for a in crit)


def test_pert_units_exact(spark, sf_dir):
    df = run("q1020_pert_estimates", spark, sf_dir)
    assert (df.te6 == df.o_hours + 4 * df.m_hours + df.p_hours).all()
    assert (df.var36 == (df.p_hours - df.o_hours) ** 2).all()
    assert (df.o_hours <= df.m_hours).all()
    assert (df.m_hours < df.p_hours).all()
    crit = df[df.is_critical == 1]
    assert df.critical_te6.iloc[0] == crit.te6.sum()
    assert df.critical_var36.iloc[0] == crit.var36.sum()


def test_resource_histogram_conserves(spark, sf_dir):
    df = run("q1021_resource_histogram", spark, sf_dir).sort_values("from_hour")
    # WIP starts at >=1 (intake begins at 0), ends at 0 (all complete)
    assert df.wip.iloc[-1] == 0
    assert (df.wip >= 0).all()
    peak = df.wip.max()
    assert ((df.wip == peak) == (df.is_peak == 1)).all()
    # total activity-hours = sum of wip * interval length
    sched = run("q1017_cpm_forward", spark, sf_dir)
    area = (
        (df.to_hour - df.from_hour) * df.wip
    ).sum()
    assert area == sched.dur.sum()
