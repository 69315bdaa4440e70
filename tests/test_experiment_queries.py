"""Invariant checks for batch 44 (q330-q333)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.experiment import _users
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_srm_counts_all_users(spark, sf_dir):
    row = REGISTRY["q330_srm_check"].fn(spark, sf_dir).collect()[0]
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert row["n_a"] + row["n_b"] == n_users
    assert row["chi2"] >= 0
    # md5 parity should be a clean split: no SRM on honest assignment
    assert row["srm_flag"] == 0


def test_welch_t_consistency(spark, sf_dir):
    row = REGISTRY["q331_welch_ttest"].fn(spark, sf_dir).collect()[0]
    # df is bounded by min(n)-1 .. n1+n2-2
    assert min(row["n_a"], row["n_b"]) - 1 <= row["welch_df"]
    assert row["welch_df"] <= row["n_a"] + row["n_b"] - 2
    # random split of one distribution: |t| should be modest
    assert abs(row["t_stat"]) < 5


def test_wilson_ci_bounds(spark, sf_dir):
    out = REGISTRY["q332_wilson_ci"].fn(spark, sf_dir).toPandas()
    assert len(out) == 2
    assert (out.wilson_lo >= 0).all() and (out.wilson_hi <= 1 + 1e-9).all()
    # interval brackets the rate; strict except at the 0/1 boundaries
    assert (out.wilson_lo < out.rate + 1e-9).all()
    assert (out.rate < out.wilson_hi + 1e-9).all()
    interior = out[(out.rate > 0) & (out.rate < 1)]
    assert (interior.wilson_lo < interior.rate).all()
    assert (interior.rate < interior.wilson_hi).all()
    u = _users(spark, sf_dir)
    assert out.n.sum() == u.count()
    assert out.k.sum() == u.agg(F.sum("converted")).collect()[0][0]


def test_sprt_decision_consistency(spark, sf_dir):
    out = REGISTRY["q333_sprt"].fn(spark, sf_dir).toPandas()
    assert len(out) == 2
    assert set(out.decision) <= {"accept_h1", "accept_h0", "continue"}
    for r in out.itertuples():
        if r.decision == "continue":
            assert str(r.decision_day) == "9999-12-31"
        else:
            assert str(r.decision_day) != "9999-12-31"
