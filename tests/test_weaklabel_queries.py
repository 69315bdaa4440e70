"""Invariant checks for batch 39 (q316-q318): weak-supervision
identities the per-query oracles can't see."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.weaklabel import _votes
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_lf_stats_ordering(spark, sf_dir):
    out = REGISTRY["q316_labeling_function_stats"].fn(spark, sf_dir).toPandas()
    assert list(out.lf) == ["lf1", "lf2", "lf3"]
    # conflict <= overlap <= coverage for every LF
    assert (out.conflict <= out.overlap + 1e-9).all()
    assert (out.overlap <= out.coverage + 1e-9).all()
    assert out.coverage.between(0, 1).all()
    assert out.pos_rate.between(0, 1).all()
    # every LF abstains somewhere and votes somewhere (thresholds chosen so)
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert (out.n_votes > 0).all() and (out.n_votes < n_docs).all()


def test_majority_vote_partitions_corpus(spark, sf_dir):
    out = REGISTRY["q317_majority_vote"].fn(spark, sf_dir).toPandas()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert out.n_docs.sum() == n_docs
    assert set(out.label) <= {"high", "low", "abstain"}
    # zero-vote docs land in abstain with n_votes = 0
    zero = out[(out.label == "abstain") & (out.n_votes == 0)]
    v = _votes(spark, sf_dir)
    n_zero = v.filter(
        F.col("lf1").isNull() & F.col("lf2").isNull() & F.col("lf3").isNull()
    ).count()
    assert (zero.n_docs.sum() if len(zero) else 0) == n_zero


def test_fleiss_kappa_consistency(spark, sf_dir):
    row = REGISTRY["q318_fleiss_kappa"].fn(spark, sf_dir).collect()[0]
    assert -1.0 <= row["fleiss_kappa"] <= 1.0
    assert 0.0 <= row["p_bar"] <= 1.0
    assert 0.5 <= row["p_expected"] <= 1.0  # two categories
    v = _votes(spark, sf_dir)
    n_full = v.filter(
        F.col("lf1").isNotNull()
        & F.col("lf2").isNotNull()
        & F.col("lf3").isNotNull()
    ).count()
    assert row["n_items"] == n_full
    expect = (row["p_bar"] - row["p_expected"]) / (1 - row["p_expected"])
    assert abs(row["fleiss_kappa"] - expect) < 1e-5
