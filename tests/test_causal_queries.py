"""Invariant checks for batch 36 (q307-q309): matching/weighting
identities the per-query oracles can't see."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_cem_att_terms_decompose(spark, sf_dir):
    out = REGISTRY["q307_cem_att"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.n_treated > 0).all() and (out.n_control > 0).all()
    # att_term is the treated-weighted within-stratum difference
    att = out.att_term.sum()
    direct = (
        (out.y_treated - out.y_control) * out.n_treated
    ).sum() / out.n_treated.sum()
    assert abs(att - direct) < 1e-4


def test_poststrat_weights_recover_population(spark, sf_dir):
    out = REGISTRY["q308_poststrat_weights"].fn(spark, sf_dir).toPandas()
    assert (out.weight > 0).all()
    # weighted sample mass reproduces population shares: sum over
    # strata of samp_n * weight = samp_t * (pop_s / pop_t) summed = samp_t
    reweighted = (out.samp_n * out.weight).sum()
    assert abs(reweighted - out.samp_n.sum()) < out.samp_n.sum() * 0.02
    # each stratum's reweighted share equals its population share
    pop_share = out.pop_n / out.pop_n.sum()
    rw_share = (out.samp_n * out.weight) / (out.samp_n * out.weight).sum()
    assert (pop_share - rw_share).abs().max() < 1e-6


def test_ipf_hits_segment_marginals(spark, sf_dir):
    out = REGISTRY["q309_ipf_raking"].fn(spark, sf_dir).toPandas()
    cust = load_table(spark, sf_dir, "customer")
    pop = (
        cust.groupBy(F.col("c_mktsegment").alias("segment"))
        .count()
        .toPandas()
        .set_index("segment")["count"]
    )
    got = out.groupby("segment").raked_n.sum()
    # final raking step scales segments: those marginals land exactly
    for seg, target in pop.items():
        assert abs(got[seg] - target) < 1e-2, seg
    # nation marginals are within raking tolerance of targets
    popn = (
        cust.groupBy(F.col("c_nationkey").alias("nation"))
        .count()
        .toPandas()
        .set_index("nation")["count"]
    )
    gotn = out.groupby("nation").raked_n.sum()
    rel = max(
        abs(gotn.get(n, 0) - t) / t for n, t in popn.items() if n in gotn.index
    )
    assert rel < 0.05
