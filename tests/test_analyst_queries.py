"""Invariant checks for batch 41 (q321-q323): bridge/privacy/
collocation identities the per-query oracles can't see."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_pvm_bridge_closes(spark, sf_dir):
    out = REGISTRY["q321_price_volume_mix"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    # the bridge identity: delta == price_effect + volume_effect
    gap = (out.delta - (out.price_effect + out.volume_effect)).abs()
    assert gap.max() < 0.02  # cent-level rounding on three terms
    assert (out.delta - (out.rev_m2 - out.rev_m1)).abs().max() < 0.02


def test_t_closeness_bounds(spark, sf_dir):
    out = REGISTRY["q322_t_closeness"].fn(spark, sf_dir).toPandas()
    assert len(out) == 25
    assert out.t_closeness.between(0, 1).all()
    # violates flag is consistent with the threshold
    assert (
        (out.t_closeness > 0.15).astype(int) == out.violates
    ).all()
    assert (out.group_size > 0).all()


def test_llr_collocations_sane(spark, sf_dir):
    out = REGISTRY["q323_llr_collocations"].fn(spark, sf_dir).toPandas()
    assert len(out) == 20
    assert (out.llr.diff().dropna() <= 1e-9).all()  # descending
    assert (out.pair_count >= 5).all()
    assert (out.llr >= 0).all() or out.llr.min() > -1e-6
