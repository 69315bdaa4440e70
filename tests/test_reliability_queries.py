"""Invariant checks for batch 52 (q351-q352)."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_burn_rate_consistency(spark, sf_dir):
    out = REGISTRY["q351_slo_burn_rate"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert (out.err_rate_1h.between(0, 1)).all()
    assert (out.err_rate_6h.between(0, 1)).all()
    # burn = rate / 0.2 (within rounding)
    assert ((out.burn_1h - out.err_rate_1h / 0.2).abs() < 1e-4).all()
    # page only when both windows exceed their thresholds
    expect = ((out.burn_1h > 1.5) & (out.burn_6h > 1.2)).astype(int)
    # rounding at the exact boundary can differ from the flag (the flag
    # uses unrounded burns) — allow boundary rows to disagree
    boundary = (out.burn_1h.sub(1.5).abs() < 1e-6) | (
        out.burn_6h.sub(1.2).abs() < 1e-6
    )
    assert (expect[~boundary] == out.page[~boundary]).all()


def test_mtbf_mttr_sane(spark, sf_dir):
    row = REGISTRY["q352_mtbf_mttr"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    n_err = ev.filter(F.col("event_type") == "error").count()
    assert 0 < row["n_failure_runs"] <= n_err
    assert row["mttr_s"] >= 0
    # failures are sparse: time between failures exceeds repair time
    assert row["mtbf_s"] > row["mttr_s"]
