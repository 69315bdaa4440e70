"""Invariant checks for batch 34 (q301-q303): identities the
per-query oracles can't see — isotonic monotonicity/optimality,
kappa's confusion-table consistency, lift-table mass conservation."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_isotonic_monotone_and_mass_preserving(spark, sf_dir):
    out = (
        REGISTRY["q301_isotonic_calibration"].fn(spark, sf_dir)
        .orderBy("bin")
        .toPandas()
    )
    assert len(out) <= 10
    # the fitted rates are non-decreasing in the score bin
    assert (out.iso_rate.diff().dropna() >= -1e-9).all()
    # PAVA preserves the weighted mean (projection property)
    raw_mass = (out.raw_rate * out.n).sum()
    iso_mass = (out.iso_rate * out.n).sum()
    assert abs(raw_mass - iso_mass) < 1e-2 * out.n.sum() ** 0.5 + 1e-6
    assert out.iso_rate.between(0, 1).all()


def test_kappa_matches_q34_confusion(spark, sf_dir):
    row = REGISTRY["q302_cohens_kappa"].fn(spark, sf_dir).collect()[0]
    assert -1.0 <= row["kappa"] <= 1.0
    assert 0.0 <= row["p_expected"] < 1.0
    # recompute observed agreement straight from q34's output
    q34 = REGISTRY["q34_langid"].fn(spark, sf_dir)
    n = q34.count()
    agree = q34.filter(F.col("pred_lang") == F.col("label_lang")).count()
    assert row["n"] == n
    assert abs(row["p_observed"] - agree / n) < 1e-6
    # kappa is the chance-corrected form of the same po/pe
    expect = (row["p_observed"] - row["p_expected"]) / (1 - row["p_expected"])
    assert abs(row["kappa"] - expect) < 1e-5


def test_decile_lift_structure(spark, sf_dir):
    out = REGISTRY["q303_decile_lift"].fn(spark, sf_dir).orderBy("decile").toPandas()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert out.n.sum() == ev_n
    assert set(out.decile) <= set(range(1, 11))
    # cumulative gains are non-decreasing and end at 1
    assert (out.cum_gain.diff().dropna() >= -1e-9).all()
    assert abs(out.cum_gain.iloc[-1] - 1.0) < 1e-6
    # deciles are near-equal population shares (cutpoint binning)
    assert out.n.max() <= out.n.min() * 1.5 + 10
    # lift averages to ~1 weighted by population
    w = (out.lift * out.n).sum() / out.n.sum()
    assert abs(w - 1.0) < 0.05
