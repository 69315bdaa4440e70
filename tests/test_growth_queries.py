"""Invariant checks for batches 21-24 (q270-q280): completeness
audits, interval analytics, growth accounting and survivorship —
cross-query consistency the per-query oracles can't see."""

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_duplicate_payment_pairs_within_window(spark, sf_dir):
    out = REGISTRY["q271_duplicate_payments"].fn(spark, sf_dir).toPandas()
    if len(out):
        assert (out.gap_seconds <= 7200).all()
        assert (out.event_a < out.event_b).all()
        # same coarse bucket -> amounts within one bucket width of each
        # other is NOT guaranteed (floor), but within two widths is
        assert ((out.amount_a - out.amount_b).abs() < 10).all()


def test_coverage_holes_are_thin(spark, sf_dir):
    out = REGISTRY["q272_coverage_holes"].fn(spark, sf_dir).toPandas()
    assert (out.n_docs < 3).all()
    assert (out[out.is_hole].n_docs == 0).all()


def test_peak_concurrency_bounds(spark, sf_dir):
    peaks = REGISTRY["q274_peak_concurrency"].fn(spark, sf_dir).toPandas()
    dau = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count_distinct("user_id").alias("dau"))
        .toPandas()
    )
    merged = peaks.merge(dau, on="day")
    assert (merged.peak_concurrency >= 1).all()
    assert (merged.peak_concurrency <= merged.dau).all()


def test_interval_coverage_bounds(spark, sf_dir):
    cov = REGISTRY["q275_interval_coverage"].fn(spark, sf_dir).toPandas()
    assert (cov.covered_seconds <= 86400).all()
    assert (cov.covered_seconds > 0).all()
    assert (cov.n_islands >= 1).all()


def test_time_to_convert_percentile_order(spark, sf_dir):
    out = REGISTRY["q276_time_to_convert"].fn(spark, sf_dir).toPandas()
    assert (out.min_s <= out.median_s).all()
    assert (out.median_s <= out.p90_s).all()
    assert (out.p90_s <= out.max_s).all()
    assert (out.min_s > 0).all()  # purchase strictly after click


def test_adstock_dominates_clicks(spark, sf_dir):
    out = REGISTRY["q277_adstock_transform"].fn(spark, sf_dir).toPandas()
    assert (out.adstock >= out.clicks).all()
    # carryover bounded by the geometric series: < clicks + 2*max(clicks)
    assert (out.adstock < out.clicks + 2 * out.clicks.max()).all()


def test_growth_accounting_identities(spark, sf_dir):
    out = (
        REGISTRY["q278_growth_accounting"].fn(spark, sf_dir).toPandas().sort_values("day")
    )
    assert (out.dau == out.new_users + out.returning_users).all()
    assert out.cumulative_users.is_monotonic_increasing
    assert out.cumulative_users.iloc[-1] == out.new_users.sum()
    # day one has no returning users
    assert out.returning_users.iloc[0] == 0


def test_golden_record_survivorship(spark, sf_dir):
    out = REGISTRY["q279_golden_record"].fn(spark, sf_dir).toPandas()
    o = load_table(spark, sf_dir, "orders").toPandas()
    # UNKNOWN only when EVERY record in the history was nulled
    for r in out.head(10).itertuples():
        hist = o[o.o_custkey == r.custkey]
        assert r.n_records == len(hist)
        any_priority = (hist.o_orderkey % 7 != 0).any()
        if r.priority == "UNKNOWN":
            assert not any_priority
        else:
            assert any_priority


def test_retention_decay_is_negative(spark, sf_dir):
    row = REGISTRY["q280_retention_decay_fit"].fn(spark, sf_dir).collect()[0]
    if row["decay_b"] is not None and row["decay_b"] < 0:
        assert row["half_life_weeks"] > 0
