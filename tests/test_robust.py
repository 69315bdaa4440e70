"""operators/robust.py: the exact percentile anchor vs the
approx_percentile sketch mode — the documented 100 TB swap, executed."""

from pyspark.sql import functions as F

from flightdb_spark.operators.robust import mad_outliers
from flightdb_spark.tables import load_table


def test_mad_modes_agree_at_high_accuracy(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    exact = mad_outliers(ev, exact=True).select("event_id").cache()
    approx = mad_outliers(ev, exact=False, accuracy=10000).select("event_id").cache()
    n_exact = exact.count()
    assert n_exact > 0
    # at accuracy=10000 on ~thousands of rows the sketch medians are
    # exact or within one rank — flag sets may differ only marginally
    sym_diff = exact.exceptAll(approx).count() + approx.exceptAll(exact).count()
    assert sym_diff <= max(2, n_exact // 20)
    exact.unpersist()
    approx.unpersist()


def test_mad_flags_planted_outlier(spark):
    rows = [(i, "a", 10.0 + (i % 5) * 0.1) for i in range(200)]
    rows.append((999, "a", 1000.0))
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    for exact in (True, False):
        out = mad_outliers(df, exact=exact)
        ids = {r["event_id"] for r in out.collect()}
        assert 999 in ids
        # the inlier band stays unflagged in both modes
        assert not any(i < 200 for i in ids)
