"""Invariant checks for batch 76 (q447-q450)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_watermark_curve_monotone(spark, sf_dir):
    rows = REGISTRY["q447_watermark_tuning"].fn(spark, sf_dir).collect()
    assert [r["watermark_minutes"] for r in rows] == [1, 5, 15, 60]
    shares = [r["dropped_share"] for r in rows]
    # widening the watermark can only drop fewer events
    assert shares == sorted(shares, reverse=True)
    # ~10% of events carry the heavy tail; 1-minute drops most of it
    assert 0 < shares[0] < 0.2
    assert shares[-1] < shares[0]


def test_ooo_rate_positive_but_bounded(spark, sf_dir):
    row = REGISTRY["q448_out_of_order_rate"].fn(spark, sf_dir).collect()[0]
    assert row["n_transitions"] > 0
    # the synthetic delays do invert some adjacent pairs
    assert 0 < row["inversion_rate"] < 0.5
    assert row["max_inversion_gap_s"] >= 0


def test_dedup_capture_monotone(spark, sf_dir):
    rows = REGISTRY["q449_dup_delivery_audit"].fn(spark, sf_dir).collect()
    caps = [r["capture_rate"] for r in rows]
    assert caps == sorted(caps)
    # 30-minute max redelivery: the 60-minute window catches all
    assert caps[-1] == 1.0
    assert all(r["caught"] <= r["n_dups"] for r in rows)


def test_session_counts_decrease_with_gap(spark, sf_dir):
    rows = REGISTRY["q450_session_gap_sensitivity"].fn(spark, sf_dir).collect()
    ns = [r["n_sessions"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    # at least one session per user at every threshold
    assert all(r["sessions_per_user"] >= 1.0 for r in rows)
