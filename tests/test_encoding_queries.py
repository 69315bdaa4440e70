"""Invariant checks for batch 89 (q511-q515, columnar encoding)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_rle_census(spark, sf_dir):
    row = REGISTRY["q511_rle_runs"].fn(spark, sf_dir).collect()[0]
    assert 0 < row["n_runs"] <= row["n_values"]
    assert row["mean_run_length"] >= 1.0
    assert 0.0 < row["rle_ratio"] <= 1.0


def test_delta_bits_far_below_plain(spark, sf_dir):
    rows = REGISTRY["q512_delta_bits"].fn(spark, sf_dir).collect()
    assert rows
    total = sum(r["n_deltas"] for r in rows)
    # every per-user timestamp delta fits well under 64 bits
    assert all(r["delta_bits"] <= 41 for r in rows)
    under_40 = sum(r["n_deltas"] for r in rows if r["delta_bits"] <= 40)
    assert under_40 == total


def test_dict_benefit_low_cardinality_wins(spark, sf_dir):
    rows = {r["column_name"]: r for r in
            REGISTRY["q513_dict_benefit"].fn(spark, sf_dir).collect()}
    assert len(rows) == 6
    # 5-value event_type: 3-bit dictionary index crushes the raw string
    et = rows["events.event_type"]
    assert et["ndv"] == 5
    assert et["index_bits"] == 3
    assert et["dict_size_ratio"] < 0.2
    for r in rows.values():
        assert r["ndv"] <= r["n_rows"]
        assert 1 <= r["index_bits"] <= 41


def test_sort_benefit_reduces_runs(spark, sf_dir):
    row = REGISTRY["q514_sort_benefit"].fn(spark, sf_dir).collect()[0]
    assert row["runs_sorted"] <= row["runs_natural"]
    assert row["run_reduction_factor"] >= 1.0
    # sorted within user: at most 5 runs per user (5 event types)
    assert row["runs_sorted"] <= 5 * 150 + 5


def test_bitpack_savings(spark, sf_dir):
    rows = {r["column_name"]: r for r in
            REGISTRY["q515_bitpack_audit"].fn(spark, sf_dir).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert r["min_v"] <= r["max_v"]
        assert 1 <= r["packed_bits"] <= r["plain_bits"]
        assert 0.0 <= r["savings_share"] < 1.0
        assert r["bytes_saved"] >= 0
    # quantity 1..50 packs into 6 bits
    assert rows["lineitem.l_quantity"]["packed_bits"] <= 7
