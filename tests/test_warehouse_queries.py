"""Warehouse-maintenance batch (queries/warehouse.py) and layout batch
(queries/layout.py) unit coverage: branch cases the sf tables don't
exercise (CDC insert/unchanged outcomes, SCD2 run breaks, compaction
bin overflow, bloom false positives are possible but never false
NEGATIVES, z-order locality)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from flightdb_spark.queries import load_registry

REG = load_registry()
SF = "/root/testdata/sf0.001"


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def test_cdc_upsert_all_four_outcomes(spark, tmp_path, monkeypatch):
    """Synthetic feed hits insert / update / delete / unchanged."""
    t0 = dt.datetime(2024, 1, 10)
    t1 = dt.datetime(2024, 1, 25)  # after the 2024-01-21 cutover
    rows = [
        # user 1: base only -> unchanged
        (1, t0, 1, "view", 1.0),
        # user 2: base + change -> updated
        (2, t0, 2, "view", 2.0),
        (3, t1, 2, "purchase", 20.0),
        # user 3: base + tombstone -> deleted
        (4, t0, 3, "view", 3.0),
        (5, t1, 3, "error", 30.0),
        # user 4: change only -> inserted
        (6, t1, 4, "signup", 40.0),
        # user 2 again, earlier change loses last-wins
        (7, t1 - dt.timedelta(hours=1), 2, "click", 99.0),
    ]
    df = _ev(spark, rows).withColumn("props", F.lit("{}"))
    out_dir = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    res = {
        r["outcome"]: (r["n_keys"], r["sum_val"])
        for r in REG["q176_cdc_upsert"].fn(spark, out_dir).collect()
    }
    assert res["unchanged"] == (1, 1.0)
    assert res["updated"] == (1, 20.0)  # last-wins picks purchase@20, not click@99
    assert res["deleted"] == (1, 30.0)
    assert res["inserted"] == (1, 40.0)


def test_scd2_intervals_break_and_resume(spark, tmp_path):
    """Attribute A, A, B, A on consecutive active days -> three
    intervals; the same attribute resuming later starts a NEW row
    (type-2, not type-1)."""
    d = lambda day, hh=12: dt.datetime(2024, 1, day, hh)
    rows = [
        (1, d(1), 7, "view", 0.0),
        (2, d(2), 7, "view", 0.0),
        (3, d(3), 7, "purchase", 0.0),
        (4, d(4), 7, "view", 0.0),
        # day 2 has a LATER purchase that wins the daily collapse? no —
        # keep it earlier so 'view' stays the day-2 attribute
        (5, d(2, 8), 7, "purchase", 0.0),
    ]
    df = _ev(spark, rows).withColumn("props", F.lit("{}"))
    out_dir = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")
    got = [
        (r["attr"], str(r["valid_from"]), str(r["valid_to"]), r["n_days"])
        for r in REG["q175_scd2_intervals"].fn(spark, out_dir).collect()
    ]
    assert got == [
        ("view", "2024-01-01", "2024-01-02", 2),
        ("purchase", "2024-01-03", "2024-01-03", 1),
        ("view", "2024-01-04", "2024-01-04", 1),
    ]


def test_incremental_rollup_matches_full(spark):
    rows = REG["q174_incremental_rollup"].fn(spark, SF).collect()
    assert len(rows) == 5
    assert all(r["matches_full"] for r in rows)


def test_bloom_prune_no_false_negatives(spark):
    """Bloom positives must cover every actual day: n_scanned >=
    n_actual and n_false_positive >= 0 for every probe."""
    rows = REG["q172_bloom_prune"].fn(spark, SF).collect()
    assert rows, "no probe users"
    for r in rows:
        assert r["n_scanned"] >= r["n_actual"]
        assert r["n_false_positive"] == r["n_scanned"] - r["n_actual"]


def test_zorder_files_are_local(spark):
    """Each z-order file's (user x day) cell rectangle must be far
    smaller than the full domain — the locality that makes min/max
    skipping work on BOTH dimensions."""
    rows = REG["q170_zorder_layout"].fn(spark, SF).collect()
    assert sum(r["n_rows"] for r in rows) > 0
    for r in rows:
        assert r["max_user"] - r["min_user"] <= 127  # half the 0..255 span
        assert r["max_day"] - r["min_day"] <= 31


def test_compaction_bins_near_target(spark):
    """Every bin except possibly the last lands within one max-file
    overshoot of the target; files are conserved."""
    rows = REG["q171_compaction_plan"].fn(spark, SF).collect()
    total_files = sum(r["n_files"] for r in rows)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert total_files == docs.count()
    for r in rows[:-1]:
        assert r["total_chars"] + r["largest"] >= 20_000 or r["n_files"] == 1


def test_kmeans_two_rounds_partitions_all_vectors(spark):
    rows = REG["q173_kmeans_lloyd"].fn(spark, SF).collect()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assert sum(r["n_members"] for r in rows) == emb.count()
    assert all(-1.0 <= r["mean_cosine"] <= 1.0 for r in rows)


def test_range_partition_balance(spark):
    rows = REG["q177_range_partition_plan"].fn(spark, SF).collect()
    assert len(rows) == 8
    # exact-quantile edges keep every partition within 3x of even share
    for r in rows:
        assert 0.1 <= r["balance_ratio"] <= 3.0
