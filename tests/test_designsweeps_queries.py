"""Invariant checks for batch 94 (q536-q540, pipeline design sweeps)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_vocab_sweep_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q536_vocab_size_sweep"].fn(spark, sf_dir).collect(),
        key=lambda r: r["vocab_size"],
    )
    assert [r["vocab_size"] for r in rows] == [100, 500, 1000, 5000]
    oov = [r["oov_share"] for r in rows]
    assert oov == sorted(oov, reverse=True)  # bigger vocab, less OOV
    assert all(0.0 <= s <= 1.0 for s in oov)
    for r in rows:
        assert r["covered_tokens"] <= r["total_tokens"]


def test_hash_dim_sweep(spark, sf_dir):
    rows = sorted(
        REGISTRY["q537_hash_dim_sweep"].fn(spark, sf_dir).collect(),
        key=lambda r: r["hash_dim"],
    )
    assert [r["hash_dim"] for r in rows] == [256, 1024, 4096, 16384]
    # collisions decrease as the dimension grows
    tc = [r["type_collision_share"] for r in rows]
    assert tc == sorted(tc, reverse=True)
    for r in rows:
        assert 0.0 <= r["mass_collision_share"] <= 1.0


def test_join_buffer_capture_monotone(spark, sf_dir):
    rows = sorted(
        REGISTRY["q538_join_buffer_sizing"].fn(spark, sf_dir).collect(),
        key=lambda r: r["buffer_minutes"],
    )
    shares = [r["match_share"] for r in rows]
    assert shares == sorted(shares)  # wider buffer captures more
    for r in rows:
        assert r["matched"] <= r["n_purchases"]


def test_cdc_conflation(spark, sf_dir):
    row = REGISTRY["q539_cdc_conflation"].fn(spark, sf_dir).collect()[0]
    assert row["conflated_writes"] <= row["n_events"]
    assert 0.0 <= row["conflation_saving"] < 1.0
    assert row["max_burst"] >= 1


def test_state_projection_rows(spark, sf_dir):
    rows = {r["operator"]: r for r in
            REGISTRY["q540_state_size_projection"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"dedup_2h", "sessionizer_30m", "join_buffer_15m"}
    for r in rows.values():
        # tiny SFs can project sub-row buffers (0 after FLOOR)
        assert r["projected_state_rows"] >= 0
        assert r["projected_state_mb"] >= 0
    assert rows["dedup_2h"]["projected_state_rows"] > 0
