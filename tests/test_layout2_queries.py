"""Invariant checks for batch 84 (q486-q490, storage-layout planning)."""

import math

import pytest

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_hilbert_locality_beats_row_major(spark, sf_dir):
    rows = {r["layout"]: r for r in
            REGISTRY["q486_hilbert_locality"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"row_major", "zorder", "hilbert"}
    n = {k: v["rows_selected"] for k, v in rows.items()}
    # identical rows under every layout — only file placement differs
    assert len(set(n.values())) == 1
    # curve layouts never touch more files than row-major scatter
    assert rows["hilbert"]["files_touched"] <= rows["row_major"]["files_touched"]
    assert rows["zorder"]["files_touched"] <= rows["row_major"]["files_touched"]


def test_minmax_pruning_clustered_skips_more(spark, sf_dir):
    rows = REGISTRY["q487_minmax_pruning"].fn(spark, sf_dir).collect()
    assert len(rows) == 8  # 2 layouts x 4 predicates
    by = {}
    for r in rows:
        by[(r["layout"], r["pred_lo"])] = r
        assert 0.0 <= r["skip_rate"] <= 1.0
        assert r["files_scanned"] <= r["n_files"]
    # summed over the predicate grid, the curve layout skips at least
    # as many files as insertion order
    hil = sum(by[("hilbert", lo)]["skip_rate"] for lo, _ in
              [(0, 0), (50, 0), (100, 0), (200, 0)])
    ins = sum(by[("insertion", lo)]["skip_rate"] for lo, _ in
              [(0, 0), (50, 0), (100, 0), (200, 0)])
    assert hil >= ins


def test_bloom_planner_closed_form(spark, sf_dir):
    rows = REGISTRY["q488_bloom_size_planner"].fn(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        expect_bits = -math.log(r["target_fpr"]) / math.log(2.0) ** 2
        assert r["bits_per_key"] == pytest.approx(expect_bits, rel=1e-3)
        assert r["n_hashes"] == round(expect_bits * math.log(2.0))
        assert r["filter_mb"] > 0


def test_rowgroup_planner_sane(spark, sf_dir):
    rows = {r["tbl"]: r for r in
            REGISTRY["q489_rowgroup_planner"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"events", "documents", "orders", "lineitem"}
    for r in rows.values():
        assert r["est_bytes_per_row"] > 10
        assert r["rows_per_rowgroup"] > 1000
    # documents rows are the fattest (text column)
    assert rows["documents"]["est_bytes_per_row"] > rows["orders"]["est_bytes_per_row"]


def test_clustering_drift_widens_spans(spark, sf_dir):
    rows = {r["state"]: r for r in
            REGISTRY["q490_clustering_drift"].fn(spark, sf_dir).collect()}
    assert set(rows) == {"before_append", "after_append"}
    # naive appends add files and widen mean spans
    assert rows["after_append"]["n_files"] > rows["before_append"]["n_files"]
    assert (rows["after_append"]["mean_value_span"]
            >= rows["before_append"]["mean_value_span"])
    assert (rows["after_append"]["files_scanned_lt50"]
            >= rows["before_append"]["files_scanned_lt50"])
