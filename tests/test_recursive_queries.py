"""Invariant checks for batch 90 (q516-q520, recursive SQL)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_hierarchy_depths_binary_tree(spark, sf_dir):
    rows = sorted(
        REGISTRY["q516_hierarchy_depths"].fn(spark, sf_dir).collect(),
        key=lambda r: r["depth"],
    )
    assert rows[0]["depth"] == 0 and rows[0]["n_nodes"] == 1  # the root
    # binary tree: each level at most doubles
    for prev, cur in zip(rows, rows[1:]):
        assert cur["depth"] == prev["depth"] + 1
        assert cur["n_nodes"] <= 2 * prev["n_nodes"]
    # all customers except key 0 appear exactly once
    assert sum(r["n_nodes"] for r in rows) == 149  # 150 customers, key 0 out


def test_bom_rollup_partitions_parts(spark, sf_dir):
    rows = REGISTRY["q517_bom_rollup"].fn(spark, sf_dir).collect()
    assert {r["root_part"] for r in rows} == {0, 1, 2, 3}
    # every part lands in exactly one subtree
    assert sum(r["subtree_parts"] for r in rows) == 200
    assert all(r["subtree_price_cents"] > 0 for r in rows)


def test_bounded_reachability_matches_structure(spark, sf_dir):
    rows = {r["min_depth"]: r["n_nodes"] for r in
            REGISTRY["q518_bounded_reachability"].fn(spark, sf_dir).collect()}
    assert rows[0] == 1  # the seed
    assert rows.get(1, 0) >= 1  # suppliers of part 1
    # alternating bipartite: odd depths are suppliers, even are parts
    assert all(d <= 3 for d in rows)


def test_calendar_spine_sane(spark, sf_dir):
    row = REGISTRY["q519_calendar_spine"].fn(spark, sf_dir).collect()[0]
    assert row["n_months"] == 80
    assert 0 <= row["n_gap_months"] <= 80
    assert row["longest_gap_run"] <= row["n_gap_months"]


def test_materialized_paths_prefix_property(spark, sf_dir):
    rows = {r["custkey"]: r for r in
            REGISTRY["q520_materialized_paths"].fn(spark, sf_dir).collect()}
    assert rows[1]["path"] == "1" and rows[1]["depth"] == 0
    for k, r in rows.items():
        if k > 1:
            parent = rows[k // 2]
            assert r["path"] == parent["path"] + "/" + str(k)
            assert r["depth"] == parent["depth"] + 1
