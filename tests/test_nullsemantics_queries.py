"""Invariant checks for batch 95 (q541-q545, null semantics)."""

from flightdb_spark.queries import load_registry

REGISTRY = load_registry()


def test_not_in_trap(spark, sf_dir):
    rows = {r["scenario"]: r["n_rows"] for r in
            REGISTRY["q541_three_valued_logic"].fn(spark, sf_dir).collect()}
    # the famous trap: NOT IN against a list containing NULL = 0 rows
    assert rows["not_in_list_with_null"] == 0
    # NOT EXISTS is null-safe: exactly the null-v rows survive
    assert rows["not_exists_match"] > 0
    # IN matches only non-null values
    assert rows["in_list_with_null"] == rows["exists_match"]


def test_null_aggregates(spark, sf_dir):
    rows = REGISTRY["q542_null_aggregates"].fn(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["n_v"] < r["n_star"]  # ~25% planted nulls
        assert r["ndv_v"] <= r["n_v"]
        # coalescing nulls to 0 biases the mean DOWN
        assert r["coalesce_bias"] < 0


def test_null_joins(spark, sf_dir):
    rows = {r["scenario"]: r["n_rows"] for r in
            REGISTRY["q543_null_joins"].fn(spark, sf_dir).collect()}
    # left join = inner matches + unmatched (null-key) rows
    assert rows["left_eq"] == rows["inner_eq"] + rows["left_null_keys"]
    # null-safe equality adds exactly the null<->null matches
    assert rows["inner_null_safe"] == rows["inner_eq"] + rows["left_null_keys"]
    assert rows["left_null_keys"] > 0


def test_null_ordering(spark, sf_dir):
    row = REGISTRY["q544_null_ordering"].fn(spark, sf_dir).collect()[0]
    assert row["n_nulls"] > 0
    # NULLS FIRST: nulls occupy ranks 1..n_nulls
    assert row["max_rank_nulls_first"] == row["n_nulls"]
    # NULLS LAST: nulls start right after the values
    assert row["min_rank_nulls_last"] == row["n_rows"] - row["n_nulls"] + 1


def test_null_windows(spark, sf_dir):
    row = REGISTRY["q545_null_windows"].fn(spark, sf_dir).collect()[0]
    assert row["n_lag_defaults"] == 15  # one per user partition head
    assert row["n_gap_filled"] > 0
    assert row["n_unfillable"] >= 0
    assert row["max_seen_nonnull"] > 0
