"""Focused equivalence tests for the round-9 one-pass fold rewrites of
q631_window_funnel / q633_sequence_match (behavior2.py).

The fold computes each stage anchor as the first qualifying event in
(tus, event_type) sort order; the original staged-MIN SQL (kept as the
oracle) is still importable, so both forms run over one crafted
events view packed with the adversarial cases: equal-timestamp ties
between anchor and stage, stages outside the window, out-of-order
stages, multiple anchors, and a click tied with a LATER signup while
an earlier signup is still within the gap.
"""

from __future__ import annotations

import datetime as dt

from flightdb_spark.queries.behavior2 import (
    _seqmatch_spark_sql,
    _seqmatch_sql,
    _wfunnel_spark_sql,
    _wfunnel_sql,
)

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _ts(seconds: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=seconds)


EVENTS = [
    # u1: view tied with the signup anchor (strict '>' must reject it)
    ("u1", "signup", 0), ("u1", "view", 0), ("u1", "click", 10),
    ("u1", "purchase", 20),
    # u2: clean full funnel inside the hour
    ("u2", "signup", 0), ("u2", "view", 1), ("u2", "click", 2),
    ("u2", "purchase", 3),
    # u3: view outside the 1-hour window of the anchor
    ("u3", "signup", 0), ("u3", "view", 7200), ("u3", "click", 7300),
    # u4: view strictly before the anchor
    ("u4", "view", 0), ("u4", "signup", 10), ("u4", "click", 20),
    # u5: two signups; the EARLIEST is the anchor, so the view at 5000s
    #     is outside [anchor, anchor+3600] even though it is within one
    #     hour of the later signup
    ("u5", "signup", 0), ("u5", "signup", 4000), ("u5", "view", 5000),
    # u6 (q633): click at the same tus as a later signup, while the
    #     earlier signup is within the 300 s gap -> tight pair matches
    ("u6", "signup", 100), ("u6", "signup", 200), ("u6", "click", 200),
    # u7 (q633): error tied with the first signup (strict '>' rejects),
    #     later error + purchase complete the triple
    ("u7", "signup", 0), ("u7", "error", 0), ("u7", "error", 50),
    ("u7", "purchase", 60),
    # u8 (q633): purchase tied with the qualifying error -> no triple
    ("u8", "signup", 0), ("u8", "error", 10), ("u8", "purchase", 10),
    # u9 (q633): click exactly gap seconds after the only signup -> no
    ("u9", "signup", 0), ("u9", "click", 300),
    # u10: no signup at all (q631 excludes; q633 n_users includes)
    ("u10", "view", 0), ("u10", "click", 5),
]


def _events_view(spark):
    rows = [(u, t, _ts(s)) for (u, t, s) in EVENTS]
    spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp"
    ).createOrReplaceTempView("events")


def _rows(spark, sql):
    return [tuple(r) for r in spark.sql(sql).collect()]


def test_window_funnel_fold_matches_staged_sql(spark):
    _events_view(spark)
    assert _rows(spark, _wfunnel_spark_sql()) == _rows(
        spark, _wfunnel_sql("spark")
    )


def test_window_funnel_fold_expected_depths(spark):
    _events_view(spark)
    hist = dict(_rows(spark, _wfunnel_spark_sql()))
    # u2 reaches depth 4; every other signup user stalls at depth 1
    # (u1's view ties with the anchor, u3's is outside the window,
    # u4's view precedes its signup, u5's view is outside the EARLIEST
    # anchor's window); u10 has no signup and is excluded
    assert hist == {1: 8, 4: 1}


def test_sequence_match_fold_matches_staged_sql(spark):
    _events_view(spark)
    assert _rows(spark, _seqmatch_spark_sql()) == _rows(
        spark, _seqmatch_sql("spark")
    )


def test_sequence_match_fold_expected_census(spark):
    _events_view(spark)
    (row,) = _rows(spark, _seqmatch_spark_sql())
    n_users, tight, triple, both, share = row
    assert n_users == 10
    # tight pair: u1 (0->10), u2 (0->2), u4 (10->20), u6 (100->200);
    # u9 exactly at the gap fails the strict '<'
    assert tight == 4
    # ordered triple: u7 only (u8's purchase ties with the error);
    # u7 has no click, so no user matches both patterns
    assert triple == 1
    assert both == 0
    assert share == round(4 / 10, 6)
