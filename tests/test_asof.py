"""General as-of join (operators/asof.py) vs pandas.merge_asof — the
reference semantics every timeseries library agrees on."""

import datetime as dt

import pandas as pd
from pyspark.sql import functions as F

from flightdb_spark.operators.asof import asof_join_backward

T0 = dt.datetime(2024, 1, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(0)), (1, _ts(10)), (1, _ts(20)), (2, _ts(5)), (3, _ts(7))],
        "k long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(0), 100.0), (1, _ts(10), 110.0), (1, _ts(15), 115.0),
         (2, _ts(6), 200.0)],
        "k long, ts timestamp, px double",
    )
    return left, right


def _pandas_asof(left, right, tolerance=None, allow_exact=True):
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = right.toPandas().sort_values("ts").reset_index(drop=True)
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    m = pd.merge_asof(
        lp, rp, on="ts", by="k", direction="backward",
        allow_exact_matches=allow_exact, **kw,
    )
    return {(r.k, r.ts): (None if pd.isna(r.px) else r.px) for r in m.itertuples()}


def test_asof_matches_pandas(spark):
    left, right = _frames(spark)
    got = asof_join_backward(left, right, on="k", value_cols=("px",))
    want = _pandas_asof(left, right)
    for r in got.collect():
        assert want[(r["k"], r["ts"])] == r["px_asof"], (r["k"], r["ts"])
    # matched right timestamp present exactly when a value matched
    for r in got.collect():
        assert (r["px_asof"] is None) == (r["ts_asof"] is None)


def test_asof_tolerance_and_exact(spark):
    left, right = _frames(spark)
    got = asof_join_backward(
        left, right, on="k", value_cols=("px",), tolerance_s=300
    )
    want = _pandas_asof(left, right, tolerance=300)
    for r in got.collect():
        assert want[(r["k"], r["ts"])] == r["px_asof"], (r["k"], r["ts"])
    # allow_exact_matches=False: the t=10 left row must see t=0's value
    got2 = asof_join_backward(
        left, right, on="k", value_cols=("px",), allow_exact_matches=False
    )
    want2 = _pandas_asof(left, right, allow_exact=False)
    for r in got2.collect():
        assert want2[(r["k"], r["ts"])] == r["px_asof"], (r["k"], r["ts"])


def test_asof_no_match_yields_null(spark):
    left, right = _frames(spark)
    row = [r for r in asof_join_backward(
        left, right, on="k", value_cols=("px",)
    ).collect() if r["k"] == 3]
    assert len(row) == 1 and row[0]["px_asof"] is None


def _pandas_asof_dir(left, right, direction, tolerance=None):
    lp = left.toPandas().sort_values("ts").reset_index(drop=True)
    rp = right.toPandas().sort_values("ts").reset_index(drop=True)
    kw = {"tolerance": pd.Timedelta(seconds=tolerance)} if tolerance else {}
    m = pd.merge_asof(lp, rp, on="ts", by="k", direction=direction, **kw)
    return {(r.k, r.ts): (None if pd.isna(r.px) else r.px) for r in m.itertuples()}


def test_asof_forward_matches_pandas(spark):
    from flightdb_spark.operators.asof import asof_join_forward

    left, right = _frames(spark)
    got = asof_join_forward(left, right, on="k", value_cols=("px",))
    want = _pandas_asof_dir(left, right, "forward")
    for r in got.collect():
        assert want[(r["k"], r["ts"])] == r["px_asof"], (r["k"], r["ts"])


def test_asof_nearest_matches_pandas(spark):
    from flightdb_spark.operators.asof import asof_join_nearest

    left, right = _frames(spark)
    got = asof_join_nearest(left, right, on="k", value_cols=("px",))
    want = _pandas_asof_dir(left, right, "nearest")
    for r in got.collect():
        assert want[(r["k"], r["ts"])] == r["px_asof"], (r["k"], r["ts"])
    got_t = asof_join_nearest(
        left, right, on="k", value_cols=("px",), tolerance_s=120
    )
    want_t = _pandas_asof_dir(left, right, "nearest", tolerance=120)
    for r in got_t.collect():
        assert want_t[(r["k"], r["ts"])] == r["px_asof"], (r["k"], r["ts"])


def test_asof_duplicate_right_ts_resolves_deterministically(spark):
    """Two right rows with identical (key, ts): the greatest value
    tuple wins, on every run and partitioning (DETERMINISM.md rule 8)."""
    import datetime as dt

    from flightdb_spark.operators.asof import asof_join_backward, asof_join_forward

    t = dt.datetime(2024, 1, 1, 12, 0, 0)
    left = spark.createDataFrame([("k", t)], "k string, ts timestamp")
    right = spark.createDataFrame(
        [("k", t, 1.0), ("k", t, 2.0), ("k", t, 0.5)],
        "k string, ts timestamp, px double",
    ).repartition(3)
    for fn in (asof_join_backward, asof_join_forward):
        for _ in range(3):
            rows = fn(left, right, on="k", value_cols=("px",)).collect()
            assert len(rows) == 1
            assert rows[0]["px_asof"] == 2.0
