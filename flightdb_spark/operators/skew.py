"""Skew mitigation operators.

AQE's skew-join splitting (on in session.py) handles sort-merge joins,
but two shapes still die on a hot key at 100 TB and need explicit
salting:

- ``salted_agg``: a groupBy where one key holds a large share of all
  rows (the empty-callsign flight, the boilerplate document). Phase 1
  aggregates on (key, salt) so the hot key's rows spread over N
  reducers; phase 2 merges the N partials. Works for any algebraic
  aggregate (count/sum/min/max, and avg via sum+count).
- ``salted_broadcast_join``: a broadcast join where the big side's rows
  against one dim key would all land in one task when a downstream
  window/agg keys on the join key: salt the big side, replicate the
  (small) dim across all salts, join on (key, salt). The dim stays
  broadcast; replication is salts × |dim|, still tiny.

Reference parallel: the reference never meets this (App Engine queries
are per-flight), but its task-queue fan-out (app/backend) is the same
idea — spread one hot entity's work over many workers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int, *, cols: tuple[str, ...] = ()) -> DataFrame:
    """Deterministic salt column in [0, n_salts): hash of ``cols`` (or
    a stable per-row spread when no cols are given). pmod, not abs(%):
    abs(Int.MinValue) overflows back to Int.MinValue on the JVM, and a
    negative salt would silently miss every replicated dim row."""
    if cols:
        h = F.hash(*[F.col(c) for c in cols])
    else:
        h = F.hash(F.monotonically_increasing_id())
    return df.withColumn("_salt", F.pmod(h, F.lit(n_salts)).cast("int"))


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    *,
    n_salts: int = 16,
    salt_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Two-phase skew-safe aggregate. ``aggs`` maps output column ->
    (input column, fn) with fn in {count, sum, min, max}. The hot key's
    rows fan out over n_salts phase-1 reducers; phase 2 merges n_salts
    rows per key (bounded, never hot)."""
    merge_fn = {"count": "sum", "sum": "sum", "min": "min", "max": "max"}
    p1_cols = []
    p2_cols = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            p1_cols.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(out))
        else:
            p1_cols.append(getattr(F, fn)(col).alias(out))
        p2_cols.append(getattr(F, merge_fn[fn])(out).alias(out))
    salted = with_salt(df, n_salts, cols=salt_cols)
    partial = salted.groupBy(key, "_salt").agg(*p1_cols)
    return partial.groupBy(key).agg(*p2_cols)


def salted_broadcast_join(
    big: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = 16,
    how: str = "inner",
    keep_salt: bool = False,
) -> DataFrame:
    """Join ``big`` against a small ``dim`` on ``key`` with the big side
    salted, REPARTITIONED on (key, salt), and the dim replicated across
    salts. The broadcast join itself never shuffles — the salting's
    entire value is the explicit (key, salt) repartition, which spreads
    a hot key over n_salts partitions for the stages that follow; with
    ``keep_salt`` the _salt column survives so a downstream aggregate
    can run the two-phase (key, _salt) -> key pattern (salted_agg)
    without re-salting. The replicated dim is still broadcast.

    Right/full joins are rejected: every dim key unmatched in ``big``
    would surface once per salt replica (n_salts duplicate rows),
    silently corrupting the outer side. Semi/anti are safe — each big
    row carries exactly one salt and the dim is replicated across all
    salts, so per-row existence semantics are preserved."""
    allowed = (
        "inner", "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti",
    )
    if how not in allowed:
        raise ValueError(
            f"salted_broadcast_join supports how='inner'/'left'/'semi'/'anti', "
            f"got {how!r}: right/full would emit each unmatched dim key once "
            "per salt replica"
        )
    salted = with_salt(big, n_salts).repartition(key, "_salt")
    rep = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    out = salted.join(F.broadcast(rep), [key, "_salt"], how)
    return out if keep_salt else out.drop("_salt")
