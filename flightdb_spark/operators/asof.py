"""General backward as-of join — the timeseries primitive behind the
METAR lookup (operators/metar.py, reference metar/metar.go:94-119) and
q16, exposed as a reusable operator for ANY (key, timestamp) pair of
frames.

Implementation is the union+window trick, not a range join:

    left rows  (is_right=0)  ─┐
                              ├─ union → window last(right cols,
    right rows (is_right=1)  ─┘         ignorenulls) over (key) rows
                                        between unbounded preceding
                                        and current row, ordered by
                                        (ts, is_right DESC)

One shuffle on the key, a sort per partition, zero Python. A range
("non-equi") join would make Spark fall back to BroadcastNestedLoop —
O(left × right-per-key) compares; the window form is O(n log n) per
key and survives any right-side density. This is the same shape
pandas' merge_asof uses (a merge over sorted streams), distributed.

`is_right DESC` inside equal timestamps makes an exactly-equal right
row visible to the left row at the same instant (allow_exact_matches);
with allow_exact_matches=False the right row sorts after the left row
at equal ts and is invisible to it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def _asof_join(
    left, right, *, on, left_ts, right_ts, value_cols,
    tolerance_s, allow_exact_matches, suffix, direction,
):
    """Shared body for backward/forward (direction flips the window
    sort and the staleness sign). Within equal (_ats, side) the right
    rows additionally sort by their value columns + matched ts, so
    duplicate (key, ts) right rows resolve DETERMINISTICALLY (the
    greatest value tuple in sort order wins) instead of varying with
    partitioning — the cross-engine determinism contract
    (DETERMINISM.md rule 8)."""
    lcols = left.columns
    tagged_l = left.select(
        *lcols,
        F.lit(0).alias("_is_right"),
        F.col(left_ts).alias("_ats"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
          for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
    )
    tagged_r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c != on else F.col(on) for c in lcols],
        F.lit(1).alias("_is_right"),
        F.col(right_ts).alias("_ats"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(right_ts).alias("_rts"),
    )
    # At equal timestamps the right row must sort BEFORE the left row to
    # be visible to it (exact matches allowed), AFTER it otherwise.
    tie = F.col("_is_right").desc() if allow_exact_matches else F.col("_is_right").asc()
    ats = F.col("_ats").asc() if direction == "backward" else F.col("_ats").desc()
    # maps are not orderable in Spark — exclude them from the tie-break
    # (ties among right rows differing ONLY in map columns stay
    # unordered; every orderable column still totalizes the sort)
    from pyspark.sql.types import MapType

    orderable = [
        c for c in value_cols if not isinstance(right.schema[c].dataType, MapType)
    ]
    right_ties = [F.col(f"_rv_{c}").asc() for c in orderable] + [F.col("_rts").asc()]
    w = (
        W.partitionBy(on)
        .orderBy(ats, tie, *right_ties)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    enriched = tagged_l.unionByName(tagged_r)
    out_cols = [F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in value_cols]
    matched_ts = F.last("_rts", ignorenulls=True).over(w).alias(f"{right_ts}{suffix}")
    out = (
        enriched.select("*", *out_cols, matched_ts)
        .filter(F.col("_is_right") == 0)
        .drop("_is_right", "_ats", "_rts", *[f"_rv_{c}" for c in value_cols])
    )
    if tolerance_s is not None:
        if direction == "backward":
            gap = (
                F.col(left_ts).cast("double")
                - F.col(f"{right_ts}{suffix}").cast("double")
            )
        else:
            gap = (
                F.col(f"{right_ts}{suffix}").cast("double")
                - F.col(left_ts).cast("double")
            )
        stale = gap > float(tolerance_s)
        for c in value_cols:
            out = out.withColumn(
                f"{c}{suffix}",
                F.when(stale, F.lit(None)).otherwise(F.col(f"{c}{suffix}")),
            )
        out = out.withColumn(
            f"{right_ts}{suffix}",
            F.when(stale, F.lit(None)).otherwise(F.col(f"{right_ts}{suffix}")),
        )
    return out


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...],
    tolerance_s: int | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """For every left row, attach ``value_cols`` from the latest right
    row with the same ``on`` key and right_ts <= left_ts (< when
    ``allow_exact_matches`` is False). Rows further back than
    ``tolerance_s`` seconds yield NULLs instead of stale values.

    Output: all left columns + ``{col}{suffix}`` per value col +
    ``{right_ts}{suffix}`` (the matched right timestamp, NULL when no
    match within tolerance)."""
    return _asof_join(
        left, right, on=on, left_ts=left_ts, right_ts=right_ts,
        value_cols=value_cols, tolerance_s=tolerance_s,
        allow_exact_matches=allow_exact_matches, suffix=suffix,
        direction="backward",
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...],
    tolerance_s: int | None = None,
    allow_exact_matches: bool = True,
    suffix: str = "_asof",
) -> DataFrame:
    """Mirror of :func:`asof_join_backward`: the EARLIEST right row with
    right_ts >= left_ts (> when exact matches are disallowed). Same
    union+window shape with the sort reversed — still one shuffle."""
    return _asof_join(
        left, right, on=on, left_ts=left_ts, right_ts=right_ts,
        value_cols=value_cols, tolerance_s=tolerance_s,
        allow_exact_matches=allow_exact_matches, suffix=suffix,
        direction="forward",
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: tuple[str, ...],
    tolerance_s: int | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Nearest-in-time match: run backward and forward passes and keep
    whichever matched timestamp is closer (backward wins ties, matching
    pandas merge_asof direction='nearest'). Two window shuffles on the
    same key — at scale the second reuses the first's partitioning."""
    back = asof_join_backward(
        left, right, on=on, left_ts=left_ts, right_ts=right_ts,
        value_cols=value_cols, tolerance_s=tolerance_s, suffix="_b",
    )
    fwd = asof_join_forward(
        back, right, on=on, left_ts=left_ts, right_ts=right_ts,
        value_cols=value_cols, tolerance_s=tolerance_s, suffix="_f",
    )
    lts = F.col(left_ts).cast("double")
    gap_b = lts - F.col(f"{right_ts}_b").cast("double")
    gap_f = F.col(f"{right_ts}_f").cast("double") - lts
    use_b = F.col(f"{right_ts}_f").isNull() | (
        F.col(f"{right_ts}_b").isNotNull() & (gap_b <= gap_f)
    )
    out = fwd
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(use_b, F.col(f"{c}_b")).otherwise(F.col(f"{c}_f")),
        )
    out = out.withColumn(
        f"{right_ts}{suffix}",
        F.when(use_b, F.col(f"{right_ts}_b")).otherwise(F.col(f"{right_ts}_f")),
    )
    drop = [f"{c}_b" for c in value_cols] + [f"{c}_f" for c in value_cols]
    return out.drop(*drop, f"{right_ts}_b", f"{right_ts}_f")
