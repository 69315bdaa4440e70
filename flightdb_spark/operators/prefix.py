"""Distributed exact prefix sums (cumulative aggregates over a total
order) WITHOUT a single global window.

``Window.orderBy(...)`` with an empty partition spec moves every row to
ONE task — the classic 100 TB cliff for running totals, ECDFs, rank
statistics and concat-then-chunk offsets. This operator computes the
same exact cumulative sums in two bounded passes, the textbook
scan-then-offset shape:

1. bucket rows by approximate percentile edges of the order column
   (one bounded aggregate, broadcast back — edge *placement* only
   affects balance, never values);
2. cumulative-sum WITHIN each bucket (parallel windows, one per
   bucket);
3. per-bucket totals (a <= n_buckets-row aggregate) get an exclusive
   running offset via a window over that bounded table only;
4. broadcast the offsets back and add.

The reference has no analog — its per-flight arrays fit in memory
(track.go operates on one []Trackpoint at a time); this is the engine
primitive that lets rank/ECDF-style statistics (AUC, KS, quantile
ranks) run at fleet scale.

Determinism contract: rows with EQUAL order-column values land in the
same bucket but their relative order inside the window is tie-broken
arbitrarily — callers that need engine-stable per-row cumulative
values must pre-collapse to distinct order keys (groupBy(order_col))
first, as q135 does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKET = "__cumsum_bucket"


def bucketed_cumsum(
    df: DataFrame,
    order_col: str,
    value_cols: list[str],
    n_buckets: int = 64,
    *,
    tie_col: str | None = None,
) -> DataFrame:
    """Add ``cum_<c>`` (inclusive cumulative sum over the total order
    of ``order_col``) for each c in ``value_cols``.

    Equal order keys share a bucket; pre-collapse them for
    deterministic per-row results (see module docstring), OR pass
    ``tie_col`` — a column whose (order_col, tie_col) pairs are unique
    over the whole table. Rows with equal order keys always land in the
    same bucket (edges compare on order_col only), so the secondary
    sort inside the per-bucket window yields a globally deterministic
    total order without any key packing by the caller.
    """
    # n_buckets=1 would need an empty percentile array (degenerate —
    # and the whole point is avoiding the single-partition scan)
    n_buckets = max(2, n_buckets)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = df.agg(
        F.expr(
            f"approx_percentile({order_col}, array({', '.join(str(q) for q in qs)}), 1000)"
        ).alias("__edges")
    )
    bucketed = (
        df.join(F.broadcast(edges_row))
        .withColumn(
            _BUCKET,
            F.size(F.filter("__edges", lambda e: e < F.col(order_col))),
        )
        .drop("__edges")
    )
    order_cols = [order_col] if tie_col is None else [order_col, tie_col]
    w_in = (
        Window.partitionBy(_BUCKET)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        bucketed = bucketed.withColumn(f"cum_{c}", F.sum(c).over(w_in))

    totals = bucketed.groupBy(_BUCKET).agg(
        *[F.sum(c).alias(f"__tot_{c}") for c in value_cols]
    )
    # Exclusive running offset over the <= n_buckets-row totals table —
    # the only global-ordered window, bounded by construction.
    w_off = (
        Window.orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        _BUCKET,
        *[
            F.coalesce(F.sum(f"__tot_{c}").over(w_off), F.lit(0)).alias(
                f"__off_{c}"
            )
            for c in value_cols
        ],
    )
    out = bucketed.join(F.broadcast(offsets), _BUCKET)
    for c in value_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"cum_{c}") + F.col(f"__off_{c}")
        ).drop(f"__off_{c}")
    return out.drop(_BUCKET)


def bucketed_cummax(
    df: DataFrame,
    order_col: str,
    value_col: str,
    *,
    exclusive: bool = False,
    n_buckets: int = 64,
) -> DataFrame:
    """Add ``cummax_<value_col>``: the running maximum of ``value_col``
    over the total order of ``order_col`` — same two-phase shape as
    ``bucketed_cumsum`` (max combines across buckets with GREATEST
    instead of +). With ``exclusive=True`` the frame ends at the
    previous row (NULL for the global first row), the form dominance /
    skyline sweeps need.

    Same tie contract as bucketed_cumsum: pre-collapse equal order
    keys (e.g. groupBy(order_col).agg(max(value))) for deterministic
    per-row results.
    """
    n_buckets = max(2, n_buckets)
    qs = [i / n_buckets for i in range(1, n_buckets)]
    edges_row = df.agg(
        F.expr(
            f"approx_percentile({order_col}, array({', '.join(str(q) for q in qs)}), 1000)"
        ).alias("__edges")
    )
    bucketed = (
        df.join(F.broadcast(edges_row))
        .withColumn(
            _BUCKET,
            F.size(F.filter("__edges", lambda e: e < F.col(order_col))),
        )
        .drop("__edges")
    )
    end = -1 if exclusive else Window.currentRow
    w_in = (
        Window.partitionBy(_BUCKET)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    local = bucketed.withColumn("__local", F.max(value_col).over(w_in))

    totals = bucketed.groupBy(_BUCKET).agg(F.max(value_col).alias("__tot"))
    w_off = Window.orderBy(_BUCKET).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        _BUCKET, F.max("__tot").over(w_off).alias("__off")
    )
    out = local.join(F.broadcast(offsets), _BUCKET).withColumn(
        f"cummax_{value_col}",
        F.when(
            F.col("__local").isNull(), F.col("__off")
        ).when(
            F.col("__off").isNull(), F.col("__local")
        ).otherwise(F.greatest("__local", "__off")),
    )
    return out.drop(_BUCKET, "__local", "__off")


def ecdf_counts(
    df: DataFrame, order_col: str, flag_cols: dict[str, Column], n_buckets: int = 64
) -> DataFrame:
    """Collapse to distinct ``order_col`` keys with per-key counts for
    each named flag expression, then attach exact inclusive cumulative
    counts (``cum_<name>``) over the key order.

    The collapse makes per-row values deterministic (ties merged before
    the scan) and shrinks the windowed stage to distinct keys.
    """
    per_key = df.groupBy(order_col).agg(
        *[F.sum(expr.cast("long")).alias(name) for name, expr in flag_cols.items()]
    )
    return bucketed_cumsum(per_key, order_col, list(flag_cols), n_buckets)
