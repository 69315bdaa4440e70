"""Streaming heavy hitters: a Space-Saving sketch per group key in
Structured Streaming custom state.

Exact streaming top-k needs unbounded per-key state (every distinct
item's count); Space-Saving (Metwally et al., "Efficient computation of
frequent and top-k elements in data streams", ICDT 2005) caps state at
``capacity`` counters with the classic guarantees:

- every item with true count > n / capacity is IN the sketch;
- each reported count overestimates by at most its recorded error
  (the evicted count it inherited), also bounded by n / capacity;
- with capacity >= distinct items the counts are exact.

Eviction replaces the minimum-count counter and inherits its count —
ties broken by item string so replays are deterministic. One sketch
per group key (bounded state: capacity counters x keys), updated per
micro-batch via ``applyInPandasWithState``; each batch emits the
group's current top-k estimates (update semantics — downstream sinks
key on (group, item)).

The batch twin ``spacesaving_batch`` runs the same greedy core over a
static frame for stream==batch tests and backfills.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OUT_SCHEMA = "grp string, item string, est_count long, max_err long"
STATE_SCHEMA = (
    "items array<string>, counts array<long>, errs array<long>, n long"
)


def _update(
    sketch: dict[str, tuple[int, int]], items: list[str], capacity: int
) -> dict[str, tuple[int, int]]:
    """Feed items through a Space-Saving sketch {item: (count, err)}."""
    for it in items:
        if it in sketch:
            c, e = sketch[it]
            sketch[it] = (c + 1, e)
        elif len(sketch) < capacity:
            sketch[it] = (1, 0)
        else:
            # evict the min-count counter; tie-break on item string so
            # every engine/replay picks the same victim
            victim = min(sketch, key=lambda k: (sketch[k][0], k))
            vc, _ = sketch.pop(victim)
            sketch[it] = (vc + 1, vc)
    return sketch


def _topk(sketch: dict[str, tuple[int, int]], k: int) -> list[tuple[str, int, int]]:
    ranked = sorted(sketch.items(), key=lambda kv: (-kv[1][0], kv[0]))
    return [(it, c, e) for it, (c, e) in ranked[:k]]


def _ordered_items(
    pdf: pd.DataFrame, item_col: str, order_col: str | None
) -> list[str]:
    """Group rows in a replay-stable order: the shuffle feeding
    applyInPandas delivers rows in fetch order (varies run to run), so
    the sketch must impose its own order — by ``order_col`` (e.g. a
    timestamp, item as tie-break) when given, else by item value. The
    sketch's guarantees hold for ANY order; sorting only pins WHICH
    within-error answer every run returns."""
    if order_col is not None:
        pdf = pdf.sort_values([order_col, item_col], kind="mergesort")
    else:
        pdf = pdf.sort_values(item_col, kind="mergesort")
    return list(pdf[item_col].astype(str))


def spacesaving_batch(
    df: DataFrame,
    *,
    grp_col: str,
    item_col: str,
    capacity: int = 32,
    k: int = 10,
    order_col: str | None = None,
) -> DataFrame:
    """Static-frame twin: one deterministic Space-Saving pass per
    group (rows re-ordered per ``_ordered_items``)."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        grp = pdf[grp_col].iloc[0]
        sketch = _update({}, _ordered_items(pdf, item_col, order_col), capacity)
        rows = _topk(sketch, k)
        return pd.DataFrame(
            {
                "grp": [grp] * len(rows),
                "item": [r[0] for r in rows],
                "est_count": [r[1] for r in rows],
                "max_err": [r[2] for r in rows],
            }
        )

    return df.groupBy(grp_col).applyInPandas(fn, OUT_SCHEMA)


def heavy_hitters_stream(
    stream: DataFrame,
    *,
    grp_col: str,
    item_col: str,
    capacity: int = 32,
    k: int = 10,
    order_col: str | None = None,
) -> DataFrame:
    """Streaming Space-Saving per group key: state = the sketch's
    parallel arrays, output = the group's current top-k after each
    micro-batch. Within a batch, rows feed the sketch in the
    ``_ordered_items`` order so checkpoint replays are bit-identical."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _fn(key, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        grp = key[0]
        if state.exists:
            items, counts, errs, n = state.get
            sketch = {
                it: (int(c), int(e)) for it, c, e in zip(items, counts, errs)
            }
            n = int(n)
        else:
            sketch, n = {}, 0
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            batch = pd.concat(chunks)
            vals = _ordered_items(batch, item_col, order_col)
            sketch = _update(sketch, vals, capacity)
            n += len(vals)
        its = sorted(sketch)  # canonical state order
        state.update(
            (
                its,
                [sketch[i][0] for i in its],
                [sketch[i][1] for i in its],
                n,
            )
        )
        rows = _topk(sketch, k)
        yield pd.DataFrame(
            {
                "grp": [grp] * len(rows),
                "item": [r[0] for r in rows],
                "est_count": [r[1] for r in rows],
                "max_err": [r[2] for r in rows],
            }
        )

    return stream.groupBy(F.col(grp_col)).applyInPandasWithState(
        _fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
