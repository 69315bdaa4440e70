"""FIFOSet streaming dedup — the reference's recently-seen suppressor
(fifoset.go:10-63) on the transformWithState arbitrary-state API.

Reference semantics: a key (registration:callsign in the fr24 poller,
fifoset.go:25-27) is admitted the FIRST time it is seen; repeats are
suppressed until the entry AGES OUT — expiry is anchored at the
admission time (``Created``, set once at AddIfNew and never refreshed,
fifoset.go:34-47), so a key re-admits exactly ``ttl`` after its last
admission, even if sightings kept arriving in between. The fr24 poller
runs FindNew over each poll and processes only the new snapshots
(app/frontend/fr24poller.go:174-229).

Two implementations of the same greedy rule, sharing one per-key pure
function so they cannot drift:

- ``fifo_dedup_batch``: applyInPandas per key (Arrow-batched). Greedy
  anchored emission is sequentially dependent (each admission depends
  on the previous admission's time), so it is not window-expressible —
  same reasoning as trackops.sample_every.
- ``fifo_dedup_stream``: Structured Streaming via
  ``transformWithStateInPandas`` (Spark 4 arbitrary state): ValueState
  holds the last admission epoch per key; expiry is EVENT-time anchored
  so batch and stream agree deterministically on ordered input (a
  processing-time TTL would make results wall-clock dependent).

State is one double per key — at 100 TB/day the state store carries
|distinct keys| rows regardless of event volume.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

DEFAULT_TTL_S = 2 * 3600.0  # fifoset.go age-out as used by the fr24 poller


def _admit(pdf: pd.DataFrame, ts_col: str, ttl_s: float, anchor: float | None):
    """Greedy anchored admission over one key's rows (must be sorted by
    ``ts_col``): admit when no live anchor, or when the row's event time
    is >= anchor + ttl; each admission resets the anchor to its own
    time. Returns (admitted row mask, new anchor)."""
    epochs = pdf[ts_col].astype("int64") / 1e9  # tz-naive ns -> epoch s
    mask = []
    for e in epochs:
        if anchor is None or e >= anchor + ttl_s:
            mask.append(True)
            anchor = e
        else:
            mask.append(False)
    return mask, anchor


def fifo_dedup_batch(
    df: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("registration", "callsign"),
    ts_col: str = "ts",
    ttl_s: float = DEFAULT_TTL_S,
) -> DataFrame:
    """Batch FIFOSet: first sighting per key admitted, repeats
    suppressed until ttl past the last ADMISSION (not the last
    sighting). One shuffle on the key; the greedy scan is per-key
    Arrow-batched Python (sequentially dependent, like sample_every)."""
    schema = df.schema

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        mask, _ = _admit(pdf, ts_col, ttl_s, None)
        return pdf[mask]

    return df.groupBy(*[F.col(c) for c in key_cols]).applyInPandas(fn, schema)


class _FifoProcessor(StatefulProcessor):
    """transformWithStateInPandas processor: ValueState = last admission
    epoch (seconds). Event-time anchored, so replaying the same ordered
    stream yields the same admissions as the batch twin."""

    def __init__(self, ts_col: str, ttl_s: float) -> None:
        self._ts_col = ts_col
        self._ttl_s = ttl_s

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._anchor = handle.getValueState("anchor", "anchor_epoch double")

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: "TimerValues"
    ) -> Iterator[pd.DataFrame]:
        got = self._anchor.get()
        anchor = got[0] if got is not None else None
        for pdf in rows:
            pdf = pdf.sort_values(self._ts_col, kind="mergesort")
            mask, anchor = _admit(pdf, self._ts_col, self._ttl_s, anchor)
            out = pdf[mask]
            if len(out):
                yield out
        if anchor is not None:
            self._anchor.update((float(anchor),))

    def close(self) -> None:
        pass


def fifo_dedup_stream(
    stream: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("registration", "callsign"),
    ts_col: str = "ts",
    ttl_s: float = DEFAULT_TTL_S,
) -> DataFrame:
    """Streaming FIFOSet on the Spark 4 arbitrary-state API
    (transformWithStateInPandas). State = one double per key (last
    admission epoch); output mode append — admitted rows flow through
    unchanged, suppressed rows are dropped inside the processor.

    NOTE: the transformWithState state protocol needs the
    ``google.protobuf`` wheel in the Python environment
    (pyspark/sql/streaming/proto). Where it is absent, use
    ``fifo_dedup_stream_legacy`` — same semantics on the
    applyInPandasWithState API."""
    out_schema = stream.schema
    return stream.groupBy(*[F.col(c) for c in key_cols]).transformWithStateInPandas(
        _FifoProcessor(ts_col, ttl_s),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )


def fifo_dedup_stream_legacy(
    stream: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("registration", "callsign"),
    ts_col: str = "ts",
    ttl_s: float = DEFAULT_TTL_S,
) -> DataFrame:
    """FIFOSet on applyInPandasWithState (the GroupState API used by
    streaming/assembly.py): identical admissions to
    ``fifo_dedup_stream`` — both call ``_admit`` with an anchor carried
    in per-key state."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = stream.schema

    def _fn(key, pdfs: Iterator[pd.DataFrame], state: "GroupState"):
        anchor = state.get[0] if state.exists else None
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col, kind="mergesort")
            mask, anchor = _admit(pdf, ts_col, ttl_s, anchor)
            out = pdf[mask]
            if len(out):
                yield out
        if anchor is not None:
            state.update((float(anchor),))

    return stream.groupBy(*[F.col(c) for c in key_cols]).applyInPandasWithState(
        _fn,
        outputStructType=out_schema,
        stateStructType="anchor_epoch double",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
