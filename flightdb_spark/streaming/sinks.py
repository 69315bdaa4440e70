"""Exactly-once streaming sinks via foreachBatch.

Structured Streaming's checkpoint gives at-least-once delivery to a
foreachBatch function: after a crash between "batch written" and
"offset committed", the SAME batch (same ``batch_id``) is re-run. A
sink is exactly-once iff re-delivering a batch id is a no-op. This
module implements the standard recipe — write each micro-batch to a
``batch_id``-named unit atomically, skip ids that already committed —
which is how every idempotent parquet/warehouse sink works in
production (Delta's txn versioning is the same idea with a log).

At 100 TB/day this is also the layout answer: per-batch directories
compact later (storage.compact) without blocking ingest, and the
marker protocol makes replays from any checkpoint state safe.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


class IdempotentParquetSink:
    """foreachBatch target writing each micro-batch to
    ``root/batch_id=N/`` with a ``_COMMITTED`` marker.

    Protocol per batch:
      1. if marker exists -> redelivery; do nothing (exactly-once)
      2. write parquet to the batch dir (overwrite: a torn previous
         attempt without marker is simply rewritten)
      3. drop the marker (rename-free single-file create: the commit
         point)

    Readers take only marked directories (``read`` below), so a torn
    write is never visible. The batch dir layout keeps replays and
    compaction independent of the stream's checkpoint state."""

    def __init__(self, root: str):
        if "://" in root:
            # markers use driver-local os.path/open(), which treat ANY
            # URI (file: included) as a literal relative path — the
            # marker write would crash AFTER the data landed, or an
            # object-store root would re-detect every batch as new.
            # The production port swaps the marker for the store's
            # conditional-put (S3 If-None-Match / GCS preconditions).
            raise ValueError(
                f"IdempotentParquetSink requires a plain local path root, got {root!r}"
            )
        self.root = root
        self.skipped: list[int] = []  # redelivered batch ids (observability)

    def _dir(self, batch_id: int) -> str:
        return os.path.join(self.root, f"batch_id={batch_id}")

    def _marker(self, batch_id: int) -> str:
        return os.path.join(self._dir(batch_id), "_COMMITTED")

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            self.skipped.append(batch_id)
            return
        batch_df.write.mode("overwrite").parquet(self._dir(batch_id))
        with open(self._marker(batch_id), "w") as f:
            f.write("ok\n")

    def committed_ids(self) -> list[int]:
        if not os.path.isdir(self.root):
            return []
        out = []
        for name in os.listdir(self.root):
            if name.startswith("batch_id=") and os.path.exists(
                os.path.join(self.root, name, "_COMMITTED")
            ):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def read(self, spark) -> DataFrame:
        """Union of committed batches only — torn writes invisible."""
        dirs = [self._dir(b) for b in self.committed_ids()]
        if not dirs:
            raise ValueError(f"no committed batches under {self.root}")
        return spark.read.parquet(*dirs)
