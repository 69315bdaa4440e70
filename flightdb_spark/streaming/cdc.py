"""Streaming CDC apply: a keyed state table maintained by foreachBatch
MERGE with bucket-level copy-on-write.

The batch-side semantics are q176_cdc_upsert (queries/warehouse.py):
each micro-batch collapses to one last-wins row per key, tombstones
delete, and the result merges into the accumulated state. What this
module adds is the STORAGE protocol that makes the merge scale and
replay safely:

- State lives in hash buckets (``bucket=K`` parquet dirs). A
  micro-batch only REWRITES the buckets its keys touch; untouched
  buckets are carried forward BY REFERENCE in a per-version manifest
  — the file-level pruning a lakehouse MERGE INTO does (Delta/Iceberg
  rewrite only matching files), so a 1 %-of-keys batch rewrites ~1 %
  of a 100 TB table, not all of it.
- Versions commit with a marker naming the micro-batch id; a
  redelivered batch id (at-least-once replay after a crash) is a
  no-op, making the sink exactly-once (streaming/sinks.py protocol).
- Readers resolve the latest committed manifest and union its bucket
  references — torn writes are never visible, and any older version
  remains readable (time travel for free).

Local-path only, like IdempotentParquetSink: markers and manifests
use driver-local file ops; an object-store port swaps those for
conditional puts.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CdcStateTable:
    """Bucketed copy-on-write keyed state with last-wins CDC merge.

    Parameters: ``key_col`` the merge key; ``order_cols`` the
    last-wins order (later wins, ties broken by later columns);
    ``tombstone`` an optional SQL boolean expression over the
    collapsed row — true means DELETE the key; ``n_buckets`` the
    copy-on-write granularity."""

    def __init__(
        self,
        root: str,
        key_col: str,
        order_cols: list[str],
        tombstone: str | None = None,
        n_buckets: int = 8,
    ):
        if "://" in root:
            raise ValueError(f"CdcStateTable requires a local path root, got {root!r}")
        self.root = root
        self.key_col = key_col
        self.order_cols = order_cols
        self.tombstone = tombstone
        self.n_buckets = n_buckets
        os.makedirs(root, exist_ok=True)

    # -- version bookkeeping ------------------------------------------------
    def _vdir(self, v: int) -> str:
        return os.path.join(self.root, f"version={v}")

    def committed_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self.root):
            if name.startswith("version=") and os.path.exists(
                os.path.join(self.root, name, "_COMMITTED")
            ):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def applied_batch_ids(self) -> set[int]:
        ids = set()
        for v in self.committed_versions():
            with open(os.path.join(self._vdir(v), "_COMMITTED")) as f:
                ids.add(json.load(f)["batch_id"])
        return ids

    def _manifest(self, v: int) -> dict[str, str]:
        with open(os.path.join(self._vdir(v), "_MANIFEST.json")) as f:
            return json.load(f)

    # -- merge --------------------------------------------------------------
    def _bucket(self, col: F.Column) -> F.Column:
        return F.pmod(F.xxhash64(col), F.lit(self.n_buckets))

    def _collapse(self, df: DataFrame) -> DataFrame:
        """Last-wins one row per key within a batch."""
        order = F.struct(*self.order_cols)
        aggs = [
            F.max_by(c, order).alias(c)
            for c in df.columns
            if c != self.key_col
        ]
        return df.groupBy(self.key_col).agg(*aggs)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch entry point: MERGE the micro-batch."""
        if batch_id in self.applied_batch_ids():
            return  # redelivery -> no-op (exactly-once)
        spark = batch_df.sparkSession
        collapsed = self._collapse(batch_df).withColumn(
            "__bucket", self._bucket(F.col(self.key_col))
        )
        # bucket pruning: only these buckets rewrite
        touched = sorted(
            r["__bucket"]
            for r in collapsed.select("__bucket").distinct().collect()
        )
        versions = self.committed_versions()
        prev_manifest = self._manifest(versions[-1]) if versions else {}
        new_v = (versions[-1] + 1) if versions else 0
        vdir = self._vdir(new_v)
        os.makedirs(vdir, exist_ok=True)

        manifest: dict[str, str] = {}
        for b, path in prev_manifest.items():
            if int(b) not in touched:
                manifest[b] = path  # carried forward by reference

        for b in touched:
            batch_b = collapsed.filter(F.col("__bucket") == b).drop("__bucket")
            prev_path = prev_manifest.get(str(b))
            if prev_path is not None:
                cur = spark.read.parquet(prev_path)
                batch_keys = batch_b.select(self.key_col)
                survivors = cur.join(batch_keys, self.key_col, "left_anti")
                merged = survivors.unionByName(batch_b)
            else:
                merged = batch_b
            if self.tombstone is not None:
                merged = merged.filter(f"NOT ({self.tombstone})")
            out = os.path.join(vdir, f"bucket={b}")
            merged.write.mode("overwrite").parquet(out)
            manifest[str(b)] = out

        with open(os.path.join(vdir, "_MANIFEST.json"), "w") as f:
            json.dump(manifest, f)
        with open(os.path.join(vdir, "_COMMITTED"), "w") as f:
            json.dump({"batch_id": batch_id}, f)

    # -- read ---------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Current (or time-travel) state: union the manifest's bucket
        references. Empty table -> None."""
        versions = self.committed_versions()
        if not versions:
            return None
        v = versions[-1] if version is None else version
        paths = sorted(set(self._manifest(v).values()))
        if not paths:
            return None
        return spark.read.parquet(*paths)


def apply_cdc_stream(
    stream: DataFrame,
    table: CdcStateTable,
    checkpoint: str,
):
    """Wire a change-feed stream into the state table (availableNow
    friendly; caller awaits termination)."""
    return (
        stream.writeStream.foreachBatch(table)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
