"""Incremental near-duplicate ingest gate: a Structured Streaming
foreachBatch job that maintains a persistent MinHash signature index
and admits only documents that near-duplicate neither the index nor an
earlier doc in their own micro-batch.

This is the streaming composition of the batch dedup chain
(operators/textdedup.py): exact dedup gates in-stream
(textdedup.dedup_stream, fingerprint state inside the watermark);
NEAR-dup needs corpus history, which no watermarked state can hold —
so the index lives in storage and each micro-batch band-joins against
it. The decision rule is the q31 LSH economics: candidates share
>= ``min_bands`` of the per-seed band buckets; no pairwise scan ever
happens.

Exactly-once: both outputs (accepted docs, index delta) write to
``batch_id=N`` directories committed by a single marker file —
the IdempotentParquetSink protocol (streaming/sinks.py); a redelivered
batch id is a no-op, and readers (including the NEXT batch's index
read) only see committed directories.

Intra-batch policy: a doc is rejected if it collides with a SMALLER
doc_id in its batch (greedy first-wins). A chain A~B~C can then reject
C on the strength of the already-rejected B — the standard
conservative streaming approximation; exact cluster resolution (q51's
connected components) runs in the batch pipeline, not per micro-batch.

At 100 TB/day: the index grows by survivor signatures only (a few
bigints per doc); band-join cost tracks bucket collisions; compaction
of ``batch_id=`` deltas into larger files is storage.compact's job and
never blocks ingest.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import textdedup

SEEDS = (0, 1, 2, 3)


class NearDupIndexGate:
    """foreachBatch target: near-dup-gate each micro-batch of documents
    against the persistent signature index at ``index_root``, append
    survivors' rows to ``accepted_root`` and their signatures to the
    index. ``min_bands`` = LSH bands two docs must share to count as
    near-duplicates (1 = any collision, len(seeds) = full signature)."""

    def __init__(
        self,
        accepted_root: str,
        index_root: str,
        *,
        min_bands: int = 2,
        seeds: tuple[int, ...] = SEEDS,
    ):
        for root in (accepted_root, index_root):
            if "://" in root:
                raise ValueError(f"plain local path required, got {root!r}")
        self.accepted_root = accepted_root
        self.index_root = index_root
        self.min_bands = min_bands
        self.seeds = seeds
        self.stats: list[dict] = []  # per-batch observability

    # -- marker protocol (shared commit point for BOTH outputs) -------
    def _marker(self, batch_id: int) -> str:
        return os.path.join(self.accepted_root, f"batch_id={batch_id}", "_COMMITTED")

    def _committed_index_dirs(self, spark: SparkSession) -> list[str]:
        if not os.path.isdir(self.index_root):
            return []
        out = []
        for d in sorted(os.listdir(self.index_root)):
            full = os.path.join(self.index_root, d)
            bid = d.split("=")[-1]
            if d.startswith("batch_id=") and os.path.exists(
                self._marker(int(bid))
            ):
                out.append(full)
        return out

    def _read_index(self, spark: SparkSession) -> DataFrame | None:
        dirs = self._committed_index_dirs(spark)
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(self._marker(batch_id)):
            self.stats.append({"batch_id": batch_id, "redelivered": True})
            return
        spark = batch_df.sparkSession
        batch_df = batch_df.localCheckpoint()

        sigs = textdedup.minhash_signatures(
            textdedup.shingles(batch_df), seeds=self.seeds
        ).localCheckpoint()
        bands = textdedup.lsh_bands(sigs, seeds=self.seeds)

        # vs the committed index
        index = self._read_index(spark)
        if index is not None:
            idx_bands = textdedup.lsh_bands(index, seeds=self.seeds).select(
                "band", "h"
            )
            vs_index = (
                bands.join(idx_bands, ["band", "h"])
                .groupBy("doc_id")
                .agg(F.countDistinct("band").alias("nb"))
                .filter(F.col("nb") >= self.min_bands)
                .select("doc_id")
            )
        else:
            vs_index = None

        # vs earlier docs in the SAME batch (greedy first-wins)
        intra = (
            textdedup.lsh_candidate_pairs(bands)
            .filter(F.col("n_shared_bands") >= self.min_bands)
            .select(F.col("doc_b").alias("doc_id"))
            .distinct()
        )
        rejected = intra if vs_index is None else vs_index.union(intra).distinct()
        accepted = batch_df.join(rejected, "doc_id", "left_anti")
        accepted_sigs = sigs.join(rejected, "doc_id", "left_anti")

        adir = os.path.join(self.accepted_root, f"batch_id={batch_id}")
        idir = os.path.join(self.index_root, f"batch_id={batch_id}")
        accepted.write.mode("overwrite").parquet(adir)
        accepted_sigs.write.mode("overwrite").parquet(idir)
        with open(self._marker(batch_id), "w") as fh:
            fh.write("")
        self.stats.append(
            {
                "batch_id": batch_id,
                "redelivered": False,
                "n_in": batch_df.count(),
                "n_accepted": accepted.count(),
            }
        )

    def read_accepted(self, spark: SparkSession) -> DataFrame:
        dirs = [
            os.path.join(self.accepted_root, d)
            for d in sorted(os.listdir(self.accepted_root))
            if d.startswith("batch_id=")
            and os.path.exists(os.path.join(self.accepted_root, d, "_COMMITTED"))
        ]
        return spark.read.parquet(*dirs)


def neardup_gate_stream(
    stream: DataFrame,
    gate: NearDupIndexGate,
    checkpoint: str,
):
    """Wire the gate into a stream: returns the started StreamingQuery
    (availableNow-compatible; call .awaitTermination())."""
    return (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
