"""Streaming drift monitoring: per-micro-batch PSI against a frozen
reference distribution.

The production pattern behind q128's batch PSI: fit decile edges ONCE
on a trusted reference window, freeze them, then score every incoming
micro-batch against the frozen bins inside ``foreachBatch``. Drift
alarms must compare against a FIXED reference — re-deriving bins from
the stream would hide exactly the shift being monitored.

Each batch emits one row ``(batch_id, n_rows, n_bins, psi)`` through
the exactly-once IdempotentParquetSink protocol (redelivered batch ids
no-op), so the monitor's output table is itself safe to alert on.

Scale notes: scoring a batch is one bounded aggregate (bin counts) on
the executors — the per-batch driver work is arithmetic on <= n_bins
rows. The reference edges are a tiny Python list broadcast into the
bin expression; nothing about the stream re-partitions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.streaming.sinks import IdempotentParquetSink


class PsiDriftMonitor:
    """Fit reference quantile edges, then score DataFrames (micro-
    batches or plain frames) with the q128 PSI definition: per-bin
    (p_ref - p_cur) * ln(p_ref / p_cur), summed over bins populated on
    BOTH sides (the q128 zero-bin rule), terms rounded at 8 dp."""

    def __init__(self, n_bins: int = 10):
        self.n_bins = n_bins
        self.edges: list[float] | None = None
        self.ref_fracs: list[float] | None = None

    def fit(self, reference: DataFrame, value_col: str = "value") -> "PsiDriftMonitor":
        qs = [i / self.n_bins for i in range(1, self.n_bins)]
        row = reference.agg(
            F.expr(
                f"percentile({value_col}, array({', '.join(str(q) for q in qs)}))"
            ).alias("edges")
        ).collect()[0]
        self.edges = [float(e) for e in row["edges"]]
        counts = self._bin_counts(reference, value_col)
        total = sum(counts.values())
        self.ref_fracs = [
            counts.get(b, 0) / total for b in range(self.n_bins)
        ]
        return self

    def _bin_expr(self, value_col: str):
        assert self.edges is not None, "fit() first"
        edges_arr = F.array(*[F.lit(e) for e in self.edges])
        return F.size(F.filter(edges_arr, lambda e: e < F.col(value_col)))

    def _bin_counts(self, df: DataFrame, value_col: str) -> dict[int, int]:
        rows = (
            df.select(self._bin_expr(value_col).alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        return {int(r["bin"]): int(r["n"]) for r in rows}

    def score(self, df: DataFrame, value_col: str = "value") -> tuple[int, float]:
        """Return (n_rows, psi) for one frame against the fitted
        reference. Bins empty on either side are skipped (q128 rule)."""
        assert self.ref_fracs is not None, "fit() first"
        counts = self._bin_counts(df, value_col)
        total = sum(counts.values())
        if total == 0:
            return 0, 0.0
        psi = 0.0
        for b in range(self.n_bins):
            pr = self.ref_fracs[b]
            pc = counts.get(b, 0) / total
            if pr > 0 and pc > 0:
                psi += round((pr - pc) * math.log(pr / pc), 8)
        return total, round(psi, 5)

    def foreach_batch(self, out_dir: str, value_col: str = "value"):
        """Build a foreachBatch function that scores every micro-batch
        and appends ``(batch_id, n_rows, n_bins, psi)`` exactly-once."""
        sink = IdempotentParquetSink(out_dir)
        n_bins = self.n_bins

        def _fn(batch_df: DataFrame, batch_id: int) -> None:
            n, psi = self.score(batch_df, value_col)
            spark = batch_df.sparkSession
            row = spark.createDataFrame(
                [(int(batch_id), n, n_bins, psi)],
                "batch_id long, n_rows long, n_bins int, psi double",
            )
            sink(row, batch_id)

        return _fn

    @staticmethod
    def read_scores(spark: SparkSession, out_dir: str) -> DataFrame:
        return IdempotentParquetSink(out_dir).read(spark)
