"""Storage layout jobs: bucketing and compaction.

At 100 TB the dominant costs of the per-flight operators (derived
columns q13, windows, assembly, enrichment) are (a) the exchange on
flight_id that every window/groupBy needs and (b) scans over
millions of tiny files. Both are storage-layout problems, solved once
at write time rather than per query:

- ``bucketize``: write a table hash-bucketed AND sorted by its natural
  key via ``bucketBy(...).sortBy(...).saveAsTable``. Spark records the
  bucketing in the catalog; subsequent groupBy/window/join on the key
  read co-located, pre-sorted buckets and plan NO Exchange (verified in
  test_storage::test_bucketed_window_has_no_exchange). Two tables
  bucketed the same way join with neither side shuffling.
- ``compact``: coalesce a directory of small parquet files into
  range-partitioned, key-sorted files of a target size. Range
  partitioning gives non-overlapping key ranges per file, so min/max
  row-group pruning turns key lookups into single-file reads
  (the quadtree-replacement story at the storage layer: the reference
  packs tracks into datastore blobs keyed by flight,
  /root/reference/fgae/db.go; here layout does that job).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    df: DataFrame,
    table: str,
    key: str,
    *,
    buckets: int = 32,
    sort_cols: tuple[str, ...] = (),
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed+sorted managed table. ``buckets``
    should be sized so one bucket of the largest table fits an executor
    (at 100 TB / 1000 executors: thousands of buckets, not 32)."""
    w = df.write.mode("overwrite").bucketBy(buckets, key)
    w = w.sortBy(*(sort_cols or (key,)))
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def compact(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    *,
    key: str,
    target_mb: int = 128,
) -> int:
    """Rewrite a parquet directory as ~target_mb files, range-partitioned
    and sorted by ``key``. Returns the output file count. Range (not
    hash) partitioning keeps per-file key ranges disjoint so min/max
    statistics prune to one file per key lookup."""
    if "://" in src_dir or "://" in out_dir:
        # file sizing walks the driver-local filesystem with os.walk,
        # which cannot traverse ANY URI (file: included) — a scheme'd
        # path would size to 0 -> ONE partition for the whole dataset.
        # The production port uses the Hadoop FileSystem API here.
        raise ValueError(
            f"compact requires plain local paths, got {src_dir!r} -> {out_dir!r}"
        )
    df = spark.read.parquet(src_dir)
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(src_dir)
        for f in files
        if f.endswith(".parquet")
    )
    n_files = max(1, round(total_bytes / (target_mb * 1024 * 1024)))
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return sum(1 for f in os.listdir(out_dir) if f.endswith(".parquet"))


def zorder_key(
    lat_col: str = "lat", lon_col: str = "lon", bits: int = 12
):
    """Morton (Z-order) key for two geo columns: quantize each
    coordinate to ``bits`` bits over its full range, then interleave
    the bits. Sorting/range-partitioning by this key clusters rows
    that are close in BOTH dimensions into the same files, so per-file
    lat/lon min/max statistics prune two-dimensional query boxes —
    a single-column sort only ever bounds one dimension. This is the
    write-time layout for the geo operators (waypoint join q23,
    restrictor bbox prefilter, trajectory grid q47): at 100 TB their
    bbox prefilters become file-skipping instead of full scans.
    Pure integer column arithmetic — engine-reproducible."""
    from pyspark.sql import functions as F

    top = (1 << bits) - 1
    qlat = F.least(
        F.lit(top).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor((F.col(lat_col) + 90.0) / 180.0 * top),
        ),
    )
    qlon = F.least(
        F.lit(top).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor((F.col(lon_col) + 180.0) / 360.0 * top),
        ),
    )
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(qlat, i).bitwiseAND(1), 2 * i + 1)
            + F.shiftleft(F.shiftright(qlon, i).bitwiseAND(1), 2 * i)
        )
    return key


def zorder_write(
    df: DataFrame,
    out_path: str,
    *,
    lat_col: str = "lat",
    lon_col: str = "lon",
    n_files: int = 16,
    bits: int = 12,
) -> None:
    """Write ``df`` range-partitioned and sorted by its Z-order key:
    ``n_files`` files with disjoint Morton ranges, i.e. spatial tiles.
    Range partitioning samples the key distribution, so skewed data
    (all flights over one metro) still splits evenly."""
    from pyspark.sql import functions as F

    (
        df.withColumn("_z", zorder_key(lat_col, lon_col, bits))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def build_manifest(spark: SparkSession, path: str, key: str) -> DataFrame:
    """Per-file statistics manifest for ``key`` over a parquet
    directory: (file, min_key, max_key, n_rows) — the table-format
    manifest pattern (Iceberg/Delta keep exactly this) on plain
    parquet. One scan keyed by ``input_file_name()``; the output is
    file-level metadata, thousands of rows at most, cheap to persist
    next to the data and rebuild after compaction.

    Combined with ``compact``'s range partitioning (disjoint key ranges
    per file), the manifest turns key-range scans into reads of the
    few covering files — ``pruned_read`` below."""
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), F.col(key).alias("_k"))
        .groupBy("file")
        .agg(
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def pruned_read(
    spark: SparkSession,
    path: str,
    key: str,
    lo,
    hi,
    *,
    manifest: DataFrame | None = None,
) -> tuple[DataFrame, int, int]:
    """Range scan with manifest-driven file skipping: read only the
    files whose [min_key, max_key] intersects [lo, hi], then apply the
    exact predicate. Returns (df, files_read, files_total).

    The driver materializes the FILE LIST only (file-level metadata —
    the same thing every table format's planner collects); row data
    never crosses. On range-partitioned layouts (``compact``) a point
    or narrow-range lookup reads one file instead of the directory."""
    from pyspark.sql import functions as F

    m = manifest if manifest is not None else build_manifest(spark, path, key)
    rows = m.select("file", "min_key", "max_key").collect()
    keep = [r["file"] for r in rows if r["max_key"] >= lo and r["min_key"] <= hi]
    pred = F.col(key).between(lo, hi)
    if not keep:
        return (
            spark.read.parquet(path).filter(F.lit(False)),
            0,
            len(rows),
        )
    return spark.read.parquet(*keep).filter(pred), len(keep), len(rows)
