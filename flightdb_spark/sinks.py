"""Output sinks: CSV report download, JSON flight dump, verified archive.

- CSV (report/csv.go:9-23): report rows as CSV.
- JSON (ui/json.go:42-82): full flights as JSON lines; the cross-env
  import ("snarf", ui/json.go:89-142) is just read-side `spark.read.json`.
- Archive (cmd/fdb/fdb.go:210-357): cold-tier export that re-reads what
  it wrote and verifies equality before the caller deletes from the hot
  tier — exceptAll in both directions must be empty, the set-based
  DeepEqual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_report_csv(rows: DataFrame, path: str) -> None:
    """CSV report sink (report/csv.go:9-23). Single file for download
    parity (driver-side coalesce is fine: report rows are small by
    construction)."""
    rows.coalesce(1).write.mode("overwrite").option("header", True).csv(path)


def flights_to_json(flights: DataFrame, path: str | None = None):
    """JSON flight dump (/fdb/json, ui/json.go:42-82). Returns the
    JSON-lines DataFrame; writes when a path is given."""
    js = flights.select(F.to_json(F.struct(*flights.columns)).alias("value"))
    if path is not None:
        js.write.mode("overwrite").text(path)
    return js


def import_flights_json(spark: SparkSession, path: str) -> DataFrame:
    """Cross-environment import (the "snarf", ui/json.go:89-142)."""
    return spark.read.json(path)


def archive_verified(df: DataFrame, path: str) -> bool:
    """Write a cold-tier parquet copy, read it back, and verify the
    round trip byte-for-byte at the row level (the archiver's
    decode+DeepEqual check, cmd/fdb/fdb.go:301-357). Returns True when
    safe to delete the hot copy."""
    df.write.mode("overwrite").parquet(path)
    back = df.sparkSession.read.parquet(path)
    missing = df.exceptAll(back).count()
    extra = back.exceptAll(df).count()
    return missing == 0 and extra == 0
