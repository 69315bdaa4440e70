"""Custom Python Data Source (Spark 4 ``pyspark.sql.datasource``):
a partitioned, deterministic synthetic-trackpoints connector.

The reference's ingest tier receives trackpoints from external feeds
(PubSub consolidator, fr24/FA pollers — SURVEY §2.1); this is that
source-connector surface expressed through Spark's native DataSource
API instead of a normalizer function: the engine plans one
InputPartition per flight shard, each executor GENERATES its own
shard's rows (no driver-side data, no collect), and the result is a
regular DataFrame any operator downstream can consume.

Everything is md5-derived integer arithmetic on (flight_id, seq), so
the exact same rows are reproducible in SQL — the registry query q217
reads THIS source on the Spark side and rebuilds it from
range()+md5() on the DuckDB side, which makes the connector itself
oracle-checked (no other connector in the repo can claim that).

Usage:
    spark.dataSource.register(SyntheticTracksDataSource)
    df = (spark.read.format("synthetic_tracks")
          .option("n_flights", 50).option("points_per_flight", 120)
          .option("n_partitions", 8).load())
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

SCHEMA = (
    "flight_id bigint, seq int, ts timestamp, lat double, lon double, alt_ft double"
)

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)

# value-derivation moduli (shared with the q217 DuckDB oracle)
LAT_MOD = 18000
LON_MOD = 22900
ALT_MOD = 350


def point_for(flight_id: int, seq: int):
    """One deterministic trackpoint — md5 of 'flight:seq' folded to a
    60-bit int, then pure integer arithmetic (the q30/q64 hash
    discipline applied to generation)."""
    h = int(hashlib.md5(f"{flight_id}:{seq}".encode()).hexdigest()[:15], 16)
    lat = 37.0 + (h % LAT_MOD) / 10000.0
    lon = -122.5 + ((h // LAT_MOD) % LON_MOD) / 10000.0
    alt = float(1000 + ((h // (LAT_MOD * LON_MOD)) % ALT_MOD) * 100)
    ts = T0 + timedelta(seconds=flight_id * 3600 + seq * 10)
    # naive UTC timestamp: Spark's TimestampType expects tz-naive
    # wall-clock values interpreted in the session zone (pinned UTC)
    return (flight_id, seq, ts.replace(tzinfo=None), lat, lon, alt)


class _ShardPartition(InputPartition):
    def __init__(self, shard: int):
        self.shard = shard


class SyntheticTracksReader(DataSourceReader):
    def __init__(self, options):
        self.n_flights = int(options.get("n_flights", 50))
        self.points = int(options.get("points_per_flight", 120))
        self.n_partitions = int(options.get("n_partitions", 8))

    def partitions(self):
        return [_ShardPartition(i) for i in range(self.n_partitions)]

    def read(self, partition):
        # each executor generates only its shard: flight_id ≡ shard
        # (mod n_partitions) — co-located generation, no data motion
        for flight_id in range(partition.shard, self.n_flights, self.n_partitions):
            for seq in range(self.points):
                yield point_for(flight_id, seq)


class SyntheticTracksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_tracks"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticTracksReader(self.options)


def register(spark) -> None:
    """Idempotently register the data source with a session."""
    spark.dataSource.register(SyntheticTracksDataSource)


# ---------------------------------------------------------------------------
# Writer half: a manifest-committing JSON-lines sink on the Spark 4
# DataSourceWriter API — the native-API twin of sinks.py's archive
# exports (SURVEY §2.1's sink tier). Each task writes its partition to
# a private part file and returns a commit message; the DRIVER commits
# by writing _MANIFEST.json (per-part row counts) + _SUCCESS only when
# every task succeeded, and abort() removes the orphaned parts — the
# all-or-nothing file-commit protocol a real lake sink needs.


class _PartCommit(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, options, overwrite: bool):
        path = options.get("path")
        if not path:
            raise ValueError("jsonlines sink needs .option('path', ...)")
        self.path = path
        self.overwrite = overwrite

    def write(self, iterator):
        import json
        import os

        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{pid:05d}.jsonl")
        n = 0
        with open(part, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _PartCommit(part, n)

    def commit(self, messages):
        import json
        import os

        manifest = {
            "parts": {
                os.path.basename(m.path): m.rows
                for m in messages
                if m is not None
            },
        }
        manifest["total_rows"] = sum(manifest["parts"].values())
        with open(os.path.join(self.path, "_MANIFEST.json"), "w") as fh:
            json.dump(manifest, fh, indent=1, sort_keys=True)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write("")

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonLinesSinkDataSource(DataSource):
    """spark.dataSource.register(JsonLinesSinkDataSource);
    df.write.format("jsonlines_sink").option("path", d).mode(...).save()
    """

    @classmethod
    def name(cls) -> str:
        return "jsonlines_sink"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonLinesWriter(self.options, overwrite)


def register_sink(spark) -> None:
    """Idempotently register the sink data source with a session."""
    spark.dataSource.register(JsonLinesSinkDataSource)
