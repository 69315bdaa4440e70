"""Synthetic trackpoints derived from the driver's ``events`` table.

The driver's correctness tables are TPC-H-ish and have no lat/lon, but
the reference's signature operators are geospatial (SURVEY.md §2.4-2.6).
To put those operators behind the DuckDB-oracle correctness gate we
derive a deterministic trackpoints table from ``events`` using *pure
integer arithmetic* (no trig, no floats in the derivation) so Spark and
DuckDB produce bit-identical inputs:

  flight_id = user_id            (a "flight" per user)
  ts        = event ts           (time-ordered points per flight)
  lat       = 37.0  + (event_id % 181) / 100.0          [37.00 .. 38.80]
  lon       = -122.5 + ((event_id * 7) % 229) / 100.0   [-122.50 .. -120.22]
  alt_ft    = 1000 + (event_id % 350) * 100             [1000 .. 35900]

This mirrors the reference's synthetic-geometry test strategy
(intersectabletrack_test.go:14-30 builds tracks from lat/long/alt
triples), re-targeted at the driver's tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import ensure_parallelism, load_table

# SQL view of the same derivation, for DuckDB oracles (events is a
# pre-registered view on the driver side).
SYNTH_TP_CTE = """
trackpoints AS (
  SELECT
    user_id                                         AS flight_id,
    ts,
    event_id,
    event_type,
    value,
    37.0 + (event_id % 181) / 100.0                 AS lat,
    -122.5 + ((event_id * 7) % 229) / 100.0         AS lon,
    CAST(1000 + (event_id % 350) * 100 AS DOUBLE)   AS alt_ft
  FROM events
)
"""


def synth_trackpoints(
    spark: SparkSession, sf_dir: str, *, parallelize: bool = True
) -> DataFrame:
    """DataFrame twin of SYNTH_TP_CTE (same arithmetic, DataFrame API).

    ``parallelize=False`` skips the round-robin scan split: callers
    whose FIRST operation is already a shuffle (window / groupBy on
    flight_id, e.g. q21) gain nothing from pre-splitting — the extra
    exchange just rewrites the whole fact table once more (measured
    2x on q21 at sf0.1). Callers with per-point trig BEFORE any
    shuffle keep the default."""
    ev = load_table(spark, sf_dir, "events")
    if parallelize:
        ev = ensure_parallelism(ev)
    return ev.select(
        F.col("user_id").alias("flight_id"),
        "ts",
        "event_id",
        "event_type",
        "value",
        (F.lit(37.0) + (F.col("event_id") % 181) / 100.0).alias("lat"),
        (F.lit(-122.5) + ((F.col("event_id") * 7) % 229) / 100.0).alias("lon"),
        (F.lit(1000) + (F.col("event_id") % 350) * 100).cast("double").alias("alt_ft"),
    )
