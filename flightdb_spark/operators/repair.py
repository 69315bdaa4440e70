"""Breakup rematch — the flight-repair job.

The reference's batch repair (app/backend/batch.go:274-404) finds
flights whose track plausibly extends another flight for the same
airframe (breakups happen when fragments were rejected and started a
fresh flight). There it is a nested loop over idspec query results; here
it is a self-join on (icao_id) with a time-window predicate and the same
plausibility rule the assembler uses (suffix gap ≤ kExtensionMaxGap ×
a tolerance, plus bbox adjacency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.geo import haversine_km
from ..streaming.assembly import EXTENSION_MAX_GAP_S

# the repair pass is more lenient than live ingest (batch.go's hunt
# casts a wider net than PlausibleContribution)
REPAIR_GAP_FACTOR = 3.0


def find_breakup_candidates(flights: DataFrame, max_gap_s: float | None = None) -> DataFrame:
    """Candidate (earlier, later) flight pairs per airframe whose spans
    nearly abut: same icao_id, 0 <= gap <= max_gap, ends near each other
    if endpoint columns exist. Returns one row per candidate pair with
    the gap; callers feed accepted pairs back through assemble_batch."""
    gap_max = max_gap_s if max_gap_s is not None else EXTENSION_MAX_GAP_S * REPAIR_GAP_FACTOR
    a = flights.select(
        F.col("flight_id").alias("flight_a"),
        F.col("icao_id").alias("_icao"),
        F.col("last_ts").alias("_a_end"),
        *(
            [F.col("last_lat").alias("_a_lat"), F.col("last_lon").alias("_a_lon")]
            if "last_lat" in flights.columns
            else []
        ),
    )
    b = flights.select(
        F.col("flight_id").alias("flight_b"),
        F.col("icao_id").alias("_icao"),
        F.col("first_ts").alias("_b_start"),
        *(
            [F.col("first_lat").alias("_b_lat"), F.col("first_lon").alias("_b_lon")]
            if "first_lat" in flights.columns
            else []
        ),
    )
    gap = F.unix_timestamp("_b_start") - F.unix_timestamp("_a_end")
    pairs = (
        a.join(b, "_icao")
        .filter(F.col("flight_a") != F.col("flight_b"))
        .filter((gap >= 0) & (gap <= gap_max))
        .withColumn("gap_s", gap)
    )
    if "_a_lat" in pairs.columns and "_b_lat" in pairs.columns:
        dist = haversine_km(F.col("_a_lat"), F.col("_a_lon"), F.col("_b_lat"), F.col("_b_lon"))
        pairs = pairs.withColumn("endpoint_km", F.round(dist, 2))
    return pairs.select(
        F.col("_icao").alias("icao_id"),
        "flight_a",
        "flight_b",
        "gap_s",
        *(["endpoint_km"] if "endpoint_km" in pairs.columns else []),
    )
