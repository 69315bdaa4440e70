"""FAA FOIA radar CSV ingest (faadata/row.go, faadata/faadata.go).

The only self-contained batch source in the reference: gzip CSV dumps,
one row per radar return, consecutive rows of one flight sharing
(AIRCRAFT_ID, FLIGHT_INDEX) — the pair is the grouping key
(faadata/row.go:146-148; AIRCRAFT_ID alone is NOT unique,
row.go:134-144).

Spark-first re-expression: header-driven ``spark.read.csv`` →
projection casts (row.go:112-129) → a real ``groupBy`` on the flight
key (the reference relies on row adjacency; we don't need to) →
``flights`` + ``trackpoints`` DataFrames. Scales by file-split
parallelism; no consecutive-row state machine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.callsign import callsign_type, flight_number, icao_prefix

# Airport groups for tag derivation (flightpath.go:82-97 hardcodes these
# for NorCal; kept as data).
NORCAL_AIRPORTS = {"SFO", "SJC", "OAK"}
# flightpath.go:82-87 OceanicAirports — IATA codes plus the 4-letter ICAO
# forms, because FOIA data uses ICAO codes for non-US airports.
OCEANIC_KEYWORDS = {
    "LIH", "OGG", "HNL", "KOA", "NRT", "HND", "KIX", "PVG", "PEK", "CAN",
    "CTU", "WUH", "HKG", "TPE", "ICN", "MNL", "NHL", "SYD", "VRD", "AKL",
    "NZAA", "ZGGG", "ZUUU", "VHHH", "RJTT", "PHNL", "RKSI", "RJBB", "PHKO",
    "PHLI", "RPLL", "RJAA", "ZBAA", "PHOG", "ZSPD", "YSSY", "RCTP", "ZHHH",
}
# flightpath.go:89-92 SouthwestAirports
SW_AIRPORTS = {
    "PHX", "TUS", "SBP", "LAX", "LGB", "BUR", "ONT", "SNA", "DCA",
    "SBA", "PSP", "SAN",
}


def read_foia_csv(spark: SparkSession, path: str) -> DataFrame:
    """Header-driven read (newer dumps insert USER_CLASS after ACFT_TYPE,
    row.go:36-40 — header-keyed access makes that a non-event)."""
    return spark.read.option("header", True).csv(path)


def foia_trackpoints(raw: DataFrame) -> DataFrame:
    """Rows → normalized trackpoints (row.go:112-129): lat/lon doubles,
    ALTITUDEx100ft × 100, date+time → UTC timestamp, beacon → squawk."""
    ts = F.to_timestamp(
        F.concat_ws(" ", F.col("TRACK_POINT_DATE_UTC"), F.col("TRACK_POINT_TIME_UTC")),
        "yyyyMMdd HH:mm:ss",
    )
    return raw.select(
        F.concat_ws("_", F.col("AIRCRAFT_ID"), F.col("FLIGHT_INDEX")).alias("flight_id"),
        F.lit("FOIA").alias("track"),
        F.lit("RG-FOIA").alias("data_source"),
        F.lit(None).cast("string").alias("receiver"),
        ts.alias("ts"),
        F.col("LATITUDE").cast("double").alias("lat"),
        F.col("LONGITUDE").cast("double").alias("lon"),
        (F.col("ALTITUDEx100ft").cast("double") * 100).alias("alt_ft"),
        F.lit(None).cast("double").alias("groundspeed_kt"),  # derived later (track.go:208-213)
        F.lit(None).cast("double").alias("heading_deg"),
        F.lit(None).cast("double").alias("vertical_rate_fpm"),
        F.col("BEACON_CODE").cast("string").alias("squawk"),
    )


def derive_tags(callsign: F.Column, orig: F.Column, dest: F.Column) -> F.Column:
    """Tag derivation (Analyse, flight.go:216-256 + flightpath.go:63-97):
    AL/GA from callsign type; FOIA source tag; ORIG:/:DEST airport tags;
    airport-group tags. Built as array_union of conditional literal
    arrays — pure column expressions."""
    ctype = callsign_type(callsign)
    base = F.array(F.lit("FOIA"))
    al = F.when(ctype == "IcaoFlightNumber", F.array(F.lit("AL"))).otherwise(
        F.array().cast("array<string>")
    )
    ga = F.when(ctype == "Registration", F.array(F.lit("GA"))).otherwise(
        F.array().cast("array<string>")
    )
    orig_tag = F.when(orig.isNotNull() & (orig != ""), F.array(F.concat(orig, F.lit(":")))).otherwise(
        F.array().cast("array<string>")
    )
    dest_tag = F.when(dest.isNotNull() & (dest != ""), F.array(F.concat(F.lit(":"), dest))).otherwise(
        F.array().cast("array<string>")
    )
    def group(airports: set, stem: str) -> F.Column:
        # SetAirportComboTagsFor (flightpath.go:76-79): origin match sets
        # "STEM:", destination match sets ":STEM", either sets ":STEM:".
        empty = F.array().cast("array<string>")
        om = orig.isin(*airports)
        dm = dest.isin(*airports)
        return F.array_union(
            F.when(om, F.array(F.lit(f"{stem}:"))).otherwise(empty),
            F.array_union(
                F.when(dm, F.array(F.lit(f":{stem}"))).otherwise(empty),
                F.when(om | dm, F.array(F.lit(f":{stem}:"))).otherwise(empty),
            ),
        )

    return F.array_union(
        F.array_union(F.array_union(base, al), F.array_union(ga, orig_tag)),
        F.array_union(
            F.array_union(dest_tag, group(NORCAL_AIRPORTS, "NORCAL")),
            F.array_union(
                group(SW_AIRPORTS, "SW"), group(OCEANIC_KEYWORDS, "OCEANIC")
            ),
        ),
    )


def foia_flights(raw: DataFrame) -> DataFrame:
    """Rows → flight summaries: first() scalars within the flight-key
    groupBy (row.go:84-107), callsign parsing (callsign.go), tags."""
    ts = F.to_timestamp(
        F.concat_ws(" ", F.col("TRACK_POINT_DATE_UTC"), F.col("TRACK_POINT_TIME_UTC")),
        "yyyyMMdd HH:mm:ss",
    )
    grouped = (
        raw.withColumn("_ts", ts)
        .groupBy(
            F.concat_ws("_", F.col("AIRCRAFT_ID"), F.col("FLIGHT_INDEX")).alias("flight_id")
        )
        .agg(
            F.first("AIRCRAFT_ID").alias("callsign_raw"),
            F.first("DEP_APRT").alias("orig"),
            F.first("ARR_APRT").alias("dest"),
            F.first("ACFT_TYPE").alias("equip_type"),
            F.first("TRACK_INDEX").alias("faa_track_index"),
            F.min("_ts").alias("first_ts"),
            F.max("_ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )
    cs = F.col("callsign_raw")
    ctype = callsign_type(cs)
    return grouped.select(
        "flight_id",
        F.lit(None).cast("string").alias("icao_id"),  # FOIA has no Mode-S code
        cs.alias("callsign"),
        F.when(ctype == "Registration", cs).alias("registration"),
        F.col("equip_type"),
        icao_prefix(cs).alias("callsign_prefix"),
        F.lit(None).cast("string").alias("iata"),
        icao_prefix(cs).alias("icao"),
        flight_number(cs).alias("number"),
        "orig",
        "dest",
        "first_ts",
        "last_ts",
        F.to_date(F.col("first_ts")).alias("date_utc"),
        F.array(F.lit("FOIA")).alias("track_sources"),
        derive_tags(cs, F.col("orig"), F.col("dest")).alias("tags"),
        F.create_map().cast("map<string,timestamp>").alias("waypoints"),
        F.create_map(F.lit("FAA"), F.col("faa_track_index")).alias("foreign_keys"),
        "n_points",
    )


def ingest_foia(
    spark: SparkSession, path: str, out_dir: str | None = None,
    waypoints: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full FOIA ingest: CSV → (flights, trackpoints). When ``out_dir``
    is given, both are written as date-partitioned parquet (the analog of
    the Datastore sink, fgae/db.go:35-53 — idempotent because flight_id
    is deterministic, like the first-point-epoch key, db.go:171-182).
    With a ``waypoints`` dim (name, lat, lon), crossings are matched and
    folded into the flights' waypoints map (AnalyseWaypoints,
    flightpath.go:14-23)."""
    raw = read_foia_csv(spark, path)
    flights = foia_flights(raw)
    points = foia_trackpoints(raw)
    if waypoints is not None:
        from ..operators.waypoints import match_waypoints, set_waypoints

        flights = set_waypoints(flights, match_waypoints(points, waypoints))
    if out_dir:
        flights.write.mode("overwrite").partitionBy("date_utc").parquet(f"{out_dir}/flights")
        points.withColumn("date_utc", F.to_date("ts")).write.mode("overwrite").partitionBy(
            "date_utc"
        ).parquet(f"{out_dir}/trackpoints")
    return flights, points
