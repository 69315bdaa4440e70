"""External REST connectors (fr24 / FlightAware / AdsbExchange) —
normalizers are real, fetchers are stubs.

The reference polls fr24's live list (fr24/fr24.go:319-333), fetches
playback tracks (fr24.go:347-358), calls FlightAware's REST API
(fa/fa.go:117-352), and queries AdsbExchange bboxes (aex/aex.go:53-79).
Network I/O is out of scope for the analytic engine (and this
container), so each `fetch_*` raises NotImplementedError with the
endpoint contract; the payload→DataFrame normalizers — the part that
belongs to the engine — are implemented and tested against
captured-payload-shaped inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# fr24 live-list rows arrive as positional JSON arrays keyed by fr24 id
# (parser fr24/fr24.go:207-247); captured shape:
#   [icao24, lat, lon, heading, alt, speed, squawk, radar, equip,
#    registration, epoch, orig, dest, flightnumber, _, vert_speed, callsign, _]
FR24_COLS = [
    ("icao_id", "string", 0),
    ("lat", "double", 1),
    ("lon", "double", 2),
    ("heading_deg", "double", 3),
    ("alt_ft", "double", 4),
    ("groundspeed_kt", "double", 5),
    ("squawk", "string", 6),
    ("receiver", "string", 7),
    ("equip_type", "string", 8),
    ("registration", "string", 9),
    ("epoch", "long", 10),
    ("orig", "string", 11),
    ("dest", "string", 12),
    ("number", "string", 13),
    ("vertical_rate_fpm", "double", 15),
    ("callsign", "string", 16),
]


def normalize_fr24_list(raw: DataFrame) -> DataFrame:
    """(fr24_id string, fields array<string>) → snapshot rows
    (fr24/fr24.go:207-247)."""
    cols = [F.col("fr24_id")]
    for name, typ, idx in FR24_COLS:
        c = F.col("fields").getItem(idx)
        if name == "epoch":
            cols.append(F.timestamp_seconds(c.cast("long")).alias("ts"))
        else:
            cols.append(c.cast(typ).alias(name))
    return raw.select(*cols).withColumn("data_source", F.lit("fr24"))


def normalize_fa_track(raw: DataFrame) -> DataFrame:
    """FlightAware GetHistoricalTrack rows (fa/fa.go:117-178):
    (timestamp epoch, latitude, longitude, altitude×100ft,
    groundspeed, altitudeStatus, updateType) → trackpoints."""
    return raw.select(
        F.timestamp_seconds(F.col("timestamp").cast("long")).alias("ts"),
        F.col("latitude").cast("double").alias("lat"),
        F.col("longitude").cast("double").alias("lon"),
        (F.col("altitude").cast("double") * 100).alias("alt_ft"),
        F.col("groundspeed").cast("double").alias("groundspeed_kt"),
        F.when(F.col("updateType") == "TZ", F.lit("FA:TZ"))
        .otherwise(F.lit("FA:TA"))
        .alias("track"),
        F.lit("FA").alias("data_source"),
    )


def normalize_aex_list(raw: DataFrame) -> DataFrame:
    """AdsbExchange aircraft-list JSON (aex/aex.go:89-148): field names
    Icao/Lat/Long/GAlt/Spd/Trak/PosTime(ms)/Reg/Call/Sqk."""
    return raw.select(
        F.col("Icao").alias("icao_id"),
        F.col("Call").alias("callsign"),
        F.col("Reg").alias("registration"),
        F.timestamp_millis(F.col("PosTime").cast("long")).alias("ts"),
        F.col("Lat").cast("double").alias("lat"),
        F.col("Long").cast("double").alias("lon"),
        F.col("GAlt").cast("double").alias("alt_ft"),
        F.col("Spd").cast("double").alias("groundspeed_kt"),
        F.col("Trak").cast("double").alias("heading_deg"),
        F.col("Sqk").alias("squawk"),
        F.lit("AdsbExchange").alias("data_source"),
    )


def _stub(what: str, ref: str):
    raise NotImplementedError(
        f"{what} requires network access (reference: {ref}); "
        "feed captured payloads to the normalize_* functions instead"
    )


def fetch_fr24_list(spark: SparkSession, bbox: tuple[float, float, float, float]) -> DataFrame:
    _stub("fr24 live-list poll", "fr24/fr24.go:319-333")


def fetch_fr24_track(spark: SparkSession, fr24_id: str) -> DataFrame:
    _stub("fr24 playback-track fetch", "fr24/fr24.go:347-358")


def fetch_fa_track(spark: SparkSession, ident: str) -> DataFrame:
    _stub("FlightAware GetHistoricalTrack", "fa/fa.go:117-178")


def fetch_aex_list(spark: SparkSession, bbox: tuple[float, float, float, float]) -> DataFrame:
    _stub("AdsbExchange bbox query", "aex/aex.go:53-79")


def normalize_fr24_track(raw: DataFrame) -> DataFrame:
    """fr24 playback-track payload (fr24/fr24.go:274-316): one row per
    point as (fr24_id, ts epoch, lat, lon, alt_ft, groundspeed_kt,
    heading_deg) → trackpoints with the 'fr24' track key."""
    return raw.select(
        F.col("fr24_id"),
        F.lit("fr24").alias("track"),
        F.lit("fr24").alias("data_source"),
        F.timestamp_seconds(F.col("ts").cast("long")).alias("ts"),
        F.col("lat").cast("double").alias("lat"),
        F.col("lon").cast("double").alias("lon"),
        F.col("alt").cast("double").alias("alt_ft"),
        F.col("speed").cast("double").alias("groundspeed_kt"),
        F.col("heading").cast("double").alias("heading_deg"),
    )


def resolve_fr24_ids(
    flights: DataFrame,
    live: DataFrame,
    history: DataFrame,
    *,
    airframe_prefix_col: str | None = None,
) -> DataFrame:
    """GetFr24Id resolution (fr24/fr24.go:425-467), the decision logic
    minus the two REST fetches: given candidate id records — ``live``
    (the LookupQuery snapshot) and ``history`` (the LookupHistory list,
    ordered by a ``rank`` column, 0 = most recent) — attach each
    flight's fr24 id.

    Reference semantics, set-based:
    - a flight with a blank/null registration resolves to NULL with
      reason ``no_registration`` (fr24.go:429-431);
    - approach 1: the live record for the registration wins iff its
      callsign canonically equals the flight's normalized callsign
      (CallsignStringsEqual, callsign.go:68-74) → reason ``query``;
    - approach 2: else the first history record (lowest rank) with an
      equal callsign → reason ``history``;
    - else NULL with reason ``not_found``.

    Candidate lists are poll snapshots (thousands of rows at most), so
    both join sides broadcast and the flights side never shuffles.
    Inputs: ``flights(registration, callsign, ...)``,
    ``live(registration, callsign, fr24_id)``,
    ``history(registration, callsign, fr24_id, rank)``."""
    from pyspark.sql import Window as W

    from ..functions.callsign import callsigns_equal, normalized_callsign

    # The ADS-B-observed callsign can be a poor match for fr24's
    # post-processed one, so normalize first (fr24.go:435-437) — with
    # the airframe's carrier prefix when available, exactly
    # NormalizedCallsignString().
    prefix = (
        F.col(airframe_prefix_col)
        if airframe_prefix_col
        else F.lit(None).cast("string")
    )
    fl = flights.withColumn(
        "_fcs", normalized_callsign(F.col("callsign"), prefix)
    )
    lv = live.select(
        F.col("registration").alias("_lreg"),
        F.col("callsign").alias("_lcs"),
        F.col("fr24_id").alias("_lid"),
    )
    hist_matched = (
        fl.select("registration", "_fcs")
        .distinct()
        .join(
            F.broadcast(
                history.select(
                    F.col("registration"),
                    F.col("callsign").alias("_hcs"),
                    F.col("fr24_id").alias("_hid"),
                    F.col("rank").alias("_hrank"),
                )
            ),
            "registration",
        )
        .filter(callsigns_equal(F.col("_fcs"), F.col("_hcs")))
        .withColumn(
            "_rn",
            F.row_number().over(
                W.partitionBy("registration", "_fcs").orderBy("_hrank", "_hid")
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("registration", "_fcs", "_hid")
    )
    out = (
        fl.join(
            F.broadcast(lv), F.col("registration") == F.col("_lreg"), "left"
        )
        .withColumn(
            "_live_ok",
            F.col("_lid").isNotNull()
            & callsigns_equal(F.col("_fcs"), F.col("_lcs")),
        )
        .join(F.broadcast(hist_matched), ["registration", "_fcs"], "left")
    )
    no_reg = F.col("registration").isNull() | (F.trim(F.col("registration")) == "")
    fr24_id = (
        F.when(no_reg, F.lit(None).cast("string"))
        .when(F.col("_live_ok"), F.col("_lid"))
        .otherwise(F.col("_hid"))
    )
    reason = (
        F.when(no_reg, F.lit("no_registration"))
        .when(F.col("_live_ok"), F.lit("query"))
        .when(F.col("_hid").isNotNull(), F.lit("history"))
        .otherwise(F.lit("not_found"))
    )
    drop = ["_fcs", "_lreg", "_lcs", "_lid", "_live_ok", "_hid"]
    return out.withColumn("fr24_id", fr24_id).withColumn("fr24_reason", reason).drop(
        *drop
    )


def normalize_fr24_details(raw: DataFrame) -> DataFrame:
    """fr24 live-details payload (ParseCurrentDetails, fr24/fr24.go:
    249-265): flight/status plus unix-epoch schedule fields → one
    schedule row per flight, the input shape of
    operators/enrich.enrich_schedule. Epochs become UTC timestamps
    exactly as the reference's time.Unix(...).UTC()."""
    return raw.select(
        F.col("flight").alias("flight_number"),
        F.col("status").alias("status"),
        F.timestamp_seconds(F.col("dep_schd").cast("long")).alias("scheduled_departure_utc"),
        F.timestamp_seconds(F.col("arr_schd").cast("long")).alias("scheduled_arrival_utc"),
        F.timestamp_seconds(F.col("eta").cast("long")).alias("eta_utc"),
        F.col("from_tz_offset").alias("origin_tz_offset"),
        F.col("to_tz_offset").alias("destination_tz_offset"),
        F.col("from_iata").alias("orig"),
        F.col("to_iata").alias("dest"),
        F.lit("fr24").alias("data_source"),
    )
