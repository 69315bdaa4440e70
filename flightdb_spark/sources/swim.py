"""FAA SWIM (NAS) JSON source — parse NAS 5 flight messages to
pseudo-ADS-B trackpoints.

The reference unmarshals single- and multi-message collections
(swim/swim.go:20-43 Json2Flights; types swim/swim-types.go) and converts
each flight to a composite ADS-B message (swim/swim.go:46-92 AsAdsb):
icao = "SWM"+computerId, position from the space-separated "lat lon"
string, heading from atan2 of the track-velocity vector rotated from
math convention (0°=+x, CCW) to compass (0°=north, CW).

Spark shape: `from_json` with an explicit schema subset → one
normalization select, all JVM-side. Works identically on a batch read
or a readStream of the SWIM feed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Subset of the NAS message schema the reference actually reads
# (swim/swim-types.go; field names are the NAS JSON spellings).
_POSITION = T.StructType(
    [
        T.StructField(
            "position",
            T.StructType(
                [
                    T.StructField(
                        "location",
                        T.StructType([T.StructField("pos", T.StringType())]),
                    )
                ]
            ),
        ),
        T.StructField("altitude", T.StructType([T.StructField("content", T.DoubleType())])),
        T.StructField(
            "actualSpeed",
            T.StructType(
                [T.StructField("surveillance", T.StructType([T.StructField("content", T.DoubleType())]))]
            ),
        ),
        T.StructField(
            "trackVelocity",
            T.StructType(
                [
                    T.StructField("x", T.StructType([T.StructField("content", T.DoubleType())])),
                    T.StructField("y", T.StructType([T.StructField("content", T.DoubleType())])),
                ]
            ),
        ),
    ]
)

FLIGHT_SCHEMA = T.StructType(
    [
        T.StructField("timestamp", T.StringType()),
        T.StructField(
            "flightIdentification",
            T.StructType(
                [
                    T.StructField("aircraftIdentification", T.StringType()),
                    T.StructField("computerId", T.DoubleType()),
                ]
            ),
        ),
        T.StructField("enRoute", T.StructType([T.StructField("position", _POSITION)])),
    ]
)

# single- and multi-message envelopes (swim.go:24-37: "try both")
MESSAGE_SCHEMA = T.StructType(
    [
        T.StructField(
            "ns5:MessageCollection",
            T.StructType(
                [
                    T.StructField("message", T.ArrayType(T.StructType([T.StructField("flight", FLIGHT_SCHEMA)]))),
                ]
            ),
        )
    ]
)
MESSAGE_SCHEMA_SINGLE = T.StructType(
    [
        T.StructField(
            "ns5:MessageCollection",
            T.StructType(
                [T.StructField("message", T.StructType([T.StructField("flight", FLIGHT_SCHEMA)]))]
            ),
        )
    ]
)


def parse_swim_json(raw: DataFrame, json_col: str = "value") -> DataFrame:
    """raw JSON strings → normalized pseudo-ADS-B trackpoint rows.

    Tries the multi-message envelope first, falling back to single
    (the reference's dual-unmarshal, swim.go:24-37), via coalesce over
    two from_json parses — malformed branches come back null."""
    multi = F.from_json(F.col(json_col), MESSAGE_SCHEMA).getField("ns5:MessageCollection")
    single = F.from_json(F.col(json_col), MESSAGE_SCHEMA_SINGLE).getField(
        "ns5:MessageCollection"
    )
    flights = F.coalesce(
        multi.getField("message").getField("flight"),
        F.when(
            single.getField("message").getField("flight").isNotNull(),
            F.array(single.getField("message").getField("flight")),
        ),
    )
    fl = raw.select(F.explode(flights).alias("f"))
    pos = F.split(F.col("f.enRoute.position.position.location.pos"), " ")
    vx = F.col("f.enRoute.position.trackVelocity.x.content")
    vy = F.col("f.enRoute.position.trackVelocity.y.content")
    # math-convention angle → compass heading (swim.go:72-75)
    heading = F.pmod(F.lit(90.0) - F.degrees(F.atan2(vy, vx)), F.lit(360.0))
    return fl.select(
        F.concat(
            F.lit("SWM"), F.format_string("%.0f", F.col("f.flightIdentification.computerId"))
        ).alias("icao_id"),
        F.col("f.flightIdentification.aircraftIdentification").alias("callsign"),
        F.lit("SWIM").alias("track"),
        F.lit("SWIM").alias("data_source"),
        F.to_timestamp(F.col("f.timestamp")).alias("ts"),
        pos.getItem(0).cast("double").alias("lat"),
        pos.getItem(1).cast("double").alias("lon"),
        F.col("f.enRoute.position.altitude.content").alias("alt_ft"),
        F.col("f.enRoute.position.actualSpeed.surveillance.content").alias("groundspeed_kt"),
        heading.alias("heading_deg"),
    ).filter(F.col("lat").isNotNull())
