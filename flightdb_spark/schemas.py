"""Canonical schemas for the flight-track data model (SURVEY.md §1).

The reference stores one gzip(gob(Flight)) blob per flight
(blob.go:24-36) with a handful of indexed properties. Our layout is the
denormalized analytic shape the reference itself exports to BigQuery
(bigquery.go:14-35, bigquery/flight-schema.json): a ``flights`` summary
table plus a long-format ``trackpoints`` table, both partitioned by
``date_utc`` for pruning (replacing the 30-min timeslot index,
flightdb.go:6-11 — see SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# One position report (trackpoint.go:12-28, persisted fields only; the
# datastore:"-" derived fields are computed columns — operators/derived.py).
TRACKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("flight_id", T.StringType(), False),
        T.StructField("track", T.StringType(), False),  # ADSB/MLAT/FOIA/fr24/FA:TA/FA:TZ
        T.StructField("data_source", T.StringType(), True),
        T.StructField("receiver", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),  # always UTC (trackpoint.go:20)
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("alt_ft", T.DoubleType(), True),  # pressure altitude
        T.StructField("groundspeed_kt", T.DoubleType(), True),  # absent in FOIA
        T.StructField("heading_deg", T.DoubleType(), True),
        T.StructField("vertical_rate_fpm", T.DoubleType(), True),
        T.StructField("squawk", T.StringType(), True),
    ]
)

# Assembled flight summary (flight.go:12-23 + identity.go:11-47 +
# airframe.go:9-14, denormalized like bigquery/flight-schema.json).
FLIGHT_SCHEMA = T.StructType(
    [
        T.StructField("flight_id", T.StringType(), False),
        T.StructField("icao_id", T.StringType(), True),
        T.StructField("callsign", T.StringType(), True),
        T.StructField("registration", T.StringType(), True),
        T.StructField("equip_type", T.StringType(), True),
        T.StructField("callsign_prefix", T.StringType(), True),
        T.StructField("iata", T.StringType(), True),
        T.StructField("icao", T.StringType(), True),
        T.StructField("number", T.LongType(), True),
        T.StructField("orig", T.StringType(), True),
        T.StructField("dest", T.StringType(), True),
        T.StructField("first_ts", T.TimestampType(), True),
        T.StructField("last_ts", T.TimestampType(), True),
        T.StructField("date_utc", T.DateType(), True),  # partition column
        T.StructField("track_sources", T.ArrayType(T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
        T.StructField("waypoints", T.MapType(T.StringType(), T.TimestampType()), True),
        T.StructField("foreign_keys", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("n_points", T.LongType(), True),
    ]
)

# Streaming ingest unit (trackfragment.go:14-19).
FRAGMENT_POINT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
        T.StructField("alt_ft", T.DoubleType(), True),
        T.StructField("groundspeed_kt", T.DoubleType(), True),
        T.StructField("heading_deg", T.DoubleType(), True),
        T.StructField("vertical_rate_fpm", T.DoubleType(), True),
        T.StructField("squawk", T.StringType(), True),
    ]
)

FRAGMENT_SCHEMA = T.StructType(
    [
        T.StructField("icao_id", T.StringType(), False),
        T.StructField("callsign", T.StringType(), True),
        T.StructField("data_system", T.StringType(), False),  # 'A' (ADSB) | 'M' (MLAT)
        T.StructField("receiver", T.StringType(), True),
        T.StructField("frag_ts", T.TimestampType(), False),  # arrival time
        T.StructField("points", T.ArrayType(FRAGMENT_POINT_SCHEMA), False),
    ]
)

# Hourly weather reference (metar/metar.go:16-27, dayreport.go:35-39).
METAR_SCHEMA = T.StructType(
    [
        T.StructField("station", T.StringType(), False),
        # report time (~:56 past the hour); the as-of join truncates to
        # the hour itself (operators/metar.py) — this name must match
        # asof_join_metar's expected column
        T.StructField("report_time", T.TimestampType(), False),
        T.StructField("altimeter_inhg", T.DoubleType(), True),
        T.StructField("raw", T.StringType(), True),
    ]
)

# Named fixes dim (geo/sfo.KFixes equivalent; FIXTURES.md §6).
WAYPOINT_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("lat", T.DoubleType(), False),
        T.StructField("lon", T.DoubleType(), False),
    ]
)

# Geo restrictor configs (georestrictorset.go:117-161; FIXTURES.md §7).
RESTRICTOR_SCHEMA = T.StructType(
    [
        T.StructField("set_name", T.StringType(), False),
        T.StructField("user", T.StringType(), True),
        T.StructField("logic", T.StringType(), True),  # 'all' | 'any'
        T.StructField("gr_type", T.StringType(), False),  # squarebox|verticalplane|polygon
        T.StructField("center_lat", T.DoubleType(), True),
        T.StructField("center_lon", T.DoubleType(), True),
        T.StructField("side_km", T.DoubleType(), True),
        T.StructField("start_lat", T.DoubleType(), True),
        T.StructField("start_lon", T.DoubleType(), True),
        T.StructField("end_lat", T.DoubleType(), True),
        T.StructField("end_lon", T.DoubleType(), True),
        T.StructField(
            "poly",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("lat", T.DoubleType(), False),
                        T.StructField("lon", T.DoubleType(), False),
                    ]
                )
            ),
            True,
        ),
        T.StructField("alt_min", T.LongType(), True),  # 0 = unbounded
        T.StructField("alt_max", T.LongType(), True),
        T.StructField("is_excluding", T.BooleanType(), True),
    ]
)

# Multimodal: opaque binary payload + typed metadata (LLM-pipeline surface).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)
