"""Callsign classification and normalization (callsign.go:9-109).

Pure SQL expressions (regexp case analysis) — no UDF. The reference's
types (callsign.go:32-50):

  Registration     — N-number, e.g. ``N839AL``
  IcaoFlightNumber — 3 ICAO letters + 1-4 digits + optional ATC suffix,
                     e.g. ``SWA3848``, ``AAL353X``
  BareFlightNumber — digits only, e.g. ``4517`` (carrier recovered from
                     the airframe's callsign prefix, flight.go:93-99)
  JunkCallsign     — empty / zeros / question marks (callsign.go:21-25)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference regexes verbatim (callsign.go:85, :92, :101): N-numbers
# start with a nonzero digit, exclude I/O, 1-5 chars total; bare flight
# numbers are 2-4 digits.
_RE_REGISTRATION = r"^N[1-9][0-9A-HJ-NP-Z]{0,4}$"
_RE_ICAO_FLIGHT = r"^([A-Z]{3})([0-9]{1,4})([A-Z]?)$"
_RE_BARE_NUMBER = r"^[0-9]{2,4}$"


def callsign_type(c: Column) -> Column:
    """Classify a raw callsign string into the reference's four types."""
    c = F.upper(F.trim(c))
    return (
        F.when(
            c.isNull() | (c == "") | c.rlike(r"^0+$") | c.rlike(r"^\?+$"),
            F.lit("JunkCallsign"),
        )
        .when(c.rlike(_RE_ICAO_FLIGHT), F.lit("IcaoFlightNumber"))
        .when(c.rlike(_RE_REGISTRATION), F.lit("Registration"))
        .when(c.rlike(_RE_BARE_NUMBER), F.lit("BareFlightNumber"))
        .otherwise(F.lit("JunkCallsign"))
    )


def icao_prefix(c: Column) -> Column:
    """3-letter ICAO carrier prefix of an IcaoFlightNumber (else null)."""
    c = F.upper(F.trim(c))
    out = F.regexp_extract(c, _RE_ICAO_FLIGHT, 1)
    return F.when(out == "", F.lit(None)).otherwise(out)


def flight_number(c: Column) -> Column:
    """Numeric flight number from an Icao or bare callsign (else null)."""
    c = F.upper(F.trim(c))
    icao_num = F.regexp_extract(c, _RE_ICAO_FLIGHT, 2)
    bare = F.regexp_extract(c, r"^([0-9]{2,4})$", 1)
    num = F.when(icao_num != "", icao_num).when(bare != "", bare)
    return num.cast("long")


def normalized_callsign(c: Column, airframe_prefix: Column) -> Column:
    """Normalize (callsign.go:52-66 + flight.go:93-99): strip zero padding
    from the number part; prefix a bare number with the airframe's
    carrier code (e.g. ``4517`` + ``SWA`` → ``SWA4517``)."""
    c = F.upper(F.trim(c))
    typ = callsign_type(c)
    prefix = icao_prefix(c)
    num = flight_number(c)
    return (
        F.when(typ == "IcaoFlightNumber", F.concat(prefix, num.cast("string")))
        .when(
            (typ == "BareFlightNumber") & airframe_prefix.isNotNull(),
            F.concat(airframe_prefix, num.cast("string")),
        )
        .otherwise(c)
    )


def callsigns_equal(c1: Column, c2: Column) -> Column:
    """CallsignStringsEqual (callsign.go:68-74): two raw callsigns are
    equal iff their canonical strings match — an IcaoFlightNumber
    canonicalizes to prefix+number (zero padding and ATC suffix
    stripped, callsign.go:52-58), anything else compares as its raw
    (trimmed, uppercased) form. ``SWA0123`` == ``SWA123X`` == ``SWA123``."""
    null_prefix = F.lit(None).cast("string")
    return normalized_callsign(c1, null_prefix) == normalized_callsign(
        c2, null_prefix
    )
