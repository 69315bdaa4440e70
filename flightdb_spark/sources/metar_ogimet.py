"""Ogimet METAR text parser — raw ogimet.com responses → reports.

The reference's historical-backfill METAR path (metar/ogimet.go:20-105)
scrapes ogimet.com's `display_metars2.php?...&fmt=txt` endpoint and
parses the text response in two steps:

- OgimetPreParse (ogimet.go:20-40): drop blank lines and `#` comment
  lines, then glue continuation lines together (records wrap; a record
  is complete when the accumulated text ends with `=`), keeping the
  timestamp prefix in place.
- OgimetParse (ogimet.go:45-64): each record is
  `YYYYMMDDHHMM METAR KSFO 070156Z ... =` — a 12-digit UTC timestamp
  prefix followed by a raw METAR body, handed to the shared raw-METAR
  parser.

The reference's shared `Parse(raw, t)` body is not present in the repo
(the whole file is commented out), so the raw-METAR decode here follows
the public METAR spec the reference's Report contract needs
(metar/metar.go:16-24: station + altimeter setting in inHg): the
station is the first 4-char group after the METAR/SPECI type token, and
the altimeter is the `Annnn` group (hundredths of inHg, US practice) or
the `Qnnnn` group (whole hPa, ICAO practice) converted at the standard
atmosphere ratio 29.9213 inHg / 1013.25 hPa (the same constant the
reference pins in metar/metar.go:10). Records with no altimeter group
are dropped, mirroring parseNOAA's empty-altimeter skip
(metar/noaa.go:52-55).

Spark-first shape: identical to sources/metar_noaa.py — one scraped
document is KB-scale, so `ogimet_reports` parses on the driver into the
broadcast dim table the (station, hour) as-of join wants
(operators/metar.py); `parse_ogimet_documents` is the bulk backfill
path, the same parser inside an Arrow-batched mapInPandas with one
document per row (documents never span partitions, so the stateful
continuation-gluing scan stays correct while the fan-out distributes).
The live HTTP fetch (ogimet.go:70-99 FetchFromOgimet) stays out of
scope like every external connector: no network in this environment.
"""

from __future__ import annotations

import re
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .metar_noaa import REPORT_SCHEMA

# Standard-atmosphere conversion for ICAO Q-group altimeters:
# 1013.25 hPa == 29.9213 inHg (metar/metar.go:10).
_INHG_PER_HPA = 29.9213 / 1013.25

_PREFIX = re.compile(r"^([0-9]{12}) (.*)$")
_STATION = re.compile(r"^[A-Z][A-Z0-9]{3}$")
_A_GROUP = re.compile(r"^A([0-9]{4})$")
_Q_GROUP = re.compile(r"^Q([0-9]{4})$")


def preparse_ogimet(text: str) -> list[str]:
    """ogimet.go:20-40 OgimetPreParse, faithfully: strip whitespace,
    drop blank and `#`-comment lines, accumulate continuation lines
    (joined by one space) until the record ends with `=`. A trailing
    partial record (no `=` before EOF) is dropped, as the reference's
    scanner loop leaves it unflushed."""
    out: list[str] = []
    curr = ""
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        curr += line
        if curr.endswith("="):
            out.append(curr)
            curr = ""
        else:
            curr += " "
    return out


def parse_ogimet_line(s: str) -> dict | None:
    """One glued record → a report dict (the metars-table contract:
    station, report_time, altimeter_inhg, raw) or None when the METAR
    carries no altimeter group (the NOAA-path skip). Raises ValueError
    on a malformed timestamp prefix, as OgimetParse returns an error
    (ogimet.go:49-60)."""
    s = s.strip()
    m = _PREFIX.match(s)
    if m is None:
        raise ValueError(f"bad ogimet formatting in '{s}'")
    try:
        t = datetime.strptime(m.group(1), "%Y%m%d%H%M").replace(
            tzinfo=timezone.utc
        )
    except ValueError as e:
        raise ValueError(f"bad ogimet timestamp in '{m.group(1)}': {e}") from e

    raw = m.group(2).strip().rstrip("=").strip()
    toks = raw.split()
    if toks and toks[0] in ("METAR", "SPECI"):
        toks = toks[1:]
    if not toks or not _STATION.match(toks[0]):
        raise ValueError(f"no station in ogimet METAR '{raw}'")
    station = toks[0]

    inhg: float | None = None
    for tok in toks[1:]:
        am = _A_GROUP.match(tok)
        if am:
            inhg = int(am.group(1)) / 100.0
            break
        qm = _Q_GROUP.match(tok)
        if qm:
            inhg = round(int(qm.group(1)) * _INHG_PER_HPA, 6)
            break
    if inhg is None:
        return None
    return {
        "station": station,
        "report_time": t,
        "altimeter_inhg": inhg,
        "raw": raw,
    }


def parse_ogimet(text: str) -> list[dict]:
    """Full document → report rows: preparse + per-record parse, with
    altimeter-less records skipped."""
    out = []
    for rec in preparse_ogimet(text):
        row = parse_ogimet_line(rec)
        if row is not None:
            out.append(row)
    return out


def ogimet_reports(spark: SparkSession, text: str) -> DataFrame:
    """One scraped Ogimet document → the metars dim table (driver-side:
    the document is KB-scale and the result feeds a broadcast join).
    Same output contract as sources/metar_noaa.noaa_reports, so the
    (station, hour) as-of join consumes either source unchanged."""
    return spark.createDataFrame(parse_ogimet(text), REPORT_SCHEMA)


def parse_ogimet_documents(docs: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Bulk backfill path: a DataFrame with one raw Ogimet document per
    row → exploded report rows, parsed executor-side in Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc in pdf[doc_col]:
                if doc:
                    rows.extend(parse_ogimet(doc))
            yield pd.DataFrame(
                rows, columns=["station", "report_time", "altimeter_inhg", "raw"]
            )

    return docs.mapInPandas(run, schema=REPORT_SCHEMA)
