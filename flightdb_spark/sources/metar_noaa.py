"""NOAA METAR CSV parser — raw aviationweather.gov responses → reports.

The reference scrapes NOAA's dataserver CSV endpoint and parses the
response with parseNOAA (metar/noaa.go:18-90): skip a preamble that ends
with an "N results" line, read a header row, then keep one report per
data row — (raw_text, station_id, observation_time, altim_in_hg) — and
drop rows with an empty altimeter value.

Spark-first shape: one NOAA document is a few KB (24 reports/station/
day), so `noaa_reports` parses on the driver and yields the broadcast
dim table the as-of join wants. For bulk historical backfill over many
scraped documents, `parse_noaa_documents` runs the same parser inside
an Arrow-batched mapInPandas over a (doc string) column, one document
per row — documents never span partitions, so the stateful
preamble/header scan stays correct while the fan-out is distributed.
"""

from __future__ import annotations

import csv
import io
import re
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_LAST_PREAMBLE = re.compile(r"^[0-9]+ results$")
_TIME_FMT = "%Y-%m-%dT%H:%M:%SZ"
_NEEDED = {"altim_in_hg", "observation_time", "station_id", "raw_text"}

# The metars-table contract (operators/metar.py): station, report_time,
# altimeter_inhg, raw.
REPORT_SCHEMA = (
    "station string, report_time timestamp, altimeter_inhg double, raw string"
)


def parse_noaa(text: str) -> list[dict]:
    """metar/noaa.go:18-90, faithfully: preamble ends at the "N results"
    line; the first CSV line after it is the header (column order is
    header-keyed, not positional); rows with an empty altim_in_hg are
    skipped. Raises ValueError on malformed floats/timestamps, missing
    header columns, or short data rows, as the reference returns an
    error. Observation times come back UTC-aware (the trailing Z), so
    they load correctly under ANY session timezone."""
    out: list[dict] = []
    headers: dict[str, int] = {}
    preambling = True
    for line in text.splitlines():
        line = line.strip()
        if preambling:
            if _LAST_PREAMBLE.match(line):
                preambling = False
            continue
        if not line:
            continue
        vals = next(csv.reader(io.StringIO(line)))
        if not headers:
            headers = {k: i for i, k in enumerate(vals)}
            missing = _NEEDED - set(headers)
            if missing:
                raise ValueError(
                    f"NOAA header missing column(s) {sorted(missing)}: {vals!r}"
                )
            continue
        if len(vals) <= max(headers[k] for k in _NEEDED):
            raise ValueError(f"short NOAA data row ({len(vals)} fields): {vals!r}")
        if vals[headers["altim_in_hg"]] == "":
            continue
        try:
            inhg = float(vals[headers["altim_in_hg"]])
        except ValueError as e:
            raise ValueError(f"parse error {e!r}: {vals!r}") from e
        # aware UTC: the Z suffix means UTC regardless of the session
        # timezone a naive datetime would otherwise be interpreted in
        t_obs = datetime.strptime(
            vals[headers["observation_time"]], _TIME_FMT
        ).replace(tzinfo=timezone.utc)
        out.append(
            {
                "station": vals[headers["station_id"]],
                "report_time": t_obs,
                "altimeter_inhg": inhg,
                "raw": vals[headers["raw_text"]],
            }
        )
    return out


def noaa_reports(spark: SparkSession, text: str) -> DataFrame:
    """One scraped NOAA document → the metars dim table (driver-side:
    the document is KB-scale and the result is broadcast anyway)."""
    return spark.createDataFrame(parse_noaa(text), REPORT_SCHEMA)


def parse_noaa_documents(docs: DataFrame, doc_col: str = "doc") -> DataFrame:
    """Bulk path: a DataFrame with one raw NOAA document per row →
    exploded report rows, parsed executor-side in Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict] = []
            for doc in pdf[doc_col]:
                if doc:
                    rows.extend(parse_noaa(doc))
            yield pd.DataFrame(
                rows, columns=["station", "report_time", "altimeter_inhg", "raw"]
            )

    return docs.mapInPandas(run, schema=REPORT_SCHEMA)
