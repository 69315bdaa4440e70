"""Procedure detection — did the flight fly a published arrival?

FlewProcedure (flightpath.go:176-191): walk the procedure's waypoint
sequence; a missing *required* waypoint fails the match; the first
missing optional waypoint marks where the flight was vectored
off-procedure (vectored-after = the previous waypoint). The NorCal
procedures table (BIGSUR2 / SERFR2 / WWAVS1, flightpath.go:193-211) is
shipped as data.

Set-based: each procedure compiles to one case-expression over the
flight's waypoint map — no joins, no UDFs; N procedures → N struct
columns folded into one array.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Procedure:
    name: str
    waypoints: tuple[str, ...]  # full sequence
    required: frozenset[str]  # can't be omitted


NORCAL_PROCEDURES = (
    Procedure("BIGSUR2", ("ANJEE", "SKUNK", "BOLDR", "MENLO"), frozenset({"ANJEE", "SKUNK"})),
    Procedure("SERFR2", ("WWAVS", "EPICK", "EDDYY", "SWELS", "MENLO"), frozenset({"WWAVS", "EPICK"})),
    Procedure("WWAVS1", ("WWAVS", "WPOUT", "THEEZ", "WESLA", "MVRKK"), frozenset({"WWAVS", "WPOUT"})),
)


def _has(wp: str) -> Column:
    return F.array_contains(F.map_keys(F.col("waypoints")), wp)


def flew_procedure(p: Procedure) -> tuple[Column, Column]:
    """(flew boolean, vectored_after string) for one procedure
    (flightpath.go:179-191): required-waypoint misses fail; the first
    optional miss vectors after its predecessor; wp[0] missing fails
    even when optional."""
    flew = _has(p.waypoints[0])
    for wp in p.waypoints:
        if wp in p.required:
            flew = flew & _has(wp)
    vec = F.lit("")
    chain = None
    for i, wp in enumerate(p.waypoints):
        if i == 0:
            continue
        cond = ~_has(wp)
        branch = F.lit(p.waypoints[i - 1])
        chain = F.when(cond, branch) if chain is None else chain.when(cond, branch)
    vec = chain.otherwise(F.lit("")) if chain is not None else vec
    return flew, vec


def with_flown_procedures(
    flights: DataFrame, procedures: tuple[Procedure, ...] = NORCAL_PROCEDURES
) -> DataFrame:
    """Add `flown_procedures array<struct<name,vectored_after>>`
    (DetermineFlownProcedures, flightpath.go:225-233) — the
    record-repeated Procedure field of the BigQuery export schema
    (bigquery/flight-schema.json)."""
    entries = []
    for p in procedures:
        flew, vec = flew_procedure(p)
        entries.append(
            F.when(flew, F.struct(F.lit(p.name).alias("name"), vec.alias("vectored_after")))
        )
    arr = F.filter(F.array(*entries), lambda x: x.isNotNull())
    return flights.withColumn("flown_procedures", arr)
