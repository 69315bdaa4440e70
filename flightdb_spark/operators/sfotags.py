"""SFO coarse-flightpath tags (:SFO_S, :SFO_N, :SFO_NW, SFO_S:, …).

TagCoarseFlightpathForSFO (flightpath.go:99-168): direction-of-arrival
tags from track-line × box intersections around named fixes, with two
chained rules — :SFO_NW = :SFO_N ∧ crossed BRIXX above 5000 ft, and
:SFO_NE kept only alongside :SFO_N. Matcher boxes depend on the
flight's orig/dest, so each matcher carries an applicability predicate.

Set-based: one intersect_tracks pass over ALL matcher boxes (bbox
prefilter keeps Python off non-candidates), pivot hit flags per flight,
then pure column logic for tag assembly and the chained rules.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .intersect import Restrictor, intersect_tracks

# Fix positions come from a waypoint dim (the reference's sfo.KFixes);
# callers pass {"WWAVS": (lat, lon), ...}.


@dataclass(frozen=True)
class BoxMatcher:
    tag: str
    fix: str
    side_km: float
    applies: str  # 'dest_sfo' | 'dest_sjc' | 'orig_sfo_oak'


SFO_MATCHERS = (
    BoxMatcher(":SFO_S", "WWAVS", 30.0, "dest_sfo"),
    BoxMatcher(":SFO_E", "ALWYS", 64.0, "dest_sfo"),
    BoxMatcher(":SFO_N", "LOZIT", 25.0, "dest_sfo"),
    BoxMatcher(":SFO_W", "PIRAT", 50.0, "dest_sfo"),
    BoxMatcher(":SFO_NE", "FINSH", 6.0, "dest_sfo"),
    BoxMatcher(":SJC_N", "BRIXX", 5.0, "dest_sjc"),
    BoxMatcher("SFO_S:", "PPEGS", 30.0, "orig_sfo_oak"),
)


def _applies(kind: str) -> Column:
    if kind == "dest_sfo":
        return F.col("dest") == "SFO"
    if kind == "dest_sjc":
        return F.col("dest") == "SJC"
    return F.col("orig").isin("SFO", "OAK")


def tag_coarse_flightpath(
    flights: DataFrame,
    tp: DataFrame,
    fixes: dict[str, tuple[float, float]],
    matchers: tuple[BoxMatcher, ...] = SFO_MATCHERS,
) -> DataFrame:
    """Returns flights with the coarse-flightpath tags appended to
    `tags`. BRIXX altitude for the :SFO_NW chain comes from the
    waypoints map + an as-of point lookup, like AtWaypoint
    (flightpath.go:108-123 chained rule)."""
    usable = [m for m in matchers if m.fix in fixes]
    boxes = [
        Restrictor(
            gr_type="squarebox",
            center_lat=fixes[m.fix][0],
            center_lon=fixes[m.fix][1],
            side_km=m.side_km,
        )
        for m in usable
    ]
    inters = intersect_tracks(tp, boxes)
    hits = (
        inters.filter(F.col("i_entry") >= 0)
        .groupBy("flight_id")
        .agg(F.collect_set("restrictor_idx").alias("_hit_idxs"))
    )
    out = flights.join(hits, "flight_id", "left")

    # altitude at BRIXX crossing (for :SFO_NW): as-of the waypoint time
    brixx_t = F.col("waypoints").getItem("BRIXX")
    alt_at = (
        tp.join(
            flights.select("flight_id", brixx_t.alias("_bt")).filter(F.col("_bt").isNotNull()),
            "flight_id",
        )
        .filter(F.col("ts") <= F.col("_bt"))
        .groupBy("flight_id")
        .agg(F.max_by("alt_ft", "ts").alias("_alt_at_brixx"))
    )
    out = out.join(alt_at, "flight_id", "left")

    tag_exprs = []
    for i, m in enumerate(usable):
        hit = F.array_contains(F.coalesce(F.col("_hit_idxs"), F.array()), i) & _applies(m.applies)
        tag_exprs.append(F.when(hit, F.lit(m.tag)))
    tags_arr = F.filter(F.array(*tag_exprs), lambda x: x.isNotNull())
    out = out.withColumn("_coarse", tags_arr)

    has = lambda t: F.array_contains(F.col("_coarse"), t)  # noqa: E731
    # chained: :SFO_NW = :SFO_N ∧ alt@BRIXX > 5000 (flightpath.go:152-166)
    nw = F.when(
        has(":SFO_N") & (F.coalesce(F.col("_alt_at_brixx"), F.lit(0.0)) > 5000),
        F.array(F.lit(":SFO_NW")),
    ).otherwise(F.array().cast("array<string>"))
    # chained: drop :SFO_NE unless :SFO_N also present
    cleaned = F.when(
        has(":SFO_NE") & ~has(":SFO_N"), F.array_remove(F.col("_coarse"), ":SFO_NE")
    ).otherwise(F.col("_coarse"))
    return (
        out.withColumn("tags", F.array_union(F.col("tags"), F.array_union(cleaned, nw)))
        .drop("_hit_idxs", "_alt_at_brixx", "_coarse")
    )
