"""Report framework — the reference's main analytic path, set-based.

The reference registers report functions in a name→func registry
(report/registry.go:19-37) and drives them one flight at a time through
PreProcess (not-tags → not-waypoints → geo-restrictor → time-of-day;
report/report.go:97-202), accumulating funnel counters `r.I[label]`,
a scalar histogram `r.H`, and output rows.

Spark re-expression (SURVEY.md §3.1): a report is a *set-based
transform* `(spark, flights, trackpoints, options) -> per-flight
DataFrame` carrying an `outcome` label column. The framework derives:

  - funnel   = groupBy(outcome).count()  — the reference's counters,
  - rows     = the accepted subset        — the reference's AddRow rows,
  - histogram stats (n/mean/stddev/p50/p90 — report/report.go:224-230)
    from a report-designated value column.

Per-flight loops become joins + windows; the geo-restrictor pre-filter
is the vectorized intersect_tracks operator (operators/intersect.py).
At scale every stage is a narrow transform over the (flight_id-keyed)
tables except the intersections shuffle, which is bounded by the bbox
prefilter.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import Window as W

from ..operators.intersect import Restrictor, intersect_tracks, satisfies_set

# Funnel outcome labels follow the reference's bracket convention
# ("[A] PreProcessed", "[B] Eliminated: ...", report/report.go:97-199) so
# funnels render in stage order.
LABEL_PREPROCESSED = "[A] PreProcessed"
LABEL_TOD_FAILED = "[Bb] Failed TimeOfDay restrictions"


def select_preferred_track(tp: DataFrame, spec: tuple[str, ...]) -> DataFrame:
    """Keep each flight's most-preferred available track
    (PreferredTrack, flight.go:173-178): rank sources by the spec,
    keep rows of the per-flight minimum rank. One window shuffle on
    (flight_id), which matches the table's natural clustering."""
    rank = F.lit(None).cast("int")
    for i, s in reversed(list(enumerate(spec))):
        rank = F.when(F.col("track") == s, F.lit(i)).otherwise(rank)
    ranked = tp.withColumn("_rank", rank).filter(F.col("_rank").isNotNull())
    best = F.min("_rank").over(W.partitionBy("flight_id"))
    return ranked.withColumn("_best", best).filter(F.col("_rank") == F.col("_best")).drop(
        "_rank", "_best"
    )


@dataclass
class Options:
    """Report options (report/options.go:39-57, parsed :58-132)."""

    start: datetime | None = None
    end: datetime | None = None
    tags: tuple[str, ...] = ()
    not_tags: tuple[str, ...] = ()
    waypoints: tuple[str, ...] = ()
    not_waypoints: tuple[str, ...] = ()
    # local-time-of-day window, hours in America/Los_Angeles
    # (report/report.go:153-195)
    tod_start_hour: int | None = None
    tod_end_hour: int | None = None
    # FOIA ACL: data sources this user may NOT see (report/report.go:114-125,
    # ACL table report/context.go:21-44) — row-level filter on track_sources
    blocked_sources: tuple[str, ...] = ()
    restrictors: tuple[Restrictor, ...] = ()
    logic: str = "all"  # GRS ALL/ANY (georestrictorset.go:17-27)
    track_spec: tuple[str, ...] = ("FOIA", "ADSB", "MLAT", "fr24")
    altitude_tolerance: float = 0.0  # degrees for levelflight, ft for classb
    # altitude band for closest-approach (ClosestTo, track.go:849-863);
    # alt_max = 0 disables the check, as in the reference
    alt_min: float = 0.0
    alt_max: float = 0.0
    ref_distance_km: float = 0.0
    refpoint: tuple[str, float, float] | None = None  # (name, lat, lon)
    refpoint2: tuple[str, float, float] | None = None
    extra: dict = field(default_factory=dict)


@dataclass
class ReportResult:
    rows: DataFrame  # accepted flights with report columns
    funnel: DataFrame  # (outcome string, n long) — the reference's r.I
    histogram: DataFrame | None = None  # 1 row: n, mean, stddev, p50, p90


ReportFn = Callable[[SparkSession, DataFrame, DataFrame, Options], DataFrame]

REGISTRY: dict[str, tuple[ReportFn, str]] = {}


def handle_report(name: str, description: str) -> Callable[[ReportFn], ReportFn]:
    """Registry decorator (HandleReport, report/registry.go:19-27)."""

    def deco(fn: ReportFn) -> ReportFn:
        REGISTRY[name] = (fn, description)
        return fn

    return deco


def registered_reports() -> dict[str, str]:
    from . import canned  # noqa: F401 — side-effect registration

    return {k: v[1] for k, v in REGISTRY.items()}


# ---------------------------------------------------------------------------
# PreProcess — the shared filter funnel (report/report.go:97-202)
# ---------------------------------------------------------------------------


def preprocess(
    flights: DataFrame, tp: DataFrame, opt: Options
) -> tuple[DataFrame, DataFrame | None]:
    """Apply not-tags / not-waypoints / geo-restrictor / time-of-day and
    label each flight with its elimination stage. Returns (flights +
    `outcome` column, intersections-or-None). Flights surviving all
    stages have outcome = LABEL_PREPROCESSED; the report fn then refines.

    The reference calls these "not efficient" post-scan blacklists
    (report/options.go:30-31); here every predicate is a pushed-down
    column filter.
    """
    # Positive tag / waypoint selection happens in the *query* in the
    # reference (fquery.go ByTags/ByWaypoints), so flights lacking them
    # never enter the funnel — a plain pushed-down filter, not an
    # outcome label.
    if opt.tags:
        for t in opt.tags:
            flights = flights.filter(F.array_contains(F.col("tags"), t))
    if opt.waypoints:
        # AND of memberships, matching fquery.go:63-68 / api.by_waypoints
        for w in opt.waypoints:
            flights = flights.filter(
                F.array_contains(F.map_keys(F.col("waypoints")), w)
            )

    out = F.lit(LABEL_PREPROCESSED)
    for t in reversed(opt.not_tags):
        out = F.when(
            F.array_contains(F.col("tags"), t),
            F.lit(f"[B] Eliminated: had not-tag '{t}'"),
        ).otherwise(out)
    for w in reversed(opt.not_waypoints):
        out = F.when(
            F.array_contains(F.map_keys(F.col("waypoints")), w),
            F.lit(f"[B] Eliminated: had not-waypoint '{w}'"),
        ).otherwise(out)
    if opt.blocked_sources and "track_sources" in flights.columns:
        blocked = F.array(*[F.lit(s) for s in opt.blocked_sources])
        out = F.when(
            F.arrays_overlap(F.col("track_sources"), blocked),
            F.lit("[B] Eliminated: FOIA ACL blocked data source"),
        ).otherwise(out)
    flights = flights.withColumn("outcome", out)

    inters = None
    if opt.restrictors:
        surviving = flights.filter(F.col("outcome") == LABEL_PREPROCESSED)
        # Intersect only the flight's preferred track, not the union of
        # all sources (GetIntersectableTrack -> PreferredTrack,
        # intersectabletrack.go:91-103): time-sorting mixed ADSB+MLAT
        # points would zigzag across a gate and fabricate crossings.
        tp_pref = (
            select_preferred_track(tp, opt.track_spec)
            if opt.track_spec and "track" in tp.columns
            else tp
        )
        keyed = tp_pref.join(
            F.broadcast(surviving.select("flight_id")), "flight_id", "semi"
        )
        inters = intersect_tracks(keyed, list(opt.restrictors))
        verdict = satisfies_set(inters, opt.logic).select(
            "flight_id", "satisfies_set", "blame_idx"
        )
        # A flight the bbox prefilter pruned entirely has NO verdict row
        # — its true outcome is "hit nothing": each restrictor is
        # satisfied iff it is an excluder. Coalesce the left-join nulls
        # with that default instead of silently passing the flight.
        hits = [r.is_excluding for r in opt.restrictors]
        default_ok = all(hits) if opt.logic == "all" else any(hits)
        default_blame = next((i for i, ex in enumerate(hits) if not ex), None)
        flights = flights.join(F.broadcast(verdict), "flight_id", "left").withColumn(
            "satisfies_set", F.coalesce(F.col("satisfies_set"), F.lit(default_ok))
        ).withColumn(
            "blame_idx",
            F.coalesce(
                F.col("blame_idx"),
                F.lit(None if default_ok else default_blame).cast("int"),
            ),
        ).withColumn(
            "outcome",
            F.when(
                (F.col("outcome") == LABEL_PREPROCESSED)
                & (F.col("satisfies_set") == False),  # noqa: E712
                F.concat(
                    F.lit("[B] Eliminated: did not satisfy restrictor "),
                    F.col("blame_idx").cast("string"),
                ),
            ).otherwise(F.col("outcome")),
        ).drop("satisfies_set", "blame_idx")

    if opt.tod_start_hour is not None and opt.tod_end_hour is not None:
        # Time-of-day anchors on the *interesting* timestamps, not the
        # flight's start (report/report.go:153-195): with restrictors,
        # the intersection entry/exit times; else with requested
        # waypoints, their crossing times; else (an extension — the
        # reference would find no anchor) the flight's first_ts. ANY
        # anchor inside the PDT window accepts.
        def in_window(ts_col):
            h = F.hour(F.from_utc_timestamp(ts_col, "America/Los_Angeles"))
            if opt.tod_start_hour <= opt.tod_end_hour:
                return (h >= opt.tod_start_hour) & (h <= opt.tod_end_hour)
            # window wraps midnight, e.g. 22 -> 5 (the night-noise query)
            return (h >= opt.tod_start_hour) | (h <= opt.tod_end_hour)

        if inters is not None:
            # report.go:155-165: every intersection start, plus end for
            # non-point intersections, for restrictors that actually hit.
            hit = inters.filter(F.col("i_entry") >= 0)
            meets = (
                hit.withColumn(
                    "_in",
                    (
                        in_window(F.col("entry_ts"))
                        | (
                            (F.col("i_exit") != F.col("i_entry"))
                            & in_window(F.col("exit_ts"))
                        )
                    ).cast("int"),
                )
                .groupBy("flight_id")
                .agg(F.max("_in").alias("_meets_tod"))
            )
            flights = flights.join(F.broadcast(meets), "flight_id", "left")
            tod_ok = F.col("_meets_tod") == 1  # no hit rows -> null -> fails
        elif opt.waypoints:
            # report.go:166-173: the requested waypoints' crossing times
            tod_ok = F.lit(False)
            for w in opt.waypoints:
                t = F.col("waypoints").getItem(w)
                tod_ok = tod_ok | (t.isNotNull() & in_window(t))
        else:
            tod_ok = in_window(F.col("first_ts"))
        flights = flights.withColumn(
            "outcome",
            F.when(
                (F.col("outcome") == LABEL_PREPROCESSED)
                & ~F.coalesce(tod_ok, F.lit(False)),
                F.lit(LABEL_TOD_FAILED),
            ).otherwise(F.col("outcome")),
        )
        if "_meets_tod" in flights.columns:
            flights = flights.drop("_meets_tod")
    return flights, inters


def funnel_of(flights_with_outcome: DataFrame) -> DataFrame:
    return (
        flights_with_outcome.groupBy(F.col("outcome"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("outcome")
    )


def histogram_stats(df: DataFrame, value_col: str) -> DataFrame:
    """The reference histogram's summary line: N, mean, stddev, p50, p90
    (report/report.go:224-230)."""
    return df.agg(
        F.count(value_col).alias("n"),
        F.avg(value_col).alias("mean"),
        F.stddev(value_col).alias("stddev"),
        F.percentile_approx(value_col, 0.5).alias("p50"),
        F.percentile_approx(value_col, 0.9).alias("p90"),
    )


def run_report(
    name: str,
    spark: SparkSession,
    flights: DataFrame,
    trackpoints: DataFrame,
    opt: Options,
) -> ReportResult:
    """SetupReport + Process over the whole selection at once
    (report/registry.go:52-90, report/report.go:204-208)."""
    from . import canned  # noqa: F401 — side-effect registration

    fn, _desc = REGISTRY[name]
    labeled = fn(spark, flights, trackpoints, opt)
    rows = labeled.filter(F.col("outcome").startswith("[ACCEPTED]"))
    hist = None
    if "_hist_value" in labeled.columns:
        hist = histogram_stats(rows, "_hist_value")
        rows = rows.drop("_hist_value")
    return ReportResult(rows=rows, funnel=funnel_of(labeled), histogram=hist)
