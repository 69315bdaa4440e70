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

from ..operators.intersect import Restrictor, intersect_tracks, satisfies_set

# Funnel outcome labels follow the reference's bracket convention
# ("[A] PreProcessed", "[B] Eliminated: ...", report/report.go:97-199) so
# funnels render in stage order.
LABEL_PREPROCESSED = "[A] PreProcessed"


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
        keyed = tp.join(F.broadcast(surviving.select("flight_id")), "flight_id", "semi")
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
        # Flight's local start-hour must fall inside the window
        # (report/report.go:153-195; everything displayed in PDT per
        # SURVEY §2.7 — date.InPdt).
        h = F.hour(F.from_utc_timestamp(F.col("first_ts"), "America/Los_Angeles"))
        if opt.tod_start_hour <= opt.tod_end_hour:
            in_window = (h >= opt.tod_start_hour) & (h <= opt.tod_end_hour)
        else:  # window wraps midnight, e.g. 22 -> 5 (the night-noise query)
            in_window = (h >= opt.tod_start_hour) | (h <= opt.tod_end_hour)
        flights = flights.withColumn(
            "outcome",
            F.when(
                (F.col("outcome") == LABEL_PREPROCESSED) & ~in_window,
                F.lit("[B] Eliminated: outside time-of-day window"),
            ).otherwise(F.col("outcome")),
        )
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
