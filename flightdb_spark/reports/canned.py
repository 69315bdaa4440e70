"""Canned analysis reports (reference analysis/*.go), set-based.

Each report is a registered function `(spark, flights, trackpoints,
options) -> DataFrame` whose result carries one row per considered
flight and an `outcome` label column: `[ACCEPTED] ...` rows are the
report's output rows; other labels reproduce the reference's funnel
counters (report/report.go's r.I maps). Per-flight Go loops become
joins + windows; nothing in here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.geo import haversine_km
from . import (
    LABEL_PREPROCESSED,
    Options,
    handle_report,
    preprocess,
    select_preferred_track,
)

# SFO reference point (the reference gets it from geo/sfo's airport table).
SFO_LAT, SFO_LON = 37.6189, -122.3750
KM_PER_NM = 1.852

# Approximate SFO Class-B shelf rings (dist_nm_lo, dist_nm_hi, floor_ft).
# The reference outsources the exact geometry to the external geo/sfo
# package (analysis/classb.go:66 sfo.SFOClassBMap); per SURVEY §7 the
# values here are an approximation of the inverted-wedding-cake shelves,
# encoded as data so a real geometry table can be swapped in.
CLASSB_RINGS = [
    (0.0, 10.0, 0.0),
    (10.0, 15.0, 1500.0),
    (15.0, 20.0, 4000.0),
    (20.0, 25.0, 6000.0),
    (25.0, 30.0, 8000.0),
]
CLASSB_MIN_DIST_NM = 15.5  # kLimit: violations only count beyond this (classb.go:69-72)


def _pdt(col):
    return F.from_utc_timestamp(col, "America/Los_Angeles")


def _with_point_index(tp: DataFrame) -> DataFrame:
    """0-based per-(flight, track) point index, the reference's array
    index i — needed wherever reports output I/J indices."""
    w = W.partitionBy("flight_id", "track").orderBy("ts")
    return tp.withColumn("idx", F.row_number().over(w) - 1)


def _first_area_entry(inters: DataFrame) -> DataFrame:
    """First area intersection per flight (GetFirstAreaIntersection,
    report/helpers.go): lowest restrictor_idx that actually hit."""
    hit = inters.filter(F.col("i_entry") >= 0)
    w = W.partitionBy("flight_id").orderBy("restrictor_idx")
    return (
        hit.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "satisfied")
    )


def _entry_exit_points(
    inters: DataFrame, tp: DataFrame, spec: tuple[str, ...] = ()
) -> DataFrame:
    """Join the entry/exit trackpoint values onto first-area rows.

    The join keys on (flight_id, ts): restrict tp to the same preferred
    track the crawl used, then dedupe to one row per key, so a second
    source carrying an identical timestamp cannot fan the left join out
    and duplicate report rows."""
    if spec and "track" in tp.columns:
        tp = select_preferred_track(tp, spec)
    tp = tp.withColumn(
        "_rn", F.row_number().over(W.partitionBy("flight_id", "ts").orderBy("track"))
    ).filter(F.col("_rn") == 1).drop("_rn")
    first = _first_area_entry(inters)
    entry = tp.select(
        "flight_id",
        F.col("ts").alias("entry_ts"),
        F.col("alt_ft").alias("entry_alt"),
        F.col("groundspeed_kt").alias("entry_gs"),
    )
    exit_ = tp.select(
        "flight_id",
        F.col("ts").alias("exit_ts"),
        F.col("alt_ft").alias("exit_alt"),
    )
    return (
        first.join(entry, ["flight_id", "entry_ts"], "left")
        .join(exit_, ["flight_id", "exit_ts"], "left")
    )


def _alt2bkt(alt):
    # listmatches.go:139-142: g = int((alt+500)/1000)
    g = F.floor((alt + 500) / 1000).cast("double")
    return F.format_string("altband: %05.0f-%05.0f", g * 1000 - 500, g * 1000 + 499)


def _speed2bkt(gs):
    # listmatches.go:145-148: g = int((gs+10)/20)
    g = F.floor((gs + 10) / 20).cast("double")
    return F.format_string("speedband: %03.0f-%03.0f", g * 20 - 10, g * 20 + 9)


@handle_report("list", "List matching flights (report/listmatches.go)")
def list_report(spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options) -> DataFrame:
    labeled, inters = preprocess(flights, tp, opt)
    cols = [
        F.col("callsign").alias("ident"),
        F.col("equip_type"),
        F.col("orig"),
        F.col("dest"),
        F.array_join(F.col("tags"), " ").alias("tag_list"),
    ]
    out = labeled.select("flight_id", "outcome", "first_ts", *cols)
    if inters is not None:
        pts = _entry_exit_points(inters, tp, opt.track_spec)
        out = out.join(pts, "flight_id", "left")
        alt, gs = F.col("entry_alt"), F.col("entry_gs")
        when_ts = F.col("entry_ts")
    else:
        alt = F.lit(None).cast("double")
        gs = F.lit(None).cast("double")
        when_ts = F.col("first_ts")
    # market distribution counters [F] (listmatches.go:49-54)
    norcal = F.col("orig").isin("SFO", "SJC", "OAK") | F.col("dest").isin(
        "SFO", "SJC", "OAK"
    )
    out = (
        out.withColumn("datetime_pst", F.date_format(_pdt(when_ts), "MM/dd/yyyy HH:mm"))
        .withColumn("time_pst", F.date_format(_pdt(when_ts), "HH:mm:ss"))
        .withColumn("altitude_ft", alt)
        .withColumn("groundspeed_kt", gs)
        .withColumn("alt_band", F.when(alt.isNotNull(), _alt2bkt(alt)))
        .withColumn("speed_band", F.when(gs.isNotNull(), _speed2bkt(gs)))
        .withColumn(
            "market", F.when(norcal, F.concat_ws(":", F.col("orig"), F.col("dest")))
        )
        .withColumn(
            "outcome",
            F.when(
                F.col("outcome") == LABEL_PREPROCESSED, F.lit("[ACCEPTED] listed")
            ).otherwise(F.col("outcome")),
        )
    )
    drop = [c for c in ("restrictor_idx", "i_entry", "i_exit") if c in out.columns]
    return out.drop(*drop)


@handle_report("altitudebands", "Altitude Bands across {region} (analysis/altitudestacking.go)")
def altitudebands(spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options) -> DataFrame:
    labeled, inters = preprocess(flights, tp, opt)
    if inters is None:
        raise ValueError("altitudebands requires a geo restrictor (region)")
    pts = _entry_exit_points(inters, tp, opt.track_spec)
    out = labeled.join(pts, "flight_id", "left")
    # avg of entry/exit altitude (altitudestacking.go:33: Start + (End-Start)/2)
    avg_alt = F.col("entry_alt") + (F.col("exit_alt") - F.col("entry_alt")) / 2.0
    g = F.floor((avg_alt + 500) / 1000).cast("double")
    band = F.format_string("%05.0f-%05.0f", g * 1000 - 500, g * 1000 + 500)
    return out.select(
        "flight_id",
        F.col("callsign").alias("ident"),
        F.when(F.col("entry_alt").isNotNull(), avg_alt).alias("avg_alt_ft"),
        F.when(F.col("entry_alt").isNotNull(), band).alias("alt_band"),
        "i_entry",
        "i_exit",
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("entry_alt").isNull(), F.lit("[C] RejectedByReport: no area intersection"))
        .otherwise(F.concat(F.lit("[ACCEPTED] [D] "), band))
        .alias("outcome"),
    )


@handle_report("closestpoint", "Closest point to {refpoint} (analysis/closestapproach.go)")
def closestpoint(spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options) -> DataFrame:
    if opt.refpoint is None:
        raise ValueError("closestpoint requires options.refpoint")
    _name, rlat, rlon = opt.refpoint
    labeled, _ = preprocess(flights, tp, opt)
    picked = _with_point_index(select_preferred_track(tp, opt.track_spec or ("ADSB", "FA", "fr24")))
    if opt.alt_max > 0:
        # ClosestTo's altitude band (track.go:849-863): only in-band
        # points compete for the argmin. (Where the reference would fall
        # back to index 0 when *no* point is in band — its iMin starts
        # at 0 — we reject the flight instead, which is the documented
        # intent of its "-1" contract.)
        picked = picked.filter(
            (F.col("alt_ft") >= opt.alt_min) & (F.col("alt_ft") <= opt.alt_max)
        )
    dist = haversine_km(F.col("lat"), F.col("lon"), F.lit(rlat), F.lit(rlon))
    closest = (
        picked.withColumn("_dist_km", dist)
        .groupBy("flight_id")
        .agg(
            F.min_by(F.struct("idx", "_dist_km", "ts", "alt_ft"), F.col("_dist_km")).alias("_c")
        )
        .select(
            "flight_id",
            F.col("_c.idx").alias("i_closest"),
            F.col("_c._dist_km").alias("dist_km"),
            F.col("_c.alt_ft").alias("alt_ft"),
        )
    )
    out = labeled.join(closest, "flight_id", "left")
    return out.select(
        "flight_id",
        F.col("callsign").alias("ident"),
        "i_closest",
        F.round("dist_km", 2).alias("dist_km"),
        (F.col("dist_km") * 1000).alias("_hist_value"),  # metres (closestapproach.go:41)
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("i_closest").isNull(), F.lit("[C] RejectedByReport: no track"))
        .otherwise(F.lit("[ACCEPTED] compared against ref pt"))
        .alias("outcome"),
    )


def _waypoint_asof(tp: DataFrame, flights: DataFrame, wp: str, suffix: str) -> DataFrame:
    """dist_travelled/ts at the crossing of waypoint `wp` (as-of the
    recorded crossing time), per flight. flights.waypoints is
    map<string,timestamp> (schemas.py)."""
    t_wp = flights.select(
        "flight_id", F.col("waypoints").getItem(wp).alias("_t_wp")
    ).filter(F.col("_t_wp").isNotNull())
    j = tp.join(t_wp, "flight_id").filter(F.col("ts") <= F.col("_t_wp"))
    return (
        j.groupBy("flight_id")
        .agg(F.max_by(F.struct("ts", "dist_travelled_km", "track"), F.col("ts")).alias("_p"))
        .select(
            "flight_id",
            F.col("_p.ts").alias(f"ts_{suffix}"),
            F.col("_p.dist_travelled_km").alias(f"dist_{suffix}"),
            F.col("_p.track").alias(f"track_{suffix}"),
        )
    )


@handle_report("flowndist", "Flown dist from {refpoint} to {refpoint2} (analysis/flown.go)")
def flowndist(spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options) -> DataFrame:
    from ..operators.derived import with_derived_columns

    if opt.refpoint is None or opt.refpoint2 is None:
        raise ValueError("flowndist requires refpoint and refpoint2 (waypoint names)")
    wp1, wp2 = opt.refpoint[0], opt.refpoint2[0]
    labeled, _ = preprocess(flights, tp, opt)
    picked = with_derived_columns(select_preferred_track(tp, opt.track_spec))
    a = _waypoint_asof(picked, flights, wp1, "a")
    b = _waypoint_asof(picked, flights, wp2, "b")
    out = labeled.join(a, "flight_id", "left").join(b, "flight_id", "left")
    flown = F.col("dist_b") - F.col("dist_a")
    return out.select(
        "flight_id",
        F.col("callsign").alias("ident"),
        F.col("equip_type"),
        F.col("track_a").alias("track"),
        F.round(flown, 2).alias("flown_km"),
        F.date_format(_pdt(F.col("ts_a")), "HH:mm:ss").alias(f"time_at_{wp1}"),
        F.date_format(_pdt(F.col("ts_b")), "HH:mm:ss").alias(f"time_at_{wp2}"),
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("ts_a").isNull(), F.lit(f"[D] flights without {wp1}"))
        .when(F.col("ts_b").isNull(), F.lit(f"[D] flights without {wp2}"))
        .when(
            F.col("track_a") != F.col("track_b"),
            F.format_string("[D] flight mixed tracks %s,%s", F.col("track_a"), F.col("track_b")),
        )
        .otherwise(F.lit(f"[ACCEPTED] [D] flight had {wp1}-{wp2}"))
        .alias("outcome"),
    )


@handle_report(
    "straightlinedisplacement",
    "Lateral displacement from the line {refpoint}-{refpoint2} "
    "(analysis/straightlinedisplacement.go)",
)
def straightlinedisplacement(
    spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options
) -> DataFrame:
    from ..operators.derived import with_derived_columns

    if opt.refpoint is None or opt.refpoint2 is None:
        raise ValueError("straightlinedisplacement requires refpoint and refpoint2")
    wp1, lat1, lon1 = opt.refpoint
    wp2, lat2, lon2 = opt.refpoint2
    labeled, _ = preprocess(flights, tp, opt)
    picked = with_derived_columns(select_preferred_track(tp, ("ADSB", "MLAT", "FOIA")))
    # clip to [t(wp1), t(wp2)] (ClipTo, track.go:581-596)
    times = flights.select(
        "flight_id",
        F.col("waypoints").getItem(wp1).alias("_t1"),
        F.col("waypoints").getItem(wp2).alias("_t2"),
    ).filter(F.col("_t1").isNotNull() & F.col("_t2").isNotNull())
    clipped = picked.join(times, "flight_id").filter(
        F.col("ts").between(F.least("_t1", "_t2"), F.greatest("_t1", "_t2"))
    )
    # SampleEveryDist(1 KM) ≈ first point per 1-km bucket of dist_travelled
    # (track.go:639-666; SURVEY §2.4 bucket-on-floor mapping)
    bucket = F.floor(F.col("dist_travelled_km"))
    w = W.partitionBy("flight_id", bucket).orderBy("ts")
    sampled = clipped.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    # lateral displacement: point-to-segment distance in a local
    # equirectangular frame (the reference's line.ClosestDistance)
    mid_lat = (lat1 + lat2) / 2.0
    import math as _m

    kx = 111.32 * _m.cos(_m.radians(mid_lat))  # km per deg lon
    ky = 111.32
    ax, ay = lon1 * kx, lat1 * ky
    bx, by = lon2 * kx, lat2 * ky
    px, py = F.col("lon") * kx, F.col("lat") * ky
    dx, dy = bx - ax, by - ay
    seg_len2 = dx * dx + dy * dy
    t = F.greatest(F.lit(0.0), F.least(F.lit(1.0), ((px - ax) * dx + (py - ay) * dy) / seg_len2))
    cx, cy = ax + t * dx, ay + t * dy
    disp_m = F.sqrt(F.pow(px - cx, 2) + F.pow(py - cy, 2)) * 1000.0
    per_flight = (
        sampled.withColumn("_disp_m", disp_m)
        .groupBy("flight_id")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.round(F.avg("_disp_m"), 1).alias("mean_disp_m"),
            F.round(F.max("_disp_m"), 1).alias("max_disp_m"),
            F.round(F.percentile_approx("_disp_m", 0.9), 1).alias("p90_disp_m"),
        )
    )
    out = labeled.join(per_flight, "flight_id", "left")
    return out.select(
        "flight_id",
        F.col("callsign").alias("ident"),
        "n_samples",
        "mean_disp_m",
        "max_disp_m",
        "p90_disp_m",
        F.col("mean_disp_m").alias("_hist_value"),
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("n_samples").isNull(), F.lit(f"[C] Flights without {wp1}/{wp2}"))
        .otherwise(F.lit(f"[ACCEPTED] [D] displacement analysis {wp1}-{wp2}"))
        .alias("outcome"),
    )


@handle_report(
    "levelflight2", "Level flight within {region}: angle <= {tol} for {dist} (analysis/levelflight.go)"
)
def levelflight(spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options) -> DataFrame:
    from ..operators.derived import with_derived_columns

    labeled, inters = preprocess(flights, tp, opt)
    if inters is None:
        raise ValueError("levelflight2 requires a geo restrictor (region)")
    first = _first_area_entry(inters).select("flight_id", "entry_ts", "exit_ts")
    derived = with_derived_columns(_with_point_index(tp))
    inside = derived.join(first, "flight_id").filter(
        F.col("ts").between(F.col("entry_ts"), F.col("exit_ts"))
    )
    # gaps-and-islands: run_id increments when levelness flips
    # (SURVEY §2.8; reference scan loop levelflight.go:45-66)
    tol = opt.altitude_tolerance
    w = W.partitionBy("flight_id", "track").orderBy("ts")
    level = (F.abs(F.col("angle_of_inclination")) <= tol).cast("int")
    runs = (
        inside.withColumn("_level", level)
        .withColumn(
            "_flip",
            F.when(
                F.col("_level")
                != F.coalesce(F.lag("_level").over(w), F.lit(-1)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_run_id", F.sum("_flip").over(w.rowsBetween(W.unboundedPreceding, 0)))
        .filter(F.col("_level") == 1)
        .groupBy("flight_id", "track", "_run_id")
        .agg(
            (F.max("dist_travelled_km") - F.min("dist_travelled_km")).alias("run_km"),
            F.min("idx").alias("i_start"),
            F.max("idx").alias("i_end"),
            F.min_by("alt_ft", "idx").alias("start_alt"),
        )
        .filter(F.col("i_end") > F.col("i_start"))  # i==j runs don't count (levelflight.go:31)
    )
    longest = (
        runs.groupBy("flight_id")
        .agg(F.max_by(F.struct("run_km", "start_alt", "i_start", "i_end", "track"), "run_km").alias("_r"))
        .select(
            "flight_id",
            F.round(F.col("_r.run_km"), 2).alias("longest_run_km"),
            F.col("_r.start_alt").alias("start_alt"),
            F.col("_r.i_start").alias("i_start"),
            F.col("_r.i_end").alias("i_end"),
        )
    )
    out = labeled.join(longest, "flight_id", "left")
    accept = F.col("longest_run_km") >= opt.ref_distance_km
    lbl_no = f"[D] Flights without level flight (|angle| <= {tol:.1f} deg, for >= {opt.ref_distance_km:.1f} KM)"
    lbl_yes = f"[ACCEPTED] [D] Flights with level flight (|angle| <= {tol:.1f} deg, for >= {opt.ref_distance_km:.1f} KM)"
    return out.select(
        "flight_id",
        F.col("callsign").alias("ident"),
        "longest_run_km",
        "start_alt",
        "i_start",
        "i_end",
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("longest_run_km").isNull() | ~accept, F.lit(lbl_no))
        .otherwise(F.lit(lbl_yes))
        .alias("outcome"),
    )


@handle_report("sfoclassb", "SFO Class B excursions (analysis/classb.go)")
def sfoclassb(spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options) -> DataFrame:
    from ..operators.metar import asof_join_metar, with_indicated_altitude

    labeled, _ = preprocess(flights, tp, opt)
    picked = _with_point_index(select_preferred_track(tp, ("ADSB", "FA", "FOIA")))
    picked = picked.filter(F.col("alt_ft") >= 50)  # skip null/empty altitudes (classb.go:33)

    metars = opt.extra.get("metars")
    if metars is not None:
        enriched = with_indicated_altitude(asof_join_metar(picked, metars, station="KSFO"))
    else:
        # no METAR: assume standard pressure (classb.go:43-46 fake lookup)
        enriched = picked.withColumn("indicated_alt_ft", F.col("alt_ft"))
    # FOIA altitudes are already pressure-corrected (classb.go:37-40)
    ialt = F.when(F.col("track") == "FOIA", F.col("alt_ft")).otherwise(
        F.col("indicated_alt_ft")
    )
    dist_nm = haversine_km(F.col("lat"), F.col("lon"), F.lit(SFO_LAT), F.lit(SFO_LON)) / KM_PER_NM
    floor = F.lit(None).cast("double")
    for lo, hi, fl in reversed(CLASSB_RINGS):
        floor = F.when((dist_nm >= lo) & (dist_nm < hi), F.lit(fl)).otherwise(floor)
    below_by = floor - ialt
    viol = (
        enriched.withColumn("_dist_nm", dist_nm)
        .withColumn("_below_by", below_by)
        .filter(
            (F.col("_dist_nm") >= CLASSB_MIN_DIST_NM)
            & (F.col("_below_by") > opt.altitude_tolerance)
        )
    )
    deepest = (
        viol.groupBy("flight_id")
        .agg(F.max_by(F.struct("_below_by", "idx", "_dist_nm"), "_below_by").alias("_d"))
        .select(
            "flight_id",
            F.round(F.col("_d._below_by"), 0).alias("below_by_ft"),
            F.col("_d.idx").alias("i_deepest"),
            F.round(F.col("_d._dist_nm"), 1).alias("dist_nm"),
        )
    )
    out = labeled.join(deepest, "flight_id", "left")
    return out.select(
        "flight_id",
        F.col("callsign").alias("ident"),
        "dest",
        "below_by_ft",
        "i_deepest",
        "dist_nm",
        F.col("below_by_ft").alias("_hist_value"),
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("dest") != "SFO", F.lit("[D] dest != SFO"))
        .when(F.col("below_by_ft").isNull(), F.lit("[D] no Class B excursion"))
        .otherwise(F.lit("[ACCEPTED] [D] Class B excursion"))
        .alias("outcome"),
    )


@handle_report(
    "approachsignature",
    "Signature for SFO approaches, only when equip has prefix {str} "
    "(analysis/approachsignature.go)",
)
def approachsignature(
    spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options
) -> DataFrame:
    """Approach 'signature' sampling: first trackpoint inside each of a
    decreasing list of distances from KSFO (IndicesAtDistKMsFrom,
    track.go:501-522; distances 41.1/37.5/34.5/33.5 NM,
    approachsignature.go:29). Per-target conditional aggregation — one
    groupBy, no per-flight loop."""
    equip_prefix = opt.extra.get("equip_prefix", "B73")
    req_wps = opt.extra.get("required_waypoints", ("EPICK", "EDDYY", "SWELS"))
    sig_dist_nms = opt.extra.get("sig_dist_nms", (41.1, 37.5, 34.5, 33.5))
    labeled, _ = preprocess(flights, tp, opt)
    picked = select_preferred_track(tp, ("ADSB", "MLAT", "FOIA"))
    dist_nm = haversine_km(F.col("lat"), F.col("lon"), F.lit(SFO_LAT), F.lit(SFO_LON)) / KM_PER_NM
    from ..operators.derived import with_derived_columns

    derived = with_derived_columns(picked).withColumn("_dist_nm", dist_nm)
    sig_aggs = []
    for d in sig_dist_nms:
        key = str(d).replace(".", "_")
        sig_aggs.append(
            F.min_by(
                F.struct(
                    F.col("ts"),
                    F.col("alt_ft"),
                    F.col("angle_of_inclination"),
                    F.col("ground_accel_kps"),
                ),
                F.when(F.col("_dist_nm") < d, F.col("ts")),
            ).alias(f"sig_{key}")
        )
    sigs = derived.groupBy("flight_id").agg(*sig_aggs)
    out = labeled.join(sigs, "flight_id", "left")
    has_wps = F.lit(True)
    for wp in req_wps:
        has_wps = has_wps & F.array_contains(F.map_keys(F.col("waypoints")), wp)
    first_key = str(sig_dist_nms[0]).replace(".", "_")
    cols = ["flight_id", F.col("callsign").alias("ident"), "equip_type"]
    for d in sig_dist_nms:
        key = str(d).replace(".", "_")
        cols += [
            F.col(f"sig_{key}.ts").alias(f"ts_at_{key}nm"),
            F.col(f"sig_{key}.alt_ft").alias(f"alt_at_{key}nm"),
            F.round(F.col(f"sig_{key}.angle_of_inclination"), 2).alias(f"angle_at_{key}nm"),
        ]
    wp_label = f"[D] didn't hit waypoint {'/'.join(req_wps)}"
    return out.select(
        *cols,
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("dest") != "SFO", F.lit("[D] dest not SFO"))
        .when(~F.col("equip_type").startswith(equip_prefix),
              F.lit(f"[D] equip didn't have prefix {equip_prefix}"))
        .when(~has_wps, F.lit(wp_label))
        .when(F.col(f"sig_{first_key}.ts").isNull(), F.lit("[D] no points inside signature distances"))
        .otherwise(F.lit("[ACCEPTED] [D] flight accepted"))
        .alias("outcome"),
    )


@handle_report("trains", "Trains of flights crossing {refpoint} within {duration} (analysis/trains.go)")
def trains(spark: SparkSession, flights: DataFrame, tp: DataFrame, opt: Options) -> DataFrame:
    """Entrainment: successive gate crossings <= duration apart form a
    'train' (trains.go:76-106). The reference caches crossings in a blob
    and sessionizes at summary time, driver-side; here it is Spark's
    native session_window over the crossing events."""
    from pyspark.sql.functions import session_window

    gap_s = int(opt.extra.get("train_gap_s", 300))
    labeled, inters = preprocess(flights, tp, opt)
    if inters is None:
        raise ValueError("trains requires a geo restrictor (the entrainment gate)")
    crossings = _first_area_entry(inters).select("flight_id", F.col("entry_ts").alias("cross_ts"))
    sessions = (
        crossings.groupBy(session_window(F.col("cross_ts"), f"{gap_s} seconds"))
        .agg(
            F.collect_list("flight_id").alias("members"),
            F.count(F.lit(1)).alias("train_len"),
        )
        .select(
            F.col("session_window.start").alias("train_start"),
            F.explode("members").alias("flight_id"),
            "train_len",
        )
    )
    out = labeled.join(sessions, "flight_id", "left").join(crossings, "flight_id", "left")
    return out.select(
        "flight_id",
        F.col("callsign").alias("ident"),
        "cross_ts",
        "train_start",
        "train_len",
        F.when(F.col("outcome") != LABEL_PREPROCESSED, F.col("outcome"))
        .when(F.col("cross_ts").isNull(), F.lit("[D] flight missed entrainment refpoint"))
        .otherwise(
            F.format_string("[ACCEPTED] [E] trains of length=%02d", F.col("train_len"))
        )
        .alias("outcome"),
    )
