"""Fragment → flight assembly — the reference's streaming ingest path.

The reference consumes TrackFragments (a batch of ADSB/MLAT points for
one airframe, trackfragment.go:14-19) and glues each onto the most
recent flight for that icao, or starts a new flight
(fgae/addtrackfragment.go:36-143). The accept/reject rules
(PlausibleContribution, track.go:443-476):

  - fragment strictly after the track:  accept iff gap <= 30 min
    (3x kExtensionMaxGap; track.go:443-452 uses 1x, but the reference's
    own misordered-fragments fixture — addtrackfragment_test.go:21-76,
    196 fragments that "should now generate a single flight" — contains
    16-26 min suffix gaps whose infill arrives later out of order, so
    the suffix case needs the same out-of-order relaxation the
    reference gives the prefix case; tests/fixtures/misordered_frags.
    json pins the single-flight outcome);
  - fragment strictly before the track (out-of-order delivery): accept
    iff gap <= 30 min (3x, track.go:454-462);
  - time overlap: accept iff the tracks also overlap in space over the
    overlapping time window (track.go:464-476 via Compare,
    track.go:322-369: trim both tracks to the window with one point of
    padding, then compare their contiguous-box covers — operators/
    boxes.py — so two tracks in disjoint areas whose full bounding
    boxes overlap do NOT glue).

ADSB and MLAT accumulate into *separate* tracks of one flight; the
"current accumulation track" is the most recently updated of the two
(addtrackfragment.go:15-31). Callsigns backfill when they first appear
(addtrackfragment.go:77-80). Flight identity is deterministic:
icao + first-point epoch, so double-delivery dedupes
(fgae/db.go:171-182).

The decision core is pure Python over one airframe's fragments, reused
by BOTH the batch re-assembly job (groupBy(icao).applyInPandas — one
Arrow batch per airframe) and the Structured Streaming wrapper
(applyInPandasWithState keyed by icao, state = the open flight). This
is the "build batch first, reuse in state fn" mitigation from
SURVEY.md §7.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.boxes import tracks_space_overlap

EXTENSION_MAX_GAP_S = 600.0  # kExtensionMaxGap = 10 min (track.go:25)
PREFIX_MAX_GAP_S = 3 * EXTENSION_MAX_GAP_S  # track.go:454-462
# Contribution-path suffix tolerance (see module docstring: the
# misordered fixture requires the 3x relaxation on the suffix side too;
# the live extension path keeps the strict 1x gap).
CONTRIB_SUFFIX_MAX_GAP_S = 3 * EXTENSION_MAX_GAP_S


@dataclass
class _Track:
    ts: list = field(default_factory=list)  # epoch seconds, ascending after merge
    lat: list = field(default_factory=list)
    lon: list = field(default_factory=list)
    alt: list = field(default_factory=list)

    def merge(self, ts, lat, lon, alt):
        """Merge + stable sort by timestamp (Track.Merge, track.go:266-271)."""
        self.ts.extend(ts)
        self.lat.extend(lat)
        self.lon.extend(lon)
        self.alt.extend(alt)
        order = np.argsort(np.asarray(self.ts), kind="stable")
        self.ts = [self.ts[i] for i in order]
        self.lat = [self.lat[i] for i in order]
        self.lon = [self.lon[i] for i in order]
        self.alt = [self.alt[i] for i in order]


@dataclass
class OpenFlight:
    icao: str
    callsign: str = ""
    registration: str = ""  # airframe overlay (addtrackfragment.go:111-119)
    equip_type: str = ""
    tracks: dict = field(default_factory=dict)  # source -> _Track
    last_updated: dict = field(default_factory=dict)  # source -> seq no
    waypoints: dict = field(default_factory=dict)  # wp -> crossing epoch

    @property
    def first_epoch(self) -> float:
        return min(t.ts[0] for t in self.tracks.values() if t.ts)

    @property
    def flight_id(self) -> str:
        # deterministic child key (fgae/db.go:171-182)
        return f"{self.icao}_{int(self.first_epoch)}"

    def accumulation_track(self) -> _Track | None:
        """Most recently updated of ADSB/MLAT
        (currentAccumulationTrack, addtrackfragment.go:15-31)."""
        live = {s: t for s, t in self.tracks.items() if t.ts}
        if not live:
            return None
        s = max(live, key=lambda s: self.last_updated.get(s, -1))
        return live[s]


def _time_disposition(t1: _Track, ts2: list) -> tuple[str, float]:
    t1s, t1e = t1.ts[0], t1.ts[-1]
    t2s, t2e = ts2[0], ts2[-1]
    if t2e < t1s:
        return "before", t1s - t2e
    if t2s > t1e:
        return "after", t2s - t1e
    return "overlap", 0.0


def _padded_trim(ts, lat, lon, s: float, e: float, pad: int = 1):
    """PaddedTrimToTimes(s, e, pad) (track.go:280-299): the points
    inside [s, e] plus up to `pad` points of context each side — EMPTY
    when no point falls in the window (the reference returns an empty
    track there, which Compare maps to geo.Undefined, i.e. accept)."""
    ts = np.asarray(ts, float)
    idx = np.nonzero((ts >= s) & (ts <= e))[0]
    la = np.asarray(lat, float)
    lo_ = np.asarray(lon, float)
    if len(idx) == 0:
        return ts[:0], la[:0], lo_[:0]
    lo, hi = max(idx[0] - pad, 0), min(idx[-1] + 1 + pad, len(ts))
    return ts[lo:hi], la[lo:hi], lo_[lo:hi]


def _space_overlap_in_window(t1: _Track, ts2, lat2, lon2) -> bool:
    """Compare's overlap branch (track.go:360-369): trim both tracks to
    the shared time window (1-point pad), then box-cover overlap. An
    empty trim (window falls between one track's samples) is
    geo.Undefined in the reference — NOT disjoint, so accept
    (track.go:377-379 with PlausibleContribution's IsDisjoint test)."""
    s = max(t1.ts[0], ts2[0])
    e = min(t1.ts[-1], ts2[-1])
    a = _padded_trim(t1.ts, t1.lat, t1.lon, s, e)
    b = _padded_trim(ts2, lat2, lon2, s, e)
    if len(a[0]) == 0 or len(b[0]) == 0:
        return True
    return tracks_space_overlap(*a, *b)


def plausible_contribution(t1: _Track, ts2, lat2, lon2) -> bool:
    """PlausibleContribution (track.go:443-476), with the suffix gap at
    3x (CONTRIB_SUFFIX_MAX_GAP_S — see module docstring)."""
    kind, gap = _time_disposition(t1, ts2)
    if kind == "after":
        return gap <= CONTRIB_SUFFIX_MAX_GAP_S
    if kind == "before":
        return gap <= PREFIX_MAX_GAP_S
    return _space_overlap_in_window(t1, ts2, lat2, lon2)


def plausible_extension(t1: _Track, ts2, lat2, lon2) -> bool:
    """PlausibleExtension (track.go:407-440): like contribution, but a
    fragment from the *past* is never an extension."""
    kind, gap = _time_disposition(t1, ts2)
    if kind == "before":
        return False
    if kind == "after":
        return gap <= EXTENSION_MAX_GAP_S
    return _space_overlap_in_window(t1, ts2, lat2, lon2)


def _enrich_with_fragment(
    f: OpenFlight,
    fr: dict,
    prev_tp: tuple[float, float, float] | None,
    airframes: dict | None,
    fixes: dict | None,
) -> None:
    """The incremental per-fragment enrichment the reference runs after
    gluing (addtrackfragment.go:111-136): airframe overlay if the
    flight still lacks a registration; prefix the fragment with the
    point that preceded it so the waypoint matcher sees the line across
    the inter-fragment gap; match the (prefixed) fragment's segments
    against the fix table and record crossings."""
    if airframes and not f.registration:
        af = airframes.get(f.icao)
        if af:  # fill-blanks only (OverlayAirframe, airframe.go:21-25)
            f.registration = af.get("registration") or ""
            if not f.equip_type:
                f.equip_type = af.get("equip_type") or ""
    if fixes:
        from ..operators.waypoints import match_waypoints_points

        ts, lat, lon = fr["ts"], fr["lat"], fr["lon"]
        if prev_tp is not None:
            ts = [prev_tp[0]] + list(ts)
            lat = [prev_tp[1]] + list(lat)
            lon = [prev_tp[2]] + list(lon)
        for wp, t in match_waypoints_points(ts, lat, lon, fixes).items():
            f.waypoints[wp] = t  # SetWaypoint overwrites (flight.go:125-127)


def process_fragments(
    frags: list[dict],
    flights: list[OpenFlight] | None = None,
    seq0: int = 0,
    airframes: dict | None = None,
    fixes: dict | None = None,
) -> list[OpenFlight]:
    """Assemble one airframe's fragments (arrival order) into flights.

    Each frag: {source, callsign, ts[], lat[], lon[], alt[]} with ts
    ascending within the frag (MessagesToTrackFragment sorts,
    trackfragment.go:21-42). Returns finalized + still-open flights,
    oldest first. Mirrors AddTrackFragment's control flow
    (addtrackfragment.go:36-108). `flights`/`seq0` seed the scan with
    an already-open flight (the streaming state).

    `airframes` ({icao -> {registration, equip_type}}) and `fixes`
    ({name -> (lat, lon)}) are the reference's in-memory caches
    (ref.AirframeCache, sfo.KFixes); when given, each fragment also
    runs the incremental enrichment of addtrackfragment.go:111-136."""
    flights = flights if flights is not None else []
    seq = seq0
    for fr in frags:
        seq += 1
        src = fr["source"]
        f = flights[-1] if flights else None  # LookupMostRecent by icao
        if f is not None:
            acc = f.accumulation_track()
            if acc is None or plausible_contribution(acc, fr["ts"], fr["lat"], fr["lon"]):
                if not f.callsign and fr.get("callsign"):
                    f.callsign = fr["callsign"]  # backfill (addtrackfragment.go:77-80)
                # If the frag strictly extends this source's track, note
                # the preceding point BEFORE merging (addtrackfragment.
                # go:88-98): the waypoint matcher below then looks at
                # the line across the inter-fragment gap.
                prev_tp = None
                t = f.tracks.get(src)
                if t is not None and t.ts and t.ts[-1] < fr["ts"][0]:
                    prev_tp = (t.ts[-1], t.lat[-1], t.lon[-1])
                f.tracks.setdefault(src, _Track()).merge(
                    fr["ts"], fr["lat"], fr["lon"], fr["alt"]
                )
                f.last_updated[src] = seq
                _enrich_with_fragment(f, fr, prev_tp, airframes, fixes)
                continue
        nf = OpenFlight(icao=fr["icao"], callsign=fr.get("callsign") or "")
        nf.tracks[src] = _Track()
        nf.tracks[src].merge(fr["ts"], fr["lat"], fr["lon"], fr["alt"])
        nf.last_updated[src] = seq
        _enrich_with_fragment(nf, fr, None, airframes, fixes)
        flights.append(nf)
    return flights


# ---------------------------------------------------------------------------
# Batch wrapper: re-assemble a lake of fragment points
# ---------------------------------------------------------------------------

ASSEMBLED_SCHEMA = (
    "flight_id string, icao_id string, callsign string, registration string, "
    "waypoints string, track string, "
    "ts timestamp, lat double, lon double, alt_ft double"
)


def _pdf_to_frags(pdf: pd.DataFrame) -> list[dict]:
    frags = []
    for _frag_id, g in pdf.groupby("frag_idx", sort=True):
        g = g.sort_values("ts", kind="mergesort")
        frags.append(
            {
                "icao": g["icao_id"].iloc[0],
                "source": g["track"].iloc[0],
                "callsign": next((c for c in g["callsign"] if c), ""),
                "ts": (g["ts"].astype("int64") / 1e9).tolist(),
                "lat": g["lat"].tolist(),
                "lon": g["lon"].tolist(),
                "alt": g["alt_ft"].tolist(),
            }
        )
    return frags


def _flights_to_pdf(flights: list[OpenFlight]) -> pd.DataFrame:
    rows = []
    for f in flights:
        fid = f.flight_id
        wp_js = json.dumps(f.waypoints, sort_keys=True) if f.waypoints else ""
        for src, t in f.tracks.items():
            for i in range(len(t.ts)):
                rows.append(
                    (fid, f.icao, f.callsign, f.registration, wp_js, src,
                     # float-seconds -> ns picks up sub-µs noise Arrow
                     # refuses to truncate; round to µs explicitly
                     pd.Timestamp(int(round(t.ts[i] * 1e6)), unit="us"),
                     t.lat[i], t.lon[i], t.alt[i])
                )
    return pd.DataFrame(
        rows,
        columns=["flight_id", "icao_id", "callsign", "registration", "waypoints",
                 "track", "ts", "lat", "lon", "alt_ft"],
    )


def assemble_batch(
    fragment_points: DataFrame,
    airframes: dict | None = None,
    fixes: dict | None = None,
) -> DataFrame:
    """Batch assembly: fragment points (icao_id, frag_idx, track,
    callsign, ts, lat, lon, alt_ft) → flight-assigned trackpoints.
    One Arrow group per airframe — exactly the reference's per-icao
    serialization, but all airframes in parallel. `airframes`/`fixes`
    are small driver-side caches captured into the Arrow workers'
    closure (the reference's ref.AirframeCache / sfo.KFixes shape)."""

    def _assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        return _flights_to_pdf(
            process_fragments(_pdf_to_frags(pdf), airframes=airframes, fixes=fixes)
        )

    return fragment_points.groupBy("icao_id").applyInPandas(_assemble, ASSEMBLED_SCHEMA)


# ---------------------------------------------------------------------------
# Structured Streaming wrapper: applyInPandasWithState keyed by icao
# ---------------------------------------------------------------------------

# State = the one open flight per airframe, as JSON (tracks are a few
# thousand points; well under state-store limits).
STATE_SCHEMA = "js string"
CLOSE_GAP_MS = 30 * 60 * 1000  # close a flight 30 min after last update (SURVEY §2.9)


def _flight_to_json(f: OpenFlight) -> str:
    return json.dumps(
        {
            "icao": f.icao,
            "callsign": f.callsign,
            "registration": f.registration,
            "equip_type": f.equip_type,
            "waypoints": f.waypoints,
            "last_updated": f.last_updated,
            "tracks": {
                s: {"ts": t.ts, "lat": t.lat, "lon": t.lon, "alt": t.alt}
                for s, t in f.tracks.items()
            },
        }
    )


def _flight_from_json(js: str) -> OpenFlight:
    d = json.loads(js)
    f = OpenFlight(icao=d["icao"], callsign=d["callsign"])
    f.registration = d.get("registration", "")
    f.equip_type = d.get("equip_type", "")
    f.waypoints = dict(d.get("waypoints", {}))
    f.last_updated = {k: int(v) for k, v in d["last_updated"].items()}
    for s, t in d["tracks"].items():
        tr = _Track()
        tr.ts, tr.lat, tr.lon, tr.alt = t["ts"], t["lat"], t["lon"], t["alt"]
        f.tracks[s] = tr
    return f


def assemble_stream(
    fragment_points: DataFrame,
    airframes: dict | None = None,
    fixes: dict | None = None,
) -> DataFrame:
    """Streaming assembly: fragment points → finalized flights' points.

    State machine per icao (applyInPandasWithState): merge arriving
    fragments via process_fragments seeded with the open flight; when a
    fragment starts a NEW flight, the previous one is finalized and
    emitted; a processing-time timeout (30 min — the watermark-ish
    staleness bound, SURVEY §2.9) flushes the open flight. Input must
    carry the same columns as assemble_batch.

    With `airframes`/`fixes` the state fn ALSO runs the reference's
    incremental per-fragment enrichment (addtrackfragment.go:111-136):
    airframe overlay on first sight, and waypoint matching that sees
    the line across the inter-fragment gap — a fix crossed between two
    fragments is attributed to the open flight as it happens, not on a
    later batch re-pass."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _fn(key, pdfs, state: GroupState):
        out = []
        if state.hasTimedOut:
            if state.exists:
                (js,) = state.get
                out.append(_flights_to_pdf([_flight_from_json(js)]))
                state.remove()
        else:
            open_f = None
            if state.exists:
                (js,) = state.get
                open_f = _flight_from_json(js)
            frags = []
            for pdf in pdfs:
                frags.extend(_pdf_to_frags(pdf))
            seed = [open_f] if open_f else []
            seq0 = max(open_f.last_updated.values(), default=0) if open_f else 0
            assembled = process_fragments(
                frags, seed, seq0, airframes=airframes, fixes=fixes
            )
            for f in assembled[:-1]:  # all but the newest are closed
                out.append(_flights_to_pdf([f]))
            state.update((_flight_to_json(assembled[-1]),))
            state.setTimeoutDuration(CLOSE_GAP_MS)
        if out:
            yield pd.concat(out, ignore_index=True)

    return fragment_points.groupBy("icao_id").applyInPandasWithState(
        _fn,
        outputStructType=ASSEMBLED_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# ---------------------------------------------------------------------------
# Structured Streaming wrapper #2: the Spark 4 arbitrary-state API
# (transformWithStateInPandas). Same decision core, same state encoding,
# same close semantics — the two wrappers must emit identical flights
# (tests/test_assembly_tws.py pins parity on the misordered fixture).
# ---------------------------------------------------------------------------


def _make_assembly_processor(airframes: dict | None, fixes: dict | None):
    """Build the StatefulProcessor class lazily: the TWS state protocol
    imports google.protobuf (pyspark/sql/streaming/proto), which this
    container lacks — the legacy applyInPandasWithState wrapper above
    carries the same semantics where TWS is unavailable."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _AssemblyProcessor(StatefulProcessor):
        """ValueState = the one open flight per icao (JSON, the exact
        encoding the GroupState wrapper uses); a processing-time timer
        re-armed on every input flushes the open flight CLOSE_GAP_MS
        after its last update — the same 30-min staleness close."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState("open_flight", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            open_f = None
            got = self._open.get()
            if got is not None:
                open_f = _flight_from_json(got[0])
            frags = []
            for pdf in rows:
                frags.extend(_pdf_to_frags(pdf))
            seed = [open_f] if open_f else []
            seq0 = max(open_f.last_updated.values(), default=0) if open_f else 0
            assembled = process_fragments(
                frags, seed, seq0, airframes=airframes, fixes=fixes
            )
            if not assembled:
                return
            for f in assembled[:-1]:  # all but the newest are closed
                yield _flights_to_pdf([f])
            self._open.update((_flight_to_json(assembled[-1]),))
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._handle.registerTimer(
                timerValues.getCurrentProcessingTimeInMs() + CLOSE_GAP_MS
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            got = self._open.get()
            if got is not None:
                yield _flights_to_pdf([_flight_from_json(got[0])])
                self._open.clear()

        def close(self) -> None:  # required abstract override; no teardown
            pass

    return _AssemblyProcessor()


def assemble_stream_tws(
    fragment_points: DataFrame,
    airframes: dict | None = None,
    fixes: dict | None = None,
) -> DataFrame:
    """assemble_stream on transformWithStateInPandas (Spark 4 arbitrary
    state): identical inputs, outputs, state encoding, and close
    semantics to the applyInPandasWithState wrapper — only the state
    API differs. timeMode=processingTime arms the per-key close timer.

    NOTE: the TWS state protocol needs the ``google.protobuf`` wheel;
    where it is absent use ``assemble_stream`` (same semantics)."""
    return fragment_points.groupBy("icao_id").transformWithStateInPandas(
        _make_assembly_processor(airframes, fixes),
        outputStructType=ASSEMBLED_SCHEMA,
        outputMode="append",
        timeMode="processingTime",
    )


def dedup_recent(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """FIFOSet streaming dedup (fifoset.go:10-63, used by the fr24
    poller at app/frontend/fr24poller.go:174-229): suppress re-delivery
    of a (registration, callsign) pair seen within the age-out window.
    Spark-native: event-time watermark + dropDuplicatesWithinWatermark —
    state expires exactly like the FIFOSet's age-out."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["registration", "callsign"]
    )
