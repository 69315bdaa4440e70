"""IdSpec codec — composite flight identifiers (idspec.go:14-107).

Format: ``ID@epoch``, ``ID@epoch:epoch`` (range) or ``ID@RFC3339``,
where ID is an icao24 hex code, a registration, or a callsign. The
6-hex-digit heuristic treats e.g. ``A23A23`` as an icao id (known
ambiguity, idspec.go:79-87) — heuristic order kept identical.

Python-side codec (driver-side parse of user input, like the reference's
CGI param parsing, ui/options.go:84-95) + a predicate builder that turns
a spec into a pushdown-friendly DataFrame filter (fgae/fquery.go:70-86).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import Column
from pyspark.sql import functions as F

_HEX6 = re.compile(r"^[0-9A-F]{6}$")
_RFC3339 = "%Y-%m-%dT%H:%M:%SZ"


@dataclass(frozen=True)
class IdSpec:
    raw_id: str
    kind: str  # 'icao' | 'registration' | 'callsign'
    start: datetime
    end: datetime | None  # None → point-in-time spec

    def to_string(self) -> str:
        """Serialize like idspec.go:23-37 (epoch form)."""
        s = int(self.start.timestamp())
        if self.end is not None:
            return f"{self.raw_id}@{s}:{int(self.end.timestamp())}"
        return f"{self.raw_id}@{s}"


def _parse_time(tok: str) -> datetime:
    if tok.isdigit():
        return datetime.fromtimestamp(int(tok), tz=timezone.utc)
    return datetime.strptime(tok, _RFC3339).replace(tzinfo=timezone.utc)


def classify_id(raw: str) -> str:
    """Heuristic order from idspec.go:79-87: 6-hex-digit → icao; leading
    'N' + digit → registration; else callsign."""
    up = raw.upper()
    if _HEX6.match(up):
        return "icao"
    if re.match(r"^N[0-9]", up):
        return "registration"
    return "callsign"


def parse_idspec(spec: str) -> IdSpec:
    """Parse ``ID@epoch[:epoch]`` / ``ID@RFC3339`` (idspec.go:57-107)."""
    if "@" not in spec:
        raise ValueError(f"idspec {spec!r}: missing '@'")
    raw_id, _, times = spec.partition("@")
    if not raw_id or not times:
        raise ValueError(f"idspec {spec!r}: empty id or time")
    # normalize once at parse time (the reference uppercases idspec
    # input); every consumer then compares against uppercase ids
    raw_id = raw_id.strip().upper()
    if ":" in times and not times[0].isalpha():
        # range form uses ':' between epochs; RFC3339 also contains ':',
        # so only split when both halves are pure epochs (idspec.go:66-74)
        a, _, b = times.partition(":")
        if a.isdigit() and b.isdigit():
            return IdSpec(raw_id, classify_id(raw_id), _parse_time(a), _parse_time(b))
    return IdSpec(raw_id, classify_id(raw_id), _parse_time(times), None)


def idspec_predicate(spec: IdSpec) -> Column:
    """Pushdown predicate over the flights table (ByIdSpec,
    fgae/fquery.go:70-86): identity equality ∧ time overlap. Registration
    also falls back to callsign equality, as the reference does
    (fquery.go:82's 'Hmm' comment)."""
    if spec.kind == "icao":
        ident = F.col("icao_id") == spec.raw_id.upper()
    elif spec.kind == "registration":
        ident = (F.col("registration") == spec.raw_id.upper()) | (
            F.col("callsign") == spec.raw_id.upper()
        )
    else:
        ident = F.col("callsign") == spec.raw_id.upper()
    if spec.end is None:
        t = F.lit(spec.start.replace(tzinfo=None))
        return ident & (F.col("first_ts") <= t) & (F.col("last_ts") >= t)
    s = F.lit(spec.start.replace(tzinfo=None))
    e = F.lit(spec.end.replace(tzinfo=None))
    return ident & (F.col("first_ts") <= e) & (F.col("last_ts") >= s)
