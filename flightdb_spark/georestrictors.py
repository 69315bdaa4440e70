"""GeoRestrictorSet store — named, per-user restrictor sets.

The reference persists these as per-user gob blobs with CRUD handlers
(fgae/georestrictorsets.go:12-106; construction from form params
:117-161, 10-vertex polygon cap :143-147). Here a set is a JSON
document in a small config directory (the "user config table"); the
Restrictor dataclass round-trips losslessly.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict

from .operators.intersect import Restrictor

MAX_POLY_VERTICES = 10  # georestrictorset.go:143-147


def _path(root: str, user: str) -> str:
    return os.path.join(root, f"{user}.json")


def _load_all(root: str, user: str) -> dict:
    p = _path(root, user)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def save_set(root: str, user: str, name: str, restrictors: list[Restrictor], logic: str = "all") -> None:
    for r in restrictors:
        if r.gr_type == "polygon" and len(r.poly) > MAX_POLY_VERTICES:
            raise ValueError(f"polygon exceeds {MAX_POLY_VERTICES} vertices")
    os.makedirs(root, exist_ok=True)
    sets = _load_all(root, user)
    sets[name] = {
        "logic": logic,
        "restrictors": [asdict(r) for r in restrictors],
    }
    with open(_path(root, user), "w") as f:
        json.dump(sets, f, indent=1)


def load_set(root: str, user: str, name: str) -> tuple[list[Restrictor], str]:
    sets = _load_all(root, user)
    if name not in sets:
        raise KeyError(name)
    d = sets[name]
    rs = []
    for rd in d["restrictors"]:
        rd = dict(rd)
        rd["poly"] = tuple(tuple(p) for p in rd.get("poly", ()))
        rs.append(Restrictor(**rd))
    return rs, d.get("logic", "all")


def list_sets(root: str, user: str) -> list[str]:
    return sorted(_load_all(root, user))


def delete_set(root: str, user: str, name: str) -> None:
    sets = _load_all(root, user)
    sets.pop(name, None)
    with open(_path(root, user), "w") as f:
        json.dump(sets, f, indent=1)
