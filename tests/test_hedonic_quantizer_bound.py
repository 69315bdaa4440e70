"""Mechanical closure for the hedonic LN nano-quantizer risk
(DETERMINISM.md "LN is in the same 1-ulp class as EXP"; r7 VERDICT
item 5).

Measured facts that forced the r8 rederivation (kept here as the
regression rationale):
- JVM LN and libm LN diverge by one ulp on ~0.45% of the real
  micro-cent unit-price domain (23/5999 at sf0.001, 2718/598437 at
  sf0.1);
- OTHER arguments land EXACTLY on FLOOR(ln*1e9 + 0.5) boundaries
  (worst margin 0.0 at sf0.01 and sf0.1) — so engine LN was safe only
  because the divergent set and the boundary set happened not to
  intersect.

queries/hedonic.py therefore no longer calls engine LN on the
load-bearing path: lnhat(p) = kk*ln2 + 2*atanh-series, all
IEEE-correctly-rounded +,-,*,/ with identical expression structure.
These tests assert, over the FULL distinct price domain at sf0.001
and sf0.1 (key-shifted sf1 replication adds no new prices, so sf0.1
bounds sf1):

1. Spark lnhat == DuckDB lnhat == a pure-Python replay, bit-for-bit
   (catches any future engine fusing ops, e.g. FMA contraction);
2. lnhat is within 1e-10 relative of true ln (the series is a faithful
   log, not just a consistent one);
3. the quantized nano-unit terms agree exactly (the actual downstream
   contract feeding q761-q765's integer sums).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from flightdb_spark.queries.hedonic import _ATANH_COEFS, _LN2, _lnhat_expr

_PRICE = (
    "CAST(FLOOR(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)"
    " * CAST(10000 AS DOUBLE) / CAST(l_quantity AS BIGINT) + 0.5) AS BIGINT)"
)


def _lnhat_over_prices(src: str) -> str:
    """The hedonic lnhat pipeline over the distinct price domain of
    ``src`` — same layering as queries/hedonic.py::_rows_cte."""
    return f"""
    SELECT up, {_lnhat_expr()} AS lh
    FROM (
      SELECT up, kk, z, z * z AS z2 FROM (
        SELECT up, kk,
               (mm - CAST(1 AS DOUBLE)) / (mm + CAST(1 AS DOUBLE)) AS z
        FROM (
          SELECT up, kk,
                 CAST(up AS DOUBLE)
                   / CAST((CAST(1 AS BIGINT) << kk) AS DOUBLE) AS mm
          FROM (
            SELECT up, LENGTH(bin(up)) - 1 AS kk FROM (
              SELECT DISTINCT {_PRICE} AS up
              FROM {src} WHERE l_quantity > 0) d0
          ) d1
        ) d2
      ) d3
    ) d4
    """


def _py_lnhat(p: int) -> float:
    kk = p.bit_length() - 1
    mm = float(p) / float(1 << kk)
    z = (mm - 1.0) / (mm + 1.0)
    z2 = z * z
    coefs = [float(c) for c in _ATANH_COEFS]
    horner = coefs[-1]
    for c in reversed(coefs[:-1]):
        horner = c + z2 * horner
    return float(kk) * float(_LN2) + 2.0 * z * (1.0 + z2 * horner)


@pytest.mark.parametrize("sf", ["0.001", "0.1"])
def test_lnhat_bit_equality_and_accuracy(spark, sf):
    path = f"/root/testdata/sf{sf}/lineitem.parquet"
    con = duckdb.connect()
    duck = dict(
        con.execute(_lnhat_over_prices(f"read_parquet('{path}')")).fetchall()
    )
    assert duck, "no unit prices — testdata missing?"

    spark.read.parquet(path).createOrReplaceTempView("li_raw_lnhat")
    jvm = dict(spark.sql(_lnhat_over_prices("li_raw_lnhat")).collect())
    assert set(jvm) == set(duck), "distinct price domains diverge"

    bad_eq, bad_acc, bad_q = [], [], []
    for p, dl in duck.items():
        py = _py_lnhat(p)
        jl = jvm[p]
        if not (dl == py == jl):
            bad_eq.append((p, dl, py, jl))
            continue
        true_ln = math.log(float(p))
        if abs(dl - true_ln) > 1e-10 * abs(true_ln):
            bad_acc.append((p, dl, true_ln))
        if math.floor(dl * 1e9 + 0.5) != math.floor(jl * 1e9 + 0.5):
            bad_q.append(p)
    assert not bad_eq, (
        f"sf{sf}: lnhat diverges across engines on {len(bad_eq)} of "
        f"{len(duck)} arguments; first: {bad_eq[0]} — an engine started "
        "fusing float ops; re-check queries/hedonic.py"
    )
    assert not bad_acc, f"sf{sf}: lnhat drifted from true ln: {bad_acc[:3]}"
    assert not bad_q, f"sf{sf}: quantized terms diverged on {bad_q[:5]}"
