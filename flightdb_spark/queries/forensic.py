"""Forensic-accounting batch 123 (q681-q685) — the digit-level fraud
screens an audit pipeline runs over order amounts (all tests operate
on exact integer cents; every expected probability is a Python float
literal inlined into both engines, DETERMINISM.md §11):

- q681 Benford SECOND-digit test: observed vs expected second-digit
  distribution with per-digit chi-square contributions (the
  second-digit test is the standard screen AFTER first-digit, which
  q195 already runs);
- q682 cents-endings uniformity: the last two digits of the amount
  against the uniform 1% baseline — psychological pricing and
  fabricated-number endings stick out here;
- q683 round-number bias: .00 / .50 / .95 / .99 endings and
  whole-hundred-dollar amounts vs their uniform baselines;
- q684 duplicate-amount clustering: exact amounts appearing
  suspiciously often (split transactions / copy-paste fabrication);
- q685 threshold-straddle audit: counts just below vs just above
  authorization-limit style thresholds — approval gaming shows as a
  below/above ratio far from 1.

100 TB shape: every test is ONE scan reducing to a bounded digit /
ending / threshold table (<= 100 groups); q684's duplicate census
is a groupBy on the amount (one shuffle, combiner-friendly) with a
TakeOrdered top-k. No windows, no joins against the fact table.

Determinism: digits come from integer div/mod on BIGINT cents
(nonnegative, so Spark/DuckDB div agree); chi-square contributions
are straight-line doubles from exact counts and literal
probabilities, rounded at 6 dp; shares are unrounded exact-integer
rationals (q666 lesson).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# Benford second-digit law: P(d2 = d) = sum_{d1=1..9} log10(1 + 1/(10 d1 + d))
# NOTE the e0 suffix: a bare 17-digit decimal literal parses through
# DECIMAL in DuckDB and lands one ulp off the Python double; an
# exponent literal parses as DOUBLE directly on both engines.
_BENFORD2 = {
    d: repr(sum(math.log10(1.0 + 1.0 / (10 * d1 + d)) for d1 in range(1, 10)))
    + "e0"
    for d in range(10)
}


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "orders")).createOrReplaceTempView(
        "orders"
    )


def _cents_cte() -> str:
    return """cents AS (
      SELECT o_orderkey AS okey,
             CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS c
      FROM orders
    )"""


# ---------------------------------------------------------------------------
# q681 — Benford second-digit test

_B2_CASE = "CASE " + " ".join(
    f"WHEN d2 = {d} THEN CAST({p} AS DOUBLE)" for d, p in _BENFORD2.items()
) + " END"

def _second_digit_expr(col: str) -> str:
    """Second significant digit via a magnitude CASE ladder: floor-
    divide down to the two leading digits, mod 10. Division happens
    as FLOOR over doubles (cents < 1e10 << 2^53, and FLOOR of an
    identical double is bit-identical on both engines — `DIV` is not
    portable to DuckDB, `//` not to Spark). No transcendentals."""
    steps = []
    for p in range(9, -1, -1):
        lo = 10 ** (p + 1)
        steps.append(
            f"WHEN {col} >= CAST({lo} AS BIGINT) THEN "
            f"CAST(FLOOR(CAST({col} AS DOUBLE)"
            f" / CAST({10 ** p} AS DOUBLE)) AS BIGINT) % 10"
        )
    return "CASE " + " ".join(steps) + " ELSE CAST(NULL AS BIGINT) END"


_Q681_SQL = f"""
    WITH {_cents_cte()},
    d2s AS (
      SELECT {_second_digit_expr("c")} AS d2
      FROM cents WHERE c >= 10
    ),
    obs AS (
      SELECT d2, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM d2s WHERE d2 IS NOT NULL
      GROUP BY d2
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT /*+ BROADCAST(t) */ o.d2 AS second_digit, o.n_obs,
           ({_B2_CASE.replace("d2", "o.d2")}) AS expected_p,
           CAST(o.n_obs AS DOUBLE) / CAST(t.n AS DOUBLE) AS observed_p,
           ROUND((CAST(o.n_obs AS DOUBLE)
                  - CAST(t.n AS DOUBLE)
                    * ({_B2_CASE.replace("d2", "o.d2")}))
                 * (CAST(o.n_obs AS DOUBLE)
                    - CAST(t.n AS DOUBLE)
                      * ({_B2_CASE.replace("d2", "o.d2")}))
                 / (CAST(t.n AS DOUBLE)
                    * ({_B2_CASE.replace("d2", "o.d2")})), 6)
             AS chi2_contribution
    FROM obs o CROSS JOIN tot t
    ORDER BY o.d2
    """


@query("q681_benford_second_digit", oracle=_Q681_SQL)
def q681_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford second-digit audit of order amounts: observed vs the
    second-digit law (expected probabilities inlined as Python float
    literals, §11), with per-digit chi-square contributions. The
    second digit comes from a magnitude CASE ladder (FLOOR-division
    then %), no strings — identical on both engines by construction."""
    _views(spark, sf_dir)
    return spark.sql(_Q681_SQL)


# ---------------------------------------------------------------------------
# q682 — cents-endings uniformity

_Q682_SQL = f"""
    WITH {_cents_cte()},
    ends AS (
      SELECT CAST(c % CAST(100 AS BIGINT) AS BIGINT) AS ending
      FROM cents
    ),
    obs AS (
      SELECT ending, CAST(COUNT(*) AS BIGINT) AS n_obs
      FROM ends GROUP BY ending
    ),
    tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
    SELECT /*+ BROADCAST(t) */ o.ending, o.n_obs,
           CAST(o.n_obs AS DOUBLE) * CAST(100 AS DOUBLE)
             / CAST(t.n AS DOUBLE) AS lift_vs_uniform,
           ROUND((CAST(o.n_obs AS DOUBLE)
                  - CAST(t.n AS DOUBLE) / CAST(100 AS DOUBLE))
                 * (CAST(o.n_obs AS DOUBLE)
                    - CAST(t.n AS DOUBLE) / CAST(100 AS DOUBLE))
                 / (CAST(t.n AS DOUBLE) / CAST(100 AS DOUBLE)), 6)
             AS chi2_contribution
    FROM obs o CROSS JOIN tot t
    ORDER BY o.n_obs DESC, o.ending ASC
    LIMIT 15
    """


@query("q682_cents_endings", oracle=_Q682_SQL)
def q682_cents_endings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fifteen most common cents-endings (amount mod 100) with
    their lift over the uniform 1% baseline and chi-square
    contribution — fabricated or psychologically-priced amounts
    concentrate on favorite endings. Top-k by exact count with the
    ending as tie-break."""
    _views(spark, sf_dir)
    return spark.sql(_Q682_SQL)


# ---------------------------------------------------------------------------
# q683 — round-number bias

_Q683_SQL = f"""
    WITH {_cents_cte()},
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM cents),
    pats AS (
      SELECT 'ends_00' AS pattern,
             CAST(1 AS DOUBLE) / CAST(100 AS DOUBLE) AS baseline_p,
             CAST(SUM(CASE WHEN c % 100 = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_obs
      FROM cents
      UNION ALL
      SELECT 'ends_50',
             CAST(1 AS DOUBLE) / CAST(100 AS DOUBLE),
             CAST(SUM(CASE WHEN c % 100 = 50 THEN 1 ELSE 0 END) AS BIGINT)
      FROM cents
      UNION ALL
      SELECT 'ends_95',
             CAST(1 AS DOUBLE) / CAST(100 AS DOUBLE),
             CAST(SUM(CASE WHEN c % 100 = 95 THEN 1 ELSE 0 END) AS BIGINT)
      FROM cents
      UNION ALL
      SELECT 'ends_99',
             CAST(1 AS DOUBLE) / CAST(100 AS DOUBLE),
             CAST(SUM(CASE WHEN c % 100 = 99 THEN 1 ELSE 0 END) AS BIGINT)
      FROM cents
      UNION ALL
      SELECT 'whole_hundred_dollars',
             CAST(1 AS DOUBLE) / CAST(10000 AS DOUBLE),
             CAST(SUM(CASE WHEN c % 10000 = 0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM cents
    )
    SELECT /*+ BROADCAST(t) */ p.pattern, p.n_obs,
           CAST(p.n_obs AS DOUBLE) / CAST(t.n AS DOUBLE) AS observed_p,
           p.baseline_p,
           CAST(p.n_obs AS DOUBLE) / CAST(t.n AS DOUBLE) / p.baseline_p
             AS lift
    FROM pats p CROSS JOIN tot t
    ORDER BY p.pattern
    """


@query("q683_round_number_bias", oracle=_Q683_SQL)
def q683_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-number bias screens: the share of amounts ending .00,
    .50, .95, .99 and of whole-hundred-dollar amounts, each against
    its uniform baseline. Lift far above 1 marks human-chosen (or
    fabricated) numbers; organic composite amounts sit near 1."""
    _views(spark, sf_dir)
    return spark.sql(_Q683_SQL)


# ---------------------------------------------------------------------------
# q684 — duplicate-amount clustering

_Q684_SQL = f"""
    WITH {_cents_cte()},
    dupes AS (
      SELECT c, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM cents GROUP BY c
    )
    SELECT CAST(c AS DOUBLE) / CAST(100 AS DOUBLE) AS amount_dollars,
           n_orders
    FROM dupes
    WHERE n_orders >= 2
    ORDER BY n_orders DESC, c ASC
    LIMIT 10
    """


@query("q684_duplicate_amounts", oracle=_Q684_SQL)
def q684_duplicate_amounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate amount clusters: the ten amounts shared by the
    most orders. High-multiplicity exact duplicates in a continuous
    amount domain are the classic split-transaction / copy-paste
    fabrication signature. One combiner-friendly groupBy + top-k."""
    _views(spark, sf_dir)
    return spark.sql(_Q684_SQL)


# ---------------------------------------------------------------------------
# q685 — threshold-straddle audit

_THRESHOLDS = (10_000_000, 20_000_000, 30_000_000)  # cents: $100k/$200k/$300k
_EPS = 500_000  # $5k window each side


def _straddle_branch(i: int, t: int) -> str:
    head = "SELECT" if i == 0 else "SELECT"
    alias = " AS threshold_dollars" if i == 0 else ""
    alias_b = " AS n_just_below" if i == 0 else ""
    alias_a = " AS n_just_above" if i == 0 else ""
    return f"""{head} CAST({t // 100} AS BIGINT){alias},
             CAST(SUM(CASE WHEN c >= CAST({t - _EPS} AS BIGINT)
                            AND c < CAST({t} AS BIGINT)
                      THEN 1 ELSE 0 END) AS BIGINT){alias_b},
             CAST(SUM(CASE WHEN c >= CAST({t} AS BIGINT)
                            AND c < CAST({t + _EPS} AS BIGINT)
                      THEN 1 ELSE 0 END) AS BIGINT){alias_a}
      FROM cents"""


_Q685_SQL = f"""
    WITH {_cents_cte()},
    bands AS (
      {" UNION ALL ".join(_straddle_branch(i, t) for i, t in enumerate(_THRESHOLDS))}
    )
    SELECT threshold_dollars, n_just_below, n_just_above,
           CASE WHEN n_just_above = 0 THEN CAST(NULL AS DOUBLE)
                ELSE CAST(n_just_below AS DOUBLE)
                     / CAST(n_just_above AS DOUBLE)
           END AS below_over_above
    FROM bands
    ORDER BY threshold_dollars
    """


@query("q685_threshold_straddle", oracle=_Q685_SQL)
def q685_threshold_straddle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Authorization-threshold gaming screen: order counts in the $5k
    band just below vs just above $100k/$200k/$300k. A below/above
    ratio far above 1 is the signature of amounts engineered to duck
    an approval limit. Exact integer band comparisons; one scan."""
    _views(spark, sf_dir)
    return spark.sql(_Q685_SQL)
