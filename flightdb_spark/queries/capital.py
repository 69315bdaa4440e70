"""Capital-budgeting batch 131 (q721-q725) — the investment-appraisal
arithmetic a finance/planning pipeline runs. Each brand is a project:
the stylized outlay is 3x its 1995 revenue (paid up front), the
inflows are its 1996-2000 revenues — exact BIGINT cents throughout:

- q721 NPV census: per discount rate (5/10/15/20%), how many brand
  projects clear zero and the aggregate NPV — the hurdle-rate curve;
- q722 IRR by grid bracketing: the last 1%-step rate (0..60%) where
  NPV stays nonnegative per brand — conventional cashflows make NPV
  monotone in r, so the bracket is exact at grid resolution;
- q723 payback periods: undiscounted and 10%-discounted payback year
  per brand via an explicit 5-step CASE ladder;
- q724 profitability index top-10: PV(inflows)/outlay at 10%;
- q725 ranking stability: exact Kendall concordance between the
  NPV@5% and NPV@20% project rankings — does the hurdle rate change
  which projects win?

100 TB shape: one fact pass to (brand, year) cents; everything else
runs on the 25-row wide pivot (x 61-row broadcast rate grid at
worst). Discount factors are Python e0-literals (§11) or exact
integer-ratio doubles built in straight-line SQL; NPV per row is one
fixed-order polynomial expression; cross-brand comparisons quantize
NPVs to BIGINT cents first (FLOOR(x+0.5)), so ranking logic is pure
integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

RATES_PCT = (5, 10, 15, 20)
OUTLAY_MULT = 3  # outlay = 3x 1995 revenue

# 10% discount factors for t = 1..5 as e0 literals (§11 + q681 lesson)
_F10 = {t: repr(1.0 / (1.1 ** t)) + "e0" for t in range(1, 6)}


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _wide_cte() -> str:
    """Per-brand cashflow pivot: c0 (outlay, negative) and c1..c5."""
    years = ", ".join(
        f"CAST(SUM(CASE WHEN yr = {1995 + t} THEN cents ELSE CAST(0 AS BIGINT) END)"
        f" AS BIGINT) AS r{t}"
        for t in range(6)
    )
    return f"""cells AS (
      SELECT p.p_brand AS brand,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= DATE '1995-01-01'
        AND l.l_shipdate < DATE '2001-01-01'
      GROUP BY p.p_brand, CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
    ),
    wide AS (
      SELECT brand, {years}
      FROM (SELECT brand, yr, cents FROM cells) base
      GROUP BY brand
    ),
    flows AS (
      SELECT brand,
             CAST(-{OUTLAY_MULT} AS BIGINT) * r0 AS c0,
             r1 AS c1, r2 AS c2, r3 AS c3, r4 AS c4, r5 AS c5
      FROM wide
    )"""


def _npv_expr(x: str) -> str:
    """Fixed-order NPV polynomial in the discount factor x = 1/(1+r),
    dollars: c0 + c1 x + c2 x^2 + ... (Horner, one order, both engines)."""
    return (
        f"(CAST(c0 AS DOUBLE) + {x} * (CAST(c1 AS DOUBLE)"
        f" + {x} * (CAST(c2 AS DOUBLE) + {x} * (CAST(c3 AS DOUBLE)"
        f" + {x} * (CAST(c4 AS DOUBLE) + {x} * CAST(c5 AS DOUBLE))))))"
        f" / CAST(100 AS DOUBLE)"
    )


# ---------------------------------------------------------------------------
# q721 — NPV census over hurdle rates

_RATE_GRID = " UNION ALL ".join(
    f"SELECT {k} AS rate_pct" if i == 0 else f"SELECT {k}"
    for i, k in enumerate(RATES_PCT)
)

_X_FROM_PCT = "(CAST(100 AS DOUBLE) / (CAST(100 AS DOUBLE) + CAST(g.rate_pct AS DOUBLE)))"

_NPV_CENSUS_SQL = f"""
    WITH {_wide_cte()},
    scored AS (
      SELECT /*+ BROADCAST(g) */ g.rate_pct, f.brand,
             CAST(FLOOR({_npv_expr(_X_FROM_PCT)} * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS npv_cents
      FROM flows f CROSS JOIN ({_RATE_GRID}) g
    )
    SELECT CAST(rate_pct AS BIGINT) AS rate_pct,
           CAST(COUNT(*) AS BIGINT) AS n_projects,
           CAST(SUM(CASE WHEN npv_cents > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_positive,
           CAST(SUM(npv_cents) AS DOUBLE) / CAST(100 AS DOUBLE)
             AS total_npv_dollars
    FROM scored
    GROUP BY rate_pct
    ORDER BY rate_pct
    """


@query("q721_npv_census", oracle=_NPV_CENSUS_SQL)
def q721_npv_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hurdle-rate curve: per discount rate, how many brand
    projects have positive NPV and the portfolio's aggregate NPV. NPV
    is one fixed-order Horner polynomial in x = 100/(100+r) (exact
    integer-ratio double), quantized to BIGINT cents before any
    aggregation (q666 lesson)."""
    _views(spark, sf_dir)
    return spark.sql(_NPV_CENSUS_SQL)


# ---------------------------------------------------------------------------
# q722 — IRR by grid bracketing

_IRR_GRID = " UNION ALL ".join(
    f"SELECT {k} AS rate_pct" if k == 0 else f"SELECT {k}"
    for k in range(0, 61)
)

_IRR_SQL = f"""
    WITH {_wide_cte()},
    scored AS (
      SELECT /*+ BROADCAST(g) */ f.brand, g.rate_pct,
             CAST(FLOOR({_npv_expr(_X_FROM_PCT)} * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS npv_cents
      FROM flows f CROSS JOIN ({_IRR_GRID}) g
    )
    SELECT brand,
           CAST(MAX(CASE WHEN npv_cents >= 0 THEN rate_pct
                    ELSE -1 END) AS BIGINT) AS irr_pct_floor,
           CAST(MAX(CASE WHEN rate_pct = 0 THEN npv_cents END) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS npv_at_0,
           CAST(MAX(CASE WHEN rate_pct = 60 THEN npv_cents END) AS DOUBLE)
             / CAST(100 AS DOUBLE) AS npv_at_60
    FROM scored
    GROUP BY brand
    ORDER BY irr_pct_floor DESC, brand ASC
    LIMIT 10
    """


@query("q722_irr_bracket", oracle=_IRR_SQL)
def q722_irr_bracket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IRR bracketed on a 0..60% integer-percent grid: conventional
    cashflows (one sign change) make NPV monotone decreasing in r, so
    the greatest nonnegative-NPV rate IS the IRR floor at 1%
    resolution — an integer MAX over quantized NPVs, no root-finder,
    no pow(). Top-10 projects by IRR."""
    _views(spark, sf_dir)
    return spark.sql(_IRR_SQL)


# ---------------------------------------------------------------------------
# q723 — payback periods

_CUM = [
    "c0",
    "c0 + c1",
    "c0 + c1 + c2",
    "c0 + c1 + c2 + c3",
    "c0 + c1 + c2 + c3 + c4",
    "c0 + c1 + c2 + c3 + c4 + c5",
]


def _payback_case(cums) -> str:
    branches = " ".join(
        f"WHEN {cum} >= 0 THEN CAST({t} AS BIGINT)"
        for t, cum in enumerate(cums)
    )
    return f"CASE {branches} ELSE CAST(NULL AS BIGINT) END"


_DCUM = [
    "dc0",
    "dc0 + dc1",
    "dc0 + dc1 + dc2",
    "dc0 + dc1 + dc2 + dc3",
    "dc0 + dc1 + dc2 + dc3 + dc4",
    "dc0 + dc1 + dc2 + dc3 + dc4 + dc5",
]

_PAYBACK_SQL = f"""
    WITH {_wide_cte()},
    disc AS (
      SELECT brand, c0, c1, c2, c3, c4, c5,
             c0 AS dc0,
             CAST(FLOOR(CAST(c1 AS DOUBLE) * CAST({_F10[1]} AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dc1,
             CAST(FLOOR(CAST(c2 AS DOUBLE) * CAST({_F10[2]} AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dc2,
             CAST(FLOOR(CAST(c3 AS DOUBLE) * CAST({_F10[3]} AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dc3,
             CAST(FLOOR(CAST(c4 AS DOUBLE) * CAST({_F10[4]} AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dc4,
             CAST(FLOOR(CAST(c5 AS DOUBLE) * CAST({_F10[5]} AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS dc5
      FROM flows
    )
    SELECT brand,
           {_payback_case(_CUM)} AS payback_year,
           {_payback_case(_DCUM)} AS discounted_payback_year
    FROM disc
    ORDER BY brand
    """


@query("q723_payback_periods", oracle=_PAYBACK_SQL)
def q723_payback_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undiscounted and 10%-discounted payback year per brand project
    (NULL = never pays back inside the horizon): an explicit 6-branch
    cumulative CASE ladder over exact integer cents; discounted flows
    quantize per year via FLOOR(c * f + 0.5) with e0-literal factors."""
    _views(spark, sf_dir)
    return spark.sql(_PAYBACK_SQL)


# ---------------------------------------------------------------------------
# q724 — profitability index top-10

_PI_SQL = f"""
    WITH {_wide_cte()},
    pv AS (
      SELECT brand,
             CAST(FLOOR(CAST(c1 AS DOUBLE) * CAST({_F10[1]} AS DOUBLE)
                  + CAST(c2 AS DOUBLE) * CAST({_F10[2]} AS DOUBLE)
                  + CAST(c3 AS DOUBLE) * CAST({_F10[3]} AS DOUBLE)
                  + CAST(c4 AS DOUBLE) * CAST({_F10[4]} AS DOUBLE)
                  + CAST(c5 AS DOUBLE) * CAST({_F10[5]} AS DOUBLE)
                  + CAST(0.5 AS DOUBLE)) AS BIGINT) AS pv_in_cents,
             -c0 AS outlay_cents
      FROM flows
    )
    SELECT brand,
           CAST(pv_in_cents AS DOUBLE) / CAST(100 AS DOUBLE)
             AS pv_inflows_dollars,
           CAST(outlay_cents AS DOUBLE) / CAST(100 AS DOUBLE)
             AS outlay_dollars,
           CAST(pv_in_cents AS DOUBLE) / CAST(outlay_cents AS DOUBLE)
             AS profitability_index
    FROM pv
    ORDER BY CAST(pv_in_cents AS DOUBLE) / CAST(outlay_cents AS DOUBLE)
               DESC,
             brand ASC
    LIMIT 10
    """


@query("q724_profitability_index", oracle=_PI_SQL)
def q724_profitability_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profitability index (PV of inflows / outlay, 10% rate) top-10:
    the capital-rationing ranking. PV quantizes once to BIGINT cents;
    the index is an unrounded exact-integer rational; ties broken by
    brand."""
    _views(spark, sf_dir)
    return spark.sql(_PI_SQL)


# ---------------------------------------------------------------------------
# q725 — ranking stability across hurdle rates

_KENDALL_SQL = f"""
    WITH {_wide_cte()},
    scored AS (
      SELECT brand,
             CAST(FLOOR({_npv_expr("(CAST(100 AS DOUBLE) / CAST(105 AS DOUBLE))")}
                        * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS npv5,
             CAST(FLOOR({_npv_expr("(CAST(100 AS DOUBLE) / CAST(120 AS DOUBLE))")}
                        * CAST(100 AS DOUBLE)
                        + CAST(0.5 AS DOUBLE)) AS BIGINT) AS npv20
      FROM flows
    ),
    pairs AS (
      SELECT /*+ BROADCAST(b) */
             CASE WHEN (a.npv5 - b.npv5) * (a.npv20 - b.npv20) > 0
                  THEN 1 ELSE 0 END AS concordant,
             CASE WHEN (a.npv5 - b.npv5) * (a.npv20 - b.npv20) < 0
                  THEN 1 ELSE 0 END AS discordant
      FROM scored a JOIN scored b ON a.brand < b.brand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(concordant) AS BIGINT) AS concordant,
           CAST(SUM(discordant) AS BIGINT) AS discordant,
           CAST(SUM(concordant) - SUM(discordant) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS kendall_tau_a
    FROM pairs
    """


@query("q725_ranking_stability", oracle=_KENDALL_SQL)
def q725_ranking_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does the hurdle rate reorder the portfolio? Exact Kendall
    tau-a between the NPV@5% and NPV@20% project rankings, computed
    over all brand pairs (bounded 25^2) with pure integer sign tests
    on cent-quantized NPVs. tau near 1 = ranking is rate-robust."""
    _views(spark, sf_dir)
    return spark.sql(_KENDALL_SQL)
