"""Actuarial loss-reserving batch 119 (q661-q665) — the chain-ladder
machinery an insurance/claims (or any fulfilment-lag) pipeline runs,
with orders as the origin cohort and shipments as the payments:

- q661 run-off triangle: origin year x development year, incremental
  and cumulative "paid" cents (exact BIGINT), valuation date
  2000-12-31 (later diagonals are the holdout);
- q662 age-to-age (development) factors: volume-weighted all-years
  factors f_d = sum C(o,d+1) / sum C(o,d) — one terminal division per
  dev age over exact integer sums;
- q663 chain-ladder ultimates: CDF-to-ultimate per origin as a
  product of the remaining rounded factors (ln-sum DECIMAL contract,
  DETERMINISM.md §14/q658), ultimate and IBNR reserve per origin;
- q664 Bornhuetter-Ferguson: booked order value as the prior,
  BF ultimate = paid + prior x (1 - 1/CDF), against the pure CL
  ultimate — the credibility blend actuaries actually book;
- q665 calendar-year diagonals: observed payment diagonals plus the
  chain-ladder forecast of the NEXT diagonal (calendar 2001), the
  payment-pattern audit that catches calendar-year inflation.

100 TB shape: the whole batch reduces the fact table ONCE to a
(origin, dev) triangle bounded by calendar years squared (~21 cells
here, ~= (years)^2/2 at any scale) — every subsequent join, window,
and factor product runs on that bounded table. The windows partition
by origin (bounded, DETERMINISM.md §15); inequality factor joins
carry a BROADCAST hint so Spark plans BNLJ over the tiny factor
table, never a shuffle.

Determinism: paid amounts are exact integer cents end-to-end;
factors are ONE double division of integer sums rounded at 6 dp;
factor products go through ROUND(ln, 9) -> DECIMAL(38,9) sums ->
one exp (§5/§14); every shared-SQL division carries an explicit
CAST(... AS DOUBLE) (round-6 dialect lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

VALUATION = "DATE '2001-01-01'"  # exclusive: triangle as of 2000-12-31
FIRST_ORIGIN = 1995
LAST_ORIGIN = 2000


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _tri_cte() -> str:
    """(origin, dev) -> exact incremental paid cents; dev >= 0 by the
    shipdate >= orderdate filter, observable cells only (valuation)."""
    return f"""tri AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS origin,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
               - CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS dev,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS paid_cents
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
        AND l.l_shipdate < {VALUATION}
        AND o.o_orderdate >= DATE '{FIRST_ORIGIN}-01-01'
        AND o.o_orderdate < {VALUATION}
      GROUP BY CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT),
               CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT)
                 - CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT)
    )"""


def _cum_cte() -> str:
    """Cumulative paid per origin — window over the bounded dev domain
    (<= 6 cells per origin, DETERMINISM.md §15)."""
    return f"""{_tri_cte()},
    cum AS (
      SELECT origin, dev, paid_cents,
             CAST(SUM(paid_cents) OVER (PARTITION BY origin ORDER BY dev)
                  AS BIGINT) AS cum_cents
      FROM tri
    )"""


def _fac_cte() -> str:
    """Volume-weighted all-years age-to-age factors over exact sums."""
    return f"""{_cum_cte()},
    fac AS (
      SELECT a.dev AS from_dev,
             CAST(COUNT(*) AS BIGINT) AS n_origins,
             CAST(SUM(a.cum_cents) AS BIGINT) AS cur_cents,
             CAST(SUM(b.cum_cents) AS BIGINT) AS next_cents,
             ROUND(CAST(SUM(b.cum_cents) AS DOUBLE)
                   / CAST(SUM(a.cum_cents) AS DOUBLE), 6) AS ata_factor
      FROM cum a JOIN cum b ON b.origin = a.origin AND b.dev = a.dev + 1
      GROUP BY a.dev
    )"""


def _cdf_cte() -> str:
    """Latest diagonal + CDF-to-ultimate: product of remaining factors
    via the ln-sum DECIMAL contract; mature origins get CDF = 1."""
    return f"""{_fac_cte()},
    latest AS (
      SELECT origin, dev AS maturity, cum_cents AS latest_cents
      FROM cum WHERE dev = {LAST_ORIGIN} - origin
    ),
    cdf AS (
      SELECT /*+ BROADCAST(f) */ m.origin, m.maturity, m.latest_cents,
             ROUND(CAST(exp(COALESCE(
                 SUM(CAST(ROUND(ln(f.ata_factor), 9) AS DECIMAL(38,9))),
                 0)) AS DOUBLE), 6) AS cdf_to_ultimate
      FROM latest m LEFT JOIN fac f ON f.from_dev >= m.maturity
      GROUP BY m.origin, m.maturity, m.latest_cents
    )"""


# ---------------------------------------------------------------------------
# q661 — run-off triangle

_TRIANGLE_SQL = f"""
    WITH {_cum_cte()}
    SELECT origin, dev, paid_cents, cum_cents
    FROM cum
    ORDER BY origin, dev
    """


@query("q661_runoff_triangle", oracle=_TRIANGLE_SQL)
def q661_runoff_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cumulative run-off triangle: origin cohort year x
    development year, incremental and cumulative paid cents as of the
    2000-12-31 valuation date. One pass over the fact table; the
    cumulative window runs on <= 6 cells per origin."""
    _views(spark, sf_dir)
    return spark.sql(_TRIANGLE_SQL)


# ---------------------------------------------------------------------------
# q662 — age-to-age factors

_ATA_SQL = f"""
    WITH {_fac_cte()}
    SELECT from_dev, from_dev + 1 AS to_dev, n_origins,
           cur_cents, next_cents, ata_factor
    FROM fac
    ORDER BY from_dev
    """


@query("q662_age_to_age_factors", oracle=_ATA_SQL)
def q662_age_to_age_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted all-years age-to-age development factors:
    f_d = sum_o C(o,d+1) / sum_o C(o,d) over origins observed at both
    ages — exact integer sums, one terminal division per age. The
    dev+1 self-join runs on the bounded triangle, not the facts."""
    _views(spark, sf_dir)
    return spark.sql(_ATA_SQL)


# ---------------------------------------------------------------------------
# q663 — chain-ladder ultimates + IBNR

_CL_SQL = f"""
    WITH {_cdf_cte()}
    SELECT origin, maturity, latest_cents, cdf_to_ultimate,
           ROUND(CAST(latest_cents AS DOUBLE) * cdf_to_ultimate
                 / CAST(100 AS DOUBLE), 2) AS ultimate_dollars,
           ROUND(CAST(latest_cents AS DOUBLE) * cdf_to_ultimate
                 / CAST(100 AS DOUBLE)
                 - CAST(latest_cents AS DOUBLE) / CAST(100 AS DOUBLE), 2)
             AS ibnr_dollars
    FROM cdf
    ORDER BY origin
    """


@query("q663_chain_ladder_ultimates", oracle=_CL_SQL)
def q663_chain_ladder_ultimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chain-ladder projection: per origin, the latest cumulative paid,
    the CDF to ultimate (product of remaining age-to-age factors via
    the ln-sum DECIMAL contract — §14; the 1995 cohort is mature and
    pins CDF = 1 through the COALESCE), the projected ultimate, and
    the IBNR reserve. The factor join is a BROADCAST BNLJ over <= 5
    factor rows."""
    _views(spark, sf_dir)
    return spark.sql(_CL_SQL)


# ---------------------------------------------------------------------------
# q664 — Bornhuetter-Ferguson vs chain-ladder

_BF_SQL = f"""
    WITH {_cdf_cte()},
    prior AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS origin,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS booked_cents
      FROM orders
      WHERE o_orderdate >= DATE '{FIRST_ORIGIN}-01-01'
        AND o_orderdate < {VALUATION}
      GROUP BY CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)
    )
    SELECT c.origin,
           ROUND(CAST(c.latest_cents AS DOUBLE) / CAST(100 AS DOUBLE), 2)
             AS paid_dollars,
           ROUND(CAST(p.booked_cents AS DOUBLE) / CAST(100 AS DOUBLE), 2)
             AS prior_dollars,
           ROUND(CAST(c.latest_cents AS DOUBLE) * c.cdf_to_ultimate
                 / CAST(100 AS DOUBLE), 2) AS cl_ultimate,
           ROUND(CAST(c.latest_cents AS DOUBLE) / CAST(100 AS DOUBLE)
                 + CAST(p.booked_cents AS DOUBLE) / CAST(100 AS DOUBLE)
                   * (CAST(1 AS DOUBLE)
                      - CAST(1 AS DOUBLE) / c.cdf_to_ultimate), 2)
             AS bf_ultimate,
           ROUND(CAST(p.booked_cents AS DOUBLE) / CAST(100 AS DOUBLE)
                 * (CAST(1 AS DOUBLE)
                    - CAST(1 AS DOUBLE) / c.cdf_to_ultimate), 2)
             AS bf_reserve
    FROM cdf c JOIN prior p ON p.origin = c.origin
    ORDER BY c.origin
    """


@query("q664_bornhuetter_ferguson", oracle=_BF_SQL)
def q664_bornhuetter_ferguson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bornhuetter-Ferguson reserves: the booked order value of each
    origin year as the a-priori ultimate, blended with the paid
    chain-ladder pattern — BF ultimate = paid + prior x (1 - 1/CDF).
    Immature cohorts lean on the prior, mature ones on the paid data;
    the cl_ultimate column shows the divergence the blend dampens."""
    _views(spark, sf_dir)
    return spark.sql(_BF_SQL)


# ---------------------------------------------------------------------------
# q665 — calendar-year diagonals + next-diagonal forecast

_DIAG_SQL = f"""
    WITH {_fac_cte()},
    latest AS (
      SELECT origin, dev AS maturity, cum_cents AS latest_cents
      FROM cum WHERE dev = {LAST_ORIGIN} - origin
    ),
    observed AS (
      SELECT origin + dev AS cal_year,
             CAST(SUM(paid_cents) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM tri
      GROUP BY origin + dev
    ),
    forecast AS (
      SELECT /*+ BROADCAST(f) */
             CAST({LAST_ORIGIN} + 1 AS BIGINT) AS cal_year,
             CAST(SUM(CAST(FLOOR(CAST(m.latest_cents AS DOUBLE)
                                 * (f.ata_factor - CAST(1 AS DOUBLE))
                                 + CAST(0.5 AS DOUBLE))
                           AS BIGINT)) AS BIGINT) AS cents,
             CAST(COUNT(*) AS BIGINT) AS n_cells
      FROM latest m JOIN fac f ON f.from_dev = m.maturity
    )
    SELECT cal_year, cents, n_cells,
           CAST(0 AS BIGINT) AS is_forecast
    FROM observed
    UNION ALL
    SELECT cal_year, cents, n_cells,
           CAST(1 AS BIGINT) AS is_forecast
    FROM forecast
    ORDER BY cal_year
    """


@query("q665_calendar_diagonals", oracle=_DIAG_SQL)
def q665_calendar_diagonals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-year payment diagonals (origin + dev = payment year)
    with the chain-ladder forecast of the NEXT diagonal: expected
    calendar-2001 payments = sum over open origins of latest paid x
    (f_maturity - 1), floored to whole cents per origin (FLOOR(x+0.5),
    round-6 lesson — never ROUND on a double). The diagonal view is
    the standard audit for calendar-year effects chain-ladder assumes
    away."""
    _views(spark, sf_dir)
    return spark.sql(_DIAG_SQL)
