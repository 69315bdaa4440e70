"""Revenue-management batch 183 (q982-q986) — the quantity-based RM
stack (Littlewood 1972; Belobaba's EMSR-b 1989; binomial overbooking):
fare-class protection levels and overbooking pads from EMPIRICAL
demand, the math airlines/hotels/clouds run to ration capacity.
Demand is the daily order count per priority class; the fare schedule
is a literal (class -> cents) table.

Everything is exact: empirical survival probabilities never become
doubles — every "P(D >= y) >= fare ratio" test is an integer
cross-product — and the overbooking expectations are exact binomial
sums with literal C(n,k) and 9^k tables in DECIMAL(38) (p_show = 9/10
rational), divided once at the end for display.

- q982 per-class daily-demand profile: exact order-statistic
  min/median/max and mean demand (no percentile_approx);
- q983 Littlewood's rule (2 classes): the largest protection y with
  count(days D_full >= y) * f_full > n_days * f_disc, plus the
  resulting booking limit for a literal capacity;
- q984 empirical EMSR-b (3 classes): the pooled upper-class
  protection with demand-weighted fare, all cross-multiplied;
- q985 overbooking pad: expected boarded pax / bumped pax / net
  revenue over a virtual-capacity grid by EXACT Binomial(b, 9/10)
  sums — the argmax row is the pad an RM system books to;
- q986 bid-price curve: the marginal value of one more seat at fixed
  bookings (exact first differences of expected boardings).

100 TB shape: ONE orders pass to the (class, day) count table
(calendar x 5 rows); everything downstream is literal-bounded grids
(protection candidates = observed demand levels; binomial grids are
literal). The binomial tables are constants, not data.

Determinism: integer demand counts; cross-product comparisons;
DECIMAL(38) exact binomial numerators (q245 widening rule); terminal
double division only for display columns.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# literal fare schedule, cents (full -> deep discount)
FARES = {
    "1-URGENT": 50_000,
    "2-HIGH": 40_000,
    "3-MEDIUM": 30_000,
    "4-NOT SPECIFIED": 20_000,
    "5-LOW": 10_000,
}
CAPACITY = 120
OB_CAP = 20  # physical seats in the overbooking model
OB_MAX_EXTRA = 10  # virtual capacity grid: CAP .. CAP+10
SHOW_NUM, SHOW_DEN = 9, 10  # p_show = 9/10
BUMP_PENALTY = 80_000  # cents per involuntary bump


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "orders")).createOrReplaceTempView(
        "orders"
    )


def _demand_cte() -> str:
    return """demand AS (
      SELECT o_orderpriority AS cls,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS d
      FROM orders GROUP BY cls, day
    )"""


_Q982_SQL = f"""
    WITH {_demand_cte()},
    ranked AS (
      SELECT cls, day, d,
             ROW_NUMBER() OVER (PARTITION BY cls ORDER BY d, day) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY cls) AS BIGINT) AS n
      FROM demand
    )
    SELECT cls,
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(MIN(d) AS BIGINT) AS min_d,
           -- lower median = the floor((n+1)/2)-th smallest, selected by
           -- the exact integer predicate 2*rn IN (n, n+1) — `/` is FLOAT
           -- division on BOTH engines, so (n+1)/2 would match nothing
           CAST(MAX(CASE WHEN 2 * rn = n OR 2 * rn = n + 1 THEN d END)
             AS BIGINT) AS median_d,
           CAST(MAX(d) AS BIGINT) AS max_d,
           CAST(SUM(d) AS BIGINT) AS total_d,
           CAST(SUM(d) AS DOUBLE) / MAX(n) AS mean_d
    FROM ranked GROUP BY cls ORDER BY cls
    """


@query("q982_demand_profile", oracle=_Q982_SQL)
def q982_demand_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class daily-demand profile with EXACT order statistics —
    the median is the ceil(n/2)-th smallest by (d, day) rank, never a
    percentile_approx sketch — the input table every protection-level
    rule below reads."""
    _views(spark, sf_dir)
    return spark.sql(_Q982_SQL)


_FULL, _MID, _DISC = "1-URGENT", "3-MEDIUM", "5-LOW"


def _littlewood_sql() -> str:
    f1, f5 = FARES[_FULL], FARES[_DISC]
    return f"""
    WITH {_demand_cte()},
    d1 AS (SELECT day, d FROM demand WHERE cls = '{_FULL}'),
    n1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d1),
    cand AS (
      SELECT DISTINCT d AS y FROM d1 UNION SELECT CAST(0 AS BIGINT)
    ),
    surv AS (
      SELECT c.y,
             CAST((SELECT COUNT(*) FROM d1 WHERE d1.d >= c.y) AS BIGINT)
               AS n_ge
      FROM cand c
    ),
    kept AS (
      SELECT /*+ BROADCAST(n1) */ s.y, s.n_ge, n1.n
      FROM surv s CROSS JOIN n1
      WHERE s.n_ge * {f1} > n1.n * {f5}
    )
    SELECT CAST(MAX(y) AS BIGINT) AS protection_y,
           CAST({CAPACITY} - MAX(y) AS BIGINT) AS discount_booking_limit,
           CAST({f1} AS BIGINT) AS full_fare_cents,
           CAST({f5} AS BIGINT) AS discount_fare_cents
    FROM kept
    """


@query("q983_littlewood_rule", oracle=_littlewood_sql())
def q983_littlewood_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Littlewood's rule on the empirical demand distribution:
    protect y full-fare seats while P(D_full >= y) > f_disc/f_full —
    tested as the integer cross-product count*f1 > n*f5, never a
    double probability. The discount booking limit is capacity minus
    the protection."""
    _views(spark, sf_dir)
    return spark.sql(_littlewood_sql())


def _emsrb_sql() -> str:
    f1, f3, f5 = FARES[_FULL], FARES[_MID], FARES[_DISC]
    return f"""
    WITH {_demand_cte()},
    upper2 AS (
      SELECT day,
             CAST(SUM(CASE WHEN cls = '{_FULL}' THEN d ELSE 0 END)
               + SUM(CASE WHEN cls = '{_MID}' THEN d ELSE 0 END)
               AS BIGINT) AS du
      FROM demand WHERE cls IN ('{_FULL}', '{_MID}')
      GROUP BY day
    ),
    sums AS (
      SELECT CAST(SUM(CASE WHEN cls = '{_FULL}' THEN d ELSE 0 END)
               AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN cls = '{_MID}' THEN d ELSE 0 END)
               AS BIGINT) AS s3
      FROM demand WHERE cls IN ('{_FULL}', '{_MID}')
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM upper2),
    cand AS (
      SELECT DISTINCT du AS y FROM upper2 UNION SELECT CAST(0 AS BIGINT)
    ),
    surv AS (
      SELECT c.y,
             CAST((SELECT COUNT(*) FROM upper2 u WHERE u.du >= c.y)
               AS BIGINT) AS n_ge
      FROM cand c
    ),
    -- EMSR-b: weighted fare wf = (f1*S1 + f3*S3)/(S1+S3); protect while
    -- P(DU >= y) > f5/wf  <=>  n_ge * (f1*S1 + f3*S3) > n * f5 * (S1+S3)
    kept AS (
      SELECT /*+ BROADCAST(s) BROADCAST(n2) */ v.y
      FROM surv v CROSS JOIN sums s CROSS JOIN nn n2
      WHERE v.n_ge * ({f1} * s.s1 + {f3} * s.s3)
            > n2.n * {f5} * (s.s1 + s.s3)
    )
    SELECT /*+ BROADCAST(s) */
           CAST(MAX(k.y) AS BIGINT) AS pooled_protection,
           CAST({CAPACITY} - MAX(k.y) AS BIGINT) AS discount_limit,
           CAST({f1} AS BIGINT) * s.s1 + CAST({f3} AS BIGINT) * s.s3
             AS weighted_fare_num,
           CAST(s.s1 + s.s3 AS BIGINT) AS weighted_fare_den
    FROM kept k CROSS JOIN sums s
    GROUP BY s.s1, s.s3
    """


@query("q984_emsrb_protection", oracle=_emsrb_sql())
def q984_emsrb_protection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical EMSR-b: the two upper classes pool into one virtual
    class at their demand-weighted fare, and the pooled protection
    against the discount class solves the same Littlewood comparison
    — all integer cross-products (the weighted fare stays a rational
    num/den pair, emitted as such)."""
    _views(spark, sf_dir)
    return spark.sql(_emsrb_sql())


# --- exact binomial overbooking ------------------------------------------------

_B_MAX = OB_CAP + OB_MAX_EXTRA
# literal exact tables: C(b,k) for b in grid, k<=b; 9^k as DECIMAL strings
_CHOOSE = ",\n      ".join(
    f"({b}, {k}, CAST('{math.comb(b, k)}' AS DECIMAL(38,0)))"
    for b in range(OB_CAP, _B_MAX + 1)
    for k in range(0, b + 1)
)
_POW9 = ",\n      ".join(
    f"({k}, CAST('{SHOW_NUM ** k}' AS DECIMAL(38,0)))"
    for k in range(0, _B_MAX + 1)
)
_POW10 = {b: 10 ** b for b in range(OB_CAP, _B_MAX + 1)}


def _ob_expect_cte() -> str:
    """E-table per booking level b: exact DECIMAL numerators of
    expected boarded and bumped pax (denominator 10^b folded in at
    the end)."""
    pow10 = ",\n      ".join(
        f"({b}, CAST('{_POW10[b]}' AS DECIMAL(38,0)))"
        for b in range(OB_CAP, _B_MAX + 1)
    )
    return f"""choosek(b, k, c) AS (VALUES {_CHOOSE}),
    pow9(k, p9) AS (VALUES {_POW9}),
    pow10(b, p10) AS (VALUES {pow10}),
    terms AS (
      SELECT ch.b, ch.k,
             ch.c * p.p9 AS num,
             CAST(LEAST(ch.k, {OB_CAP}) AS DECIMAL(38,0)) AS boarded,
             CAST(GREATEST(ch.k - {OB_CAP}, 0) AS DECIMAL(38,0)) AS bumped
      FROM choosek ch JOIN pow9 p ON p.k = ch.k
    ),
    etab AS (
      SELECT t.b,
             SUM(t.num * t.boarded) AS e_board_num,
             SUM(t.num * t.bumped) AS e_bump_num
      FROM terms t GROUP BY t.b
    )"""


def _q985_sql() -> str:
    fare = FARES[_MID]
    return f"""
    WITH {_ob_expect_cte()}
    SELECT e.b AS bookings,
           CAST(e.b - {OB_CAP} AS BIGINT) AS overbook_pad,
           CAST(e.e_board_num AS DOUBLE) / CAST(p.p10 AS DOUBLE)
             AS expected_boarded,
           CAST(e.e_bump_num AS DOUBLE) / CAST(p.p10 AS DOUBLE)
             AS expected_bumped,
           CAST({fare} * e.e_board_num - {BUMP_PENALTY} * e.e_bump_num
                AS DOUBLE) / CAST(p.p10 AS DOUBLE)
             AS expected_net_revenue_cents
    FROM etab e JOIN pow10 p ON p.b = e.b
    ORDER BY e.b
    """


@query("q985_overbooking_grid", oracle=_q985_sql())
def q985_overbooking_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overbooking economics on an exact Binomial(b, 9/10) show-up
    model: expected boarded, bumped and net revenue per virtual-
    capacity level, with every expectation an exact DECIMAL(38)
    integer sum (literal C(b,k) and 9^k tables) divided once by 10^b
    for display. The argmax row is the pad to book to. Constants, not
    data — the query shape is the point (the same machinery prices
    any discrete-risk pad)."""
    _views(spark, sf_dir)
    return spark.sql(_q985_sql())


def _q986_sql() -> str:
    return f"""
    WITH {_ob_expect_cte()},
    fixed AS (
      SELECT ch.k, ch.c * p.p9 AS num
      FROM choosek ch JOIN pow9 p ON p.k = ch.k
      WHERE ch.b = {_B_MAX}
    ),
    seats(cap) AS (VALUES {", ".join(f"({c})" for c in range(OB_CAP - 5, OB_CAP + 6))}),
    eb AS (
      SELECT s.cap,
             SUM(f.num * CAST(LEAST(f.k, s.cap) AS DECIMAL(38,0)))
               AS e_board_num
      FROM seats s CROSS JOIN fixed f
      GROUP BY s.cap
    )
    SELECT cap AS seats,
           CAST(e_board_num AS DOUBLE)
             / CAST(CAST('{_POW10[_B_MAX]}' AS DECIMAL(38,0)) AS DOUBLE)
             AS expected_boarded,
           CAST(e_board_num - LAG(e_board_num) OVER (ORDER BY cap)
                AS DOUBLE)
             / CAST(CAST('{_POW10[_B_MAX]}' AS DECIMAL(38,0)) AS DOUBLE)
             AS bid_price_pax
    FROM eb ORDER BY cap
    """


@query("q986_bid_price_curve", oracle=_q986_sql())
def q986_bid_price_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bid-price curve: marginal expected boardings of one more
    physical seat at fixed bookings (exact first differences of the
    binomial expectation) — the opportunity-cost signal network RM
    systems accept/reject against. Decreasing in seats (concavity =
    diminishing marginal value), test-asserted."""
    _views(spark, sf_dir)
    return spark.sql(_q986_sql())
