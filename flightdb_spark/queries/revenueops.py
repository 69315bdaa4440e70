"""Revenue & inventory operations batch 88 (q506-q510) — the
SaaS-finance and stock-planning calculators beside q292 (cohort LTV),
q340 (AR aging), q341 (revenue recognition), q269 (safety stock):

- q506 NRR/GRR: net and gross revenue retention per month — revenue
  this month from LAST month's paying customers over last month's
  revenue (GRR caps each customer at their prior spend, so expansion
  can't mask churn);
- q507 revenue bridge: month-over-month revenue decomposed into
  new + expansion - contraction - churned, with the bridge identity
  rev_m = rev_{m-1} + new + exp - con - churn holding EXACTLY in
  integer cents;
- q508 cohort payback: months until each signup cohort's cumulative
  revenue reaches 2x its first-month revenue — the payback curve
  (computed against a cohort-relative target so it is data-driven,
  not a CAC guess);
- q509 newsvendor stocking: the critical-fractile quantile
  q* = F^-1(cu/(cu+co)) of daily demand as an EXACT order statistic
  (underage 9 : overage 1 -> the 0.9 fractile), with the empirical
  stockout share at that stock level;
- q510 EOQ table: economic order quantity sqrt(2 D S / H) per part
  type from live annual demand (sqrt is IEEE-exact, rule 5), with
  orders/year and cycle days.

Determinism: all revenue is integer cents (FLOOR(x*100+0.5), rule
16); retention/bridge are pure integer sums with terminal divisions;
the payback scan is a DECIMAL prefix sum over (cohort, month) —
calendar-bounded windows (rule 15); the newsvendor quantile is rank
selection, never percentile interpolation (q464 lesson).

100 TB shapes: one (customer, month) aggregate feeds q506-q508 (the
single corpus shuffle each); month-over-month logic is a co-keyed
self-join on (custkey, month-1); q509/q510 are one daily/type
aggregate each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

O_CENTS = "CAST(FLOOR(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
BRIDGE_YEAR = 1996
PAYBACK_MULT = 2
NV_CU, NV_CO = 9, 1  # underage : overage costs
EOQ_ORDER_COST = 50.0  # S, dollars per order
EOQ_HOLD_COST = 2.0  # H, dollars per unit-year


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _month(dialect: str, col: str) -> str:
    # integer month id = year*12 + (month-1): engine-neutral arithmetic
    return f"(year({col}) * 12 + month({col}) - 1)"


def _cust_month(dialect: str) -> str:
    m = _month(dialect, "o_orderdate")
    return f"""cm AS (
      SELECT o_custkey AS cust, {m} AS m,
             CAST(SUM({O_CENTS}) AS BIGINT) AS rev
      FROM orders GROUP BY o_custkey, {m}
    )"""


# ---------------------------------------------------------------------------
# q506 — NRR / GRR


def _nrr_sql(dialect: str) -> str:
    lo = BRIDGE_YEAR * 12
    return f"""
    WITH {_cust_month(dialect)},
    pairs AS (
      SELECT prev.m + 1 AS m, prev.rev AS rev_prev,
             COALESCE(cur.rev, 0) AS rev_cur
      FROM cm prev
      LEFT JOIN cm cur ON cur.cust = prev.cust AND cur.m = prev.m + 1
    ),
    agg AS (
      SELECT m,
             CAST(SUM(rev_prev) AS BIGINT) AS base_rev,
             CAST(SUM(rev_cur) AS BIGINT) AS retained_rev,
             CAST(SUM(LEAST(rev_cur, rev_prev)) AS BIGINT) AS capped_rev
      FROM pairs GROUP BY m
    )
    SELECT m - {lo} + 1 AS month_1996,
           ROUND(CAST(retained_rev AS DOUBLE) / base_rev, 4) AS nrr,
           ROUND(CAST(capped_rev AS DOUBLE) / base_rev, 4) AS grr
    FROM agg
    WHERE m BETWEEN {lo} AND {lo + 11}
    """


@query("q506_nrr_grr", oracle=_nrr_sql("duck"))
def q506_nrr_grr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net and gross revenue retention for each 1996 month: this
    month's revenue from LAST month's paying customers over last
    month's revenue; GRR caps each customer at prior spend so
    expansion cannot hide churn (GRR <= NRR always, GRR <= 1 by
    construction). One (customer, month) aggregate + a co-keyed
    month-shift self-join; all sums are integer cents."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_nrr_sql("spark"))


# ---------------------------------------------------------------------------
# q507 — revenue bridge


def _bridge_sql(dialect: str) -> str:
    lo = BRIDGE_YEAR * 12
    return f"""
    WITH {_cust_month(dialect)},
    months AS (SELECT DISTINCT m FROM cm WHERE m BETWEEN {lo} AND {lo + 11}),
    joined AS (
      SELECT mo.m,
             COALESCE(cur.rev, 0) AS rc,
             COALESCE(prev.rev, 0) AS rp
      FROM months mo
      JOIN (SELECT cust FROM cm GROUP BY cust) cu ON TRUE
      LEFT JOIN cm cur ON cur.cust = cu.cust AND cur.m = mo.m
      LEFT JOIN cm prev ON prev.cust = cu.cust AND prev.m = mo.m - 1
      WHERE COALESCE(cur.rev, 0) > 0 OR COALESCE(prev.rev, 0) > 0
    )
    SELECT m - {lo} + 1 AS month_1996,
           CAST(SUM(rp) AS BIGINT) AS prev_rev_cents,
           CAST(SUM(rc) AS BIGINT) AS cur_rev_cents,
           CAST(SUM(CASE WHEN rp = 0 THEN rc ELSE 0 END) AS BIGINT) AS new_rev,
           CAST(SUM(CASE WHEN rp > 0 AND rc > rp THEN rc - rp ELSE 0 END)
                AS BIGINT) AS expansion,
           CAST(SUM(CASE WHEN rc > 0 AND rc < rp THEN rp - rc ELSE 0 END)
                AS BIGINT) AS contraction,
           CAST(SUM(CASE WHEN rc = 0 THEN rp ELSE 0 END) AS BIGINT)
             AS churned
    FROM joined GROUP BY m
    """


@query("q507_revenue_bridge", oracle=_bridge_sql("duck"))
def q507_revenue_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue bridge for 1996: new + expansion -
    contraction - churned, in exact integer cents, with the waterfall
    identity cur = prev + new + expansion - contraction - churned
    holding to the cent (asserted in tests). The month grid joins the
    customer spine once; at 100 TB the (cust, month) table is the
    only corpus-sized input and both joins are co-keyed on cust."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_bridge_sql("spark"))


# ---------------------------------------------------------------------------
# q508 — cohort payback


def _payback_sql(dialect: str) -> str:
    return f"""
    WITH {_cust_month(dialect)},
    firsts AS (
      SELECT cust, MIN(m) AS m0 FROM cm GROUP BY cust
    ),
    cohort_rev AS (
      SELECT f.m0 AS cohort, cm.m - f.m0 AS k,
             CAST(SUM(cm.rev) AS BIGINT) AS rev
      FROM cm JOIN firsts f ON f.cust = cm.cust
      GROUP BY f.m0, cm.m - f.m0
    ),
    with_target AS (
      SELECT cohort, k, rev,
             SUM(rev) OVER (PARTITION BY cohort ORDER BY k) AS cum,
             {PAYBACK_MULT} * FIRST_VALUE(rev)
               OVER (PARTITION BY cohort ORDER BY k) AS target
      FROM cohort_rev
    ),
    paid AS (
      SELECT cohort, MIN(k) AS payback_months
      FROM with_target WHERE cum >= target GROUP BY cohort
    ),
    sizes AS (
      SELECT m0 AS cohort, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM firsts GROUP BY m0
    )
    SELECT s.cohort - (SELECT MIN(cohort) FROM sizes) AS cohort_index,
           s.n_customers,
           p.payback_months
    FROM sizes s JOIN paid p ON p.cohort = s.cohort
    WHERE s.cohort < (SELECT MIN(cohort) FROM sizes) + 12
    """


@query("q508_cohort_payback", oracle=_payback_sql("duck"))
def q508_cohort_payback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort payback curve: for each of the first 12 signup cohorts
    (first-order month), the months until cumulative cohort revenue
    reaches 2x its first-month revenue — the payback table with a
    cohort-relative target instead of a CAC guess. Prefix sums run
    per cohort over month offsets (calendar-bounded); revenue is
    integer cents throughout."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_payback_sql("spark"))


# ---------------------------------------------------------------------------
# q509 — newsvendor stocking


def _newsvendor_sql(dialect: str) -> str:
    frac_num, frac_den = NV_CU, NV_CU + NV_CO
    return f"""
    WITH daily AS (
      SELECT CAST(l_shipdate AS DATE) AS d,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS demand
      FROM lineitem GROUP BY 1
    ),
    ranked AS (
      SELECT demand,
             ROW_NUMBER() OVER (ORDER BY demand, d) AS rn,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    pick AS (
      -- critical fractile as an exact order statistic:
      -- rank = ceil(n * cu/(cu+co)) via -FLOOR(-x)
      SELECT demand AS q_star, n
      FROM ranked
      WHERE rn = CAST(-FLOOR(-(CAST(n AS DOUBLE) * {frac_num} / {frac_den}))
                      AS BIGINT)
    )
    ,stockouts AS (
      SELECT CAST(SUM(CASE WHEN d.demand > p.q_star THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_over
      FROM daily d CROSS JOIN pick p
    )
    SELECT {frac_num} AS cost_underage,
           {NV_CO} AS cost_overage,
           ROUND(CAST({frac_num} AS DOUBLE) / {frac_den}, 4)
             AS critical_fractile,
           p.q_star AS optimal_stock,
           CAST(p.n AS BIGINT) AS n_days,
           ROUND(CAST(s.n_over AS DOUBLE) / p.n, 4) AS stockout_share
    FROM pick p CROSS JOIN stockouts s
    """


@query("q509_newsvendor", oracle=_newsvendor_sql("duck"))
def q509_newsvendor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking level: with underage:overage costs 9:1 the
    optimal stock is the 0.9 critical fractile of daily demand —
    selected as an EXACT order statistic (ceil-rank via -FLOOR(-x),
    no percentile interpolation, q464 lesson) over the ~1,100-row
    daily demand table, plus the realized stockout share at that
    level (~10% by construction). One daily aggregate; the rank
    window is calendar-bounded."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(_newsvendor_sql("spark"))


# ---------------------------------------------------------------------------
# q510 — EOQ table


def _eoq_sql(dialect: str) -> str:
    years = "6.5"  # orders span 1995-01 .. 2001-08
    return f"""
    WITH demand AS (
      SELECT p.p_type,
             CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS total_qty
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_type
    )
    SELECT p_type,
           CAST(ROUND(CAST(total_qty AS DOUBLE) / {years}, 0) AS BIGINT)
             AS annual_demand,
           ROUND(SQRT(2 * (CAST(total_qty AS DOUBLE) / {years})
                      * {EOQ_ORDER_COST!r} / {EOQ_HOLD_COST!r}), 2) AS eoq_units,
           ROUND((CAST(total_qty AS DOUBLE) / {years})
                 / SQRT(2 * (CAST(total_qty AS DOUBLE) / {years})
                        * {EOQ_ORDER_COST!r} / {EOQ_HOLD_COST!r}), 2)
             AS orders_per_year,
           ROUND(CAST(365.0 AS DOUBLE)
                 / ((CAST(total_qty AS DOUBLE) / {years})
                    / SQRT(2 * (CAST(total_qty AS DOUBLE) / {years})
                           * {EOQ_ORDER_COST!r} / {EOQ_HOLD_COST!r})), 2)
             AS cycle_days
    FROM demand
    """


@query("q510_eoq_table", oracle=_eoq_sql("duck"))
def q510_eoq_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Economic order quantity per part type: EOQ = sqrt(2 D S / H)
    with live annual demand D (from the 6.5-year lineitem history)
    and literal order/holding costs — plus orders/year and cycle
    days. SQRT is IEEE-exact (rule 5); demand is one broadcast-dim
    join + integer aggregate. The oldest inventory formula as a
    6-row planning table."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_eoq_sql("spark"))
