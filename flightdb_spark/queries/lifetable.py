"""Customer-life-table batch 193 (q1032-q1036) — the actuarial
decrement-table toolkit (lx/dx/qx columns, curtate life expectancy,
discounted lifetime value, cohort comparison, retention milestones)
applied to customer tenure: lifetime = months (28-day units) between a
customer's first and last order. Observation is complete (the horizon
closed), so lx is OBSERVED — a suffix count, not a product estimate —
and every life-table column is an exact integer rational.

- q1032 decrement table: for each lifetime-month x, deaths dx,
  survivors lx (suffix sum), mortality qx = dx/lx exact rational;
- q1033 curtate life expectancy: e_x = sum_{t>x} l_t / l_x for every
  x — double suffix machinery, exact rationals;
- q1034 discounted expected lifetime value: EPV of 1-per-surviving-
  month at literal monthly discount v=0.96, walked as a sequential
  IEEE chain (v_t = v_{t-1} * 0.96, acc_t = acc_{t-1} + l_t * v_t) —
  the q261 applyInPandas / recursive-CTE replay pair, micro-quantized;
- q1035 cohort life expectancy by market segment: mean lifetime as
  exact SUM/COUNT rational plus the exact median month (smallest m
  with 2*cum >= n) — which segment keeps customers longest;
- q1036 retention milestones by segment: lx/l0 at literal months
  {3, 6, 12, 24} and the exact half-life month (first 2*lx <= l0).

100 TB shape: ONE orders shuffle to per-customer (first, last) dates
(+ a customer-dim join for segments); every window runs over the
<= ~90-row lifetime-month census (calendar-bounded, the q339 class).

Determinism: integer month counts; suffix sums; exact cross-product
comparisons for medians/half-lives; the only doubles are terminal
ratios and the q1034 replayed discount chain.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

DISCOUNT = 0.96
MILESTONES = [3, 6, 12, 24]


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _life_cte(d: str) -> str:
    if d == "spark":
        mm = (
            "CAST(datediff(CAST(last_d AS DATE), CAST(first_d AS DATE))"
            " AS BIGINT) div 28"
        )
    else:
        mm = "date_diff('day', first_d, last_d) // 28"
    return f"""spans AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_d, MAX(o_orderdate) AS last_d
      FROM orders GROUP BY o_custkey
    ),
    lifetimes AS (
      SELECT o_custkey, CAST({mm} AS BIGINT) AS life_m
      FROM spans
    ),
    census AS (
      SELECT life_m AS x, CAST(COUNT(*) AS BIGINT) AS dx
      FROM lifetimes GROUP BY life_m
    ),
    lifetab AS (
      SELECT x, dx,
             CAST(SUM(dx) OVER (ORDER BY x DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS lx
      FROM census
    )"""


def _q1032_sql(d: str) -> str:
    return f"""
    WITH {_life_cte(d)}
    SELECT x, dx, lx,
           CAST(dx AS BIGINT) AS qx_num, lx AS qx_den,
           CAST(dx AS DOUBLE) / lx AS qx
    FROM lifetab
    ORDER BY x
    """


@query("q1032_decrement_table", oracle=_q1032_sql("duckdb"))
def q1032_decrement_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observed decrement table over customer tenure months:
    dx (tenures ending at x), lx (tenures >= x, a suffix sum over the
    bounded month census) and the mortality rate qx as an exact
    rational — the actuarial read of churn."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_q1032_sql("spark"))


def _q1033_sql(d: str) -> str:
    return f"""
    WITH {_life_cte(d)},
    future AS (
      SELECT x, dx, lx,
             CAST(COALESCE(SUM(lx) OVER (ORDER BY x
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING), 0)
               AS BIGINT) AS sum_future_l
      FROM lifetab
    )
    SELECT x, lx, sum_future_l AS ex_num, lx AS ex_den,
           CAST(sum_future_l AS DOUBLE) / lx AS ex_months
    FROM future
    ORDER BY x
    """


@query("q1033_life_expectancy", oracle=_q1033_sql("duckdb"))
def q1033_life_expectancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curtate life expectancy at every attained month: e_x =
    (sum of survivors beyond x) / l_x as an exact integer rational —
    'given a customer reached month x, how many more months do they
    stay'. Both suffix scans run over the bounded month census."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_q1033_sql("spark"))


_EPV_SCHEMA = "x bigint, lx bigint, v_micro double, epv_micro double"


@query(
    "q1034_discounted_lifetime",
    oracle=f"""
    WITH RECURSIVE {{life}},
    bounds AS (SELECT CAST(MAX(x) AS BIGINT) AS xmax,
                      CAST(MAX(lx) AS BIGINT) AS l0 FROM lifetab),
    chain AS (
      SELECT CAST(0 AS BIGINT) AS t,
             CAST(1.0 AS DOUBLE) AS vt,
             (CAST(b.l0 AS DOUBLE) / b.l0) * 1.0 AS acc
      FROM bounds b
      UNION ALL
      SELECT c.t + 1,
             c.vt * CAST({DISCOUNT!r} AS DOUBLE),
             c.acc + (CAST(COALESCE(
                 (SELECT MAX(lt.lx) FROM lifetab lt WHERE lt.x > c.t), 0)
               AS DOUBLE) / b.l0) * (c.vt * CAST({DISCOUNT!r} AS DOUBLE))
      FROM chain c CROSS JOIN bounds b
      WHERE c.t < b.xmax
    ),
    dense AS (
      SELECT c.t AS x,
             CAST(COALESCE((SELECT MAX(lt.lx) FROM lifetab lt
                            WHERE lt.x >= c.t), 0) AS BIGINT) AS lx,
             c.vt, c.acc
      FROM chain c
    )
    SELECT x, lx,
           CAST(CAST(FLOOR(vt * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS v_micro,
           CAST(CAST(FLOOR(acc * 1000000.0 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS epv_micro
    FROM dense
    ORDER BY x
    """.replace("{life}", _life_cte("duckdb")),
)
def q1034_discounted_lifetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted expected lifetime value: the EPV of one unit per
    surviving month at the literal 0.96 monthly discount, walked as a
    sequential IEEE chain over the dense month spine (survivor counts
    carried from the suffix table). The q261 replay pair: Python chain
    in one applyInPandas group, recursive CTE in the oracle,
    micro-quantized states hash-matched."""
    _views(spark, sf_dir, "orders")
    life = spark.sql(f"WITH {_life_cte('spark')} SELECT x, lx FROM lifetab")

    def _apply(pdf):
        import pandas as pd

        pdf = pdf.sort_values("x")
        l0 = int(pdf.lx.max())
        # dense survivor series: survivors at t = lx of the smallest
        # recorded x >= t; lx decreases in x, so that is MAX(lx | x >= t)
        xs = pdf.x.tolist()
        lxs = pdf.lx.tolist()
        xmax = int(max(xs))
        dense = []
        for t in range(0, xmax + 1):
            vals = [l for x, l in zip(xs, lxs) if x >= t]
            dense.append((t, max(vals) if vals else 0))
        rows = []
        vt = 1.0
        acc = 0.0
        for t, lt in dense:
            contrib = (lt / l0) * vt
            acc = acc + contrib
            rows.append(
                (
                    t,
                    lt,
                    math.floor(vt * 1e6 + 0.5) / 1e6,
                    math.floor(acc * 1e6 + 0.5) / 1e6,
                )
            )
            vt = vt * DISCOUNT
        return pd.DataFrame(rows, columns=["x", "lx", "v_micro", "epv_micro"])

    return (
        life.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: _apply(pdf), schema=_EPV_SCHEMA)
        .orderBy("x")
    )


def _seg_life_cte(d: str) -> str:
    if d == "spark":
        mm = (
            "CAST(datediff(CAST(last_d AS DATE), CAST(first_d AS DATE))"
            " AS BIGINT) div 28"
        )
    else:
        mm = "date_diff('day', first_d, last_d) // 28"
    return f"""spans AS (
      SELECT o.o_custkey, c.c_mktsegment AS segment,
             MIN(o.o_orderdate) AS first_d, MAX(o.o_orderdate) AS last_d
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY o.o_custkey, c.c_mktsegment
    ),
    lifetimes AS (
      SELECT segment, CAST({mm} AS BIGINT) AS life_m FROM spans
    )"""


def _q1035_sql(d: str) -> str:
    return f"""
    WITH {_seg_life_cte(d)},
    census AS (
      SELECT segment, life_m, CAST(COUNT(*) AS BIGINT) AS n
      FROM lifetimes GROUP BY segment, life_m
    ),
    cum AS (
      SELECT segment, life_m, n,
             CAST(SUM(n) OVER (PARTITION BY segment ORDER BY life_m
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum_n,
             CAST(SUM(n) OVER (PARTITION BY segment) AS BIGINT) AS tot,
             CAST(SUM(n * life_m) OVER (PARTITION BY segment) AS BIGINT)
               AS sum_m
      FROM census
    )
    SELECT segment,
           MIN(tot) AS n_customers,
           MIN(sum_m) AS mean_num,
           MIN(tot) AS mean_den,
           CAST(MIN(sum_m) AS DOUBLE) / MIN(tot) AS mean_lifetime_m,
           CAST(MIN(CASE WHEN 2 * cum_n >= tot THEN life_m END) AS BIGINT)
             AS median_lifetime_m
    FROM cum
    GROUP BY segment
    ORDER BY segment
    """


@query("q1035_cohort_life_expectancy", oracle=_q1035_sql("duckdb"))
def q1035_cohort_life_expectancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort comparison: mean customer lifetime as an exact SUM/COUNT
    rational and the exact median month (smallest m with
    2*cumulative >= n) per market segment — which cohort stays
    longest, with no floating point in the order statistics."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_q1035_sql("spark"))


def _q1036_sql(d: str) -> str:
    miles = ", ".join(f"({m})" for m in MILESTONES)
    return f"""
    WITH {_seg_life_cte(d)},
    census AS (
      SELECT segment, life_m, CAST(COUNT(*) AS BIGINT) AS n
      FROM lifetimes GROUP BY segment, life_m
    ),
    seg_tab AS (
      SELECT segment, life_m AS x, n,
             CAST(SUM(n) OVER (PARTITION BY segment ORDER BY life_m DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS lx,
             CAST(SUM(n) OVER (PARTITION BY segment) AS BIGINT) AS l0
      FROM census
    ),
    mile(m) AS (VALUES {miles}),
    milestones AS (
      SELECT s.segment, ml.m,
             CAST(COALESCE(MIN(CASE WHEN s.x >= ml.m THEN s.lx END), 0)
               AS BIGINT) AS lm,
             MIN(s.l0) AS l0
      FROM seg_tab s CROSS JOIN mile ml
      GROUP BY s.segment, ml.m
    ),
    halflife AS (
      SELECT segment,
             CAST(MIN(CASE WHEN 2 * lx <= l0 THEN x END) AS BIGINT) AS hl
      FROM seg_tab GROUP BY segment
    )
    SELECT m.segment, m.m AS milestone_m,
           m.lm AS retained, m.l0 AS cohort_size,
           CAST(m.lm AS DOUBLE) / m.l0 AS retention,
           h.hl AS half_life_m
    FROM milestones m JOIN halflife h ON h.segment = m.segment
    ORDER BY m.segment, m.m
    """


@query("q1036_retention_milestones", oracle=_q1036_sql("duckdb"))
def q1036_retention_milestones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention milestones per segment: survivors at literal months
    {3, 6, 12, 24} as exact lx/l0 rationals plus the exact half-life
    month (first x with 2*lx <= l0) — the dashboard row a retention
    team reads off the life table."""
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(_q1036_sql("spark"))
