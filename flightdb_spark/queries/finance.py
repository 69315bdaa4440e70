"""Finance batch 47 (q340-q341): accounts-receivable aging (the
collections report — how old is the open-order book, in buckets with
amounts) and ratable revenue recognition (spread each order's value
evenly over its order-to-last-shipment window — the deferral
schedule behind every subscription/fulfillment P&L).

Determinism: ages are exact day arithmetic against the dataset's
max order date; recognition explodes an exact month sequence (same
inclusive endpoints on both engines) and accumulates per-month
shares as 6-dp DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# ---------------------------------------------------------------------------
# q340 — AR aging


@query(
    "q340_ar_aging",
    oracle="""
    WITH asofd AS (SELECT MAX(o_orderdate) AS a FROM orders),
    aged AS (
      SELECT DATE_DIFF('day', o.o_orderdate, asofd.a) AS age_d,
             CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(38,2)) AS amt
      FROM orders o, asofd WHERE o.o_orderstatus = 'O'
    ),
    bucketed AS (
      SELECT CASE WHEN age_d <= 30 THEN 'a_0_30'
                  WHEN age_d <= 60 THEN 'b_31_60'
                  WHEN age_d <= 90 THEN 'c_61_90'
                  WHEN age_d <= 365 THEN 'd_91_365'
                  ELSE 'e_over_1y' END AS bucket,
             amt
      FROM aged
    ),
    tot AS (SELECT SUM(amt) AS t FROM bucketed)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(amt) AS DOUBLE), 2) AS amount,
           ROUND(CAST(SUM(amt) AS DOUBLE) / CAST(MAX(t.t) AS DOUBLE), 6)
             AS share
    FROM bucketed, tot t
    GROUP BY bucket ORDER BY bucket
    """,
)
def q340_ar_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounts-receivable aging: open orders ('O' status) bucketed by
    days outstanding against the book's as-of date (max order date),
    with order counts, DECIMAL-exact amounts, and share of the open
    book — the collections report every finance close produces.
    Scale: one status-filtered scan (pushed predicate), a broadcast
    1-row as-of date, a 5-key aggregate."""
    o = load_table(spark, sf_dir, "orders")
    asof = o.agg(F.max("o_orderdate").alias("a"))
    aged = (
        o.filter(F.col("o_orderstatus") == "O")
        .join(F.broadcast(asof))
        .select(
            F.datediff(F.col("a"), F.col("o_orderdate")).alias("age_d"),
            F.round("o_totalprice", 2).cast("decimal(38,2)").alias("amt"),
        )
    )
    bucket = (
        F.when(F.col("age_d") <= 30, "a_0_30")
        .when(F.col("age_d") <= 60, "b_31_60")
        .when(F.col("age_d") <= 90, "c_61_90")
        .when(F.col("age_d") <= 365, "d_91_365")
        .otherwise("e_over_1y")
    )
    bucketed = aged.select(bucket.alias("bucket"), "amt")
    tot = bucketed.agg(F.sum("amt").alias("t"))
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("amt").cast("double"), 2).alias("amount"),
            F.sum("amt").alias("_s"),
        )
        .join(F.broadcast(tot))
        .select(
            "bucket",
            "n_orders",
            "amount",
            F.round(
                F.col("_s").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# q341 — ratable revenue recognition


@query(
    "q341_revenue_recognition",
    oracle="""
    WITH win AS (
      SELECT o.o_orderkey,
             CAST(ROUND(o.o_totalprice, 2) AS DECIMAL(38,2)) AS amt,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS m0,
             GREATEST(CAST(date_trunc('month', o.o_orderdate) AS DATE),
                      CAST(date_trunc('month', MAX(l.l_shipdate)) AS DATE)) AS m1
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, amt, m0
    ),
    sched AS (
      SELECT o_orderkey, amt,
             len(generate_series(m0, m1, INTERVAL 1 MONTH)) AS nm,
             unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS month
      FROM win
    ),
    recog AS (
      SELECT CAST(month AS DATE) AS month,
             o_orderkey,
             CAST(ROUND(CAST(amt AS DOUBLE) / nm, 6) AS DECIMAL(38,6))
               AS recognized
      FROM sched
    )
    SELECT month,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(recognized) AS DOUBLE), 2) AS recognized_revenue
    FROM recog GROUP BY month ORDER BY month
    """,
)
def q341_revenue_recognition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratable revenue recognition: each order's value is recognized
    evenly across the months from order date to its LAST shipment
    (the fulfillment window), producing the monthly recognized-
    revenue schedule — the deferral view that differs from q01-style
    billed revenue exactly when fulfillment spans month ends. The
    month explosion is an exact inclusive date sequence on both
    engines; per-month shares round once to 6-dp DECIMAL, so the
    monthly totals are exact sums. Scale: one orderkey join +
    aggregate, a bounded in-row sequence explode (window months per
    order), one month-keyed aggregate."""
    o = load_table(spark, sf_dir, "orders")
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    win = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            "o_orderkey",
            F.round("o_totalprice", 2).cast("decimal(38,2)").alias("amt"),
            F.date_trunc("month", "o_orderdate").cast("date").alias("m0"),
        )
        .agg(
            F.greatest(
                F.date_trunc("month", F.first("o_orderdate")).cast("date"),
                F.date_trunc("month", F.max("l_shipdate")).cast("date"),
            ).alias("m1")
        )
    )
    seq = F.sequence(
        F.col("m0"), F.col("m1"), F.expr("INTERVAL 1 MONTH")
    )
    sched = win.select(
        "o_orderkey",
        "amt",
        F.size(seq).alias("nm"),
        F.explode(seq).alias("month"),
    )
    recog = sched.select(
        F.col("month").cast("date").alias("month"),
        "o_orderkey",
        F.round(F.col("amt").cast("double") / F.col("nm"), 6)
        .cast("decimal(38,6)")
        .alias("recognized"),
    )
    return (
        recog.groupBy("month")
        .agg(
            F.count_distinct("o_orderkey").cast("bigint").alias("n_orders"),
            F.round(F.sum("recognized").cast("double"), 2).alias(
                "recognized_revenue"
            ),
        )
        .orderBy("month")
    )
