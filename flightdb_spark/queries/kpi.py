"""KPI batch 33 (q299-q300): the perfect-order rate (the composite
supply-chain SLA — every line on time, nothing returned) and the
cross-table KPI snapshot (the one-query dashboard materialization
that unions single-row aggregates from every fact table into a
metric/value feed).

Determinism: perfect-order flags are integer predicates aggregated
exactly; snapshot metrics are DECIMAL sums / exact counts with one
rounded double division per derived metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_DEC6 = "decimal(38,6)"


# ---------------------------------------------------------------------------
# q299 — perfect-order rate


@query(
    "q299_perfect_order_rate",
    oracle="""
    WITH per_order AS (
      SELECT o.o_orderkey,
             CAST(date_trunc('month', o.o_orderdate) AS DATE) AS month,
             CAST(CASE WHEN MAX(CASE WHEN l.l_shipdate
                            > o.o_orderdate + INTERVAL 45 DAY
                            THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END AS BIGINT) AS all_on_time,
             CAST(CASE WHEN MAX(CASE WHEN l.l_returnflag = 'R'
                            THEN 1 ELSE 0 END) = 0
                  THEN 1 ELSE 0 END AS BIGINT) AS no_returns
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, month
    )
    SELECT month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(all_on_time) AS BIGINT) AS n_on_time,
           CAST(SUM(no_returns) AS BIGINT) AS n_clean,
           CAST(SUM(all_on_time * no_returns) AS BIGINT) AS n_perfect,
           ROUND(SUM(all_on_time * no_returns) * 1.0 / COUNT(*), 6)
             AS perfect_rate
    FROM per_order
    GROUP BY month
    ORDER BY month
    """,
)
def q299_perfect_order_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perfect-order rate: the composite supply-chain KPI — an order
    is perfect when EVERY line shipped within 45 days AND nothing was
    returned; reported monthly with the component rates beside it (so
    a drop decomposes into lateness vs returns). The all-lines
    quantifier is a MAX-of-violations flipped once per order, never a
    per-line distinct count.

    Plan: one orderkey shuffle joins lines to headers (natural key);
    the per-order flags collapse in the same aggregate; the monthly
    rollup rides an ~80-key group."""
    o = load_table(spark, sf_dir, "orders")
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    joined = li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 45 DAYS"), 1
    ).otherwise(0)
    ret = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    per_order = joined.groupBy(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
    ).agg(
        F.when(F.max(late) == 0, 1).otherwise(0).cast("bigint").alias("all_on_time"),
        F.when(F.max(ret) == 0, 1).otherwise(0).cast("bigint").alias("no_returns"),
    )
    return (
        per_order.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("all_on_time").cast("bigint").alias("n_on_time"),
            F.sum("no_returns").cast("bigint").alias("n_clean"),
            F.sum(F.col("all_on_time") * F.col("no_returns"))
            .cast("bigint")
            .alias("n_perfect"),
            F.round(
                F.sum(F.col("all_on_time") * F.col("no_returns"))
                * 1.0
                / F.count(F.lit(1)),
                6,
            ).alias("perfect_rate"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# q300 — cross-table KPI snapshot


@query(
    "q300_kpi_snapshot",
    oracle="""
    WITH m1 AS (
      SELECT 'total_revenue' AS metric,
             ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(38,6)))
                        AS DOUBLE), 2) AS value
      FROM orders
    ),
    m2 AS (
      SELECT 'n_orders' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM orders
    ),
    m3 AS (
      SELECT 'avg_order_value' AS metric,
             ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(38,6)))
                        AS DOUBLE) / COUNT(*), 4) AS value
      FROM orders
    ),
    m4 AS (
      SELECT 'active_customers' AS metric,
             CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS value FROM orders
    ),
    m5 AS (
      SELECT 'n_events' AS metric, CAST(COUNT(*) AS DOUBLE) AS value FROM events
    ),
    m6 AS (
      SELECT 'events_per_user' AS metric,
             ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT user_id), 4) AS value
      FROM events
    ),
    m7 AS (
      SELECT 'distinct_doc_ratio' AS metric,
             ROUND(COUNT(DISTINCT md5(text)) * 1.0 / COUNT(*), 6) AS value
      FROM documents
    ),
    m8 AS (
      SELECT 'lineitems_per_order' AS metric,
             ROUND(COUNT(*) * 1.0 / COUNT(DISTINCT l_orderkey), 4) AS value
      FROM lineitem
    )
    SELECT * FROM m1 UNION ALL SELECT * FROM m2 UNION ALL SELECT * FROM m3
    UNION ALL SELECT * FROM m4 UNION ALL SELECT * FROM m5
    UNION ALL SELECT * FROM m6 UNION ALL SELECT * FROM m7
    UNION ALL SELECT * FROM m8
    ORDER BY metric
    """,
)
def q300_kpi_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table KPI snapshot: the one-query dashboard feed — eight
    headline metrics (revenue, volume, AOV, active customers, event
    volume and intensity, corpus dedup ratio, basket width) as
    (metric, value) rows from four fact tables, each a single-row
    aggregate unioned into one frame. This is the materialization
    pattern a metrics layer compiles to: one lazy DAG, every table
    scanned ONCE, no driver-side loop of collect()s.

    Plan: four independent scan+aggregate branches (orders twice
    reuses one scan via Catalyst subplan reuse) union into an 8-row
    frame; sums ride DECIMAL; each derived metric divides once."""
    o = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    docs = load_table(spark, sf_dir, "documents")
    li = load_table(spark, sf_dir, "lineitem")
    rev6 = F.sum(F.round(F.col("o_totalprice"), 6).cast(_DEC6))
    m = [
        o.agg(F.round(rev6.cast("double"), 2).alias("value")).select(
            F.lit("total_revenue").alias("metric"), "value"
        ),
        o.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
            F.lit("n_orders").alias("metric"), "value"
        ),
        o.agg(
            F.round(rev6.cast("double") / F.count(F.lit(1)), 4).alias("value")
        ).select(F.lit("avg_order_value").alias("metric"), "value"),
        o.agg(F.count_distinct("o_custkey").cast("double").alias("value")).select(
            F.lit("active_customers").alias("metric"), "value"
        ),
        ev.agg(F.count(F.lit(1)).cast("double").alias("value")).select(
            F.lit("n_events").alias("metric"), "value"
        ),
        ev.agg(
            F.round(F.count(F.lit(1)) * 1.0 / F.count_distinct("user_id"), 4).alias(
                "value"
            )
        ).select(F.lit("events_per_user").alias("metric"), "value"),
        docs.agg(
            F.round(
                F.count_distinct(F.md5("text")) * 1.0 / F.count(F.lit(1)), 6
            ).alias("value")
        ).select(F.lit("distinct_doc_ratio").alias("metric"), "value"),
        li.agg(
            F.round(
                F.count(F.lit(1)) * 1.0 / F.count_distinct("l_orderkey"), 4
            ).alias("value")
        ).select(F.lit("lineitems_per_order").alias("metric"), "value"),
    ]
    out = m[0]
    for frame in m[1:]:
        out = out.unionByName(frame)
    return out.orderBy("metric")
