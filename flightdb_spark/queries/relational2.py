"""Relational batch 6 (q164-q169): the remaining TPC-H classics that
the slim synthetic star schema can express — existential lateness
checks, bilateral trade volume, market share, large-volume orders,
dormant-customer anti-join, small-lot revenue loss.

Together with q01/q140/q94/q141/q142 (Q1/Q3/Q5/Q10/Q14) these give the
engine the canonical OLAP join/agg battery. Schema adaptations are
noted per query (no partsupp table; no l_commitdate/l_receiptdate/
l_shipmode/c_phone columns), chosen to preserve each query's plan
shape: the semi/anti joins, the conditional aggregate, and the
per-group-average correlated filter all survive.

Aggregation discipline (matches relational.py): revenue terms round
per row at 6 dp into DECIMAL(38,6) sums — order-free and identical on
both engines — with 2-dp output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# one shared revenue term, 6-dp rounded before the decimal sum
_REV6 = "CAST(ROUND(l_extendedprice * (1 - l_discount), 6) AS DECIMAL(38,6))"


def _rev6() -> F.Column:
    return F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).cast(
        "decimal(38,6)"
    )


@query(
    "q164_priority_lateness",
    oracle="""
    SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_late_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q164_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), lateness re-anchored on
    l_shipdate > o_orderdate + 30 days since the schema carries no
    l_commitdate: per priority class, how many of a half-year's orders
    had at least one late line. Plan: the date filter prunes the
    orders scan; LEFT SEMI join on the order key carries the non-equi
    lateness predicate (each order emitted at most once, no
    post-join dedup); one shuffle on the tiny priority key."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q165_volume_shipping",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
           ROUND(CAST(SUM({_REV6}) AS DOUBLE), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-01-01'
      AND l.l_shipdate < TIMESTAMP '2000-01-01'
      AND ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
    GROUP BY ns.n_name, nc.n_name, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q165_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade revenue between two
    nations by ship year. Plan: supplier/customer/nation dims all
    broadcast (the disjunctive nation-pair predicate evaluates map
    side, after the broadcasts, so the fact rows that survive are
    pruned before the only real shuffle — lineitem⋈orders on the
    order key); the final group-by rides a 4-ish-row key."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = n.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev6()).cast("double"), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q166_market_share",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN ns.n_name = 'NATION_3' THEN {_REV6}
                               ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                 / CAST(SUM({_REV6}) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation nc ON nc.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = nc.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation ns ON ns.n_nationkey = s.s_nationkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q166_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): the share of PROMO-part
    revenue sold into ASIA-region customers that NATION_3's suppliers
    captured, per order year. Plan: part/supplier/customer/nation/
    region all broadcast; the part-type and region filters prune map
    side before the lineitem⋈orders shuffle; share = conditional
    decimal sum / total decimal sum in ONE aggregate (no second pass,
    no join of two aggregates)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    nc = n.select(F.col("n_nationkey").alias("nc_key"), "n_regionkey")
    ns = n.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nat3 = F.when(F.col("supp_nation") == "NATION_3", _rev6()).otherwise(
        F.lit(0).cast("decimal(38,6)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(nat3).cast("double") / F.sum(_rev6()).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q167_large_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 180
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(o.o_totalprice, 2) AS totalprice,
           CAST(b.sum_qty AS DOUBLE) AS sum_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice DESC, o.o_orderkey LIMIT 20
    """,
)
def q167_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total line
    quantity exceeds a threshold, with their customers, biggest bill
    first. Plan: the quantity rollup and the orders join share the
    SAME order-key shuffle (Catalyst reuses the exchange), customer
    broadcasts, and the top-20 is TakeOrderedAndProject — no global
    sort materializes. Quantities sum as DECIMAL (order-free)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("sum_qty_dec"))
        .filter(F.col("sum_qty_dec") > 180)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("sum_qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("totalprice"), "o_orderkey")
        .limit(20)
    )


@query(
    "q168_dormant_customers",
    oracle="""
    WITH cutoff AS (
      SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           ROUND(CAST(SUM(CAST(ROUND(c.c_acctbal, 2) AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS total_bal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, cutoff
    WHERE c.c_acctbal > cutoff.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q168_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity), dormancy re-anchored on
    "no order since 2000-01-01" since every synthetic customer has
    SOME order (and the schema has no c_phone country codes):
    above-average-balance customers with no recent orders, by nation.
    Plan: the positive-balance average is a 1-row broadcast (scalar
    subquery); the recent-orders probe is a LEFT ANTI join on the
    pruned orders scan; nation broadcasts; one shuffle on n_name.
    Balances round to 2 dp before the decimal sum (order-free)."""
    c = load_table(spark, sf_dir, "customer")
    o_recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    n = load_table(spark, sf_dir, "nation")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(
                F.sum(F.round(F.col("c_acctbal"), 2).cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            ).alias("total_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "q169_small_lot_loss",
    oracle="""
    WITH brand_parts AS (
      SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'
    ),
    part_avg AS (
      SELECT l.l_partkey, AVG(l.l_quantity) AS avg_qty
      FROM lineitem l JOIN brand_parts bp ON bp.p_partkey = l.l_partkey
      GROUP BY l.l_partkey
    )
    SELECT ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice, 6) AS DECIMAL(38,6)))
                 AS DOUBLE) / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_small_lots
    FROM lineitem l
    JOIN part_avg pa ON pa.l_partkey = l.l_partkey
    WHERE l.l_quantity < 0.5 * pa.avg_qty
    """,
)
def q169_small_lot_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): yearly revenue that
    would vanish if sub-half-average lots of one brand's parts were
    folded into scheduled deliveries (0.5 threshold instead of 0.2 —
    the synthetic uniform quantities have no deep small tail). Plan:
    the brand's ~80 part keys broadcast into the per-part quantity
    average, which is itself tiny and broadcasts back into the fact
    scan — the correlated-subquery shape becomes two broadcasts and
    ZERO fact-side shuffles; the final row is a single global
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    bp = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    part_avg = (
        li.join(F.broadcast(bp), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("avg_qty"))
        .withColumnRenamed("l_partkey", "pa_partkey")
    )
    return (
        li.join(F.broadcast(part_avg), F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.round("l_extendedprice", 6).cast("decimal(38,6)")).cast(
                    "double"
                )
                / 7.0,
                2,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small_lots"),
        )
    )
