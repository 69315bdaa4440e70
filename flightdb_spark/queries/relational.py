"""Relational query surface: scans, predicates, joins, aggregations.

Maps the reference's query builder (fgae/fquery.go:16-122) and
driver-side accumulators (report/report.go:47-50, 217-242;
report/listmatches.go:49-54) onto idiomatic Spark DataFrame plans.
Filters here are plain column predicates so Catalyst pushes them into
the parquet scan; small dimension tables are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table
from . import query


# --- TPC-H Q1-style pricing summary: the flagship aggregation ----------------
@query(
    "q01_pricing_summary",
    oracle="""
    SELECT
      l_returnflag,
      l_linestatus,
      ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
      ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
      ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
      ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
      ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
      ROUND(AVG(l_discount), 4)                                        AS avg_disc,
      COUNT(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped multi-aggregate scan (the shape of every reference report's
    counter table, report/report.go:217-242), TPC-H Q1 style."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# --- Selection surface (fgae/fquery.go) ---------------------------------------
@query(
    "q02_select_by_key",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE user_id = 42
    """,
)
def q02_select_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equality selection on an indexed key (ByIcaoId, fgae/fquery.go:50-52);
    pushes the predicate into the parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("user_id") == 42).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@query(
    "q03_time_range",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    """,
)
def q03_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range selection (ByTimeRange, fgae/fquery.go:34-48). The
    reference quantizes to 30-min timeslots for its index; with parquet
    min/max stats a plain interval predicate prunes row groups natively."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(
        (F.col("ts") >= F.lit("2024-01-10 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast("timestamp"))
    ).select("event_id", "ts", "user_id", "event_type", "value")


@query(
    "q04_asof_point_lookup",
    oracle="""
    SELECT user_id, event_id AS last_event_id, ts AS last_ts, value AS last_value
    FROM (
      SELECT user_id, event_id, ts, value,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
      WHERE ts <= TIMESTAMP '2024-01-15 12:00:00'
    ) t
    WHERE rn = 1
    """,
)
def q04_asof_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of point lookup: latest row per key at time t (IndexAtTime,
    track.go:483-494; LookupMostRecent, fgae/db.go:117-120)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.filter(F.col("ts") <= F.lit("2024-01-15 12:00:00").cast("timestamp"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


@query(
    "q05_tags_all_of",
    oracle="""
    SELECT user_id,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types
    FROM events
    GROUP BY user_id
    HAVING COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN event_type END) > 0
       AND COUNT(DISTINCT CASE WHEN event_type = 'error' THEN event_type END) > 0
    """,
)
def q05_tags_all_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND-of-membership over a repeated property (ByTags,
    fgae/fquery.go:56-61): keys whose tag-set contains ALL required tags."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("_has_p"),
            F.max((F.col("event_type") == "error").cast("int")).alias("_has_e"),
        )
        .filter((F.col("_has_p") == 1) & (F.col("_has_e") == 1))
        .drop("_has_p", "_has_e")
    )


@query(
    "q06_not_tags",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events
    FROM events
    WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
    GROUP BY user_id
    HAVING COUNT(CASE WHEN event_type = 'click' THEN 1 END) > 0
       AND COUNT(CASE WHEN event_type = 'error' THEN 1 END) = 0
    """,
)
def q06_not_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-membership filter (report NotTags/NotWaypoints blacklist,
    report/report.go:101-112) — pushed into the aggregation instead of the
    reference's post-scan per-row rejection."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts") < F.lit("2024-01-02 00:00:00").cast("timestamp"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "click").cast("int")).alias("_clicks"),
            F.sum((F.col("event_type") == "error").cast("int")).alias("_errors"),
        )
        .filter((F.col("_clicks") > 0) & (F.col("_errors") == 0))
        .drop("_clicks", "_errors")
    )


@query(
    "q07_recent_topk",
    oracle="""
    SELECT event_id, ts, user_id, event_type
    FROM events
    ORDER BY ts DESC, event_id DESC
    LIMIT 200
    """,
)
def q07_recent_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recent-N list (QueryForRecent, fgae/fquery.go:89-101; recent lists
    limit 200, ui/lists.go:21-24). Spark's takeOrdered-style physical plan
    does a per-partition top-k then a driver merge — no global sort."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(200)
        .select("event_id", "ts", "user_id", "event_type")
    )


@query(
    "q08_enrichment_join",
    oracle="""
    SELECT r.r_name AS region_name,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q08_enrichment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension-enrichment join chain (airframe/schedule cache merge,
    fgae/db.go:15-29, ref/airframecache.go:36-40). Dims are broadcast —
    the fact table never shuffles."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        orders.join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q09_market_distribution",
    oracle="""
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
    FROM orders
    GROUP BY o_orderpriority, o_orderstatus
    """,
)
def q09_market_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-distribution rollup (count flights per Origin:Dest,
    report/listmatches.go:49-54) as a two-key count."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority", "o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q10_topk_revenue_join",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q10_topk_revenue_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact join + top-k (TPC-H Q3 shape). The customer filter is
    applied before the join so the broadcast side is already pruned."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate")
    )


@query(
    "q11_filtered_agg",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q11_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-predicate scan + scalar aggregate (TPC-H Q6 shape); every
    predicate is pushdown-eligible."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q12_hash_sample",
    oracle="""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE SUBSTR(MD5(CAST(event_id AS VARCHAR)), 1, 1) = '0'
    """,
)
def q12_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash sampling (the reference caps map rendering with a
    random subset, ui/options.go:108-128; we use a content hash so the
    sample is reproducible across engines and runs)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.substring(F.md5(F.col("event_id").cast("string")), 1, 1) == "0").select(
        "event_id", "user_id", "event_type"
    )


# --- pivot / unpivot ---------------------------------------------------------------
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q70_pivot_counts",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END)::BIGINT AS n_{t}"
               for t in EVENT_TYPES)}
    FROM events GROUP BY user_id
    """,
)
def q70_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts fanned into one column per event
    type. The value list is given explicitly so Spark skips the
    distinct-values pre-pass (one job saved, stable column order) and
    the plan is a single HashAggregate with conditional counters — one
    shuffle on user_id, identical to the hand-written CASE form the
    oracle uses."""
    ev = load_table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL where a (user, type) pair never occurred; the
    # CASE-form oracle yields 0 there — align, and name columns n_<type>
    for t in EVENT_TYPES:
        out = out.withColumn(t, F.coalesce(F.col(t), F.lit(0))).withColumnRenamed(
            t, f"n_{t}"
        )
    return out


@query(
    "q71_unpivot_longform",
    oracle=f"""
    WITH wide AS (
      SELECT user_id,
             {", ".join(
                 f"COUNT(CASE WHEN event_type = '{t}' THEN 1 END)::BIGINT AS n_{t}"
                 for t in EVENT_TYPES)}
      FROM events GROUP BY user_id
    )
    {" UNION ALL ".join(
        f"SELECT user_id, '{t}' AS metric, n_{t} AS n FROM wide"
        for t in EVENT_TYPES)}
    """,
)
def q71_unpivot_longform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): the wide per-user counts back to long form via
    ``DataFrame.unpivot`` — a zero-shuffle projection (each input row
    expands to k output rows map-side); the only exchange in the plan
    is the upstream pivot's groupBy."""
    wide = q70_pivot_counts(spark, sf_dir)
    return wide.unpivot(
        "user_id",
        [f"n_{t}" for t in EVENT_TYPES],
        "metric",
        "n",
    ).withColumn("metric", F.expr("substring(metric, 3)"))


# --- semi-structured JSON extraction ------------------------------------------------
@query(
    "q77_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    WHERE event_type = 'purchase'
    GROUP BY k
    """,
)
def q77_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a field out of the JSON props
    column and aggregate by it. get_json_object evaluates JVM-side
    inside the scan stage (a JsonPath probe per row, no full parse);
    for repeated multi-field access at scale, from_json to a struct
    column once and let Catalyst prune fields instead."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


# --- set operations -----------------------------------------------------------------
@query(
    "q78_set_ops",
    oracle="""
    WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
    buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
    both_u AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers),
    click_only AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers)
    SELECT 'click_and_buy' AS cohort, COUNT(*) AS n FROM both_u
    UNION ALL
    SELECT 'click_no_buy' AS cohort, COUNT(*) AS n FROM click_only
    """,
)
def q78_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT cohort analysis: users who both clicked and
    purchased vs clicked only. Spark plans both as hash joins over the
    deduped key sets (left_semi / left_anti shapes) — no full-row
    comparison, and the distinct inputs bound the join sides by user
    cardinality, not event count."""
    ev = load_table(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    both_u = clickers.intersect(buyers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("click_and_buy").alias("cohort"), "n"
    )
    click_only = clickers.exceptAll(buyers).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("click_no_buy").alias("cohort"), "n"
    )
    return both_u.unionByName(click_only)


# --- table profiling ---------------------------------------------------------------
_PROFILE_COLS = [
    "o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority",
]


def _profile_oracle() -> str:
    aggs = ", ".join(
        f"COUNT({c}) AS c_{c}, COUNT(DISTINCT {c}) AS d_{c}, "
        f"CAST(MIN({c}) AS VARCHAR) AS mn_{c}, CAST(MAX({c}) AS VARCHAR) AS mx_{c}"
        for c in _PROFILE_COLS
    )
    unions = "\n    UNION ALL\n".join(
        f"SELECT '{c}' AS col, n AS n_rows, n - c_{c} AS n_null, "
        f"d_{c} AS n_distinct, mn_{c} AS min_str, mx_{c} AS max_str FROM a"
        for c in _PROFILE_COLS
    )
    return f"""
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, {aggs} FROM orders
    )
    {unions}
    """


@query("q104_profile_table", oracle=_profile_oracle())
def q104_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass over the orders table: per column, row/null
    counts, exact distinct count, min/max (stringified) — the summary
    every pipeline runs before trusting a new input drop. ONE scan:
    all per-column aggregates compute in a single aggregate node and
    the per-column rows unpivot from that one result row. Exact
    COUNT(DISTINCT) is fine at gate scale; at 100 TB swap in
    approx_count_distinct (the q56 sketch shape) — same single-pass
    plan, fixed-size buffers."""
    o = load_table(spark, sf_dir, "orders")
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).alias(f"c_{c}"),
            F.countDistinct(c).alias(f"d_{c}"),
            F.min(c).cast("string").alias(f"mn_{c}"),
            F.max(c).cast("string").alias(f"mx_{c}"),
        ]
    row = o.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("n").alias("n_rows"),
                (F.col("n") - F.col(f"c_{c}")).alias("n_null"),
                F.col(f"d_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")


# --- TPC-H classics over the synthetic star schema -----------------------------------
# q94 (Q5) lives in simjoin.py; these three widen the canonical OLAP
# join/agg surface. Revenue terms round per row at 6 dp into DECIMAL
# sums (order-free, engine-identical) with 2-dp output — the
# bdb1d42 discipline for cross-partition double aggregation.


@query(
    "q140_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 6)
                    AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderdate, l.l_orderkey LIMIT 10
    """,
)
def q140_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top unshipped orders by potential revenue for one
    market segment. Catalyst broadcast-joins the filtered customer dim
    into orders, the pushed date filters prune both fact scans, and
    the order-key aggregate rides the same shuffle as the
    orders-lineitem join; the top-10 is TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(38,6)")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "q141_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           ROUND(CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 6)
                    AS DECIMAL(38,6))) AS DOUBLE), 2) AS revenue,
           ROUND(c.c_acctbal, 2) AS acctbal, n.n_name
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1998-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey LIMIT 20
    """,
)
def q141_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a
    quarter — the churn-risk report. The quarter filter prunes orders
    before the fact-fact join; customer and nation broadcast; one
    shuffle on the customer group key; top-20 TakeOrdered."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")), 6
    ).cast("decimal(38,6)")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(F.sum(rev).cast("double"), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q142_promo_revenue",
    oracle="""
    SELECT ROUND(100.0 * CAST(SUM(CAST(CASE WHEN p.p_type LIKE 'PROMO%'
                 THEN ROUND(l.l_extendedprice * (1 - l.l_discount), 6)
                 ELSE 0 END AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 6)
                 AS DECIMAL(38,6))) AS DOUBLE), 4) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1998-09-01'
      AND l.l_shipdate < TIMESTAMP '1998-10-01'
    """,
)
def q142_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: share of one month's revenue from promotional parts.
    The month filter prunes the fact scan, part broadcasts, and the
    whole answer is one conditional aggregate — no shuffle beyond the
    broadcast join's map side."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-10-01").cast("timestamp"))
    )
    rev6 = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6)
    promo = F.when(
        F.col("p_type").startswith("PROMO"), rev6
    ).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(promo.cast("decimal(38,6)")).cast("double")
                / F.sum(rev6.cast("decimal(38,6)")).cast("double"),
                4,
            ).alias("promo_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
