"""Data-ops batch 59 (q370-q372): the freshness audit (per-table last
timestamp and lag against the newest fact anywhere — the staleness
dashboard every pipeline SLA reads), the order-backlog burndown
(daily open-order count from +1/-1 boundary events, the ops curve
behind lead-time promises), and recommender catalog coverage (how
much of the catalog the co-purchase graph can recommend for, and
the cold-start remainder).

Determinism: freshness lags are exact microseconds; backlog is an
exact signed-count running sum over days; coverage is exact set
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .graphstats import _edges, _edges_sql

# ---------------------------------------------------------------------------
# q370 — freshness audit


@query(
    "q370_freshness_audit",
    oracle="""
    WITH lasts AS (
      SELECT 'events' AS tbl, MAX(epoch_us(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS n FROM events
      UNION ALL
      SELECT 'orders', MAX(epoch_us(o_orderdate)), CAST(COUNT(*) AS BIGINT)
      FROM orders
      UNION ALL
      SELECT 'lineitem', MAX(epoch_us(l_shipdate)), CAST(COUNT(*) AS BIGINT)
      FROM lineitem
    ),
    newest AS (SELECT MAX(last_us) AS global_us FROM lasts)
    SELECT l.tbl AS table_name, l.n AS n_rows,
           CAST(l.last_us AS BIGINT) AS last_event_us,
           CAST(n2.global_us - l.last_us AS BIGINT) AS staleness_us,
           ROUND((n2.global_us - l.last_us) / 86400000000.0, 4)
             AS staleness_days
    FROM lasts l, newest n2
    ORDER BY table_name
    """,
)
def q370_freshness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness audit: each fact table's newest timestamp and its lag
    behind the newest timestamp anywhere in the warehouse — the
    staleness dashboard a data-SLA monitor materializes every cycle
    (q160 audits INTERNAL integrity; this audits RECENCY across
    tables). Scale: one max/count aggregate per table unioned into a
    3-row frame; exact microseconds."""
    ev = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    parts = [
        ("events", ev.agg(F.max(F.unix_micros("ts")).alias("last_us"),
                          F.count(F.lit(1)).cast("bigint").alias("n"))),
        ("orders", o.agg(F.max(F.unix_micros("o_orderdate")).alias("last_us"),
                         F.count(F.lit(1)).cast("bigint").alias("n"))),
        ("lineitem", li.agg(
            F.max(F.unix_micros("l_shipdate")).alias("last_us"),
            F.count(F.lit(1)).cast("bigint").alias("n"))),
    ]
    lasts = None
    for name, df in parts:
        row = df.select(F.lit(name).alias("tbl"), "last_us", "n")
        lasts = row if lasts is None else lasts.unionByName(row)
    newest = lasts.agg(F.max("last_us").alias("global_us"))
    return (
        lasts.join(F.broadcast(newest))
        .select(
            F.col("tbl").alias("table_name"),
            F.col("n").alias("n_rows"),
            F.col("last_us").cast("bigint").alias("last_event_us"),
            (F.col("global_us") - F.col("last_us"))
            .cast("bigint")
            .alias("staleness_us"),
            F.round(
                (F.col("global_us") - F.col("last_us")) / 86_400_000_000.0, 4
            ).alias("staleness_days"),
        )
        .orderBy("table_name")
    )


# ---------------------------------------------------------------------------
# q371 — backlog burndown


@query(
    "q371_backlog_curve",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS opened,
             GREATEST(CAST(o.o_orderdate AS DATE),
                      CAST(MAX(l.l_shipdate) AS DATE)) AS closed
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey, opened
    ),
    deltas AS (
      SELECT opened AS d, 1 AS delta FROM spans
      UNION ALL
      SELECT closed + INTERVAL 1 DAY, -1 FROM spans
    ),
    daily AS (
      SELECT CAST(d AS DATE) AS d, SUM(delta) AS net FROM deltas GROUP BY 1
    ),
    curve AS (
      SELECT d,
             SUM(net) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS backlog
      FROM daily
    ),
    monthly AS (
      SELECT CAST(date_trunc('month', d) AS DATE) AS month,
             MAX(backlog) AS peak_backlog,
             MIN(backlog) AS min_backlog
      FROM curve GROUP BY 1
    )
    SELECT month, CAST(peak_backlog AS BIGINT) AS peak_backlog,
           CAST(min_backlog AS BIGINT) AS min_backlog
    FROM monthly ORDER BY month
    """,
)
def q371_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-backlog burndown: every order is open from its order date
    until its last shipment; +1/-1 boundary events accumulate into
    the daily open-order count, summarized as monthly peak and
    trough — the capacity-planning curve behind lead-time promises
    (q274 counts concurrent EVENTS; this tracks long-lived order
    spans). Scale: boundary events are 2 rows per order; the running
    sum rides the bounded day table (q351 class); monthly rollup is
    ~80 rows."""
    o = load_table(spark, sf_dir, "orders")
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    spans = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("opened"))
        .agg(
            F.greatest(
                F.first(F.col("o_orderdate").cast("date")),
                F.max(F.col("l_shipdate").cast("date")),
            ).alias("closed")
        )
    )
    deltas = spans.select(
        F.col("opened").alias("d"), F.lit(1).alias("delta")
    ).unionByName(
        spans.select(
            F.date_add(F.col("closed"), 1).alias("d"),
            F.lit(-1).alias("delta"),
        )
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    curve = daily.select("d", F.sum("net").over(w).alias("backlog"))
    return (
        curve.groupBy(
            F.date_trunc("month", "d").cast("date").alias("month")
        )
        .agg(
            F.max("backlog").cast("bigint").alias("peak_backlog"),
            F.min("backlog").cast("bigint").alias("min_backlog"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# q372 — recommender catalog coverage

COVER_K = 3


@query(
    "q372_recsys_coverage",
    oracle=f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (SELECT u AS pk, COUNT(*) AS d FROM und GROUP BY u),
    catalog AS (SELECT p_partkey FROM part),
    joined AS (
      SELECT c.p_partkey, COALESCE(deg.d, 0) AS d
      FROM catalog c LEFT JOIN deg ON deg.pk = c.p_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS catalog_size,
           CAST(SUM(CASE WHEN d >= 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_recommendable,
           CAST(SUM(CASE WHEN d >= {COVER_K} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_with_{COVER_K}plus,
           CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_cold_start,
           ROUND(SUM(CASE WHEN d >= 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*),
             6) AS coverage
    FROM joined
    """,
)
def q372_recsys_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recommender catalog coverage: the share of the part catalog the
    co-purchase graph (q267's item-kNN substrate) can recommend for
    at all, the share with at least {COVER_K} neighbors (enough for
    a shelf), and the cold-start remainder that needs a content-
    based fallback — the coverage/cold-start split every recsys
    launch review asks for. Scale: the q267 edge build, one degree
    aggregate, a left join against the part dimension."""
    e = _edges(spark, sf_dir)
    und = e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = und.groupBy(F.col("u").alias("pk")).agg(
        F.count(F.lit(1)).alias("d")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    joined = part.join(deg, part.p_partkey == deg.pk, "left").select(
        F.coalesce(F.col("d"), F.lit(0)).alias("d")
    )
    return joined.agg(
        F.count(F.lit(1)).cast("bigint").alias("catalog_size"),
        F.sum(F.when(F.col("d") >= 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_recommendable"),
        F.sum(F.when(F.col("d") >= COVER_K, 1).otherwise(0))
        .cast("bigint")
        .alias(f"n_with_{COVER_K}plus"),
        F.sum(F.when(F.col("d") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cold_start"),
        F.round(
            F.sum(F.when(F.col("d") >= 1, 1).otherwise(0))
            * 1.0
            / F.count(F.lit(1)),
            6,
        ).alias("coverage"),
    )
