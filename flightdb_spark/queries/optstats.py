"""Optimizer-statistics batch 61 (q375-q376): the two estimation
audits behind every cost-based planner — join-cardinality estimation
(|A join B| ~ |A|*|B| / max(ndv) under uniformity, measured against
the actual join size with its q-error) and filter-selectivity
estimation (the independence assumption: multiply marginal
selectivities — measured against actual conjunctive selectivity).
These are the checks a query engine's stats subsystem runs to know
where its own estimates mislead it (CBO misestimation is the root
cause of most bad plans at 100 TB; AQE exists because of exactly
the errors these queries measure).

Determinism: all counts exact; q-errors are single divisions of
exact ratios rounded at the edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# ---------------------------------------------------------------------------
# q375 — join-cardinality estimation audit


@query(
    "q375_join_cardinality_audit",
    oracle="""
    WITH stats AS (
      SELECT 'orders_x_lineitem' AS join_pair,
             (SELECT COUNT(*) FROM orders) AS n_left,
             (SELECT COUNT(*) FROM lineitem) AS n_right,
             GREATEST((SELECT COUNT(DISTINCT o_orderkey) FROM orders),
                      (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem))
               AS max_ndv,
             (SELECT COUNT(*) FROM orders o
              JOIN lineitem l ON l.l_orderkey = o.o_orderkey) AS actual
      UNION ALL
      SELECT 'customer_x_orders',
             (SELECT COUNT(*) FROM customer),
             (SELECT COUNT(*) FROM orders),
             GREATEST((SELECT COUNT(DISTINCT c_custkey) FROM customer),
                      (SELECT COUNT(DISTINCT o_custkey) FROM orders)),
             (SELECT COUNT(*) FROM customer c
              JOIN orders o ON o.o_custkey = c.c_custkey)
      UNION ALL
      SELECT 'part_x_lineitem',
             (SELECT COUNT(*) FROM part),
             (SELECT COUNT(*) FROM lineitem),
             GREATEST((SELECT COUNT(DISTINCT p_partkey) FROM part),
                      (SELECT COUNT(DISTINCT l_partkey) FROM lineitem)),
             (SELECT COUNT(*) FROM part p
              JOIN lineitem l ON l.l_partkey = p.p_partkey)
    )
    SELECT join_pair,
           CAST(FLOOR(n_left * 1.0 * n_right / max_ndv) AS BIGINT)
             AS estimated_rows,
           CAST(actual AS BIGINT) AS actual_rows,
           ROUND(GREATEST(
             (n_left * 1.0 * n_right / max_ndv) / actual,
             actual / (n_left * 1.0 * n_right / max_ndv)), 4) AS q_error
    FROM stats ORDER BY join_pair
    """,
)
def q375_join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-cardinality estimation audit: the textbook CBO estimate
    |A| * |B| / max(ndv(key)) for three natural-key joins, against
    the actual join size, scored by q-error (max of over/under
    ratio, the metric the cardinality-estimation literature uses).
    PK-FK joins under uniformity should land near q-error 1; where
    they don't, the planner's independence/uniformity assumptions
    are lying — the evidence for runtime re-planning (AQE). Scale:
    count/ndv statistics are single aggregates per table; actuals
    are the natural-key joins themselves."""
    o = load_table(spark, sf_dir, "orders")
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")

    def audit(name, left, right, lkey, rkey):
        # one lazy row per pair: stats + actual assembled via broadcast
        # single-row joins (no driver-side action loop)
        ls = left.agg(
            F.count(F.lit(1)).alias("n_left"),
            F.count_distinct(lkey).alias("ndv_l"),
        )
        rs = right.agg(
            F.count(F.lit(1)).alias("n_right"),
            F.count_distinct(rkey).alias("ndv_r"),
        )
        act = left.join(right, left[lkey] == right[rkey]).agg(
            F.count(F.lit(1)).alias("actual")
        )
        est = (
            F.col("n_left")
            * F.col("n_right")
            / F.greatest(F.col("ndv_l"), F.col("ndv_r"))
        )
        return (
            ls.join(F.broadcast(rs))
            .join(F.broadcast(act))
            .select(
                F.lit(name).alias("join_pair"),
                # FLOOR before the integer cast on BOTH engines: DuckDB's
                # CAST(double AS BIGINT) rounds while Spark's truncates, so
                # a bare cast diverges whenever the estimate is fractional
                # (non-dense keys). FLOOR makes both sides exact-truncate.
                F.floor(est).cast("bigint").alias("estimated_rows"),
                F.col("actual").cast("bigint").alias("actual_rows"),
                F.round(
                    F.greatest(
                        est / F.col("actual"), F.col("actual") / est
                    ),
                    4,
                ).alias("q_error"),
            )
        )

    out = (
        audit("customer_x_orders", c, o, "c_custkey", "o_custkey")
        .unionByName(audit("orders_x_lineitem", o, li, "o_orderkey",
                           "l_orderkey"))
        .unionByName(audit("part_x_lineitem", p, li, "p_partkey",
                           "l_partkey"))
    )
    return out.orderBy("join_pair")


# ---------------------------------------------------------------------------
# q376 — filter-selectivity (independence) audit


@query(
    "q376_selectivity_audit",
    oracle="""
    WITH stats AS (
      SELECT
        (SELECT COUNT(*) FROM orders) AS n,
        (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'O') AS a,
        (SELECT COUNT(*) FROM orders
         WHERE o_orderpriority = '1-URGENT') AS b,
        (SELECT COUNT(*) FROM orders
         WHERE o_orderstatus = 'O'
           AND o_orderpriority = '1-URGENT') AS ab
    )
    SELECT ROUND(a * 1.0 / n, 6) AS sel_status,
           ROUND(b * 1.0 / n, 6) AS sel_priority,
           ROUND((a * 1.0 / n) * (b * 1.0 / n), 6)
             AS est_conj_selectivity,
           ROUND(ab * 1.0 / n, 6) AS actual_conj_selectivity,
           ROUND(GREATEST(
             ((a * 1.0 / n) * (b * 1.0 / n)) / NULLIF(ab * 1.0 / n, 0),
             (ab * 1.0 / n) / NULLIF((a * 1.0 / n) * (b * 1.0 / n), 0)),
             4) AS q_error
    FROM stats
    """,
)
def q376_selectivity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-selectivity audit: the independence assumption —
    sel(A AND B) ~ sel(A) * sel(B) — measured against the actual
    conjunctive selectivity of (status = 'O' AND priority =
    '1-URGENT'), with the q-error. Correlated predicates are THE
    classic cardinality-estimation failure; this query quantifies
    how far independence is off on this data (near 1 here because
    the synthetic columns are independent — the audit proves it
    rather than assumes it). Scale: four count aggregates over one
    scan (Catalyst collapses them into a single pass)."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("o_orderstatus") == "O", 1).otherwise(0)
        ).alias("a"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("b"),
        F.sum(
            F.when(
                (F.col("o_orderstatus") == "O")
                & (F.col("o_orderpriority") == "1-URGENT"),
                1,
            ).otherwise(0)
        ).alias("ab"),
    )
    sa = F.col("a") * 1.0 / F.col("n")
    sb = F.col("b") * 1.0 / F.col("n")
    sab = F.col("ab") * 1.0 / F.col("n")
    est = sa * sb
    return agg.select(
        F.round(sa, 6).alias("sel_status"),
        F.round(sb, 6).alias("sel_priority"),
        F.round(est, 6).alias("est_conj_selectivity"),
        F.round(sab, 6).alias("actual_conj_selectivity"),
        F.round(
            F.greatest(
                est / F.nullif(sab, F.lit(0)),
                sab / F.nullif(est, F.lit(0)),
            ),
            4,
        ).alias("q_error"),
    )
