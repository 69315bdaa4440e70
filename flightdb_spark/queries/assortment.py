"""Assortment batch 31 (q294-q296): effective catalog size (the
entropy-based "how many products do we REALLY sell" diversity
number), price-ladder gap analysis (where the assortment's price
points leave holes), and week-over-week market-share shift (the
share-movers table).

Determinism: entropy ln terms at 7 dp into DECIMAL sums
(DETERMINISM.md §5); ladder gaps ride rank windows over per-brand
DISTINCT price points; share shifts are straight-line doubles over
exact DECIMAL revenue sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_DEC6 = "decimal(38,6)"
_DEC7 = "decimal(38,7)"


# ---------------------------------------------------------------------------
# q294 — effective catalog size


@query(
    "q294_effective_catalog",
    oracle="""
    WITH per_part AS (
      SELECT l_partkey,
             SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(38,6))) AS rev
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT SUM(rev) AS trev, CAST(COUNT(*) AS BIGINT) AS n_parts
            FROM per_part),
    terms AS (
      SELECT p.l_partkey,
             CAST(ROUND(-(CAST(p.rev AS DOUBLE) / CAST(t.trev AS DOUBLE))
                        * ln(CAST(p.rev AS DOUBLE) / CAST(t.trev AS DOUBLE)), 7)
                  AS DECIMAL(38,7)) AS h_term,
             t.n_parts
      FROM per_part p CROSS JOIN tot t
      WHERE CAST(p.rev AS DOUBLE) > 0
    )
    SELECT MAX(n_parts) AS n_parts,
           ROUND(CAST(SUM(h_term) AS DOUBLE), 6) AS revenue_entropy,
           ROUND(exp(CAST(SUM(h_term) AS DOUBLE)), 2) AS effective_catalog,
           ROUND(exp(CAST(SUM(h_term) AS DOUBLE)) / MAX(n_parts), 6)
             AS diversity_ratio
    FROM terms
    """,
)
def q294_effective_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective catalog size: exp(Shannon entropy of revenue shares)
    — the "equivalent number of equally-selling products", the
    assortment diversity number that a raw SKU count and even q148's
    Gini hide (1000 SKUs with effective size 40 is a hit-driven
    catalog). Entropy terms round at 7 dp into a DECIMAL sum; exp()
    runs once on the assembled double.

    Plan: one part-keyed revenue aggregate; the total is a single
    broadcast row; one more single-row aggregate assembles entropy."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice"), 6).cast(_DEC6)).alias("rev")
    )
    tot = per_part.agg(
        F.sum("rev").alias("trev"), F.count(F.lit(1)).cast("bigint").alias("n_parts")
    )
    share = F.col("rev").cast("double") / F.col("trev").cast("double")
    terms = (
        per_part.join(F.broadcast(tot))
        .filter(F.col("rev").cast("double") > 0)
        .select(
            F.round(-share * F.log(share), 7).cast(_DEC7).alias("h_term"),
            "n_parts",
        )
    )
    h = F.sum("h_term").cast("double")
    return terms.agg(
        F.max("n_parts").alias("n_parts"),
        F.round(h, 6).alias("revenue_entropy"),
        F.round(F.exp(h), 2).alias("effective_catalog"),
        F.round(F.exp(h) / F.max("n_parts"), 6).alias("diversity_ratio"),
    )


# ---------------------------------------------------------------------------
# q295 — price-ladder gaps


@query(
    "q295_price_ladder",
    oracle="""
    WITH points AS (
      SELECT DISTINCT p_brand, CAST(ROUND(p_retailprice, 2) AS DECIMAL(12,2))
               AS price
      FROM part
    ),
    laddered AS (
      SELECT p_brand, price,
             LAG(price) OVER (PARTITION BY p_brand ORDER BY price) AS prev_price,
             CAST(COUNT(*) OVER (PARTITION BY p_brand) AS BIGINT) AS n_points
      FROM points
    ),
    gaps AS (
      SELECT p_brand, n_points, prev_price AS gap_low, price AS gap_high,
             ROUND(CAST(price AS DOUBLE) / CAST(prev_price AS DOUBLE), 6)
               AS gap_ratio,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY CAST(price AS DOUBLE)
                                         / CAST(prev_price AS DOUBLE) DESC,
                                         price) AS rk
      FROM laddered
      WHERE prev_price IS NOT NULL AND CAST(prev_price AS DOUBLE) > 0
    )
    SELECT p_brand, n_points,
           ROUND(CAST(gap_low AS DOUBLE), 2) AS gap_low,
           ROUND(CAST(gap_high AS DOUBLE), 2) AS gap_high,
           gap_ratio
    FROM gaps WHERE rk = 1
    ORDER BY p_brand
    """,
)
def q295_price_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-ladder gap analysis: per brand, the largest
    MULTIPLICATIVE jump between adjacent distinct price points — the
    hole in the ladder where a competitor's mid-price product fits
    (pricing teams read gap_ratio > ~1.5 as an assortment gap).
    Ratios, not differences: a $10 gap means nothing at $5000.

    Plan: distinct collapse to per-brand price points; lag + count +
    the per-brand argmax all ride brand-partitioned windows over the
    collapsed (bounded) point sets; ties break toward the lower
    ladder position."""
    p = load_table(spark, sf_dir, "part")
    points = p.select(
        "p_brand", F.round("p_retailprice", 2).cast("decimal(12,2)").alias("price")
    ).distinct()
    wb = Window.partitionBy("p_brand")
    laddered = points.select(
        "p_brand",
        "price",
        F.lag("price").over(wb.orderBy("price")).alias("prev_price"),
        F.count(F.lit(1)).over(wb).cast("bigint").alias("n_points"),
    )
    gap_ratio = F.col("price").cast("double") / F.col("prev_price").cast("double")
    gaps = (
        laddered.filter(
            F.col("prev_price").isNotNull()
            & (F.col("prev_price").cast("double") > 0)
        )
        .withColumn("gap_ratio", F.round(gap_ratio, 6))
        .withColumn(
            "rk",
            F.row_number().over(
                wb.orderBy(
                    F.desc(
                        F.col("price").cast("double")
                        / F.col("prev_price").cast("double")
                    ),
                    "price",
                )
            ),
        )
    )
    return (
        gaps.filter(F.col("rk") == 1)
        .select(
            "p_brand",
            "n_points",
            F.round(F.col("prev_price").cast("double"), 2).alias("gap_low"),
            F.round(F.col("price").cast("double"), 2).alias("gap_high"),
            "gap_ratio",
        )
        .orderBy("p_brand")
    )


# ---------------------------------------------------------------------------
# q296 — weekly market-share shift


@query(
    "q296_share_shift",
    oracle="""
    WITH weekly AS (
      SELECT CAST(date_trunc('week', o.o_orderdate) AS DATE) AS week,
             c.c_mktsegment AS segment,
             SUM(CAST(ROUND(o.o_totalprice, 6) AS DECIMAL(38,6))) AS rev
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY week, segment
    ),
    tot AS (
      SELECT week, SUM(rev) AS wrev FROM weekly GROUP BY week
    ),
    shares AS (
      SELECT w.week, w.segment,
             CAST(w.rev AS DOUBLE) / CAST(t.wrev AS DOUBLE) AS share
      FROM weekly w JOIN tot t USING (week)
    ),
    shifted AS (
      SELECT week, segment, share,
             LAG(share) OVER (PARTITION BY segment ORDER BY week) AS prev_share
      FROM shares
    )
    SELECT week, segment,
           ROUND(share, 6) AS share,
           ROUND(share - prev_share, 6) AS share_shift
    FROM shifted
    WHERE prev_share IS NOT NULL
      AND ABS(share - prev_share) > 0.02
    ORDER BY week, segment
    """,
)
def q296_share_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week market-share movers: each customer segment's
    revenue share per week, flagging shifts of more than 2 share
    points — the competitive-dynamics alert on top of q09/q166's
    static share tables. Shares divide exact DECIMAL sums once,
    straight-line; the shift is a segment-partitioned lag.

    Plan: customer dim broadcasts; one shuffle to the (week, segment)
    DECIMAL rollup; weekly totals re-aggregate the same partials and
    join back on the ~80-row week key; the lag is a 5-partition
    window."""
    o = ensure_parallelism(load_table(spark, sf_dir, "orders"))
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    weekly = (
        o.join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.date_trunc("week", "o_orderdate").cast("date").alias("week"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice"), 6).cast(_DEC6)).alias("rev"))
    )
    tot = weekly.groupBy("week").agg(F.sum("rev").alias("wrev"))
    shares = weekly.join(tot, "week").select(
        "week",
        "segment",
        (F.col("rev").cast("double") / F.col("wrev").cast("double")).alias("share"),
    )
    w = Window.partitionBy("segment").orderBy("week")
    shifted = shares.withColumn("prev_share", F.lag("share").over(w))
    return (
        shifted.filter(
            F.col("prev_share").isNotNull()
            & (F.abs(F.col("share") - F.col("prev_share")) > 0.02)
        )
        .select(
            "week",
            "segment",
            F.round("share", 6).alias("share"),
            F.round(F.col("share") - F.col("prev_share"), 6).alias("share_shift"),
        )
        .orderBy("week", "segment")
    )
