"""Operations batch 20 (q267-q269): the commerce-ops trio — item-item
similarity top-k from basket co-occurrence (the "customers also
bought" recommender primitive), rolling-origin forecast backtesting
(three baseline forecasters scored by MAE per series), and
safety-stock / reorder-point computation from demand moments.

Determinism: co-occurrence cosines are one double division over
integer counts; backtest errors are per-row DECIMAL absolute
differences summed exactly before one double division; safety stock
is straight-line moments arithmetic (sqrt is IEEE-exact,
DETERMINISM.md §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q267 — item-item similarity top-k


@query(
    "q267_item_similarity_topk",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item_counts AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM baskets GROUP BY l_partkey
    ),
    pair_counts AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS cuv
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY u, v
    ),
    sym AS (
      SELECT u AS item, v AS neighbor, cuv FROM pair_counts
      UNION ALL
      SELECT v AS item, u AS neighbor, cuv FROM pair_counts
    ),
    scored AS (
      SELECT s.item, s.neighbor, s.cuv,
             ROUND(s.cuv / sqrt(CAST(ci.c AS DOUBLE) * CAST(cn.c AS DOUBLE)), 6)
               AS cosine
      FROM sym s
      JOIN item_counts ci ON ci.l_partkey = s.item
      JOIN item_counts cn ON cn.l_partkey = s.neighbor
    ),
    ranked AS (
      SELECT item, neighbor, cuv, cosine,
             ROW_NUMBER() OVER (PARTITION BY item
                                ORDER BY cosine DESC, neighbor) AS rk
      FROM scored
    )
    SELECT item, neighbor, cuv, cosine, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY item, rk
    """,
)
def q267_item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative similarity ("customers also bought"):
    cosine over basket co-occurrence — cuv / sqrt(cu * cv) — with the
    top 5 neighbors per item. Pair generation is bounded by BASKET
    WIDTH (~7 items per order -> ~21 pairs per basket), never items²,
    which is what keeps implicit-feedback item-kNN tractable at
    100 TB; the degenerate hot-basket case is the q31 max_bucket
    guard's job upstream. (The oracle keeps the textbook self-join
    formulation — two independent shapes forced to agree.)

    Plan: ONE shuffle on the basket key collects each order's sorted
    item array (set-union partials map side); pairs EXPLODE map side
    from the arrays via a nested HOF — no self-join, no second
    fact-table scan (the join formulation plan-audits to two scans
    plus an extra exchange per side); one (u, v) shuffle counts
    pairs; the vocab-sized item-count table broadcasts twice;
    per-item top-5 is a WindowGroupLimit, ties (cosine DESC,
    neighbor ASC)."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    # ONE shuffle on the basket key builds sorted item arrays (the
    # set-union partial-aggregates map side); pairs then EXPLODE map
    # side from each array — basket-width-bounded, no self-join, no
    # second scan of the fact table
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    item_counts = (
        baskets.select(F.explode("items").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    idx = F.sequence(F.lit(0), F.size("items") - 1)
    pair_arrays = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.slice(F.col("items"), i + 2, F.size("items")),
                        lambda y: F.struct(
                            F.element_at(F.col("items"), i + 1).alias("u"),
                            y.alias("v"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    pair_counts = (
        pair_arrays.select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cuv"))
    )
    sym = pair_counts.select(
        F.col("u").alias("item"), F.col("v").alias("neighbor"), "cuv"
    ).unionByName(
        pair_counts.select(
            F.col("v").alias("item"), F.col("u").alias("neighbor"), "cuv"
        )
    )
    ci = item_counts.select(F.col("l_partkey").alias("item"), F.col("c").alias("ci"))
    cn = item_counts.select(
        F.col("l_partkey").alias("neighbor"), F.col("c").alias("cn")
    )
    scored = (
        sym.join(F.broadcast(ci), "item")
        .join(F.broadcast(cn), "neighbor")
        .select(
            "item",
            "neighbor",
            "cuv",
            F.round(
                F.col("cuv")
                / F.sqrt(F.col("ci").cast("double") * F.col("cn").cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.desc("cosine"), "neighbor")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("item", "neighbor", "cuv", "cosine", "rk")
        .orderBy("item", "rk")
    )


# ---------------------------------------------------------------------------
# q268 — rolling-origin forecast backtest


@query(
    "q268_forecast_backtest",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS v
      FROM events GROUP BY event_type, day
    ),
    preds AS (
      SELECT event_type, day, v,
             LAG(v, 1) OVER w AS naive1,
             LAG(v, 7) OVER w AS snaive7,
             CASE WHEN COUNT(*) OVER w7 = 7
                  THEN SUM(v) OVER w7 ELSE NULL END AS ma7_sum
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day),
             w7 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ),
    scored AS (
      SELECT event_type,
             CAST(ABS(v - naive1) AS DECIMAL(18,2)) AS e1,
             CAST(ABS(v - snaive7) AS DECIMAL(18,2)) AS e7,
             CAST(ROUND(ABS(CAST(v AS DOUBLE) - CAST(ma7_sum AS DOUBLE) / 7.0), 6)
                  AS DECIMAL(18,6)) AS ema
      FROM preds
      WHERE naive1 IS NOT NULL AND snaive7 IS NOT NULL AND ma7_sum IS NOT NULL
    )
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(e1) AS DOUBLE) / COUNT(*), 4) AS mae_naive1,
           ROUND(CAST(SUM(e7) AS DOUBLE) / COUNT(*), 4) AS mae_snaive7,
           ROUND(CAST(SUM(ema) AS DOUBLE) / COUNT(*), 4) AS mae_ma7
    FROM scored
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q268_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest: three baseline forecasters —
    naive (yesterday), seasonal naive (same weekday last week), and
    the trailing 7-day mean — scored by MAE per event-type series over
    the days where all three are defined. This is the evaluation
    harness a forecasting pipeline runs before trusting any model
    (and the denominator MASE-style comparisons build on).

    Plan: one shuffle to the daily table; lags and the trailing-mean
    frame are type-partitioned windows over ~30 rows per key; errors
    are per-row DECIMAL absolute differences (the ma7 error rounds at
    6 dp — finer than the 4-dp output, §5) summed exactly, one double
    division per cell at the end."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).alias("v"))
    w = Window.partitionBy("event_type").orderBy("day")
    w7 = w.rowsBetween(-7, -1)
    preds = daily.select(
        "event_type",
        "day",
        "v",
        F.lag("v", 1).over(w).alias("naive1"),
        F.lag("v", 7).over(w).alias("snaive7"),
        F.when(F.count(F.lit(1)).over(w7) == 7, F.sum("v").over(w7)).alias("ma7_sum"),
    ).filter(
        F.col("naive1").isNotNull()
        & F.col("snaive7").isNotNull()
        & F.col("ma7_sum").isNotNull()
    )
    scored = preds.select(
        "event_type",
        F.abs(F.col("v") - F.col("naive1")).cast("decimal(18,2)").alias("e1"),
        F.abs(F.col("v") - F.col("snaive7")).cast("decimal(18,2)").alias("e7"),
        F.round(
            F.abs(F.col("v").cast("double") - F.col("ma7_sum").cast("double") / 7.0), 6
        )
        .cast("decimal(18,6)")
        .alias("ema"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.round(F.sum("e1").cast("double") / F.count(F.lit(1)), 4).alias(
                "mae_naive1"
            ),
            F.round(F.sum("e7").cast("double") / F.count(F.lit(1)), 4).alias(
                "mae_snaive7"
            ),
            F.round(F.sum("ema").cast("double") / F.count(F.lit(1)), 4).alias(
                "mae_ma7"
            ),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q269 — safety stock / reorder point


@query(
    "q269_safety_stock",
    oracle="""
    WITH daily_demand AS (
      SELECT l_partkey, CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem GROUP BY l_partkey, day
    ),
    mom AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(qty) AS s1,
             SUM(qty * qty) AS s2
      FROM daily_demand GROUP BY l_partkey
      HAVING COUNT(*) >= 20
    )
    SELECT l_partkey AS partkey, n_days,
           ROUND(CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE), 4) AS mean_daily,
           ROUND(sqrt((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                       - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                      / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0))), 4)
             AS std_daily,
           ROUND(1.65 * sqrt((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                             / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
                 * sqrt(7.0), 4) AS safety_stock,
           ROUND(CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) * 7.0
                 + 1.65 * sqrt((CAST(n_days AS DOUBLE) * CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                               / (CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) - 1.0)))
                   * sqrt(7.0), 4) AS reorder_point
    FROM mom
    ORDER BY partkey
    """,
)
def q269_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Safety stock and reorder point (the newsvendor-adjacent
    inventory primitive): per part with >= 20 demand days, daily
    demand mean/std from exact integer moments, safety stock =
    z(0.95)=1.65 x std x sqrt(leadtime=7 days), reorder point = mean
    x leadtime + safety stock. The demand variability term is why
    this needs the engine — per-part second moments over the full
    history, not a point lookup.

    Plan: one shuffle to (part, day) integer demand; one more to the
    per-part moment triple; everything after is straight-line doubles
    mirrored verbatim in the oracle (sqrt is IEEE-exact, §5)."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    daily = li.groupBy(
        "l_partkey", F.date_trunc("day", "l_shipdate").cast("date").alias("day")
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
    mom = (
        daily.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("qty").alias("s1"),
            F.sum(F.col("qty") * F.col("qty")).alias("s2"),
        )
        .filter(F.col("n_days") >= 20)
    )
    nd = F.col("n_days").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    mean = s1d / nd
    std = F.sqrt((nd * s2d - s1d * s1d) / (nd * (nd - 1.0)))
    ss = 1.65 * std * F.sqrt(F.lit(7.0))
    return mom.select(
        F.col("l_partkey").alias("partkey"),
        "n_days",
        F.round(mean, 4).alias("mean_daily"),
        F.round(std, 4).alias("std_daily"),
        F.round(ss, 4).alias("safety_stock"),
        F.round(mean * 7.0 + ss, 4).alias("reorder_point"),
    ).orderBy("partkey")
