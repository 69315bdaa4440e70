"""Call-auction clearing batch 182 (q977-q981) — the daily batch
auction (opening/closing cross): every exchange's open and close, and
the allocation problem any matching engine solves. Events become
limit orders: even event_ids buy, odd sell; price = value in exact
cents, size from the props payload; one auction per day.

The whole batch lives on the per-(day, price-level) aggregate — ONE
row per (day, px) with buy and sell size pivoted side by side, so
every cumulative window is deterministic (no duplicate-key ROWS
frames). Cumulative buy demand (descending price) and sell supply
(ascending) make the curves; the clearing price maximizes executable
volume (lowest price on ties — the standard uncross rule).

- q977 the uncross: clearing price, executable volume, demand/supply
  at the cross per day;
- q978 buy-side fill schedule: price priority — levels above the
  clearing price fill fully, the marginal level gets the remainder
  (all integer arithmetic);
- q979 trade surplus: buyer + seller surplus of the uncross in exact
  cent-share units — the welfare number an auction-design comparison
  reads;
- q980 residual imbalance: unexecuted depth on each side at the
  clearing price (what rolls into continuous trading);
- q981 day-over-day clearing-price moves in exact basis-point
  cross-products over the bounded daily series.

100 TB shape: ONE events pass to the (day, px) level aggregate
(bounded by distinct prices per day, not event count); every
cumulative window partitions BY DAY over those bounded levels; q981's
global lag rides the ~30-row daily uncross table (calendar-bounded
class).

Determinism: prices/sizes exact integers; fills are integer clamps;
surplus is integer products summed as BIGINT; bps moves are integer
cross-products with one terminal double.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _jint(d: str) -> str:
    if d == "spark":
        return "CAST(get_json_object(props, '$.k') AS BIGINT)"
    return "CAST(json_extract_string(props, '$.k') AS BIGINT)"


def _levels_cte(d: str) -> str:
    return f"""orders0 AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS px,
             {_jint(d)} AS qty,
             CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS is_buy
      FROM events
    ),
    lvl AS (
      SELECT day, px,
             CAST(SUM(CASE WHEN is_buy = 1 THEN qty ELSE 0 END) AS BIGINT)
               AS bq,
             CAST(SUM(CASE WHEN is_buy = 0 THEN qty ELSE 0 END) AS BIGINT)
               AS sq
      FROM orders0 WHERE qty IS NOT NULL AND qty > 0
      GROUP BY day, px
    ),
    curves AS (
      SELECT day, px, bq, sq,
             CAST(SUM(bq) OVER (PARTITION BY day ORDER BY px DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS demand,
             CAST(SUM(sq) OVER (PARTITION BY day ORDER BY px ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS supply
      FROM lvl
    ),
    uncross AS (
      SELECT day, px AS clearing_px, demand, supply,
             CAST(LEAST(demand, supply) AS BIGINT) AS exec_q
      FROM (
        SELECT c.*,
               ROW_NUMBER() OVER (PARTITION BY day
                 ORDER BY LEAST(demand, supply) DESC, px ASC) AS rk
        FROM curves c
      ) r WHERE rk = 1
    )"""


def _q977_sql(d: str) -> str:
    return f"""
    WITH {_levels_cte(d)}
    SELECT day, clearing_px, exec_q, demand AS demand_at_cross,
           supply AS supply_at_cross
    FROM uncross ORDER BY day
    """


@query("q977_auction_uncross", oracle=_q977_sql("duckdb"))
def q977_auction_uncross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily uncross: the price maximizing executable volume
    (min of cumulative demand and supply), lowest price on ties — the
    opening-cross algorithm. One level aggregate, one day-partitioned
    rank; never a row-level scan past the first aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_q977_sql("spark"))


def _q978_sql(d: str) -> str:
    return f"""
    WITH {_levels_cte(d)},
    buys AS (
      SELECT c.day, c.px, c.bq,
             CAST(c.demand - c.bq AS BIGINT) AS cum_before,
             u.exec_q, u.clearing_px
      FROM curves c
      JOIN uncross u ON u.day = c.day
      WHERE c.bq > 0 AND c.px >= u.clearing_px
    )
    SELECT day, px, bq AS level_size,
           CAST(GREATEST(CAST(0 AS BIGINT),
             LEAST(bq, exec_q - cum_before)) AS BIGINT) AS filled,
           CAST(CASE WHEN exec_q - cum_before >= bq THEN 1 ELSE 0 END AS INT)
             AS fully_filled
    FROM buys ORDER BY day, px DESC
    """


@query("q978_fill_schedule", oracle=_q978_sql("duckdb"))
def q978_fill_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buy-side fill schedule under price priority: levels above the
    clearing price fill completely; the marginal level receives
    exec_q minus everything senior (integer clamp). The allocation a
    matching engine must reproduce exactly — and the one customers
    dispute, hence the exact-integer contract."""
    _views(spark, sf_dir)
    return spark.sql(_q978_sql("spark"))


def _q979_sql(d: str) -> str:
    return f"""
    WITH {_levels_cte(d)},
    bfill AS (
      SELECT c.day,
             CAST(SUM(GREATEST(CAST(0 AS BIGINT),
               LEAST(c.bq, u.exec_q - (c.demand - c.bq)))
               * (c.px - u.clearing_px)) AS BIGINT) AS buyer_surplus
      FROM curves c JOIN uncross u ON u.day = c.day
      WHERE c.bq > 0 AND c.px >= u.clearing_px
      GROUP BY c.day
    ),
    sfill AS (
      SELECT c.day,
             CAST(SUM(GREATEST(CAST(0 AS BIGINT),
               LEAST(c.sq, u.exec_q - (c.supply - c.sq)))
               * (u.clearing_px - c.px)) AS BIGINT) AS seller_surplus
      FROM curves c JOIN uncross u ON u.day = c.day
      WHERE c.sq > 0 AND c.px <= u.clearing_px
      GROUP BY c.day
    )
    SELECT b.day, b.buyer_surplus, s.seller_surplus,
           CAST(b.buyer_surplus + s.seller_surplus AS BIGINT)
             AS total_surplus
    FROM bfill b JOIN sfill s ON s.day = b.day
    ORDER BY b.day
    """


@query("q979_auction_surplus", oracle=_q979_sql("duckdb"))
def q979_auction_surplus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains from trade at the uncross: buyer surplus (limit minus
    clearing price over filled size) plus seller surplus, in exact
    cent-share integer units — maximized by the max-volume rule,
    which is why exchanges use it. Price-priority fills on both
    sides; pure integer products."""
    _views(spark, sf_dir)
    return spark.sql(_q979_sql("spark"))


def _q980_sql(d: str) -> str:
    return f"""
    WITH {_levels_cte(d)}
    SELECT day, clearing_px,
           CAST(demand - exec_q AS BIGINT) AS unfilled_buy_depth,
           CAST(supply - exec_q AS BIGINT) AS unfilled_sell_depth,
           CAST(demand - supply AS BIGINT) AS imbalance,
           CAST(CASE WHEN demand > supply THEN 1
                     WHEN demand < supply THEN -1 ELSE 0 END AS INT)
             AS pressure_side
    FROM uncross ORDER BY day
    """


@query("q980_residual_imbalance", oracle=_q980_sql("duckdb"))
def q980_residual_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual imbalance at the cross: the unexecuted depth each side
    leaves at the clearing price and which side is under pressure —
    the order-imbalance signal continuous trading opens with."""
    _views(spark, sf_dir)
    return spark.sql(_q980_sql("spark"))


def _q981_sql(d: str) -> str:
    return f"""
    WITH {_levels_cte(d)},
    seq AS (
      SELECT day, clearing_px,
             LAG(clearing_px) OVER (ORDER BY day) AS prev_px
      FROM uncross
    )
    SELECT day, clearing_px, prev_px,
           CAST(clearing_px - prev_px AS BIGINT) AS move_cents,
           CAST((clearing_px - prev_px) * 10000 AS DOUBLE) / prev_px
             AS move_bps
    FROM seq WHERE prev_px IS NOT NULL
    ORDER BY day
    """


@query("q981_clearing_price_moves", oracle=_q981_sql("duckdb"))
def q981_clearing_price_moves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day clearing-price moves in cents and basis points
    (integer cross-product, one terminal double division) — the
    price-discovery series an auction-quality monitor tracks. The
    global lag rides the ~30-row daily uncross table (calendar-
    bounded)."""
    _views(spark, sf_dir)
    return spark.sql(_q981_sql("spark"))
