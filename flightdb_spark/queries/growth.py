"""Growth-analytics batch 23 (q276-q278): conversion latency
percentiles (the time-to-convert distribution behind funnel SLAs),
the geometric adstock transform (marketing-mix carryover with
exactly-representable λ = 0.5 coefficients), and new-vs-returning
growth accounting (the DAU decomposition).

Determinism: percentiles are ORDER STATISTICS selected by rank (no
interpolation), ranked on a total order; adstock coefficients are
powers of 0.5 — exact in binary floating point, so the windowed dot
product is engine-exact without rounding tricks; growth counts are
integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q276 — time-to-convert percentiles


@query(
    "q276_time_to_convert",
    oracle="""
    WITH first_click AS (
      SELECT user_id, MIN(ts) AS c_ts FROM events
      WHERE event_type = 'click' GROUP BY user_id
    ),
    first_purchase AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN first_click f
        ON f.user_id = e.user_id AND e.ts > f.c_ts
      WHERE e.event_type = 'purchase'
      GROUP BY e.user_id
    ),
    latencies AS (
      SELECT f.user_id,
             CAST(date_trunc('day', p.p_ts) AS DATE) AS conv_day,
             CAST(FLOOR(epoch(p.p_ts)) - FLOOR(epoch(f.c_ts)) AS BIGINT)
               AS latency_s
      FROM first_click f JOIN first_purchase p USING (user_id)
    ),
    ranked AS (
      SELECT conv_day, latency_s,
             ROW_NUMBER() OVER (PARTITION BY conv_day
                                ORDER BY latency_s, user_id) AS rk,
             COUNT(*) OVER (PARTITION BY conv_day) AS n
      FROM latencies
    )
    SELECT conv_day,
           CAST(MAX(n) AS BIGINT) AS n_conversions,
           CAST(MIN(latency_s) AS BIGINT) AS min_s,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(n / 2.0) AS BIGINT)
                    THEN latency_s END) AS BIGINT) AS median_s,
           CAST(MAX(CASE WHEN rk = CAST(CEIL(n * 0.9) AS BIGINT)
                    THEN latency_s END) AS BIGINT) AS p90_s,
           CAST(MAX(latency_s) AS BIGINT) AS max_s
    FROM ranked
    GROUP BY conv_day
    ORDER BY conv_day
    """,
)
def q276_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: each user's first click to their
    first subsequent purchase, summarized per conversion day as exact
    rank-selected percentiles (median and p90 are the ceil(q*n)-th
    order statistics — DISC selection on a (latency, user) total
    order, no interpolation, so both engines pick the same row).
    This is the funnel-latency SLA table beside q80's conversion
    rates.

    Plan: two user-keyed aggregates (first click; first purchase
    after it via a co-partitioned conditional join on the same key);
    the percentile selection is a day-partitioned window + one
    conditional aggregate — no global sort."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    first_click = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    first_purchase = (
        purchases.join(
            first_click,
            (F.col("pu") == F.col("user_id")) & (F.col("pts") > F.col("c_ts")),
        )
        .groupBy("user_id", "c_ts")
        .agg(F.min("pts").alias("p_ts"))
    )
    latencies = first_purchase.select(
        "user_id",
        F.date_trunc("day", "p_ts").cast("date").alias("conv_day"),
        (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts"))
        .cast("bigint")
        .alias("latency_s"),
    )
    wday = Window.partitionBy("conv_day")
    ranked = latencies.select(
        "conv_day",
        "latency_s",
        F.row_number().over(wday.orderBy("latency_s", "user_id")).alias("rk"),
        F.count(F.lit(1)).over(wday).alias("n"),
    )
    med_rk = F.ceil(F.col("n") / 2.0).cast("bigint")
    p90_rk = F.ceil(F.col("n") * 0.9).cast("bigint")
    return (
        ranked.groupBy("conv_day")
        .agg(
            F.max("n").cast("bigint").alias("n_conversions"),
            F.min("latency_s").cast("bigint").alias("min_s"),
            F.max(F.when(F.col("rk") == med_rk, F.col("latency_s")))
            .cast("bigint")
            .alias("median_s"),
            F.max(F.when(F.col("rk") == p90_rk, F.col("latency_s")))
            .cast("bigint")
            .alias("p90_s"),
            F.max("latency_s").cast("bigint").alias("max_s"),
        )
        .orderBy("conv_day")
    )


# ---------------------------------------------------------------------------
# q277 — geometric adstock transform


@query(
    "q277_adstock_transform",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS clicks
      FROM events GROUP BY day
    ),
    lagged AS (
      SELECT day, clicks,
             LAG(clicks, 1) OVER w AS l1, LAG(clicks, 2) OVER w AS l2,
             LAG(clicks, 3) OVER w AS l3, LAG(clicks, 4) OVER w AS l4,
             LAG(clicks, 5) OVER w AS l5, LAG(clicks, 6) OVER w AS l6,
             LAG(clicks, 7) OVER w AS l7
      FROM daily
      WINDOW w AS (ORDER BY day)
    )
    SELECT day, clicks,
           CAST(clicks AS DOUBLE)
           + 0.5 * COALESCE(l1, 0) + 0.25 * COALESCE(l2, 0)
           + 0.125 * COALESCE(l3, 0) + 0.0625 * COALESCE(l4, 0)
           + 0.03125 * COALESCE(l5, 0) + 0.015625 * COALESCE(l6, 0)
           + 0.0078125 * COALESCE(l7, 0) AS adstock
    FROM lagged
    ORDER BY day
    """,
)
def q277_adstock_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometric adstock (marketing-mix carryover): today's effective
    ad pressure = Σ_{k=0..7} 0.5^k · clicks_{t-k}, the truncated
    geometric carryover every media-mix model starts from. λ = 0.5 is
    chosen deliberately: its powers are EXACT binary doubles, so the
    windowed dot product is engine-identical with no rounding tricks
    — integer counts times exact coefficients, summed in the same
    written order on both sides (DETERMINISM.md §6).

    Plan: one shuffle to the 30-row daily table; the 7 lags ride one
    ordered window over that bounded calendar table (§15: the global
    order is over days, not rows)."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day")).agg(
        F.count(F.when(F.col("event_type") == "click", 1))
        .cast("bigint")
        .alias("clicks")
    )
    w = Window.orderBy("day")
    lags = [F.coalesce(F.lag("clicks", k).over(w), F.lit(0)) for k in range(1, 8)]
    adstock = F.col("clicks").cast("double")
    for k, lagged in enumerate(lags, start=1):
        adstock = adstock + (0.5**k) * lagged
    return daily.select("day", "clicks", adstock.alias("adstock")).orderBy("day")


# ---------------------------------------------------------------------------
# q278 — new vs returning growth accounting


@query(
    "q278_growth_accounting",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(day) AS first_day FROM activity GROUP BY user_id
    ),
    daily AS (
      SELECT a.day,
             CAST(SUM(CASE WHEN a.day = f.first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
             CAST(SUM(CASE WHEN a.day > f.first_day THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users
      FROM activity a JOIN firsts f USING (user_id)
      GROUP BY a.day
    )
    SELECT day, new_users, returning_users,
           new_users + returning_users AS dau,
           CAST(SUM(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cumulative_users
    FROM daily
    ORDER BY day
    """,
)
def q278_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning growth accounting: daily actives decomposed
    into first-ever-seen-today and returning, plus the cumulative
    registered-user curve — the growth dashboard's top row, and the
    decomposition q214's stickiness ratio sits on.

    Plan: one distinct-collapse to (user, day); the first-day table
    rides the SAME user key (co-partitioned join, no extra exchange);
    the cumulative sum is a window over the 30-row daily aggregate
    (§15: calendar-bounded)."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        activity.join(firsts, "user_id")
        .groupBy("day")
        .agg(
            F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("day") > F.col("first_day"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "new_users",
        "returning_users",
        (F.col("new_users") + F.col("returning_users")).alias("dau"),
        F.sum("new_users").over(w).cast("bigint").alias("cumulative_users"),
    ).orderBy("day")
