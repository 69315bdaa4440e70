"""Ranking-data batch 54 (q356-q358): quantile regression by pinball-
loss grid search (the tau-quantile trend line, closed-form-checkable
because the grid is finite), position-bias estimation (the click-
model curve that debiases logged rankings), and skip-above preference
pair extraction (the classic learning-to-rank training-data
generator: a clicked item beats every item skipped above it).

Determinism: pinball losses accumulate per-row-rounded DECIMAL and
the argmin over the literal slope grid breaks ties toward the
smaller slope; positions are exact row_numbers with event_id
tie-breaks; pair counts are exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

QR_TAU = 0.9
QR_SLOPES = [round(10000.0 * i, 1) for i in range(1, 51)]  # 10k .. 500k

# ---------------------------------------------------------------------------
# q356 — quantile regression via pinball-loss grid


@query(
    "q356_quantile_regression_grid",
    oracle=f"""
    WITH xy AS (
      SELECT o.o_orderkey,
             CAST(COUNT(*) AS DOUBLE) AS x,
             MAX(ROUND(o.o_totalprice, 2)) AS y
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      GROUP BY o.o_orderkey
    ),
    grid AS (SELECT unnest([{", ".join(repr(s) for s in QR_SLOPES)}]) AS b),
    losses AS (
      SELECT g.b,
             SUM(CAST(ROUND(
               CASE WHEN xy.y - g.b * xy.x >= 0
                    THEN {QR_TAU!r} * (xy.y - g.b * xy.x)
                    ELSE ({QR_TAU!r} - 1) * (xy.y - g.b * xy.x) END, 6)
               AS DECIMAL(38,6))) AS pinball
      FROM xy, grid g
      GROUP BY g.b
    ),
    best AS (
      SELECT b, pinball,
             ROW_NUMBER() OVER (ORDER BY pinball, b) AS rn
      FROM losses
    )
    SELECT b AS slope,
           ROUND(CAST(pinball AS DOUBLE), 2) AS pinball_loss,
           CAST((SELECT COUNT(*) FROM xy) AS BIGINT) AS n_orders
    FROM best WHERE rn = 1
    """,
)
def q356_quantile_regression_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (tau = {QR_TAU}) regression through the origin for
    order value vs basket size, fit by exact pinball-loss evaluation
    over a literal slope grid — the 90th-percentile trend line that
    says what a large basket SHOULD cost at the high end (q184's OLS
    fits the mean; q223's Theil-Sen the robust median; this the
    upper tail). A finite grid keeps the argmin closed-form on both
    engines; losses accumulate 6-dp DECIMAL and ties break to the
    smaller slope. Scale: one (order) aggregate, a {len(QR_SLOPES)}-
    way broadcast expansion, a grid-keyed reduction."""
    o = load_table(spark, sf_dir, "orders")
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    xy = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).cast("double").alias("x"),
            F.max(F.round("o_totalprice", 2)).alias("y"),
        )
    )
    grid = spark.createDataFrame([(s,) for s in QR_SLOPES], ["b"])
    resid = F.col("y") - F.col("b") * F.col("x")
    pin = F.when(resid >= 0, QR_TAU * resid).otherwise((QR_TAU - 1) * resid)
    losses = (
        xy.join(F.broadcast(grid))
        .groupBy("b")
        .agg(
            F.sum(F.round(pin, 6).cast("decimal(38,6)")).alias("pinball")
        )
    )
    tot = xy.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
    wbest = W.orderBy(F.col("pinball").asc(), F.col("b").asc())
    return (
        losses.withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("b").alias("slope"),
            F.round(F.col("pinball").cast("double"), 2).alias("pinball_loss"),
            F.col("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# q357 — position-bias curve

POS_MAX = 10


@query(
    "q357_position_bias",
    oracle=f"""
    WITH sessions AS (
      SELECT user_id, CAST(ts AS DATE) AS d, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS pos
      FROM events WHERE event_type IN ('view', 'click')
    ),
    positioned AS (
      SELECT pos,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
      FROM sessions WHERE pos <= {POS_MAX}
    ),
    per_pos AS (
      SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(is_click) AS BIGINT) AS clicks
      FROM positioned GROUP BY pos
    ),
    anchor AS (
      SELECT CAST(clicks AS DOUBLE) / n AS ctr1 FROM per_pos WHERE pos = 1
    )
    SELECT p.pos AS position, p.n, p.clicks,
           ROUND(CAST(p.clicks AS DOUBLE) / p.n, 6) AS ctr,
           ROUND((CAST(p.clicks AS DOUBLE) / p.n) / a.ctr1, 6)
             AS propensity_vs_pos1
    FROM per_pos p, anchor a
    ORDER BY position
    """,
)
def q357_position_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-bias curve: within each user-day impression sequence
    (views and clicks in time order), the click-through rate at each
    of the first {POS_MAX} positions and its ratio to position 1 —
    the examination-propensity curve a counterfactual LTR system
    divides by before training on logged clicks (q319/q320 debias
    ACTIONS; this debiases RANKS). Scale: one user-day window pass,
    a {POS_MAX}-key aggregate, a broadcast anchor row."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    sessions = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .select(
            "event_type",
            F.row_number().over(w).alias("pos"),
        )
        .filter(F.col("pos") <= POS_MAX)
    )
    per_pos = sessions.groupBy("pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("clicks"),
    )
    anchor = per_pos.filter(F.col("pos") == 1).select(
        (F.col("clicks").cast("double") / F.col("n")).alias("ctr1")
    )
    ctr = F.col("clicks").cast("double") / F.col("n")
    return (
        per_pos.join(F.broadcast(anchor))
        .select(
            F.col("pos").alias("position"),
            "n",
            "clicks",
            F.round(ctr, 6).alias("ctr"),
            F.round(ctr / F.col("ctr1"), 6).alias("propensity_vs_pos1"),
        )
        .orderBy("position")
    )


# ---------------------------------------------------------------------------
# q358 — skip-above preference pairs


@query(
    "q358_skip_above_pairs",
    oracle=f"""
    WITH sessions AS (
      SELECT user_id, CAST(ts AS DATE) AS d, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts, event_id) AS pos
      FROM events WHERE event_type IN ('view', 'click')
    ),
    clicks AS (SELECT user_id, d, pos FROM sessions
               WHERE event_type = 'click'),
    views AS (SELECT user_id, d, pos FROM sessions
              WHERE event_type = 'view'),
    pairs AS (
      SELECT c.pos - v.pos AS gap
      FROM clicks c JOIN views v
        ON v.user_id = c.user_id AND v.d = c.d AND v.pos < c.pos
    )
    SELECT LEAST(gap, 10) AS position_gap,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM pairs GROUP BY 1 ORDER BY position_gap
    """,
)
def q358_skip_above_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-above preference pairs: within each user-day sequence, a
    CLICKED position beats every VIEWED (unclicked) position above
    it — Joachims' pair-extraction rule that turns click logs into
    learning-to-rank training pairs, here histogrammed by position
    gap (capped at 10+). Feeds the q304/q306 preference machinery
    with real implicit-feedback pairs. Scale: one user-day window
    pass; the pair join stays inside (user, day) partitions whose
    size is bounded by session length, so the fan-out is per-session
    quadratic but globally linear in sessions."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", F.col("ts").cast("date")).orderBy(
        "ts", "event_id"
    )
    sessions = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .select(
            "user_id",
            F.col("ts").cast("date").alias("d"),
            "event_type",
            F.row_number().over(w).alias("pos"),
        )
    )
    clicks = sessions.filter(F.col("event_type") == "click").select(
        "user_id", "d", F.col("pos").alias("c_pos")
    )
    views = sessions.filter(F.col("event_type") == "view").select(
        "user_id", "d", F.col("pos").alias("v_pos")
    )
    pairs = clicks.join(
        views,
        (clicks.user_id == views.user_id)
        & (clicks.d == views.d)
        & (F.col("v_pos") < F.col("c_pos")),
    ).select((F.col("c_pos") - F.col("v_pos")).alias("gap"))
    return (
        pairs.groupBy(
            F.least(F.col("gap"), F.lit(10)).alias("position_gap")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("position_gap")
    )
