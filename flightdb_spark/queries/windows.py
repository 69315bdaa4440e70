"""Window-function surface: derived columns, sessionization, as-of joins.

Maps the reference's per-track array algorithms (Track.PostProcess,
track.go:187-226), METAR as-of lookup (metar/metar.go:94-119), level-
flight runs (analysis/levelflight.go:29-76), trains sessionization
(analysis/trains.go:35-106) and FIFOSet dedup (fifoset.go:10-63) onto
Spark window functions — the set-based re-expression of what the
reference computes one flight at a time in RAM.

All time arithmetic uses integer epoch-microseconds so Spark and the
DuckDB oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import load_table
from . import query

def _order():
    """Deterministic per-key event ordering: ts then event_id tie-break."""
    return [F.col("ts").asc(), F.col("event_id").asc()]


@query(
    "q13_derived_columns",
    oracle="""
    SELECT event_id, user_id,
           ROUND(dv / (dt_us / 1000000.0), 6) + 0.0 AS rate_per_sec,
           dt_us,
           ROUND(running_value, 2) AS running_value
    FROM (
      SELECT event_id, user_id,
             value - LAG(value) OVER w AS dv,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS dt_us,
             SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_value
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) t
    WHERE dt_us IS NOT NULL AND dt_us > 0
    """,
)
def q13_derived_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-window derived columns — the shape of Track.PostProcess
    (track.go:187-226): Δvalue/Δt rate (≈ vertical_speed_fpm,
    track.go:218) and a running cumulative sum (≈ dist_travelled_km,
    track.go:216). One shuffle on the partition key; everything else is
    whole-stage-codegen window evaluation."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_order())
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    us = F.unix_micros(F.col("ts"))
    return (
        ev.withColumn("dv", F.col("value") - F.lag("value").over(w))
        .withColumn("dt_us", us - F.lag(us).over(w))
        .withColumn("running_value", F.sum("value").over(wrun))
        .filter(F.col("dt_us").isNotNull() & (F.col("dt_us") > 0))
        .select(
            "event_id",
            "user_id",
            # + 0.0 normalizes IEEE -0.0 so both engines hash identically
            (F.round(F.col("dv") / (F.col("dt_us") / 1_000_000.0), 6) + F.lit(0.0)).alias(
                "rate_per_sec"
            ),
            "dt_us",
            F.round(F.col("running_value"), 2).alias("running_value"),
        )
    )


@query(
    "q14_sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800 * 1000000
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id,
             COUNT(*) AS n_events,
             epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           ROUND(AVG(n_events), 4) AS avg_events,
           MAX(dur_us) AS max_dur_us
    FROM per_session GROUP BY user_id
    """,
)
def q14_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization ("trains" of gate crossings,
    analysis/trains.go:35-106; 30-min gap like the reference's timeslot
    quantum): lag + cumulative-sum session ids, then per-session and
    per-user rollups."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_order())
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    flagged = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800 * 1_000_000), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(wrun))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )
    return per_session.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.round(F.avg("n_events"), 4).alias("avg_events"),
        F.max("dur_us").alias("max_dur_us"),
    )


@query(
    "q15_gaps_islands",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN value BETWEEN 40 AND 60 THEN 1 ELSE 0 END AS in_band
      FROM events
    ),
    changes AS (
      SELECT user_id, ts, event_id, in_band,
             CASE WHEN in_band <> COALESCE(LAG(in_band) OVER w, -1) THEN 1 ELSE 0 END AS changed
      FROM flagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
      SELECT user_id, ts, event_id, in_band,
             SUM(changed) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM changes
    ),
    islands AS (
      SELECT user_id, run_id, COUNT(*) AS run_len
      FROM runs WHERE in_band = 1
      GROUP BY user_id, run_id
    )
    SELECT user_id, MAX(run_len) AS longest_run, COUNT(*) AS n_runs
    FROM islands GROUP BY user_id
    """,
)
def q15_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of consecutive in-band points — the
    level-flight detector (analysis/levelflight.go:29-76: longest run with
    |angle| ≤ tolerance). flag-change cumulative sum assigns run ids."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(*_order())
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = ev.withColumn(
        "in_band", ((F.col("value") >= 40) & (F.col("value") <= 60)).cast("int")
    )
    changed = F.when(
        F.col("in_band") != F.coalesce(F.lag("in_band").over(w), F.lit(-1)), F.lit(1)
    ).otherwise(F.lit(0))
    runs = flagged.withColumn("run_id", F.sum(changed).over(wrun))
    islands = (
        runs.filter(F.col("in_band") == 1)
        .groupBy("user_id", "run_id")
        .agg(F.count(F.lit(1)).alias("run_len"))
    )
    return islands.groupBy("user_id").agg(
        F.max("run_len").alias("longest_run"), F.count(F.lit(1)).alias("n_runs")
    )


@query(
    "q16_asof_join",
    oracle="""
    WITH ref AS (
      SELECT date_trunc('hour', ts) AS hr, ts AS ref_ts, value AS ref_value,
             ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE event_type = 'signup'
    ),
    ref1 AS (SELECT hr, ref_ts, ref_value FROM ref WHERE rn = 1)
    SELECT p.event_id,
           CASE WHEN cur.ref_ts IS NOT NULL AND cur.ref_ts <= p.ts
                THEN cur.ref_value ELSE prev.ref_value END AS asof_value,
           CASE WHEN cur.ref_ts IS NOT NULL AND cur.ref_ts <= p.ts
                THEN cur.ref_ts ELSE prev.ref_ts END AS asof_ts
    FROM events p
    LEFT JOIN ref1 cur  ON cur.hr  = date_trunc('hour', p.ts)
    LEFT JOIN ref1 prev ON prev.hr = date_trunc('hour', p.ts) - INTERVAL 1 HOUR
    WHERE p.event_type = 'purchase'
    """,
)
def q16_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """METAR-style as-of join with the hour-rewind rule
    (metar/metar.go:94-100: reports land ~:56 past the hour, so if the
    same-hour report is after t, rewind one hour). The hourly reference
    table is tiny → broadcast twice (current hour + previous hour); the
    fact side never shuffles."""
    ev = load_table(spark, sf_dir, "events")
    wh = W.partitionBy("hr").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    ref1 = (
        ev.filter(F.col("event_type") == "signup")
        .withColumn("hr", F.date_trunc("hour", F.col("ts")))
        .withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") == 1)
        .select("hr", F.col("ts").alias("ref_ts"), F.col("value").alias("ref_value"))
    )
    p = ev.filter(F.col("event_type") == "purchase").withColumn(
        "hr", F.date_trunc("hour", F.col("ts"))
    )
    cur = ref1.select(
        F.col("hr").alias("cur_hr"),
        F.col("ref_ts").alias("cur_ts"),
        F.col("ref_value").alias("cur_value"),
    )
    prev = ref1.select(
        F.col("hr").alias("prev_hr"),
        F.col("ref_ts").alias("prev_ts"),
        F.col("ref_value").alias("prev_value"),
    )
    use_cur = F.col("cur_ts").isNotNull() & (F.col("cur_ts") <= F.col("ts"))
    return (
        p.join(F.broadcast(cur), p.hr == cur.cur_hr, "left")
        .join(F.broadcast(prev), p.hr == F.col("prev_hr") + F.expr("INTERVAL 1 HOUR"), "left")
        .select(
            "event_id",
            F.when(use_cur, F.col("cur_value")).otherwise(F.col("prev_value")).alias("asof_value"),
            F.when(use_cur, F.col("cur_ts")).otherwise(F.col("prev_ts")).alias("asof_ts"),
        )
    )


@query(
    "q17_windowed_average",
    oracle="""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                                  RANGE BETWEEN 600000000 PRECEDING AND 600000000 FOLLOWING), 4)
             AS win_avg,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 600000000 PRECEDING AND 600000000 FOLLOWING)
             AS win_n
    FROM events
    """,
)
def q17_windowed_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centered time-window average (WindowedAverageAt, track.go:530-574:
    synthetic point = mean of all points within a centered window) as a
    range-frame window over epoch-microseconds (±10 min)."""
    ev = load_table(spark, sf_dir, "events")
    wr = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-600_000_000, 600_000_000)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(wr), 4).alias("win_avg"),
        F.count(F.lit(1)).over(wr).alias("win_n"),
    )


@query(
    "q18_histogram_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(AVG(value), 4) AS mean_value,
           ROUND(STDDEV(value), 4) AS sd_value,
           ROUND(quantile_cont(value, 0.5), 4) AS p50,
           ROUND(quantile_cont(value, 0.9), 4) AS p90
    FROM events GROUP BY event_type
    """,
)
def q18_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram summary stats (the report framework's histogram
    accumulator: N, mean, stddev, p50, p90 — report/report.go:50,
    224-230). Exact interpolated percentiles, not approx, to match the
    oracle; at 100 TB swap to percentile_approx."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("value"), 4).alias("mean_value"),
        F.round(F.stddev("value"), 4).alias("sd_value"),
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
    )


@query(
    "q19_value_banding",
    oracle="""
    SELECT CONCAT('B', LPAD(CAST(CAST(ROUND(value / 10.0, 0) AS BIGINT) * 10 AS VARCHAR), 5, '0'))
             AS band,
           COUNT(*) AS n
    FROM events GROUP BY 1
    """,
)
def q19_value_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding to nearest 10 with zero-padded label — altitude stacking
    (analysis/altitudestacking.go:15-18: round to nearest 1000 ft band
    string) and speed banding (report/listmatches.go:148-151)."""
    ev = load_table(spark, sf_dir, "events")
    band = (F.round(F.col("value") / 10.0, 0).cast("bigint") * 10).cast("string")
    return ev.groupBy(
        F.concat(F.lit("B"), F.lpad(band, 5, "0")).alias("band")
    ).agg(F.count(F.lit(1)).alias("n"))


@query(
    "q20_dedup_tumbling",
    oracle="""
    SELECT event_id, user_id, event_type, ts
    FROM (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                                             epoch_us(ts) // 7200000000
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
)
def q20_dedup_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recently-seen suppression (FIFOSet, fifoset.go:10-63: dedupe
    registration:callsign for 2 h) re-expressed as keep-first per key per
    2-hour tumbling window — the deterministic batch analog of
    dropDuplicates-within-watermark."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr("unix_micros(ts) div 7200000000")  # integer floor-div, matches DuckDB //
    w = W.partitionBy("user_id", "event_type", bucket).orderBy(*_order())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", "ts")
    )


@query(
    "q79_generic_asof",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    buys AS (
      SELECT user_id, ts AS buy_ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT c.user_id, c.event_id, c.ts,
           b.value AS value_asof, b.buy_ts AS ts_asof
    FROM clicks c
    ASOF LEFT JOIN buys b
      ON c.user_id = b.user_id AND c.ts >= b.buy_ts
    """,
)
def q79_generic_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General backward as-of join (operators/asof.py): every click
    gets the user's latest prior-or-equal purchase value. DuckDB checks
    it with its native ASOF JOIN; the Spark side is the union+window
    form — one shuffle on the key, a per-partition sort, no
    BroadcastNestedLoop range join anywhere (also the METAR lookup's
    shape, metar/metar.go:94-119)."""
    from ..operators.asof import asof_join_backward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return asof_join_backward(
        clicks, buys, on="user_id", value_cols=("value",)
    ).select(
        "user_id", "event_id", "ts",
        F.col("value_asof"), F.col("ts_asof"),
    )


@query(
    "q80_conversion_funnel",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
    ),
    buys AS (
      SELECT user_id, ts AS buy_ts, value FROM events WHERE event_type = 'purchase'
    ),
    joined AS (
      SELECT c.user_id, c.ts, b.buy_ts, b.value
      FROM clicks c
      ASOF LEFT JOIN buys b
        ON c.user_id = b.user_id AND c.ts <= b.buy_ts
    )
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS n_clicks,
           COUNT(CASE WHEN buy_ts IS NOT NULL
                       AND epoch(buy_ts) - epoch(ts) <= 1800
                      THEN 1 END) AS n_converted,
           ROUND(CAST(SUM(CASE WHEN buy_ts IS NOT NULL
                                AND epoch(buy_ts) - epoch(ts) <= 1800
                               THEN ROUND(value, 6) ELSE 0 END)
                      AS DECIMAL(38,6))::DOUBLE, 2) AS converted_value
    FROM joined GROUP BY day
    """,
)
def q80_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase conversion funnel: for each click, the user's
    NEXT purchase (forward as-of, operators/asof.py); converted =
    within 30 minutes. Daily counts + exactly-accumulated converted
    value (decimal sum — merge-order independent). DuckDB checks the
    forward direction with ASOF LEFT JOIN ON ts <= buy_ts."""
    from ..operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    j = asof_join_forward(clicks, buys, on="user_id", value_cols=("value",))
    conv = F.col("ts_asof").isNotNull() & (
        F.col("ts_asof").cast("double") - F.col("ts").cast("double") <= 1800
    )
    return (
        j.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count(F.when(conv, 1)).alias("n_converted"),
            F.round(
                F.sum(
                    F.when(conv, F.round(F.col("value_asof"), 6))
                    .otherwise(F.lit(0.0))
                    .cast("decimal(38,6)")
                ).cast("double"),
                2,
            ).alias("converted_value"),
        )
    )


@query(
    "q98_funnel3",
    oracle="""
    WITH views AS (
      SELECT user_id, ts AS v_ts FROM events WHERE event_type = 'view'
    ),
    clicks AS (
      SELECT user_id, ts AS c_ts FROM events WHERE event_type = 'click'
    ),
    buys AS (
      SELECT user_id, ts AS b_ts FROM events WHERE event_type = 'purchase'
    ),
    s1 AS (
      SELECT v.user_id, v.v_ts, c.c_ts
      FROM views v
      ASOF LEFT JOIN clicks c ON v.user_id = c.user_id AND v.v_ts <= c.c_ts
    ),
    s2 AS (
      SELECT s1.user_id, s1.v_ts, s1.c_ts, b.b_ts
      FROM s1
      ASOF LEFT JOIN buys b ON s1.user_id = b.user_id AND s1.c_ts <= b.b_ts
    ),
    flags AS (
      SELECT CAST(v_ts AS DATE) AS day,
             CASE WHEN c_ts IS NOT NULL
                   AND epoch_us(c_ts) - epoch_us(v_ts) <= 1800000000
                  THEN 1 ELSE 0 END AS f2,
             CASE WHEN c_ts IS NOT NULL
                   AND epoch_us(c_ts) - epoch_us(v_ts) <= 1800000000
                   AND b_ts IS NOT NULL
                   AND epoch_us(b_ts) - epoch_us(c_ts) <= 1800000000
                  THEN 1 ELSE 0 END AS f3
      FROM s2
    )
    SELECT day,
           COUNT(*) AS n_views,
           CAST(SUM(f2) AS BIGINT) AS n_clicked,
           CAST(SUM(f3) AS BIGINT) AS n_purchased,
           ROUND(SUM(f3) * 1.0 / COUNT(*), 6) AS conversion
    FROM flags GROUP BY day
    """,
)
def q98_funnel3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order three-step funnel (view -> first click after it ->
    first purchase after that click, each step within 30 min):
    two chained forward as-of joins (operators/asof.py — union+window,
    one shuffle on user_id each, never a range join), then a daily
    aggregate. Step windows compare exact integer microseconds. The
    product-analytics query every events pipeline runs; doubles as the
    composition test of the as-of operator with itself."""
    from ..operators.asof import asof_join_forward

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("ts").alias("c_ts")
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("ts").alias("b_ts")
    )
    s1 = asof_join_forward(
        views, clicks, on="user_id", left_ts="v_ts", right_ts="ts",
        value_cols=("c_ts",),
    ).select("user_id", "v_ts", F.col("c_ts_asof").alias("c_ts"))
    s2 = asof_join_forward(
        s1.withColumn("_l", F.coalesce("c_ts", F.lit("9999-01-01").cast("timestamp"))),
        buys, on="user_id", left_ts="_l", right_ts="ts", value_cols=("b_ts",),
    ).select("user_id", "v_ts", "c_ts", F.col("b_ts_asof").alias("b_ts"))
    us = 1_800_000_000
    f2 = F.when(
        F.col("c_ts").isNotNull()
        & (F.unix_micros("c_ts") - F.unix_micros("v_ts") <= us),
        1,
    ).otherwise(0)
    f3 = F.when(
        F.col("c_ts").isNotNull()
        & (F.unix_micros("c_ts") - F.unix_micros("v_ts") <= us)
        & F.col("b_ts").isNotNull()
        & (F.unix_micros("b_ts") - F.unix_micros("c_ts") <= us),
        1,
    ).otherwise(0)
    return (
        s2.select(F.col("v_ts").cast("date").alias("day"), f2.alias("f2"), f3.alias("f3"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_views"),
            F.sum("f2").alias("n_clicked"),
            F.sum("f3").alias("n_purchased"),
            F.round(F.sum("f3") * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "conversion"
            ),
        )
    )


@query(
    "q105_time_weighted_avg",
    oracle="""
    WITH seq AS (
      SELECT user_id, value, epoch_us(ts) AS t,
             LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    iv AS (SELECT user_id, value, nxt - t AS w FROM seq WHERE nxt IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(SUM(w) AS BIGINT) AS total_us,
           ROUND(CAST(SUM(CAST(ROUND(value * w, 6) AS DECIMAL(38,6))) AS DOUBLE)
                 / SUM(w), 6) AS twap
    FROM iv GROUP BY user_id
    """,
)
def q105_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value stream (TWAP): each
    observation holds until the next one, so it weighs by its interval
    in exact integer microseconds. One shuffle on user_id (lead window
    + final agg co-partitioned); the weighted sum rounds per row and
    accumulates in DECIMAL, the weight sum is exact integer — the
    whole statistic is engine- and partitioning-independent."""
    ev = load_table(spark, sf_dir, "events")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros("ts").alias("t"),
        F.lead(F.unix_micros("ts")).over(wseq).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    iv = seq.select("user_id", "value", (F.col("nxt") - F.col("t")).alias("w"))
    return iv.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("w").alias("total_us"),
        F.round(
            F.sum(F.round(F.col("value") * F.col("w"), 6).cast("decimal(38,6)"))
            .cast("double")
            / F.sum("w"),
            6,
        ).alias("twap"),
    )


@query(
    "q106_retention_cohorts",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    firsts AS (
      SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    ),
    flags AS (
      SELECT f.cohort_day, f.user_id,
             MAX(CASE WHEN a.day = f.cohort_day + INTERVAL 1 DAY
                      THEN 1 ELSE 0 END) AS d1,
             MAX(CASE WHEN a.day = f.cohort_day + INTERVAL 7 DAY
                      THEN 1 ELSE 0 END) AS d7
      FROM firsts f JOIN activity a USING (user_id)
      GROUP BY f.cohort_day, f.user_id
    )
    SELECT cohort_day,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(d1) AS BIGINT) AS n_d1,
           CAST(SUM(d7) AS BIGINT) AS n_d7,
           ROUND(SUM(d1) * 1.0 / COUNT(*), 6) AS d1_rate,
           ROUND(SUM(d7) * 1.0 / COUNT(*), 6) AS d7_rate
    FROM flags GROUP BY cohort_day
    """,
)
def q106_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/D7 retention by first-seen cohort: distinct (user, day)
    activity, each user's cohort day, then exact-day return flags —
    the product-analytics staple. The cohort join keys on user_id
    (both sides pre-shuffled there by their own aggregates, so it
    co-partitions); all counts are integers, rates a single division."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    firsts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    flags = (
        firsts.join(activity, "user_id")
        .groupBy("cohort_day", "user_id")
        .agg(
            F.max(
                F.when(
                    F.col("day") == F.date_add(F.col("cohort_day"), 1), 1
                ).otherwise(0)
            ).alias("d1"),
            F.max(
                F.when(
                    F.col("day") == F.date_add(F.col("cohort_day"), 7), 1
                ).otherwise(0)
            ).alias("d7"),
        )
    )
    return flags.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("d1").alias("n_d1"),
        F.sum("d7").alias("n_d7"),
        F.round(F.sum("d1") * F.lit(1.0) / F.count(F.lit(1)), 6).alias("d1_rate"),
        F.round(F.sum("d7") * F.lit(1.0) / F.count(F.lit(1)), 6).alias("d7_rate"),
    )
