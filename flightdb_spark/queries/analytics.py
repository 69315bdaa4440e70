"""Analytics batch 7 (q182-q188): the remaining expressible TPC-H
classics (Q13 order-count distribution, Q15 top supplier), grouped
closed-form OLS regression, an l-diversity privacy audit beside q178's
k-anonymity, day-over-day trending ranks, linear-interpolation gap
fill (the interpolating sibling of q92's forward fill), and
frame-level scene-cut detection over the video corpus (the temporal
companion to q154's frame dedup).

Determinism per DETERMINISM.md: per-row rounding into DECIMAL
accumulators, final statistics assembled in identically-shaped DOUBLE
expressions, integer microseconds for every time difference, ties
collapsed before order-sensitive windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# ---------------------------------------------------------------------------
# q182 — TPC-H Q13: customer order-count distribution


@query(
    "q182_order_count_distribution",
    oracle="""
    WITH c_orders AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q182_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (the slim-schema adaptation: the comment-pattern
    exclusion becomes a priority-class exclusion): how many customers
    placed 0, 1, 2, ... qualifying orders. The left join keeps
    zero-order customers — the distribution's head — which an inner
    join silently drops. Plan: orders and customer co-shuffle on the
    customer key, the per-customer count reuses that partitioning
    (no second exchange), and the final distribution aggregate is
    bounded by the max order count (~tens of rows)."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    c_orders = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# ---------------------------------------------------------------------------
# q183 — TPC-H Q15: top supplier by quarterly revenue

_Q15_FROM = "1996-01-01"
_Q15_TO = "1996-04-01"


@query(
    "q183_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                                 AS DECIMAL(38,4))) AS DOUBLE), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM}'
        AND l_shipdate <  TIMESTAMP '{_Q15_TO}'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q183_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum revenue over one
    quarter. Revenue accumulates per-row-rounded DECIMAL
    (DETERMINISM.md §1) so the max-equality filter compares identical
    doubles on both engines. Plan: pushed shipdate filter on the fact
    scan, one shuffle on suppkey for the revenue aggregate, the
    1-row global max broadcast back over the bounded revenue table,
    and the supplier dim broadcast into the final join. Spark has no
    automatic subplan reuse, so the quarter-pruned scan+aggregate
    runs once more for the max — at 100 TB persist the
    supplier-bounded revenue table first and both consumers read the
    cached rows instead."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(_Q15_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(_Q15_TO).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            F.round(
                F.sum(
                    F.round(
                        F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                    ).cast("decimal(38,4)")
                ).cast("double"),
                2,
            ).alias("total_revenue")
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# q184 — grouped closed-form OLS regression

# epoch microseconds of 2024-01-01 00:00:00 UTC (DETERMINISM.md §11)
_T0_US = 1_704_067_200_000_000
_HOUR_US = 3_600_000_000


@query(
    "q184_group_ols",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             (epoch_us(ts) - {_T0_US}) // {_HOUR_US} AS x,
             ROUND(value, 6) AS y
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(y * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
      FROM pts GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
           ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 8)
             AS intercept,
           ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM sums ORDER BY event_type
    """,
)
def q184_group_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary least squares (value ~ hours since
    2024-01-01) from single-pass moment sums — the trend-per-segment
    primitive beside q75's correlations (which give direction but not
    magnitude). x is an exact integer hour index, so Sx/Sxx are exact
    BIGINTs; y-moments accumulate per-row-rounded DECIMAL; slope,
    intercept, and r² are assembled in identically-shaped DOUBLE
    expressions (DETERMINISM.md §6). Plan: one shuffle on event_type
    into a bounded (|types|-row) aggregate; the regression arithmetic
    runs on that bounded table — at 100 TB the cost is the one scan."""
    ev = load_table(spark, sf_dir, "events")
    x = ((F.unix_micros("ts") - F.lit(_T0_US)) / _HOUR_US).cast("long")
    # unix_micros - T0 is non-negative here; integer `div` would
    # truncate toward zero while DuckDB's // floors, so keep the
    # domain non-negative (events start 2024-01-01)
    pts = ev.select(
        "event_type",
        F.expr(f"(unix_micros(ts) - {_T0_US}) div {_HOUR_US}").alias("x"),
        F.round("value", 6).alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("y") * F.col("y"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return sums.select(
        "event_type",
        "n",
        F.round(slope, 8).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 8).alias(
            "intercept"
        ),
        F.round(
            num * num / (den * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))),
            6,
        ).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q185 — l-diversity audit (companion to q178 k-anonymity)


@query(
    "q185_l_diversity",
    oracle="""
    WITH groups AS (
      SELECT c_nationkey,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
             CAST(COUNT(*) AS BIGINT) AS gsize,
             CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
      FROM customer GROUP BY c_nationkey, bal_band
    )
    SELECT l,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(gsize) AS BIGINT) AS n_rows,
           CAST(MIN(gsize) AS BIGINT) AS min_group,
           CAST(MAX(gsize) AS BIGINT) AS max_group
    FROM groups GROUP BY l ORDER BY l
    """,
)
def q185_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: for each quasi-identifier group (nation,
    $1000 balance band), how many DISTINCT sensitive values (market
    segment) it contains. A group can be k-anonymous (q178) yet
    l=1-homogeneous — every member shares the sensitive value, so the
    attacker learns it without re-identification. Output is the
    distribution of l across QI groups. Plan: one shuffle on the QI
    tuple (distinct-count runs inside that aggregate), then a rollup
    bounded by max l (|segments| = 5 rows)."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    ).agg(
        F.count(F.lit(1)).alias("gsize"),
        F.countDistinct("c_mktsegment").alias("l"),
    )
    return (
        groups.groupBy("l")
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("gsize").alias("n_rows"),
            F.min("gsize").alias("min_group"),
            F.max("gsize").alias("max_group"),
        )
        .orderBy("l")
    )


# ---------------------------------------------------------------------------
# q186 — day-over-day trending ranks


@query(
    "q186_trending_ranks",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             event_type,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT day, event_type, cnt,
             CAST(ROW_NUMBER() OVER (PARTITION BY day
                    ORDER BY cnt DESC, event_type) AS BIGINT) AS rnk
      FROM daily
    )
    SELECT d.day, d.event_type, d.cnt, d.rnk,
           p.rnk AS prev_rnk,
           p.rnk - d.rnk AS rank_delta
    FROM ranked d
    LEFT JOIN ranked p
      ON p.event_type = d.event_type
     AND CAST(p.day AS DATE) + 1 = CAST(d.day AS DATE)
    ORDER BY d.day, d.rnk
    """,
)
def q186_trending_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day trending: per-day event-type counts ranked within
    the day (count desc, type as the total tie-break — DETERMINISM.md
    §4), each joined to its previous-day rank; positive rank_delta =
    rising. The first day carries NULL prev_rnk (a left join — an
    inner join would silently drop the first day AND any type absent
    yesterday, which is exactly what "newly trending" means). Plan:
    the daily aggregate is one shuffle on (day, type); ranking and
    the self-join run on the bounded days×types table, so the window
    is never global over raw events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("d"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("d").orderBy(F.desc("cnt"), "event_type")
    ranked = daily.withColumn("rnk", F.row_number().over(w).cast("long"))
    prev = ranked.select(
        F.col("d").alias("p_d"),
        F.col("event_type").alias("p_type"),
        F.col("rnk").alias("prev_rnk"),
    )
    return (
        ranked.join(
            prev,
            (F.col("p_type") == F.col("event_type"))
            & (F.date_add(F.col("p_d"), 1) == F.col("d")),
            "left",
        )
        .select(
            F.col("d").cast("string").alias("day"),
            "event_type",
            "cnt",
            "rnk",
            "prev_rnk",
            (F.col("prev_rnk") - F.col("rnk")).alias("rank_delta"),
        )
        .orderBy("day", "rnk")
    )


# ---------------------------------------------------------------------------
# q187 — linear-interpolation gap fill (sibling of q92's forward fill)


@query(
    "q187_resample_interpolate",
    oracle=f"""
    WITH obs AS (
      SELECT user_id, epoch_us(ts) AS t, MAX(ROUND(value, 6)) AS v
      FROM events GROUP BY user_id, epoch_us(ts)
    ),
    spans AS (
      SELECT user_id,
             (MIN(t) + {_HOUR_US - 1}) // {_HOUR_US} AS h_lo,
             MAX(t) // {_HOUR_US} AS h_hi
      FROM obs GROUP BY user_id
    ),
    grid AS (
      SELECT user_id, CAST(g.h AS BIGINT) AS h
      FROM spans, LATERAL unnest(range(h_lo, h_hi + 1)) AS g(h)
    ),
    unioned AS (
      SELECT user_id, h * {_HOUR_US} AS t, CAST(NULL AS DOUBLE) AS v,
             0 AS is_obs, h
      FROM grid
      UNION ALL
      SELECT user_id, t, v, 1 AS is_obs, CAST(NULL AS BIGINT) AS h
      FROM obs
    ),
    filled AS (
      SELECT user_id, h, t, is_obs,
             LAST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, is_obs DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
             LAST_VALUE(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, is_obs DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
             FIRST_VALUE(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, is_obs DESC
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
             FIRST_VALUE(CASE WHEN is_obs = 1 THEN t END IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY t, is_obs DESC
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
      FROM unioned
    )
    SELECT user_id, h,
           ROUND(CASE WHEN t1 = t0 THEN v0
                      ELSE v0 + (v1 - v0) * (CAST(t - t0 AS DOUBLE)
                                             / CAST(t1 - t0 AS DOUBLE))
                 END, 6) AS v_interp
    FROM filled
    WHERE is_obs = 0 AND t0 IS NOT NULL AND t1 IS NOT NULL
    ORDER BY user_id, h
    """,
)
def q187_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resample with LINEAR INTERPOLATION between the
    surrounding observations — the gap-fill q92's forward fill cannot
    give (ffill holds the last value flat; interpolation draws the
    line). Same-timestamp ties collapse (max) BEFORE the window
    (DETERMINISM.md §8); the grid spans [ceil(first), floor(last)]
    hour per user so both neighbors exist; time deltas are exact
    integer microseconds and the interpolation fraction is one
    identically-shaped DOUBLE expression. An observation exactly on a
    grid hour sorts before the grid row (is_obs DESC), so t0 = t and
    the output is exactly v0. Plan: every shuffle keys on user_id
    (the (user,t) tie-collapse, the span aggregate feeding the
    bounded grid explode, and the partition for both fill windows —
    which share one sort); no global window, no theta join."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.unix_micros("ts").alias("t")
    ).agg(F.max(F.round("value", 6)).alias("v"))
    spans = obs.groupBy("user_id").agg(
        F.expr(f"(min(t) + {_HOUR_US - 1}) div {_HOUR_US}").alias("h_lo"),
        F.expr(f"max(t) div {_HOUR_US}").alias("h_hi"),
    )
    grid = spans.select(
        "user_id",
        F.explode(
            F.when(
                F.col("h_hi") >= F.col("h_lo"),
                F.sequence(F.col("h_lo"), F.col("h_hi")),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("h"),
    )
    unioned = grid.select(
        "user_id",
        (F.col("h") * _HOUR_US).alias("t"),
        F.lit(None).cast("double").alias("v"),
        F.lit(0).alias("is_obs"),
        "h",
    ).unionByName(
        obs.select(
            "user_id",
            "t",
            "v",
            F.lit(1).alias("is_obs"),
            F.lit(None).cast("bigint").alias("h"),
        )
    )
    order = [F.col("t"), F.col("is_obs").desc()]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_t = F.when(F.col("is_obs") == 1, F.col("t"))
    filled = unioned.select(
        "user_id",
        "h",
        "t",
        "is_obs",
        F.last("v", ignorenulls=True).over(w_back).alias("v0"),
        F.last(obs_t, ignorenulls=True).over(w_back).alias("t0"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("v1"),
        F.first(obs_t, ignorenulls=True).over(w_fwd).alias("t1"),
    )
    frac = (F.col("t") - F.col("t0")).cast("double") / (
        F.col("t1") - F.col("t0")
    ).cast("double")
    return (
        filled.filter(
            (F.col("is_obs") == 0)
            & F.col("t0").isNotNull()
            & F.col("t1").isNotNull()
        )
        .select(
            "user_id",
            "h",
            F.round(
                F.when(F.col("t1") == F.col("t0"), F.col("v0")).otherwise(
                    F.col("v0") + (F.col("v1") - F.col("v0")) * frac
                ),
                6,
            ).alias("v_interp"),
        )
        .orderBy("user_id", "h")
    )


# ---------------------------------------------------------------------------
# q188 — scene-cut detection over video frames (companion to q154)

_FRAME_CHARS = 32  # must match queries/multimodal.py FRAME_CHARS


@query(
    "q188_scene_cuts",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT media_id, s.g,
             md5(substring(text, (s.g * {_FRAME_CHARS} + 1)::INT,
                           {_FRAME_CHARS})) AS fh
      FROM vids, LATERAL (
        SELECT unnest(range(CAST(floor(len(text) / {_FRAME_CHARS}) AS BIGINT)))
          AS g
      ) s
    ),
    changes AS (
      SELECT media_id, g, fh,
             CASE WHEN fh = LAG(fh) OVER (PARTITION BY media_id ORDER BY g)
                  THEN 0 ELSE 1 END AS chg
      FROM frames
    ),
    runs AS (
      SELECT media_id, g, fh,
             SUM(chg) OVER (
               PARTITION BY media_id ORDER BY g
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
      FROM changes
    ),
    run_lens AS (
      SELECT media_id, run_id, CAST(COUNT(*) AS BIGINT) AS run_len
      FROM runs GROUP BY media_id, run_id
    )
    SELECT media_id,
           CAST(SUM(run_len) AS BIGINT) AS n_frames,
           CAST(COUNT(*) - 1 AS BIGINT) AS n_cuts,
           CAST(MAX(run_len) AS BIGINT) AS longest_run,
           CAST(COUNT(*) FILTER (WHERE run_len > 1) AS BIGINT) AS n_still_runs
    FROM run_lens GROUP BY media_id ORDER BY media_id
    """,
)
def q188_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection: per video, split the ordered frame-hash
    sequence into runs of identical consecutive frames
    (gaps-and-islands); cuts = run boundaries, still runs = runs
    longer than one frame — the static/looping-content signal a video
    curation pipeline uses to drop slideshows before training
    (q154 finds COPIED frames; this finds FROZEN time). Frames are
    index-sliced and hashed JVM-side exactly as q154. Plan: one
    shuffle on media_id serves the lag window, the run-sum window,
    and both aggregates — the frame stream never shuffles twice.
    Sub-frame videos produce no rows on either engine
    (index_sequence guard, functions/arrays.py)."""
    from flightdb_spark.functions.arrays import index_sequence

    docs = load_table(spark, sf_dir, "documents")
    vids = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"), "text"
    )
    frames = vids.select(
        "media_id",
        F.explode(
            index_sequence(F.floor(F.length("text") / _FRAME_CHARS))
        ).alias("g"),
        "text",
    ).select(
        "media_id",
        "g",
        F.md5(
            F.substring(
                F.col("text"), F.col("g") * _FRAME_CHARS + 1, _FRAME_CHARS
            )
        ).alias("fh"),
    )
    w_lag = Window.partitionBy("media_id").orderBy("g")
    w_run = w_lag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    chg = F.when(F.col("fh") == F.lag("fh").over(w_lag), 0).otherwise(1)
    runs = frames.withColumn("run_id", F.sum(chg).over(w_run))
    run_lens = runs.groupBy("media_id", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    return (
        run_lens.groupBy("media_id")
        .agg(
            F.sum("run_len").alias("n_frames"),
            (F.count(F.lit(1)) - 1).alias("n_cuts"),
            F.max("run_len").alias("longest_run"),
            F.sum(F.when(F.col("run_len") > 1, 1).otherwise(0)).alias(
                "n_still_runs"
            ),
        )
        .orderBy("media_id")
    )


# ---------------------------------------------------------------------------
# q189 — incremental join-view maintenance audit (delta-join identity)

_IVM_SPLIT = "1998-01-01"


@query(
    "q189_ivm_delta_join",
    oracle=f"""
    WITH o_base AS (SELECT o_orderkey FROM orders
                    WHERE o_orderdate < TIMESTAMP '{_IVM_SPLIT}'),
    o_delta AS (SELECT o_orderkey FROM orders
                WHERE o_orderdate >= TIMESTAMP '{_IVM_SPLIT}'),
    l_base AS (SELECT l_orderkey,
                      ROUND(l_extendedprice * (1 - l_discount), 4) AS rev
               FROM lineitem WHERE l_shipdate < TIMESTAMP '{_IVM_SPLIT}'),
    l_delta AS (SELECT l_orderkey,
                       ROUND(l_extendedprice * (1 - l_discount), 4) AS rev
                FROM lineitem WHERE l_shipdate >= TIMESTAMP '{_IVM_SPLIT}'),
    terms AS (
      SELECT 'base_base' AS term, COUNT(*) AS n_rows,
             COALESCE(SUM(CAST(rev AS DECIMAL(38,4))), 0) AS rev
      FROM o_base o JOIN l_base l ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'base_delta', COUNT(*),
             COALESCE(SUM(CAST(rev AS DECIMAL(38,4))), 0)
      FROM o_base o JOIN l_delta l ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'delta_base', COUNT(*),
             COALESCE(SUM(CAST(rev AS DECIMAL(38,4))), 0)
      FROM o_delta o JOIN l_base l ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'delta_delta', COUNT(*),
             COALESCE(SUM(CAST(rev AS DECIMAL(38,4))), 0)
      FROM o_delta o JOIN l_delta l ON l.l_orderkey = o.o_orderkey
    ),
    assembled AS (
      SELECT 'assembled' AS term, SUM(n_rows) AS n_rows, SUM(rev) AS rev
      FROM terms
    ),
    direct AS (
      SELECT 'direct' AS term, COUNT(*) AS n_rows,
             COALESCE(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount), 4)
                               AS DECIMAL(38,4))), 0) AS rev
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )
    SELECT term, CAST(n_rows AS BIGINT) AS n_rows,
           ROUND(CAST(rev AS DOUBLE), 2) AS revenue
    FROM (SELECT * FROM terms UNION ALL
          SELECT * FROM assembled UNION ALL
          SELECT * FROM direct)
    ORDER BY term
    """,
)
def q189_ivm_delta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view, audited: with
    orders and lineitem each split into base/delta by date, the
    delta-join identity O⋈L = Ob⋈Lb ∪ Ob⋈ΔL ∪ ΔO⋈Lb ∪ ΔO⋈ΔL must
    reassemble the direct join exactly (row count AND DECIMAL
    revenue). This is the algebra a materialized-view refresher runs
    so a nightly delta never recomputes history — q174 maintains an
    AGGREGATE incrementally; this maintains the join itself. In
    production only the three Δ-terms run (Ob⋈Lb is the stored
    view); the audit here executes all terms plus the direct join to
    prove the identity on this engine. Plan: every term is a
    hash-equi join on the order key with BOTH date filters pushed to
    the scans; the union is an aggregate-only assembly, so the audit
    output is 6 bounded rows."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias(
            "rev"
        ),
    )
    split = F.lit(_IVM_SPLIT).cast("timestamp")

    def term(label: str, os: DataFrame, ls: DataFrame) -> DataFrame:
        return (
            os.join(ls, F.col("l_orderkey") == F.col("o_orderkey"))
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.coalesce(
                    F.sum(F.col("rev").cast("decimal(38,4)")),
                    F.lit(0).cast("decimal(38,4)"),
                ).alias("rev"),
            )
            .select(F.lit(label).alias("term"), "n_rows", "rev")
        )

    # r10 P3 staging: the four delta-term joins ran as four separate
    # order-key joins, and `terms` was then referenced by BOTH the
    # final union and `assembled`, re-expanding all four under
    # Catalyst inlining (9 orders + 9 lineitem scans in the static
    # plan). The base/delta split partitions every joined row into
    # exactly one of the four cells, so ONE join pass grouped by the
    # two split flags computes all four terms; a literal term grid
    # left-join restores empty cells as (0, 0.0000) exactly like the
    # oracle's COUNT/COALESCE over an empty join. The checkpointed
    # 4-row table feeds both references. The direct join stays a real
    # separate join — proving direct == assembled on this engine IS
    # the query's audit.
    cells = (
        o.join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(F.col("o_orderdate") < split, "base")
            .otherwise("delta")
            .alias("oflag"),
            F.when(F.col("l_shipdate") < split, "base")
            .otherwise("delta")
            .alias("lflag"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("rev").cast("decimal(38,4)")).alias("rev"),
        )
        .select(
            F.concat_ws("_", "oflag", "lflag").alias("term"), "n_rows", "rev"
        )
    )
    grid = spark.createDataFrame(
        [("base_base",), ("base_delta",), ("delta_base",), ("delta_delta",)],
        "term string",
    )
    terms = (
        grid.join(cells, "term", "left")
        .select(
            "term",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.coalesce(
                "rev", F.lit(0).cast("decimal(38,4)")
            ).alias("rev"),
        )
        .localCheckpoint(eager=True)
    )
    assembled = terms.agg(
        F.sum("n_rows").alias("n_rows"), F.sum("rev").alias("rev")
    ).select(F.lit("assembled").alias("term"), "n_rows", "rev")
    direct = term("direct", o, li)
    return (
        terms.unionByName(assembled)
        .unionByName(direct)
        .select(
            "term",
            F.col("n_rows").cast("long").alias("n_rows"),
            F.round(F.col("rev").cast("double"), 2).alias("revenue"),
        )
        .orderBy("term")
    )


# ---------------------------------------------------------------------------
# q190 — OLS residual prediction intervals (companion to q184)


@query(
    "q190_prediction_intervals",
    oracle=f"""
    WITH pts AS (
      SELECT event_type,
             (epoch_us(ts) - {_T0_US}) // {_HOUR_US} AS x,
             ROUND(value, 6) AS y
      FROM events
    ),
    sums AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CAST(y AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy
      FROM pts GROUP BY event_type
    ),
    fit AS (
      SELECT event_type, n,
             ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope,
             ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 8)
               AS intercept
      FROM sums
    ),
    resid AS (
      SELECT p.event_type,
             ROUND(p.y - (f.slope * p.x + f.intercept), 6) AS r
      FROM pts p JOIN fit f ON f.event_type = p.event_type
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(r, 0.05), 6) AS r_lo,
           ROUND(quantile_cont(r, 0.95), 6) AS r_hi,
           ROUND(quantile_cont(r, 0.50), 6) AS r_med
    FROM resid GROUP BY event_type ORDER BY event_type
    """,
)
def q190_prediction_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical prediction intervals around the q184 trend fit: the
    5th/50th/95th percentiles of per-point residuals against each
    group's ROUNDED (slope, intercept) — the conformal-style band a
    monitor draws around a forecast (observed value outside
    [fit+r_lo, fit+r_hi] => alarm). Residuals use the 8-dp-rounded
    coefficients, so both engines subtract identical constants
    (DETERMINISM.md §6). Plan: the moment aggregate is one shuffle on
    event_type; the |types|-row fit broadcasts back over the point
    stream (the big side never reshuffles for the join); the exact
    percentile aggregate is the q74 anchor — swap approx_percentile
    at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        F.expr(f"(unix_micros(ts) - {_T0_US}) div {_HOUR_US}").alias("x"),
        F.round("value", 6).alias("y"),
    )
    sums = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,6)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.round(num / den, 8)
    fit = sums.select(
        F.col("event_type").alias("f_type"),
        slope.alias("slope"),
        F.round((F.col("sy") - (num / den) * F.col("sx")) / F.col("n"), 8).alias(
            "intercept"
        ),
    )
    resid = pts.join(
        F.broadcast(fit), F.col("f_type") == F.col("event_type")
    ).select(
        "event_type",
        F.round(
            F.col("y") - (F.col("slope") * F.col("x") + F.col("intercept")), 6
        ).alias("r"),
    )
    return (
        resid.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(r, 0.05)"), 6).alias("r_lo"),
            F.round(F.expr("percentile(r, 0.95)"), 6).alias("r_hi"),
            F.round(F.expr("percentile(r, 0.50)"), 6).alias("r_med"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q191 — top principal component via integer power iteration

_PCA_SCALE = 100_000_000  # loading fixed-point scale (1e-8 units)


def _pca_iter_sql(it: int) -> str:
    """One unrolled INTEGER power-iteration step for the DuckDB oracle.

    State vu is a fixed-point BIGINT (1e-8 units, |vu| <= 1e8); the
    matrix-vector product is exact BIGINT; rescaling divides by
    d = max|w| // 1e8 + 1 with explicit sign * (abs // d) so DuckDB's
    floor-divide and Spark's truncate-divide agree on negatives."""
    prod = (
        f"SUM(cov.cu * {_PCA_SCALE})"
        if it == 1
        else f"SUM(cov.cu * v{it-1}.vu)"
    )
    join = "" if it == 1 else f" JOIN v{it-1} ON v{it-1}.j = cov.j"
    return f"""
    w{it} AS (
      SELECT cov.i, CAST({prod} AS BIGINT) AS w FROM cov{join} GROUP BY cov.i
    ),
    d{it} AS (
      SELECT (MAX(ABS(w)) // {_PCA_SCALE}) + 1 AS d FROM w{it}
    ),
    v{it} AS (
      SELECT i AS j,
             (CASE WHEN w < 0 THEN -1 ELSE 1 END)
               * (ABS(w) // (SELECT d FROM d{it})) AS vu
      FROM w{it}
    )"""


@query(
    "q191_pca_power_iteration",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    nn AS (SELECT COUNT(*) AS n FROM e),
    dims AS (
      SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS x FROM e
    ),
    means AS (
      SELECT i,
             ROUND(CAST(SUM(CAST(ROUND(x, 9) AS DECIMAL(38,9))) AS DOUBLE)
                   / (SELECT n FROM nn), 6) AS m
      FROM dims GROUP BY i
    ),
    crossp AS (
      SELECT a.i AS i, b.i AS j,
             CAST(SUM(CAST(ROUND(a.x * b.x, 10) AS DECIMAL(38,10)))
                  AS DOUBLE) AS sxy
      FROM dims a JOIN dims b USING (vec_id) GROUP BY a.i, b.i
    ),
    cov AS MATERIALIZED (
      SELECT c.i AS i, c.j AS j,
             ROUND(c.sxy / (SELECT n FROM nn) - ma.m * mb.m, 8) AS c,
             CAST(ROUND((c.sxy / (SELECT n FROM nn) - ma.m * mb.m)
                        * {_PCA_SCALE}) AS BIGINT) AS cu
      FROM crossp c
      JOIN means ma ON ma.i = c.i JOIN means mb ON mb.i = c.j
    ),
    {_pca_iter_sql(1)},
    {_pca_iter_sql(2)},
    {_pca_iter_sql(3)},
    load AS (
      SELECT j AS dim,
             ROUND(vu / sqrt((SELECT SUM(vu * vu) FROM v3)), 8) AS loading
      FROM v3
    ),
    rayleigh AS (
      SELECT
        CAST(SUM(CAST(ROUND(cov.c * la.loading * lb.loading, 12)
                      AS DECIMAL(38,12))) AS DOUBLE) AS num
      FROM cov JOIN load la ON la.dim = cov.i JOIN load lb ON lb.dim = cov.j
    ),
    vnorm AS (
      SELECT CAST(SUM(CAST(ROUND(loading * loading, 12) AS DECIMAL(38,12)))
                  AS DOUBLE) AS den
      FROM load
    ),
    trace AS (
      SELECT CAST(SUM(CAST(c AS DECIMAL(38,8))) AS DOUBLE) AS tr
      FROM cov WHERE i = j
    )
    SELECT CAST(dim AS INT) AS dim, loading,
           ROUND((SELECT num FROM rayleigh) / (SELECT den FROM vnorm), 6)
             AS eigenvalue,
           ROUND((SELECT num FROM rayleigh) / (SELECT den FROM vnorm)
                 / (SELECT tr FROM trace), 6) AS explained_ratio
    FROM load ORDER BY dim
    """,
)
def q191_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by distributed
    power iteration — the whitening/compression direction q113's
    per-dim stats cannot give (variance is not covariance). The
    covariance matrix is built in ONE corpus pass: per-vector outer
    products expand JVM-side (nested transform → explode, no self
    join), partial aggregation collapses the d² stream map-side, and
    the d×d table (64×64 = 4096 rows) is localCheckpointed so the
    iterations never rescan the corpus. The iteration state is a
    fixed-point BIGINT vector (1e-8 units) and every matrix-vector
    product and rescale is EXACT integer arithmetic (DETERMINISM.md
    §2, the q86 PageRank discipline) — iterated double rounding
    diverges across engines (1-ulp drift compounds through the
    normalize-multiply chain; found empirically), integer state
    cannot. Doubles appear only in one-shot terminal expressions:
    the unit-normalized loadings, the Rayleigh quotient eigenvalue
    vᵀCv / vᵀv, and λ/trace(C). At 100 TB the corpus pass dominates
    and is embarrassingly parallel; iteration cost is constant."""
    from flightdb_spark.tables import ensure_parallelism

    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    tot = e.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    dims = e.select(F.posexplode("v").alias("i", "x"))
    means = (
        dims.groupBy("i")
        .agg(
            F.sum(F.round(F.col("x"), 9).cast("decimal(38,9)"))
            .cast("double")
            .alias("sx")
        )
        .crossJoin(F.broadcast(tot))
        .select("i", F.round(F.col("sx") / F.col("nn"), 6).alias("m"))
    )
    crossp = (
        e.select(
            F.explode(
                F.expr(
                    "flatten(transform(v, (xi, i) -> "
                    "transform(v, (xj, j) -> "
                    "struct(i AS i, j AS j, xi * xj AS p))))"
                )
            ).alias("s")
        )
        .select("s.i", "s.j", "s.p")
        .groupBy("i", "j")
        .agg(
            F.sum(F.round(F.col("p"), 10).cast("decimal(38,10)"))
            .cast("double")
            .alias("sxy")
        )
    )
    raw_c = F.col("sxy") / F.col("nn") - F.col("ma") * F.col("mb")
    cov = (
        crossp.crossJoin(F.broadcast(tot))
        .join(
            F.broadcast(
                means.select(F.col("i").alias("mi"), F.col("m").alias("ma"))
            ),
            F.col("mi") == F.col("i"),
        )
        .join(
            F.broadcast(
                means.select(F.col("i").alias("mj"), F.col("m").alias("mb"))
            ),
            F.col("mj") == F.col("j"),
        )
        .select(
            "i",
            "j",
            F.round(raw_c, 8).alias("c"),
            F.round(raw_c * _PCA_SCALE, 0).cast("long").alias("cu"),
        )
        .localCheckpoint()
    )
    # The 3 fixed-point iterations over the bounded d x d table ran as
    # a DataFrame loop whose lineage doubled per round (w referenced in
    # both the rescale aggregate and the vector); with d² = 4096 rows
    # the whole iteration is ONE in-process pass (guide §4.2) — the
    # exact same integer recurrence (Python ints; the green oracle
    # proves the BIGINT chain never overflows, so values agree).
    def _power_pandas(key, pdf):  # pragma: no cover - runs on executors
        import pandas as pd

        cells = [
            (int(i), int(j), int(cu))
            for i, j, cu in zip(pdf["i"], pdf["j"], pdf["cu"])
        ]
        dims_ = sorted({i for i, _, _ in cells})
        vv = None
        for _ in range(3):
            w = dict.fromkeys(dims_, 0)
            if vv is None:
                for i, _j, cu in cells:
                    w[i] += cu * _PCA_SCALE
            else:
                for i, j, cu in cells:
                    if j in vv:
                        w[i] += cu * vv[j]
            dd = max(abs(x) for x in w.values()) // _PCA_SCALE + 1
            vv = {
                i: (-1 if w[i] < 0 else 1) * (abs(w[i]) // dd) for i in dims_
            }
        return pd.DataFrame(
            {"j": list(vv.keys()), "vu": list(vv.values())}
        )

    v = (
        cov.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(_power_pandas, "j int, vu long")
    )
    vnorm_int = v.agg(F.sum(F.col("vu") * F.col("vu")).alias("s2"))
    load = v.join(F.broadcast(vnorm_int)).select(
        F.col("j").alias("dim"),
        F.round(F.col("vu") / F.sqrt(F.col("s2")), 8).alias("loading"),
    )
    la = load.select(F.col("dim").alias("ia"), F.col("loading").alias("lva"))
    lb = load.select(F.col("dim").alias("ib"), F.col("loading").alias("lvb"))
    rayleigh = (
        cov.join(F.broadcast(la), F.col("ia") == F.col("i"))
        .join(F.broadcast(lb), F.col("ib") == F.col("j"))
        .agg(
            F.sum(
                F.round(F.col("c") * F.col("lva") * F.col("lvb"), 12).cast(
                    "decimal(38,12)"
                )
            )
            .cast("double")
            .alias("num")
        )
    )
    vnorm = load.agg(
        F.sum(F.round(F.col("loading") * F.col("loading"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("den")
    )
    trace = cov.filter(F.col("i") == F.col("j")).agg(
        F.sum(F.col("c").cast("decimal(38,8)")).cast("double").alias("tr")
    )
    lam = F.col("num") / F.col("den")
    return (
        load.join(F.broadcast(rayleigh))
        .join(F.broadcast(vnorm))
        .join(F.broadcast(trace))
        .select(
            F.col("dim").cast("int").alias("dim"),
            "loading",
            F.round(lam, 6).alias("eigenvalue"),
            F.round(lam / F.col("tr"), 6).alias("explained_ratio"),
        )
        .orderBy("dim")
    )
