"""Audience & tuning batch 53 (q353-q355): the IVF nprobe sweep (the
recall-vs-cost tuning table an ANN deployment reads before fixing
nprobe — q50 runs ONE setting; this sweeps them against exact
ground truth), the audience reach curve (daily new vs returning
users and cumulative reach — the diminishing-returns curve media
planning reads), and the frequency-cap audit (how much exposure a
per-user weekly cap would remove).

Determinism: IVF assignment reuses q50's deterministic centroids
(vec_id < K) and rounded-cosine ranking; reach is first-seen-day
exact counting; cap arithmetic is exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

IVF_K = 8
SWEEP_PROBES = [1, 2, 4, 8]
SWEEP_TOPK = 5

# ---------------------------------------------------------------------------
# q353 — IVF nprobe sweep


@query(
    "q353_ivf_nprobe_sweep",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {IVF_K}),
    asg AS (
      SELECT e.vec_id, e.v, cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cv)
                        / sqrt(list_inner_product(cv, cv)) DESC, cid) AS rn
      FROM e, cents
    ),
    cells AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
    probes AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    qcells AS (
      SELECT vec_id, cid AS cell, rn FROM asg
      WHERE rn <= {max(SWEEP_PROBES)} AND vec_id % 100 = 0
    ),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id
                 ORDER BY ROUND(list_cosine_similarity(p.v, c.v), 6) DESC,
                          c.vec_id) AS xr
        FROM probes p JOIN e c ON c.vec_id <> p.vec_id
      ) WHERE xr <= {SWEEP_TOPK}
    ),
    nps AS (SELECT unnest([{", ".join(str(x) for x in SWEEP_PROBES)}]) AS np),
    cand AS (
      SELECT nps.np, q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(p.v, c.v), 6) AS cos_sim
      FROM nps
      JOIN qcells q ON q.rn <= nps.np
      JOIN probes p ON p.vec_id = q.vec_id
      JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT np, query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY np, query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank,
             COUNT(*) OVER (PARTITION BY np, query_id) AS n_cand
      FROM cand
    ),
    hits AS (
      SELECT r.np, r.query_id,
             MAX(r.n_cand) AS n_cand,
             SUM(CASE WHEN ex.neighbor_id IS NOT NULL AND r.rank <= {SWEEP_TOPK}
                 THEN 1 ELSE 0 END) AS n_hit
      FROM ranked r
      LEFT JOIN exact ex ON ex.query_id = r.query_id
                        AND ex.neighbor_id = r.neighbor_id
      GROUP BY r.np, r.query_id
    ),
    corpus AS (SELECT COUNT(*) AS nv FROM e)
    SELECT h.np AS nprobe,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(SUM(n_hit) * 1.0 / (COUNT(*) * {SWEEP_TOPK}), 6)
             AS recall_at_{SWEEP_TOPK},
           ROUND(SUM(n_cand) * 1.0 / COUNT(*) / MAX(c.nv), 6)
             AS candidate_frac
    FROM hits h, corpus c
    GROUP BY h.np ORDER BY nprobe
    """,
)
def q353_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF nprobe sweep: for nprobe in {SWEEP_PROBES}, retrieve each
    probe's top-{SWEEP_TOPK} through its nprobe nearest cells (q50's
    deterministic coarse quantizer) and measure recall against the
    exact top-{SWEEP_TOPK} plus the fraction of the corpus scanned —
    the recall-vs-cost curve that picks a production nprobe. Recall
    must be non-decreasing in nprobe and hit 1.0 when all {IVF_K}
    cells are probed (asserted in tests). Scale: assignment is the
    q50 map-side argmax; the sweep multiplies only the PROBE side by
    |nprobe settings|; candidates come from cell equi-joins."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = e.filter(F.col("vec_id") < IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    sim = (
        F.aggregate(
            F.zip_with("v", "cv", lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / F.sqrt(
            F.aggregate(
                F.zip_with("cv", "cv", lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
    )
    wasg = W.partitionBy("vec_id").orderBy(F.col("s").desc(), F.col("cid"))
    asg = (
        e.join(F.broadcast(cents))
        .select("vec_id", "v", "cid", sim.alias("s"))
        .withColumn("rn", F.row_number().over(wasg))
    )
    cells = asg.filter(F.col("rn") == 1).select(
        "vec_id", "v", F.col("cid").alias("cell")
    )
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    ).localCheckpoint()
    qcells = (
        asg.filter(
            (F.col("rn") <= max(SWEEP_PROBES)) & (F.col("vec_id") % 100 == 0)
        )
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("cell"),
                "rn")
        .localCheckpoint()
    )
    cos = F.round(
        F.aggregate(
            F.zip_with("qv", "v", lambda x, y: x * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        / (
            F.sqrt(
                F.aggregate(
                    F.zip_with("qv", "qv", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            )
            * F.sqrt(
                F.aggregate(
                    F.zip_with("v", "v", lambda x, y: x * y),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
            )
        ),
        6,
    )
    wx = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    exact = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias(
                "cos_sim"
            )
        )
        .withColumn("xr", F.row_number().over(wx))
        .filter(F.col("xr") <= SWEEP_TOPK)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    nps = spark.createDataFrame([(n,) for n in SWEEP_PROBES], ["np"])
    cells_r = cells.select(
        F.col("vec_id").alias("c_vec_id"),
        "v",
        F.col("cell").alias("c_cell"),
    )
    cand = (
        nps.join(F.broadcast(qcells), F.col("rn") <= F.col("np"))
        .join(F.broadcast(probes), "query_id")
        .join(
            cells_r,
            (F.col("cell") == F.col("c_cell"))
            & (F.col("c_vec_id") != F.col("query_id")),
        )
        .select(
            "np",
            "query_id",
            F.col("c_vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
    )
    wr = W.partitionBy("np", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    wc = W.partitionBy("np", "query_id")
    ranked = cand.withColumn("rank", F.row_number().over(wr)).withColumn(
        "n_cand", F.count(F.lit(1)).over(wc)
    )
    hits = (
        ranked.join(
            exact.withColumn("is_hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("np", "query_id")
        .agg(
            F.max("n_cand").alias("n_cand"),
            F.sum(
                F.when(
                    F.col("is_hit").isNotNull()
                    & (F.col("rank") <= SWEEP_TOPK),
                    1,
                ).otherwise(0)
            ).alias("n_hit"),
        )
    )
    corpus = e.agg(F.count(F.lit(1)).cast("bigint").alias("nv"))
    return (
        hits.groupBy(F.col("np").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.round(
                F.sum("n_hit") * 1.0 / (F.count(F.lit(1)) * SWEEP_TOPK), 6
            ).alias(f"recall_at_{SWEEP_TOPK}"),
            (F.sum("n_cand") * 1.0 / F.count(F.lit(1))).alias("_mc"),
        )
        .crossJoin(F.broadcast(corpus))
        .select(
            "nprobe",
            "n_queries",
            f"recall_at_{SWEEP_TOPK}",
            F.round(F.col("_mc") / F.col("nv"), 6).alias("candidate_frac"),
        )
        .orderBy("nprobe")
    )


# ---------------------------------------------------------------------------
# q354 — reach curve


@query(
    "q354_reach_curve",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_d FROM events
      GROUP BY user_id
    ),
    daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS active
      FROM events GROUP BY 1
    ),
    news AS (
      SELECT first_d AS d, CAST(COUNT(*) AS BIGINT) AS new_users
      FROM firsts GROUP BY first_d
    )
    SELECT da.d,
           da.active,
           COALESCE(n.new_users, 0) AS new_users,
           da.active - COALESCE(n.new_users, 0) AS returning_users,
           CAST(SUM(COALESCE(n.new_users, 0))
             OVER (ORDER BY da.d ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_reach
    FROM daily da LEFT JOIN news n ON n.d = da.d
    ORDER BY da.d
    """,
)
def q354_reach_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience reach curve: per day, active users split into new
    (first-ever-seen today) vs returning, plus cumulative reach (the
    running count of distinct users ever seen) — the
    diminishing-returns curve that says when a campaign stops
    acquiring and starts re-hitting the same audience (q106's
    cohorts slice retention; this is the acquisition integral).
    Cumulative distinct is computed as a running sum of FIRST-SEEN
    counts — exact, and never a distinct-over-window. Scale: two
    user/day aggregates and a running sum over the day table (same
    bounded class as q351's hourly window)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_d")
    )
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count_distinct("user_id").cast("bigint").alias("active")
    )
    news = firsts.groupBy(F.col("first_d").alias("d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_users")
    )
    w = W.orderBy("d").rowsBetween(W.unboundedPreceding, 0)
    return (
        daily.join(news, "d", "left")
        .select(
            "d",
            "active",
            F.coalesce(F.col("new_users"), F.lit(0)).alias("new_users"),
            (
                F.col("active") - F.coalesce(F.col("new_users"), F.lit(0))
            ).alias("returning_users"),
        )
        .withColumn(
            "cumulative_reach",
            F.sum("new_users").over(w).cast("bigint"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# q355 — frequency-cap audit

FREQ_CAP = 10  # weekly per-user exposure cap


@query(
    "q355_frequency_cap",
    oracle=f"""
    WITH weekly AS (
      SELECT user_id,
             CAST(FLOOR(DATE_DIFF('day', DATE '1970-01-01', CAST(ts AS DATE))
                  / 7) AS INT) AS wk,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT SUM(n) AS impressions,
             SUM(CASE WHEN n > {FREQ_CAP} THEN n - {FREQ_CAP} ELSE 0 END)
               AS over_cap
      FROM weekly
    )
    SELECT LEAST(CAST(n AS INT), {FREQ_CAP + 1}) AS weekly_frequency,
           CAST(COUNT(*) AS BIGINT) AS n_user_weeks,
           CAST(SUM(n) AS BIGINT) AS impressions,
           ROUND(MAX(t.over_cap) * 1.0 / MAX(t.impressions), 6)
             AS corpus_over_cap_frac
    FROM weekly, tot t
    GROUP BY 1 ORDER BY 1
    """,
)
def q355_frequency_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-cap audit: the distribution of per-user weekly
    exposure (views + clicks), capped display at {FREQ_CAP}+, with
    the corpus-wide fraction of impressions a {FREQ_CAP}/week cap
    would remove — the waste measurement an ad platform reads before
    enforcing capping. Scale: one (user, week) aggregate, a bounded
    frequency histogram, one scalar broadcast."""
    ev = load_table(spark, sf_dir, "events")
    weekly = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .groupBy(
            "user_id",
            F.floor(
                F.datediff(
                    F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
                )
                / 7
            )
            .cast("int")
            .alias("wk"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tot = weekly.agg(
        F.sum("n").alias("t_impr"),
        F.sum(
            F.when(F.col("n") > FREQ_CAP, F.col("n") - FREQ_CAP).otherwise(0)
        ).alias("over_cap"),
    )
    return (
        weekly.groupBy(
            F.least(F.col("n").cast("int"), F.lit(FREQ_CAP + 1)).alias(
                "weekly_frequency"
            )
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_user_weeks"),
            F.sum("n").cast("bigint").alias("impressions"),
        )
        .join(F.broadcast(tot))
        .select(
            "weekly_frequency",
            "n_user_weeks",
            "impressions",
            F.round(
                F.col("over_cap") * 1.0 / F.col("t_impr"), 6
            ).alias("corpus_over_cap_frac"),
        )
        .orderBy("weekly_frequency")
    )
