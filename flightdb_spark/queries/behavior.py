"""Retrieval/behavior batch 42 (q324-q326): mean reciprocal rank
(the first-relevant-hit metric completing the ranking family after
q144 NDCG, q220 AP, q115 recall), session edit-distance drift (does
a user's daily behavior sequence change? — Levenshtein between
consecutive day-strings), and the embedding drift audit (per-dim
standardized mean difference between corpus halves — the check run
before mixing embedding versions in one index).

Determinism: cosine similarities round to 6 dp BEFORE ranking with a
vec_id tie-break (the q40 discipline); edit distances are exact
integers over deterministic event-initial strings; drift moments
accumulate in rounded DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# ---------------------------------------------------------------------------
# q324 — mean reciprocal rank of same-label retrieval


@query(
    "q324_mrr",
    oracle="""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS query_id, a.label AS qlabel,
             b.vec_id AS neighbor_id, b.label AS nlabel,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM e a JOIN e b ON b.vec_id <> a.vec_id
      WHERE a.vec_id % 100 = 0
    ),
    ranked AS (
      SELECT query_id, qlabel, nlabel,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id,
           CAST(MAX(qlabel) AS INT) AS label,
           CAST(MIN(CASE WHEN nlabel = qlabel THEN rank END) AS BIGINT)
             AS first_rel_rank,
           ROUND(1.0 / MIN(CASE WHEN nlabel = qlabel THEN rank END), 6)
             AS reciprocal_rank
    FROM ranked
    GROUP BY query_id
    ORDER BY query_id
    """,
)
def q324_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank of the first same-label neighbor for each probe
    vector (probes = every 100th vec_id, the q40 set): rank ALL
    neighbors by rounded cosine with a vec_id tie-break, find the
    first whose label matches, and report 1/rank — averaging these is
    MRR, the metric retrieval dashboards quote when one relevant hit
    is enough. Scale: probes broadcast against the corpus (the q40
    plan); ranking is per-probe (never a global window); the min-rank
    aggregate collapses each probe to one row."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("nlabel"),
            F.round(dot / (norm(F.col("qv")) * norm(F.col("v"))), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    ranked = pairs.withColumn("rank", F.row_number().over(w))
    rel_rank = F.min(
        F.when(F.col("nlabel") == F.col("qlabel"), F.col("rank"))
    )
    return (
        ranked.groupBy("query_id")
        .agg(
            F.max("qlabel").cast("int").alias("label"),
            rel_rank.cast("bigint").alias("first_rel_rank"),
            F.round(1.0 / rel_rank, 6).alias("reciprocal_rank"),
        )
        .orderBy("query_id")
    )


# ---------------------------------------------------------------------------
# q325 — session edit-distance drift


@query(
    "q325_session_edit_distance",
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(ts AS DATE) AS d,
             string_agg(left(event_type, 1), '' ORDER BY ts, event_id)
               AS sig
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    lagged AS (
      SELECT user_id, d, sig,
             LAG(sig) OVER (PARTITION BY user_id ORDER BY d) AS prev
      FROM seq
    ),
    dist AS (
      SELECT levenshtein(sig, prev) AS lev,
             GREATEST(length(sig), length(prev)) AS mx
      FROM lagged WHERE prev IS NOT NULL
    )
    SELECT LEAST(CAST(FLOOR(lev * 5.0 / mx) AS INT), 4) AS drift_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           ROUND(AVG(CAST(lev AS DOUBLE)), 6) AS avg_edit_distance,
           ROUND(AVG(CAST(lev AS DOUBLE) / mx), 6) AS avg_norm_distance
    FROM dist GROUP BY 1 ORDER BY 1
    """,
)
def q325_session_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral drift via edit distance: encode each user-day as a
    string of event-type initials (time-ordered, event_id tie-break),
    Levenshtein consecutive days per user, and histogram the
    normalized distance into 5 drift buckets — near-0 means routine
    behavior, near-1 means the session pattern changed completely
    (the sequence-level complement of q100's transition matrix).
    Scale: one (user, day) aggregate builds the strings, a
    user-partitioned lag pairs them, and the JVM levenshtein kernel
    runs row-wise into a 5-row histogram."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("d"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct("ts", "event_id", "event_type")
                        )
                    ),
                    lambda s: F.substring(s["event_type"], 1, 1),
                ),
                "",
            ).alias("sig")
        )
    )
    w = W.partitionBy("user_id").orderBy("d")
    lagged = seq.withColumn("prev", F.lag("sig").over(w)).filter(
        F.col("prev").isNotNull()
    )
    dist = lagged.select(
        F.levenshtein("sig", "prev").alias("lev"),
        F.greatest(F.length("sig"), F.length("prev")).alias("mx"),
    )
    return (
        dist.groupBy(
            F.least(
                F.floor(F.col("lev") * 5.0 / F.col("mx")).cast("int"),
                F.lit(4),
            ).alias("drift_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_transitions"),
            F.round(F.avg(F.col("lev").cast("double")), 6).alias(
                "avg_edit_distance"
            ),
            F.round(
                F.avg(F.col("lev").cast("double") / F.col("mx")), 6
            ).alias("avg_norm_distance"),
        )
        .orderBy("drift_bucket")
    )


# ---------------------------------------------------------------------------
# q326 — embedding drift audit (split halves)


@query(
    "q326_embedding_drift",
    oracle="""
    WITH e AS (
      SELECT vec_id % 2 AS half, embedding::DOUBLE[] AS v FROM embeddings
    ),
    dims AS (
      SELECT half, unnest(range(1, len(v) + 1)) AS dim, unnest(v) AS val
      FROM e
    ),
    mom AS (
      SELECT dim, half, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(val * val, 12) AS DECIMAL(38,12)))
               AS DOUBLE) AS s2
      FROM dims GROUP BY dim, half
    ),
    wide AS (
      SELECT a.dim,
             a.s1 / a.n AS m0, b.s1 / b.n AS m1,
             a.s2 / a.n - (a.s1 / a.n) * (a.s1 / a.n) AS v0,
             b.s2 / b.n - (b.s1 / b.n) * (b.s1 / b.n) AS v1
      FROM mom a JOIN mom b ON b.dim = a.dim
      WHERE a.half = 0 AND b.half = 1
    )
    SELECT CAST(dim - 1 AS INT) AS dim,
           ROUND(m0, 6) AS mean_half0,
           ROUND(m1, 6) AS mean_half1,
           ROUND((m1 - m0) / SQRT((v0 + v1) / 2 + 1e-12), 6) AS smd
    FROM wide ORDER BY dim
    """,
)
def q326_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding drift audit: split the corpus into halves by vec_id
    parity and report, per dimension, the standardized mean
    difference (m1 - m0) / pooled-std — the per-dim PSI-style check
    (q128 does it for scalar features) run before trusting that two
    embedding batches came from the same encoder. |smd| near 0
    everywhere = safe to mix; a spiky dim = version skew. Scale: one
    posexplode pass, a (dim, half) aggregate with 9/12-dp DECIMAL
    moments (the q113 shape), and a 64-row self-join."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        (F.col("vec_id") % 2).alias("half"),
        F.col("embedding").cast("array<double>").alias("v"),
    )
    dims = e.select("half", F.posexplode("v").alias("dim", "val"))
    mom = dims.groupBy("dim", "half").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round("val", 9).cast("decimal(38,9)")).cast("double").alias(
            "s1"
        ),
        F.sum(F.round(F.col("val") * F.col("val"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2"),
    )
    m = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - m * m
    half0 = mom.filter(F.col("half") == 0).select(
        "dim", m.alias("m0"), var.alias("v0")
    )
    half1 = mom.filter(F.col("half") == 1).select(
        F.col("dim").alias("dim1"), m.alias("m1"), var.alias("v1")
    )
    wide = half0.join(half1, half0.dim == half1.dim1)
    return wide.select(
        F.col("dim").cast("int").alias("dim"),
        F.round("m0", 6).alias("mean_half0"),
        F.round("m1", 6).alias("mean_half1"),
        F.round(
            (F.col("m1") - F.col("m0"))
            / F.sqrt((F.col("v0") + F.col("v1")) / 2 + 1e-12),
            6,
        ).alias("smd"),
    ).orderBy("dim")
