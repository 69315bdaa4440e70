"""Embedding batch 55 (q359-q361): the Matryoshka truncation sweep
(retrieval recall when only the first d dimensions are kept — the
dimension-budget curve MRL-style embeddings are deployed with),
the hubness audit (how unevenly points appear in other points'
top-k — the high-dimensional pathology that silently breaks kNN
graphs), and largest-remainder money allocation (prorate an order
discount across lines so pennies reconcile exactly — the
Hamilton-method allocation every billing system needs).

Determinism: cosine ranking uses rounded similarity with vec_id
tie-breaks (q40 discipline); allocation remainders rank with
deterministic tie-breaks and the per-order mass balances to the
cent by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MRL_DIMS = [8, 16, 32, 64]
MRL_TOPK = 5
HUB_TOPK = 5

# ---------------------------------------------------------------------------
# q359 — Matryoshka truncation sweep


@query(
    "q359_matryoshka_sweep",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    probes AS (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0),
    exact AS (
      SELECT query_id, neighbor_id FROM (
        SELECT p.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY p.vec_id
                 ORDER BY ROUND(list_cosine_similarity(p.v, c.v), 6) DESC,
                          c.vec_id) AS xr
        FROM probes p JOIN e c ON c.vec_id <> p.vec_id
      ) WHERE xr <= {MRL_TOPK}
    ),
    dims AS (SELECT unnest([{", ".join(str(d) for d in MRL_DIMS)}]) AS nd),
    truncated AS (
      SELECT d.nd, p.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(list_slice(p.v, 1, d.nd),
                   list_slice(c.v, 1, d.nd)), 6)
               AS cos_sim
      FROM dims d
      JOIN probes p ON TRUE
      JOIN e c ON c.vec_id <> p.vec_id
    ),
    ranked AS (
      SELECT nd, query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY nd, query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM truncated
    ),
    hits AS (
      SELECT r.nd, r.query_id,
             SUM(CASE WHEN ex.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS n_hit
      FROM ranked r
      LEFT JOIN exact ex ON ex.query_id = r.query_id
                        AND ex.neighbor_id = r.neighbor_id
      WHERE r.rank <= {MRL_TOPK}
      GROUP BY r.nd, r.query_id
    )
    SELECT nd AS n_dims,
           CAST(COUNT(*) AS BIGINT) AS n_queries,
           ROUND(SUM(n_hit) * 1.0 / (COUNT(*) * {MRL_TOPK}), 6)
             AS recall_at_{MRL_TOPK}
    FROM hits GROUP BY nd ORDER BY n_dims
    """,
)
def q359_matryoshka_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation sweep: retrieval recall@{MRL_TOPK} when
    similarity uses only the first 8/16/32/64 dimensions, against
    full-dimension exact top-{MRL_TOPK} — the storage-vs-recall curve
    read before shipping truncated embeddings (full-width must score
    recall 1.0 by construction, asserted in tests; q353 sweeps probe
    COUNT, this sweeps VECTOR WIDTH). Scale: the probe side is
    broadcast and the truncated fold is a JVM slice+zip_with per
    pair — the dimension sweep multiplies probe work only."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    ).localCheckpoint()

    def cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        na = F.sqrt(
            F.aggregate(
                F.zip_with(a, a, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        nb = F.sqrt(
            F.aggregate(
                F.zip_with(b, b, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
        return F.round(dot / (na * nb), 6)

    wx = W.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    exact = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos(F.col("qv"), F.col("v")).alias("cos_sim"),
        )
        .withColumn("xr", F.row_number().over(wx))
        .filter(F.col("xr") <= MRL_TOPK)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    dims = spark.createDataFrame([(d,) for d in MRL_DIMS], ["nd"])
    truncated = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(dims))
        .select(
            "nd",
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos(
                F.slice(F.col("qv"), 1, F.col("nd")),
                F.slice(F.col("v"), 1, F.col("nd")),
            ).alias("cos_sim"),
        )
    )
    wr = W.partitionBy("nd", "query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    hits = (
        truncated.withColumn("rank", F.row_number().over(wr))
        .filter(F.col("rank") <= MRL_TOPK)
        .join(
            exact.withColumn("is_hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("nd", "query_id")
        .agg(
            F.sum(
                F.when(F.col("is_hit").isNotNull(), 1).otherwise(0)
            ).alias("n_hit")
        )
    )
    return (
        hits.groupBy(F.col("nd").alias("n_dims"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            F.round(
                F.sum("n_hit") * 1.0 / (F.count(F.lit(1)) * MRL_TOPK), 6
            ).alias(f"recall_at_{MRL_TOPK}"),
        )
        .orderBy("n_dims")
    )


# ---------------------------------------------------------------------------
# q360 — hubness audit


@query(
    "q360_hubness",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
               WHERE vec_id % 10 = 0),
    knn AS (
      SELECT neighbor_id FROM (
        SELECT a.vec_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ROUND(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rn
        FROM e a JOIN e b ON b.vec_id <> a.vec_id
      ) WHERE rn <= {HUB_TOPK}
    ),
    kocc AS (
      SELECT e.vec_id, COUNT(k.neighbor_id) AS k_occ
      FROM e LEFT JOIN knn k ON k.neighbor_id = e.vec_id
      GROUP BY e.vec_id
    )
    SELECT CAST(k_occ AS INT) AS k_occurrence,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM kocc GROUP BY k_occ ORDER BY k_occurrence
    """,
)
def q360_hubness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hubness audit: over a deterministic 10% sample, count how often
    each point appears in OTHER points' top-{HUB_TOPK} (its
    k-occurrence) and histogram the distribution — a heavy right
    tail (hubs) plus a mass at zero (anti-hubs) is the
    high-dimensional pathology that degrades every kNN graph the
    pipeline builds (q267's item-kNN, q197's semantic dedup). Mean
    k-occurrence is exactly {HUB_TOPK} by construction (asserted in
    tests); the SHAPE is the diagnostic. Scale: this exact all-pairs
    runs on the sample as the anchor; the production path reuses
    q42/q50's bucketed candidate generation."""
    e = (
        ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .localCheckpoint()
    )
    b = e.select(F.col("vec_id").alias("b_id"), F.col("v").alias("bv"))
    dot = F.aggregate(
        F.zip_with("v", "bv", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.zip_with(c, c, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    wr = W.partitionBy("vec_id").orderBy(
        F.col("cos_sim").desc(), F.col("b_id")
    )
    knn = (
        e.join(b, F.col("b_id") != F.col("vec_id"))
        .select(
            "vec_id",
            "b_id",
            F.round(dot / (nrm(F.col("v")) * nrm(F.col("bv"))), 6).alias(
                "cos_sim"
            ),
        )
        .withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") <= HUB_TOPK)
        .select(F.col("b_id").alias("neighbor_id"))
    )
    kocc = (
        e.select(F.col("vec_id"))
        .join(
            knn.groupBy("neighbor_id").agg(F.count(F.lit(1)).alias("k_occ")),
            e.vec_id == F.col("neighbor_id"),
            "left",
        )
        .select(F.coalesce(F.col("k_occ"), F.lit(0)).alias("k_occ"))
    )
    return (
        kocc.groupBy(F.col("k_occ").cast("int").alias("k_occurrence"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
        .orderBy("k_occurrence")
    )


# ---------------------------------------------------------------------------
# q361 — largest-remainder money allocation

ALLOC_DISCOUNT = 0.10  # prorate a 10% order discount across its lines


@query(
    "q361_largest_remainder",
    oracle=f"""
    WITH lines AS (
      SELECT l_orderkey, l_linenumber,
             CAST(ROUND(l_extendedprice, 2) AS DECIMAL(38,2)) AS price,
             ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                ORDER BY l_linenumber, l_partkey) AS ln
      FROM lineitem
    ),
    totals AS (
      SELECT l_orderkey, SUM(price) AS order_total,
             CAST(SUM(price) * 100 AS BIGINT) // 10 AS target_cents
      FROM lines GROUP BY l_orderkey
    ),
    shares AS (
      SELECT l.l_orderkey, l.ln,
             FLOOR(CAST(t.target_cents AS DOUBLE)
                   * CAST(l.price AS DOUBLE)
                   / CAST(t.order_total AS DOUBLE)) AS floor_cents,
             CAST(t.target_cents AS DOUBLE)
                   * CAST(l.price AS DOUBLE)
                   / CAST(t.order_total AS DOUBLE) AS raw_cents
      FROM lines l JOIN totals t ON t.l_orderkey = l.l_orderkey
    ),
    shorts AS (
      SELECT l_orderkey,
             MAX(t.target_cents)
               - CAST(SUM(s.floor_cents) AS BIGINT) AS n_short
      FROM shares s JOIN totals t USING (l_orderkey)
      GROUP BY l_orderkey
    ),
    topped AS (
      SELECT s.l_orderkey, s.ln, s.floor_cents,
             CASE WHEN ROW_NUMBER() OVER (PARTITION BY s.l_orderkey
                    ORDER BY s.raw_cents - s.floor_cents DESC, s.ln)
                  <= sh.n_short
                  THEN s.floor_cents + 1 ELSE s.floor_cents END AS cents
      FROM shares s JOIN shorts sh ON sh.l_orderkey = s.l_orderkey
    ),
    check_ AS (
      SELECT t.l_orderkey,
             SUM(tp.cents) AS allocated_cents,
             MAX(t.target_cents) AS target_cents
      FROM topped tp JOIN totals t ON t.l_orderkey = tp.l_orderkey
      GROUP BY t.l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN allocated_cents = target_cents
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_exact,
           CAST(SUM(allocated_cents) AS BIGINT) AS total_allocated_cents,
           CAST(SUM(target_cents) AS BIGINT) AS total_target_cents
    FROM check_
    """,
)
def q361_largest_remainder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder (Hamilton) allocation: prorate a 10% order
    discount (floored to the cent via exact integer division) across
    the order's lines in integer CENTS — floor each
    line's proportional share, then hand the short cents to the
    lines with the largest fractional remainders (ties to the lower
    line) — so every order's allocation reconciles to its target
    exactly, the invariant naive rounding breaks. Output proves it:
    n_exact == n_orders and the global cent masses match. Scale: one
    orderkey-partitioned share computation plus a remainder-rank
    window on the same partitioning — a single shuffle."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    wl = W.partitionBy("l_orderkey").orderBy("l_linenumber", "l_partkey")
    lines = li.select(
        "l_orderkey",
        F.round("l_extendedprice", 2).cast("decimal(38,2)").alias("price"),
        F.row_number().over(wl).alias("ln"),
    )
    totals = lines.groupBy("l_orderkey").agg(
        F.sum("price").alias("order_total"),
        F.expr("CAST(sum(price) * 100 AS BIGINT) div 10").alias(
            "target_cents"
        ),
    )
    shares = lines.join(totals, "l_orderkey").select(
        "l_orderkey",
        "ln",
        "target_cents",
        F.floor(
            F.col("target_cents").cast("double")
            * F.col("price").cast("double")
            / F.col("order_total").cast("double")
        ).alias("floor_cents"),
        (
            F.col("target_cents").cast("double")
            * F.col("price").cast("double")
            / F.col("order_total").cast("double")
        ).alias("raw_cents"),
    )
    shorts = shares.groupBy("l_orderkey").agg(
        (
            F.max("target_cents") - F.sum("floor_cents").cast("bigint")
        ).alias("n_short")
    )
    wrem = W.partitionBy("l_orderkey").orderBy(
        (F.col("raw_cents") - F.col("floor_cents")).desc(), F.col("ln")
    )
    topped = (
        shares.join(shorts, "l_orderkey")
        .withColumn("rr", F.row_number().over(wrem))
        .select(
            "l_orderkey",
            "target_cents",
            F.when(
                F.col("rr") <= F.col("n_short"), F.col("floor_cents") + 1
            )
            .otherwise(F.col("floor_cents"))
            .alias("cents"),
        )
    )
    check = topped.groupBy("l_orderkey").agg(
        F.sum("cents").alias("allocated_cents"),
        F.max("target_cents").alias("target_cents"),
    )
    return check.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(
            F.when(
                F.col("allocated_cents") == F.col("target_cents"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_exact"),
        F.sum("allocated_cents").cast("bigint").alias("total_allocated_cents"),
        F.sum("target_cents").cast("bigint").alias("total_target_cents"),
    )
