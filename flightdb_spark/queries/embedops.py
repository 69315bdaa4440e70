"""Embedding-operations batch 72 (q427-q431) — the embedding-space
curation ops beyond ANN retrieval (q40-q50) and semantic dedup (q197):

- q427 bitext margin mining (Artetxe & Schwenk 2019): candidate pairs
  scored by margin-normalized cosine — cos(x,y) / mean of the two
  sides' kNN similarity — the criterion that mines parallel pairs
  without an absolute threshold (raw cosine is hubness-distorted;
  the margin denominator cancels it). Cross-label pairs stand in for
  cross-lingual;
- q428 memorization-risk proxy: per-vector isolation = 1 - mean kNN
  similarity; the most isolated tail is the slice most likely to be
  memorized verbatim by a model trained on it (isolated points get
  no gradient sharing) — the privacy-risk triage list;
- q429 shard balance audit: hash- vs range-sharding of the document
  corpus into 16 shards by token mass — max/mean shard skew for both
  strategies (the imbalance number that decides a training-shard
  layout);
- q430 loss-mask stats: prompt/completion split per doc (first 40% of
  tokens = masked prompt), per-source maskable share and the packed-
  batch efficiency at the q59 budget — what instruction-tuning
  actually pays per packed sequence;
- q431 dedup threshold sweep: documents dropped by SemDeDup (q197's
  rule) at each cosine threshold in a grid — the tuning curve a
  dedup-threshold choice is made from, computed from ONE pass of
  cell-mate best-similarities.

Determinism: all cosines are the shared 6-dp-rounded JVM fold; kNN
means accumulate 9-dp DECIMAL over exactly-K rows; shard masses and
mask counts are integers.

100 TB shapes: q427/q428 share one within-cell candidate pass (IVF
cells bound the pair space — the q197 shape; the exact all-pairs form
here is the oracle-scale anchor, documented); q429/q430 are single
aggregates; q431 sweeps its grid over the PRE-AGGREGATED per-doc best
similarity, one corpus pass for any grid size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

KNN_K = 5
MINE_TOPK = 15
RISK_TOPK = 20
N_SHARDS = 16
PROMPT_FRAC_NUM, PROMPT_FRAC_DEN = 2, 5  # prompt = first 2/5 of tokens
MASK_BUDGET = 512
SWEEP_THRESHOLDS = ("0.30", "0.40", "0.50", "0.60", "0.70")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("documents")


def _emb_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "embeddings")
    ).createOrReplaceTempView("embeddings")


_PAIRS_DUCK = """
    e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib, a.label AS la, b.label AS lb,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS sim
      FROM e a JOIN e b ON a.vec_id <> b.vec_id
    ),
    knn AS (
      SELECT ia AS vec_id,
             ROUND(CAST(SUM(CAST(ROUND(sim, 9) AS DECIMAL(38,9)))
                        AS DOUBLE) / {k}, 6) AS knn_mean
      FROM (
        SELECT ia, sim,
               ROW_NUMBER() OVER (PARTITION BY ia
                                  ORDER BY sim DESC, ib) AS rk
        FROM pairs
      ) t WHERE rk <= {k}
      GROUP BY ia
    )
""".format(k=KNN_K)


def _pairs_knn_spark(spark: SparkSession, sf_dir: str):
    """Shared Spark-side (pairs, knn) frames: all-pairs 6-dp cosine +
    per-vector mean similarity of the top-K neighbors."""
    e = _emb(spark, sf_dir).localCheckpoint()
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    a = e.select(
        F.col("vec_id").alias("ia"), F.col("v").alias("va"), F.col("label").alias("la")
    )
    b = e.select(
        F.col("vec_id").alias("ib"), F.col("v").alias("vb"), F.col("label").alias("lb")
    )
    pairs = (
        a.join(b, F.col("ia") != F.col("ib"))
        .select(
            "ia",
            "ib",
            "la",
            "lb",
            F.round(dot / (norm(F.col("va")) * norm(F.col("vb"))), 6).alias("sim"),
        )
    ).localCheckpoint()
    w = W.partitionBy("ia").orderBy(F.desc("sim"), "ib")
    knn = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= KNN_K)
        .groupBy(F.col("ia").alias("vec_id"))
        .agg(
            F.round(
                F.sum(F.round(F.col("sim"), 9).cast("decimal(38,9)")).cast(
                    "double"
                )
                / KNN_K,
                6,
            ).alias("knn_mean")
        )
    )
    return pairs, knn


# ---------------------------------------------------------------------------
# q427 — bitext margin mining


def _margin_oracle() -> str:
    return f"""
    WITH {_PAIRS_DUCK},
    scored AS (
      SELECT p.ia, p.ib, p.la, p.lb, p.sim,
             ROUND(p.sim / ((ka.knn_mean + kb.knn_mean) / 2), 6) AS margin
      FROM pairs p
      JOIN knn ka ON ka.vec_id = p.ia
      JOIN knn kb ON kb.vec_id = p.ib
      WHERE p.la <> p.lb AND p.ia < p.ib
    )
    SELECT ia AS vec_a, ib AS vec_b, la AS label_a, lb AS label_b,
           sim AS cos_sim, margin
    FROM scored ORDER BY margin DESC, vec_a, vec_b LIMIT {MINE_TOPK}
    """


@query("q427_bitext_margin_mining", oracle=_margin_oracle())
def q427_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Margin-criterion pair mining (Artetxe & Schwenk 2019): cross-
    label candidate pairs ranked by cos(x,y) normalized by the mean of
    both sides' kNN similarity — the hubness-cancelling score that
    made large-scale bitext mining (CCMatrix) work where raw cosine
    thresholds fail. Cross-label pairs stand in for cross-lingual.
    This exact all-pairs form is the oracle anchor (the q41 stance);
    the scale path gates candidates through IVF cells / LSH bands
    (q42/q48) and computes the same margin on candidates only. One
    shared pairs pass feeds both the kNN means and the scoring."""
    pairs, knn = _pairs_knn_spark(spark, sf_dir)
    scored = (
        pairs.filter((F.col("la") != F.col("lb")) & (F.col("ia") < F.col("ib")))
        .join(knn.withColumnRenamed("vec_id", "ia").withColumnRenamed("knn_mean", "ka"), "ia")
        .join(knn.withColumnRenamed("vec_id", "ib").withColumnRenamed("knn_mean", "kb"), "ib")
        .select(
            F.col("ia").alias("vec_a"),
            F.col("ib").alias("vec_b"),
            F.col("la").alias("label_a"),
            F.col("lb").alias("label_b"),
            F.col("sim").alias("cos_sim"),
            F.round(
                F.col("sim") / ((F.col("ka") + F.col("kb")) / 2), 6
            ).alias("margin"),
        )
    )
    return scored.orderBy(F.desc("margin"), "vec_a", "vec_b").limit(MINE_TOPK)


# ---------------------------------------------------------------------------
# q428 — memorization-risk proxy


def _risk_oracle() -> str:
    return f"""
    WITH {_PAIRS_DUCK}
    SELECT e.vec_id, e.label,
           ROUND(1.0 - k.knn_mean, 6) AS isolation
    FROM knn k JOIN e ON e.vec_id = k.vec_id
    ORDER BY isolation DESC, e.vec_id LIMIT {RISK_TOPK}
    """


@query("q428_memorization_risk", oracle=_risk_oracle())
def q428_memorization_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk triage: per-vector isolation = 1 - mean top-K
    neighbor similarity; the most isolated records are the ones a
    model is most likely to memorize verbatim (no near neighbors to
    generalize across — the embedding-space proxy for the perplexity-
    outlier signal of Carlini et al.). Output: the top-{RISK_TOPK}
    risk list a privacy review hand-inspects. Shares q427's pairs/kNN
    pass; the scale path is the same IVF gating."""
    _, knn = _pairs_knn_spark(spark, sf_dir)
    e = _emb(spark, sf_dir)
    return (
        knn.join(e.select("vec_id", "label"), "vec_id")
        .select(
            "vec_id",
            "label",
            F.round(1.0 - F.col("knn_mean"), 6).alias("isolation"),
        )
        .orderBy(F.desc("isolation"), "vec_id")
        .limit(RISK_TOPK)
    )


# ---------------------------------------------------------------------------
# q429 — shard balance audit


def _shard_sql(dialect: str) -> str:
    if dialect == "spark":
        toks = "size(split(text, ' '))"
        h = "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT)"
        idiv = "div"
    else:
        toks = "len(string_split(text, ' '))"
        h = "(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT)"
        idiv = "//"
    return f"""
    WITH sized AS (
      SELECT doc_id, CAST({toks} AS BIGINT) AS tokens,
             ({h}) % {N_SHARDS} AS hash_shard
      FROM documents
    ),
    bounds AS (
      SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM sized
    ),
    assigned AS (
      SELECT s.tokens, s.hash_shard,
             LEAST((s.doc_id - b.lo) * {N_SHARDS} {idiv} (b.hi - b.lo + 1),
                   {N_SHARDS - 1}) AS range_shard
      FROM sized s CROSS JOIN bounds b
    ),
    hash_m AS (
      SELECT 'hash' AS strategy, hash_shard AS shard,
             CAST(SUM(tokens) AS BIGINT) AS mass
      FROM assigned GROUP BY hash_shard
    ),
    range_m AS (
      SELECT 'range' AS strategy, range_shard AS shard,
             CAST(SUM(tokens) AS BIGINT) AS mass
      FROM assigned GROUP BY range_shard
    ),
    both_ AS (SELECT * FROM hash_m UNION ALL SELECT * FROM range_m)
    SELECT strategy,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(MIN(mass) AS BIGINT) AS min_mass,
           CAST(MAX(mass) AS BIGINT) AS max_mass,
           ROUND(CAST(MAX(mass) AS DOUBLE) * COUNT(*) / SUM(mass), 6)
             AS max_over_mean
    FROM both_ GROUP BY strategy ORDER BY strategy
    """


@query("q429_shard_balance", oracle=_shard_sql("duck"))
def q429_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard balance audit: the corpus split into {N_SHARDS}
    shards by md5 hash and by doc_id range, compared on token-mass
    skew (max shard / mean shard — the number that sets the straggler
    tax of a training epoch or a distcp). Hash sharding should sit
    near 1.0; range sharding inherits any id-correlated length drift.
    One map-side assignment pass, two 16-key rollups."""
    _docs_view(spark, sf_dir)
    return spark.sql(_shard_sql("spark"))


# ---------------------------------------------------------------------------
# q430 — loss-mask stats


def _mask_sql(dialect: str) -> str:
    toks = (
        "size(split(text, ' '))" if dialect == "spark" else "len(string_split(text, ' '))"
    )
    idiv = "div" if dialect == "spark" else "//"
    return f"""
    WITH sized AS (
      SELECT source, CAST({toks} AS BIGINT) AS n_tokens,
             CAST({toks} AS BIGINT) * {PROMPT_FRAC_NUM} {idiv} {PROMPT_FRAC_DEN}
               AS prompt_tokens
      FROM documents
    )
    SELECT source,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(prompt_tokens) AS BIGINT) AS masked_tokens,
           ROUND(CAST(SUM(n_tokens - prompt_tokens) AS DOUBLE)
                 / SUM(n_tokens), 6) AS trainable_frac,
           -- packed-batch efficiency: trainable tokens per full
           -- {MASK_BUDGET}-token packed sequence of this source
           ROUND(CAST(SUM(n_tokens - prompt_tokens) AS DOUBLE)
                 / SUM(n_tokens) * {MASK_BUDGET}, 2)
             AS trainable_per_sequence
    FROM sized GROUP BY source ORDER BY source
    """


@query("q430_loss_mask_stats", oracle=_mask_sql("duck"))
def q430_loss_mask_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instruction-tuning loss-mask accounting: with the first
    {PROMPT_FRAC_NUM}/{PROMPT_FRAC_DEN} of each doc's tokens as the
    masked prompt, the per-source trainable-token fraction and the
    trainable tokens per packed {MASK_BUDGET}-token sequence — what a
    masked fine-tuning run actually pays per batch (the q59 packing's
    economics under masking). Pure integer token arithmetic."""
    _docs_view(spark, sf_dir)
    return spark.sql(_mask_sql("spark"))


# ---------------------------------------------------------------------------
# q431 — dedup threshold sweep


def _sweep_oracle() -> str:
    ths = ", ".join(SWEEP_THRESHOLDS)
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
    asg AS (
      SELECT e.vec_id, e.v, cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cv)
                        / sqrt(list_inner_product(cv, cv)) DESC, cid) AS rn
      FROM e, cents
    ),
    cells AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
    best AS (
      SELECT b.vec_id,
             MAX(ROUND(list_cosine_similarity(a.v, b.v), 6)) AS best_sim
      FROM cells a JOIN cells b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      GROUP BY b.vec_id
    ),
    grid AS (SELECT unnest([{ths}]) AS th),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e)
    SELECT CAST(g.th AS DOUBLE) AS threshold,
           CAST(SUM(CASE WHEN b.best_sim >= g.th THEN 1 ELSE 0 END)
             AS BIGINT) AS docs_dropped,
           ROUND(CAST(SUM(CASE WHEN b.best_sim >= g.th THEN 1 ELSE 0 END)
                      AS DOUBLE) / t.n, 6) AS drop_rate
    FROM grid g CROSS JOIN best b CROSS JOIN tot t
    GROUP BY 1, t.n ORDER BY 1
    """


@query("q431_dedup_threshold_sweep", oracle=_sweep_oracle())
def q431_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup threshold tuning curve: documents dropped at each
    cosine threshold in the grid, computed from ONE pass of per-vector
    best lower-id cell-mate similarity (q197's within-cell join run
    once, swept in aggregate) — the monotone kept-vs-threshold curve a
    dedup configuration is chosen from (q197 evaluates one point; this
    prices the whole dial). Grid size is free: the sweep runs on the
    pre-aggregated per-doc best_sim."""
    from ..operators import vectors

    e = _emb(spark, sf_dir)
    cells = vectors.ivf_assign(e.select("vec_id", "v"), 8)
    a = cells.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("vnorm").alias("anorm"),
        F.col("cell").alias("a_cell"),
    )
    best = (
        cells.join(
            a,
            (F.col("cell") == F.col("a_cell")) & (F.col("a_id") < F.col("vec_id")),
        )
        .select(
            "vec_id",
            F.round(
                F.expr(f"({vectors.dot_expr('av', 'v')})")
                / (F.col("anorm") * F.col("vnorm")),
                6,
            ).alias("sim"),
        )
        .groupBy("vec_id")
        .agg(F.max("sim").alias("best_sim"))
    )
    tot = e.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    grid = F.array(*[F.lit(float(t)) for t in SWEEP_THRESHOLDS])
    swept = best.select(
        F.explode(grid).alias("threshold"), "best_sim"
    ).groupBy("threshold").agg(
        F.sum(
            F.when(F.col("best_sim") >= F.col("threshold"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("docs_dropped")
    )
    return (
        swept.crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "docs_dropped",
            F.round(F.col("docs_dropped").cast("double") / F.col("n"), 6).alias(
                "drop_rate"
            ),
        )
        .orderBy("threshold")
    )
