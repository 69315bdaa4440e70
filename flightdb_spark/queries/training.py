"""Training-data curation operators, batch 2 (q81-q86).

Extends the LLM-pipeline surface (BASELINE.json north star) with:

- q81 repeated-span detection: the hashed-n-gram approximation of
  exact-substring dedup (Lee et al. 2021, "Deduplicating Training Data
  Makes Language Models Better") — per-doc fraction of 5-gram spans
  that occur more than once anywhere in the corpus.
- q82 BPE merge-candidate counts: the inner counting step of BPE
  tokenizer training — adjacent character-pair frequencies over the
  corpus vocabulary, weighted by word occurrences.
- q83 int8 scalar quantization of embeddings with reconstruction
  error — the compression step in front of a large-scale ANN index.
- q84 per-group z-score outlier detection over event values — the
  numeric analog of quality filtering.
- q85 rolling 7-day revenue per customer — time-range window frames.
- q86 PageRank (3 unrolled iterations, d=0.85) over the bipartite
  part<->supplier graph derived from lineitem — iterative graph
  algorithm coverage with a fully SQL-expressible oracle.

Determinism contract (same as queries/textops.py): every cross-row
double aggregation rounds per-row then accumulates in DECIMAL (exact,
order-free, identical in Spark and DuckDB); remaining double math is
straight-line per-row IEEE arithmetic written with the same expression
structure in both engines.

100 TB shapes: q81 is two shuffles (gram hash, doc_id) — the gram
aggregate is corpus-sized but maximally partial-aggregated; q82/q86
end in TakeOrderedAndProject (partial top-k, never a global window);
q83/q84 join per-dim / per-group stats back as broadcasts; q85 is one
shuffle on the partition key with a bounded range frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..tables import ensure_parallelism, load_table
from . import query

from ..operators.textdedup import NORM_TOKENS_DUCK, NORM_TOKENS_SPARK

# Normalized word tokens, shared single definition (operators/textdedup.py)
# so q81's oracle, the pipeline span gate, and q82 cannot drift apart.
_TOKS_SPARK = NORM_TOKENS_SPARK.format(c="text")
_TOKS_DUCK = NORM_TOKENS_DUCK.format(c="text")

SPAN_N = 5  # q81 span width in tokens


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-row tokenization is expensive: spread a single-file local scan
    # across cores (no-op on a real cluster).
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# --- q81: repeated-span detection --------------------------------------------------
@query(
    "q81_dup_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_DUCK} AS w FROM documents
    ),
    grams AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(w) - {SPAN_N - 2}),
                    i -> md5(array_to_string(w[i:i+{SPAN_N - 1}], ' ')))) AS g
      FROM toks WHERE len(w) >= {SPAN_N}
    ),
    cnts AS (SELECT g, COUNT(*) AS cnt FROM grams GROUP BY g)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           ROUND(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
             AS dup_frac
    FROM grams JOIN cnts USING (g)
    GROUP BY doc_id
    """,
)
def q81_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc duplicated-span fraction: hash every 5-token span,
    count occurrences corpus-wide, and report the fraction of each
    doc's spans that appear more than once (intra- or inter-document).
    The Spark-native form of suffix-array substring dedup: one shuffle
    to count gram hashes (map-side partial agg collapses the heavy
    hitters), an equi-join back on the gram hash, one shuffle to
    re-aggregate per doc. No driver state, no n² anywhere.
    Implementation shared with the pipeline span gate:
    operators/textdedup.py::dup_span_fraction."""
    from ..operators.textdedup import dup_span_fraction

    return dup_span_fraction(_docs(spark, sf_dir), span_n=SPAN_N)


# --- q82: BPE merge-candidate pair counts ------------------------------------------
@query(
    "q82_bpe_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT {_TOKS_DUCK} AS w FROM documents
    ),
    words AS (SELECT UNNEST(w) AS wd FROM toks),
    pairs AS (
      SELECT UNNEST(list_transform(range(1, length(wd)),
                    i -> substring(wd, i, 2))) AS pair
      FROM words WHERE length(wd) >= 2
    )
    SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_pair
    FROM pairs GROUP BY pair
    ORDER BY n_pair DESC, pair LIMIT 30
    """,
)
def q82_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 adjacent character pairs across the corpus vocabulary —
    the counting step a BPE tokenizer trainer runs to pick its next
    merge. flatMap to pairs (no shuffle), one groupBy on the pair
    (alphabet², tiny — partial aggregation does nearly all the work),
    then orderBy+limit, which Spark plans as TakeOrderedAndProject
    (per-partition partial top-k, no global sort)."""
    words = (
        _docs(spark, sf_dir)
        .select(F.explode(F.expr(_TOKS_SPARK)).alias("wd"))
        .filter(F.length("wd") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(wd) - 1), i -> substring(wd, i, 2))"
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .orderBy(F.desc("n_pair"), F.asc("pair"))
        .limit(30)
    )


# --- q83: int8 scalar quantization + reconstruction error --------------------------
# Straight-line quantization arithmetic, written once and rendered into
# both engines with identical operation order (all-double IEEE ops, so
# results are bit-identical):
#   code = clamp(floor((val - mn) * 255 / (mx - mn)), 0, 255)
#   dq   = mn + (code + 0.5) * (mx - mn) / 255
#   se   = round((val - dq)^2, 12)      -- squared as x*x, never pow()
@query(
    "q83_quantize_embeddings",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (
      SELECT vec_id, unnest(v) AS val, generate_subscripts(v, 1) AS dim FROM e
    ),
    stats AS (SELECT dim, MIN(val) AS mn, MAX(val) AS mx FROM dims GROUP BY dim),
    qz AS (
      SELECT d.vec_id, d.val, s.mn, s.mx,
             CASE WHEN s.mx = s.mn THEN 0
                  ELSE LEAST(255, GREATEST(0,
                       CAST(FLOOR((d.val - s.mn) * 255 / (s.mx - s.mn)) AS BIGINT)))
             END AS code
      FROM dims d JOIN stats s USING (dim)
    ),
    err AS (
      SELECT vec_id,
             ROUND((val - (mn + (code + 0.5) * (mx - mn) / 255))
                   * (val - (mn + (code + 0.5) * (mx - mn) / 255)), 12) AS se
      FROM qz
    )
    SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
           ROUND(CAST(SUM(CAST(se AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*), 9)
             AS mse
    FROM err GROUP BY vec_id
    """,
)
def q83_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization of the embedding table with per-vector
    reconstruction MSE — the compression pass in front of a large ANN
    index. Per-dimension min/max is a bounded aggregate (embedding
    width rows) broadcast back onto the exploded (vec_id, dim, val)
    stream; the squared error accumulates per-row-rounded in DECIMAL so
    the MSE is independent of partial-agg merge order. Two shuffles:
    the dim-stats aggregate (tiny) and the per-vec re-aggregate."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dims = e.select(
        "vec_id", F.posexplode("v").alias("dim0", "val")
    ).select("vec_id", (F.col("dim0") + 1).alias("dim"), "val")
    stats = dims.groupBy("dim").agg(
        F.min("val").alias("mn"), F.max("val").alias("mx")
    )
    qz = dims.join(F.broadcast(stats), "dim").withColumn(
        "code",
        F.when(F.col("mx") == F.col("mn"), F.lit(0).cast("bigint")).otherwise(
            F.least(
                F.lit(255).cast("bigint"),
                F.greatest(
                    F.lit(0).cast("bigint"),
                    F.floor((F.col("val") - F.col("mn")) * 255 / (F.col("mx") - F.col("mn"))),
                ),
            )
        ),
    )
    diff = F.col("val") - (
        F.col("mn") + (F.col("code") + 0.5) * (F.col("mx") - F.col("mn")) / 255
    )
    err = qz.select("vec_id", F.round(diff * diff, 12).alias("se"))
    return err.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("n_dims"),
        F.round(
            F.sum(F.col("se").cast("decimal(38,12)")).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mse"),
    )


# --- q84: per-group z-score outliers -----------------------------------------------
Z_CUT = 3.0


@query(
    "q84_group_outliers",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(value, 9) AS DECIMAL(38,9))) AS DOUBLE)
               / COUNT(*) AS mean,
             CAST(SUM(CAST(ROUND(value * value, 6) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS msq
      FROM events GROUP BY event_type
    ),
    z AS (
      SELECT e.event_id, e.event_type, e.value,
             (e.value - s.mean)
               / sqrt(GREATEST(s.msq - s.mean * s.mean, 0)) AS zval,
             sqrt(GREATEST(s.msq - s.mean * s.mean, 0)) AS sd
      FROM events e JOIN stats s USING (event_type)
    )
    SELECT event_id, event_type, ROUND(value, 6) AS value, ROUND(zval, 4) AS z
    FROM z WHERE sd > 0 AND abs(zval) > {Z_CUT}
    """,
)
def q84_group_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 3): the numeric analog of
    corpus quality filtering. Group stats are one bounded aggregate
    (types × 4 doubles) broadcast back onto the event stream — the big
    side never shuffles. Mean and E[x²] accumulate per-row-rounded in
    DECIMAL, so z is bit-identical across engines and partition
    layouts."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.round(F.col("value"), 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean"),
        (
            F.sum(
                F.round(F.col("value") * F.col("value"), 6).cast("decimal(38,6)")
            ).cast("double")
            / F.count(F.lit(1))
        ).alias("msq"),
    )
    # var can land a hair below 0 for a constant-valued group (double
    # cancellation); clamp so sqrt never yields NaN (Spark) / raises
    # (DuckDB), and drop zero-variance groups (z undefined there)
    sd = F.sqrt(F.greatest(F.col("msq") - F.col("mean") * F.col("mean"), F.lit(0.0)))
    z = (F.col("value") - F.col("mean")) / sd
    return (
        ev.join(F.broadcast(stats), "event_type")
        .withColumn("sd", sd)
        .withColumn("zval", z)
        .filter((F.col("sd") > 0) & (F.abs(F.col("zval")) > Z_CUT))
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round("zval", 4).alias("z"),
        )
    )


# --- q85: rolling 7-day revenue per customer ---------------------------------------
@query(
    "q85_rolling_revenue",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
           CAST(SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(18,2))) OVER (
             PARTITION BY o_custkey
             ORDER BY (CAST(o_orderdate AS DATE) - DATE '1970-01-01')
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS revenue_7d
    FROM orders
    """,
)
def q85_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue per customer — the order day plus the six
    preceding days (RANGE BETWEEN 6 PRECEDING over integer order-day,
    i.e. pandas rolling('7D') semantics). One shuffle on
    the partition key; the frame is bounded so state per key is small.
    The sum accumulates in DECIMAL(18,2) — exact, order-free — and the
    peer-inclusive RANGE frame makes same-day ties well-defined."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
    w = (
        W.partitionBy("o_custkey")
        .orderBy(day.alias("day_idx"))
        .rangeBetween(-6, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.sum(F.round(F.col("o_totalprice"), 2).cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("revenue_7d"),
    )


# --- q86: PageRank, 3 unrolled iterations ------------------------------------------
# Integer-mass arithmetic: rank is carried as BIGINT units out of
# PR_TOTAL (1e15). Floor division and integer sums are exact and
# order-free in every engine, so three chained iterations cannot drift
# by an ulp the way repeated double rounding does (tidy rationals like
# (1/N)/2 land exactly on round-half boundaries, where Spark's exact
# BigDecimal rounding and DuckDB's float-multiply rounding disagree).
# Damping 0.85 becomes (mass * 85) // 100; floor losses (sub-ppb of
# total mass) are part of the operator's declared semantics, not noise.
PR_ITERS = 3
PR_TOP = 20
PR_TOTAL = 10**15


def _pr_oracle() -> str:
    # pr0..pr3 as chained CTEs; each iteration is the same SQL block.
    iters = []
    prev = "pr0"
    for i in range(1, PR_ITERS + 1):
        iters.append(
            f"""pr{i} AS (
      SELECT ew.dst AS node,
             ({PR_TOTAL} * 15 // 100) // ANY_VALUE(nn.n)
               + (SUM(p.pr // ew.deg) * 85) // 100 AS pr
      FROM ew JOIN {prev} p ON p.node = ew.src, nn
      GROUP BY ew.dst
    )"""
        )
        prev = f"pr{i}"
    chain = ",\n    ".join(iters)
    return f"""
    WITH e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY src),
    ew AS (SELECT e.src, e.dst, d.deg FROM edges e JOIN deg d USING (src)),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
    pr0 AS (
      SELECT src AS node, CAST({PR_TOTAL} AS BIGINT) // nn.n AS pr FROM deg, nn
    ),
    {chain},
    top AS (
      SELECT node, CAST(pr AS BIGINT) AS rank_mass FROM pr{PR_ITERS}
      ORDER BY rank_mass DESC, node LIMIT {PR_TOP}
    )
    SELECT CASE WHEN node % 2 = 0 THEN 'p' || CAST(node // 2 AS VARCHAR)
                ELSE 's' || CAST(node // 2 AS VARCHAR) END AS node,
           rank_mass
    FROM top
    """


@query("q86_pagerank", oracle=_pr_oracle())
def q86_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (d=0.85, 3 iterations, uniform init) over the
    undirected bipartite part<->supplier graph from lineitem. Each
    iteration is one equi-join of the rank vector with the edge list
    plus one aggregate on the destination — the canonical distributed
    shape (contributions flow along edges; no driver-side graph
    state). Rank is integer mass out of 1e15 (module comment above),
    so the three iterations are bit-exact against the unrolled SQL
    oracle. Every node has degree >= 1 by construction, so there is no
    dangling-mass term. Top-20 is orderBy+limit, which Spark plans as
    TakeOrderedAndProject (partial per-partition top-k, no global
    sort)."""
    li = load_table(spark, sf_dir, "lineitem")
    # integer node ids (even = part, odd = supplier): shuffles and
    # aggregates carry 8-byte keys instead of strings; the display
    # label is reconstructed for the final top-20 only
    e0 = li.select(
        (F.col("l_partkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    ).distinct().localCheckpoint()
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    # materialize the graph frames once: degrees and the weighted edge
    # list feed EVERY iteration (and nn/pr0), and without truncation
    # each round re-derives the whole distinct lineage from the
    # lineitem scan (on a cluster use a reliable checkpoint dir, as in
    # textdedup). deg is nodes-sized — cheap to pin.
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).localCheckpoint()
    ew = edges.join(deg, "src").select("src", "dst", "deg").localCheckpoint()
    nn = deg.agg(F.count(F.lit(1)).alias("n")).withColumn("_k", F.lit(1))
    pr = (
        deg.withColumn("_k", F.lit(1))
        .join(F.broadcast(nn), "_k")
        .select(
            F.col("src").alias("node"),
            F.expr(f"CAST({PR_TOTAL} AS BIGINT) div n").alias("pr"),
        )
    )
    base = (PR_TOTAL * 15) // 100
    for _ in range(PR_ITERS):
        pr = (
            ew.join(pr, ew.src == pr.node)
            .select(F.col("dst"), F.expr("pr div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .withColumn("_k", F.lit(1))
            .join(F.broadcast(nn), "_k")
            .select(
                F.col("dst").alias("node"),
                (
                    F.expr(f"CAST({base} AS BIGINT) div n")
                    + F.expr("(s * 85) div 100")
                ).alias("pr"),
            )
        )
    top = (
        pr.select("node", F.col("pr").alias("rank_mass"))
        .orderBy(F.desc("rank_mass"), F.asc("node"))
        .limit(PR_TOP)
    )
    label = F.when(
        F.col("node") % 2 == 0,
        F.concat(F.lit("p"), F.expr("node div 2").cast("string")),
    ).otherwise(F.concat(F.lit("s"), F.expr("node div 2").cast("string")))
    return top.select(label.alias("node"), "rank_mass")


# --- q87: deterministic shard assignment -------------------------------------------
N_SHARDS = 8


@query(
    "q87_shard_assignment",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hkey FROM documents
    )
    SELECT doc_id,
           CAST(doc_id % {N_SHARDS} AS BIGINT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY doc_id % {N_SHARDS}
                                   ORDER BY hkey, doc_id) AS BIGINT) AS pos
    FROM h
    """,
)
def q87_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment with a deterministic pseudo-random
    within-shard order: shard = doc_id mod S (stable, join-free),
    position = rank of the doc's content hash inside its shard. This is
    the reproducible global-shuffle a trainer needs — same permutation
    on any engine, any partitioning, any run. One shuffle (the
    per-shard window); at 100 TB each shard sorts independently, and
    S is chosen so a shard fits a sort spill budget."""
    docs = _docs(spark, sf_dir).select("doc_id")
    h = docs.withColumn("hkey", F.md5(F.col("doc_id").cast("string")))
    w = W.partitionBy(F.col("doc_id") % N_SHARDS).orderBy("hkey", "doc_id")
    return h.select(
        "doc_id",
        (F.col("doc_id") % N_SHARDS).alias("shard"),
        F.row_number().over(w).cast("bigint").alias("pos"),
    )


# --- q88: temperature-based mixture re-weighting -----------------------------------
# alpha = 0.5 (T = 2): weight_s = sqrt(share_s), renormalized. sqrt is
# IEEE-correctly-rounded (unlike pow), so the per-source weight is
# bit-identical across engines; the normalizer accumulates per-row-
# rounded in DECIMAL like every other cross-row double sum here.
@query(
    "q88_mix_temperature",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS n FROM counts),
    wts AS (
      SELECT source, n_docs,
             ROUND(sqrt(CAST(n_docs AS DOUBLE) / tot.n), 9) AS w
      FROM counts, tot
    ),
    norm AS (SELECT CAST(SUM(CAST(w AS DECIMAL(38,9))) AS DOUBLE) AS z FROM wts)
    SELECT source, n_docs,
           ROUND(CAST(n_docs AS DOUBLE) / tot.n, 6) AS share,
           ROUND(w / norm.z, 6) AS temp_share,
           CAST(FLOOR(ROUND(w / norm.z, 6) * tot.n) AS BIGINT) AS target_n
    FROM wts, norm, tot
    """,
)
def q88_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data-mix re-weighting (multilingual-sampling
    style, alpha=0.5): per-source sampling share proportional to
    sqrt(corpus share), renormalized, with the implied target doc
    count. Everything after the per-source count is bounded math on a
    sources-sized frame — at 100 TB this is one aggregate over the
    corpus and then arithmetic on ~dozens of rows."""
    docs = _docs(spark, sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n")).withColumn("_k", F.lit(1))
    wts = (
        counts.withColumn("_k", F.lit(1))
        .join(F.broadcast(tot), "_k")
        .withColumn("w", F.round(F.sqrt(F.col("n_docs").cast("double") / F.col("n")), 9))
    )
    norm = wts.agg(
        F.sum(F.col("w").cast("decimal(38,9)")).cast("double").alias("z")
    ).withColumn("_k", F.lit(1))
    return (
        wts.join(F.broadcast(norm), "_k")
        .select(
            "source",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias("share"),
            F.round(F.col("w") / F.col("z"), 6).alias("temp_share"),
            F.floor(F.round(F.col("w") / F.col("z"), 6) * F.col("n"))
            .cast("bigint")
            .alias("target_n"),
        )
    )


# --- q89: hard-negative mining -----------------------------------------------------
@query(
    "q89_hard_negatives",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS query_id, a.label AS query_label,
             b.vec_id AS neighbor_id, b.label AS neighbor_label,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM e a JOIN e b ON b.vec_id <> a.vec_id AND b.label <> a.label
      WHERE a.vec_id % 100 = 0
    ),
    ranked AS (
      SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rk
      FROM pairs
    )
    SELECT query_id, query_label, neighbor_id, neighbor_label, cos_sim
    FROM ranked WHERE rk = 1
    """,
)
def q89_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each probe,
    the single most cosine-similar vector carrying a DIFFERENT label.
    Same 100 TB shape as exact top-k (q40): probes broadcast, the
    label-mismatch predicate evaluated inside the broadcast join,
    partial top-1 per partition before the one shuffle on probe id."""
    from ..operators.vectors import dot_expr, with_norm

    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    c = with_norm(e)
    p = with_norm(
        e.filter(F.col("vec_id") % 100 == 0).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("label").alias("query_label"),
        ),
        v="qv",
        out="qnorm",
    )
    pairs = (
        c.alias("b")
        .join(
            F.broadcast(p).alias("a"),
            (F.col("b.vec_id") != F.col("a.query_id"))
            & (F.col("b.label") != F.col("a.query_label")),
        )
        .select(
            "query_id",
            "query_label",
            F.col("b.vec_id").alias("neighbor_id"),
            F.col("b.label").alias("neighbor_label"),
            F.round(
                F.expr(dot_expr("qv", "v")) / (F.col("qnorm") * F.col("vnorm")), 6
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
