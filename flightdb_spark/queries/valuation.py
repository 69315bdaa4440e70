"""Data-valuation & curation-eval batch 66 (q397-q401): the operators
that price individual training examples and audit the eval surface —
the layer above dedup/quality filtering in a training-data pipeline:

- q397 exact KNN-Shapley data values (Jia et al. 2019, VLDB): the
  closed-form per-training-point Shapley value of the K-NN utility for
  a probe set — THE tractable data-valuation method (O(N log N) per
  probe, vs exponential for general Shapley);
- q398 expected calibration error + reliability diagram over a
  deterministic miscalibrated scorer (confidence = s^2 while the truth
  hits at rate s) — complements q301 (isotonic fix) and q235 (Brier);
- q399 hex-grid hotspots with 1-ring smoothing: offset (odd-r) hex
  binning of trackpoints in pure integer space + a 6-neighbor
  smoothing join — the hexagonal density surface a flight-ops heatmap
  draws (hex cells have uniform neighbor distance, unlike q143's
  squares);
- q400 benchmark-contamination scan: train docs sharing an exact
  8-gram with any eval-set doc (src0 as the held-out benchmark) —
  the n-gram-collision decontamination pass every LLM training run
  owes its eval numbers (hashed n-gram equi-join, never doc pairs);
- q401 margin-based acquisition (active learning): per point, the
  margin between its two nearest label centroids; the lowest-margin
  points are the next labeling batch (uncertainty sampling,
  margin variant).

Determinism: KNN-Shapley suffix terms and the recursion base round to
12 dp and accumulate in DECIMAL over a per-probe ordered window
(order-free); ECE is exact integer moments per bin; hex binning is
integer after one exact hundredths recovery; contamination is integer
counting; centroid margins reuse q67's DECIMAL centroid idiom.

100 TB shapes: q397 is per-probe bounded fan-out against a
FIXED-cardinality probe panel (N_PROBES x corpus = linear, probes
broadcast; the per-probe ordered scan is the documented cost — at
fleet scale it runs on the bucketed prefix-scan like q59); q398 one
10-bin aggregate; q399 one cell aggregate + a 6-way neighbor explode
on the AGGREGATED cell table; q400 hashed 8-gram equi-join with the
eval side broadcast; q401 broadcast 10-centroid cross with a
per-point bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .synth import SYNTH_TP_CTE, synth_trackpoints

KNN_K = 5
SHAP_TOPK = 5
# q397's probe panel is FIXED-cardinality by contract: the data-market
# question is "value the corpus against a fixed probe panel", so probe
# count must NOT scale with the corpus (a corpus-proportional probe
# rule makes probe x corpus pair work quadratic — the r7 VERDICT
# scale-killer). The panel is the N_PROBES smallest qualifying ids —
# deterministic and stable under corpus growth by key-shifted
# replication (new ids are strictly larger).
N_PROBES = 20
ECE_BINS = 10
HEX_TOPK = 15
CONTAM_NGRAM = 8
MARGIN_BATCH = 20


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q397 — exact KNN-Shapley data values


def _knn_shapley_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    probes AS (SELECT * FROM e WHERE vec_id % 100 = 0
               ORDER BY vec_id LIMIT {N_PROBES}),
    pairs AS (
      SELECT p.vec_id AS query_id, t.vec_id, t.label,
             CASE WHEN t.label = p.label THEN 1 ELSE 0 END AS ind,
             ROUND(list_cosine_similarity(p.v, t.v), 6) AS cos_sim
      FROM probes p JOIN e t ON t.vec_id <> p.vec_id
    ),
    ranked AS (
      SELECT query_id, vec_id, ind, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, vec_id) AS i,
             LEAD(ind) OVER (PARTITION BY query_id
                             ORDER BY cos_sim DESC, vec_id) AS ind_next,
             COUNT(*) OVER (PARTITION BY query_id) AS n
      FROM pairs
    ),
    terms AS (
      SELECT query_id, vec_id, ind, cos_sim, i,
             CASE WHEN i = n
                  THEN CAST(ROUND(CAST(ind AS DOUBLE) / n, 12)
                            AS DECIMAL(38,12))
                  ELSE CAST(ROUND((ind - ind_next)
                                  * LEAST({KNN_K}, i) * 1.0
                                  / ({KNN_K} * i), 12)
                            AS DECIMAL(38,12)) END AS c
      FROM ranked
    ),
    values_ AS (
      SELECT query_id, vec_id, ind, cos_sim,
             SUM(c) OVER (PARTITION BY query_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND UNBOUNDED FOLLOWING) AS s
      FROM terms
    ),
    top AS (
      SELECT query_id, vec_id, ind AS same_label,
             ROUND(CAST(s AS DOUBLE), 9) AS shapley,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY s DESC, vec_id) AS rk
      FROM values_
    )
    SELECT query_id, vec_id, same_label, shapley, rk
    FROM top WHERE rk <= {SHAP_TOPK}
    """


@query("q397_knn_shapley", oracle=_knn_shapley_oracle())
def q397_knn_shapley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact KNN-Shapley data valuation (Jia et al. 2019): for each
    probe, training points sorted by similarity get values by the
    closed-form recursion s_(N) = 1[y=(y_t)]/N, s_(i) = s_(i+1) +
    (ind_i - ind_(i+1)) * min(K,i) / (K*i) — computed as a SUFFIX SUM
    of per-rank terms (each rounded to 12 dp into DECIMAL, so the
    windowed accumulation is order-free and engine-stable). Output:
    the top-{SHAP_TOPK} most valuable training points per probe — the
    table a data-market / corpus-pruning decision reads. Scale: the
    probe PANEL is fixed-cardinality ({N_PROBES} probes) by contract,
    so total pair work is O(N_PROBES x corpus) = linear in the corpus;
    probes broadcast against the corpus (the q40 plan); the per-probe
    ordered scan is the documented cost — the window partitions by
    probe, and at fleet scale the rank/suffix stage runs per-probe on
    the bucketed prefix scan exactly like q59."""
    e = _emb(spark, sf_dir).localCheckpoint()
    probes = (
        e.filter(F.col("vec_id") % 100 == 0)
        .orderBy("vec_id")
        .limit(N_PROBES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("label").alias("qlabel"),
        )
    )
    dot = F.aggregate(
        F.zip_with("v", "qv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    pairs = (
        e.crossJoin(F.broadcast(probes))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.when(F.col("label") == F.col("qlabel"), 1).otherwise(0).alias("ind"),
            F.round(dot / (norm(F.col("v")) * norm(F.col("qv"))), 6).alias(
                "cos_sim"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    ranked = pairs.select(
        "query_id",
        "vec_id",
        "ind",
        "cos_sim",
        F.row_number().over(w).alias("i"),
        F.lead("ind").over(w).alias("ind_next"),
        F.count(F.lit(1)).over(W.partitionBy("query_id")).alias("n"),
    )
    term = F.when(
        F.col("i") == F.col("n"),
        F.round(F.col("ind").cast("double") / F.col("n"), 12),
    ).otherwise(
        F.round(
            (F.col("ind") - F.col("ind_next"))
            * F.least(F.lit(KNN_K), F.col("i"))
            * 1.0
            / (KNN_K * F.col("i")),
            12,
        )
    )
    terms = ranked.select(
        "query_id",
        "vec_id",
        "ind",
        "cos_sim",
        "i",
        term.cast("decimal(38,12)").alias("c"),
    )
    # suffix sum as partition total MINUS exclusive prefix: Spark's
    # [currentRow, unboundedFollowing] frame is
    # UnboundedFollowingWindowFunctionFrame, which RECOMPUTES the
    # aggregate per row — O(n^2) per probe partition (22x wall on 10x
    # data in the r8 sf1 rehearsal). Total and growing-prefix frames
    # are both incremental O(n), and DECIMAL arithmetic keeps the
    # subtraction exact, so the values are unchanged (the oracle keeps
    # the textbook suffix window — DuckDB's segment tree is O(n log n)).
    w_part = W.partitionBy("query_id")
    w_prefix = (
        w_part.orderBy("i").rowsBetween(W.unboundedPreceding, -1)
    )
    zero = F.lit(0).cast("decimal(38,12)")
    suffix = F.sum("c").over(w_part) - F.coalesce(
        F.sum("c").over(w_prefix), zero
    )
    vals = terms.select(
        "query_id",
        "vec_id",
        F.col("ind").alias("same_label"),
        F.round(suffix.cast("double"), 9).alias("shapley"),
    )
    w_rk = W.partitionBy("query_id").orderBy(F.desc("shapley"), "vec_id")
    return (
        vals.withColumn("rk", F.row_number().over(w_rk))
        .filter(F.col("rk") <= SHAP_TOPK)
        .select("query_id", "vec_id", "same_label", "shapley", "rk")
    )


# ---------------------------------------------------------------------------
# q398 — expected calibration error


def _ece_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_s'), 1, 4))
               ::BIGINT) % 1000 AS s_mill,
             (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_o'), 1, 4))
               ::BIGINT) % 1000 AS o_mill
      FROM documents
    ),
    rows_ AS (
      -- truth hits at rate s; REPORTED confidence is s^2 (planted
      -- overconfidence below 1, underconfidence near 1)
      SELECT CAST(s_mill // 100 AS INT) AS bin,
             s_mill * s_mill AS conf_num,        -- conf = s^2 = s_mill^2/1e6
             CASE WHEN o_mill < s_mill THEN 1 ELSE 0 END AS hit
      FROM scored
    ),
    bins AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
             CAST(SUM(conf_num) AS BIGINT) AS conf_sum,
             CAST(SUM(hit) AS BIGINT) AS hits
      FROM rows_ GROUP BY bin
    ),
    tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n FROM bins)
    SELECT bin, n_b,
           ROUND(conf_sum / 1000000.0 / n_b, 6) AS avg_confidence,
           ROUND(CAST(hits AS DOUBLE) / n_b, 6) AS accuracy,
           ROUND(ABS(conf_sum / 1000000.0 / n_b
                     - CAST(hits AS DOUBLE) / n_b) * n_b / t.n, 6)
             AS ece_contribution
    FROM bins CROSS JOIN tot t ORDER BY bin
    """


@query("q398_ece_reliability", oracle=_ece_oracle())
def q398_ece_reliability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + expected-calibration-error contributions
    over {ECE_BINS} confidence bins: truth fires at rate s but the
    model REPORTS s^2 — a planted miscalibration the diagram must
    show (overconfident... actually underconfident everywhere since
    s^2 < s). Every per-bin quantity is an exact integer moment
    (confidence sums stay in BIGINT millionths); ECE = sum of the
    ece_contribution column. The table q301's isotonic fit consumes.
    Scale: map-only hashing into one {ECE_BINS}-key aggregate."""
    docs = _docs(spark, sf_dir)
    h = lambda suf: F.conv(  # noqa: E731
        F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(suf))), 1, 4),
        16,
        10,
    ).cast("bigint")
    scored = docs.select(
        (h("_s") % 1000).alias("s_mill"), (h("_o") % 1000).alias("o_mill")
    )
    rows_ = scored.select(
        F.expr("s_mill div 100").cast("int").alias("bin"),
        (F.col("s_mill") * F.col("s_mill")).alias("conf_num"),
        F.when(F.col("o_mill") < F.col("s_mill"), 1).otherwise(0).alias("hit"),
    )
    bins = rows_.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_b"),
        F.sum("conf_num").cast("bigint").alias("conf_sum"),
        F.sum("hit").cast("bigint").alias("hits"),
    )
    tot = bins.agg(F.sum("n_b").cast("bigint").alias("n"))
    conf = F.col("conf_sum") / 1000000.0 / F.col("n_b")
    acc = F.col("hits").cast("double") / F.col("n_b")
    return (
        bins.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_b",
            F.round(conf, 6).alias("avg_confidence"),
            F.round(acc, 6).alias("accuracy"),
            F.round(F.abs(conf - acc) * F.col("n_b") / F.col("n"), 6).alias(
                "ece_contribution"
            ),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q399 — hex-grid hotspots with 1-ring smoothing
#
# Offset (odd-r) hex binning in INTEGER space: recover the exact
# integer hundredths the synthetic lat/lon were built from, then
# row = cents div 10, col = floor((lon_cents - (row%2)*7) / 14) —
# a brick-staggered tessellation (topologically hexagonal: every
# interior cell has exactly 6 neighbors).


def _hex_oracle() -> str:
    nbrs_even = "[[0,-1],[0,1],[-1,-1],[-1,0],[1,-1],[1,0]]"
    nbrs_odd = "[[0,-1],[0,1],[-1,0],[-1,1],[1,0],[1,1]]"
    return f"""
    WITH {SYNTH_TP_CTE},
    cents AS (
      SELECT CAST(ROUND((lat - 37.0) * 100) AS BIGINT) AS lat_c,
             CAST(ROUND((lon + 122.5) * 100) AS BIGINT) AS lon_c
      FROM trackpoints
    ),
    cells AS (
      SELECT lat_c // 10 AS row_id,
             CAST(FLOOR((lon_c - (lat_c // 10) % 2 * 7) / 14.0) AS BIGINT)
               AS col_id,
             COUNT(*) AS n_points
      FROM cents GROUP BY 1, 2
    ),
    nbr0 AS (
      SELECT row_id, col_id, n_points,
             unnest(CASE WHEN row_id % 2 = 0
                         THEN {nbrs_even} ELSE {nbrs_odd} END) AS d
      FROM cells
    ),
    nbr AS (
      SELECT row_id + d[1] AS row_id, col_id + d[2] AS col_id, n_points
      FROM nbr0
    ),
    smoothed AS (
      SELECT c.row_id, c.col_id, c.n_points,
             c.n_points + COALESCE(s.nsum, 0) AS smoothed_points
      FROM cells c
      LEFT JOIN (
        SELECT row_id, col_id, SUM(n_points) AS nsum
        FROM nbr GROUP BY row_id, col_id
      ) s ON s.row_id = c.row_id AND s.col_id = c.col_id
    )
    SELECT CAST(row_id AS BIGINT) AS row_id,
           CAST(col_id AS BIGINT) AS col_id,
           CAST(n_points AS BIGINT) AS n_points,
           CAST(smoothed_points AS BIGINT) AS smoothed_points
    FROM smoothed
    ORDER BY smoothed_points DESC, row_id, col_id LIMIT {HEX_TOPK}
    """


@query("q399_hexgrid_hotspots", oracle=_hex_oracle())
def q399_hexgrid_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hexagonal density hotspots: odd-r offset hex binning of the
    trackpoint cloud (integer-exact after recovering the hundredths
    the synthetic grid is built on), then 1-ring smoothing — each
    cell's count plus its 6 hex neighbors' (parity-dependent offsets,
    scattered map-side from the AGGREGATED cell table, never the point
    cloud) — the uniform-neighbor-distance heatmap a flight-ops
    display draws where square grids (q143) distort diagonals. Top
    {HEX_TOPK} cells by smoothed mass. Scale: one cell aggregate over
    the points; the neighbor explode is 6x the CELL table."""
    tp = synth_trackpoints(spark, sf_dir)
    cents = tp.select(
        F.round((F.col("lat") - 37.0) * 100).cast("bigint").alias("lat_c"),
        F.round((F.col("lon") + 122.5) * 100).cast("bigint").alias("lon_c"),
    )
    row_id = F.expr("lat_c div 10")
    col_id = F.floor(
        (F.col("lon_c") - (row_id % 2) * 7) / 14.0
    ).cast("bigint")
    cells = (
        cents.select(row_id.alias("row_id"), col_id.alias("col_id"))
        .groupBy("row_id", "col_id")
        .agg(F.count(F.lit(1)).alias("n_points"))
        .localCheckpoint()
    )
    even = [(0, -1), (0, 1), (-1, -1), (-1, 0), (1, -1), (1, 0)]
    odd = [(0, -1), (0, 1), (-1, 0), (-1, 1), (1, 0), (1, 1)]
    mk = lambda offs: F.array(  # noqa: E731
        *[
            F.struct(F.lit(dr).alias("dr"), F.lit(dc).alias("dc"))
            for dr, dc in offs
        ]
    )
    nbr = (
        cells.select(
            "row_id",
            "col_id",
            "n_points",
            F.explode(
                F.when(F.col("row_id") % 2 == 0, mk(even)).otherwise(mk(odd))
            ).alias("d"),
        )
        .select(
            (F.col("row_id") + F.col("d.dr")).alias("row_id"),
            (F.col("col_id") + F.col("d.dc")).alias("col_id"),
            "n_points",
        )
        .groupBy("row_id", "col_id")
        .agg(F.sum("n_points").alias("nsum"))
    )
    return (
        cells.join(nbr, ["row_id", "col_id"], "left")
        .select(
            F.col("row_id").cast("bigint").alias("row_id"),
            F.col("col_id").cast("bigint").alias("col_id"),
            F.col("n_points").cast("bigint").alias("n_points"),
            (F.col("n_points") + F.coalesce(F.col("nsum"), F.lit(0)))
            .cast("bigint")
            .alias("smoothed_points"),
        )
        .orderBy(F.desc("smoothed_points"), "row_id", "col_id")
        .limit(HEX_TOPK)
    )


# ---------------------------------------------------------------------------
# q400 — benchmark-contamination scan


def _contam_oracle() -> str:
    n = CONTAM_NGRAM
    grams = f"""
      SELECT doc_id, source,
             md5(array_to_string(toks[i + 1 : i + {n}], ' ')) AS g
      FROM (SELECT doc_id, source, toks,
                   unnest(range(0, GREATEST(len(toks) - {n} + 1, 0))) AS i
            FROM (SELECT doc_id, source, string_split(text, ' ') AS toks
                  FROM documents) t0) t
    """
    return f"""
    WITH grams AS ({grams}),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE source = 'src0'
    ),
    train_hits AS (
      SELECT t.source, t.doc_id, COUNT(DISTINCT t.g) AS n_shared_grams
      FROM grams t JOIN eval_grams e ON e.g = t.g
      WHERE t.source <> 'src0'
      GROUP BY t.source, t.doc_id
    ),
    per_source AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_contaminated_docs,
             CAST(SUM(n_shared_grams) AS BIGINT) AS total_shared_grams,
             CAST(MAX(n_shared_grams) AS BIGINT) AS max_shared_grams
      FROM train_hits GROUP BY source
    )
    SELECT * FROM per_source ORDER BY source
    """


@query("q400_contamination_scan", oracle=_contam_oracle())
def q400_contamination_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: treating src0 as the held-out eval
    benchmark, find training docs (all other sources) that share an
    exact {CONTAM_NGRAM}-gram with ANY eval doc — the n-gram-collision
    scan (GPT-3 appendix C / PaLM style) every training run owes its
    eval numbers. Hashed {CONTAM_NGRAM}-grams equi-join against the
    DISTINCT eval-gram set (broadcast-sized) — never doc pairs, the
    q81 span-hash family pointed across the train/eval split. Output:
    per-source contaminated-doc counts and collision mass."""
    docs = _docs(spark, sf_dir)
    n = CONTAM_NGRAM
    # materialize the token ARRAY as a column first: inlining the
    # split() expression into the per-gram lambda re-tokenized the
    # document once per gram (O(len²) work per doc); a column
    # reference is evaluated once per row (guide §4.1)
    tokd = docs.select("doc_id", "source", F.split("text", " ").alias("w"))
    # sequence(0, -1) would DESCEND in Spark — emit no grams for docs
    # shorter than the n-gram width instead
    idx = F.when(
        F.size("w") >= n, F.sequence(F.lit(0), F.size("w") - n)
    ).otherwise(F.array().cast("array<int>"))
    # one corpus tokenize+hash pass: both the eval-gram build and the
    # train-side probe scan this checkpoint instead of re-running the
    # explode lineage each (guide §2.4)
    grams = tokd.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                idx,
                lambda i: F.md5(
                    F.array_join(F.slice(F.col("w"), i + 1, n), " ")
                ),
            )
        ).alias("g"),
    ).localCheckpoint()
    eval_grams = (
        grams.filter(F.col("source") == "src0").select("g").distinct()
    )
    train_hits = (
        grams.filter(F.col("source") != "src0")
        .join(F.broadcast(eval_grams), "g")
        .groupBy("source", "doc_id")
        .agg(F.countDistinct("g").alias("n_shared_grams"))
    )
    return (
        train_hits.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_contaminated_docs"),
            F.sum("n_shared_grams").cast("bigint").alias("total_shared_grams"),
            F.max("n_shared_grams").cast("bigint").alias("max_shared_grams"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q401 — margin-based acquisition (active learning)


def _margin_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    dims AS (
      SELECT label, unnest(v) AS val, generate_subscripts(v, 1) AS dim
      FROM e
    ),
    cvals AS (
      SELECT label, dim,
             ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(38,9))) AS DOUBLE)
                   / COUNT(*), 6) AS cval
      FROM dims GROUP BY label, dim
    ),
    centroids AS (
      SELECT label, list(cval ORDER BY dim) AS cv FROM cvals GROUP BY label
    ),
    sims AS (
      SELECT e.vec_id, c.label AS c_label,
             ROUND(list_cosine_similarity(e.v, c.cv), 6) AS sim
      FROM e CROSS JOIN centroids c
    ),
    ranked AS (
      SELECT vec_id, c_label, sim,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY sim DESC, c_label) AS rk
      FROM sims
    ),
    margins AS (
      SELECT a.vec_id, a.c_label AS top_label,
             ROUND(a.sim - b.sim, 6) AS margin
      FROM ranked a JOIN ranked b
        ON b.vec_id = a.vec_id AND a.rk = 1 AND b.rk = 2
    )
    SELECT vec_id, top_label, margin FROM margins
    ORDER BY margin, vec_id LIMIT {MARGIN_BATCH}
    """


@query("q401_margin_sampling", oracle=_margin_oracle())
def q401_margin_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncertainty sampling, margin variant: score every point by the
    gap between its two most-similar label centroids (q67's DECIMAL
    centroid build, broadcast as 10 vectors) and emit the
    {MARGIN_BATCH} lowest-margin points — the acquisition batch an
    active-learning labeling loop sends to annotators (feeding the
    q379-q384 agreement machinery). The per-point ranking window is
    bounded (10 centroids per point); the final batch is a TakeOrdered.
    Scale: one corpus pass against broadcast centroids."""
    e = _emb(spark, sf_dir)
    dims = e.select("label", F.posexplode("v").alias("pos", "val"))
    cvals = (
        dims.groupBy("label", F.col("pos").alias("dim"))
        .agg(
            F.round(
                F.sum(F.round(F.col("val"), 9).cast("decimal(38,9)")).cast(
                    "double"
                )
                / F.count(F.lit(1)),
                6,
            ).alias("cval")
        )
    )
    centroids = (
        cvals.groupBy("label")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("dim"), F.col("cval")))
                ),
                lambda s: s.getField("cval"),
            ).alias("cv")
        )
        .select(F.col("label").alias("c_label"), "cv")
    )
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    sims = e.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "c_label",
        F.round(dot / (norm(F.col("v")) * norm(F.col("cv"))), 6).alias("sim"),
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("sim"), "c_label")
    ranked = sims.withColumn("rk", F.row_number().over(w))
    a = ranked.filter(F.col("rk") == 1).select(
        "vec_id", F.col("c_label").alias("top_label"), F.col("sim").alias("s1")
    )
    b = ranked.filter(F.col("rk") == 2).select("vec_id", F.col("sim").alias("s2"))
    return (
        a.join(b, "vec_id")
        .select(
            "vec_id",
            "top_label",
            F.round(F.col("s1") - F.col("s2"), 6).alias("margin"),
        )
        .orderBy("margin", "vec_id")
        .limit(MARGIN_BATCH)
    )
