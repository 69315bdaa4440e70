"""Vector similarity search over the ``embeddings`` table.

ANN operators for the LLM-data-pipeline surface: brute-force cosine
top-k (the exactness baseline), all-pairs near-dup above a threshold,
and hyperplane-LSH bucketed ANN (the 100 TB scale path: candidates
come from a bucket equi-join, not an n² cross join).

All arithmetic is double (embeddings cast float32→double first) and
all similarity outputs are rounded to 6 dp with deterministic vec_id
tie-breaks so Spark and DuckDB rank identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators import vectors
from ..tables import ensure_parallelism, load_table
from . import query

TOP_K = 5
DIM = 64
N_PLANES = 8


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Plane dots / dot products are per-row expensive: spread a
    # single-file local scan across cores (no-op on a real cluster).
    return ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )


# Spark-side expression builders live in operators/vectors.py (the
# reusable ANN library); the DuckDB twins below exist only for oracles.
_dot = vectors.dot_expr


_COS_SPARK = (
    f"({_dot('a.v', 'b.v')}) / "
    f"(sqrt({_dot('a.v', 'a.v')}) * sqrt({_dot('b.v', 'b.v')}))"
)


@query(
    "q40_cosine_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM e a JOIN e b ON b.vec_id <> a.vec_id
      WHERE a.vec_id % 100 = 0
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM pairs
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q40_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: the exact-ANN baseline. The probe set is
    broadcast; similarity is a JVM-side `aggregate(zip_with(...))` fold —
    no Python in the loop. At scale the corpus side stays partitioned and
    each partition emits its local top-k before the final merge."""
    e = _emb(spark, sf_dir)
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    return vectors.cosine_topk(e, probes, TOP_K)


@query(
    "q41_embedding_near_dup",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             a.label = b.label AS same_label,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, cos_sim, same_label
    FROM pairs WHERE cos_sim >= 0.3
    """,
)
def q41_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above a threshold — the
    semantic-dedup primitive. Exact all-pairs here (correctness anchor);
    q42 is the LSH-bucketed variant that scales."""
    return vectors.near_dup_pairs(_emb(spark, sf_dir), 0.3)


# --- hyperplane LSH ANN ------------------------------------------------------------
# Deterministic integer "hyperplanes": w[p][d] = ((p*67 + d*13) % 19) - 9,
# the same formula in both engines (no RNG → reproducible buckets).
def _plane_dot_duck(p: int) -> str:
    return (
        f"list_sum(list_transform(range(1, {DIM + 1}), "
        f"d -> v[d] * ((({p} * 67 + (d - 1) * 13) % 19) - 9)))"
    )


def _plane_dot_spark(p: int, v: str = "v") -> str:
    return vectors.plane_dot_expr(p, v, DIM)


def _bucket_duck() -> str:
    return " + ".join(
        f"(CASE WHEN {_plane_dot_duck(p)} >= 0 THEN {1 << p} ELSE 0 END)"
        for p in range(N_PLANES)
    )


def _bucket_spark(v: str = "v") -> str:
    return vectors.bucket_expr(N_PLANES, v, DIM)


# --- banded multi-probe LSH near-dup (q48) -----------------------------------
# 4 bands × 4 planes (plane index p = band*4 + r, same deterministic
# integer planes as q42). A pair is a candidate when its band buckets
# are within Hamming distance 1 in ANY band — implemented as a one-sided
# probe expansion (exact bucket ⋈ {bucket, bucket^1, ^2, ^4, ^8}), the
# same trick as the trajectory grid's 3×3 neighborhood. For cos≥0.3
# pairs this gives measured recall ≈0.9 vs the exact q41 (see
# tests/test_queries_oracle.py::test_q48_recall_vs_exact); recall rises
# with similarity, so true near-dups (cos≥0.9) are essentially never
# missed while the candidate set stays a bucket join, not n².
B_BANDS = 4
R_PLANES = 4
PROBE_MASKS = [0] + [1 << r for r in range(R_PLANES)]


def _band_bucket_spark(band: int) -> str:
    return vectors.bucket_expr(R_PLANES, "v", DIM, first_plane=band * R_PLANES)


def _band_bucket_duck(band: int) -> str:
    return " + ".join(
        f"(CASE WHEN {_plane_dot_duck(band * R_PLANES + r)} >= 0 THEN {1 << r} ELSE 0 END)"
        for r in range(R_PLANES)
    )


@query(
    "q48_lsh_near_dup",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    bb AS (
      {" UNION ALL ".join(
          f"SELECT vec_id, {band} AS band, {_band_bucket_duck(band)} AS bkt FROM e"
          for band in range(B_BANDS))}
    ),
    probes AS (
      SELECT vec_id, band, xor(bkt, m) AS bkt
      FROM bb, (VALUES {", ".join(f"({m})" for m in PROBE_MASKS)}) ms(m)
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, p.vec_id AS vec_b
      FROM bb a JOIN probes p
        ON a.band = p.band AND a.bkt = p.bkt AND a.vec_id < p.vec_id
    )
    SELECT c.vec_a, c.vec_b,
           ROUND(list_cosine_similarity(ea.v, eb.v), 6) AS cos_sim,
           ea.label = eb.label AS same_label
    FROM cand c
    JOIN e ea ON ea.vec_id = c.vec_a
    JOIN e eb ON eb.vec_id = c.vec_b
    WHERE ROUND(list_cosine_similarity(ea.v, eb.v), 6) >= 0.3
    """,
)
def q48_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded near-dup through banded multi-probe LSH — the 100 TB
    shape for q41's semantics: candidates from a (band, bucket) equi-join
    with Hamming-1 probe expansion, exact cosine + threshold only on the
    surviving pairs. Shuffles on the bucket key; never materializes n²."""
    e = _emb(spark, sf_dir).withColumn("nrm", F.expr(f"sqrt({_dot('v', 'v')})"))
    bands_expr = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.expr(_band_bucket_spark(band)).cast("int").alias("bkt"),
            )
            for band in range(B_BANDS)
        ]
    )
    bb = e.select("vec_id", F.explode(bands_expr).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bkt").alias("bkt")
    )
    probes = bb.select(
        "vec_id",
        "band",
        F.explode(F.array(*[F.lit(m) for m in PROBE_MASKS])).alias("m"),
        F.col("bkt").alias("b0"),
    ).select("vec_id", "band", F.expr("int(b0) ^ m").alias("bkt"))
    cand = (
        bb.alias("a")
        .join(
            probes.alias("p"),
            (F.col("a.band") == F.col("p.band"))
            & (F.col("a.bkt") == F.col("p.bkt"))
            & (F.col("a.vec_id") < F.col("p.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("p.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = e.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("label").alias("la"), F.col("nrm").alias("na"),
    )
    eb = e.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("label").alias("lb"), F.col("nrm").alias("nb"),
    )
    cos = F.expr(f"({_dot('va', 'vb')})") / (F.col("na") * F.col("nb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(cos, 6).alias("cos_sim"),
            (F.col("la") == F.col("lb")).alias("same_label"),
        )
        .filter(F.col("cos_sim") >= 0.3)
    )


@query(
    "q42_lsh_ann",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bucketed AS (SELECT vec_id, v, {_bucket_duck()} AS bucket FROM e),
    cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM bucketed a JOIN bucketed b
        ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
      WHERE a.vec_id % 100 = 0
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q42_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH ANN: 8 sign-of-dot-product bits → 256 buckets;
    candidates share a bucket (equi-join on bucket id — shuffles on the
    bucket key, never materializes n² pairs), then exact cosine re-rank.
    Deterministic integer planes replace RNG so any engine reproduces
    the same buckets."""
    e = _emb(spark, sf_dir)
    bucketed = e.withColumn("bucket", F.expr(_bucket_spark())).withColumn(
        "vnorm", F.expr(f"sqrt({_dot('v', 'v')})")
    )
    a = bucketed.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("bucket").alias("qbucket"),
        F.col("vnorm").alias("qnorm"),
    )
    cand = (
        bucketed.join(
            F.broadcast(a),
            (F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                F.expr(f"({_dot('qv', 'v')})") / (F.col("qnorm") * F.col("vnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# --- IVF ANN (q50) -----------------------------------------------------------
# Coarse quantizer: K deterministic centroids (the vectors with
# vec_id < K — stable in any engine, no k-means RNG). Every vector is
# assigned to its max-cosine centroid MAP-SIDE: the K centroids are
# collapsed into ONE broadcast row and the argmax runs as a
# higher-order-function fold per row, so assignment adds no shuffle at
# all. Queries probe their nprobe=3 nearest cells; candidates come from
# a cell equi-join (like an IVF inverted list), exact cosine re-ranks.
# The synthetic embeddings are uniform (no cluster structure — IVF's
# worst case): measured recall@5 vs exact q40 is 0.56 at sf0.001 and
# 0.72 at sf0.01 (tests/test_queries_oracle.py::test_q50_recall_vs_
# exact); on real, clusterable embeddings the same shape recalls far
# higher per probed fraction, and K grows with sqrt(n) at scale.
N_CENTROIDS = 8
N_PROBE = 3

# per-row argmax over the broadcast centroid array: struct ordering
# makes array_max pick (max score, then max -id => min id)
_BEST_CELLS = f"""
slice(reverse(array_sort(transform(cents, c -> struct(
  aggregate(zip_with(v, c.cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / c.nrm AS s,
  -c.id AS negid)))), 1, {{n}})
"""


@query(
    "q50_ivf_ann",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cents AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
    asg AS (
      SELECT e.vec_id, e.v, cid,
             ROW_NUMBER() OVER (
               PARTITION BY e.vec_id
               ORDER BY list_inner_product(e.v, cv) / sqrt(list_inner_product(cv, cv)) DESC,
                        cid) AS rn
      FROM e, cents
    ),
    cells AS (SELECT vec_id, v, cid AS cell FROM asg WHERE rn = 1),
    qprobe AS (SELECT vec_id, v, cid AS cell FROM asg
               WHERE rn <= {N_PROBE} AND vec_id % 100 = 0),
    cand AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos_sim
      FROM qprobe q JOIN cells c ON c.cell = q.cell AND c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cos_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rank
      FROM cand
    )
    SELECT query_id, neighbor_id, cos_sim, rank
    FROM ranked WHERE rank <= {TOP_K}
    """,
)
def q50_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: deterministic coarse centroids, map-side cell
    assignment (one broadcast row of centroids + an HOF argmax — zero
    shuffle), nprobe=3 probe expansion, cell equi-join for candidates,
    exact cosine re-rank. The inverted-file sibling of q42's LSH path;
    at 100 TB the corpus side shuffles once on the cell key and cells
    can be written as partition values for pruned probes."""
    e = _emb(spark, sf_dir)
    cents = (
        e.filter(F.col("vec_id") < N_CENTROIDS)
        .select(
            F.struct(
                F.col("vec_id").cast("int").alias("id"),
                F.col("v").alias("cv"),
                F.expr(f"sqrt({_dot('v', 'v')})").alias("nrm"),
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("cents"))
    )
    base = e.join(F.broadcast(cents), F.lit(True)).withColumn(
        "vnorm", F.expr(f"sqrt({_dot('v', 'v')})")
    )
    corpus = base.withColumn(
        "cell", -F.expr(_BEST_CELLS.format(n=1))[0]["negid"]
    ).select("vec_id", "v", "vnorm", "cell")
    probes = (
        base.filter(F.col("vec_id") % 100 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("vnorm").alias("qnorm"),
            F.explode(F.expr(_BEST_CELLS.format(n=N_PROBE))).alias("probe"),
        )
        .select("query_id", "qv", "qnorm", (-F.col("probe")["negid"]).alias("qcell"))
    )
    cand = corpus.join(
        F.broadcast(probes),
        (F.col("cell") == F.col("qcell")) & (F.col("vec_id") != F.col("query_id")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            F.expr(f"({_dot('qv', 'v')})") / (F.col("qnorm") * F.col("vnorm")), 6
        ).alias("cos_sim"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


# --- per-label centroids (the k-means/IVF training step) ---------------------------
@query(
    "q67_label_centroids",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
    dims AS (
      SELECT label,
             unnest(v) AS val,
             generate_subscripts(v, 1) AS dim
      FROM e
    )
    SELECT label, dim,
           ROUND(CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(38,9))) AS DOUBLE)
                 / COUNT(*), 6) AS centroid_val,
           COUNT(*) AS n_vecs
    FROM dims WHERE dim <= 8 GROUP BY label, dim
    """,
)
def q67_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid coordinates (first 8 dims shown): the update
    step of Lloyd's k-means / the training step of an IVF index —
    posexplode to (label, dim, val), one shuffle on the (label, dim)
    composite key, AVG per cell. At 100 TB the dims stay bounded (the
    embedding width), so the aggregate output is k×d rows — tiny — while
    the map side streams; partial aggregation does the heavy lifting."""
    e = _emb(spark, sf_dir)
    dims = e.select(
        "label", F.posexplode("v").alias("pos", "val")
    ).withColumn("dim", F.col("pos") + 1)
    return (
        dims.filter(F.col("dim") <= 8)
        .groupBy("label", "dim")
        # decimal accumulation: order-free sum so the repartitioned scan
        # cannot drift the rounded mean between runs/engines
        .agg(
            F.round(
                F.sum(F.round(F.col("val"), 9).cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("centroid_val"),
            F.count(F.lit(1)).alias("n_vecs"),
        )
    )


@query(
    "q101_sim_histogram",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    bb AS (
      {" UNION ALL ".join(
          f"SELECT vec_id, {band} AS band, {_band_bucket_duck(band)} AS bkt FROM e"
          for band in range(B_BANDS))}
    ),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      FROM bb a JOIN bb b
        ON a.band = b.band AND a.bkt = b.bkt AND a.vec_id < b.vec_id
    ),
    scored AS (
      SELECT CAST(FLOOR(ROUND(list_cosine_similarity(ea.v, eb.v), 6) * 20) AS BIGINT)
               AS bin
      FROM cand c
      JOIN e ea ON ea.vec_id = c.vec_a
      JOIN e eb ON eb.vec_id = c.vec_b
    )
    SELECT bin,
           ROUND(bin / 20.0, 2) AS bin_lo,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM scored GROUP BY bin
    """,
)
def q101_sim_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-similarity histogram over the LSH candidate pairs (0.05
    bins): the calibration curve you read before choosing a near-dup
    threshold — a bimodal histogram's valley IS the threshold. Costs
    one banded bucket join (q48's candidate economics) plus one
    bounded aggregate; the bin edge floors a ROUNDED similarity so
    both engines bin identically."""
    e = _emb(spark, sf_dir).withColumn("nrm", F.expr(f"sqrt({_dot('v', 'v')})"))
    bands_expr = F.array(
        *[
            F.struct(
                F.lit(band).alias("band"),
                F.expr(_band_bucket_spark(band)).cast("int").alias("bkt"),
            )
            for band in range(B_BANDS)
        ]
    )
    bb = e.select("vec_id", F.explode(bands_expr).alias("bb")).select(
        "vec_id", F.col("bb.band").alias("band"), F.col("bb.bkt").alias("bkt")
    )
    cand = (
        bb.alias("a")
        .join(
            bb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkt") == F.col("b.bkt"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
        .distinct()
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                  F.col("nrm").alias("na"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                  F.col("nrm").alias("nb"))
    cos = F.expr(f"({_dot('va', 'vb')})") / (F.col("na") * F.col("nb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(F.floor(F.round(cos, 6) * 20).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select("bin", F.round(F.col("bin") / 20.0, 2).alias("bin_lo"), "n_pairs")
    )
