"""Mining batch 12 (q223-q228): robust trend estimation (Theil-Sen),
trajectory clustering (grid-Hausdorff edges → connected components),
perceptual-hash media near-dup (aHash + Hamming banding), product
quantization ANN (PQ encode + asymmetric-distance top-k), exact
substring-span REMOVAL (the cleaning step q81's detector only
measures), and quantization retrieval fidelity (does a compressed
vector still retrieve its own original?).

Each query names the sibling operator it extends; PLANS.md carries the
plan audit. Determinism follows DETERMINISM.md: integer/index
arithmetic wherever possible (aHash bit tests are cross-multiplied
integers, span removal is pure token-index set algebra), ordered
HOF folds for the float paths (identical left-to-right evaluation in
Spark and DuckDB, the q40/q42 discipline), and 6-dp output rounding
with id tie-breaks wherever a float feeds a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.operators import textdedup
from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .extras import _GRID_PAIRS_SQL
from .synth import SYNTH_TP_CTE, synth_trackpoints

from flightdb_spark.functions.geo import HAVERSINE_SQL


# ---------------------------------------------------------------------------
# q223 — Theil-Sen robust slope of the daily order-count series

EPOCH_DAY0 = "1992-01-01"


@query(
    "q223_theil_sen",
    oracle=f"""
    WITH daily AS (
      SELECT date_diff('day', DATE '{EPOCH_DAY0}', o_orderdate::DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY 1
    ),
    pairs AS (
      SELECT CAST(b.n - a.n AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
      FROM daily a JOIN daily b ON b.d > a.d
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS np FROM pairs),
    dist AS (SELECT slope, COUNT(*) AS c FROM pairs GROUP BY slope),
    cum AS (
      SELECT slope,
             SUM(c) OVER (ORDER BY slope ROWS UNBOUNDED PRECEDING) AS cc
      FROM dist
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM daily) AS n_days,
           tot.np AS n_pairs,
           ROUND((SELECT MIN(slope) FROM cum, tot WHERE cc >= (np + 1) // 2),
                 6) AS ts_slope
    FROM tot
    """,
)
def q223_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen estimator over daily order counts: the LOWER median of
    all pairwise slopes — the robust companion to q184's least-squares
    slope and the magnitude twin of q205's Mann-Kendall sign test (same
    calendar-bounded pairwise join; Sen 1968). Slopes are exact-integer
    differences divided once (identical IEEE doubles on both engines);
    the median is an ORDER STATISTIC, found without any global window
    by collapsing to distinct slope values and running the bucketed
    prefix-sum scan (operators/prefix.py) over them — the lower median
    is the smallest slope whose cumulative count reaches ceil(np/2).
    At 100 TB the daily table is calendar-bounded, so the pair join and
    the distinct-slope ECDF never scale with corpus rows."""
    o = load_table(spark, sf_dir, "orders")
    # checkpoint the calendar-bounded daily table: the orders corpus
    # aggregate was re-run per reference (both pair-join sides + the
    # n_days count — P3 pattern, guide §2.4)
    daily = (
        o.groupBy(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit(EPOCH_DAY0)).alias("d")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    b = daily.select(F.col("d").alias("d_b"), F.col("n").alias("n_b"))
    pairs = daily.join(b, F.col("d_b") > F.col("d")).select(
        (
            (F.col("n_b") - F.col("n")).cast("double")
            / (F.col("d_b") - F.col("d")).cast("double")
        ).alias("slope")
    )
    # dist stays LAZY: checkpointing the ~np-row distinct-slope table
    # was measured slower (materializing ~3M rows costs more than the
    # 4 parallel re-runs of the broadcast pair join over the 2.4k-row
    # checkpointed daily table it would save — the joins are bounded by
    # calendar days at ANY corpus size, so re-running them is scale-safe)
    dist = pairs.groupBy("slope").agg(F.count(F.lit(1)).alias("c"))
    cum = bucketed_cumsum(dist, "slope", ["c"])
    # np = SUM of the per-slope counts == the pair count, exactly —
    # no second pair pass
    tot = dist.agg(F.sum("c").cast("bigint").alias("np"))
    med = (
        cum.join(F.broadcast(tot))
        .filter(F.col("cum_c") >= F.expr("(np + 1) div 2"))
        .agg(F.round(F.min("slope"), 6).alias("ts_slope"))
    )
    n_days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        n_days.join(F.broadcast(tot))
        .join(F.broadcast(med))
        .select("n_days", F.col("np").alias("n_pairs"), "ts_slope")
    )


# ---------------------------------------------------------------------------
# q224 — trajectory clustering: grid-Hausdorff edges → connected components

TRAJ_CLUSTER_KM = 32.0  # edge threshold on the ROUNDED symmetric Hausdorff
TRAJ_MAX_FLIGHT = 12    # same subset as q47 (bounds the oracle's pair work)


def _traj_cluster_oracle() -> str:
    return f"""
    WITH RECURSIVE {SYNTH_TP_CTE.strip()},
    pts AS (
      SELECT flight_id, lat, lon FROM trackpoints
      WHERE flight_id < {TRAJ_MAX_FLIGHT}
    ),
    {_GRID_PAIRS_SQL},
    both_dirs AS (
      SELECT flight_a, flight_b FROM pairs
      UNION ALL
      SELECT flight_b, flight_a FROM pairs
    ),
    dists AS (
      SELECT p.flight_a, p.flight_b, a.lat AS alat, a.lon AS alon,
             MIN({HAVERSINE_SQL.format(lat1='a.lat', lon1='a.lon',
                                       lat2='b.lat', lon2='b.lon')}) AS min_d
      FROM both_dirs p
      JOIN pts a ON a.flight_id = p.flight_a
      JOIN pts b ON b.flight_id = p.flight_b
      GROUP BY p.flight_a, p.flight_b, a.lat, a.lon
    ),
    directed AS (
      SELECT flight_a, flight_b, MAX(min_d) AS h FROM dists
      GROUP BY flight_a, flight_b
    ),
    hd AS (
      SELECT LEAST(flight_a, flight_b) AS fa,
             GREATEST(flight_a, flight_b) AS fb,
             ROUND(MAX(h), 3) AS hkm
      FROM directed GROUP BY 1, 2
    ),
    edges AS (
      SELECT fa AS src, fb AS dst FROM hd WHERE hkm <= {TRAJ_CLUSTER_KM}
      UNION
      SELECT fb, fa FROM hd WHERE hkm <= {TRAJ_CLUSTER_KM}
      UNION
      SELECT flight_id, flight_id FROM (SELECT DISTINCT flight_id FROM pts)
    ),
    reach(fid, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.fid
    ),
    comp AS (SELECT fid, MIN(label) AS cluster_id FROM reach GROUP BY fid)
    SELECT fid AS flight_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
    FROM comp
    """


@query("q224_trajectory_clusters", oracle=_traj_cluster_oracle())
def q224_trajectory_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trajectory clustering: flights whose grid-gated symmetric
    Hausdorff distance (q47's exact scale path — candidate pairs from
    the 0.5° cell equi-join, never a point theta-join) is within
    {TRAJ_CLUSTER_KM} km become edges; clusters are connected
    components via the shared min-label edge-contraction operator
    (operators/textdedup.py, the q51/q143 engine). Every flight enters
    as a self-loop so isolated trajectories surface as singleton
    clusters instead of vanishing. The composition a fleet-analysis
    pipeline runs to find shared routes; at 100 TB each stage keeps
    its own bounded shape (cell join → per-pair aggregate → O(log d)
    contraction rounds on a pair-sized edge list)."""
    from flightdb_spark.operators.trajectory import symmetric_hausdorff_grid

    # The 12-flight point set is referenced FIVE times downstream
    # (grid-pair a/b sides, both distance point sides, singles) — each
    # re-ran the events scan + round-robin repartition without the
    # checkpoint (guide §2.4). It is bounded (12 flights' points), so
    # pin it once.
    tp = (
        synth_trackpoints(spark, sf_dir)
        .filter(F.col("flight_id") < TRAJ_MAX_FLIGHT)
        .select("flight_id", "lat", "lon")
        .localCheckpoint()
    )
    h = symmetric_hausdorff_grid(tp)
    edges = h.filter(
        F.round("hausdorff_km", 3) <= TRAJ_CLUSTER_KM
    ).select(F.col("flight_a").alias("a"), F.col("flight_b").alias("b"))
    singles = (
        tp.select("flight_id").distinct()
        .select(F.col("flight_id").alias("a"), F.col("flight_id").alias("b"))
    )
    comp = textdedup.connected_components(
        edges.union(singles), src="a", dst="b"
    )
    w = Window.partitionBy("cluster_id")
    return comp.select(
        F.col("doc_id").alias("flight_id"),
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("n_members"),
    )


# ---------------------------------------------------------------------------
# q225 — perceptual-hash (aHash) media near-dup via Hamming banding

AHASH_BITS = 64
AHASH_BANDS = 4          # 16 bits per band; pigeonhole recall 1.0 at Hamming<=3
AHASH_MAX_HAMMING = 12   # accept band-candidates up to this Hamming distance
AHASH_MIN_LEN = 64       # every one of the 64 blocks must be non-empty

# Canonical payload: the "decode" step of real perceptual hashing —
# lowercase + non-alphanumeric collapse (the corpus's near-dups are
# editorial variants, not byte copies). Shares the exact normalization
# of operators/textdedup.NORM_TOKENS so implementation and oracle
# cannot drift.
_NTEXT_SPARK = (
    "array_join(filter(split(trim(regexp_replace(lower(text), "
    "'[^a-z0-9 ]', ' ')), ' '), x -> x != ''), ' ')"
)
_NTEXT_DUCK = (
    "array_to_string(list_filter(string_split(trim(regexp_replace("
    "lower(text), '[^a-z0-9 ]', ' ', 'g')), ' '), x -> x <> ''), ' ')"
)

# 64 block BYTE SUMS over equal index ranges [i*L/64, (i+1)*L/64) —
# the 8x8 "pixel grid" of aHash, robust to local edits where single
# sampled bytes are not. Bit test is the block-mean-vs-global-mean
# comparison cross-multiplied into integers: bsum_i * L >= s * blen_i.
#
# The whole hash is ONE Spark expression with every intermediate
# (normalized text, length, block sums, total) bound exactly once via
# single-element transform() lambdas. Plain withColumn chaining is a
# trap here: Catalyst's projection collapse would inline the regexp
# normalization into all ~L character reads and the 64-block sum into
# all 64 bit tests — measured as a >100x slowdown (the sf0.001 check
# ran minutes instead of seconds) before this binding.
def _ahash_bands_spark() -> str:
    bsum = (
        "transform(sequence(0, 63), i -> aggregate("
        "sequence(int((i * L) div 64) + 1, int(((i + 1) * L) div 64)), 0L, "
        "(acc, p) -> acc + ascii(substring(nt, p, 1))))"
    )
    blen = (
        "transform(sequence(0, 63), i -> "
        "int(((i + 1) * L) div 64) - int((i * L) div 64))"
    )
    bands = (
        "transform(sequence(0, 3), b -> aggregate(sequence(0, 15), 0, "
        "(acc2, r) -> acc2 + IF(element_at(t.bsum, b * 16 + r + 1) * L >= "
        "s * element_at(t.blen, b * 16 + r + 1), shiftleft(1, r), 0)))"
    )
    return (
        "transform(array(ntext), nt -> "
        "transform(array(length(nt)), L -> "
        f"transform(array(struct({bsum} AS bsum, {blen} AS blen)), t -> "
        "transform(array(aggregate(t.bsum, 0L, (a0, x0) -> a0 + x0)), s -> "
        f"{bands})[0])[0])[0])[0]"
    )


_BSUM_DUCK = (
    "list_transform(range(0, 64), i -> list_sum(list_transform("
    "range((i * L) // 64 + 1, ((i + 1) * L) // 64 + 1), "
    "p -> ascii(substr(ntext, p::INT, 1)))))"
)
_BLEN_DUCK = (
    "list_transform(range(0, 64), i -> ((i + 1) * L) // 64 - (i * L) // 64)"
)
_BANDS_DUCK = (
    "list_transform(range(0, 4), b -> list_sum(list_transform(range(0, 16), "
    "r -> CASE WHEN bsum[(b * 16 + r + 1)::INT] * L >= "
    "s * blen[(b * 16 + r + 1)::INT] THEN (1 << r) ELSE 0 END)))"
)


@query(
    "q225_ahash_neardup",
    oracle=f"""
    WITH nd AS (
      SELECT doc_id, {_NTEXT_DUCK} AS ntext FROM documents
    ),
    img AS (
      SELECT doc_id, ntext, length(ntext) AS L
      FROM nd WHERE length(ntext) >= {AHASH_MIN_LEN}
    ),
    sums AS (
      SELECT doc_id, L, {_BSUM_DUCK} AS bsum, {_BLEN_DUCK} AS blen
      FROM img
    ),
    hashed AS (
      SELECT doc_id, {_BANDS_DUCK} AS bands
      FROM (SELECT doc_id, L, bsum, blen, list_sum(bsum) AS s FROM sums)
    ),
    bb AS (
      SELECT doc_id, b, bands[(b + 1)::INT] AS bval
      FROM hashed, range(0, {AHASH_BANDS}) r(b)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bb a JOIN bb b
        ON a.b = b.b AND a.bval = b.bval AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(list_sum(list_transform(range(0, {AHASH_BANDS}), i ->
             bit_count(CAST(xor(ha.bands[(i + 1)::INT],
                                hb.bands[(i + 1)::INT]) AS BIGINT))))
                AS BIGINT) AS hamming
    FROM cand c
    JOIN hashed ha ON ha.doc_id = c.doc_a
    JOIN hashed hb ON hb.doc_id = c.doc_b
    WHERE list_sum(list_transform(range(0, {AHASH_BANDS}), i ->
            bit_count(CAST(xor(ha.bands[(i + 1)::INT],
                               hb.bands[(i + 1)::INT]) AS BIGINT))))
          <= {AHASH_MAX_HAMMING}
    """,
)
def q225_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash (aHash) near-duplicate detection over media
    payloads: canonicalize the payload (the decode step), compute 64
    block byte-means as the 8x8 grid, bit = block mean >= global mean
    with the comparison CROSS-MULTIPLIED so every hash bit is exact
    integer arithmetic, then find near pairs through 16-bit band
    buckets (q107's pigeonhole banding on media bytes: recall 1.0 at
    Hamming <= 3 with {AHASH_BANDS} bands, partial — like q48's LSH —
    out to the accepted {AHASH_MAX_HAMMING}). The q28 exact-dedup
    economics for payloads that were re-encoded rather than
    byte-copied: candidates come from a (band, value) equi-join, never
    pairs²; verification is bit_count(xor) on four ints. All JVM-side
    column arithmetic — no Python, no floats anywhere."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    # (doc_id, 4-int bands) is referenced four times below (both sides
    # of the band self-join via bb, then ha/hb for verification) — each
    # re-ran the O(L)-per-doc hash expression over the corpus without
    # the checkpoint (guide §2.4): 4 hash passes -> 1.
    hashed = (
        docs.select("doc_id", F.expr(_NTEXT_SPARK).alias("ntext"))
        .filter(F.length("ntext") >= AHASH_MIN_LEN)
        .select("doc_id", F.expr(_ahash_bands_spark()).alias("bands"))
        .localCheckpoint()
    )
    bb = hashed.select(
        "doc_id", F.posexplode("bands").alias("b", "bval")
    )
    cand = (
        bb.alias("a")
        .join(
            bb.alias("b"),
            (F.col("a.b") == F.col("b.b"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = hashed.select(F.col("doc_id").alias("doc_a"), F.col("bands").alias("ba"))
    hb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("bands").alias("bb"))
    hamming = F.expr(
        "aggregate(zip_with(ba, bb, (x, y) -> bit_count(x ^ y)), 0L, "
        "(acc, h) -> acc + h)"
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= AHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
    )


# ---------------------------------------------------------------------------
# q226 — product quantization: PQ encode + asymmetric-distance top-k

PQ_M = 8          # subspaces
PQ_SUB = 8        # dims per subspace (8 x 8 = the 64-dim embedding)
PQ_K = 16         # codewords per subspace (anchors: vec_id < PQ_K)
PQ_TOP_K = 5

# d2 between v's m-th subvector and codeword list cw (full-width vector),
# ordered left-to-right fold — identical evaluation order on both engines.
_D2_SPARK = (
    "aggregate(sequence(1, {sub}), cast(0.0 as double), (a2, i) -> a2 + "
    "(element_at({v}, {m} * {sub} + i) - element_at({cw}, {m} * {sub} + i)) * "
    "(element_at({v}, {m} * {sub} + i) - element_at({cw}, {m} * {sub} + i)))"
)
_D2_DUCK = (
    "list_sum(list_transform(range(1, {sub} + 1), i -> "
    "({v}[{m} * {sub} + i] - {cw}[{m} * {sub} + i]) * "
    "({v}[{m} * {sub} + i] - {cw}[{m} * {sub} + i])))"
)


def _codes_spark() -> str:
    d2 = _D2_SPARK.format(v="v", cw="element_at(cvs, k + 1)", m="m", sub=PQ_SUB)
    return (
        f"transform(sequence(0, {PQ_M - 1}), m -> "
        f"int(array_position(transform(sequence(0, {PQ_K - 1}), k -> {d2}), "
        f"array_min(transform(sequence(0, {PQ_K - 1}), k -> {d2}))) - 1))"
    )


def _codes_duck() -> str:
    d2 = _D2_DUCK.format(v="e.v", cw="cb.cvs[(k + 1)::INT]", m="m", sub=PQ_SUB)
    return (
        f"list_transform(range(0, {PQ_M}), m -> "
        f"list_indexof(list_transform(range(0, {PQ_K}), k -> {d2}), "
        f"list_min(list_transform(range(0, {PQ_K}), k -> {d2}))) - 1)"
    )


def _adc_spark() -> str:
    d2 = _D2_SPARK.format(
        v="qv", cw="element_at(cvs, int(element_at(codes, m + 1)) + 1)",
        m="m", sub=PQ_SUB,
    )
    return (
        f"aggregate(sequence(0, {PQ_M - 1}), cast(0.0 as double), "
        f"(acc, m) -> acc + ({d2}))"
    )


def _adc_duck() -> str:
    d2 = _D2_DUCK.format(
        v="q.v", cw="cb.cvs[(c.codes[(m + 1)::INT] + 1)::INT]",
        m="m", sub=PQ_SUB,
    )
    return f"list_sum(list_transform(range(0, {PQ_M}), m -> {d2}))"


@query(
    "q226_pq_adc_topk",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    cb AS (SELECT list(v ORDER BY vec_id) AS cvs FROM e WHERE vec_id < {PQ_K}),
    corpus AS (
      SELECT e.vec_id, {_codes_duck()} AS codes FROM e, cb
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             ROUND({_adc_duck()}, 6) AS adc_dist
      FROM corpus c, (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0) q, cb
      WHERE c.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, adc_dist, rank
    FROM ranked WHERE rank <= {PQ_TOP_K}
    """,
)
def q226_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011): split the 64-dim
    embedding into {PQ_M} subspaces of {PQ_SUB} dims, quantize each
    subvector to its nearest of {PQ_K} deterministic codewords (the
    vec_id < {PQ_K} anchors — q50's no-RNG centroid convention), and
    rank neighbors by ASYMMETRIC distance: the exact query subvector
    against the neighbor's codeword per subspace, summed. The encode
    step is map-side (one broadcast codebook row + HOF argmin per
    vector, zero shuffle — each vector compresses 64 doubles to
    {PQ_M} nibbles, the 64x memory cut that lets a 100 TB index
    fit in RAM); candidates here are all-corpus (the small-n oracle
    anchor) with per-partition partial top-k, and at scale the same
    codes column drops into q50's IVF cell join (IVF-PQ). Argmin
    tie-breaks to the LOWEST codeword on both engines (first-index-of-
    min); ADC sums are identical ordered folds, rounded 6 dp with id
    tie-breaks before ranking."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cb = (
        e.filter(F.col("vec_id") < PQ_K)
        .select(F.struct(F.col("vec_id").alias("id"), F.col("v").alias("cv")).alias("c"))
        .agg(F.expr("transform(sort_array(collect_list(c)), x -> x.cv)").alias("cvs"))
    )
    corpus = (
        e.join(F.broadcast(cb))
        .withColumn("codes", F.expr(_codes_spark()))
        .select("vec_id", "codes")
    )
    probes = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    scored = (
        corpus.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(cb))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(F.expr(_adc_spark()), 6).alias("adc_dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


# ---------------------------------------------------------------------------
# q227 — exact substring-span removal (the cleaning step behind q81)

SPAN_N = 5  # tokens per span (Lee et al. 2021 granularity, as q81)


@query(
    "q227_dup_span_removal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    grams AS (
      SELECT doc_id, p,
             md5(array_to_string(tk[(p + 1)::INT:(p + {SPAN_N})::INT], ' ')) AS gh
      FROM toks, LATERAL unnest(range(0, greatest(len(tk) - {SPAN_N - 1}, 0))) t(p)
    ),
    dup AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) > 1),
    cov AS (
      SELECT DISTINCT g.doc_id, g.p + d AS pos
      FROM grams g JOIN dup USING (gh), unnest(range(0, {SPAN_N})) r(d)
    ),
    tokpos AS (
      SELECT doc_id, generate_subscripts(tk, 1) - 1 AS pos, unnest(tk) AS tok
      FROM toks
    ),
    kept AS (
      SELECT t.doc_id, t.pos, t.tok
      FROM tokpos t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.pos = t.pos
      WHERE c.doc_id IS NULL
    ),
    agg AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
             string_agg(tok, ' ' ORDER BY pos) AS cleaned
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.tk) AS BIGINT) AS n_tokens,
           CAST(len(t.tk) AS BIGINT) - COALESCE(a.n_kept, 0) AS n_removed,
           md5(COALESCE(a.cleaned, '')) AS cleaned_hash,
           CAST(length(COALESCE(a.cleaned, '')) AS BIGINT) AS cleaned_len
    FROM toks t LEFT JOIN agg a USING (doc_id)
    """,
)
def q227_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup as a CLEANING operator: every {SPAN_N}-token
    span occurring more than once anywhere in the corpus (intra- or
    inter-document) marks its token positions; covered positions are
    dropped and each document is re-assembled from the survivors (Lee
    et al. 2021's removal step — q81 only measures the duplicated
    fraction, this produces the cleaned corpus). Token-position set
    algebra end to end: gram hashes are md5 over identical span
    strings, coverage is an index-range explode + distinct, removal is
    a co-partitioned anti-join on (doc_id, pos), and reassembly is a
    per-doc sort_array over (pos, token) — no global order anywhere.
    The output ships the cleaned text's md5 + length (hash-comparable
    across engines) rather than megabytes of text through the gate.
    At 100 TB: gram counts are one natural-key shuffle (the q81/q130
    shape), coverage and reassembly shuffle on doc_id only."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.split("text", " ").alias("tk"))
    grams = toks.select(
        "doc_id",
        F.explode(
            # sequence(1, 0) is DESCENDING in Spark (the index_sequence
            # footgun) — docs shorter than one span must yield NO grams
            F.expr(
                f"IF(size(tk) >= {SPAN_N}, "
                f"transform(sequence(1, size(tk) - {SPAN_N - 1}), "
                f"q -> struct(q - 1 AS p, "
                f"md5(array_join(slice(tk, q, {SPAN_N}), ' ')) AS gh)), "
                f"array())"
            )
        ).alias("g"),
    ).select("doc_id", "g.p", "g.gh")
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("gh")
    )
    cov = (
        grams.join(dup, "gh", "left_semi")
        .select("doc_id", F.explode(F.expr(f"sequence(p, p + {SPAN_N - 1})")).alias("pos"))
        .distinct()
    )
    tokpos = toks.select("doc_id", F.posexplode("tk").alias("pos", "tok"))
    kept = tokpos.join(cov, ["doc_id", "pos"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.expr(
            "array_join(transform(sort_array(collect_list(struct(pos, tok))), "
            "x -> x.tok), ' ')"
        ).alias("cleaned"),
    )
    return (
        toks.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.size("tk").cast("bigint").alias("n_tokens"),
            (F.size("tk").cast("bigint") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
            F.md5(F.coalesce("cleaned", F.lit(""))).alias("cleaned_hash"),
            F.length(F.coalesce("cleaned", F.lit(""))).cast("bigint").alias(
                "cleaned_len"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q228 — quantization retrieval fidelity (self-retrieval under compression)

QR_PROBE_MOD = 50   # probe subset: vec_id % 50 == 0
QR_LEVELS = 10      # floor(x * 10) / 10 — engine-identical quantization


@query(
    "q228_quant_retrieval",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    probes AS (
      SELECT vec_id AS query_id,
             list_transform(v, x -> floor(x * {QR_LEVELS}) / {QR_LEVELS}) AS qv
      FROM e WHERE vec_id % {QR_PROBE_MOD} = 0
    ),
    scored AS (
      SELECT p.query_id, c.vec_id AS nid,
             ROUND(list_cosine_similarity(p.qv, c.v), 6) AS cs
      FROM probes p JOIN e c ON true
    ),
    selfs AS (
      SELECT query_id, cs AS self_cos FROM scored WHERE nid = query_id
    )
    SELECT s.query_id, f.self_cos,
           CAST(1 + SUM(CASE WHEN s.nid <> s.query_id AND
                     (s.cs > f.self_cos OR
                      (s.cs = f.self_cos AND s.nid < s.query_id))
                THEN 1 ELSE 0 END) AS BIGINT) AS self_rank,
           CAST(1 + SUM(CASE WHEN s.nid <> s.query_id AND
                     (s.cs > f.self_cos OR
                      (s.cs = f.self_cos AND s.nid < s.query_id))
                THEN 1 ELSE 0 END) AS BIGINT) = 1 AS hit1,
           CAST(1 + SUM(CASE WHEN s.nid <> s.query_id AND
                     (s.cs > f.self_cos OR
                      (s.cs = f.self_cos AND s.nid < s.query_id))
                THEN 1 ELSE 0 END) AS BIGINT) <= 5 AS hit5
    FROM scored s JOIN selfs f USING (query_id)
    GROUP BY s.query_id, f.self_cos
    """,
)
def q228_quant_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantization retrieval fidelity: quantize each probe vector to
    {QR_LEVELS} uniform levels (floor arithmetic — bit-identical on any
    engine, no RNG, no round-half ambiguity) and ask whether the
    COMPRESSED vector still retrieves its own original from the
    uncompressed corpus — self-rank, hit@1, hit@5 per probe. This is
    the downstream-utility check that q83's reconstruction MSE cannot
    give: storage compression is only safe when rank-1 self-retrieval
    survives. The rank needs no window at all — it is 1 + the count of
    corpus vectors scoring strictly better (6-dp-rounded cosine, id
    tie-break), one conditional aggregate over a broadcast-probe scan,
    the q40 candidate economics."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0.0 as double), "
        "(acc, x) -> acc + x)"
    )
    probes = e.filter(F.col("vec_id") % QR_PROBE_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.expr(
            f"transform(v, x -> floor(x * {QR_LEVELS}) / {QR_LEVELS})"
        ).alias("qv"),
    ).withColumn("qnorm", F.expr("sqrt(" + dot.format(a="qv", b="qv") + ")"))
    corpus = e.withColumn(
        "vnorm", F.expr("sqrt(" + dot.format(a="v", b="v") + ")")
    )
    scored = corpus.join(F.broadcast(probes), F.lit(True)).select(
        "query_id",
        F.col("vec_id").alias("nid"),
        F.round(
            F.expr(dot.format(a="qv", b="v")) / (F.col("qnorm") * F.col("vnorm")), 6
        ).alias("cs"),
    )
    selfs = scored.filter(F.col("nid") == F.col("query_id")).select(
        "query_id", F.col("cs").alias("self_cos")
    )
    better = F.when(
        (F.col("nid") != F.col("query_id"))
        & (
            (F.col("cs") > F.col("self_cos"))
            | ((F.col("cs") == F.col("self_cos")) & (F.col("nid") < F.col("query_id")))
        ),
        1,
    ).otherwise(0)
    return (
        scored.join(F.broadcast(selfs), "query_id")
        .groupBy("query_id", "self_cos")
        .agg((F.lit(1) + F.sum(better)).cast("bigint").alias("self_rank"))
        .select(
            "query_id",
            "self_cos",
            "self_rank",
            (F.col("self_rank") == 1).alias("hit1"),
            (F.col("self_rank") <= 5).alias("hit5"),
        )
    )
