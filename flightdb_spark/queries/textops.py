"""Text-analysis and deduplication operators over the ``documents`` table.

The LLM-data-pipeline extensions (BASELINE.json north star): exact
dedup, MinHash signatures + LSH candidate pairs, n-gram Jaccard
near-dup, SimHash, language scoring, quality scoring, token counting,
document fingerprinting.

Every hash is md5-derived (identical in Spark and DuckDB) so even
MinHash/LSH is oracle-checkable — no engine-specific hash functions
anywhere; MinHash folds one md5 per shingle to a 60-bit int and xor-
permutes it per seed (operators/textdedup.py).
At 100 TB these run as: shingle explode (flatMap, no shuffle) →
per-doc aggregate (one shuffle on doc_id) → band-bucket self-join
(shuffle on band hash, the LSH trick that avoids the O(n²) pair join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..operators import textdedup, textprep
from ..operators.prefix import bucketed_cumsum
from ..tables import ensure_parallelism, load_table
from . import query

# --- shared helpers -----------------------------------------------------------

# Word 3-gram shingles, identical construction both engines (1-based slice).
_SHINGLES_DUCK = (
    "list_transform(range(1, len(string_split(text, ' ')) - 1), "
    "i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))"
)
# Guard: Spark's sequence(1, 0) is DESCENDING [1, 0] (DuckDB's range(1, 0)
# is empty), so short docs need an explicit empty-array branch.
_SHINGLES_SPARK = (
    "CASE WHEN size(split(text, ' ')) < 3 THEN array() "
    "ELSE transform(sequence(1, size(split(text, ' ')) - 2), "
    "i -> concat_ws(' ', slice(split(text, ' '), i, 3))) END"
)

# Same shingle ladder over a pre-tokenized array column `_w`: inlining
# split() into the transform lambda re-tokenizes the doc once PER
# SHINGLE (Spark has no loop-invariant hoisting inside higher-order
# functions) — O(len²) characters per doc. Queries tokenize once into
# `_w` via _shingle_exploded and shingle over the array (guide §4.1).
_SHINGLES_W_SPARK = (
    "CASE WHEN size(_w) < 3 THEN array() "
    "ELSE transform(sequence(1, size(_w) - 2), "
    "i -> concat_ws(' ', slice(_w, i, 3))) END"
)


def _shingle_exploded(docs: DataFrame, *keep: str) -> DataFrame:
    """(keep..., sh) rows — one tokenize pass, then the shingle explode."""
    toks = docs.select(*keep, F.split("text", " ").alias("_w"))
    return toks.select(*keep, F.explode(F.expr(_SHINGLES_W_SPARK)).alias("sh"))

_MINHASH_SEEDS = [0, 1, 2, 3]

_NORMALIZE_DUCK = "trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'))"
_NORMALIZE_SPARK = "trim(regexp_replace(lower(text), '[^a-z0-9 ]', ' '))"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Shingling / regex scoring is per-row expensive: spread a
    # single-file local scan across cores (no-op on a real cluster).
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# --- exact dedup ---------------------------------------------------------------
@query(
    "q28_dedup_exact",
    oracle=f"""
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT md5(text)) AS n_distinct,
           COUNT(DISTINCT md5({_NORMALIZE_DUCK})) AS n_distinct_norm
    FROM documents GROUP BY source
    """,
)
def q28_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (raw + normalized). The 100 TB shape:
    groupBy(md5(text)) keeps one doc per hash — a single shuffle on the
    hash, no pairwise comparison."""
    docs = _docs(spark, sf_dir)
    norm = F.expr(_NORMALIZE_SPARK)
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_distinct"),
        F.countDistinct(F.md5(norm)).alias("n_distinct_norm"),
    )


@query(
    "q29_fingerprint",
    oracle=f"""
    SELECT doc_id,
           md5({_NORMALIZE_DUCK}) AS fingerprint,
           substr(md5({_NORMALIZE_DUCK}), 1, 2) AS bucket
    FROM documents
    """,
)
def q29_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: content hash of normalized text + a 256-way
    shard bucket (prefix byte) for partition-parallel dedup at scale."""
    docs = _docs(spark, sf_dir)
    fp = F.md5(F.expr(_NORMALIZE_SPARK))
    return docs.select(
        "doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 2).alias("bucket")
    )


# --- MinHash + LSH --------------------------------------------------------------
def _minhash_mins_duck() -> str:
    base = textdedup.MINHASH_BASE_DUCK.format(sh="sh")
    return ", ".join(
        f"MIN(xor({base}, {textdedup.minhash_mask(s)})) AS minhash_{s}"
        for s in _MINHASH_SEEDS
    )


def _minhash_oracle() -> str:
    mins = _minhash_mins_duck()
    return f"""
    WITH shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    )
    SELECT doc_id,
           {mins},
           COUNT(DISTINCT sh) AS n_shingles
    FROM shingled GROUP BY doc_id
    """


@query("q30_minhash_signatures", oracle=_minhash_oracle())
def q30_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures over word 3-gram shingles. One md5 per shingle
    folded to a 60-bit int, then a deterministic xor-mask permutation per
    seed stands in for the usual (a*x+b) mod p family — reproducible in
    any engine, one digest instead of one per seed, and bigint (not
    32-char string) agg buffers. Explode → groupBy(doc_id): one shuffle."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    return textdedup.minhash_signatures(
        shingled,
        seeds=tuple(_MINHASH_SEEDS),
        extra_aggs=(F.countDistinct("sh").alias("n_shingles"),),
    )


def _lsh_pairs_oracle() -> str:
    mins = _minhash_mins_duck()
    unions = "\n      UNION ALL\n".join(
        f"SELECT doc_id, {s} AS band, minhash_{s} AS h FROM sigs" for s in _MINHASH_SEEDS
    )
    return f"""
    WITH shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    ),
    sigs AS (
      SELECT doc_id, {mins} FROM shingled GROUP BY doc_id
    ),
    bands AS (
      {unions}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(DISTINCT a.band) AS n_shared_bands
    FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """


@query("q31_lsh_candidate_pairs", oracle=_lsh_pairs_oracle())
def q31_lsh_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding: docs sharing any MinHash band become candidate pairs.
    The self-join is on (band, hash) — at 100 TB the join key is the
    bucket, never the doc pair, so cost tracks collisions not n²."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    sigs = textdedup.minhash_signatures(shingled, seeds=tuple(_MINHASH_SEEDS))
    bands = textdedup.lsh_bands(sigs, seeds=tuple(_MINHASH_SEEDS))
    return textdedup.lsh_candidate_pairs(bands)


# --- n-gram Jaccard near-dup -----------------------------------------------------
@query(
    "q32_ngram_jaccard",
    oracle=f"""
    WITH shingled AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id),
    probes AS (SELECT doc_id, sh FROM shingled WHERE doc_id % 100 = 0),
    inter AS (
      SELECT p.doc_id AS doc_a, s.doc_id AS doc_b, COUNT(*) AS n_inter
      FROM probes p JOIN shingled s ON p.sh = s.sh AND p.doc_id <> s.doc_id
      GROUP BY p.doc_id, s.doc_id
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter), 6) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(i.n_inter AS DOUBLE) / (sa.n + sb.n - i.n_inter) >= 0.03
    """,
)
def q32_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity for probe docs vs the corpus: exact
    set-overlap near-dup detection. The join is shingle-keyed (inverted
    index), never a doc×doc cross join."""
    docs = _docs(spark, sf_dir)
    shingled = _shingle_exploded(docs, "doc_id").distinct()
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    probes = shingled.filter(F.col("doc_id") % 100 == 0).withColumnRenamed(
        "doc_id", "probe_id"
    )
    inter = (
        probes.join(
            shingled, (probes.sh == shingled.sh) & (F.col("probe_id") != F.col("doc_id"))
        )
        .groupBy(F.col("probe_id").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")
    sb = sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")
    jac = F.col("n_inter").cast("double") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.03)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# --- SimHash (shared SQL template, dialect-substituted) ---------------------------
def _simhash_sql(dialect: str, bits_n: int = 16) -> str:
    """``bits_n``-bit SimHash over token md5s. `dialect` ∈ {'spark',
    'duck'}. q33 uses the 16-bit form; q107's Hamming band join uses 32
    bits so its band buckets stay selective at corpus scale."""
    div = " div " if dialect == "spark" else " // "
    toks = (
        "SELECT doc_id, explode(split(text, ' ')) AS tok FROM documents"
        if dialect == "spark"
        else "SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents"
    )
    # hex → int for the first bits_n/4 hex chars of md5(tok)
    nhex = bits_n // 4
    hexpos = "(instr('0123456789abcdef', substr(h, {i}, 1)) - 1)"
    # place values cast to BIGINT: 16^7 * 15 overflows int32, and Spark
    # runs ANSI arithmetic (DuckDB promotes silently; the cast is a
    # no-op there)
    val = " + ".join(
        f"{hexpos.format(i=i + 1)} * CAST({16 ** (nhex - 1 - i)} AS BIGINT)"
        for i in range(nhex)
    )
    bit_sums = ",\n             ".join(
        f"SUM(((v{div}{1 << b}) % 2) * 2 - 1) AS s{b}" for b in range(bits_n)
    )
    bits = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(bits_n)
    )
    return f"""
    WITH toks AS ({toks}),
    hashed AS (SELECT doc_id, md5(tok) AS h FROM toks),
    vals AS (SELECT doc_id, {val} AS v FROM hashed),
    sums AS (SELECT doc_id, {bit_sums} FROM vals GROUP BY doc_id)
    SELECT doc_id, {bits} AS simhash FROM sums
    """


@query("q33_simhash", oracle=_simhash_sql("duck"))
def q33_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash: per-bit majority vote over token hashes. Near-dup
    docs differ in few bits; pairing is then a Hamming-ball bucket join.
    One explode + one groupBy — the same SQL runs on both engines."""
    _docs(spark, sf_dir).createOrReplaceTempView("documents")
    return spark.sql(_simhash_sql("spark"))


# --- language scoring --------------------------------------------------------------
_LANG_STOPWORDS = [
    ("en", "the"), ("en", "a"), ("en", "of"), ("en", "and"),
    ("de", "der"), ("de", "die"), ("de", "und"), ("de", "the"),
    ("fr", "le"), ("fr", "la"), ("fr", "et"), ("fr", "a"),
    ("es", "el"), ("es", "la"), ("es", "y"), ("es", "a"),
]
_LANG_VALUES = ", ".join(f"('{lg}', '{w}')" for lg, w in _LANG_STOPWORDS)


@query(
    "q34_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    stop(lang, w) AS (VALUES {_LANG_VALUES}),
    scores AS (
      SELECT t.doc_id, s.lang, COUNT(*) AS hits
      FROM toks t JOIN stop s ON t.tok = s.w
      GROUP BY t.doc_id, s.lang
    ),
    ranked AS (
      SELECT doc_id, lang, hits,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
      FROM scores
    )
    SELECT d.doc_id,
           COALESCE(r.lang, 'und') AS pred_lang,
           COALESCE(r.hits, 0) AS hits,
           d.lang AS label_lang
    FROM documents d LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
    """,
)
def q34_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by stopword-hit scoring (n-gram heuristic
    family): tokens × broadcast stopword dim, argmax with deterministic
    tie-break, 'und' when no stopword hits."""
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    stop = docs.sparkSession.createDataFrame(_LANG_STOPWORDS, ["lang", "w"])
    scores = (
        toks.join(F.broadcast(stop), toks.tok == stop.w)
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("lang").asc())
    best = scores.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        docs.select("doc_id", F.col("lang").alias("label_lang"))
        .join(best.select("doc_id", "lang", "hits"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            "label_lang",
        )
    )


# --- quality scoring ----------------------------------------------------------------
@query(
    "q35_quality_score",
    oracle="""
    WITH feats AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             length(text) - length(regexp_replace(text, '[^a-z0-9 ]', '', 'g')) AS n_punct,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
      FROM documents
    )
    SELECT doc_id, n_chars, n_tokens,
           ROUND(CAST(n_punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           ROUND(CAST(n_chars - n_tokens + 1 AS DOUBLE) / n_tokens, 6) AS avg_token_len
    FROM feats
    """,
)
def q35_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality features: length, punctuation ratio, stopword
    ratio, mean token length — the standard pre-training corpus filters,
    all JVM-side string expressions (no UDF)."""
    docs = _docs(spark, sf_dir)
    n_chars = F.length("text")
    toks = F.split(F.col("text"), " ")
    n_tokens = F.size(toks)
    n_punct = n_chars - F.length(F.regexp_replace("text", "[^a-z0-9 ]", ""))
    n_stop = F.size(
        F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_punct.cast("double") / n_chars, 6).alias("punct_ratio"),
        F.round(n_stop.cast("double") / n_tokens, 6).alias("stopword_ratio"),
        F.round((n_chars - n_tokens + 1).cast("double") / n_tokens, 6).alias("avg_token_len"),
    )


@query(
    "q36_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_ws_tokens,
           len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_re_tokens,
           len(list_distinct(string_split(text, ' '))) AS n_distinct_tokens
    FROM documents
    """,
)
def q36_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens, BPE-ish regex tokens
    (letter-runs / digit-runs / single symbols), distinct tokens."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)).alias(
            "n_re_tokens"
        ),
        F.size(F.array_distinct(F.split(F.col("text"), " "))).alias("n_distinct_tokens"),
    )


# --- dedup cluster resolution (connected components) -------------------------------
def _dedup_clusters_oracle() -> str:
    mins = _minhash_mins_duck()
    unions = "\n      UNION ALL\n".join(
        f"SELECT doc_id, {s} AS band, minhash_{s} AS h FROM sigs" for s in _MINHASH_SEEDS
    )
    return f"""
    WITH RECURSIVE shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    ),
    sigs AS (
      SELECT doc_id, {mins} FROM shingled GROUP BY doc_id
    ),
    bands AS (
      {unions}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    ),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b, doc_a FROM pairs
    ),
    reach(doc_id, label) AS (
      SELECT DISTINCT src, src FROM edges
      UNION
      SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.doc_id
    ),
    comp AS (
      SELECT doc_id, MIN(label) AS cluster_id FROM reach GROUP BY doc_id
    )
    SELECT doc_id, cluster_id,
           COUNT(*) OVER (PARTITION BY cluster_id) AS n_members,
           doc_id = cluster_id AS is_canonical
    FROM comp
    """


@query("q51_dedup_clusters", oracle=_dedup_clusters_oracle())
def q51_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup cluster resolution: connected components over the LSH
    candidate-pair edge set, canonical doc = min doc_id per component.
    The step a real pipeline runs after q31 — candidate pairs alone
    over-delete (A~B, B~C must keep ONE of {A,B,C}, not zero).

    Spark side is iterative min-label EDGE CONTRACTION (the
    large-star/small-star family, Kiveris et al., "Connected
    Components in MapReduce"): each round maps every live node to
    min(itself, neighbors), folds the mapping into the labels, and
    REWRITES the edge list through it — the graph shrinks
    geometrically and convergence is O(log diameter) (measured 7
    rounds vs 18 for jump-only propagation on this graph). Bounded
    aggregate + equi-joins per round, lineage truncated by
    localCheckpoint (at cluster scale use a reliable checkpoint dir);
    the only driver-side signal is edges.isEmpty() per round.
    Implementation: operators/textdedup.py."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    sigs = textdedup.minhash_signatures(shingled, seeds=tuple(_MINHASH_SEEDS))
    bands = textdedup.lsh_bands(sigs, seeds=tuple(_MINHASH_SEEDS))
    pairs = textdedup.lsh_candidate_pairs(bands)
    return textdedup.dedup_clusters(pairs)


# --- repetition stats (Gopher-style filters, word-level) ---------------------------
@query(
    "q52_repetition_stats",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM toks GROUP BY doc_id, tok),
    ta AS (
      SELECT doc_id, SUM(c) AS n_tokens, MAX(c) AS top_tok, COUNT(*) AS n_dist
      FROM tc GROUP BY doc_id
    ),
    bgs AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK.replace('- 1)', ')').replace('[i:i+2]', '[i:i+1]')}) AS bg
      FROM documents
    ),
    bc AS (SELECT doc_id, bg, COUNT(*) AS c FROM bgs GROUP BY doc_id, bg),
    ba AS (
      SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bg, COUNT(*) AS n_dist_bg
      FROM bc GROUP BY doc_id
    )
    SELECT ta.doc_id,
           ROUND(CAST(top_tok AS DOUBLE) / n_tokens, 6) AS top_token_frac,
           ROUND(1 - CAST(n_dist AS DOUBLE) / n_tokens, 6) AS dup_token_frac,
           ROUND(CAST(top_bg AS DOUBLE) / n_bigrams, 6) AS top_bigram_frac,
           ROUND(1 - CAST(n_dist_bg AS DOUBLE) / n_bigrams, 6) AS dup_bigram_frac
    FROM ta JOIN ba ON ta.doc_id = ba.doc_id
    """,
)
def q52_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition filters (the Gopher/MassiveText rules, word-level since
    this corpus has no newlines): top-token fraction, duplicate-token
    fraction, top-bigram fraction, duplicate-bigram fraction. Explode →
    two-level aggregate — partial (map-side) agg absorbs the explode
    fan-out, one shuffle per n-gram order on doc_id."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    ta = (
        toks.groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_tokens"),
            F.max("count").alias("top_tok"),
            F.count(F.lit(1)).alias("n_dist"),
        )
    )
    # tokenize once (split-in-lambda re-split the doc per bigram)
    bigram = (
        "CASE WHEN size(_w) < 2 THEN array() "
        "ELSE transform(sequence(1, size(_w) - 1), "
        "i -> concat_ws(' ', slice(_w, i, 2))) END"
    )
    bgs = docs.select("doc_id", F.split("text", " ").alias("_w")).select(
        "doc_id", F.explode(F.expr(bigram)).alias("bg")
    )
    ba = (
        bgs.groupBy("doc_id", "bg").count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("n_bigrams"),
            F.max("count").alias("top_bg"),
            F.count(F.lit(1)).alias("n_dist_bg"),
        )
    )
    return ta.join(ba, "doc_id").select(
        "doc_id",
        F.round(F.col("top_tok").cast("double") / F.col("n_tokens"), 6).alias("top_token_frac"),
        F.round(1 - F.col("n_dist").cast("double") / F.col("n_tokens"), 6).alias("dup_token_frac"),
        F.round(F.col("top_bg").cast("double") / F.col("n_bigrams"), 6).alias("top_bigram_frac"),
        F.round(1 - F.col("n_dist_bg").cast("double") / F.col("n_bigrams"), 6).alias("dup_bigram_frac"),
    )


# --- deterministic stratified sampling ---------------------------------------------
@query(
    "q53_stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, lang,
             ROW_NUMBER() OVER (PARTITION BY source, lang
                                ORDER BY md5(doc_id::VARCHAR), doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY source, lang) AS stratum_n
      FROM documents
    )
    SELECT doc_id, source, lang, rn AS sample_rank, stratum_n
    FROM ranked WHERE rn <= CEIL(0.1 * stratum_n)
    """,
)
def q53_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% stratified sample per (source, lang): rank by
    content-free hash of the key, keep the top decile of each stratum.
    Reproducible across engines and runs (no RNG), single window shuffle
    on the stratum key; at 100 TB skewed strata ride AQE skew-split."""
    docs = _docs(spark, sf_dir)
    w = W.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wn = W.partitionBy("source", "lang")
    return (
        docs.select("doc_id", "source", "lang")
        .withColumn("sample_rank", F.row_number().over(w))
        .withColumn("stratum_n", F.count(F.lit(1)).over(wn))
        .filter(F.col("sample_rank") <= F.ceil(0.1 * F.col("stratum_n")))
    )


# --- per-language vocabulary top-k --------------------------------------------------
@query(
    "q54_vocab_topk",
    oracle="""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    counts AS (SELECT lang, tok, COUNT(*) AS n FROM toks GROUP BY lang, tok),
    ranked AS (
      SELECT lang, tok, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, tok) AS rank
      FROM counts
    )
    SELECT lang, tok, n, rank FROM ranked WHERE rank <= 10
    """,
)
def q54_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-10 tokens per language. Explode → count
    (map-side partial agg eats the token fan-out) → per-lang top-k via
    WindowGroupLimit (partial top-k before the final shuffle)."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    counts = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tok"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
    )


# --- benchmark decontamination ------------------------------------------------------
@query(
    "q55_decontamination",
    oracle=f"""
    WITH bench AS (
      SELECT DISTINCT unnest({_SHINGLES_DUCK}) AS sh FROM documents WHERE doc_id < 5
    ),
    shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents WHERE doc_id >= 5
    ),
    per_doc AS (
      SELECT s.doc_id,
             COUNT(DISTINCT s.sh) AS n_shingles,
             COUNT(DISTINCT CASE WHEN b.sh IS NOT NULL THEN s.sh END) AS n_contaminated
      FROM shingled s LEFT JOIN bench b ON s.sh = b.sh
      GROUP BY s.doc_id
    )
    SELECT doc_id, n_shingles, n_contaminated,
           ROUND(CAST(n_contaminated AS DOUBLE) / n_shingles, 6) AS contamination_frac
    FROM per_doc WHERE n_contaminated > 0
    """,
)
def q55_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: fraction of each training doc's word
    3-grams that appear in a held-out benchmark set (here docs 0-4).
    The benchmark shingle set is tiny relative to the corpus → broadcast
    hash join against the exploded corpus, so the corpus never shuffles;
    per-doc aggregate is the single shuffle."""
    docs = _docs(spark, sf_dir)
    bench = (
        _shingle_exploded(docs.filter(F.col("doc_id") < 5), "doc_id")
        .select("sh")
        .distinct()
    )
    shingled = _shingle_exploded(docs.filter(F.col("doc_id") >= 5), "doc_id")
    joined = shingled.join(
        F.broadcast(bench.withColumn("hit", F.lit(1))), "sh", "left"
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("n_shingles"),
            F.countDistinct(F.when(F.col("hit").isNotNull(), F.col("sh"))).alias(
                "n_contaminated"
            ),
        )
        .filter(F.col("n_contaminated") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double") / F.col("n_shingles"), 6
            ).alias("contamination_frac"),
        )
    )


# --- sketch statistics (HLL / quantile digests) ------------------------------------
@query("q56_sketch_stats", oracle=None)  # sketch internals differ per engine
def q56_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based corpus statistics per language: HyperLogLog distinct
    content hashes (approx_count_distinct, rsd=2%) and a quantile digest
    of doc lengths (approx_percentile p50/p90). At 100 TB these are the
    only viable shapes — both sketches merge associatively, so partial
    aggregation happens map-side and the shuffle carries fixed-size
    sketch buffers, not values. Rows-only for the driver (engine sketch
    internals differ); tests pin accuracy against exact counts at small
    SF (test_sketch_stats_tolerance)."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.approx_count_distinct(F.md5("text"), rsd=0.02).alias("approx_distinct"),
            F.percentile_approx("n_chars", [0.5, 0.9], 10000).alias("len_p50_p90"),
        )
        .select(
            "lang",
            "n_docs",
            "approx_distinct",
            F.col("len_p50_p90")[0].alias("len_p50"),
            F.col("len_p50_p90")[1].alias("len_p90"),
        )
    )


# --- weighted source mixing --------------------------------------------------------
# Per-language sampling rates as 4-hex-digit thresholds on a content-free
# hash: keep doc iff substr(md5(doc_id), 1, 4) < threshold. Lexicographic
# compare of fixed-width lowercase hex is identical in any engine, so the
# mix is reproducible everywhere with zero RNG.
_MIX_RATES = [("en", "ffff", 1.0), ("fr", "8000", 0.5), ("de", "8000", 0.5),
              ("es", "4000", 0.25), ("zh", "4000", 0.25)]


def _mix_oracle() -> str:
    cases = " ".join(f"WHEN '{l}' THEN '{t}'" for l, t, _ in _MIX_RATES)
    rates = " ".join(f"WHEN '{l}' THEN {r}" for l, _, r in _MIX_RATES)
    return f"""
    SELECT doc_id, lang, source,
           CAST(CASE lang {rates} END AS DOUBLE) AS target_rate
    FROM documents
    WHERE substr(md5(doc_id::VARCHAR), 1, 4) < (CASE lang {cases} END)
      OR CASE lang {cases} END = 'ffff'
    """


@query("q57_weighted_mix", oracle=_mix_oracle())
def q57_weighted_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: down-sample each language to its target rate with a
    deterministic hash threshold (the way a 100 TB pre-training mix is
    actually drawn — reproducible, no RNG, no shuffle at all: the filter
    is a pure column predicate evaluated in the scan stage)."""
    docs = _docs(spark, sf_dir)
    thr = F.lit(None).cast("string")
    rate = F.lit(None).cast("double")
    for l, t, r in reversed(_MIX_RATES):
        thr = F.when(F.col("lang") == l, F.lit(t)).otherwise(thr)
        rate = F.when(F.col("lang") == l, F.lit(r)).otherwise(rate)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return (
        docs.withColumn("_thr", thr)
        .filter((h < F.col("_thr")) | (F.col("_thr") == "ffff"))
        .select("doc_id", "lang", "source", rate.alias("target_rate"))
    )


# --- sequence packing (concat-then-chunk) ------------------------------------------
PACK_BUDGET = 512  # tokens per training sequence


@query(
    "q59_sequence_packing",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ),
    cum AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS start_offset
      FROM toks
    )
    SELECT doc_id, n_tokens, start_offset,
           (start_offset // {PACK_BUDGET})::BIGINT AS bin_id,
           (start_offset % {PACK_BUDGET})::BIGINT AS bin_offset
    FROM cum
    """,
)
def q59_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing, concat-then-chunk semantics:
    docs are laid end-to-end in doc_id order and cut into
    {PACK_BUDGET}-token training sequences; each doc learns its global
    start offset, its bin, and its offset within the bin. The prefix
    sum runs on the distributed two-pass scan (operators/prefix.py:
    bucketed_cumsum) — NO global-order window anywhere: rows bucket by
    approx-percentile edges of doc_id, cumulative-sum within buckets in
    parallel, and a <=64-row offsets table broadcasts back. doc_id is a
    distinct order key, so the primitive's tie contract is trivially
    satisfied and per-row offsets are engine-stable."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    cum = bucketed_cumsum(toks, "doc_id", ["n_tokens"])
    return cum.select(
        "doc_id",
        "n_tokens",
        (F.col("cum_n_tokens") - F.col("n_tokens")).alias("start_offset"),
    ).select(
        "doc_id",
        "n_tokens",
        "start_offset",
        (F.col("start_offset") / PACK_BUDGET).cast("long").alias("bin_id"),
        (F.col("start_offset") % PACK_BUDGET).alias("bin_offset"),
    )


# --- overlapping token chunking -----------------------------------------------------
CHUNK = 64
STRIDE = 56  # CHUNK - 8 overlap


@query(
    "q60_token_chunking",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    chunks AS (
      SELECT doc_id,
             unnest(range(0, GREATEST((len(tk) - {CHUNK} + {STRIDE} - 1) // {STRIDE}, 0) + 1)) AS chunk_idx,
             len(tk) AS n_tokens
      FROM toks
    )
    SELECT doc_id, chunk_idx,
           chunk_idx * {STRIDE} AS tok_start,
           LEAST(chunk_idx * {STRIDE} + {CHUNK}, n_tokens) - chunk_idx * {STRIDE} AS n_chunk_tokens
    FROM chunks
    WHERE chunk_idx * {STRIDE} < n_tokens
    """,
)
def q60_token_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunking (the RAG/embedding prep op): windows
    of {CHUNK} tokens at stride {STRIDE} (8-token overlap), one row per
    chunk with its token span. Pure explode of a computed index range —
    no shuffle at all; chunk text extraction is a slice() on the same
    row when needed."""
    docs = _docs(spark, sf_dir)
    tk = F.split("text", " ")
    n = F.size(tk)
    n_chunks = F.greatest(
        F.floor((n - CHUNK + STRIDE - 1) / STRIDE).cast("long"), F.lit(0)
    ) + 1
    return (
        docs.select("doc_id", n.alias("n_tokens"), n_chunks.alias("nc"))
        .select(
            "doc_id",
            "n_tokens",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_idx"),
        )
        .filter(F.col("chunk_idx") * STRIDE < F.col("n_tokens"))
        .select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * STRIDE).alias("tok_start"),
            (
                F.least(F.col("chunk_idx") * F.lit(STRIDE) + CHUNK, F.col("n_tokens"))
                - F.col("chunk_idx") * STRIDE
            ).alias("n_chunk_tokens"),
        )
    )


# --- TF-IDF top terms ---------------------------------------------------------------
@query(
    "q61_tfidf_topterms",
    oracle="""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term
    ),
    dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rk
      FROM scored
    )
    SELECT doc_id, term, tfidf, rk FROM ranked WHERE rk <= 3
    """,
)
def q61_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. Term and doc frequencies are two
    aggregates over the exploded words; the corpus size joins in as a
    broadcast single-row frame (constant equi-key, never a cross join of
    data); ranking is a per-doc window. Ties rank on the ROUNDED score
    then term so both engines agree bit-for-bit. At 100 TB the df table
    is the only corpus-wide aggregate and it's tiny (vocab-sized)."""
    docs = _docs(spark, sf_dir)
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs")).withColumn("_k", F.lit(1))
    scored = (
        tf.join(dfreq, "term")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(n), "_k")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    )
    return scored.withColumn("rk", rk).filter(F.col("rk") <= 3)


# --- BM25 scoring -------------------------------------------------------------------
BM25_TERMS = ["table", "spark", "fast"]
BM25_K1 = 1.2
BM25_B = 0.75


def _bm25_oracle() -> str:
    terms = ", ".join(f"('{t}')" for t in BM25_TERMS)
    return f"""
    WITH q(term) AS (VALUES {terms}),
    words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl
    ),
    tf AS (
      SELECT w.doc_id, w.term, COUNT(*) AS tf
      FROM words w JOIN q USING (term) GROUP BY w.doc_id, w.term
    ),
    dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM words JOIN q USING (term)
      GROUP BY term
    ),
    scored AS (
      SELECT tf.doc_id,
             SUM(CAST(ROUND(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf * ({BM25_K1} + 1)
               / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / avgdl))
             , 9) AS DECIMAL(38,9))) AS score
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats
      GROUP BY tf.doc_id
    ),
    ranked AS (
      SELECT doc_id, ROUND(CAST(score AS DOUBLE), 6) AS bm25,
             ROW_NUMBER() OVER (ORDER BY ROUND(CAST(score AS DOUBLE), 6) DESC,
                                doc_id) AS rk
      FROM scored
    )
    SELECT doc_id, bm25, rk FROM ranked WHERE rk <= 20
    """


@query("q66_bm25_topk", oracle=_bm25_oracle())
def q66_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 docs for a fixed term set (k1=1.2, b=0.75). The query
    terms prefilter the exploded words with a broadcast semi-join shape
    (isin on a 3-term list), so tf/df aggregate only matching rows;
    corpus stats (N, avgdl) ride along as a broadcast single-row frame.
    The final global top-k is a window over the scored docs only —
    cheap, because only docs containing a query term survive."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    dl = docs.select("doc_id", F.size(toks).alias("dl"))
    stats = (
        dl.agg(
            F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
        ).withColumn("_k", F.lit(1))
    )
    words = docs.select(
        "doc_id", F.explode(toks).alias("term")
    ).filter(F.col("term").isin(BM25_TERMS))
    tf = words.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = words.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
    )
    denom = F.col("tf") + BM25_K1 * (
        1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(stats), "_k")
        .groupBy("doc_id")
        # per-term scores round then sum exactly in decimal — partial-agg
        # merge order cannot drift the hash
        .agg(
            F.sum(
                F.round(idf * F.col("tf") * (BM25_K1 + 1) / denom, 9).cast(
                    "decimal(38,9)"
                )
            ).alias("score")
        )
    )
    return (
        scored.select("doc_id", F.round(F.col("score").cast("double"), 6).alias("bm25"))
        .withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc("bm25"), F.asc("doc_id")))
        )
        .filter(F.col("rk") <= 20)
    )


# --- PII redaction ------------------------------------------------------------------
_EMAIL_RE = textprep.EMAIL_RE
_PHONE_RE = textprep.PHONE_RE


@query(
    "q62_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                    THEN text || ' contact user' || doc_id || '@example.com now'
                  WHEN doc_id % 7 = 0
                    THEN text || ' call 415-555-0' || (doc_id % 100) || ' today'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
    FROM aug
    WHERE doc_id % 10 = 0 OR doc_id % 7 = 0
    """,
)
def q62_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction (emails, phone numbers) as pure JVM
    regex column ops — count the hits, replace with typed placeholder
    tokens, fingerprint the redacted text. The synthetic corpus carries
    no PII, so the query plants deterministic addresses/numbers first
    (same injection in the oracle) — the operator under test is the
    regex scrub, which at 100 TB is a map-only stage, no shuffle."""
    docs = _docs(spark, sf_dir)
    aug = docs.select("doc_id", textprep.inject_pii().alias("text")).filter(
        (F.col("doc_id") % 10 == 0) | (F.col("doc_id") % 7 == 0)
    )
    redacted = textprep.redact_pii(F.col("text"))
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


# --- per-source quality gate --------------------------------------------------------
@query(
    "q63_source_quality_gate",
    oracle="""
    WITH feats AS (
      SELECT source,
             length(text) AS n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_filter(string_split(text, ' '),
                             t -> t IN ('the', 'a', 'of', 'and'))) AS n_stop
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 6) AS avg_chars,
           ROUND(CAST(SUM(CAST(ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 9)
                             AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS avg_stop_ratio,
           (ROUND(AVG(n_chars), 6) >= 280.0) AS keep
    FROM feats GROUP BY source
    """,
)
def q63_source_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level quality gate (the C4/RefinedWeb move of dropping
    whole low-quality sources): per-source doc counts + mean length +
    mean stopword ratio, with a keep/drop verdict on the aggregate.
    One shuffle on source; the verdict keys a later broadcast semi-join
    that filters the corpus without rescanning feature columns. The
    ratio average accumulates in DECIMAL so the result is independent
    of partial-agg merge order (double sums are not associative)."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    feats = docs.select(
        "source",
        F.length("text").alias("n_chars"),
        F.size(toks).alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))).alias(
            "n_stop"
        ),
    )
    agg = feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
        # decimal accumulation: partial-agg merge order varies run to run
        # (round-robin scan repartition), and double sums drift in the
        # low bits — per-row round -> exact decimal sum is order-free
        # and bit-identical in both engines.
        F.round(
            F.sum(
                F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 9).cast(
                    "decimal(38,9)"
                )
            ).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_stop_ratio"),
    )
    return agg.withColumn("keep", F.col("avg_chars") >= 280.0)


# --- deterministic train/val/test split ---------------------------------------------
@query(
    "q64_split_assignment",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT AS bucket
      FROM documents
    ),
    assigned AS (
      SELECT doc_id, lang,
             CASE WHEN bucket < 52429 THEN 'train'
                  WHEN bucket < 58982 THEN 'val'
                  ELSE 'test' END AS split
      FROM h
    )
    SELECT split, lang, COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM assigned GROUP BY split, lang
    """,
)
def q64_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~80/10/10 train/val/test assignment from a content
    hash of the doc key (16-bit bucket: <52429 train, <58982 val, rest
    test) — stable across runs, engines and reshuffles, the property
    random() splits lack. Map-only assignment; the summary is one
    shuffle on (split, lang)."""
    docs = _docs(spark, sf_dir)
    assigned = docs.select(
        "doc_id", "lang", textprep.split_col().alias("split")
    )
    return assigned.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


# --- per-language percentile length filter ------------------------------------------
@query(
    "q65_percentile_filter",
    oracle="""
    WITH pr AS (
      SELECT doc_id, lang, n_chars,
             PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars) AS pct
      FROM documents
    )
    SELECT lang,
           COUNT(*) AS n_kept,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM pr WHERE pct >= 0.05 AND pct <= 0.95
    GROUP BY lang
    """,
)
def q65_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-outlier trim: drop docs outside the [p5, p95]
    length band of their language (the Gopher/LLaMA doc-length filter,
    made exact). percent_rank assigns tied lengths the same rank, so
    the cut is deterministic. One shuffle on lang for the window; at
    100 TB swap percent_rank for approx_percentile thresholds computed
    per-language and broadcast back (q56 shows the sketch shape)."""
    docs = _docs(spark, sf_dir)
    pct = F.percent_rank().over(W.partitionBy("lang").orderBy("n_chars"))
    pr = docs.select("doc_id", "lang", "n_chars").withColumn("pct", pct)
    return (
        pr.filter((F.col("pct") >= 0.05) & (F.col("pct") <= 0.95))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


# --- out-of-vocabulary rate ---------------------------------------------------------
VOCAB_MIN_COUNT = 50  # corpus count threshold for "in vocabulary"


@query(
    "q68_oov_rate",
    oracle=f"""
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term FROM words GROUP BY term HAVING COUNT(*) >= {VOCAB_MIN_COUNT}
    ),
    flagged AS (
      SELECT w.doc_id,
             CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM words w LEFT JOIN vocab v ON w.term = v.term
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           SUM(oov)::BIGINT AS n_oov,
           ROUND(CAST(SUM(oov) AS DOUBLE) / COUNT(*), 6) AS oov_rate
    FROM flagged GROUP BY doc_id
    """,
)
def q68_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against a corpus-derived
    vocabulary (tokens seen >= VOCAB_MIN_COUNT times). The vocab
    aggregate is vocabulary-sized — broadcast it and the corpus-side
    membership test never shuffles; the per-doc aggregate is the one
    exchange. The standard tokenizer-coverage gate before committing a
    corpus to an expensive training run."""
    docs = _docs(spark, sf_dir)
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    vocab = (
        words.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= VOCAB_MIN_COUNT)
        .select("term")
        .withColumn("in_vocab", F.lit(1))
    )
    flagged = words.join(F.broadcast(vocab), "term", "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        F.round(
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("oov_rate"),
    )


# --- bigram LM quality score --------------------------------------------------------
@query(
    "q69_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tk FROM documents
    ),
    bigrams AS (
      SELECT doc_id,
             tk[i] AS w1, tk[i + 1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS t(i)
      WHERE len(tk) >= 2
    ),
    bg_counts AS (
      SELECT w1, w2, COUNT(*) AS c12 FROM bigrams GROUP BY w1, w2
    ),
    ug_counts AS (
      SELECT w1, COUNT(*) AS c1 FROM bigrams GROUP BY w1
    ),
    vocab AS (
      SELECT COUNT(DISTINCT w1) AS v FROM bigrams
    ),
    scored AS (
      SELECT b.doc_id,
             ROUND(ln((c12 + 1.0) / (c1 + v)), 7) AS logp
      FROM bigrams b
      JOIN bg_counts USING (w1, w2)
      JOIN ug_counts USING (w1)
      CROSS JOIN vocab
    )
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(CAST(logp AS DECIMAL(38,7))) AS DOUBLE) / COUNT(*), 5)
             AS avg_logp
    FROM scored GROUP BY doc_id
    """,
)
def q69_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram LM fluency score per doc (the KenLM-style
    perplexity filter, trained and applied in one query): add-one
    smoothed log P(w2|w1) averaged over each doc's bigrams. Counts come
    from two aggregates over the exploded bigrams; the bigram-count
    join keys on (w1, w2) — corpus-bounded, co-partitioned with the
    scoring explode — and the vocab scalar rides a 1-row broadcast.
    Per-bigram logp rounds then accumulates in DECIMAL so engine/merge
    order cannot drift the value. Shared implementation:
    operators/textprep.py (also the pipeline's fluency gate)."""
    return textprep.bigram_avg_logp(_docs(spark, sf_dir))


# --- frequency-ranked vocabulary building -------------------------------------------
@query(
    "q76_vocab_ids",
    oracle="""
    WITH counts AS (
      SELECT unnest(string_split(text, ' ')) AS token
      FROM documents
    ),
    vocab AS (
      SELECT token, COUNT(*) AS freq FROM counts GROUP BY token
    )
    SELECT token, freq,
           (ROW_NUMBER() OVER (ORDER BY freq DESC, token) - 1)::BIGINT AS token_id
    FROM vocab
    QUALIFY token_id < 100
    """,
)
def q76_vocab_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer vocabulary build: global frequency-ranked token ids
    (id 0 = most frequent; ties on the token string), top-100 emitted.
    The global window runs over the AGGREGATED vocab — vocabulary-sized
    (bounded by distinct tokens, not corpus rows), so the single
    partition it implies holds thousands of rows at any corpus scale.
    The corpus itself is one explode → one count aggregate."""
    docs = _docs(spark, sf_dir)
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    rk = F.row_number().over(W.orderBy(F.desc("freq"), F.asc("token"))) - 1
    return (
        vocab.withColumn("token_id", rk.cast("long"))
        .filter(F.col("token_id") < 100)
    )


# --- train/eval split leakage (cross-split near-dup) -------------------------------
def _split_leakage_oracle() -> str:
    mins = _minhash_mins_duck()
    unions = "\n      UNION ALL\n".join(
        f"SELECT doc_id, {s} AS band, minhash_{s} AS h FROM sigs"
        for s in _MINHASH_SEEDS
    )
    return f"""
    WITH shingled AS (
      SELECT DISTINCT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    ),
    sigs AS (
      SELECT doc_id, {mins} FROM shingled GROUP BY doc_id
    ),
    bands AS (
      {unions}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    ),
    sp AS (
      SELECT doc_id,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       < {textprep.TRAIN_CUT} THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       < {textprep.VAL_CUT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    oriented AS (
      SELECT CASE WHEN sa.split = 'train' THEN c.doc_a ELSE c.doc_b END AS train_doc,
             CASE WHEN sa.split = 'train' THEN c.doc_b ELSE c.doc_a END AS eval_doc,
             CASE WHEN sa.split = 'train' THEN sb.split ELSE sa.split END AS eval_split
      FROM cand c
      JOIN sp sa ON sa.doc_id = c.doc_a
      JOIN sp sb ON sb.doc_id = c.doc_b
      WHERE (sa.split = 'train') <> (sb.split = 'train')
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingled GROUP BY doc_id),
    inter AS (
      SELECT o.train_doc, o.eval_doc, o.eval_split, COUNT(*) AS inter
      FROM oriented o
      JOIN shingled s1 ON s1.doc_id = o.train_doc
      JOIN shingled s2 ON s2.doc_id = o.eval_doc AND s2.sh = s1.sh
      GROUP BY o.train_doc, o.eval_doc, o.eval_split
    )
    SELECT i.train_doc, i.eval_doc, i.eval_split,
           CAST(i.inter AS BIGINT) AS inter,
           ROUND(i.inter * 1.0 / (na.n + nb.n - i.inter), 6) AS jaccard
    FROM inter i
    JOIN sizes na ON na.doc_id = i.train_doc
    JOIN sizes nb ON nb.doc_id = i.eval_doc
    WHERE 2 * i.inter >= (na.n + nb.n - i.inter)
    """


@query("q99_split_leakage", oracle=_split_leakage_oracle())
def q99_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split-leakage detection: val/test docs that
    near-duplicate a train doc (shingle-set Jaccard >= 0.5, integer
    threshold compare) — the contamination every benchmark-honest
    pipeline must check AFTER splitting, because hash splits separate
    exact dup groups but not near-dups. Candidates come from the same
    LSH band join as q31 (bucket key, never n²), filtered to
    cross-split pairs, then verified through the full shingle sets
    (bounded by candidates x doc size). Composes three tested
    operators: the hash split (q64), LSH banding (q31), set-Jaccard
    verification (q91's shape)."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    # ONE corpus explode: the distinct (doc, shingle) table feeds the
    # signatures, both verification joins and the size aggregate (it
    # was re-derived from the raw explode per consumer — 4 corpus
    # passes). MinHash is a MIN aggregate, so computing it over the
    # DISTINCT shingle set is exact (the oracle's shingled CTE is
    # DISTINCT already); guide §2.4.
    sh_dist = shingled.select("doc_id", "sh").distinct().localCheckpoint()
    sigs = textdedup.minhash_signatures(sh_dist, seeds=tuple(_MINHASH_SEEDS))
    bands = textdedup.lsh_bands(sigs, seeds=tuple(_MINHASH_SEEDS))
    cand = textdedup.lsh_candidate_pairs(bands).select("doc_a", "doc_b")
    sp = docs.select("doc_id", textprep.split_col().alias("split"))
    sa = sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b"))
    oriented = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter((F.col("split_a") == "train") != (F.col("split_b") == "train"))
        .select(
            F.when(F.col("split_a") == "train", F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("train_doc"),
            F.when(F.col("split_a") == "train", F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("eval_doc"),
            F.when(F.col("split_a") == "train", F.col("split_b"))
            .otherwise(F.col("split_a"))
            .alias("eval_split"),
        )
    )
    sizes = sh_dist.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        oriented.join(
            sh_dist.select(F.col("doc_id").alias("train_doc"), "sh"), "train_doc"
        )
        .join(
            sh_dist.select(F.col("doc_id").alias("eval_doc"), "sh"),
            ["eval_doc", "sh"],
        )
        .groupBy("train_doc", "eval_doc", "eval_split")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(
            sizes.select(F.col("doc_id").alias("train_doc"), F.col("n").alias("na")),
            "train_doc",
        )
        .join(
            sizes.select(F.col("doc_id").alias("eval_doc"), F.col("n").alias("nb")),
            "eval_doc",
        )
        .withColumn("uni", F.col("na") + F.col("nb") - F.col("inter"))
        .filter(2 * F.col("inter") >= F.col("uni"))
    )
    return out.select(
        "train_doc",
        "eval_doc",
        "eval_split",
        "inter",
        F.round(F.col("inter") * F.lit(1.0) / F.col("uni"), 6).alias("jaccard"),
    )


# --- event transition matrix -------------------------------------------------------
@query(
    "q100_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
      FROM events
    ),
    c AS (
      SELECT event_type AS src, nxt AS dst, COUNT(*) AS n
      FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt
    )
    SELECT src, dst, CAST(n AS BIGINT) AS n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY src), 6) AS p
    FROM c
    """,
)
def q100_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: lead() within each user's timeline (one shuffle on
    user_id), pair counts, then row-normalized probabilities — the
    behavioral-analytics summary and the sequence-model sanity check.
    The normalizing window runs over the states² aggregate (25 rows),
    not the event stream."""
    ev = load_table(spark, sf_dir, "events")
    wseq = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(wseq).alias("nxt")
    ).filter(F.col("nxt").isNotNull())
    c = seq.groupBy(
        F.col("event_type").alias("src"), F.col("nxt").alias("dst")
    ).agg(F.count(F.lit(1)).alias("n"))
    wsrc = W.partitionBy("src")
    return c.select(
        "src",
        "dst",
        "n",
        F.round(F.col("n") * F.lit(1.0) / F.sum("n").over(wsrc), 6).alias("p"),
    )


# --- held-out LM scoring (split-shift check) ---------------------------------------
@query(
    "q102_heldout_lm",
    oracle=f"""
    WITH sp AS (
      SELECT doc_id, text,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       < {textprep.TRAIN_CUT} THEN 'train'
                  WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       < {textprep.VAL_CUT} THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ),
    toks AS (SELECT doc_id, split, string_split(text, ' ') AS tk FROM sp),
    bigrams AS (
      SELECT doc_id, split, tk[i] AS w1, tk[i + 1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS t(i)
      WHERE len(tk) >= 2
    ),
    train_bg AS (SELECT w1, w2 FROM bigrams WHERE split = 'train'),
    eval_bg AS (SELECT doc_id, split, w1, w2 FROM bigrams WHERE split <> 'train'),
    bg_counts AS (SELECT w1, w2, COUNT(*) AS c12 FROM train_bg GROUP BY w1, w2),
    ug_counts AS (SELECT w1, COUNT(*) AS c1 FROM train_bg GROUP BY w1),
    vocab AS (SELECT COUNT(DISTINCT w1) AS v FROM train_bg),
    scored AS (
      SELECT e.doc_id, e.split,
             ROUND(ln((COALESCE(c12, 0) + 1.0) / (COALESCE(c1, 0) + v)), 7) AS logp
      FROM eval_bg e
      LEFT JOIN bg_counts USING (w1, w2)
      LEFT JOIN ug_counts USING (w1)
      CROSS JOIN vocab
    )
    SELECT doc_id, split,
           COUNT(*) AS n_bigrams,
           ROUND(CAST(SUM(CAST(logp AS DECIMAL(38,7))) AS DOUBLE) / COUNT(*), 5)
             AS avg_logp
    FROM scored GROUP BY doc_id, split
    """,
)
def q102_heldout_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM scoring: train the add-one bigram LM on the train
    split only, score every val/test doc — the split-shift /
    generalization sanity check q69 (trained-on-self) cannot give.
    Unseen bigrams back off to the +1 smoothing mass via LEFT joins.
    Same shuffle shape as q69 plus the split predicate pushed into
    each side's scan. Shared implementation: operators/textprep.py
    bigram_avg_logp(train=...)."""
    docs = _docs(spark, sf_dir).withColumn("split", textprep.split_col())
    train = docs.filter(F.col("split") == "train")
    evald = docs.filter(F.col("split") != "train")
    scored = textprep.bigram_avg_logp(evald, train=train)
    return scored.join(
        evald.select("doc_id", "split"), "doc_id"
    ).select("doc_id", "split", "n_bigrams", "avg_logp")


# --- inverted index build ----------------------------------------------------------
@query(
    "q103_inverted_index",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT term, doc_id
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
    ),
    agg AS (
      SELECT term,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             array_to_string(list_sort(list(doc_id))[1:10], ',') AS posting_head
      FROM pairs GROUP BY term
    )
    SELECT term, n_docs, posting_head
    FROM agg ORDER BY n_docs DESC, term LIMIT 20
    """,
)
def q103_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build (the materialization step behind the q66
    BM25 scorer): per term, document frequency plus the head of the
    sorted posting list. collect_list is order-nondeterministic, so the
    posting normalizes through sort_array before slicing — same list on
    any partitioning (DETERMINISM.md rule 8). One shuffle on the term;
    at 100 TB postings shard by (term, doc_id range) and this exact
    aggregate emits each shard's segment."""
    docs = _docs(spark, sf_dir)
    pairs = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).distinct()
    agg = pairs.groupBy("term").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.concat_ws(
            ",",
            F.slice(F.sort_array(F.collect_list("doc_id")), 1, 10).cast(
                "array<string>"
            ),
        ).alias("posting_head"),
    )
    return agg.orderBy(F.desc("n_docs"), F.asc("term")).limit(20)
