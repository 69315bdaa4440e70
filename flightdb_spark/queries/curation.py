"""Corpus-curation operators, batch 3 (q107-q114).

Rounds out the LLM-pipeline surface with the calibration / canonical-
selection / per-dimension tooling a production curation run needs
around the dedup+quality core (queries/textops.py, queries/training.py):

- q107 SimHash Hamming near-dup pairs: the pigeonhole band join over
  the q33 fingerprint — 4 bands of 4 bits guarantee every pair within
  Hamming distance 3 shares at least one band (Manku et al. 2007,
  "Detecting Near-Duplicates for Web Crawling").
- q108 per-source document caps: keep only the top-k docs per source by
  quality score — the domain-balancing cap applied after source-level
  gates (q63) and before mixing (q57).
- q109 MinHash Jaccard-estimate calibration: signature-estimated vs
  exact shingle Jaccard per LSH candidate pair — the measured error
  that justifies a chosen signature width.
- q110 canonical selection per dedup cluster: quality-argmax over the
  q51 connected components (q51 keeps min-doc_id; real pipelines keep
  the BEST member).
- q111 tokenizer fertility by language: whitespace-vs-subword token
  ratios — the stat that decides whether a tokenizer fits a corpus.
- q112 character-distribution entropy per doc: the gibberish /
  binary-noise filter.
- q113 per-dimension embedding stats: mean/variance/min/max per vector
  dimension — the whitening-prep pass in front of an ANN index.
- q114 EWMA over event streams: exponentially-weighted moving average
  (alpha = 1/2, 8-step frame) per user — trend features with weights
  that are exact powers of two.

Determinism contract (DETERMINISM.md): cross-row double aggregations
round per-row then accumulate in DECIMAL (order-free); remaining double
math is straight-line per-row IEEE arithmetic written with the same
expression structure in both engines. q114's weights are powers of two,
so every product is an exact scaling and the fixed left-to-right sum is
bit-identical across engines.

100 TB shapes: q107/q109 join on band buckets (never doc pairs) with a
structural bucket cap; q108 is a WindowGroupLimit partial top-k; q110
reuses the O(log diameter) connected-components loop; q111-q113 are
single-shuffle aggregates with map-side partials; q114 is one shuffle
on the partition key with a bounded lag frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators import textdedup
from ..operators.prefix import ecdf_counts
from ..tables import ensure_parallelism, load_table
from . import query
from .textops import _SHINGLES_DUCK, _simhash_sql


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# --- q107: SimHash Hamming near-dup pairs ------------------------------------------
# 32-bit fingerprint (the q33 template widened) split into 4 bands of
# 8 bits: two docs within Hamming distance 3 differ in <= 3 bit
# positions, so at least one of the 4 bands is untouched — the band
# equi-join has recall 1.0 for the <=3 threshold (pigeonhole). 256
# buckets per band keep the join selective as the corpus grows; at
# 100 TB the same shape runs with a 64-bit fingerprint and 16-bit
# bands. The bucket cap is the structural guard that keeps a
# degenerate bucket (boilerplate-dominated corpora) from going m².
HAMMING_MAX = 3
SIMHASH_BITS = 32
SIMHASH_BANDS = 4
BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
BUCKET_CAP = 64


def _hamming_pairs_sql(dialect: str) -> str:
    div = " div " if dialect == "spark" else " // "
    ham = (
        "bit_count(a.simhash ^ b.simhash)"
        if dialect == "spark"
        else "bit_count(xor(a.simhash, b.simhash))"
    )
    bands = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, simhash, {b} AS band,"
        f" (simhash{div}{(1 << BAND_BITS) ** b}) % {1 << BAND_BITS} AS bv FROM sims"
        for b in range(SIMHASH_BANDS)
    )
    return f"""
    WITH sims AS ({_simhash_sql(dialect, SIMHASH_BITS)}),
    bands AS (
      {bands}
    ),
    capped AS (
      SELECT * FROM (
        SELECT doc_id, simhash, band, bv,
               COUNT(*) OVER (PARTITION BY band, bv) AS m
        FROM bands
      ) WHERE m <= {BUCKET_CAP}
    ),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             {ham} AS hamming
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(hamming AS BIGINT) AS hamming
    FROM pairs WHERE hamming <= {HAMMING_MAX}
    """


@query("q107_simhash_hamming_pairs", oracle=_hamming_pairs_sql("duck"))
def q107_simhash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 via the
    pigeonhole band join: 4 bands of 8 bits over the 32-bit widened q33
    fingerprint — any pair at distance <=3 shares a band, so the
    equi-join on (band, band_value) finds all of them without an n²
    pair enumeration. The window-count bucket cap drops degenerate
    buckets before the self-join (same guard as
    textdedup.lsh_candidate_pairs). Verification is one integer
    bit_count(xor) per candidate.

    The Spark side explodes the 4 band values from ONE computation of
    the fingerprint aggregate (the SQL-CTE union form re-runs the
    aggregation per band — Catalyst has no common-subplan reuse across
    union branches); the DuckDB oracle keeps the CTE form, which DuckDB
    materializes once."""
    _docs(spark, sf_dir).createOrReplaceTempView("documents")
    sims = spark.sql(_simhash_sql("spark", SIMHASH_BITS))
    arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.expr(
                    f"(simhash div {(1 << BAND_BITS) ** b}) % {1 << BAND_BITS}"
                ).alias("bv"),
            )
            for b in range(SIMHASH_BANDS)
        ]
    )
    bands = sims.select("doc_id", "simhash", F.explode(arr).alias("_x")).select(
        "doc_id", "simhash", "_x.band", "_x.bv"
    )
    capped = (
        bands.withColumn(
            "m", F.count(F.lit(1)).over(W.partitionBy("band", "bv"))
        )
        .filter(F.col("m") <= BUCKET_CAP)
        .drop("m")
    )
    a = capped.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "band",
        "bv",
    )
    b = capped.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "band",
        "bv",
    )
    pairs = (
        a.join(b, ["band", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.expr("bit_count(sim_a ^ sim_b)").cast("bigint").alias("hamming"),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= HAMMING_MAX)


# --- q108: per-source document caps -------------------------------------------------
SOURCE_CAP = 5

_QUALITY_DUCK = """
      SELECT doc_id, source,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
               / len(string_split(text, ' ')) AS score
      FROM documents
"""


@query(
    "q108_source_caps",
    oracle=f"""
    WITH scored AS (
      {_QUALITY_DUCK}
    ),
    ranked AS (
      SELECT doc_id, source, score,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT source, doc_id, CAST(rank AS BIGINT) AS rank,
           ROUND(score, 6) AS score
    FROM ranked WHERE rank <= {SOURCE_CAP}
    """,
)
def q108_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document cap: keep the top-5 docs per source by
    stopword-density quality score (deterministic doc_id tiebreak).
    The domain-balancing step between source gating (q63) and corpus
    mixing (q57) — caps any one domain's contribution regardless of
    its raw size. Catalyst plans the rank<=k filter as WindowGroupLimit:
    each partition keeps its local top-5 BEFORE the shuffle on source,
    so the exchange carries at most 5 rows per (input partition,
    source), not the corpus."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    score = (
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))) * 1.0
        / F.size(toks)
    )
    w = W.partitionBy("source").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        docs.select("doc_id", "source", score.alias("score"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= SOURCE_CAP)
        .select("source", "doc_id", "rank", F.round("score", 6).alias("score"))
    )


# --- q109: MinHash Jaccard-estimate calibration -------------------------------------
# Wider signature than q30 (8 seeds, not 4) so the estimate has 1/8
# resolution; candidate pairs must share >=2 of the 8 single-seed bands.
EST_SEEDS = tuple(range(8))
MIN_SHARED = 2


def _est_oracle() -> str:
    base = textdedup.MINHASH_BASE_DUCK.format(sh="sh")
    mins = ", ".join(
        f"MIN(xor({base}, {textdedup.minhash_mask(s)})) AS minhash_{s}"
        for s in EST_SEEDS
    )
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {s} AS band, minhash_{s} AS h FROM sigs" for s in EST_SEEDS
    )
    matches = " + ".join(
        f"CASE WHEN a.minhash_{s} = b.minhash_{s} THEN 1 ELSE 0 END"
        for s in EST_SEEDS
    )
    n = len(EST_SEEDS)
    return f"""
    WITH shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    ),
    sigs AS (SELECT doc_id, {mins} FROM shingled GROUP BY doc_id),
    bands AS (
      {unions}
    ),
    cand AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
      GROUP BY 1, 2
      HAVING COUNT(DISTINCT a.band) >= {MIN_SHARED}
    ),
    est AS (
      SELECT c.doc_a, c.doc_b, ({matches}) * 1.0 / {n} AS est_jaccard
      FROM cand c
      JOIN sigs a ON a.doc_id = c.doc_a
      JOIN sigs b ON b.doc_id = c.doc_b
    ),
    sh_dist AS (SELECT DISTINCT doc_id, sh FROM shingled),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh_dist GROUP BY doc_id),
    inter AS (
      SELECT e.doc_a, e.doc_b, COUNT(s2.sh) AS ni
      FROM est e
      JOIN sh_dist s1 ON s1.doc_id = e.doc_a
      LEFT JOIN sh_dist s2 ON s2.doc_id = e.doc_b AND s2.sh = s1.sh
      GROUP BY e.doc_a, e.doc_b
    )
    SELECT e.doc_a, e.doc_b,
           ROUND(e.est_jaccard, 6) AS est_jaccard,
           ROUND(i.ni * 1.0 / (na.n + nb.n - i.ni), 6) AS exact_jaccard,
           ROUND(ABS(e.est_jaccard - i.ni * 1.0 / (na.n + nb.n - i.ni)), 6)
             AS abs_err
    FROM est e
    JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
    JOIN sizes na ON na.doc_id = e.doc_a
    JOIN sizes nb ON nb.doc_id = e.doc_b
    """


@query("q109_minhash_jaccard_est", oracle=_est_oracle())
def q109_minhash_jaccard_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash calibration: for every LSH candidate pair (>=2 of 8
    single-seed bands shared), the signature-estimated Jaccard (match
    fraction over 8 seeds) next to the exact shingle-set Jaccard and
    the absolute error — the measured evidence behind a signature-width
    choice. Candidates come from the band bucket join (never n²);
    the exact verification joins shingle sets only for the surviving
    candidates, so its cost is bounded by candidates x doc size."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    # ONE tokenize pass: checkpoint the distinct (doc, shingle) set and
    # build the signatures FROM it — MIN per seed is dedup-insensitive,
    # so the signature is bit-identical, and the exact-verification
    # joins (sh_dist referenced 3x: sizes, both intersection sides) no
    # longer re-run the corpus shingle explode per reference (P3
    # pattern, guide §2.4; before plan held 74 Exchanges).
    sh_dist = (
        shingled.select("doc_id", "sh").distinct().localCheckpoint(eager=True)
    )
    sigs = textdedup.minhash_signatures(sh_dist, seeds=EST_SEEDS)
    bands = textdedup.lsh_bands(sigs, seeds=EST_SEEDS)
    cand = (
        textdedup.lsh_candidate_pairs(bands)
        .filter(F.col("n_shared_bands") >= MIN_SHARED)
        .select("doc_a", "doc_b")
    )
    n = len(EST_SEEDS)
    matches = sum(
        F.when(F.col(f"a.minhash_{s}") == F.col(f"b.minhash_{s}"), 1).otherwise(0)
        for s in EST_SEEDS
    )
    est = (
        cand.join(sigs.alias("a"), F.col("doc_a") == F.col("a.doc_id"))
        .join(sigs.alias("b"), F.col("doc_b") == F.col("b.doc_id"))
        .select("doc_a", "doc_b", (matches * 1.0 / n).alias("est_jaccard"))
    )
    sizes = sh_dist.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = sh_dist.select(F.col("doc_id").alias("doc_a"), "sh")
    s2 = sh_dist.select(F.col("doc_id").alias("_b2"), F.col("sh").alias("sh_b"))
    inter = (
        est.select("doc_a", "doc_b")
        .join(s1, "doc_a")
        .join(
            s2,
            (F.col("doc_b") == F.col("_b2")) & (F.col("sh") == F.col("sh_b")),
            "left",
        )
        .drop("_b2")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("sh_b").alias("ni"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    exact = F.col("ni") * 1.0 / (F.col("na") + F.col("nb") - F.col("ni"))
    return (
        est.join(inter, ["doc_a", "doc_b"])
        .join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round("est_jaccard", 6).alias("est_jaccard"),
            F.round(exact, 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("est_jaccard") - exact), 6).alias("abs_err"),
        )
    )


# --- q110: canonical selection per dedup cluster ------------------------------------
def _keep_best_oracle() -> str:
    from .textops import _dedup_clusters_oracle

    cc = _dedup_clusters_oracle().strip()
    # reuse the whole q51 oracle as a subquery (it is a WITH RECURSIVE
    # ... SELECT, legal in a FROM clause in DuckDB)
    return f"""
    WITH comp AS (
      SELECT doc_id, cluster_id, n_members FROM ({cc})
    ),
    scored AS (
      {_QUALITY_DUCK}
    ),
    ranked AS (
      SELECT c.cluster_id, c.doc_id, c.n_members, s.score,
             ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                                ORDER BY s.score DESC, c.doc_id) AS rn
      FROM comp c JOIN scored s ON s.doc_id = c.doc_id
    )
    SELECT cluster_id, doc_id AS kept_doc,
           CAST(n_members AS BIGINT) AS n_members,
           ROUND(score, 6) AS kept_score
    FROM ranked WHERE rn = 1
    """


@query("q110_keep_best_per_cluster", oracle=_keep_best_oracle())
def q110_keep_best_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: within each q51 dedup cluster keep
    the highest-quality member (stopword-density score, doc_id
    tiebreak) instead of q51's min-doc_id convention — what a real
    pipeline ships to training. Components come from the tested
    O(log diameter) label-propagation loop; the argmax is one
    row_number window over (cluster, score)."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    sigs = textdedup.minhash_signatures(shingled, seeds=(0, 1, 2, 3))
    bands = textdedup.lsh_bands(sigs, seeds=(0, 1, 2, 3))
    pairs = textdedup.lsh_candidate_pairs(bands).select("doc_a", "doc_b")
    comp = textdedup.dedup_clusters(pairs)  # doc_id, cluster_id, n_members, ...
    toks = F.split(F.col("text"), " ")
    score = (
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))) * 1.0
        / F.size(toks)
    )
    scored = docs.select("doc_id", score.alias("score"))
    w = W.partitionBy("cluster_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        comp.select("doc_id", "cluster_id", "n_members")
        .join(scored, "doc_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("kept_doc"),
            F.col("n_members").cast("bigint").alias("n_members"),
            F.round("score", 6).alias("kept_score"),
        )
    )


# --- q111: tokenizer fertility by language ------------------------------------------
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "q111_tokenizer_fertility",
    oracle=f"""
    WITH feats AS (
      SELECT lang,
             len(string_split(text, ' ')) AS n_ws,
             len(regexp_extract_all(text, '{_BPE_RE}')) AS n_re,
             length(text) - (len(string_split(text, ' ')) - 1) AS n_chars_nospace
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_ws) AS BIGINT) AS n_ws_tokens,
           CAST(SUM(n_re) AS BIGINT) AS n_subword_tokens,
           ROUND(SUM(n_re) * 1.0 / SUM(n_ws), 6) AS fertility,
           ROUND(SUM(n_chars_nospace) * 1.0 / SUM(n_ws), 6) AS avg_word_len
    FROM feats GROUP BY lang
    """,
)
def q111_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-tokens-per-word under
    the BPE-ish regex tokenizer (q36's pattern) vs whitespace words,
    plus mean word length — the statistic that tells you whether a
    tokenizer will blow up sequence lengths on a language. Integer
    sums only (exact under any merge order); one shuffle on lang with
    map-side partials."""
    docs = _docs(spark, sf_dir)
    n_ws = F.size(F.split(F.col("text"), " "))
    n_re = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
    feats = docs.select(
        "lang",
        n_ws.alias("n_ws"),
        n_re.alias("n_re"),
        (F.length("text") - (n_ws - 1)).alias("n_chars_nospace"),
    )
    return feats.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").alias("n_ws_tokens"),
        F.sum("n_re").alias("n_subword_tokens"),
        F.round(F.sum("n_re") * 1.0 / F.sum("n_ws"), 6).alias("fertility"),
        F.round(F.sum("n_chars_nospace") * 1.0 / F.sum("n_ws"), 6).alias(
            "avg_word_len"
        ),
    )


# --- q112: character-distribution entropy -------------------------------------------
@query(
    "q112_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS ch FROM documents
    ),
    cnt AS (SELECT doc_id, ch, COUNT(*) AS c FROM chars GROUP BY doc_id, ch),
    tot AS (SELECT doc_id, SUM(c) AS n FROM cnt GROUP BY doc_id),
    terms AS (
      SELECT c.doc_id,
             ROUND((c.c * 1.0 / t.n) * (ln(c.c * 1.0 / t.n) / ln(2)), 12) AS term
      FROM cnt c JOIN tot t USING (doc_id)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_chars,
           ROUND(-CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 5) AS entropy_bits
    FROM terms GROUP BY doc_id
    """,
)
def q112_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution entropy in bits — the
    gibberish/binary-noise filter (uniform noise scores ~log2(alphabet),
    natural text much lower). Per-(doc, char) counts aggregate
    map-side; each -p*log2(p) term rounds to 12 dp (finer than the
    5-dp output by 7 decimals, so a one-ulp ln() flip in a term cannot
    reach the output's rounding boundary — DETERMINISM.md §5) and
    accumulates in DECIMAL, independent of merge order."""
    docs = _docs(spark, sf_dir)
    chars = docs.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.col("text"), F.lit("."), F.lit(0))).alias(
            "ch"
        ),
    )
    cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"))
    p = F.col("c") * 1.0 / F.col("n")
    terms = cnt.join(tot, "doc_id").select(
        "doc_id", F.round(p * (F.log(p) / F.log(F.lit(2.0))), 12).alias("term")
    )
    return terms.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_distinct_chars"),
        F.round(
            -F.sum(F.col("term").cast("decimal(38,12)")).cast("double"), 5
        ).alias("entropy_bits"),
    )


# --- q113: per-dimension embedding stats --------------------------------------------
@query(
    "q113_embedding_dim_stats",
    oracle="""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    dims AS (
      SELECT unnest(v) AS val, generate_subscripts(v, 1) - 1 AS dim FROM e
    ),
    acc AS (
      SELECT dim,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(val, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(val * val, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s2,
             MIN(val) AS mn, MAX(val) AS mx
      FROM dims GROUP BY dim
    )
    SELECT dim, CAST(n AS BIGINT) AS n_vecs,
           ROUND(s1 / n, 6) AS mean_val,
           ROUND(s2 / n - (s1 / n) * (s1 / n), 6) AS var_val,
           ROUND(mn, 6) AS min_val, ROUND(mx, 6) AS max_val
    FROM acc
    """,
)
def q113_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding statistics (mean / variance / min / max)
    — the whitening-prep and sanity pass in front of an ANN index
    (a dead or exploding dimension shows up here first). posexplode →
    one aggregate keyed by dim (embedding-width groups, so partial
    aggregation collapses nearly everything map-side). Sums accumulate
    per-row-rounded in DECIMAL; the variance is assembled from the two
    decimal sums with one fixed expression."""
    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        F.col("embedding").cast("array<double>").alias("v")
    )
    dims = e.select(F.posexplode("v").alias("dim", "val"))
    acc = dims.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("val"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("s1"),
        F.sum(F.round(F.col("val") * F.col("val"), 12).cast("decimal(38,12)"))
        .cast("double")
        .alias("s2"),
        F.min("val").alias("mn"),
        F.max("val").alias("mx"),
    )
    mean = F.col("s1") / F.col("n")
    return acc.select(
        "dim",
        F.col("n").cast("bigint").alias("n_vecs"),
        F.round(mean, 6).alias("mean_val"),
        F.round(F.col("s2") / F.col("n") - mean * mean, 6).alias("var_val"),
        F.round("mn", 6).alias("min_val"),
        F.round("mx", 6).alias("max_val"),
    )


# --- q114: EWMA over event streams --------------------------------------------------
# alpha = 1/2 with an 8-step frame: weights 1, 1/2, ... 1/128 are exact
# powers of two, so each product is an exact binary scaling and the
# fixed left-to-right sum evaluates bit-identically in both engines.
EWMA_STEPS = 8


def _ewma_sql() -> str:
    num = " + ".join(
        f"COALESCE(lag(value, {k}) OVER w, 0) * {0.5 ** k!r}"
        if k
        else "value * 1.0"
        for k in range(EWMA_STEPS)
    )
    den = " + ".join(
        f"CASE WHEN lag(value, {k}) OVER w IS NULL THEN 0 ELSE {0.5 ** k!r} END"
        if k
        else "1.0"
        for k in range(EWMA_STEPS)
    )
    return f"""
    SELECT user_id, event_id, ts,
           ROUND(({num}) / ({den}), 6) AS ewma
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """


@query("q114_ewma", oracle=_ewma_sql())
def q114_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of event values per user
    (alpha = 1/2, 8-step lag frame, renormalized over the weights
    actually present near sequence start). One shuffle on user_id; the
    8 lags share a single window sort. Identical SQL text runs on both
    engines — weights are powers of two, so no rounding ambiguity
    exists anywhere in the expression."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ewma_sql())


# --- q120: quality-curriculum decile bins ------------------------------------------
N_BINS = 10


@query(
    "q120_curriculum_bins",
    oracle=f"""
    WITH scored AS (
      {_QUALITY_DUCK}
    ),
    binned AS (
      SELECT doc_id, score,
             NTILE({N_BINS}) OVER (ORDER BY score, doc_id) AS bin
      FROM scored
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(MIN(score), 6) AS min_score,
           ROUND(MAX(score), 6) AS max_score,
           ROUND(CAST(SUM(CAST(ROUND(score, 9) AS DECIMAL(38,9))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score
    FROM binned GROUP BY bin
    """,
)
def q120_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-curriculum deciles: rank the corpus by quality score and
    cut into 10 exactly-equal bins with per-bin stats — the binning
    behind low-to-high-quality curriculum schedules. EXACT NTILE
    semantics with NO global-order window: distinct scores get exact
    cumulative counts from the two-pass bucketed prefix scan
    (operators/prefix.py:ecdf_counts), each row's total rank is that
    exclusive prefix plus a row_number over its own score group
    (bounded windows, partitioned by score), and the rank maps to its
    NTILE bucket by closed-form arithmetic (first n%k buckets take
    ceil(n/k) rows). Per-row score doubles are identical in both
    engines, so the (score, doc_id) order is total and engine-stable."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    score = (
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))) * 1.0
        / F.size(toks)
    )
    scored = docs.select("doc_id", score.alias("score"))
    cum = ecdf_counts(scored, "score", {"cnt": F.lit(True)}).select(
        F.col("score").alias("_s"),
        (F.col("cum_cnt") - F.col("cnt")).alias("_before"),
    )
    total = scored.agg(F.count(F.lit(1)).alias("_n"))
    rn = F.row_number().over(
        W.partitionBy("score").orderBy("doc_id")
    )
    ranked = (
        scored.withColumn("_rn", rn)
        .join(cum, F.col("score") == F.col("_s"))
        .crossJoin(F.broadcast(total))
        .withColumn("_r", F.col("_before") + F.col("_rn"))
    )
    # NTILE(k) over n rows: first n%k buckets hold n//k+1 rows each.
    # Integer floor-division via `div` (all operands non-negative longs).
    idiv = lambda a, b: (a - a % b) / b  # noqa: E731 — exact on longs
    big = idiv(F.col("_n"), F.lit(N_BINS)) + 1  # rows per early (large) bucket
    small = idiv(F.col("_n"), F.lit(N_BINS))  # rows per late bucket
    rem = F.col("_n") % N_BINS  # number of large buckets
    cutoff = rem * big  # ranks covered by large buckets
    binned = ranked.withColumn(
        "bin",
        F.when(
            F.col("_r") <= cutoff, idiv(F.col("_r") - 1, big) + 1
        ).otherwise(rem + idiv(F.col("_r") - cutoff - 1, small) + 1)
        .cast("int"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.min("score"), 6).alias("min_score"),
        F.round(F.max("score"), 6).alias("max_score"),
        F.round(
            F.sum(F.round(F.col("score"), 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_score"),
    )


# --- q121: source-level content overlap via union MinHash --------------------------
# MinHash of a UNION is the min of the member MinHashes, so a source's
# signature aggregates straight over its docs' shingles — no pairwise
# doc work at all. Pairwise source comparison is |sources|², which is
# tiny at any corpus size.
SRC_SEEDS = tuple(range(8))


def _source_overlap_oracle() -> str:
    base = textdedup.MINHASH_BASE_DUCK.format(sh="sh")
    mins = ", ".join(
        f"MIN(xor({base}, {textdedup.minhash_mask(s)})) AS mh_{s}"
        for s in SRC_SEEDS
    )
    matches = " + ".join(
        f"CASE WHEN a.mh_{s} = b.mh_{s} THEN 1 ELSE 0 END" for s in SRC_SEEDS
    )
    return f"""
    WITH shingled AS (
      SELECT source, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    ),
    sigs AS (SELECT source, {mins} FROM shingled GROUP BY source)
    SELECT a.source AS source_a, b.source AS source_b,
           ROUND(({matches}) * 1.0 / {len(SRC_SEEDS)}, 6) AS est_jaccard
    FROM sigs a JOIN sigs b ON a.source < b.source
    WHERE ({matches}) > 0
    """


@query("q121_source_overlap", oracle=_source_overlap_oracle())
def q121_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-level content overlap: one MinHash signature PER SOURCE
    (min over all its docs' shingle hashes — the union-MinHash
    property), pairwise signature agreement as estimated Jaccard —
    the mirrored-source / re-crawl detector. Corpus cost is one
    aggregate keyed by source; the pairwise stage is |sources|²,
    trivially bounded at any scale."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs, id_col="source").withColumnRenamed(
        "doc_id", "source"
    )
    hashed = shingled.withColumn(
        "_mh", F.expr(textdedup.MINHASH_BASE_SPARK.format(sh="sh"))
    )
    sigs = hashed.groupBy("source").agg(
        *[
            F.min(F.col("_mh").bitwiseXOR(F.lit(textdedup.minhash_mask(s)))).alias(
                f"mh_{s}"
            )
            for s in SRC_SEEDS
        ]
    )
    matches = sum(
        F.when(F.col(f"a.mh_{s}") == F.col(f"b.mh_{s}"), 1).otherwise(0)
        for s in SRC_SEEDS
    )
    a, b = sigs.alias("a"), sigs.alias("b")
    return (
        a.join(b, F.col("a.source") < F.col("b.source"))
        .select(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
            matches.alias("_m"),
        )
        .filter(F.col("_m") > 0)
        .select(
            "source_a",
            "source_b",
            F.round(F.col("_m") * 1.0 / len(SRC_SEEDS), 6).alias("est_jaccard"),
        )
    )


# --- q122: Zipf slope fit ----------------------------------------------------------
ZIPF_TOP = 200


@query(
    "q122_zipf_slope",
    oracle=f"""
    WITH toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    freq AS (SELECT lang, tok, COUNT(*) AS f FROM toks GROUP BY lang, tok),
    ranked AS (
      SELECT lang, f,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY f DESC, tok) AS r
      FROM freq
    ),
    pts AS (
      SELECT lang,
             ROUND(ln(CAST(r AS DOUBLE)), 9) AS x,
             ROUND(ln(CAST(f AS DOUBLE)), 9) AS y
      FROM ranked WHERE r <= {ZIPF_TOP}
    ),
    acc AS (
      SELECT lang, COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,9))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,9))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sxx
      FROM pts GROUP BY lang
    )
    SELECT lang, CAST(n AS BIGINT) AS n_points,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
    FROM acc
    """,
)
def q122_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law slope per language: least-squares fit of ln(freq) vs
    ln(rank) over the top-200 tokens — natural text sits near -1, and a
    drifting slope flags template spam or scrambled corpora. Token
    counting is the q54 shape (partial agg eats the explode); the
    regression runs on 200 points per lang with per-term rounding +
    DECIMAL sums, final slope assembled in one fixed expression."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("f"))
    w = W.partitionBy("lang").orderBy(F.col("f").desc(), F.col("tok"))
    pts = (
        freq.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= ZIPF_TOP)
        .select(
            "lang",
            F.round(F.log(F.col("r").cast("double")), 9).alias("x"),
            F.round(F.log(F.col("f").cast("double")), 9).alias("y"),
        )
    )
    dec = lambda c: F.sum(c.cast("decimal(38,9)")).cast("double")  # noqa: E731
    acc = pts.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("x")).alias("sx"),
        dec(F.col("y")).alias("sy"),
        dec(F.round(F.col("x") * F.col("y"), 9)).alias("sxy"),
        dec(F.round(F.col("x") * F.col("x"), 9)).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return acc.select(
        "lang",
        F.col("n").cast("bigint").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
    )
