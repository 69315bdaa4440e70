"""Text-generation-metrics batch 81 (q471-q475) — the surface-overlap
metrics every generation/translation eval harness computes, beside
q395 pass@k and q396 LC-winrate. Hypothesis texts are DETERMINISTIC
perturbations of each document (substitute every 5th token with a
hash-free positional token, drop every 11th) so the metrics exercise
real mismatch/clipping/brevity paths with bit-reproducible scores:

- q471 BLEU components: corpus-level clipped n-gram precisions
  p1..p4 (Papineni et al. 2002), hypothesis/reference lengths, the
  log brevity penalty, and the geometric mean WITHOUT the exp (the
  geo-mean is sqrt(sqrt(p1*p2*p3*p4)) — IEEE-exact; BP is reported
  in log space min(0, 1 - r/c), an exact rational, because a runtime
  exp() is the one non-portable op in BLEU, rule 5);
- q472 ROUGE-n: mean per-doc ROUGE-1/ROUGE-2 recall (Lin 2004);
- q473 chrF2: corpus character-3-gram precision/recall and the
  beta=2 F-score (Popovic 2015);
- q474 edit distance: per-doc levenshtein(hyp, ref) on 200-char
  prefixes — both engines ship the same C levenshtein — normalized
  histogram + corpus mean;
- q475 distinct-n: per-source distinct-1/distinct-2 diversity ratios
  (Li et al. 2016) of the raw corpus.

Determinism: perturbations are positional (no RNG, and even no hash
— pure index arithmetic, with the +1 offset folded into the DuckDB
lambdas whose indexes are 1-based while Spark's are 0-based); every
precision/recall is a ratio of exact integers; per-doc terms round
into DECIMAL sums (rule 1).

100 TB shapes: everything is explode -> partial-agg -> one keyed
shuffle (the q52 economics); clipping joins are co-partitioned on
(doc_id, gram); no metric ever joins doc x doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

SUB_EVERY = 5
DROP_EVERY = 11
EDIT_PREFIX = 200
BLEU_MAX_N = 4


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _toks(dialect: str) -> str:
    return "string_split(text, ' ')" if dialect == "duck" else "split(text, ' ')"


def _hyp(dialect: str) -> str:
    """Hypothesis token list: substitute every SUB_EVERY-th token with a
    positional marker, then drop every DROP_EVERY-th. DuckDB lambda
    indexes are 1-based, Spark's 0-based — the offset is folded in so
    both produce the same list."""
    t = _toks(dialect)
    if dialect == "duck":
        sub = (
            f"list_transform({t}, (x, i) -> CASE WHEN (i - 1) % {SUB_EVERY} = 0 "
            f"THEN 'sub' || CAST((i - 1) % 3 AS STRING) ELSE x END)"
        )
        return f"list_filter({sub}, (x, i) -> (i - 1) % {DROP_EVERY} != 0)"
    sub = (
        f"transform({t}, (x, i) -> CASE WHEN i % {SUB_EVERY} = 0 "
        f"THEN 'sub' || CAST(i % 3 AS STRING) ELSE x END)"
    )
    return f"filter({sub}, (x, i) -> i % {DROP_EVERY} != 0)"


def _ngrams(dialect: str, list_expr: str, n: int) -> str:
    """Word n-grams of a token-list expression as space-joined strings."""
    if dialect == "duck":
        return (
            f"list_transform(range(1, len({list_expr}) - {n - 2}), "
            f"i -> array_to_string(({list_expr})[i:i+{n - 1}], ' '))"
        )
    return (
        f"CASE WHEN size({list_expr}) < {n} THEN array() "
        f"ELSE transform(sequence(1, size({list_expr}) - {n - 1}), "
        f"i -> concat_ws(' ', slice({list_expr}, i, {n}))) END"
    )


def _char_ngrams(dialect: str, str_expr: str, n: int) -> str:
    if dialect == "duck":
        return (
            f"list_transform(range(1, length({str_expr}) - {n - 2}), "
            f"i -> substr({str_expr}, i, {n}))"
        )
    return (
        f"CASE WHEN length({str_expr}) < {n} THEN array() "
        f"ELSE transform(sequence(1, length({str_expr}) - {n - 1}), "
        f"i -> substring({str_expr}, i, {n})) END"
    )


def _unnest(dialect: str, expr: str, alias: str) -> str:
    if dialect == "duck":
        return f"unnest({expr}) AS {alias}"
    return f"explode({expr}) AS {alias}"


def _join_str(dialect: str, list_expr: str) -> str:
    if dialect == "duck":
        return f"array_to_string({list_expr}, ' ')"
    return f"concat_ws(' ', {list_expr})"


# ---------------------------------------------------------------------------
# q471 — BLEU components


def _bleu_sql(dialect: str) -> str:
    per_n = []
    for n in range(1, BLEU_MAX_N + 1):
        per_n.append(f"""
    hg{n} AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS hc
      FROM (SELECT doc_id, {_unnest(dialect, _ngrams(dialect, _hyp(dialect), n), "g")}
            FROM documents) t
      GROUP BY doc_id, g
    ),
    rg{n} AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS rc
      FROM (SELECT doc_id, {_unnest(dialect, _ngrams(dialect, _toks(dialect), n), "g")}
            FROM documents) t
      GROUP BY doc_id, g
    ),
    p{n} AS (
      SELECT CAST(SUM(LEAST(h.hc, COALESCE(r.rc, 0))) AS BIGINT) AS clipped,
             CAST(SUM(h.hc) AS BIGINT) AS total
      FROM hg{n} h LEFT JOIN rg{n} r ON r.doc_id = h.doc_id AND r.g = h.g
    )""")
    lens_h = (
        f"len({_hyp(dialect)})" if dialect == "duck" else f"size({_hyp(dialect)})"
    )
    lens_r = (
        f"len({_toks(dialect)})" if dialect == "duck" else f"size({_toks(dialect)})"
    )
    return f"""
    WITH {",".join(per_n)},
    lens AS (
      SELECT CAST(SUM({lens_h}) AS BIGINT) AS c,
             CAST(SUM({lens_r}) AS BIGINT) AS r
      FROM documents
    )
    SELECT ROUND(CAST(p1.clipped AS DOUBLE) / p1.total, 6) AS p1,
           ROUND(CAST(p2.clipped AS DOUBLE) / p2.total, 6) AS p2,
           ROUND(CAST(p3.clipped AS DOUBLE) / p3.total, 6) AS p3,
           ROUND(CAST(p4.clipped AS DOUBLE) / p4.total, 6) AS p4,
           lens.c AS hyp_len, lens.r AS ref_len,
           ROUND(LEAST(CAST(0.0 AS DOUBLE),
                 CAST(1.0 AS DOUBLE) - CAST(lens.r AS DOUBLE) / lens.c), 6)
             AS bp_log,
           ROUND(SQRT(SQRT(
             (CAST(p1.clipped AS DOUBLE) / p1.total)
             * (CAST(p2.clipped AS DOUBLE) / p2.total)
             * (CAST(p3.clipped AS DOUBLE) / p3.total)
             * (CAST(p4.clipped AS DOUBLE) / p4.total))), 6) AS bleu_geo_mean
    FROM p1 CROSS JOIN p2 CROSS JOIN p3 CROSS JOIN p4 CROSS JOIN lens
    """


# --- Spark-side staging for q471 (oracle keeps the single statement) --------
#
# The per-n hg/rg CTE pairs each re-tokenized (and re-perturbed) the
# corpus — 8 tokenize passes + 4 clipping joins + the lens scan (60
# Exchanges, 9 documents scans; noop 8.9 s). The q473 pattern: ONE
# corpus pass tokenizes hyp/ref once per row, explodes all eight gram
# streams as (n, g, h, r) structs, aggregates to the (doc, n, g)
# grain, and reduces to the 4-row (n, clipped, total) table —
# clipped = SUM(LEAST(hc, rc)) equals the LEFT-JOIN form exactly
# (ref-only grams contribute LEAST(0, rc) = 0, hyp-only LEAST(hc, 0)
# = 0 = the COALESCE'd join).

_PN_VIEW = "texteval_bleu_pn_mv"


def _bleu_pn_view(spark: SparkSession, sf_dir: str) -> None:
    _views(spark, sf_dir)
    arrs = []
    for n in range(1, BLEU_MAX_N + 1):
        arrs.append(
            f"transform({_ngrams('spark', 'ht', n)}, "
            f"g -> struct({n} AS n, g AS g, 1 AS h, 0 AS r))"
        )
        arrs.append(
            f"transform({_ngrams('spark', 'rt', n)}, "
            f"g -> struct({n} AS n, g AS g, 0 AS h, 1 AS r))"
        )
    df = spark.sql(
        f"""
    WITH toks AS (
      SELECT doc_id, {_hyp('spark')} AS ht, {_toks('spark')} AS rt
      FROM documents
    ),
    ex AS (
      SELECT doc_id, x.n AS n, x.g AS g, x.h AS h, x.r AS r
      FROM toks LATERAL VIEW explode(flatten(array({', '.join(arrs)}))) t AS x
    ),
    grams AS (
      SELECT doc_id, n, g,
             CAST(SUM(h) AS BIGINT) AS hc, CAST(SUM(r) AS BIGINT) AS rc
      FROM ex GROUP BY doc_id, n, g
    )
    SELECT n, CAST(SUM(LEAST(hc, rc)) AS BIGINT) AS clipped,
           CAST(SUM(hc) AS BIGINT) AS total
    FROM grams GROUP BY n
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_PN_VIEW)


def _bleu_mv_sql() -> str:
    per_n = ",\n    ".join(
        f"p{n} AS (SELECT clipped, total FROM {_PN_VIEW} WHERE n = {n})"
        for n in range(1, BLEU_MAX_N + 1)
    )
    lens_h = f"size({_hyp('spark')})"
    lens_r = f"size({_toks('spark')})"
    return f"""
    WITH {per_n},
    lens AS (
      SELECT CAST(SUM({lens_h}) AS BIGINT) AS c,
             CAST(SUM({lens_r}) AS BIGINT) AS r
      FROM documents
    )
    SELECT ROUND(CAST(p1.clipped AS DOUBLE) / p1.total, 6) AS p1,
           ROUND(CAST(p2.clipped AS DOUBLE) / p2.total, 6) AS p2,
           ROUND(CAST(p3.clipped AS DOUBLE) / p3.total, 6) AS p3,
           ROUND(CAST(p4.clipped AS DOUBLE) / p4.total, 6) AS p4,
           lens.c AS hyp_len, lens.r AS ref_len,
           ROUND(LEAST(CAST(0.0 AS DOUBLE),
                 CAST(1.0 AS DOUBLE) - CAST(lens.r AS DOUBLE) / lens.c), 6)
             AS bp_log,
           ROUND(SQRT(SQRT(
             (CAST(p1.clipped AS DOUBLE) / p1.total)
             * (CAST(p2.clipped AS DOUBLE) / p2.total)
             * (CAST(p3.clipped AS DOUBLE) / p3.total)
             * (CAST(p4.clipped AS DOUBLE) / p4.total))), 6) AS bleu_geo_mean
    FROM p1 CROSS JOIN p2 CROSS JOIN p3 CROSS JOIN p4 CROSS JOIN lens
    """


@query("q471_bleu_components", oracle=_bleu_sql("duck"))
def q471_bleu_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus BLEU against the deterministic perturbation: clipped
    n-gram precisions p1..p4 (modified precision — each hypothesis
    n-gram credits at most its reference count), corpus length ratio,
    log brevity penalty min(0, 1-r/c), and the 4-gram geometric mean
    via nested SQRT (IEEE-exact; BLEU = geo_mean * exp(bp_log) is one
    exp away, left to the caller because runtime exp is the one
    non-portable op, rule 5). Each n rides one (doc, gram) partial
    agg + a co-partitioned clipping join — the q52 explode economics,
    never doc x doc. Spark side stages the 4-row (n, clipped, total)
    table from ONE corpus pass (_bleu_pn_view); the oracle keeps the
    per-n CTE chain."""
    _bleu_pn_view(spark, sf_dir)
    return spark.sql(_bleu_mv_sql())


# ---------------------------------------------------------------------------
# q472 — ROUGE-n recall


def _rouge_sql(dialect: str) -> str:
    per_n = []
    for n in (1, 2):
        per_n.append(f"""
    hg{n} AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS hc
      FROM (SELECT doc_id, {_unnest(dialect, _ngrams(dialect, _hyp(dialect), n), "g")}
            FROM documents) t
      GROUP BY doc_id, g
    ),
    rg{n} AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS rc
      FROM (SELECT doc_id, {_unnest(dialect, _ngrams(dialect, _toks(dialect), n), "g")}
            FROM documents) t
      GROUP BY doc_id, g
    ),
    d{n} AS (
      SELECT r.doc_id,
             CAST(SUM(LEAST(COALESCE(h.hc, 0), r.rc)) AS BIGINT) AS ov,
             CAST(SUM(r.rc) AS BIGINT) AS rtot
      FROM rg{n} r LEFT JOIN hg{n} h ON h.doc_id = r.doc_id AND h.g = r.g
      GROUP BY r.doc_id
    )""")
    return f"""
    WITH {",".join(per_n)}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(CAST(d1.ov AS DOUBLE) / d1.rtot, 8)
                 AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*), 6) AS rouge1_recall,
           ROUND(CAST(SUM(CAST(ROUND(CAST(d2.ov AS DOUBLE) / d2.rtot, 8)
                 AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*), 6) AS rouge2_recall
    FROM d1 JOIN d2 ON d2.doc_id = d1.doc_id
    """


# q472 staging (q471's pattern): ONE corpus pass tokenizes hyp/ref
# once per row, explodes both gram streams for n in {1,2}, and reduces
# to the per-doc (n, ov, rtot) table. HAVING SUM(rc) > 0 reproduces
# the original row set exactly (a doc enters d{n} iff it has reference
# n-grams); hyp-only grams contribute LEAST(hc, 0) = 0 to ov, matching
# the LEFT JOIN's COALESCE.

_ROUGE_VIEW = "texteval_rouge_mv"


def _rouge_d_view(spark: SparkSession, sf_dir: str) -> None:
    _views(spark, sf_dir)
    arrs = []
    for n in (1, 2):
        arrs.append(
            f"transform({_ngrams('spark', 'ht', n)}, "
            f"g -> struct({n} AS n, g AS g, 1 AS h, 0 AS r))"
        )
        arrs.append(
            f"transform({_ngrams('spark', 'rt', n)}, "
            f"g -> struct({n} AS n, g AS g, 0 AS h, 1 AS r))"
        )
    df = spark.sql(
        f"""
    WITH toks AS (
      SELECT doc_id, {_hyp('spark')} AS ht, {_toks('spark')} AS rt
      FROM documents
    ),
    ex AS (
      SELECT doc_id, x.n AS n, x.g AS g, x.h AS h, x.r AS r
      FROM toks LATERAL VIEW explode(flatten(array({', '.join(arrs)}))) t AS x
    ),
    grams AS (
      SELECT doc_id, n, g,
             CAST(SUM(h) AS BIGINT) AS hc, CAST(SUM(r) AS BIGINT) AS rc
      FROM ex GROUP BY doc_id, n, g
    )
    SELECT doc_id, n,
           CAST(SUM(LEAST(hc, rc)) AS BIGINT) AS ov,
           CAST(SUM(rc) AS BIGINT) AS rtot
    FROM grams GROUP BY doc_id, n
    HAVING SUM(rc) > 0
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_ROUGE_VIEW)


def _rouge_mv_sql() -> str:
    per_n = ",\n    ".join(
        f"d{n} AS (SELECT doc_id, ov, rtot FROM {_ROUGE_VIEW} WHERE n = {n})"
        for n in (1, 2)
    )
    return f"""
    WITH {per_n}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(ROUND(CAST(d1.ov AS DOUBLE) / d1.rtot, 8)
                 AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*), 6) AS rouge1_recall,
           ROUND(CAST(SUM(CAST(ROUND(CAST(d2.ov AS DOUBLE) / d2.rtot, 8)
                 AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*), 6) AS rouge2_recall
    FROM d1 JOIN d2 ON d2.doc_id = d1.doc_id
    """


@query("q472_rouge_n", oracle=_rouge_sql("duck"))
def q472_rouge_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean per-document ROUGE-1 and ROUGE-2 recall of the perturbed
    hypothesis against its reference: clipped overlap / reference
    n-gram count, per doc, 8-dp rounded into DECIMAL corpus sums.
    Same co-partitioned (doc, gram) join shape as q471 — reference-
    side grouped, so empty-overlap docs still contribute 0 recall.
    Spark side stages the per-doc (n, ov, rtot) table from ONE corpus
    pass (_rouge_d_view); the oracle keeps the per-n CTE chain."""
    _rouge_d_view(spark, sf_dir)
    return spark.sql(_rouge_mv_sql())


# ---------------------------------------------------------------------------
# q473 — chrF2


def _chrf_sql(dialect: str) -> str:
    hyp_str = _join_str(dialect, _hyp(dialect))
    return f"""
    WITH hg AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS hc
      FROM (SELECT doc_id,
                   {_unnest(dialect, _char_ngrams(dialect, hyp_str, 3), "g")}
            FROM documents) t
      GROUP BY doc_id, g
    ),
    rg AS (
      SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS rc
      FROM (SELECT doc_id,
                   {_unnest(dialect, _char_ngrams(dialect, "text", 3), "g")}
            FROM documents) t
      GROUP BY doc_id, g
    ),
    j AS (
      SELECT COALESCE(h.doc_id, r.doc_id) AS doc_id,
             COALESCE(h.hc, 0) AS hc, COALESCE(r.rc, 0) AS rc
      FROM hg h FULL OUTER JOIN rg r
        ON r.doc_id = h.doc_id AND r.g = h.g
    ),
    tot AS (
      SELECT CAST(SUM(LEAST(hc, rc)) AS BIGINT) AS ov,
             CAST(SUM(hc) AS BIGINT) AS htot,
             CAST(SUM(rc) AS BIGINT) AS rtot
      FROM j
    )
    SELECT ROUND(CAST(ov AS DOUBLE) / htot, 6) AS chr_precision,
           ROUND(CAST(ov AS DOUBLE) / rtot, 6) AS chr_recall,
           ROUND(CAST(5.0 AS DOUBLE) * (CAST(ov AS DOUBLE) / htot)
                 * (CAST(ov AS DOUBLE) / rtot)
                 / (CAST(4.0 AS DOUBLE) * (CAST(ov AS DOUBLE) / htot)
                    + (CAST(ov AS DOUBLE) / rtot)), 6) AS chrf2
    FROM tot
    """


@query("q473_chrf", oracle=_chrf_sql("duck"))
def q473_chrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus chrF2: character-3-gram precision and recall of the
    perturbed hypothesis, combined with beta=2 (recall weighted 4x —
    the MT metric that survives tokenizer differences). Totals are
    exact integers from one full-outer co-partitioned join of the
    two (doc, gram) count tables; the F-score is one straight-line
    terminal expression.

    Spark plan (oracle unchanged): the hypothesis STRING is bound
    once in a projection — inlining it into the char-ngram transform
    lambda re-ran the whole split/substitute/drop/concat pipeline per
    gram position, O(len^2) per doc (guide §2.3; the r9 tokenize-once
    lesson) — and both gram multisets explode in ONE corpus pass as
    (g, hc, rc) side-count structs, so the per-(doc, gram) table
    aggregates directly: no second scan, no FULL OUTER join. The
    summed (hc, rc) cells are exactly the COALESCE'd join cells."""
    _views(spark, sf_dir)
    docs = spark.table("documents")
    bound = docs.select(
        "doc_id",
        F.expr(_join_str("spark", _hyp("spark"))).alias("h"),
        "text",
    )
    hside = (
        f"transform({_char_ngrams('spark', 'h', 3)}, "
        "g -> struct(g AS g, 1 AS hc, 0 AS rc))"
    )
    rside = (
        f"transform({_char_ngrams('spark', 'text', 3)}, "
        "g -> struct(g AS g, 0 AS hc, 1 AS rc))"
    )
    j = (
        bound.select(
            "doc_id",
            F.explode(F.expr(f"concat({hside}, {rside})")).alias("p"),
        )
        .groupBy("doc_id", F.col("p.g").alias("g"))
        .agg(
            F.sum("p.hc").cast("bigint").alias("hc"),
            F.sum("p.rc").cast("bigint").alias("rc"),
        )
    )
    tot = j.agg(
        F.sum(F.least("hc", "rc")).cast("bigint").alias("ov"),
        F.sum("hc").cast("bigint").alias("htot"),
        F.sum("rc").cast("bigint").alias("rtot"),
    )
    return tot.select(
        F.expr("ROUND(CAST(ov AS DOUBLE) / htot, 6)").alias("chr_precision"),
        F.expr("ROUND(CAST(ov AS DOUBLE) / rtot, 6)").alias("chr_recall"),
        F.expr(
            "ROUND(CAST(5.0 AS DOUBLE) * (CAST(ov AS DOUBLE) / htot)"
            " * (CAST(ov AS DOUBLE) / rtot)"
            " / (CAST(4.0 AS DOUBLE) * (CAST(ov AS DOUBLE) / htot)"
            " + (CAST(ov AS DOUBLE) / rtot)), 6)"
        ).alias("chrf2"),
    )


# ---------------------------------------------------------------------------
# q474 — levenshtein edit distance


def _edit_sql(dialect: str) -> str:
    hyp_str = _join_str(dialect, _hyp(dialect))
    return f"""
    WITH pairs AS (
      SELECT doc_id,
             levenshtein(substr({hyp_str}, 1, {EDIT_PREFIX}),
                         substr(text, 1, {EDIT_PREFIX})) AS lev,
             length(substr(text, 1, {EDIT_PREFIX})) AS rl
      FROM documents
    ),
    normed AS (
      SELECT CAST(FLOOR(CAST(lev AS DOUBLE) * 10 / rl) AS BIGINT) AS bucket,
             lev, rl
      FROM pairs WHERE rl > 0
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(lev) AS BIGINT) AS total_edits,
           ROUND(CAST(SUM(CAST(ROUND(CAST(lev AS DOUBLE) / rl, 8)
                 AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*), 6) AS mean_cer
    FROM normed
    GROUP BY bucket
    """


@query("q474_edit_distance", oracle=_edit_sql("duck"))
def q474_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character error rate via levenshtein(hyp, ref) on 200-char
    prefixes (both engines ship the same DP levenshtein; the prefix
    bounds the O(len^2) per-row cost — at 100 TB this cap is what
    keeps the metric a map-side expression). Histogram over
    FLOOR(10 * CER) buckets (rule 16: FLOOR, never ROUND, for bucket
    codes) + per-bucket mean CER from 8-dp DECIMAL sums."""
    _views(spark, sf_dir)
    return spark.sql(_edit_sql("spark"))


# ---------------------------------------------------------------------------
# q475 — distinct-n diversity


def _distinct_sql(dialect: str) -> str:
    return f"""
    WITH uni AS (
      SELECT source, g
      FROM (SELECT source, {_unnest(dialect, _toks(dialect), "g")}
            FROM documents) t
    ),
    bi AS (
      SELECT source, g
      FROM (SELECT source,
                   {_unnest(dialect, _ngrams(dialect, _toks(dialect), 2), "g")}
            FROM documents) t
    ),
    u AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS d1
      FROM uni GROUP BY source
    ),
    b AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(COUNT(DISTINCT g) AS BIGINT) AS d2
      FROM bi GROUP BY source
    )
    SELECT u.source, u.n_tokens, u.d1 AS distinct_unigrams,
           b.d2 AS distinct_bigrams,
           ROUND(CAST(u.d1 AS DOUBLE) / u.n_tokens, 6) AS distinct_1,
           ROUND(CAST(b.d2 AS DOUBLE) / b.n_bigrams, 6) AS distinct_2
    FROM u JOIN b ON b.source = u.source
    """


@query("q475_distinct_n", oracle=_distinct_sql("duck"))
def q475_distinct_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct-1 / distinct-2 diversity per source: unique n-grams
    over total n-grams — the degenerate-generation detector (mode
    collapse drives these toward 0). Two explode -> two-level
    aggregate passes; at 100 TB swap COUNT(DISTINCT) for the q56 HLL
    sketch buffers (this exact anchor stays as the oracle)."""
    _views(spark, sf_dir)
    return spark.sql(_distinct_sql("spark"))
