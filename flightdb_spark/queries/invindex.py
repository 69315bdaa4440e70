"""Inverted-index internals batch 117 (q651-q655) — the index-design
arithmetic a search engine does before it ever serves a query, over
the documents table's space-tokenized text (beside textops' BM25/
TF-IDF scoring — this batch is about the INDEX, not the ranking):

- q651 postings census: per-term document frequency, collection
  frequency, and idf (ln contract) for the top terms;
- q652 intersection cost: for every pair of the 5 highest-df terms,
  the exact intersection size vs the linear-merge cost (df1+df2) and
  the galloping-search cost bound min*(floor(log2(max/min))+1) —
  floor(log2) computed EXACTLY as the bit length of the integer
  ratio, never a libm log;
- q653 WAND pruning: a literal 3-term query; per-term upper-bound
  scores (max tf x idf), the true top-10 threshold, and how many
  candidate docs the upper-bound test provably skips;
- q654 skip-list design: per term the sqrt(df) skip interval and the
  expected probe counts with and without skips;
- q655 positional vs bigram index: total positions (every token)
  vs distinct (bigram, doc) postings vs distinct bigrams — the
  phrase-query storage tradeoff, bigrams built map-side from the
  token array (no position join).

100 TB shape: ONE tokenize-explode per query feeds bounded term
aggregates; pair costs run on the 5x5 term table; the WAND
simulation scores docs once and compares against a broadcast
threshold. Token arrays explode map-side (basket shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TOP_TERMS = 15
PAIR_TERMS = 5
WAND_QUERY = ("scan", "merge", "window")
WAND_K = 10


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _tokens_cte(dialect: str) -> str:
    if dialect == "spark":
        return """tokens AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, explode(split(text, ' ')) AS w FROM documents
      ) t WHERE w <> ''
    )"""
    return """tokens AS (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ) t WHERE w <> ''
    )"""


def _postings_cte(dialect: str) -> str:
    return f"""{_tokens_cte(dialect)},
    postings AS (
      SELECT w, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
             CAST(COUNT(*) AS BIGINT) AS cf
      FROM tokens GROUP BY w
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)"""


# ---------------------------------------------------------------------------
# q651 — postings census


def _census_sql(dialect: str) -> str:
    return f"""
    WITH {_postings_cte(dialect)}
    SELECT p.w AS term, p.df, p.cf,
           ROUND(ROUND(ln(CAST(n.n AS DOUBLE) / p.df), 9), 5) AS idf
    FROM postings p CROSS JOIN nd n
    ORDER BY p.df DESC, p.w
    LIMIT {TOP_TERMS}
    """


@query("q651_postings_census", oracle=_census_sql("duck"))
def q651_postings_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The postings census: document frequency, collection frequency,
    and ln(N/df) idf (9 dp intermediate, DOUBLE out) for the top
    terms — one tokenize-explode and one term aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_census_sql("spark"))


# ---------------------------------------------------------------------------
# q652 — intersection cost


def _bitlen(dialect: str, x: str) -> str:
    """floor(log2(x)) + 1 for x >= 1, exactly: the binary bit length."""
    return f"length(bin({x}))"


def _pair_cost_sql(dialect: str) -> str:
    ratio = (
        "(GREATEST(i.dfa, i.dfb) div LEAST(i.dfa, i.dfb))"
        if dialect == "spark"
        else "(GREATEST(i.dfa, i.dfb) // LEAST(i.dfa, i.dfb))"
    )
    bl = _bitlen(dialect, ratio)
    return f"""
    WITH {_postings_cte(dialect)},
    top5 AS (
      SELECT w, df FROM postings ORDER BY df DESC, w LIMIT {PAIR_TERMS}
    ),
    pairs AS (
      SELECT a.w AS wa, b.w AS wb, a.df AS dfa, b.df AS dfb
      FROM top5 a JOIN top5 b ON b.w > a.w
    ),
    isect AS (
      SELECT p.wa, p.wb, p.dfa, p.dfb,
             CAST(COUNT(*) AS BIGINT) AS both_docs
      FROM pairs p
      JOIN (SELECT DISTINCT doc_id, w FROM tokens) x ON x.w = p.wa
      JOIN (SELECT DISTINCT doc_id, w FROM tokens) y
        ON y.w = p.wb AND y.doc_id = x.doc_id
      GROUP BY p.wa, p.wb, p.dfa, p.dfb
    )
    SELECT i.wa, i.wb, i.both_docs,
           CAST(i.dfa + i.dfb AS BIGINT) AS linear_merge_cost,
           CAST(LEAST(i.dfa, i.dfb) * CAST({bl} AS BIGINT) AS BIGINT)
             AS galloping_cost,
           ROUND(CAST(i.both_docs AS DOUBLE)
                 / LEAST(i.dfa, i.dfb), 6) AS selectivity
    FROM isect i
    ORDER BY i.wa, i.wb
    """


# --- Spark-side staging for q652 (oracle keeps the single statement) --------
#
# `tokens` was re-expanded 3x (postings + both DISTINCT join sides) and
# the per-pair intersection re-derived the distinct (doc, term) table
# twice. Stage: (1) one full-vocab postings pass -> 5-row top5 view
# (the df values are outputs, so the vocabulary aggregate is required);
# (2) one tokenize pass filtered to those 5 terms -> checkpointed
# distinct (doc, term) table; the pair intersection joins run on the
# checkpoint.

_TOP5_VIEW = "invindex_top5_mv"
_TW_VIEW = "invindex_tw_mv"


def _top5_tw_views(spark: SparkSession, sf_dir: str) -> None:
    _views(spark, sf_dir)
    top5 = spark.sql(
        f"""
    WITH {_postings_cte('spark')}
    SELECT w, df FROM postings ORDER BY df DESC, w LIMIT {PAIR_TERMS}
    """
    )
    top5.localCheckpoint(eager=True).createOrReplaceTempView(_TOP5_VIEW)
    tw = spark.sql(
        f"""
    WITH {_tokens_cte('spark')}
    SELECT DISTINCT t.doc_id, t.w
    FROM tokens t JOIN {_TOP5_VIEW} p ON p.w = t.w
    """
    )
    tw.localCheckpoint(eager=True).createOrReplaceTempView(_TW_VIEW)


def _pair_cost_mv_sql() -> str:
    ratio = "(GREATEST(i.dfa, i.dfb) div LEAST(i.dfa, i.dfb))"
    bl = _bitlen("spark", ratio)
    return f"""
    WITH top5 AS (SELECT w, df FROM {_TOP5_VIEW}),
    pairs AS (
      SELECT a.w AS wa, b.w AS wb, a.df AS dfa, b.df AS dfb
      FROM top5 a JOIN top5 b ON b.w > a.w
    ),
    isect AS (
      SELECT p.wa, p.wb, p.dfa, p.dfb,
             CAST(COUNT(*) AS BIGINT) AS both_docs
      FROM pairs p
      JOIN {_TW_VIEW} x ON x.w = p.wa
      JOIN {_TW_VIEW} y
        ON y.w = p.wb AND y.doc_id = x.doc_id
      GROUP BY p.wa, p.wb, p.dfa, p.dfb
    )
    SELECT i.wa, i.wb, i.both_docs,
           CAST(i.dfa + i.dfb AS BIGINT) AS linear_merge_cost,
           CAST(LEAST(i.dfa, i.dfb) * CAST({bl} AS BIGINT) AS BIGINT)
             AS galloping_cost,
           ROUND(CAST(i.both_docs AS DOUBLE)
                 / LEAST(i.dfa, i.dfb), 6) AS selectivity
    FROM isect i
    ORDER BY i.wa, i.wb
    """


@query("q652_intersection_cost", oracle=_pair_cost_sql("duck"))
def q652_intersection_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postings-intersection economics for the top-5-term pairs:
    exact intersection sizes vs the linear-merge cost df1+df2 and the
    galloping bound min*(bitlen(max div min)) — the bit length IS
    floor(log2)+1 computed exactly from the binary string, no libm.
    The decision table behind adaptive set intersection. Spark side
    stages top5 + the term-filtered distinct (doc, term) table once;
    the oracle keeps the full single-statement chain."""
    _top5_tw_views(spark, sf_dir)
    return spark.sql(_pair_cost_mv_sql())


# ---------------------------------------------------------------------------
# q653 — WAND pruning


def _wand_sql(dialect: str) -> str:
    terms = ", ".join(f"('{t}')" for t in WAND_QUERY)
    return f"""
    WITH {_postings_cte(dialect)},
    qterms(qw) AS (VALUES {terms}),
    tf AS (
      SELECT t.doc_id, t.w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tokens t JOIN qterms q ON q.qw = t.w
      GROUP BY t.doc_id, t.w
    ),
    -- integer milli-idf: idf_m = round(ln(N/df)*1000) — one rounded
    -- transcendental per TERM (bounded), then all-integer scoring
    widf AS (
      SELECT /*+ BROADCAST(n) */ p.w,
             CAST(ROUND(ln(CAST(n.n AS DOUBLE) / p.df) * 1000, 0) AS BIGINT)
               AS idf_m
      FROM postings p CROSS JOIN nd n
      JOIN qterms q ON q.qw = p.w
    ),
    scored AS (
      SELECT f.doc_id,
             CAST(SUM(f.tf * w.idf_m) AS BIGINT) AS score_m,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM tf f JOIN widf w ON w.w = f.w
      GROUP BY f.doc_id
    ),
    ub AS (
      SELECT w.w, CAST(MAX(f.tf) * MAX(w.idf_m) AS BIGINT) AS upper_m
      FROM tf f JOIN widf w ON w.w = f.w
      GROUP BY w.w
    ),
    thresh AS (
      SELECT score_m AS theta FROM scored
      ORDER BY score_m DESC, doc_id LIMIT 1 OFFSET {WAND_K - 1}
    ),
    sum_ub AS (SELECT CAST(SUM(upper_m) AS BIGINT) AS total_ub FROM ub)
    SELECT /*+ BROADCAST(t), BROADCAST(u) */
           CAST(COUNT(*) AS BIGINT) AS candidate_docs,
           CAST(MAX(t.theta) AS BIGINT) AS top{WAND_K}_threshold_m,
           CAST(MAX(u.total_ub) AS BIGINT) AS sum_upper_bounds_m,
           CAST(SUM(CASE WHEN s.n_terms_hit = 1
                          AND s.score_m < t.theta THEN 1 ELSE 0 END)
                AS BIGINT) AS single_term_prunable,
           CAST(SUM(CASE WHEN s.score_m >= t.theta THEN 1 ELSE 0 END)
                AS BIGINT) AS surviving_docs
    FROM scored s CROSS JOIN thresh t CROSS JOIN sum_ub u
    """


# --- Spark-side staging (oracle keeps the single-statement CTE form) --------
#
# Catalyst inlines CTEs per reference: `tf` (a corpus tokenize-explode
# + aggregate) is referenced by BOTH `scored` and `ub`, and `postings`
# aggregates the FULL vocabulary (COUNT(DISTINCT doc_id) per term) when
# only the 3 query terms' df values are consumed — so the before plan
# ran 3 tokenize passes plus a vocabulary-wide distinct aggregate
# (P3 pattern + guide §2.3 "don't compute things you throw away").
# The fix: ONE tokenize pass filtered to the query terms materializes
# the (doc, term, tf) table; df per term is then COUNT(*) of that
# doc-grain table (identical to COUNT(DISTINCT doc_id) by construction)
# and every downstream CTE reads the checkpoint.

_TF_VIEW = "invindex_tf_mv"


def _tf_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE query-term-filtered tokenize pass -> checkpointed tf."""
    _views(spark, sf_dir)
    terms = ", ".join(f"('{t}')" for t in WAND_QUERY)
    df = spark.sql(
        f"""
    WITH {_tokens_cte('spark')},
    qterms(qw) AS (VALUES {terms}),
    tf AS (
      SELECT t.doc_id, t.w, CAST(COUNT(*) AS BIGINT) AS tf
      FROM tokens t JOIN qterms q ON q.qw = t.w
      GROUP BY t.doc_id, t.w
    )
    SELECT doc_id, w, tf FROM tf
    """
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_TF_VIEW)


def _wand_mv_sql() -> str:
    return f"""
    WITH tf AS (SELECT doc_id, w, tf FROM {_TF_VIEW}),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    -- integer milli-idf: idf_m = round(ln(N/df)*1000) — one rounded
    -- transcendental per TERM (bounded), then all-integer scoring;
    -- df = COUNT(*) over the (doc, term)-grain tf == COUNT(DISTINCT
    -- doc_id) in the oracle's postings, exactly
    widf AS (
      SELECT /*+ BROADCAST(n) */ p.w,
             CAST(ROUND(ln(CAST(n.n AS DOUBLE) / p.df) * 1000, 0) AS BIGINT)
               AS idf_m
      FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY w) p
      CROSS JOIN nd n
    ),
    scored AS (
      SELECT f.doc_id,
             CAST(SUM(f.tf * w.idf_m) AS BIGINT) AS score_m,
             CAST(COUNT(*) AS BIGINT) AS n_terms_hit
      FROM tf f JOIN widf w ON w.w = f.w
      GROUP BY f.doc_id
    ),
    ub AS (
      SELECT w.w, CAST(MAX(f.tf) * MAX(w.idf_m) AS BIGINT) AS upper_m
      FROM tf f JOIN widf w ON w.w = f.w
      GROUP BY w.w
    ),
    thresh AS (
      SELECT score_m AS theta FROM scored
      ORDER BY score_m DESC, doc_id LIMIT 1 OFFSET {WAND_K - 1}
    ),
    sum_ub AS (SELECT CAST(SUM(upper_m) AS BIGINT) AS total_ub FROM ub)
    SELECT /*+ BROADCAST(t), BROADCAST(u) */
           CAST(COUNT(*) AS BIGINT) AS candidate_docs,
           CAST(MAX(t.theta) AS BIGINT) AS top{WAND_K}_threshold_m,
           CAST(MAX(u.total_ub) AS BIGINT) AS sum_upper_bounds_m,
           CAST(SUM(CASE WHEN s.n_terms_hit = 1
                          AND s.score_m < t.theta THEN 1 ELSE 0 END)
                AS BIGINT) AS single_term_prunable,
           CAST(SUM(CASE WHEN s.score_m >= t.theta THEN 1 ELSE 0 END)
                AS BIGINT) AS surviving_docs
    FROM scored s CROSS JOIN thresh t CROSS JOIN sum_ub u
    """


@query("q653_wand_pruning", oracle=_wand_sql("duck"))
def q653_wand_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAND-style pruning for a 3-term query: integer milli-idf
    scores (ONE rounded transcendental per term — bounded — then
    all-integer tf x idf arithmetic), the exact top-10 threshold via
    TakeOrdered+OFFSET, per-term upper bounds, and the count of
    single-term candidates the upper-bound test provably skips.
    Spark side stages the query-term tf table once (_tf_view); the
    oracle keeps the full single-statement chain."""
    _tf_view(spark, sf_dir)
    return spark.sql(_wand_mv_sql())


# ---------------------------------------------------------------------------
# q654 — skip-list design


def _skip_sql(dialect: str) -> str:
    return f"""
    WITH {_postings_cte(dialect)},
    top AS (
      SELECT w, df FROM postings ORDER BY df DESC, w LIMIT {TOP_TERMS}
    )
    SELECT w AS term, df,
           CAST(FLOOR(SQRT(CAST(df AS DOUBLE))) AS BIGINT) AS skip_interval,
           -- expected probes for one lookup: linear df/2 vs
           -- skips/2 + interval/2
           ROUND(CAST(df AS DOUBLE) / 2, 2) AS linear_probes,
           ROUND(CAST(df AS DOUBLE)
                 / (2 * FLOOR(SQRT(CAST(df AS DOUBLE))))
                 + FLOOR(SQRT(CAST(df AS DOUBLE))) / 2.0, 2) AS skip_probes
    FROM top
    ORDER BY df DESC, term
    """


@query("q654_skiplist_design", oracle=_skip_sql("duck"))
def q654_skiplist_design(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-pointer sizing: the classical sqrt(df) interval per
    posting list and the expected probe counts with and without skips
    (sqrt is exact on these magnitudes; FLOOR makes the interval an
    integer on both engines). The ~2*sqrt(df) vs df/2 gap is the
    argument for skips."""
    _views(spark, sf_dir)
    return spark.sql(_skip_sql("spark"))


# ---------------------------------------------------------------------------
# q655 — positional vs bigram index


def _bigram_cte(dialect: str) -> str:
    if dialect == "spark":
        arr = "filter(split(text, ' '), x -> x <> '')"
        big = (
            f"transform(sequence(1, size({arr}) - 1), "
            f"i -> concat(element_at({arr}, i), ' ', element_at({arr}, i + 1)))"
        )
        return f"""bigrams AS (
      SELECT doc_id, explode({big}) AS bg FROM documents
      WHERE size({arr}) >= 2
    )"""
    arr = "list_filter(string_split(text, ' '), x -> x <> '')"
    big = (
        f"list_transform(range(1, len({arr})), "
        f"i -> {arr}[i] || ' ' || {arr}[i + 1])"
    )
    return f"""bigrams AS (
      SELECT doc_id, unnest({big}) AS bg FROM documents
      WHERE len({arr}) >= 2
    )"""


def _posbig_sql(dialect: str) -> str:
    return f"""
    WITH {_tokens_cte(dialect)},
    {_bigram_cte(dialect)},
    pos_cost AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS total_positions,
             CAST(COUNT(DISTINCT w) AS BIGINT) AS vocab
      FROM tokens
    ),
    big_cost AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS bigram_instances,
             CAST(COUNT(DISTINCT bg) AS BIGINT) AS distinct_bigrams,
             CAST(COUNT(DISTINCT concat(bg, '|', CAST(doc_id AS VARCHAR)))
                  AS BIGINT) AS bigram_postings
      FROM bigrams
    )
    SELECT p.total_positions, p.vocab,
           b.bigram_instances, b.distinct_bigrams, b.bigram_postings,
           ROUND(CAST(b.bigram_postings AS DOUBLE) / p.total_positions, 6)
             AS bigram_to_positional_ratio
    FROM pos_cost p CROSS JOIN big_cost b
    """


@query("q655_positional_vs_bigram", oracle=_posbig_sql("duck"))
def q655_positional_vs_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The phrase-query storage tradeoff: a positional index stores
    every token occurrence (total_positions) while a bigram index
    stores distinct (bigram, doc) postings — the ratio decides which
    to build. Bigrams assemble map-side from the token array (indexed
    HOF lambdas), no position self-join."""
    _views(spark, sf_dir)
    return spark.sql(_posbig_sql("spark").replace("AS VARCHAR", "AS STRING"))
