"""Lexical-growth batch 141 (q771-q775) — vocabulary-scaling laws
over the documents corpus, the curves a tokenizer/corpus team reads
before sizing a vocab or estimating unseen mass. The unit is the
word 2-gram ("bigram shingle", ~900 types on this corpus — the
unigram space is too small to show growth), built with the same
1-based slice construction on both engines (textops shingle idiom).

- q771 Heaps curve: vocabulary size vs corpus size at 8 deterministic
  doc-id cutoffs, computed in ONE pass via each type's FIRST
  occurrence doc (vocab at cutoff = types whose min doc-id < cutoff —
  no per-cutoff rescan);
- q772 Heaps-law fit V = K * N^beta: log-log OLS over the 8 curve
  points (nano-quantized terms, exact integer sums);
- q773 frequency spectrum f -> N_f for f = 1..10 with the
  Good-Turing adjusted counts f* = (f+1) N_{f+1} / N_f;
- q774 Zipf slope from the spectrum (OLS of ln N_f on ln f — the
  frequency-of-frequencies estimator, which never needs a global
  rank) plus the Good-Turing unseen mass N_1/N;
- q775 per-language lexical profile: types, tokens, TTR, hapax
  share, Herdan's C = ln V / ln N.

100 TB shape: one shingle explode -> one (type) aggregate carrying
both COUNT(*) and MIN(doc_id) — the only corpus-sized shuffle; the
Heaps cutoffs join that aggregate against an 8-row constant grid
(broadcast inequality join over the bounded side); the spectrum is
an aggregate OF an aggregate (distinct-count-valued, dozens of
rows). Nothing ranks the corpus.

Determinism: counts and first-doc ids are exact integers; every
log-log regression term is FLOOR-nano-quantized (the q761 lesson —
never ROUND(double, 9) for accumulated terms) and summed as BIGINT;
fits and ratios are terminal straight-line doubles; Herdan's C is
display-rounded at 9dp (LN ulp, q762 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_CUTS = 8
NANO = "1000000000"

_BIGRAMS_DUCK = (
    "list_transform(range(1, len(string_split(text, ' '))), "
    "i -> array_to_string((string_split(text, ' '))[i:i+1], ' '))"
)
_BIGRAMS_SPARK = (
    "CASE WHEN size(split(text, ' ')) < 2 THEN array() "
    "ELSE transform(sequence(1, size(split(text, ' ')) - 1), "
    "i -> concat_ws(' ', slice(split(text, ' '), i, 2))) END"
)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _nq(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * {NANO} + 0.5) AS BIGINT)"


def _toks_cte(dialect: str) -> str:
    if dialect == "spark":
        # tokenize once into `_w` before the shingle transform: the
        # split() inlined in the lambda re-tokenized per bigram
        # (no loop-invariant hoisting in HOFs — O(len²) per doc)
        bigrams_w = _BIGRAMS_SPARK.replace("split(text, ' ')", "_w")
        return f"""toks AS (
      SELECT doc_id, lang, explode({bigrams_w}) AS tok
      FROM (SELECT doc_id, lang, split(text, ' ') AS _w FROM documents)
    )"""
    return f"""toks AS (
      SELECT doc_id, lang, unnest({_BIGRAMS_DUCK}) AS tok FROM documents
    )"""


def _types_cte(dialect: str) -> str:
    """Per-type total count and first-occurrence doc — the one corpus pass."""
    return f"""{_toks_cte(dialect)},
    types AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(MIN(doc_id) AS BIGINT) AS first_doc
      FROM toks GROUP BY tok
    )"""


def _cuts_cte() -> str:
    ks = ", ".join(f"({k})" for k in range(1, N_CUTS + 1))
    return f"""ks(k) AS (VALUES {ks}),
    mx AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS nd FROM documents),
    cuts AS (
      SELECT k, CAST(FLOOR(m.nd * k / CAST({N_CUTS} AS DOUBLE)) AS BIGINT)
               AS cut
      FROM ks CROSS JOIN mx m
    )"""


def _curve_cte(dialect: str) -> str:
    """The 8-point Heaps curve (n_docs, n_tokens, vocab per cutoff)."""
    return f"""{_types_cte(dialect)},
    {_cuts_cte()},
    doclen AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ntok
      FROM toks GROUP BY doc_id
    ),
    sizes AS (
      SELECT /*+ BROADCAST(c) */ c.k, c.cut,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(d.ntok) AS BIGINT) AS n_tokens
      FROM doclen d JOIN cuts c ON d.doc_id < c.cut
      GROUP BY c.k, c.cut
    ),
    vocabs AS (
      SELECT /*+ BROADCAST(c) */ c.k,
             CAST(COUNT(*) AS BIGINT) AS vocab
      FROM types t JOIN cuts c ON t.first_doc < c.cut
      GROUP BY c.k
    ),
    curve AS (
      SELECT s.k, s.cut, s.n_docs, s.n_tokens, v.vocab
      FROM sizes s JOIN vocabs v ON v.k = s.k
    )"""


# ---------------------------------------------------------------------------
# q771 — Heaps curve

def _q771_sql(dialect: str) -> str:
    return f"""
    WITH {_curve_cte(dialect)}
    SELECT CAST(k AS BIGINT) AS step, cut AS doc_cutoff,
           n_docs, n_tokens, vocab,
           CAST(vocab AS DOUBLE) / n_tokens AS type_token_ratio
    FROM curve
    ORDER BY k
    """


@query("q771_heaps_curve", oracle=_q771_sql("duckdb"))
def q771_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth at 8 deterministic doc-id cutoffs, from one
    corpus pass (per-type first-occurrence doc) joined against the
    constant cutoff grid. Vocab and TTR should grow sublinearly —
    monotonicity is test-asserted."""
    _views(spark, sf_dir)
    return spark.sql(_q771_sql("spark"))


# ---------------------------------------------------------------------------
# q772 — Heaps fit

def _q772_sql(dialect: str) -> str:
    return f"""
    WITH {_curve_cte(dialect)},
    pts AS (
      SELECT {_nq('LN(CAST(n_tokens AS DOUBLE))')} AS xn,
             {_nq('LN(CAST(vocab AS DOUBLE))')} AS yn
      FROM curve WHERE n_tokens > 0 AND vocab > 0
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xn) AS BIGINT) AS sx,
             CAST(SUM(yn) AS BIGINT) AS sy,
             CAST(SUM(CAST(xn AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(xn AS DECIMAL(38,0)) * xn) AS DECIMAL(38,0)) AS sxx
      FROM pts
    )
    SELECT n AS n_points,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx) AS heaps_beta,
           0.0 + ROUND(EXP((CAST(sy AS DOUBLE) - ((CAST(n AS DOUBLE)
             * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * sx)) * sx) / n / {NANO}), 9)
             AS heaps_k
    FROM mom
    """


@query("q772_heaps_fit", oracle=_q772_sql("duckdb"))
def q772_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps-law parameters from the log-log OLS over the 8 curve
    points: beta (sublinear exponent, expected in (0,1)) and K.
    Regression terms are nano-quantized integers; K's EXP is
    display-rounded (q762 lesson). Note the slope divides nano-scaled
    sums so the 1e9 factors cancel exactly."""
    _views(spark, sf_dir)
    return spark.sql(_q772_sql("spark"))


# ---------------------------------------------------------------------------
# q773 — frequency spectrum + Good-Turing

def _q773_sql(dialect: str) -> str:
    return f"""
    WITH {_types_cte(dialect)},
    spec AS (
      SELECT c AS f, CAST(COUNT(*) AS BIGINT) AS nf
      FROM types GROUP BY c
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM types
    )
    SELECT s.f AS freq,
           s.nf AS n_types_at_freq,
           CAST(s.nf AS DOUBLE) / t.n_types AS type_share,
           CAST(s.f + 1 AS DOUBLE) * COALESCE(s2.nf, CAST(0 AS BIGINT))
             / s.nf AS gt_adjusted_count
    FROM spec s
    LEFT JOIN spec s2 ON s2.f = s.f + 1
    CROSS JOIN tot t
    WHERE s.f <= 10
    ORDER BY s.f
    """


@query("q773_freq_spectrum", oracle=_q773_sql("duckdb"))
def q773_freq_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frequency-of-frequencies spectrum for f = 1..10 with
    Good-Turing adjusted counts (f+1) N_{f+1} / N_f — the smoothing
    table an n-gram LM uses. Spectrum rows are bounded by distinct
    count values, never vocabulary size."""
    _views(spark, sf_dir)
    return spark.sql(_q773_sql("spark"))


# ---------------------------------------------------------------------------
# q774 — Zipf slope + unseen mass

def _q774_sql(dialect: str) -> str:
    return f"""
    WITH {_types_cte(dialect)},
    spec AS (
      SELECT c AS f, CAST(COUNT(*) AS BIGINT) AS nf
      FROM types GROUP BY c
    ),
    pts AS (
      SELECT {_nq('LN(CAST(f AS DOUBLE))')} AS xn,
             {_nq('LN(CAST(nf AS DOUBLE))')} AS yn
      FROM spec
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(xn) AS BIGINT) AS sx,
             CAST(SUM(yn) AS BIGINT) AS sy,
             CAST(SUM(CAST(xn AS DECIMAL(38,0)) * yn) AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(xn AS DECIMAL(38,0)) * xn) AS DECIMAL(38,0)) AS sxx
      FROM pts
    ),
    gt AS (
      SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_types
      FROM types
    )
    SELECT m.n AS n_spectrum_points,
           (CAST(m.n AS DOUBLE) * CAST(m.sxy AS DOUBLE)
             - CAST(m.sx AS DOUBLE) * m.sy)
             / (CAST(m.n AS DOUBLE) * CAST(m.sxx AS DOUBLE)
                - CAST(m.sx AS DOUBLE) * m.sx) AS spectrum_slope,
           g.n1 AS hapax_count,
           g.n_types,
           CAST(g.n1 AS DOUBLE) / g.n_tokens AS gt_unseen_mass,
           CAST(g.n1 AS DOUBLE) / g.n_types AS hapax_type_share
    FROM mom m CROSS JOIN gt g
    """


@query("q774_zipf_spectrum_fit", oracle=_q774_sql("duckdb"))
def q774_zipf_spectrum_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf structure WITHOUT a global rank: the frequency-spectrum
    slope (ln N_f on ln f; for a Zipf law with exponent s the slope is
    -(1 + 1/s)) beside the Good-Turing unseen-mass estimate N_1/N and
    the hapax type share. One aggregate of an aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_q774_sql("spark"))


# ---------------------------------------------------------------------------
# q775 — per-language lexical profile

def _q775_sql(dialect: str) -> str:
    return f"""
    WITH {_toks_cte(dialect)},
    per AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks GROUP BY lang, tok
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS DOUBLE) / SUM(c) AS type_token_ratio,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS hapax_share,
           0.0 + ROUND(LN(CAST(COUNT(*) AS DOUBLE))
                       / LN(CAST(SUM(c) AS DOUBLE)), 9) AS herdan_c
    FROM per
    GROUP BY lang
    ORDER BY lang
    """


@query("q775_language_lexical_profile", oracle=_q775_sql("duckdb"))
def q775_language_lexical_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical profile: types, tokens, TTR, hapax share,
    and Herdan's C (ln V / ln N, display-rounded for the LN ulp).
    One (lang, type) aggregate then one bounded rollup."""
    _views(spark, sf_dir)
    return spark.sql(_q775_sql("spark"))
