"""Readability batch 192 (q1027-q1031) — the classic readability
index family (Flesch 1948; Kincaid 1975; Coleman-Liau 1975; ARI 1967)
over the documents corpus: the text-quality signals a curation
pipeline thresholds on, computed as EXACT integer rationals.

The synthetic corpus is a punctuation-free word stream, so the
sentence unit is a DOCUMENTED fixed segmentation: one pseudo-sentence
per 12 words, S = (W + 11) // 12 (integer ceil-div; the corpus
contract, not a linguistic claim). Counts are exact and engine-safe:
words = space-count + 1 (replace-diff, no regex), letters =
len(replace(text, ' ', '')), syllables = vowel-group count
([aeiouy]+ via regexp_extract_all length — identical greedy semantics
in both engines).

Every index is carried as an exact integer rational (num/den) with a
single terminal double; band/threshold decisions compare exact
cross-products, never doubles:

- q1027 count census per language: total words/letters/syllables/
  pseudo-sentences + per-doc extremes;
- q1028 Flesch Reading Ease: corpus-level FRE per language from
  summed counts (exact rational), plus the per-doc FRE band census
  (FLOOR of identical doubles);
- q1029 grade indices per language: Flesch-Kincaid, Coleman-Liau,
  ARI as exact rationals of the aggregate counts;
- q1030 grade-8 consensus votes: per doc, how many of {FK, CLI, ARI}
  sit at-or-above grade 8 by EXACT cross-product comparison; census
  of 0..3 votes per language;
- q1031 readability-length correlation per language: Pearson between
  milli-quantized FK grade and document length from exact DECIMAL
  moments (the q1014 machinery).

100 TB shape: every query is ONE documents pass to a per-language
(or per-band) census — map-side arithmetic, one small shuffle.

Determinism: integer counts; num/den rationals; cross-product
comparisons; FLOOR over identical doubles only for band labels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

GRADE_VOTE = 8  # consensus threshold: grade-8-or-above


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _counts_cte(d: str) -> str:
    if d == "spark":
        syl = "CAST(size(regexp_extract_all(text, '[aeiouy]+', 0)) AS BIGINT)"
    else:
        syl = "CAST(len(regexp_extract_all(text, '[aeiouy]+')) AS BIGINT)"
    return f"""counts AS (
      SELECT doc_id, lang,
             CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1
               AS BIGINT) AS w,
             CAST(LENGTH(REPLACE(text, ' ', '')) AS BIGINT) AS ltr,
             {syl} AS syl
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, lang, w, ltr, syl,
             CAST(FLOOR(CAST(w + 11 AS DOUBLE) / 12.0) AS BIGINT) AS s
      FROM counts
    )"""


def _q1027_sql(d: str) -> str:
    return f"""
    WITH {_counts_cte(d)}
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(w) AS BIGINT) AS total_words,
           CAST(SUM(ltr) AS BIGINT) AS total_letters,
           CAST(SUM(syl) AS BIGINT) AS total_syllables,
           CAST(SUM(s) AS BIGINT) AS total_sentences,
           CAST(MIN(w) AS BIGINT) AS min_words,
           CAST(MAX(w) AS BIGINT) AS max_words
    FROM cnt
    GROUP BY lang
    ORDER BY lang
    """


@query("q1027_text_counts", oracle=_q1027_sql("duckdb"))
def q1027_text_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The readability raw-count census per language: exact word/
    letter/syllable/pseudo-sentence totals and per-doc word extremes —
    the shared substrate of every index below. One pass, 6-group
    census."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_q1027_sql("spark"))


# FRE = 206.835 - 1.015 W/S - 84.6 Y/W
#     = (206835 S W - 1015 W^2 - 84600 Y S) / (1000 S W)
_FRE_NUM = "(206835 * s * w - 1015 * w * w - 84600 * syl * s)"
_FRE_DEN = "(1000 * s * w)"


def _q1028_sql(d: str) -> str:
    return f"""
    WITH {_counts_cte(d)},
    agg AS (
      SELECT lang,
             CAST(SUM(w) AS BIGINT) AS w,
             CAST(SUM(syl) AS BIGINT) AS syl,
             CAST(SUM(s) AS BIGINT) AS s
      FROM cnt GROUP BY lang
    ),
    perdoc AS (
      SELECT lang,
             CAST(FLOOR(CAST({_FRE_NUM} AS DOUBLE) / {_FRE_DEN} / 10.0)
               AS BIGINT) AS fre_band
      FROM cnt
    ),
    bands AS (
      SELECT lang, fre_band, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM perdoc GROUP BY lang, fre_band
    )
    SELECT b.lang, b.fre_band, b.n_docs,
           CAST({_FRE_NUM} AS BIGINT) AS corpus_fre_num,
           CAST({_FRE_DEN} AS BIGINT) AS corpus_fre_den,
           CAST({_FRE_NUM} AS DOUBLE) / {_FRE_DEN} AS corpus_fre
    FROM bands b JOIN agg a ON a.lang = b.lang
    ORDER BY b.lang, b.fre_band
    """


@query("q1028_flesch_scores", oracle=_q1028_sql("duckdb"))
def q1028_flesch_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch Reading Ease: the per-document FRE band census (bands of
    10 points, FLOOR over identical doubles of exact integers) next to
    each language's corpus-level FRE as an exact num/den rational —
    the curation threshold signal and its population summary in one
    table."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_q1028_sql("spark"))


# FK  = 0.39 W/S + 11.8 Y/W - 15.59  = (39 W^2 + 1180 Y S - 1559 S W) / (100 S W)
# CLI = 0.0588 L*100/W - 0.296 S*100/W - 15.8
#     = (588 L - 2960 S - 1580 W) / (100 W)   [L,S per 100 words folded]
# ARI = 4.71 C/W + 0.5 W/S - 21.43   = (471 C S + 50 W^2 - 2143 S W) / (100 S W)
_FK_NUM = "(39 * w * w + 1180 * syl * s - 1559 * s * w)"
_FK_DEN = "(100 * s * w)"
_CLI_NUM = "(588 * ltr - 2960 * s - 1580 * w)"
_CLI_DEN = "(100 * w)"
_ARI_NUM = "(471 * ltr * s + 50 * w * w - 2143 * s * w)"
_ARI_DEN = "(100 * s * w)"


def _q1029_sql(d: str) -> str:
    return f"""
    WITH {_counts_cte(d)},
    agg AS (
      SELECT lang,
             CAST(SUM(w) AS BIGINT) AS w,
             CAST(SUM(ltr) AS BIGINT) AS ltr,
             CAST(SUM(syl) AS BIGINT) AS syl,
             CAST(SUM(s) AS BIGINT) AS s
      FROM cnt GROUP BY lang
    )
    SELECT lang,
           CAST({_FK_NUM} AS BIGINT) AS fk_num,
           CAST({_FK_DEN} AS BIGINT) AS fk_den,
           CAST({_FK_NUM} AS DOUBLE) / {_FK_DEN} AS fk_grade,
           CAST({_CLI_NUM} AS BIGINT) AS cli_num,
           CAST({_CLI_DEN} AS BIGINT) AS cli_den,
           CAST({_CLI_NUM} AS DOUBLE) / {_CLI_DEN} AS cli_grade,
           CAST({_ARI_NUM} AS BIGINT) AS ari_num,
           CAST({_ARI_DEN} AS BIGINT) AS ari_den,
           CAST({_ARI_NUM} AS DOUBLE) / {_ARI_DEN} AS ari_grade
    FROM agg
    ORDER BY lang
    """


@query("q1029_grade_indices", oracle=_q1029_sql("duckdb"))
def q1029_grade_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grade-level index panel per language: Flesch-Kincaid,
    Coleman-Liau and ARI as exact integer rationals of the aggregate
    counts, terminal doubles alongside — three estimators of the same
    construct whose disagreement q1030 votes on."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_q1029_sql("spark"))


def _q1030_sql(d: str) -> str:
    g = GRADE_VOTE
    return f"""
    WITH {_counts_cte(d)},
    votes AS (
      SELECT lang,
             CAST(CASE WHEN {_FK_NUM} >= {g} * {_FK_DEN} THEN 1 ELSE 0 END
               + CASE WHEN {_CLI_NUM} >= {g} * {_CLI_DEN} THEN 1 ELSE 0 END
               + CASE WHEN {_ARI_NUM} >= {g} * {_ARI_DEN} THEN 1 ELSE 0 END
               AS INT) AS n_votes
      FROM cnt
    )
    SELECT lang, n_votes, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM votes
    GROUP BY lang, n_votes
    ORDER BY lang, n_votes
    """


@query("q1030_grade_consensus", oracle=_q1030_sql("duckdb"))
def q1030_grade_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grade-8 consensus voting: for each document, how many of the
    three indices place it at grade {GRADE_VOTE} or above — every vote
    an EXACT integer cross-product comparison (num >= 8*den; dens are
    positive), so no double ever decides a threshold. Census of vote
    counts per language."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_q1030_sql("spark"))


def _q1031_sql(d: str) -> str:
    dec = "DECIMAL(38,0)"
    return f"""
    WITH {_counts_cte(d)},
    quant AS (
      SELECT c.lang,
             CAST(FLOOR(CAST(1000 * {_FK_NUM} AS DOUBLE) / {_FK_DEN})
               AS BIGINT) AS fk_milli,
             dd.n_chars
      FROM cnt c JOIN documents dd ON dd.doc_id = c.doc_id
    ),
    mom AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(fk_milli AS {dec})) AS {dec}) AS sx,
             CAST(SUM(CAST(n_chars AS {dec})) AS {dec}) AS sy,
             CAST(SUM(CAST(fk_milli * fk_milli AS {dec})) AS {dec}) AS sxx,
             CAST(SUM(CAST(n_chars * n_chars AS {dec})) AS {dec}) AS syy,
             CAST(SUM(CAST(fk_milli * n_chars AS {dec})) AS {dec}) AS sxy
      FROM quant GROUP BY lang
    )
    SELECT lang, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS pearson_r,
           CAST(sx AS DOUBLE) / n / 1000.0 AS mean_fk_grade,
           CAST(sy AS DOUBLE) / n AS mean_chars
    FROM mom
    ORDER BY lang
    """


@query("q1031_readability_length_corr", oracle=_q1031_sql("duckdb"))
def q1031_readability_length_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Does reading grade drift with document length? Pearson r per
    language between the milli-quantized FK grade and n_chars, from
    exact DECIMAL moments (the q1014 machinery) — quantize-then-sum
    keeps the correlation order-independent and cross-engine exact."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_q1031_sql("spark"))
