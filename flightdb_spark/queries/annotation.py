"""Annotation-QA batch 63 (q379-q384): the inter-annotator agreement
surface a human-labeling / RLHF data operation runs before trusting its
labels. A deterministic synthetic annotation table (3 annotators per
document, hash-derived labels biased toward the document's true lang,
annotator 3 skipping 25% of docs) is generated from IDENTICAL SQL on
both engines, then:

- q379 Krippendorff's alpha (nominal, missing-data-aware) — THE
  agreement statistic when raters don't all label every item
  (complements q318's Fleiss kappa, which requires complete panels);
- q380 annotator bias: per-annotator label distribution vs pooled,
  total-variation distance — the drift check that catches a rater
  systematically over-using a class;
- q381 pairwise Cohen's kappa matrix — which PAIR disagrees;
- q382 item agreement patterns (unanimous / majority / split by
  coverage) — the disagreement census, integer-only;
- q383 leave-one-out consensus accuracy — each annotator scored
  against the strict majority of the OTHERS (the standard
  annotator-quality score that avoids self-confirmation);
- q384 slice error rate: annotation error (vs the known true lang) by
  (lang, annotator) — the per-slice audit that finds where labeling
  guidelines fail.

Determinism: labels are md5-derived (identical hex on both engines);
every statistic is integer counting up to a final double division;
the few bounded double sums (TV distance, kappa expected agreement)
round per-term to 9 dp and accumulate in DECIMAL (order-free).

100 TB shapes: the annotation explode is 3x the corpus (map-only);
every query is one or two keyed aggregates with map-side partials; no
query materializes more than (docs x labels) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_LANGS = "'de', 'en', 'es', 'fr', 'zh'"
N_ANNOTATORS = 3
SKIP_MOD = 4  # annotator 3 skips docs with doc_id % 4 == 0
NOISE_CUT = 7  # h % 10 < 7 -> true label, else hash-picked language


def _ann_sql(dialect: str) -> str:
    """The shared annotations CTE: 3 annotators per doc (annotator 3
    skips 25%), label = true lang with probability ~0.7 else a
    hash-picked language. All randomness is md5-derived, so both
    engines generate the identical table."""
    if dialect == "spark":
        h = (
            "CAST(conv(substring(md5(CAST(doc_id AS STRING) || '_' || "
            "CAST(a AS STRING)), 1, 4), 16, 10) AS BIGINT)"
        )
        pick = f"element_at(array({_LANGS}), CAST(h % 5 + 1 AS INT))"
        expl = "(SELECT explode(array(1, 2, 3)) AS a)"
    else:
        h = (
            "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' || "
            "CAST(a AS VARCHAR)), 1, 4))::BIGINT)"
        )
        pick = f"([{_LANGS}])[CAST(h % 5 AS INT) + 1]"
        expl = "(SELECT unnest([1, 2, 3]) AS a)"
    return f"""
    hashed AS (
      SELECT doc_id, lang, a, {h} AS h
      FROM documents CROSS JOIN {expl} ann
      WHERE NOT (a = {N_ANNOTATORS} AND doc_id % {SKIP_MOD} = 0)
    ),
    annotations AS (
      SELECT doc_id, lang, a AS annotator,
             CASE WHEN h % 10 < {NOISE_CUT} THEN lang ELSE {pick} END AS label
      FROM hashed
    )"""


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("documents")


# ---------------------------------------------------------------------------
# q379 — Krippendorff's alpha (nominal)


def _krippendorff_sql(dialect: str) -> str:
    # Per unit u: pairwise disagreements = m_u^2 - sum_c n_uc^2, scaled
    # by 1/(m_u - 1). With panels of size 2 or 3 only, 2x the scaled
    # term is an exact integer (m=2 -> 2*x, m=3 -> x), so the unit sum
    # stays in BIGINT; doubles appear only in the final alpha division.
    return f"""
    WITH {_ann_sql(dialect)},
    units AS (
      SELECT doc_id, label, COUNT(*) AS n_uc
      FROM annotations GROUP BY doc_id, label
    ),
    per_unit AS (
      SELECT doc_id, SUM(n_uc) AS m_u, SUM(n_uc * n_uc) AS ssq
      FROM units GROUP BY doc_id
    ),
    do_parts AS (
      SELECT CAST(SUM(CASE WHEN m_u = 2 THEN 2 * (m_u * m_u - ssq)
                           ELSE (m_u * m_u - ssq) END) AS BIGINT)
               AS disagree2,
             CAST(SUM(m_u) AS BIGINT) AS n_tot,
             CAST(COUNT(*) AS BIGINT) AS n_units
      FROM per_unit WHERE m_u >= 2
    ),
    marg AS (
      SELECT CAST(SUM(cnt * cnt) AS BIGINT) AS marg_ssq FROM (
        SELECT label, SUM(n_uc) AS cnt
        FROM units u JOIN per_unit p ON p.doc_id = u.doc_id
        WHERE p.m_u >= 2 GROUP BY label
      ) t
    )
    SELECT n_units, n_tot AS n_values,
           ROUND(disagree2 / 2.0 / n_tot, 6) AS d_observed,
           ROUND((CAST(n_tot AS DOUBLE) * n_tot - marg_ssq)
                 / (CAST(n_tot AS DOUBLE) * (n_tot - 1)), 6) AS d_expected,
           ROUND(1.0 - (disagree2 / 2.0 / n_tot)
                 / ((CAST(n_tot AS DOUBLE) * n_tot - marg_ssq)
                    / (CAST(n_tot AS DOUBLE) * (n_tot - 1))), 6) AS alpha
    FROM do_parts CROSS JOIN marg
    """


@query("q379_krippendorff_alpha", oracle=_krippendorff_sql("duck"))
def q379_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha (nominal metric) over the 3-annotator table
    with 25% missing third ratings: alpha = 1 - D_o/D_e where D_o is
    the within-unit pairwise disagreement rate (each unit weighted by
    1/(m_u - 1)) and D_e the marginal-chance disagreement — the
    agreement coefficient that handles missing data, which Fleiss'
    kappa (q318) cannot. All counting is exact integer (the 2x-scaled
    disagreement trick keeps unit terms in BIGINT); doubles appear only
    in the terminal division. Scale: two keyed aggregates over a 3x
    corpus explode; everything after is a 1-row join."""
    _docs_view(spark, sf_dir)
    return spark.sql(_krippendorff_sql("spark"))


# ---------------------------------------------------------------------------
# q380 — annotator bias (label-distribution drift)


def _bias_sql(dialect: str) -> str:
    return f"""
    WITH {_ann_sql(dialect)},
    per AS (
      SELECT annotator, label, COUNT(*) AS cnt
      FROM annotations GROUP BY annotator, label
    ),
    tot AS (SELECT annotator, SUM(cnt) AS n_a FROM per GROUP BY annotator),
    pool AS (
      SELECT label, SUM(cnt) AS pcnt FROM per GROUP BY label
    ),
    pool_tot AS (SELECT SUM(pcnt) AS n FROM pool),
    diffs AS (
      SELECT p.annotator, t.n_a,
             ABS(p.cnt * 1.0 / t.n_a - pl.pcnt * 1.0 / pt.n) AS adiff
      FROM per p
      JOIN tot t ON t.annotator = p.annotator
      JOIN pool pl ON pl.label = p.label
      CROSS JOIN pool_tot pt
    )
    SELECT annotator,
           CAST(n_a AS BIGINT) AS n_labels,
           ROUND(CAST(SUM(CAST(ROUND(adiff, 9) AS DECIMAL(38,9)))
                      AS DOUBLE) / 2.0, 6) AS tv_distance
    FROM diffs GROUP BY annotator, n_a ORDER BY annotator
    """


@query("q380_annotator_bias", oracle=_bias_sql("duck"))
def q380_annotator_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-annotator label-distribution bias: total-variation distance
    between each annotator's label distribution and the pooled
    distribution — the screen for a rater who systematically over-uses
    a class (guideline misread, spam). Shares round to 9 dp and
    accumulate in DECIMAL (order-free). Scale: one (annotator, label)
    aggregate (15 cells), broadcast-sized joins after."""
    _docs_view(spark, sf_dir)
    return spark.sql(_bias_sql("spark"))


# ---------------------------------------------------------------------------
# q381 — pairwise Cohen's kappa matrix


def _pairwise_kappa_sql(dialect: str) -> str:
    return f"""
    WITH {_ann_sql(dialect)},
    joint AS (
      SELECT a.annotator AS ann_a, b.annotator AS ann_b,
             a.label AS la, b.label AS lb
      FROM annotations a
      JOIN annotations b
        ON b.doc_id = a.doc_id AND a.annotator < b.annotator
    ),
    pair_n AS (
      SELECT ann_a, ann_b, COUNT(*) AS n,
             SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS agree
      FROM joint GROUP BY ann_a, ann_b
    ),
    marg_a AS (
      SELECT ann_a, ann_b, la AS label, COUNT(*) AS ca
      FROM joint GROUP BY ann_a, ann_b, la
    ),
    marg_b AS (
      SELECT ann_a, ann_b, lb AS label, COUNT(*) AS cb
      FROM joint GROUP BY ann_a, ann_b, lb
    ),
    pe AS (
      SELECT ma.ann_a, ma.ann_b,
             SUM(CAST(ROUND(CAST(ma.ca AS DOUBLE) / pn.n * mb.cb / pn.n, 9)
                 AS DECIMAL(38,9))) AS p_e
      FROM marg_a ma
      JOIN marg_b mb ON mb.ann_a = ma.ann_a AND mb.ann_b = ma.ann_b
                    AND mb.label = ma.label
      JOIN pair_n pn ON pn.ann_a = ma.ann_a AND pn.ann_b = ma.ann_b
      GROUP BY ma.ann_a, ma.ann_b
    )
    SELECT pn.ann_a AS annotator_a, pn.ann_b AS annotator_b,
           CAST(pn.n AS BIGINT) AS n_joint,
           ROUND(CAST(pn.agree AS DOUBLE) / pn.n, 6) AS p_observed,
           ROUND(CAST(pe.p_e AS DOUBLE), 6) AS p_expected,
           ROUND((CAST(pn.agree AS DOUBLE) / pn.n - CAST(pe.p_e AS DOUBLE))
                 / (1.0 - CAST(pe.p_e AS DOUBLE)), 6) AS kappa
    FROM pair_n pn
    JOIN pe ON pe.ann_a = pn.ann_a AND pe.ann_b = pn.ann_b
    ORDER BY annotator_a, annotator_b
    """


@query("q381_pairwise_annotator_kappa", oracle=_pairwise_kappa_sql("duck"))
def q381_pairwise_annotator_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa for every annotator PAIR on their jointly-labeled
    docs — the matrix that localizes disagreement to a specific rater
    pair where the panel statistics (q379, q318) only say agreement is
    low overall. Expected agreement accumulates 9-dp DECIMAL over the
    5-label marginals. Scale: the doc-keyed self-join is per-doc
    bounded (panel size 3 -> <=3 pairs per doc); everything downstream
    is a 3-row table."""
    _docs_view(spark, sf_dir)
    return spark.sql(_pairwise_kappa_sql("spark"))


# ---------------------------------------------------------------------------
# q382 — item agreement patterns


def _patterns_sql(dialect: str) -> str:
    return f"""
    WITH {_ann_sql(dialect)},
    units AS (
      SELECT doc_id, label, COUNT(*) AS n_uc
      FROM annotations GROUP BY doc_id, label
    ),
    per_unit AS (
      SELECT doc_id, SUM(n_uc) AS m_u, MAX(n_uc) AS n_max
      FROM units GROUP BY doc_id
    )
    SELECT CAST(m_u AS BIGINT) AS panel_size,
           CASE WHEN n_max = m_u THEN 'unanimous'
                WHEN n_max = 1 THEN 'split'
                ELSE 'majority' END AS pattern,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM per_unit GROUP BY 1, 2 ORDER BY 1, 2
    """


@query("q382_item_agreement_patterns", oracle=_patterns_sql("duck"))
def q382_item_agreement_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The disagreement census: every doc classified unanimous /
    majority / split from its panel's label-count multiset, by panel
    size — the integer-only difficulty readout that says how much of
    the corpus needs adjudication (split items) before training on the
    labels. Scale: two keyed aggregates, ~6 output rows."""
    _docs_view(spark, sf_dir)
    return spark.sql(_patterns_sql("spark"))


# ---------------------------------------------------------------------------
# q383 — leave-one-out consensus accuracy


def _loo_sql(dialect: str) -> str:
    return f"""
    WITH {_ann_sql(dialect)},
    units AS (
      SELECT doc_id, label, COUNT(*) AS n_uc
      FROM annotations GROUP BY doc_id, label
    ),
    per_unit AS (
      SELECT doc_id, SUM(n_uc) AS m_u FROM units GROUP BY doc_id
    ),
    -- for each annotation, the strict-majority label of the OTHERS:
    -- candidate labels are the unit's labels with own vote removed
    loo AS (
      SELECT a.doc_id, a.annotator, a.label AS own,
             p.m_u - 1 AS n_others,
             MAX(CASE WHEN u.n_uc
                        - (CASE WHEN u.label = a.label THEN 1 ELSE 0 END)
                        > (p.m_u - 1) / 2.0
                      THEN u.label END) AS consensus
      FROM annotations a
      JOIN per_unit p ON p.doc_id = a.doc_id
      JOIN units u ON u.doc_id = a.doc_id
      WHERE p.m_u >= 2
      GROUP BY a.doc_id, a.annotator, a.label, p.m_u
    )
    SELECT annotator,
           CAST(COUNT(*) AS BIGINT) AS n_rated,
           CAST(SUM(CASE WHEN consensus IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_evaluable,
           ROUND(CAST(SUM(CASE WHEN own = consensus THEN 1 ELSE 0 END) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN consensus IS NOT NULL
                                   THEN 1 ELSE 0 END), 0), 6)
             AS loo_accuracy
    FROM loo GROUP BY annotator ORDER BY annotator
    """


@query("q383_loo_consensus_accuracy", oracle=_loo_sql("duck"))
def q383_loo_consensus_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out annotator accuracy: each rating is scored against
    the STRICT MAJORITY of the other panel members (ties -> item not
    evaluable for that rater) — the annotator-quality score that never
    lets a rater's own vote confirm itself, unlike accuracy-vs-majority
    (q317's consensus includes the voter). At most one label can hold a
    strict majority, so the MAX-over-CASE selection is exact. Scale:
    one bounded per-doc join (panel <= 3), one 3-row rollup."""
    _docs_view(spark, sf_dir)
    return spark.sql(_loo_sql("spark"))


# ---------------------------------------------------------------------------
# q384 — slice error rate vs known truth


def _slice_sql(dialect: str) -> str:
    return f"""
    WITH {_ann_sql(dialect)}
    SELECT lang, annotator,
           CAST(COUNT(*) AS BIGINT) AS n_rated,
           CAST(SUM(CASE WHEN label <> lang THEN 1 ELSE 0 END) AS BIGINT)
             AS n_wrong,
           ROUND(CAST(SUM(CASE WHEN label <> lang THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS error_rate
    FROM annotations GROUP BY lang, annotator ORDER BY lang, annotator
    """


@query("q384_slice_error_rate", oracle=_slice_sql("duck"))
def q384_slice_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation error rate per (true-lang, annotator) slice — with
    the document's declared language as gold, the audit that localizes
    label noise to a slice (a language a rater can't judge, a guideline
    that fails on one class) rather than one global error number.
    Scale: map-only explode into one 15-cell aggregate."""
    _docs_view(spark, sf_dir)
    return spark.sql(_slice_sql("spark"))
