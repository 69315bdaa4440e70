"""Weak-supervision / label-model batch 83 (q481-q485) — what a
labeling operation runs AFTER q379-q384's agreement audits: actually
modeling annotator quality and aggregating labels better than
majority vote. The synthetic panel plants 5 annotators of KNOWN
descending quality (annotator a is hash-correct on (10-a)/10 of
items), so the estimators have real structure to recover:

- q481 Dawid-Skene annotator quality: two unrolled hard-EM rounds
  (Dawid & Skene 1979, classification-EM variant — the E-step takes
  an argmax instead of a softmax, so no runtime exp) estimate each
  annotator's confusion; reported against ground truth;
- q482 label-model comparison: corpus accuracy of majority vote vs
  the 2-round DS labels vs truth, with improved/degraded counts;
- q483 annotation-budget curve: majority-vote accuracy with the
  first 1 / 3 / 5 annotators — the marginal value of each label;
- q484 item difficulty: per-item disagreement score vs majority-vote
  error rate — the "hard items are wrong items" table that routes
  re-annotation;
- q485 confusion-matrix recovery: the pooled empirical (true x label)
  confusion of the worst annotator vs the DS round-2 estimate of the
  same matrix, with the L1 recovery error.

Determinism: annotations are md5-derived; confusion estimates are
exact rationals with Laplace 0.5 smoothing ((c+0.5)/(ct+2.5) — exact
halves are exact doubles); E-step scores sum 9-dp-rounded ln terms in
DECIMAL and rank on the 6-dp-rounded total with a label tie-break
(rules 4/5); everything else is integer counting.

100 TB shapes: the panel explode is 5x the corpus, map-only; both EM
rounds aggregate to (annotator x class x class) = 125-cell tables
broadcast back; the E-step is one (doc, class) aggregate per round —
two keyed shuffles per round, state bounded by the confusion grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_LANGS = "'de', 'en', 'es', 'fr', 'zh'"
N_ANN = 5


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _ann_sql(dialect: str) -> str:
    """5 annotators, annotator a correct on (10-a)/10 of items, else a
    hash-picked language — identical md5-derived table on both engines."""
    if dialect == "spark":
        h = (
            "CAST(conv(substring(md5(CAST(doc_id AS STRING) || '_dsq_' || "
            "CAST(a AS STRING)), 1, 4), 16, 10) AS BIGINT)"
        )
        pick = f"element_at(array({_LANGS}), CAST(h % 5 + 1 AS INT))"
        expl = "(SELECT explode(array(1, 2, 3, 4, 5)) AS a)"
    else:
        h = (
            "(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_dsq_' || "
            "CAST(a AS VARCHAR)), 1, 4))::BIGINT)"
        )
        pick = f"([{_LANGS}])[CAST(h % 5 AS INT) + 1]"
        expl = "(SELECT unnest([1, 2, 3, 4, 5]) AS a)"
    return f"""
    hashed AS (
      SELECT doc_id, lang, a, {h} AS h
      FROM documents CROSS JOIN {expl} ann
    ),
    annotations AS (
      SELECT doc_id, lang, a AS annotator,
             CASE WHEN h % 10 < 10 - a THEN lang ELSE {pick} END AS label
      FROM hashed
    )"""


def _classes(dialect: str) -> str:
    if dialect == "spark":
        return f"(SELECT explode(array({_LANGS})) AS c)"
    return f"(SELECT unnest([{_LANGS}]) AS c)"


def _ds_sql(dialect: str) -> str:
    """Shared CTE chain: annotations -> mv (majority vote) -> two
    hard-EM rounds -> label2 (final DS labels), conf2 (round-2
    confusion estimates), prior2."""

    def m_step(i: int, src: str) -> str:
        # confusion + prior estimates from the current hard labels
        return f"""
    joined{i} AS (
      SELECT s.doc_id, s.est, ann.annotator, ann.label
      FROM {src} s JOIN annotations ann ON ann.doc_id = s.doc_id
    ),
    conf{i} AS (
      SELECT annotator, est, label, CAST(COUNT(*) AS BIGINT) AS c
      FROM joined{i} GROUP BY annotator, est, label
    ),
    conf_tot{i} AS (
      SELECT annotator, est, CAST(SUM(c) AS BIGINT) AS ct
      FROM conf{i} GROUP BY annotator, est
    ),
    theta{i} AS (
      -- Laplace 0.5 smoothing over the 5-label simplex; exact halves
      SELECT g.a AS annotator, g.est, g.label,
             (COALESCE(cf.c, 0) + CAST(0.5 AS DOUBLE))
             / (COALESCE(t.ct, 0) + CAST(2.5 AS DOUBLE)) AS th
      FROM (SELECT aa.a, ce.c AS est, cl.c AS label
            FROM (SELECT annotator AS a FROM conf{i} GROUP BY annotator) aa
            CROSS JOIN {_classes(dialect)} ce
            CROSS JOIN {_classes(dialect)} cl) g
      LEFT JOIN conf{i} cf ON cf.annotator = g.a AND cf.est = g.est
                           AND cf.label = g.label
      LEFT JOIN conf_tot{i} t ON t.annotator = g.a AND t.est = g.est
    ),
    prior{i} AS (
      SELECT est, (CAST(COUNT(*) AS BIGINT) + CAST(0.5 AS DOUBLE)) AS pn
      FROM {src} GROUP BY est
    ),
    prior_n{i} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {src})"""

    def e_step(i: int) -> str:
        # hard E-step: argmax_c [ln prior_c + sum_a ln theta_a(c, l)]
        return f"""
    scores{i} AS (
      SELECT ann.doc_id, th.est AS c,
             CAST(SUM(CAST(ROUND(LN(th.th), 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS lsum
      FROM annotations ann
      JOIN theta{i} th ON th.annotator = ann.annotator
                       AND th.label = ann.label
      GROUP BY ann.doc_id, th.est
    ),
    ranked{i} AS (
      SELECT s.doc_id, s.c,
             ROW_NUMBER() OVER (
               PARTITION BY s.doc_id
               ORDER BY ROUND(s.lsum + LN(p.pn / (n.n + CAST(2.5 AS DOUBLE))), 6)
                        DESC, s.c) AS rn
      FROM scores{i} s
      JOIN prior{i} p ON p.est = s.c
      CROSS JOIN prior_n{i} n
    ),
    label{i} AS (SELECT doc_id, c AS est FROM ranked{i} WHERE rn = 1)"""

    return f"""{_ann_sql(dialect)},
    counts AS (
      SELECT doc_id, lang, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM annotations GROUP BY doc_id, lang, label
    ),
    mv AS (
      SELECT doc_id, lang, label AS est
      FROM (SELECT doc_id, lang, label,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY n DESC, label) AS rn
            FROM counts) z
      WHERE rn = 1
    ),{m_step(1, "mv")},{e_step(1)},{m_step(2, "label1")},{e_step(2)}"""


# ---------------------------------------------------------------------------
# staged Spark side of the 2-round hard EM (guide §2.4): the
# single-statement chain re-expanded `annotations` ~6x and `label1` 3x
# under Spark CTE inlining — each expansion re-ran the corpus explode,
# the majority-vote window, and the E-step joins. Each stage now
# materializes once (localCheckpoint view); the stage SQL below is the
# exact `_ds_sql` fragment text with `{src}` swapped for the view name,
# so both engines compute identical rationals/roundings. The oracle
# keeps the one-statement form (DuckDB materializes CTEs natively).

_ANN_VIEW = "labelmodel_ann_mv"
_MV_VIEW = "labelmodel_mv_mv"
_TH1_VIEW = "labelmodel_theta1_mv"
_L1_VIEW = "labelmodel_label1_mv"
_TH2_VIEW = "labelmodel_theta2_mv"
_L2_VIEW = "labelmodel_label2_mv"


def _theta_stage_sql(src: str) -> str:
    return f"""
    WITH joined AS (
      SELECT s.doc_id, s.est, ann.annotator, ann.label
      FROM {src} s JOIN {_ANN_VIEW} ann ON ann.doc_id = s.doc_id
    ),
    conf AS (
      SELECT annotator, est, label, CAST(COUNT(*) AS BIGINT) AS c
      FROM joined GROUP BY annotator, est, label
    ),
    conf_tot AS (
      SELECT annotator, est, CAST(SUM(c) AS BIGINT) AS ct
      FROM conf GROUP BY annotator, est
    )
    SELECT g.a AS annotator, g.est, g.label,
           (COALESCE(cf.c, 0) + CAST(0.5 AS DOUBLE))
           / (COALESCE(t.ct, 0) + CAST(2.5 AS DOUBLE)) AS th
    FROM (SELECT aa.a, ce.c AS est, cl.c AS label
          FROM (SELECT annotator AS a FROM conf GROUP BY annotator) aa
          CROSS JOIN {_classes("spark")} ce
          CROSS JOIN {_classes("spark")} cl) g
    LEFT JOIN conf cf ON cf.annotator = g.a AND cf.est = g.est
                      AND cf.label = g.label
    LEFT JOIN conf_tot t ON t.annotator = g.a AND t.est = g.est
    """


def _label_stage_sql(theta: str, src: str) -> str:
    return f"""
    WITH scores AS (
      SELECT ann.doc_id, th.est AS c,
             CAST(SUM(CAST(ROUND(LN(th.th), 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS lsum
      FROM {_ANN_VIEW} ann
      JOIN {theta} th ON th.annotator = ann.annotator
                      AND th.label = ann.label
      GROUP BY ann.doc_id, th.est
    ),
    prior AS (
      SELECT est, (CAST(COUNT(*) AS BIGINT) + CAST(0.5 AS DOUBLE)) AS pn
      FROM {src} GROUP BY est
    ),
    prior_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM {src}),
    ranked AS (
      SELECT s.doc_id, s.c,
             ROW_NUMBER() OVER (
               PARTITION BY s.doc_id
               ORDER BY ROUND(s.lsum + LN(p.pn / (n.n + CAST(2.5 AS DOUBLE))), 6)
                        DESC, s.c) AS rn
      FROM scores s
      JOIN prior p ON p.est = s.c
      CROSS JOIN prior_n n
    )
    SELECT doc_id, c AS est FROM ranked WHERE rn = 1
    """


def _ds_views(spark: SparkSession, sf_dir: str) -> None:
    _docs_view(spark, sf_dir)
    ann = spark.sql(
        f"WITH {_ann_sql('spark')} "
        "SELECT doc_id, lang, annotator, label FROM annotations"
    )
    ann.localCheckpoint(eager=True).createOrReplaceTempView(_ANN_VIEW)
    mv = spark.sql(
        f"""
    WITH counts AS (
      SELECT doc_id, lang, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM {_ANN_VIEW} GROUP BY doc_id, lang, label
    )
    SELECT doc_id, lang, label AS est
    FROM (SELECT doc_id, lang, label,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                                    ORDER BY n DESC, label) AS rn
          FROM counts) z
    WHERE rn = 1
    """
    )
    mv.localCheckpoint(eager=True).createOrReplaceTempView(_MV_VIEW)
    for theta_view, src, lbl_view in (
        (_TH1_VIEW, _MV_VIEW, _L1_VIEW),
        (_TH2_VIEW, _L1_VIEW, _L2_VIEW),
    ):
        th = spark.sql(_theta_stage_sql(src))
        th.localCheckpoint(eager=True).createOrReplaceTempView(theta_view)
        lbl = spark.sql(_label_stage_sql(theta_view, src))
        lbl.localCheckpoint(eager=True).createOrReplaceTempView(lbl_view)


# ---------------------------------------------------------------------------
# q481 — Dawid-Skene annotator quality


def _dsq_sql(dialect: str) -> str:
    return f"""
    WITH {_ds_sql(dialect)}
    SELECT ann.annotator,
           CAST(COUNT(*) AS BIGINT) AS n_annotations,
           ROUND(CAST(SUM(CASE WHEN ann.label = l2.est THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS ds_agreement,
           ROUND(CAST(SUM(CASE WHEN ann.label = ann.lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS true_accuracy
    FROM annotations ann JOIN label2 l2 ON l2.doc_id = ann.doc_id
    GROUP BY ann.annotator
    """


@query("q481_dawid_skene_quality", oracle=_dsq_sql("duck"))
def q481_dawid_skene_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dawid-Skene annotator quality via two unrolled hard-EM rounds:
    each annotator's agreement with the final DS labels beside their
    TRUE accuracy (plantable only in synthetic data — the point is
    the recovered ordering matches the planted 90/80/70/60/50%
    gradient without ever seeing truth). Hard E-step = argmax over
    9-dp-rounded ln-confusion sums (no exp, no softmax, rule 5);
    M-step tables are 125-cell aggregates. Two keyed shuffles per
    round at any corpus size."""
    _ds_views(spark, sf_dir)
    return spark.sql(
        f"""
    SELECT ann.annotator,
           CAST(COUNT(*) AS BIGINT) AS n_annotations,
           ROUND(CAST(SUM(CASE WHEN ann.label = l2.est THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS ds_agreement,
           ROUND(CAST(SUM(CASE WHEN ann.label = ann.lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS true_accuracy
    FROM {_ANN_VIEW} ann JOIN {_L2_VIEW} l2 ON l2.doc_id = ann.doc_id
    GROUP BY ann.annotator
    """
    )


# ---------------------------------------------------------------------------
# q482 — label-model comparison


def _cmp_sql(dialect: str) -> str:
    return f"""
    WITH {_ds_sql(dialect)}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CASE WHEN m.est = m.lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS mv_accuracy,
           ROUND(CAST(SUM(CASE WHEN l2.est = m.lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS ds_accuracy,
           CAST(SUM(CASE WHEN l2.est = m.lang AND m.est <> m.lang
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_improved,
           CAST(SUM(CASE WHEN l2.est <> m.lang AND m.est = m.lang
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_degraded
    FROM mv m JOIN label2 l2 ON l2.doc_id = m.doc_id
    """


@query("q482_label_model_comparison", oracle=_cmp_sql("duck"))
def q482_label_model_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority vote vs 2-round Dawid-Skene against ground truth:
    corpus accuracies plus the improved/degraded flip counts — the
    evidence that annotator-quality weighting beats counting heads
    when quality varies (here planted 90%..50%). Same bounded EM
    pipeline as q481; the comparison is one co-keyed join of the two
    label tables."""
    _ds_views(spark, sf_dir)
    return spark.sql(
        f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CASE WHEN m.est = m.lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS mv_accuracy,
           ROUND(CAST(SUM(CASE WHEN l2.est = m.lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS ds_accuracy,
           CAST(SUM(CASE WHEN l2.est = m.lang AND m.est <> m.lang
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_improved,
           CAST(SUM(CASE WHEN l2.est <> m.lang AND m.est = m.lang
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_degraded
    FROM {_MV_VIEW} m JOIN {_L2_VIEW} l2 ON l2.doc_id = m.doc_id
    """
    )


# ---------------------------------------------------------------------------
# q483 — annotation budget curve


def _budget_sql(dialect: str) -> str:
    if dialect == "spark":
        grid = "(SELECT explode(array(1, 3, 5)) AS k)"
    else:
        grid = "(SELECT unnest([1, 3, 5]) AS k)"
    return f"""
    WITH {_ann_sql(dialect)},
    sub AS (
      SELECT g.k, ann.doc_id, ann.lang, ann.label
      FROM {grid} g JOIN annotations ann ON ann.annotator <= g.k
    ),
    counts AS (
      SELECT k, doc_id, lang, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM sub GROUP BY k, doc_id, lang, label
    ),
    mv_k AS (
      SELECT k, doc_id, lang, label AS est
      FROM (SELECT k, doc_id, lang, label,
                   ROW_NUMBER() OVER (PARTITION BY k, doc_id
                                      ORDER BY n DESC, label) AS rn
            FROM counts) z
      WHERE rn = 1
    )
    SELECT k AS n_annotators,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CASE WHEN est = lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS mv_accuracy
    FROM mv_k GROUP BY k
    """


@query("q483_annotation_budget", oracle=_budget_sql("duck"))
def q483_annotation_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation-budget curve: majority-vote accuracy with the first
    1 / 3 / 5 annotators — what each additional label per item buys
    (with descending annotator quality, the curve can even bend DOWN
    when the added voices are noise; this is the table that decides
    panel size). The k grid multiplies the annotation table before
    one (k, doc) aggregate — the grid rides the same scan."""
    _docs_view(spark, sf_dir)
    return spark.sql(_budget_sql("spark"))


# ---------------------------------------------------------------------------
# q484 — item difficulty vs error


def _difficulty_sql(dialect: str) -> str:
    return f"""
    WITH {_ann_sql(dialect)},
    counts AS (
      SELECT doc_id, lang, label, CAST(COUNT(*) AS BIGINT) AS n
      FROM annotations GROUP BY doc_id, lang, label
    ),
    per_doc AS (
      SELECT doc_id, lang,
             MAX(n) AS top_n, SUM(n) AS m,
             MAX(CASE WHEN rn = 1 THEN label END) AS est
      FROM (SELECT doc_id, lang, label, n,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY n DESC, label) AS rn
            FROM counts) z
      GROUP BY doc_id, lang
    )
    SELECT CAST(m - top_n AS BIGINT) AS n_dissenters,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CASE WHEN est <> lang THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS mv_error_rate
    FROM per_doc
    GROUP BY m - top_n
    """


@query("q484_item_difficulty", oracle=_difficulty_sql("duck"))
def q484_item_difficulty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item difficulty census: docs bucketed by dissenter count
    (panel size minus the winning label's votes) with the majority-
    vote error rate per bucket — the monotone hard-items-are-wrong-
    items table that routes re-annotation budget. Pure integer
    counting over the (doc, label) aggregate."""
    _docs_view(spark, sf_dir)
    return spark.sql(_difficulty_sql("spark"))


# ---------------------------------------------------------------------------
# q485 — confusion-matrix recovery


def _recovery_sql(dialect: str) -> str:
    return f"""
    WITH {_ds_sql(dialect)},
    emp AS (
      -- TRUE confusion of the worst annotator (a=5), row-normalized
      SELECT lang AS true_c, label,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM annotations WHERE annotator = {N_ANN}
      GROUP BY lang, label
    ),
    emp_tot AS (SELECT true_c, CAST(SUM(c) AS BIGINT) AS ct
                FROM emp GROUP BY true_c),
    grid AS (
      SELECT ce.c AS true_c, cl.c AS label
      FROM {_classes(dialect)} ce CROSS JOIN {_classes(dialect)} cl
    ),
    cells AS (
      SELECT g.true_c, g.label,
             CAST(COALESCE(e.c, 0) AS DOUBLE) / t.ct AS emp_rate,
             th.th AS ds_rate
      FROM grid g
      LEFT JOIN emp e ON e.true_c = g.true_c AND e.label = g.label
      JOIN emp_tot t ON t.true_c = g.true_c
      JOIN theta2 th ON th.annotator = {N_ANN} AND th.est = g.true_c
                     AND th.label = g.label
    )
    SELECT true_c, label,
           ROUND(emp_rate, 6) AS empirical_rate,
           ROUND(ds_rate, 6) AS ds_estimated_rate,
           ROUND(ABS(emp_rate - ds_rate), 6) AS abs_gap
    FROM cells
    """


@query("q485_confusion_recovery", oracle=_recovery_sql("duck"))
def q485_confusion_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion-matrix recovery: the worst annotator's TRUE pooled
    (lang x label) confusion beside Dawid-Skene's round-2 estimate of
    the same 25 cells (estimated WITHOUT seeing truth, anchored on
    the DS labels) with per-cell absolute gaps — the visual proof the
    label model learned who the weak rater confuses with whom. All
    rates are exact rationals (the DS side carries its 0.5/2.5
    smoothing by construction)."""
    _ds_views(spark, sf_dir)
    return spark.sql(
        f"""
    WITH emp AS (
      SELECT lang AS true_c, label,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM {_ANN_VIEW} WHERE annotator = {N_ANN}
      GROUP BY lang, label
    ),
    emp_tot AS (SELECT true_c, CAST(SUM(c) AS BIGINT) AS ct
                FROM emp GROUP BY true_c),
    grid AS (
      SELECT ce.c AS true_c, cl.c AS label
      FROM {_classes("spark")} ce CROSS JOIN {_classes("spark")} cl
    ),
    cells AS (
      SELECT g.true_c, g.label,
             CAST(COALESCE(e.c, 0) AS DOUBLE) / t.ct AS emp_rate,
             th.th AS ds_rate
      FROM grid g
      LEFT JOIN emp e ON e.true_c = g.true_c AND e.label = g.label
      JOIN emp_tot t ON t.true_c = g.true_c
      JOIN {_TH2_VIEW} th ON th.annotator = {N_ANN} AND th.est = g.true_c
                     AND th.label = g.label
    )
    SELECT true_c, label,
           ROUND(emp_rate, 6) AS empirical_rate,
           ROUND(ds_rate, 6) AS ds_estimated_rate,
           ROUND(ABS(emp_rate - ds_rate), 6) AS abs_gap
    FROM cells
    """
    )
