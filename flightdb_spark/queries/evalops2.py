"""Eval batch 28 (q288-q289): "eventually-precedes" sequential
patterns (the sequence-mining step beyond q100's adjacent
transitions) and the multiclass precision/recall/F1 battery over the
q34 stopword language classifier (macro and micro averaging — the
eval table beside q219's binary confusion metrics).

Determinism: precedence compares exact first-occurrence timestamps
on a total order; P/R/F1 are per-class doubles assembled once from
integer confusion counts, with 0/0 classes pinned to 0.0 (the
sklearn zero_division=0 convention) via NULLIF + COALESCE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .textops import _LANG_VALUES, _LANG_STOPWORDS


# ---------------------------------------------------------------------------
# q288 — eventually-precedes sequential patterns


@query(
    "q288_eventually_precedes",
    oracle="""
    WITH firsts AS (
      SELECT user_id, event_type, MIN(ts) AS first_ts
      FROM events GROUP BY user_id, event_type
    ),
    pairs AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             CASE WHEN a.first_ts < b.first_ts THEN 1 ELSE 0 END AS ordered_ok
      FROM firsts a JOIN firsts b
        ON a.user_id = b.user_id AND a.event_type <> b.event_type
    )
    SELECT antecedent, consequent,
           CAST(COUNT(*) AS BIGINT) AS n_users_with_both,
           CAST(SUM(ordered_ok) AS BIGINT) AS n_ordered,
           ROUND(SUM(ordered_ok) * 1.0 / COUNT(*), 6) AS precedence_rate
    FROM pairs
    GROUP BY antecedent, consequent
    ORDER BY antecedent, consequent
    """,
)
def q288_eventually_precedes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eventually-precedes sequential patterns: for every ordered pair
    of event types, among users who performed BOTH, how often did the
    first occurrence of A come before the first occurrence of B —
    sequence mining's 2-pattern support, and the causal-ordering
    sanity check q100's adjacent-transition matrix cannot answer
    (A->...->B with anything between still counts here).

    Plan: one shuffle to (user, type) first timestamps (25 rows per
    user max); the pair comparison is a co-partitioned self-join on
    the user key; the rollup keys on 20 ordered type pairs. First
    timestamps are exact micros — ties (same instant) count as NOT
    preceded on both engines."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    firsts = ev.groupBy("user_id", "event_type").agg(F.min("ts").alias("first_ts"))
    a = firsts.select(
        "user_id",
        F.col("event_type").alias("antecedent"),
        F.col("first_ts").alias("ts_a"),
    )
    b = firsts.select(
        F.col("user_id").alias("ub"),
        F.col("event_type").alias("consequent"),
        F.col("first_ts").alias("ts_b"),
    )
    pairs = a.join(
        b,
        (F.col("user_id") == F.col("ub"))
        & (F.col("antecedent") != F.col("consequent")),
    ).select(
        "antecedent",
        "consequent",
        F.when(F.col("ts_a") < F.col("ts_b"), 1).otherwise(0).alias("ordered_ok"),
    )
    return (
        pairs.groupBy("antecedent", "consequent")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users_with_both"),
            F.sum("ordered_ok").cast("bigint").alias("n_ordered"),
            F.round(F.sum("ordered_ok") * 1.0 / F.count(F.lit(1)), 6).alias(
                "precedence_rate"
            ),
        )
        .orderBy("antecedent", "consequent")
    )


# ---------------------------------------------------------------------------
# q289 — multiclass precision/recall/F1


@query(
    "q289_multiclass_prf",
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
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang) AS rn
      FROM scores
    ),
    preds AS (
      SELECT d.doc_id, d.lang AS label, COALESCE(r.lang, 'und') AS pred
      FROM documents d LEFT JOIN ranked r ON r.doc_id = d.doc_id AND r.rn = 1
    ),
    classes AS (
      SELECT lang AS cls FROM (
        SELECT label AS lang FROM preds UNION SELECT pred AS lang FROM preds
      ) GROUP BY lang
    ),
    counts AS (
      SELECT c.cls,
             CAST(SUM(CASE WHEN p.pred = c.cls AND p.label = c.cls
                      THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN p.pred = c.cls AND p.label <> c.cls
                      THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN p.pred <> c.cls AND p.label = c.cls
                      THEN 1 ELSE 0 END) AS BIGINT) AS fn
      FROM classes c CROSS JOIN preds p
      GROUP BY c.cls
    )
    SELECT cls, tp, fp, fn,
           ROUND(COALESCE(tp * 1.0 / NULLIF(tp + fp, 0), 0.0), 6) AS precision_,
           ROUND(COALESCE(tp * 1.0 / NULLIF(tp + fn, 0), 0.0), 6) AS recall_,
           ROUND(COALESCE(2.0 * tp / NULLIF(2 * tp + fp + fn, 0), 0.0), 6) AS f1
    FROM counts
    ORDER BY cls
    """,
)
def q289_multiclass_prf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass precision / recall / F1 over the q34 stopword
    language classifier, one row per class in the union of labels and
    predictions ('und' included — abstentions show up as a
    zero-recall class, exactly what the eval table should surface).
    F1 uses the 2tp/(2tp+fp+fn) form (no intermediate P/R rounding);
    0/0 cells pin to 0.0, the sklearn zero_division=0 convention.
    Macro-F1 is the column mean; micro-F1 over these single-label
    rows equals accuracy — both derivable from this table, so the
    query ships the per-class grain.

    Plan: the classifier is q34's shape (tokens x broadcast stopword
    dim, doc-partitioned argmax); the confusion counts come from one
    class x prediction pass — classes is a <=6-row broadcast, so the
    cross join is a flat-map, not a blow-up; the final table is
    class-bounded."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    stop = docs.sparkSession.createDataFrame(_LANG_STOPWORDS, ["slang", "w"])
    scores = (
        toks.join(F.broadcast(stop), F.col("tok") == F.col("w"))
        .groupBy("doc_id", "slang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.col("slang"))
    best = (
        scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("slang").alias("pred_raw"))
    )
    preds = docs.select("doc_id", F.col("lang").alias("label")).join(
        best, "doc_id", "left"
    ).select("label", F.coalesce("pred_raw", F.lit("und")).alias("pred"))
    classes = (
        preds.select(F.col("label").alias("cls"))
        .unionByName(preds.select(F.col("pred").alias("cls")))
        .distinct()
    )
    joined = preds.join(F.broadcast(classes))
    counts = joined.groupBy("cls").agg(
        F.sum(
            F.when((F.col("pred") == F.col("cls")) & (F.col("label") == F.col("cls")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
        F.sum(
            F.when((F.col("pred") == F.col("cls")) & (F.col("label") != F.col("cls")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("fp"),
        F.sum(
            F.when((F.col("pred") != F.col("cls")) & (F.col("label") == F.col("cls")), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("fn"),
    )
    prec = F.coalesce(
        F.col("tp") * 1.0 / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)), F.lit(0.0)
    )
    rec = F.coalesce(
        F.col("tp") * 1.0 / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)), F.lit(0.0)
    )
    f1 = F.coalesce(
        2.0 * F.col("tp") / F.nullif(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)),
        F.lit(0.0),
    )
    return counts.select(
        "cls",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision_"),
        F.round(rec, 6).alias("recall_"),
        F.round(f1, 6).alias("f1"),
    ).orderBy("cls")
