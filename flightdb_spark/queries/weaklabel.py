"""Weak-supervision batch 39 (q316-q318): the Snorkel-style labeling
pipeline — three heuristic labeling functions (LFs) vote
high/low-quality on every document with abstention, and the pipeline
reports the three diagnostics that decide whether weak labels are
usable: per-LF coverage/overlap/conflict (q316), the majority-vote
label table (q317), and Fleiss' kappa among the LFs (q318 — the
multi-rater extension of q302's Cohen kappa).

The LFs are deterministic threshold rules over q35's quality
features (stopword ratio, average token length, distinct-token
ratio), each abstaining in its uncertainty band — real labeling
functions in miniature: partial coverage, correlated votes,
genuine conflicts.

Determinism: features are exact-integer ratios in IEEE double
(identical on both engines), thresholds are literals, and every
statistic reduces to exact integer counts divided once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

# Shared LF vote construction. Votes: 1 = high quality, 0 = low,
# NULL = abstain.
_VOTES_SQL = """
    feats AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
               / len(string_split(text, ' ')) AS stop_ratio,
             (length(text) - len(string_split(text, ' ')) + 1.0)
               / len(string_split(text, ' ')) AS avg_len,
             len(list_distinct(string_split(text, ' '))) * 1.0
               / len(string_split(text, ' ')) AS dr
      FROM documents
    ),
    votes AS (
      SELECT doc_id,
             CASE WHEN stop_ratio >= 0.08 THEN 1
                  WHEN stop_ratio <= 0.03 THEN 0 END AS lf1,
             CASE WHEN avg_len <= 4.35 THEN 1
                  WHEN avg_len >= 4.65 THEN 0 END AS lf2,
             CASE WHEN dr >= 0.52 THEN 1
                  WHEN dr <= 0.40 THEN 0 END AS lf3
      FROM feats
    )
"""


def _votes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))) * 1.0
        / F.size(toks)
    )
    avg_len = (F.length("text") - F.size(toks) + 1.0) / F.size(toks)
    dr = F.size(F.array_distinct(toks)) * 1.0 / F.size(toks)
    return docs.select(
        "doc_id",
        F.when(stop_ratio >= 0.08, 1).when(stop_ratio <= 0.03, 0).alias("lf1"),
        F.when(avg_len <= 4.35, 1).when(avg_len >= 4.65, 0).alias("lf2"),
        F.when(dr >= 0.52, 1).when(dr <= 0.40, 0).alias("lf3"),
    )


# ---------------------------------------------------------------------------
# q316 — per-LF coverage / overlap / conflict


@query(
    "q316_labeling_function_stats",
    oracle=f"""
    WITH {_VOTES_SQL},
    long AS (
      SELECT doc_id, 'lf1' AS lf, lf1 AS vote,
             CASE WHEN lf2 IS NOT NULL OR lf3 IS NOT NULL THEN 1 ELSE 0 END
               AS other_votes,
             CASE WHEN (lf2 IS NOT NULL AND lf2 <> lf1)
                    OR (lf3 IS NOT NULL AND lf3 <> lf1) THEN 1 ELSE 0 END
               AS disagrees
      FROM votes
      UNION ALL
      SELECT doc_id, 'lf2', lf2,
             CASE WHEN lf1 IS NOT NULL OR lf3 IS NOT NULL THEN 1 ELSE 0 END,
             CASE WHEN (lf1 IS NOT NULL AND lf1 <> lf2)
                    OR (lf3 IS NOT NULL AND lf3 <> lf2) THEN 1 ELSE 0 END
      FROM votes
      UNION ALL
      SELECT doc_id, 'lf3', lf3,
             CASE WHEN lf1 IS NOT NULL OR lf2 IS NOT NULL THEN 1 ELSE 0 END,
             CASE WHEN (lf1 IS NOT NULL AND lf1 <> lf3)
                    OR (lf2 IS NOT NULL AND lf2 <> lf3) THEN 1 ELSE 0 END
      FROM votes
    ),
    tot AS (SELECT COUNT(*) AS n FROM documents)
    SELECT lf,
           CAST(COUNT(vote) AS BIGINT) AS n_votes,
           ROUND(COUNT(vote) * 1.0 / MAX(t.n), 6) AS coverage,
           ROUND(SUM(CASE WHEN vote IS NOT NULL THEN other_votes
                     ELSE 0 END) * 1.0 / MAX(t.n), 6) AS overlap,
           ROUND(SUM(CASE WHEN vote IS NOT NULL THEN disagrees
                     ELSE 0 END) * 1.0 / MAX(t.n), 6) AS conflict,
           ROUND(CAST(SUM(CASE WHEN vote = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(vote), 6) AS pos_rate
    FROM long, tot t
    GROUP BY lf ORDER BY lf
    """,
)
def q316_labeling_function_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Labeling-function diagnostics: for each LF, its coverage
    (fraction of the corpus it votes on), overlap (votes alongside
    at least one other LF), conflict (votes and disagrees with at
    least one other), and positive rate — the Snorkel analysis table
    read before trusting any weak-label aggregation. Scale: one
    feature projection per document (pure column expressions), an
    in-row unpivot to (doc, lf, vote) and one shuffle onto 3 keys."""
    v = _votes(spark, sf_dir)
    tot = v.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))

    def lf_rows(name: str, me: str, o1: str, o2: str) -> DataFrame:
        others_vote = F.col(o1).isNotNull() | F.col(o2).isNotNull()
        disagree = (
            F.col(o1).isNotNull() & (F.col(o1) != F.col(me))
        ) | (F.col(o2).isNotNull() & (F.col(o2) != F.col(me)))
        return v.select(
            F.lit(name).alias("lf"),
            F.col(me).alias("vote"),
            F.when(others_vote, 1).otherwise(0).alias("other_votes"),
            F.when(disagree, 1).otherwise(0).alias("disagrees"),
        )

    long = (
        lf_rows("lf1", "lf1", "lf2", "lf3")
        .unionByName(lf_rows("lf2", "lf2", "lf1", "lf3"))
        .unionByName(lf_rows("lf3", "lf3", "lf1", "lf2"))
    )
    voted = F.col("vote").isNotNull()
    return (
        long.groupBy("lf")
        .agg(
            F.count("vote").cast("bigint").alias("n_votes"),
            F.sum(F.when(voted, F.col("other_votes")).otherwise(0)).alias("_ov"),
            F.sum(F.when(voted, F.col("disagrees")).otherwise(0)).alias("_dg"),
            F.round(
                F.sum(F.when(F.col("vote") == 1, 1).otherwise(0)).cast("double")
                / F.count("vote"),
                6,
            ).alias("pos_rate"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "lf",
            "n_votes",
            F.round(F.col("n_votes") * 1.0 / F.col("nd"), 6).alias("coverage"),
            F.round(F.col("_ov") * 1.0 / F.col("nd"), 6).alias("overlap"),
            F.round(F.col("_dg") * 1.0 / F.col("nd"), 6).alias("conflict"),
            "pos_rate",
        )
        .orderBy("lf")
    )


# ---------------------------------------------------------------------------
# q317 — majority-vote aggregation


@query(
    "q317_majority_vote",
    oracle=f"""
    WITH {_VOTES_SQL},
    tallied AS (
      SELECT doc_id,
             COALESCE(CASE WHEN lf1 = 1 THEN 1 ELSE 0 END, 0)
             + COALESCE(CASE WHEN lf2 = 1 THEN 1 ELSE 0 END, 0)
             + COALESCE(CASE WHEN lf3 = 1 THEN 1 ELSE 0 END, 0) AS pos,
             COALESCE(CASE WHEN lf1 = 0 THEN 1 ELSE 0 END, 0)
             + COALESCE(CASE WHEN lf2 = 0 THEN 1 ELSE 0 END, 0)
             + COALESCE(CASE WHEN lf3 = 0 THEN 1 ELSE 0 END, 0) AS neg
      FROM votes
    ),
    labeled AS (
      SELECT doc_id, pos, neg, pos + neg AS n_votes,
             CASE WHEN pos > neg THEN 'high'
                  WHEN neg > pos THEN 'low'
                  ELSE 'abstain' END AS label
      FROM tallied
    )
    SELECT label, n_votes,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(AVG(CAST(pos AS DOUBLE)), 6) AS avg_pos_votes
    FROM labeled
    GROUP BY label, n_votes
    ORDER BY label, n_votes
    """,
)
def q317_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote weak-label aggregation: each document's final
    label is the majority of its non-abstaining LF votes (ties and
    zero votes abstain) — the baseline label model every
    weak-supervision paper compares against. Output is the
    (label, n_votes) contingency so the curator sees how much of the
    corpus is labeled at each evidence level. Scale: pure column
    arithmetic per document into a <=12-row aggregate."""
    v = _votes(spark, sf_dir)

    def is_(col: str, val: int):
        return F.when(F.col(col) == val, 1).otherwise(0)

    tallied = v.select(
        "doc_id",
        (is_("lf1", 1) + is_("lf2", 1) + is_("lf3", 1)).alias("pos"),
        (is_("lf1", 0) + is_("lf2", 0) + is_("lf3", 0)).alias("neg"),
    )
    labeled = tallied.select(
        "pos",
        (F.col("pos") + F.col("neg")).alias("n_votes"),
        F.when(F.col("pos") > F.col("neg"), "high")
        .when(F.col("neg") > F.col("pos"), "low")
        .otherwise("abstain")
        .alias("label"),
    )
    return (
        labeled.groupBy("label", "n_votes")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.avg(F.col("pos").cast("double")), 6).alias(
                "avg_pos_votes"
            ),
        )
        .orderBy("label", "n_votes")
    )


# ---------------------------------------------------------------------------
# q318 — Fleiss' kappa among the three LFs


@query(
    "q318_fleiss_kappa",
    oracle=f"""
    WITH {_VOTES_SQL},
    full3 AS (
      SELECT doc_id,
             lf1 + lf2 + lf3 AS pos
      FROM votes
      WHERE lf1 IS NOT NULL AND lf2 IS NOT NULL AND lf3 IS NOT NULL
    ),
    peri AS (
      SELECT doc_id, pos,
             pos * pos + (3 - pos) * (3 - pos) - 3 AS p_num
      FROM full3
    ),
    agg AS (
      SELECT COUNT(*) AS n,
             SUM(p_num) AS spnum,
             SUM(pos) AS spos
      FROM peri
    )
    SELECT CAST(n AS BIGINT) AS n_items,
           ROUND(spnum / (6.0 * n), 6) AS p_bar,
           ROUND(POWER(spos / (3.0 * n), 2)
                 + POWER(1 - spos / (3.0 * n), 2), 6) AS p_expected,
           ROUND((spnum / (6.0 * n) - (POWER(spos / (3.0 * n), 2)
                  + POWER(1 - spos / (3.0 * n), 2)))
                 / (1 - (POWER(spos / (3.0 * n), 2)
                  + POWER(1 - spos / (3.0 * n), 2))), 6) AS fleiss_kappa
    FROM agg
    """,
)
def q318_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa across the three labeling functions, restricted
    to documents where all three vote (fixed rater count, as Fleiss
    requires): per-item agreement P_i = (pos^2 + neg^2 - 3) / 6,
    chance agreement from the pooled category shares, kappa the
    usual chance-corrected ratio. Together with q302 (two raters)
    this covers the agreement statistics an annotation platform
    reports. Scale: column arithmetic into one global aggregate.
    The P_i numerators are summed as exact integers and divided by
    6n once at the end, so nothing inexact is ever accumulated."""
    v = _votes(spark, sf_dir)
    full3 = v.filter(
        F.col("lf1").isNotNull()
        & F.col("lf2").isNotNull()
        & F.col("lf3").isNotNull()
    ).select((F.col("lf1") + F.col("lf2") + F.col("lf3")).alias("pos"))
    peri = full3.select(
        "pos",
        (
            F.col("pos") * F.col("pos")
            + (3 - F.col("pos")) * (3 - F.col("pos"))
            - 3
        ).alias("p_num"),
    )
    agg = peri.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("p_num").alias("spnum"),
        F.sum("pos").alias("spos"),
    )
    p_bar = F.col("spnum") / (6.0 * F.col("n"))
    p_pos = F.col("spos") / (3.0 * F.col("n"))
    p_e = F.pow(p_pos, 2) + F.pow(1 - p_pos, 2)
    return agg.select(
        F.col("n").cast("bigint").alias("n_items"),
        F.round(p_bar, 6).alias("p_bar"),
        F.round(p_e, 6).alias("p_expected"),
        F.round((p_bar - p_e) / (1 - p_e), 6).alias("fleiss_kappa"),
    )
