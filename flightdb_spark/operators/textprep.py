"""Shared corpus-preparation column builders used by BOTH the registry
queries (queries/textops.py q62/q64/q69) and the pipeline stages
(pipelines.py). One definition per computation: the oracle-checked
query and the pipeline stage cannot drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# --- PII detection / redaction (q62) -----------------------------------------------
EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]+"


def inject_pii(text=None, doc_id=None):
    """Deterministic planted PII (the synthetic corpus carries none):
    emails on doc_id%10==0, phone numbers on doc_id%7==0. The oracle
    SQL mirrors this injection verbatim. Defaults resolve lazily — a
    Column cannot be built at import time in classic mode."""
    text = F.col("text") if text is None else text
    doc_id = F.col("doc_id") if doc_id is None else doc_id
    return (
        F.when(
            doc_id % 10 == 0,
            F.concat(
                text,
                F.lit(" contact user"),
                doc_id.cast("string"),
                F.lit("@example.com now"),
            ),
        )
        .when(
            doc_id % 7 == 0,
            F.concat(
                text,
                F.lit(" call 415-555-0"),
                (doc_id % 100).cast("string"),
                F.lit(" today"),
            ),
        )
        .otherwise(text)
    )


def redact_pii(text):
    """Replace emails then phones with typed placeholder tokens."""
    return F.regexp_replace(
        F.regexp_replace(text, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


# --- hash-stable train/val/test split (q64) ----------------------------------------
SPLIT_BUCKET_SPARK = (
    "cast(conv(substring(md5(cast(doc_id as string)),1,4),16,10) as bigint)"
)
TRAIN_CUT = 52429  # ~0.80 * 65536
VAL_CUT = 58982  # ~0.90 * 65536


def split_col():
    """'train'/'val'/'test' from a 16-bit content-hash bucket of the
    doc key — stable across runs, engines and reshuffles."""
    bucket = F.expr(SPLIT_BUCKET_SPARK)
    return (
        F.when(bucket < TRAIN_CUT, "train")
        .when(bucket < VAL_CUT, "val")
        .otherwise("test")
    )


# --- corpus-trained bigram LM score (q69) ------------------------------------------
def _bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    tk = F.split(text_col, " ")
    return (
        docs.select(F.col(id_col).alias("doc_id"), tk.alias("tk"))
        .filter(F.size("tk") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(tk) - 1), "
                    "i -> struct(tk[i - 1] AS w1, tk[i] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_avg_logp(docs: DataFrame, *, text_col: str = "text",
                    id_col: str = "doc_id", train: DataFrame | None = None) -> DataFrame:
    """(doc_id, n_bigrams, avg_logp): add-one smoothed log P(w2|w1)
    averaged per doc. The LM trains on ``train`` (default: ``docs``
    itself — q69 / the pipeline fluency gate); pass a different corpus
    for held-out scoring (q102): bigrams absent from training back off
    to the +1 smoothing mass via LEFT joins (c12/c1 -> 0). Per-bigram
    logp rounds to 7 dp before an exact DECIMAL accumulation and the
    final average rounds to 5 dp — the term rounding is deliberately
    TWO decimals finer than the output rounding, so a one-ulp engine
    difference in ln() that flips a term's last digit (observed at
    sf0.1) shifts the average by ~1e-7/n, far inside the 5e-6 output
    half-window (DETERMINISM.md §5)."""
    score_bg = _bigrams(docs, text_col, id_col)
    train_bg = score_bg if train is None else _bigrams(train, text_col, id_col)
    bg_counts = train_bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ug_counts = train_bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = train_bg.agg(F.countDistinct("w1").alias("v")).withColumn("_k", F.lit(1))
    scored = (
        score_bg.join(bg_counts, ["w1", "w2"], "left")
        .join(ug_counts, ["w1"], "left")
        .withColumn("_k", F.lit(1))
        .join(F.broadcast(vocab), "_k")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce(F.col("c12"), F.lit(0)) + 1.0)
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                ),
                7,
            ).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(
            F.sum(F.col("logp").cast("decimal(38,7)")).cast("double")
            / F.count(F.lit(1)),
            5,
        ).alias("avg_logp"),
    )
