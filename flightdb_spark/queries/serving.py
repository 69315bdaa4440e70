"""Serving-analytics batch 62 (q377-q378): the code-switching audit
(documents whose declared language carries another language's
stopwords — the mixed-language contamination a monolingual training
split must catch) and prefix-sharing analysis (common-token-prefix
depth between consecutive prompts — the statistic that predicts
LLM-serving prefix-cache hit rates and the batching win from prompt
dedup).

Determinism: stopword hits are exact counts against the q34
dimension; prefix depths are exact integer positions from the same
zip/compare expression on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query
from .textops import _LANG_STOPWORDS, _LANG_VALUES

# ---------------------------------------------------------------------------
# q377 — code-switching audit


@query(
    "q377_code_switching",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    stop(slang, w) AS (VALUES {_LANG_VALUES}),
    hits AS (
      SELECT t.doc_id, t.lang,
             CAST(SUM(CASE WHEN s.slang = t.lang THEN 1 ELSE 0 END)
               AS BIGINT) AS own_hits,
             CAST(SUM(CASE WHEN s.slang <> t.lang THEN 1 ELSE 0 END)
               AS BIGINT) AS foreign_hits
      FROM toks t JOIN stop s ON s.w = t.tok
      GROUP BY t.doc_id, t.lang
    ),
    docs AS (
      SELECT d.lang,
             COALESCE(h.own_hits, 0) AS own_hits,
             COALESCE(h.foreign_hits, 0) AS foreign_hits
      FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN foreign_hits > 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_mixed,
           ROUND(SUM(CASE WHEN foreign_hits > 0 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS mixed_rate,
           ROUND(SUM(foreign_hits) * 1.0
                 / NULLIF(SUM(own_hits + foreign_hits), 0), 6)
             AS foreign_hit_share
    FROM docs GROUP BY lang ORDER BY lang
    """,
)
def q377_code_switching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching audit: per declared language, how many documents
    contain ANOTHER language's stopwords (the q34 dimension), and
    what share of all stopword mass is foreign — the mixed-language
    contamination check a monolingual split runs after langid (q34
    assigns a single label; this measures how impure the winner is).
    Scale: one explode + broadcast stopword join (the q34 plan) into
    a per-doc aggregate, then a 5-key rollup."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    stop = spark.createDataFrame(_LANG_STOPWORDS, ["slang", "w"])
    hits = (
        toks.join(F.broadcast(stop), toks.tok == stop.w)
        .groupBy("doc_id", "lang")
        .agg(
            F.sum(
                F.when(F.col("slang") == F.col("lang"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("own_hits"),
            F.sum(
                F.when(F.col("slang") != F.col("lang"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("foreign_hits"),
        )
    )
    full = docs.select("doc_id", "lang").join(
        hits.select("doc_id", "own_hits", "foreign_hits"), "doc_id", "left"
    ).select(
        "lang",
        F.coalesce(F.col("own_hits"), F.lit(0)).alias("own_hits"),
        F.coalesce(F.col("foreign_hits"), F.lit(0)).alias("foreign_hits"),
    )
    mixed = F.when(F.col("foreign_hits") > 0, 1).otherwise(0)
    return (
        full.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(mixed).cast("bigint").alias("n_mixed"),
            F.round(F.sum(mixed) * 1.0 / F.count(F.lit(1)), 6).alias(
                "mixed_rate"
            ),
            F.round(
                F.sum("foreign_hits")
                * 1.0
                / F.nullif(
                    F.sum(F.col("own_hits") + F.col("foreign_hits")),
                    F.lit(0),
                ),
                6,
            ).alias("foreign_hit_share"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q378 — prefix-sharing (prefix-cache) analysis

PREFIX_CAP = 32


@query(
    "q378_prefix_sharing",
    oracle=f"""
    WITH prompts AS (
      SELECT doc_id, source,
             list_slice(string_split(text, ' '), 1, {PREFIX_CAP}) AS toks
      FROM documents
    ),
    paired AS (
      SELECT source, toks,
             LAG(toks) OVER (PARTITION BY source ORDER BY doc_id) AS prev
      FROM prompts
    ),
    depths AS (
      SELECT source,
             LEAST(len(toks), len(prev)) AS min_len,
             COALESCE(
               list_position(
                 list_transform(range(1, LEAST(len(toks), len(prev)) + 1),
                   i -> toks[i] = prev[i]),
                 false) - 1,
               LEAST(len(toks), len(prev))) AS shared_prefix
      FROM paired WHERE prev IS NOT NULL
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(AVG(CAST(shared_prefix AS DOUBLE)), 6)
             AS avg_shared_prefix,
           CAST(MAX(shared_prefix) AS BIGINT) AS max_shared_prefix,
           ROUND(SUM(shared_prefix) * 1.0 / SUM(min_len), 6)
             AS cacheable_token_frac
    FROM depths GROUP BY source ORDER BY source
    """,
)
def q378_prefix_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-sharing analysis: treating documents as prompts arriving
    per source in doc_id order, the shared-token-prefix depth between
    consecutive prompts (capped at {PREFIX_CAP} tokens) and the
    fraction of token mass a prefix cache could reuse — the statistic
    that sizes an LLM-serving KV prefix cache and predicts its hit
    rate (q59/q123 pack tokens for TRAINING; this analyzes reuse for
    SERVING). Prefix depth = position of the first mismatch in the
    zipped equality list, identical expression both engines. Scale:
    one source-partitioned lag carries the previous prompt; depth is
    an in-row array fold; 20-key rollup."""
    docs = load_table(spark, sf_dir, "documents")
    prompts = docs.select(
        "doc_id",
        "source",
        F.slice(F.split("text", " "), 1, PREFIX_CAP).alias("toks"),
    )
    w = W.partitionBy("source").orderBy("doc_id")
    paired = prompts.withColumn("prev", F.lag("toks").over(w)).filter(
        F.col("prev").isNotNull()
    )
    min_len = F.least(F.size("toks"), F.size("prev"))
    eq_list = F.expr(
        "transform(sequence(1, least(size(toks), size(prev))), "
        "i -> element_at(toks, i) = element_at(prev, i))"
    )
    pos = F.array_position(eq_list, F.lit(False))
    shared = F.when(pos > 0, pos - 1).otherwise(min_len)
    depths = paired.select(
        "source", min_len.alias("min_len"), shared.alias("shared_prefix")
    )
    return (
        depths.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(
                F.avg(F.col("shared_prefix").cast("double")), 6
            ).alias("avg_shared_prefix"),
            F.max("shared_prefix").cast("bigint").alias("max_shared_prefix"),
            F.round(
                F.sum("shared_prefix") * 1.0 / F.sum("min_len"), 6
            ).alias("cacheable_token_frac"),
        )
        .orderBy("source")
    )
