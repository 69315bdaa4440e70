"""Pipeline batch 51 (q350): the end-to-end curation funnel — the
single query a data-curation team actually looks at: every gate the
corpus passes through (exact dedup, normalized dedup, quality
thresholds, language-consistency, per-language length band), with
the surviving-document count and per-stage drop. Each stage is the
registry's own primitive re-expressed inline (q28 exact dedup, q35
quality features, q34 langid, q65 length band), so the funnel is the
composition proof that the pieces fit together.

Determinism: stage predicates are exact-integer ratios against
literal thresholds; dedup keeps min doc_id; the length band uses
percent_rank (tie-stable); counts are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query
from .textops import _LANG_VALUES


@query(
    "q350_curation_funnel",
    oracle=f"""
    WITH s0 AS (SELECT doc_id, text, lang FROM documents),
    s1 AS (  -- exact dedup: keep min doc_id per raw hash
      SELECT doc_id, text, lang FROM (
        SELECT doc_id, text, lang,
               ROW_NUMBER() OVER (PARTITION BY md5(text)
                                  ORDER BY doc_id) AS rn
        FROM s0
      ) WHERE rn = 1
    ),
    s2 AS (  -- normalized dedup: lower + collapsed whitespace
      SELECT doc_id, text, lang FROM (
        SELECT doc_id, text, lang,
               ROW_NUMBER() OVER (
                 PARTITION BY md5(regexp_replace(lower(text), ' +', ' ', 'g'))
                 ORDER BY doc_id) AS rn
        FROM s1
      ) WHERE rn = 1
    ),
    s3 AS (  -- quality gate: enough tokens, some stopword signal
      SELECT doc_id, text, lang FROM s2
      WHERE len(string_split(text, ' ')) >= 20
        AND len(list_filter(string_split(text, ' '),
                t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
            / len(string_split(text, ' ')) >= 0.02
    ),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM s3
    ),
    stop(slang, w) AS (VALUES {_LANG_VALUES}),
    pred AS (
      SELECT doc_id, slang,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY COUNT(*) DESC, slang) AS rn
      FROM toks JOIN stop ON w = tok GROUP BY doc_id, slang
    ),
    s4 AS (  -- language consistency: declared == predicted
      SELECT s3.doc_id, s3.text, s3.lang
      FROM s3 JOIN pred ON pred.doc_id = s3.doc_id AND pred.rn = 1
      WHERE pred.slang = s3.lang
    ),
    s5 AS (  -- per-language length band [p5, p95]
      SELECT doc_id FROM (
        SELECT doc_id,
               PERCENT_RANK() OVER (PARTITION BY lang
                                    ORDER BY length(text), doc_id) AS pr
        FROM s4
      ) WHERE pr >= 0.05 AND pr <= 0.95
    ),
    funnel AS (
      SELECT 1 AS stage_no, 'a_raw' AS stage,
             (SELECT COUNT(*) FROM s0) AS n
      UNION ALL SELECT 2, 'b_exact_dedup', (SELECT COUNT(*) FROM s1)
      UNION ALL SELECT 3, 'c_norm_dedup', (SELECT COUNT(*) FROM s2)
      UNION ALL SELECT 4, 'd_quality', (SELECT COUNT(*) FROM s3)
      UNION ALL SELECT 5, 'e_lang_consistent', (SELECT COUNT(*) FROM s4)
      UNION ALL SELECT 6, 'f_length_band', (SELECT COUNT(*) FROM s5)
    )
    SELECT stage, CAST(n AS BIGINT) AS n_surviving,
           CAST(COALESCE(LAG(n) OVER (ORDER BY stage_no) - n, 0) AS BIGINT)
             AS n_dropped
    FROM funnel ORDER BY stage
    """,
)
def q350_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel: raw corpus -> exact dedup (min doc_id per
    raw md5) -> normalized dedup (lowercased, whitespace-collapsed)
    -> quality gate (>= 20 tokens, stopword ratio >= 0.02) ->
    language consistency (declared == stopword-argmax prediction) ->
    per-language [p5, p95] length band. One DataFrame DAG reports
    every stage's survivor count and drop — the end-to-end
    composition of q28/q35/q34/q65 a pipeline runs nightly, checked
    as one artifact. Scale: each dedup is a hash-partitioned window
    (one shuffle each); the langid stage is the q34 broadcast plan;
    stage counts reuse one lazy DAG (Catalyst subplan reuse), and
    the 6-row funnel assembles with a tiny ordered lag."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    s0 = docs

    def keep_first(df: DataFrame, key) -> DataFrame:
        w = W.partitionBy(key).orderBy("doc_id")
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    s1 = keep_first(s0, F.md5("text"))
    s2 = keep_first(
        s1, F.md5(F.regexp_replace(F.lower("text"), " +", " "))
    )
    toks_arr = F.split(F.col("text"), " ")
    stop_ratio = (
        F.size(F.filter(toks_arr, lambda t: t.isin("the", "a", "of", "and")))
        * 1.0
        / F.size(toks_arr)
    )
    s3 = s2.filter((F.size(toks_arr) >= 20) & (stop_ratio >= 0.02))
    # language consistency via the q34 stopword-argmax classifier
    from .textops import _LANG_STOPWORDS

    toks = s3.select("doc_id", F.explode(toks_arr).alias("tok"))
    stop = spark.createDataFrame(_LANG_STOPWORDS, ["slang", "w"])
    scores = (
        toks.join(F.broadcast(stop), toks.tok == stop.w)
        .groupBy("doc_id", "slang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    wp = W.partitionBy("doc_id").orderBy(
        F.col("hits").desc(), F.col("slang").asc()
    )
    pred = (
        scores.withColumn("rn", F.row_number().over(wp))
        .filter(F.col("rn") == 1)
        .select("doc_id", "slang")
    )
    s4 = s3.join(pred, "doc_id").filter(
        F.col("slang") == F.col("lang")
    ).drop("slang")
    wl = W.partitionBy("lang").orderBy(F.length("text"), "doc_id")
    s5 = (
        s4.withColumn("pr", F.percent_rank().over(wl))
        .filter((F.col("pr") >= 0.05) & (F.col("pr") <= 0.95))
        .select("doc_id")
    )
    stages = [
        ("a_raw", 1, s0),
        ("b_exact_dedup", 2, s1),
        ("c_norm_dedup", 3, s2),
        ("d_quality", 4, s3),
        ("e_lang_consistent", 5, s4),
        ("f_length_band", 6, s5),
    ]
    funnel = None
    for name, no, df in stages:
        row = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(no).alias("stage_no"), F.lit(name).alias("stage"), "n"
        )
        funnel = row if funnel is None else funnel.unionByName(row)
    wlag = W.orderBy("stage_no")
    return (
        funnel.withColumn(
            "n_dropped",
            F.coalesce(F.lag("n").over(wlag) - F.col("n"), F.lit(0)).cast(
                "bigint"
            ),
        )
        .select(
            "stage", F.col("n").cast("bigint").alias("n_surviving"), "n_dropped"
        )
        .orderBy("stage")
    )
