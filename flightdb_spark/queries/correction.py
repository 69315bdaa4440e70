"""Correction & estimation batch 56 (q362-q364): SymSpell-style
spell correction (delete-1 hashing joins typos to vocabulary
candidates — the scale-shaped alternative to an all-pairs edit-
distance join), randomized-response debiasing (recover a true rate
from locally-privatized answers — the local-DP estimator), and the
forecast-accuracy battery (MAPE / sMAPE / MASE against a
seasonal-naive forecast — the metrics that make q261/q268 forecasts
comparable).

Determinism: typos and response flips are planted by doc_id/user_id
hash arithmetic (the q232/q64 discipline), so detectors and
estimators are verifiable against known ground truth; error sums
accumulate in DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

TYPO_MOD = 19
VOCAB_MIN = 30

# ---------------------------------------------------------------------------
# q362 — SymSpell delete-1 correction


@query(
    "q362_symspell_correction",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks
      GROUP BY w HAVING COUNT(*) >= {VOCAB_MIN}
    ),
    -- plant one typo per selected doc: first token, 2nd char -> 'z'
    typos AS (
      SELECT doc_id,
             string_split(text, ' ')[1] AS original,
             substr(string_split(text, ' ')[1], 1, 1) || 'z'
               || substr(string_split(text, ' ')[1], 3) AS typo
      FROM documents
      WHERE doc_id % {TYPO_MOD} = 0
        AND length(string_split(text, ' ')[1]) >= 3
        AND substr(string_split(text, ' ')[1], 2, 1) <> 'z'
    ),
    vdel AS (  -- delete-1 index of the vocabulary (plus identity)
      SELECT w, del FROM (
        SELECT w, unnest(list_append(
          list_transform(range(1, length(w) + 1),
            i -> substr(w, 1, i - 1) || substr(w, i + 1)), w)) AS del
        FROM vocab
      )
    ),
    tdel AS (
      SELECT doc_id, original, typo, del FROM (
        SELECT doc_id, original, typo, unnest(list_append(
          list_transform(range(1, length(typo) + 1),
            i -> substr(typo, 1, i - 1) || substr(typo, i + 1)), typo)) AS del
        FROM typos
      )
    ),
    cands AS (
      SELECT DISTINCT t.doc_id, t.original, t.typo, v.w AS candidate
      FROM tdel t JOIN vdel v ON v.del = t.del
      WHERE levenshtein(t.typo, v.w) <= 1
    ),
    best AS (
      SELECT doc_id, original, candidate FROM (
        SELECT c.doc_id, c.original, c.candidate,
               ROW_NUMBER() OVER (PARTITION BY c.doc_id
                 ORDER BY vo.c DESC, c.candidate) AS rn
        FROM cands c JOIN vocab vo ON vo.w = c.candidate
      ) WHERE rn = 1
    )
    SELECT CAST((SELECT COUNT(*) FROM typos) AS BIGINT) AS n_typos,
           CAST(COUNT(*) AS BIGINT) AS n_with_candidate,
           CAST(SUM(CASE WHEN candidate = original THEN 1 ELSE 0 END)
             AS BIGINT) AS n_corrected,
           ROUND(SUM(CASE WHEN candidate = original THEN 1 ELSE 0 END)
                 * 1.0 / (SELECT COUNT(*) FROM typos), 6) AS correction_rate
    FROM best
    """,
)
def q362_symspell_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SymSpell correction: plant a single-character typo in every
    {TYPO_MOD}th document's first token, index the vocabulary by its
    delete-1 variants, and join typo deletes to vocab deletes — the
    hash-join formulation of edit-distance-1 lookup that never
    compares all (typo, word) pairs — then pick the most frequent
    surviving candidate. Reports how many planted typos were
    recovered exactly. Scale: the delete index multiplies the VOCAB
    (tiny) and the typo stream by ~word length, then one equi-join;
    the levenshtein check runs only on prejoined candidates."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    vocab = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .filter(F.col("c") >= VOCAB_MIN)
        .localCheckpoint()
    )
    first_tok = F.split(F.col("text"), " ")[0]
    typos = docs.filter(
        (F.col("doc_id") % TYPO_MOD == 0)
        & (F.length(first_tok) >= 3)
        & (F.substring(first_tok, 2, 1) != "z")
    ).select(
        "doc_id",
        first_tok.alias("original"),
        F.concat(
            F.substring(first_tok, 1, 1),
            F.lit("z"),
            F.expr("substr(split(text, ' ')[0], 3)"),
        ).alias("typo"),
    )
    tcnt = typos.agg(F.count(F.lit(1)).cast("bigint").alias("n_typos"))

    def deletes(col: str):
        return F.expr(
            f"array_append(transform(sequence(1, length({col})), "
            f"i -> concat(substr({col}, 1, i - 1), substr({col}, i + 1))), "
            f"{col})"
        )

    vdel = vocab.select("w", F.explode(deletes("w")).alias("del"))
    tdel = typos.select(
        "doc_id", "original", "typo", F.explode(deletes("typo")).alias("del")
    )
    cands = (
        tdel.join(vdel, "del")
        .filter(F.levenshtein(F.col("typo"), F.col("w")) <= 1)
        .select("doc_id", "original", F.col("w").alias("candidate"))
        .distinct()
    )
    wbest = W.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("candidate")
    )
    best = (
        cands.join(
            vocab.select(F.col("w").alias("candidate"), "c"), "candidate"
        )
        .withColumn("rn", F.row_number().over(wbest))
        .filter(F.col("rn") == 1)
    )
    # global agg first (exactly one row even on an empty input), THEN the
    # 1-row typo-count broadcast — keeps n_typos correct when no typo
    # finds a candidate, with no eager driver-side count.
    summed = best.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_with_candidate"),
        F.sum(F.when(F.col("candidate") == F.col("original"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_corrected"),
    )
    return summed.crossJoin(F.broadcast(tcnt)).select(
        F.col("n_typos"),
        F.col("n_with_candidate"),
        F.col("n_corrected"),
        F.round(
            F.col("n_corrected") * 1.0 / F.col("n_typos"), 6
        ).alias("correction_rate"),
    )


# ---------------------------------------------------------------------------
# q363 — randomized response debiasing

RR_FLIP_MOD = 4  # flip 1 in 4 answers (f = 0.25)
_RR_F = 1.0 / RR_FLIP_MOD


@query(
    "q363_randomized_response",
    oracle=f"""
    WITH truth AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id
    ),
    reported AS (
      SELECT user_id, converted,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 5, 4))
                       ::BIGINT % {RR_FLIP_MOD} = 0
                  THEN 1 - converted ELSE converted END AS answer
      FROM truth
    ),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(answer) AS BIGINT) AS yes,
             CAST(SUM(converted) AS BIGINT) AS true_yes
      FROM reported
    )
    SELECT n,
           ROUND(CAST(yes AS DOUBLE) / n, 6) AS observed_rate,
           ROUND((CAST(yes AS DOUBLE) / n - {_RR_F!r})
                 / (1 - 2 * {_RR_F!r}), 6) AS debiased_rate,
           ROUND(CAST(true_yes AS DOUBLE) / n, 6) AS true_rate,
           ROUND(ABS((CAST(yes AS DOUBLE) / n - {_RR_F!r})
                 / (1 - 2 * {_RR_F!r})
                 - CAST(true_yes AS DOUBLE) / n), 6) AS abs_error
    FROM agg
    """,
)
def q363_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized response (Warner's local DP): each user's
    'converted?' answer is flipped for a deterministic 1-in-
    {RR_FLIP_MOD} of users (md5-bit 'coin'), and the aggregate
    debiases the observed rate with (obs - f) / (1 - 2f) — the
    estimator that recovers population statistics nobody's
    individual answer reveals (q263 adds noise to COUNTS; this
    randomizes the MICRODATA). Because the coin is planted, the true
    rate is known and the estimator's error is reported beside it.
    Scale: one user aggregate, map-side hash coin, a 1-row
    reduction."""
    ev = load_table(spark, sf_dir, "events")
    truth = ev.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    coin = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 5, 4), 16, 10
        ).cast("bigint")
        % RR_FLIP_MOD
        == 0
    )
    reported = truth.select(
        "converted",
        F.when(coin, 1 - F.col("converted"))
        .otherwise(F.col("converted"))
        .alias("answer"),
    )
    agg = reported.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("answer").cast("bigint").alias("yes"),
        F.sum("converted").cast("bigint").alias("true_yes"),
    )
    obs = F.col("yes").cast("double") / F.col("n")
    debiased = (obs - _RR_F) / (1 - 2 * _RR_F)
    true_r = F.col("true_yes").cast("double") / F.col("n")
    return agg.select(
        "n",
        F.round(obs, 6).alias("observed_rate"),
        F.round(debiased, 6).alias("debiased_rate"),
        F.round(true_r, 6).alias("true_rate"),
        F.round(F.abs(debiased - true_r), 6).alias("abs_error"),
    )


# ---------------------------------------------------------------------------
# q364 — forecast-accuracy battery (seasonal naive)


@query(
    "q364_forecast_metrics",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2))) AS DOUBLE)
               AS y
      FROM events GROUP BY 1
    ),
    lagged AS (
      SELECT d, y,
             LAG(y, 7) OVER (ORDER BY d) AS yhat,
             LAG(y, 1) OVER (ORDER BY d) AS naive1
      FROM daily
    ),
    scored AS (
      SELECT d, y, yhat,
             ABS(y - yhat) AS ae,
             ABS(y - naive1) AS naive_ae
      FROM lagged WHERE yhat IS NOT NULL AND naive1 IS NOT NULL
    ),
    agg AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(ae, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_ae,
             CAST(SUM(CAST(ROUND(naive_ae, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS sum_naive,
             CAST(SUM(CAST(ROUND(ae / y, 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS sum_ape,
             CAST(SUM(CAST(ROUND(2 * ae / (ABS(y) + ABS(yhat)), 9)
               AS DECIMAL(38,9))) AS DOUBLE) AS sum_sape
      FROM scored
    )
    SELECT CAST(n AS BIGINT) AS n_days,
           ROUND(sum_ape / n, 6) AS mape,
           ROUND(sum_sape / n, 6) AS smape,
           ROUND((sum_ae / n) / (sum_naive / n), 6) AS mase
    FROM agg
    """,
)
def q364_forecast_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-accuracy battery for the seasonal-naive forecast
    (yhat_t = y_{{t-7}}) of daily revenue: MAPE, symmetric MAPE, and
    MASE (MAE scaled by the one-step-naive MAE — Hyndman's
    scale-free standard; < 1 beats the naive). The metrics layer
    that makes q261's Holt and q268's backtest comparable across
    series. Scale: one daily aggregate, two lags over the day table
    (the q339 bounded-window class), a 1-row DECIMAL reduction."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.sum(F.round("value", 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("y")
    )
    w = W.orderBy("d")
    lagged = daily.select(
        "y",
        F.lag("y", 7).over(w).alias("yhat"),
        F.lag("y", 1).over(w).alias("naive1"),
    ).filter(F.col("yhat").isNotNull() & F.col("naive1").isNotNull())
    ae = F.abs(F.col("y") - F.col("yhat"))
    naive_ae = F.abs(F.col("y") - F.col("naive1"))
    agg = lagged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(ae, 6).cast("decimal(38,6)")).cast("double").alias(
            "sum_ae"
        ),
        F.sum(F.round(naive_ae, 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_naive"),
        F.sum(F.round(ae / F.col("y"), 9).cast("decimal(38,9)"))
        .cast("double")
        .alias("sum_ape"),
        F.sum(
            F.round(
                2 * ae / (F.abs(F.col("y")) + F.abs(F.col("yhat"))), 9
            ).cast("decimal(38,9)")
        )
        .cast("double")
        .alias("sum_sape"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.round(F.col("sum_ape") / F.col("n"), 6).alias("mape"),
        F.round(F.col("sum_sape") / F.col("n"), 6).alias("smape"),
        F.round(
            (F.col("sum_ae") / F.col("n")) / (F.col("sum_naive") / F.col("n")),
            6,
        ).alias("mase"),
    )
