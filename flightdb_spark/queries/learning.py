"""Learning-pipeline batch 15 (q244-q249): data-selection and
experiment-analysis operators a training-data platform runs beside the
cleaning chain — DSIR-style importance resampling (hashed n-gram
log-likelihood ratios, Xie et al. 2023), split conformal prediction
intervals (the distribution-free calibration wrapper), a naive-Bayes
language classifier trained and applied in one query (the fastText-ish
router baseline), cross-correlation lag scanning between event
streams, blocked entity resolution (the scale path q150's bounded
self-join lacks), and CUPED variance-reduced experiment readout
(Deng et al. 2013).

Determinism per DETERMINISM.md: every ln() term is rounded at 7 dp
into DECIMAL(38,7) sums (two decimals finer than any output, §5);
moment accumulations are per-row-rounded DECIMAL sums assembled into
doubles once with straight-line formulas mirrored verbatim in the
oracle (§6); order statistics run over DISTINCT value collapses via
the bucketed prefix scan (§15); train/test splits are 16-bit md5
buckets, never random().
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.operators.prefix import bucketed_cumsum
from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_DEC7 = "decimal(38,7)"
_DEC12 = "decimal(38,12)"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q244 — DSIR importance resampling


@query(
    "q244_dsir_resample",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    all_counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS ca FROM toks GROUP BY tok),
    tgt_counts AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS ct FROM toks WHERE lang = 'en' GROUP BY tok
    ),
    totals AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS na,
             CAST(COUNT(*) FILTER (WHERE lang = 'en') AS BIGINT) AS nt,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS v
      FROM toks
    ),
    terms AS (
      SELECT t.doc_id, t.lang,
             CAST(ROUND(ln((COALESCE(g.ct, 0) + 1.0) / (tt.nt + tt.v))
                        - ln((a.ca + 1.0) / (tt.na + tt.v)), 7)
                  AS DECIMAL(38,7)) AS term
      FROM toks t
      JOIN all_counts a USING (tok)
      LEFT JOIN tgt_counts g USING (tok)
      CROSS JOIN totals tt
    ),
    scored AS (
      SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             ROUND(CAST(SUM(term) AS DOUBLE) / COUNT(*), 5) AS dsir_score
      FROM terms GROUP BY doc_id, lang
    )
    SELECT doc_id, lang, n_tokens, dsir_score
    FROM scored WHERE dsir_score > 0
    ORDER BY dsir_score DESC, doc_id
    """,
)
def q244_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, public): score every
    document by the average unigram log-likelihood ratio between a
    target distribution (here the 'en' slice) and the raw corpus, both
    add-one smoothed over the shared vocabulary, and keep documents
    that look more target-like than corpus-like (avg ratio > 0). The
    real system fits the two hashed n-gram LMs on target/raw samples;
    the ratio-score-threshold shape is identical.

    Plan: token counts are VOCAB-bounded, so both count tables and the
    single-row totals broadcast onto the exploded token stream — the
    corpus-sized side never shuffles for the joins; the only wide
    exchange is the per-doc aggregate on doc_id. ln terms round at
    7 dp into DECIMAL(38,7) sums (DETERMINISM.md §5) so the per-doc
    average is engine-exact."""
    docs = _docs(spark, sf_dir)
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    all_counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("ca"))
    tgt_counts = (
        toks.filter(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("na"),
        F.count(F.when(F.col("lang") == "en", 1)).alias("nt"),
        F.count_distinct("tok").alias("v"),
    )
    term = F.round(
        F.log((F.coalesce(F.col("ct"), F.lit(0)) + 1.0) / (F.col("nt") + F.col("v")))
        - F.log((F.col("ca") + 1.0) / (F.col("na") + F.col("v"))),
        7,
    ).cast(_DEC7)
    terms = (
        toks.join(F.broadcast(all_counts), "tok")
        .join(F.broadcast(tgt_counts), "tok", "left")
        .join(F.broadcast(totals))
        .select("doc_id", "lang", term.alias("term"))
    )
    scored = terms.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.round(F.sum("term").cast("double") / F.count(F.lit(1)), 5).alias(
            "dsir_score"
        ),
    )
    return scored.filter(F.col("dsir_score") > 0).orderBy(
        F.desc("dsir_score"), "doc_id"
    )


# ---------------------------------------------------------------------------
# q245 — split conformal prediction intervals


@query(
    "q245_conformal_interval",
    oracle="""
    WITH base AS (
      SELECT l_quantity AS x, l_extendedprice AS y,
             ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '-'
                 || CAST(l_linenumber AS VARCHAR) || '-'
                 || CAST(l_partkey AS VARCHAR)), 1, 4))::BIGINT AS bucket
      FROM lineitem
    ),
    split AS (
      SELECT x, y, CASE WHEN bucket < 39322 THEN 'train'
                        WHEN bucket < 52429 THEN 'calib'
                        ELSE 'test' END AS part
      FROM base
    ),
    moments AS (
      -- operands widened to DECIMAL(24,6) so DuckDB multiplies in
      -- int128 (DECIMAL(18) products overflow its int64 storage);
      -- values are identical, this is a pure storage-width change
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(CAST(ROUND(x, 6) AS DECIMAL(24,6)) AS DECIMAL(38,12))) AS sx,
             SUM(CAST(CAST(ROUND(y, 6) AS DECIMAL(24,6)) AS DECIMAL(38,12))) AS sy,
             SUM(CAST(CAST(ROUND(x, 6) AS DECIMAL(24,6))
                      * CAST(ROUND(x, 6) AS DECIMAL(24,6)) AS DECIMAL(38,12))) AS sxx,
             SUM(CAST(CAST(ROUND(x, 6) AS DECIMAL(24,6))
                      * CAST(ROUND(y, 6) AS DECIMAL(24,6)) AS DECIMAL(38,12))) AS sxy
      FROM split WHERE part = 'train'
    ),
    fit AS (
      SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
             n AS n_train, sx, sy
      FROM moments
    ),
    fit2 AS (
      SELECT slope,
             (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
               / CAST(n_train AS DOUBLE) AS icept,
             n_train
      FROM fit
    ),
    resid AS (
      SELECT s.part, ROUND(ABS(s.y - (f.icept + f.slope * s.x)), 6) AS r6
      FROM split s CROSS JOIN fit2 f
      WHERE s.part <> 'train'
    ),
    calib AS (SELECT r6 FROM resid WHERE part = 'calib'),
    kth AS (
      SELECT r6 AS qhat FROM calib
      ORDER BY r6
      LIMIT 1 OFFSET (
        SELECT CAST(LEAST(CEIL(0.9 * (COUNT(*) + 1)), COUNT(*)) AS BIGINT) - 1
        FROM calib
      )
    )
    SELECT f.n_train,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM calib) AS n_calib,
           CAST(COUNT(*) AS BIGINT) AS n_test,
           (SELECT qhat FROM kth) AS qhat,
           ROUND(SUM(CASE WHEN t.r6 <= (SELECT qhat FROM kth)
                          THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 5) AS coverage
    FROM resid t CROSS JOIN fit2 f
    WHERE t.part = 'test'
    GROUP BY f.n_train
    """,
)
def q245_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split conformal prediction (Vovk; Lei et al., public): fit a
    point model on a train split (OLS of extendedprice on quantity),
    take the ceil(0.9(n+1))-th smallest absolute residual on a
    disjoint calibration split as the interval half-width qhat, and
    report empirical coverage of prediction +/- qhat on a held-out
    test split — the distribution-free ~90% guarantee, audited.
    Splits are 16-bit md5 buckets of the row key (60/20/20).

    Plan: the OLS fit is per-row-rounded DECIMAL(38,12) moment sums
    (one 5-column aggregate, no shuffle of rows) assembled into
    slope/intercept doubles broadcast back as a single row; residuals
    are map-side; the calibration order statistic collapses to
    DISTINCT 6-dp residual values and runs through the bucketed
    prefix scan (operators/prefix.py) — no global single-partition
    sort at any point; coverage is one more scan-shaped aggregate."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    bucket = F.expr(
        "cast(conv(substring(md5(concat(cast(l_orderkey as string), '-', "
        "cast(l_linenumber as string), '-', cast(l_partkey as string))),1,4),16,10) "
        "as bigint)"
    )
    base = li.select(
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
        F.when(bucket < 39322, "train")
        .when(bucket < 52429, "calib")
        .otherwise("test")
        .alias("part"),
    )
    x6 = F.round(F.col("x"), 6).cast("decimal(18,6)")
    y6 = F.round(F.col("y"), 6).cast("decimal(18,6)")
    m = base.filter(F.col("part") == "train").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x6.cast(_DEC12)).alias("sx"),
        F.sum(y6.cast(_DEC12)).alias("sy"),
        F.sum((x6 * x6).cast(_DEC12)).alias("sxx"),
        F.sum((x6 * y6).cast(_DEC12)).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    fit = m.select(
        F.col("n").alias("n_train"),
        (
            (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
            / (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        ).alias("slope"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sy").cast("double").alias("syd"),
    ).select(
        "n_train",
        "slope",
        ((F.col("syd") - F.col("slope") * F.col("sxd")) / F.col("n_train").cast("double")).alias(
            "icept"
        ),
    )
    resid = (
        base.filter(F.col("part") != "train")
        .join(F.broadcast(fit))
        .select(
            "part",
            "n_train",
            F.round(
                F.abs(F.col("y") - (F.col("icept") + F.col("slope") * F.col("x"))), 6
            ).alias("r6"),
        )
    )
    # r10 P3 staging: calib was scanned twice (histogram + count) and
    # test once more, and every reference re-expanded the full
    # lineitem->residual pipeline under Catalyst inlining (12 duplicate
    # scans in the static plan). ONE corpus pass builds the per-part
    # 6-dp-residual histogram (bounded by the rounded-residual value
    # domain, not corpus rows); n_calib, the prefix scan, and test
    # coverage all derive from the checkpointed histogram.
    hist = (
        resid.groupBy("part", "n_train", "r6")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    counts = hist.filter(F.col("part") == "calib").select("r6", "cnt")
    cum = bucketed_cumsum(counts, "r6", ["cnt"])
    nc_row = counts.agg(F.sum("cnt").cast("bigint").alias("n_calib"))
    k = F.least(
        F.ceil(0.9 * (F.col("n_calib") + 1)).cast("bigint"), F.col("n_calib")
    )
    qhat = (
        cum.join(F.broadcast(nc_row))
        .filter(F.col("cum_cnt") >= k)
        .agg(F.min("r6").alias("qhat"), F.first("n_calib").alias("n_calib"))
    )
    test = hist.filter(F.col("part") == "test")
    return (
        test.join(F.broadcast(qhat))
        .groupBy("n_train", "n_calib", "qhat")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_test"),
            F.round(
                F.sum(F.when(F.col("r6") <= F.col("qhat"), F.col("cnt")).otherwise(0))
                * 1.0
                / F.sum("cnt"),
                5,
            ).alias("coverage"),
        )
        .select("n_train", "n_calib", "n_test", "qhat", "coverage")
    )


# ---------------------------------------------------------------------------
# q246 — naive Bayes language classifier (train + apply in one query)


@query(
    "q246_naive_bayes_langid",
    oracle="""
    WITH split AS (
      SELECT doc_id, lang, text,
             CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
                       < 52429 THEN 'train' ELSE 'test' END AS part
      FROM documents
    ),
    train_toks AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok
      FROM split WHERE part = 'train'
    ),
    class_tok AS (
      SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS c FROM train_toks GROUP BY lang, tok
    ),
    class_tot AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS nc FROM train_toks GROUP BY lang
    ),
    vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM train_toks),
    priors AS (
      SELECT lang,
             CAST(ROUND(ln(COUNT(*) * 1.0 /
                  (SELECT COUNT(*) FROM split WHERE part = 'train')), 7)
                  AS DECIMAL(38,7)) AS prior
      FROM split WHERE part = 'train' GROUP BY lang
    ),
    test_toks AS (
      SELECT doc_id, lang AS true_lang, unnest(string_split(text, ' ')) AS tok
      FROM split WHERE part = 'test'
    ),
    scored AS (
      SELECT t.doc_id, t.true_lang, ct.lang AS cand,
             SUM(CAST(ROUND(ln((COALESCE(k.c, 0) + 1.0) / (ct.nc + vb.v)), 7)
                      AS DECIMAL(38,7))) AS loglik
      FROM test_toks t
      CROSS JOIN class_tot ct
      CROSS JOIN vocab vb
      LEFT JOIN class_tok k ON k.lang = ct.lang AND k.tok = t.tok
      GROUP BY t.doc_id, t.true_lang, ct.lang
    ),
    ranked AS (
      SELECT s.doc_id, s.true_lang, s.cand,
             ROW_NUMBER() OVER (
               PARTITION BY s.doc_id
               ORDER BY s.loglik + p.prior DESC, s.cand
             ) AS rk
      FROM scored s JOIN priors p ON p.lang = s.cand
    )
    SELECT true_lang, cand AS pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM ranked WHERE rk = 1
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def q246_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes language classifier, trained on an
    80% md5 split and applied to the held-out 20% in the same query,
    reported as a confusion matrix — the classical fastText-router
    baseline a curation pipeline uses to audit its langid column.
    Add-one smoothing over the train vocabulary; unseen test tokens
    fall back to the per-class smoothed floor ln(1/(nc+V)).

    Plan: the model IS a pair of bounded tables — per-(class, token)
    counts (vocab x 5) and 5-row class totals — both broadcast onto
    the exploded test tokens (each test token fans out x5 against the
    class-totals row set, then left-joins the observed counts);
    per-(doc, class) log-likelihoods are 7-dp DECIMAL sums, the
    argmax is a doc_id-partitioned window ordered (score DESC, class)
    so ties break identically on both engines, and the confusion
    matrix is a 25-key aggregate. Scores never leave DECIMAL before
    the comparison."""
    docs = _docs(spark, sf_dir)
    bucket = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)),1,4),16,10) as bigint)"
    )
    split = docs.select(
        "doc_id",
        "lang",
        "text",
        F.when(bucket < 52429, "train").otherwise("test").alias("part"),
    )
    train = split.filter(F.col("part") == "train")
    train_toks = train.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    class_tok = train_toks.groupBy("lang", "tok").agg(F.count(F.lit(1)).alias("c"))
    class_tot = train_toks.groupBy("lang").agg(F.count(F.lit(1)).alias("nc"))
    vocab = train_toks.agg(F.count_distinct("tok").alias("v"))
    n_train_docs = train.agg(F.count(F.lit(1)).alias("nd_tot"))
    priors = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("nd_lang"))
        .join(F.broadcast(n_train_docs))
        .select(
            "lang",
            F.round(F.log(F.col("nd_lang") * 1.0 / F.col("nd_tot")), 7)
            .cast(_DEC7)
            .alias("prior"),
        )
    )
    test_toks = (
        split.filter(F.col("part") == "test")
        .select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
    )
    ct = class_tot.select(F.col("lang").alias("cand"), "nc")
    k = class_tok.select(
        F.col("lang").alias("kcand"), F.col("tok").alias("ktok"), "c"
    )
    term = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("nc") + F.col("v"))
        ),
        7,
    ).cast(_DEC7)
    scored = (
        test_toks.join(F.broadcast(ct))
        .join(F.broadcast(vocab))
        .join(
            F.broadcast(k),
            (F.col("kcand") == F.col("cand")) & (F.col("ktok") == F.col("tok")),
            "left",
        )
        .select("doc_id", "true_lang", "cand", term.alias("term"))
        .groupBy("doc_id", "true_lang", "cand")
        .agg(F.sum("term").alias("loglik"))
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.col("loglik") + F.col("prior")), F.col("cand")
    )
    ranked = scored.join(
        F.broadcast(priors), F.col("lang") == F.col("cand")
    ).withColumn("rk", F.row_number().over(w))
    return (
        ranked.filter(F.col("rk") == 1)
        .groupBy("true_lang", F.col("cand").alias("pred_lang"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# q247 — cross-correlation lag scan


@query(
    "q247_xcorr_lags",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS x,
             CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS y
      FROM events GROUP BY day
    ),
    lags AS (SELECT unnest(range(0, 8)) AS lag),
    pairs AS (
      SELECT g.lag, a.x, b.y
      FROM lags g
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + g.lag * INTERVAL 1 DAY
    ),
    mom AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS BIGINT) AS lag, n_days,
           ROUND((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS xcorr
    FROM mom
    ORDER BY lag
    """,
)
def q247_xcorr_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-correlation between two event streams at lags 0..7 days:
    does today's click volume predict purchase volume ℓ days later?
    Pearson correlation of (clicks_t, purchases_{t+ℓ}) over the
    overlapping days, per lag — the lead-lag scan behind attribution
    and capacity models.

    Plan: ONE shuffle builds the 30-row daily count table (the
    conditional counts share the scan); everything after is
    calendar-bounded — the 8-row lag frame and the daily table itself
    broadcast into the shifted self-join, and the per-lag moments are
    exact BIGINT sums assembled into the correlation double once,
    straight-line (DETERMINISM.md §6). sqrt is IEEE-exact (§5)."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(
            F.count(F.when(F.col("event_type") == "click", 1)).alias("x"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("y"),
        )
    )
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    a = daily.select(F.col("day").alias("day_a"), "x")
    b = daily.select(F.col("day").alias("day_b"), "y")
    pairs = (
        a.join(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("day_b") == F.expr("date_add(day_a, lag)"),
        )
        .select("lag", "x", "y")
    )
    mom = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    nd = F.col("n_days").cast("double")
    corr = F.round(
        (nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double"))
        / (
            F.sqrt(nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
            * F.sqrt(nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double"))
        ),
        6,
    )
    return mom.select(
        F.col("lag").cast("bigint").alias("lag"),
        F.col("n_days").cast("bigint").alias("n_days"),
        corr.alias("xcorr"),
    ).orderBy("lag")


# ---------------------------------------------------------------------------
# q248 — blocked entity resolution


@query(
    "q248_blocked_entity_resolution",
    oracle="""
    WITH names AS (
      SELECT p_name, CAST(COUNT(*) AS BIGINT) AS n_parts FROM part GROUP BY p_name
    )
    SELECT substr(a.p_name, 1, 4) AS block,
           a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a
    JOIN names b ON substr(a.p_name, 1, 4) = substr(b.p_name, 1, 4)
                AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    ORDER BY block, name_a, name_b
    """,
)
def q248_blocked_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked entity resolution: candidate duplicate names via an
    EQUI-join on a cheap blocking key (4-char prefix) with the
    expensive edit-distance verify running only inside blocks — the
    standard scale shape (Fellegi-Sunter blocking) that q150's bounded
    all-pairs self-join deliberately lacks. At 100 TB the blocking key
    (prefix, soundex, LSH bucket) keeps candidate generation linear in
    the block sizes; the n² term is per-block, not global.

    Plan: one distinct-collapse shuffle on p_name; the block join is a
    hash equi-join on the prefix (never a theta-join); levenshtein
    evaluates post-join on block-bounded pairs only."""
    p = load_table(spark, sf_dir, "part")
    names = p.groupBy("p_name").agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        F.substring("p_name", 1, 4).alias("block"),
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        F.substring("p_name", 1, 4).alias("block_b"),
    )
    pairs = a.join(
        b,
        (F.col("block") == F.col("block_b")) & (F.col("name_a") < F.col("name_b")),
    ).withColumn("dist", F.levenshtein("name_a", "name_b").cast("bigint"))
    return (
        pairs.filter(F.col("dist") <= 3)
        .select("block", "name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
        .orderBy("block", "name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# q249 — CUPED variance-reduced experiment readout


@query(
    "q249_cuped",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                 THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS pre,
             SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                 THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS post,
             CASE WHEN ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))::BIGINT
                       < 32768 THEN 'treat' ELSE 'control' END AS grp
      FROM events
      GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(pre AS DECIMAL(38,12))) AS sp,
             SUM(CAST(post AS DECIMAL(38,12))) AS so,
             SUM(CAST(pre * pre AS DECIMAL(38,12))) AS spp,
             SUM(CAST(pre * post AS DECIMAL(38,12))) AS spo,
             SUM(CAST(post * post AS DECIMAL(38,12))) AS soo
      FROM per_user
    ),
    grp_mom AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS ng,
             SUM(CAST(pre AS DECIMAL(38,12))) AS spg,
             SUM(CAST(post AS DECIMAL(38,12))) AS sog
      FROM per_user GROUP BY grp
    ),
    assembled AS (
      SELECT m.n,
             (SELECT ng FROM grp_mom WHERE grp = 'treat') AS n_treat,
             (CAST(m.n AS DOUBLE) * CAST(m.spo AS DOUBLE)
              - CAST(m.sp AS DOUBLE) * CAST(m.so AS DOUBLE))
             / (CAST(m.n AS DOUBLE) * CAST(m.spp AS DOUBLE)
                - CAST(m.sp AS DOUBLE) * CAST(m.sp AS DOUBLE)) AS theta,
             (SELECT CAST(sog AS DOUBLE) / CAST(ng AS DOUBLE)
              FROM grp_mom WHERE grp = 'treat') AS mpost_t,
             (SELECT CAST(sog AS DOUBLE) / CAST(ng AS DOUBLE)
              FROM grp_mom WHERE grp = 'control') AS mpost_c,
             (SELECT CAST(spg AS DOUBLE) / CAST(ng AS DOUBLE)
              FROM grp_mom WHERE grp = 'treat') AS mpre_t,
             (SELECT CAST(spg AS DOUBLE) / CAST(ng AS DOUBLE)
              FROM grp_mom WHERE grp = 'control') AS mpre_c,
             (CAST(m.n AS DOUBLE) * CAST(m.spo AS DOUBLE)
              - CAST(m.sp AS DOUBLE) * CAST(m.so AS DOUBLE)) AS covn,
             (CAST(m.n AS DOUBLE) * CAST(m.spp AS DOUBLE)
              - CAST(m.sp AS DOUBLE) * CAST(m.sp AS DOUBLE)) AS varpn,
             (CAST(m.n AS DOUBLE) * CAST(m.soo AS DOUBLE)
              - CAST(m.so AS DOUBLE) * CAST(m.so AS DOUBLE)) AS varon
      FROM mom m
    )
    SELECT n AS n_users, n_treat,
           ROUND(theta, 6) AS theta,
           ROUND(mpost_t - mpost_c, 4) AS effect_raw,
           ROUND((mpost_t - mpost_c) - theta * (mpre_t - mpre_c), 4)
             AS effect_cuped,
           ROUND((covn * covn) / (varpn * varon), 6) AS var_reduction
    FROM assembled
    """,
)
def q249_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng et al. 2013, public):
    split users into deterministic md5 halves, use each user's
    first-fortnight spend as the pre-experiment covariate for their
    second-fortnight spend, and report the raw vs CUPED-adjusted
    treatment effect plus the variance-reduction ratio (= rho² of
    pre/post). Because the CUPED adjustment is linear, the adjusted
    effect needs only per-group means — no per-user adjusted column is
    materialized: effect_cuped = Δmean(post) - θ·Δmean(pre), and the
    reduction ratio comes from the global moment triplet.

    Plan: one shuffle on user_id builds (pre, post) decimal pairs; the
    global and per-group moment aggregates (2 + 1 rows) are the only
    other exchanges; every double is assembled once, straight-line."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    v6 = F.round(F.col("value"), 6).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    cut = F.lit("2024-01-16").cast("timestamp")
    bucket = F.expr(
        "cast(conv(substring(md5(cast(user_id as string)),1,4),16,10) as bigint)"
    )
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cut, v6).otherwise(zero)).alias("pre"),
        F.sum(F.when(F.col("ts") >= cut, v6).otherwise(zero)).alias("post"),
    ).withColumn("grp", F.when(bucket < 32768, "treat").otherwise("control"))
    mom = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("pre").cast(_DEC12)).alias("sp"),
        F.sum(F.col("post").cast(_DEC12)).alias("so"),
        F.sum((F.col("pre") * F.col("pre")).cast(_DEC12)).alias("spp"),
        F.sum((F.col("pre") * F.col("post")).cast(_DEC12)).alias("spo"),
        F.sum((F.col("post") * F.col("post")).cast(_DEC12)).alias("soo"),
    )
    gm = per_user.groupBy("grp").agg(
        F.count(F.lit(1)).alias("ng"),
        F.sum(F.col("pre").cast(_DEC12)).alias("spg"),
        F.sum(F.col("post").cast(_DEC12)).alias("sog"),
    )
    t = gm.filter(F.col("grp") == "treat").select(
        F.col("ng").alias("n_treat"),
        (F.col("sog").cast("double") / F.col("ng").cast("double")).alias("mpost_t"),
        (F.col("spg").cast("double") / F.col("ng").cast("double")).alias("mpre_t"),
    )
    c = gm.filter(F.col("grp") == "control").select(
        (F.col("sog").cast("double") / F.col("ng").cast("double")).alias("mpost_c"),
        (F.col("spg").cast("double") / F.col("ng").cast("double")).alias("mpre_c"),
    )
    nd = F.col("n").cast("double")
    covn = nd * F.col("spo").cast("double") - F.col("sp").cast("double") * F.col("so").cast("double")
    varpn = nd * F.col("spp").cast("double") - F.col("sp").cast("double") * F.col("sp").cast("double")
    varon = nd * F.col("soo").cast("double") - F.col("so").cast("double") * F.col("so").cast("double")
    theta = covn / varpn
    return (
        mom.join(F.broadcast(t))
        .join(F.broadcast(c))
        .select(
            F.col("n").cast("bigint").alias("n_users"),
            F.col("n_treat").cast("bigint").alias("n_treat"),
            F.round(theta, 6).alias("theta"),
            F.round(F.col("mpost_t") - F.col("mpost_c"), 4).alias("effect_raw"),
            F.round(
                (F.col("mpost_t") - F.col("mpost_c"))
                - theta * (F.col("mpre_t") - F.col("mpre_c")),
                4,
            ).alias("effect_cuped"),
            F.round((covn * covn) / (varpn * varon), 6).alias("var_reduction"),
        )
    )
