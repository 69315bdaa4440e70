"""Calibration & agreement batch 34 (q301-q303): isotonic (PAVA)
calibration of a score against observed outcomes, Cohen's kappa for
label agreement (predicted language vs declared language — the
inter-annotator-agreement statistic every labeling pipeline reports),
and the decile lift/gains table (the model-targeting report read
before any campaign or threshold choice).

These extend the evaluation family (q135 AUC ranks, q201 ECE checks
probability honesty, q235 Brier decomposes): q301 produces the
monotone recalibration mapping itself, q302 scores categorical
agreement above chance, q303 turns ranking quality into the
per-decile business view.

Determinism: all three reduce to small bin/cell tables built from
exact integer counts; divisions happen once per output cell in
IEEE double and are rounded at the edge. The isotonic fit uses the
minimax characterization (max over left ends of min over right ends
of the segment mean), exact on the binned table — no iterative PAVA
sweep, so it is SQL-expressible and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

ISO_BINS = 10

# ---------------------------------------------------------------------------
# q301 — isotonic calibration via the minimax formula on score bins


@query(
    "q301_isotonic_calibration",
    oracle=f"""
    WITH lbl AS (
      SELECT value / 100.0 AS conf,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(conf * {ISO_BINS}) AS INT), {ISO_BINS - 1}) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM lbl GROUP BY 1
    ),
    seg AS (
      SELECT i.bin AS i, j.bin AS j,
             CAST(SUM(k.pos) AS DOUBLE) / SUM(k.n) AS seg_avg
      FROM binned i JOIN binned j ON i.bin <= j.bin
      JOIN binned k ON k.bin BETWEEN i.bin AND j.bin
      GROUP BY i.bin, j.bin
    ),
    inner_min AS (
      SELECT b.bin, s.i, MIN(s.seg_avg) AS min_avg
      FROM binned b JOIN seg s ON s.i <= b.bin AND s.j >= b.bin
      GROUP BY b.bin, s.i
    ),
    fit AS (
      SELECT bin, MAX(min_avg) AS iso FROM inner_min GROUP BY bin
    )
    SELECT b.bin, b.n,
           ROUND(CAST(b.pos AS DOUBLE) / b.n, 6) AS raw_rate,
           ROUND(f.iso, 6) AS iso_rate
    FROM binned b JOIN fit f ON f.bin = b.bin
    ORDER BY b.bin
    """,
)
def q301_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration of 'value/100 predicts purchase':
    bin the score as q201 does, then fit the best monotone
    non-decreasing rate via the minimax characterization
    iso(k) = max_{i<=k} min_{j>=k} mean(pos over bins i..j) — exactly
    the pool-adjacent-violators solution, computed without iteration
    so both engines agree closed-form. Scale shape: the only pass
    over the fact table is the binning aggregate (one shuffle into
    {ISO_BINS} rows); the O(B^3) minimax joins run on the 10-row bin
    table and are free at any corpus size."""
    b = ISO_BINS
    ev = load_table(spark, sf_dir, "events")
    conf = F.col("value") / 100.0
    lbl = ev.select(
        conf.alias("conf"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    binned = (
        lbl.groupBy(
            F.least(F.floor(F.col("conf") * b).cast("int"), F.lit(b - 1)).alias("bin")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast("bigint").alias("pos"),
        )
    )
    bi = binned.select(F.col("bin").alias("i"))
    bj = binned.select(F.col("bin").alias("j"))
    bk = binned.select(
        F.col("bin").alias("k"), F.col("n").alias("kn"), F.col("pos").alias("kpos")
    )
    seg = (
        bi.join(bj, F.col("i") <= F.col("j"))
        .join(bk, (F.col("k") >= F.col("i")) & (F.col("k") <= F.col("j")))
        .groupBy("i", "j")
        .agg((F.sum("kpos").cast("double") / F.sum("kn")).alias("seg_avg"))
    )
    inner = (
        binned.select("bin")
        .join(seg, (F.col("i") <= F.col("bin")) & (F.col("j") >= F.col("bin")))
        .groupBy("bin", "i")
        .agg(F.min("seg_avg").alias("min_avg"))
    )
    fit = inner.groupBy("bin").agg(F.max("min_avg").alias("iso"))
    return (
        binned.join(fit, "bin")
        .select(
            "bin",
            "n",
            F.round(F.col("pos").cast("double") / F.col("n"), 6).alias("raw_rate"),
            F.round("iso", 6).alias("iso_rate"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q302 — Cohen's kappa: declared language vs stopword-argmax prediction

from .textops import _LANG_VALUES  # noqa: E402  (shared stopword dim)


@query(
    "q302_cohens_kappa",
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
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY hits DESC, lang) AS rn
      FROM scores
    ),
    pairs AS (
      SELECT d.lang AS label, COALESCE(r.lang, 'und') AS pred
      FROM documents d LEFT JOIN ranked r
        ON r.doc_id = d.doc_id AND r.rn = 1
    ),
    cells AS (
      SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS c
      FROM pairs GROUP BY label, pred
    ),
    tot AS (SELECT SUM(c) AS nt FROM cells),
    po AS (
      SELECT COALESCE(SUM(c), 0) AS agree FROM cells WHERE label = pred
    ),
    marg AS (
      SELECT COALESCE(lm.label, pm.pred) AS cls,
             COALESCE(lm.lc, 0) AS lc, COALESCE(pm.pc, 0) AS pc
      FROM (SELECT label, SUM(c) AS lc FROM cells GROUP BY label) lm
      FULL JOIN (SELECT pred, SUM(c) AS pc FROM cells GROUP BY pred) pm
        ON lm.label = pm.pred
    ),
    pe AS (SELECT SUM(lc * pc) AS ep FROM marg)
    SELECT CAST(t.nt AS BIGINT) AS n,
           ROUND(CAST(po.agree AS DOUBLE) / t.nt, 6) AS p_observed,
           ROUND(CAST(pe.ep AS DOUBLE) / (t.nt * t.nt), 6) AS p_expected,
           ROUND((CAST(po.agree AS DOUBLE) / t.nt
                  - CAST(pe.ep AS DOUBLE) / (t.nt * t.nt))
                 / (1 - CAST(pe.ep AS DOUBLE) / (t.nt * t.nt)), 6) AS kappa
    FROM tot t, po, pe
    """,
)
def q302_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the declared document language and the
    stopword-argmax langid prediction (q34's classifier): chance-
    corrected agreement (po - pe) / (1 - pe) over the multiclass
    confusion table. The statistic every annotation pipeline reports
    for rater reliability, here applied rater=metadata vs
    rater=classifier. Scale shape: one explode + broadcast stopword
    join + per-doc argmax (the q34 plan), then everything collapses
    to a <=36-cell confusion table; the kappa arithmetic is driver-
    free single-row algebra."""
    from pyspark.sql import Window as W

    from .textops import _LANG_STOPWORDS

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    stop = spark.createDataFrame(_LANG_STOPWORDS, ["slang", "w"])
    scores = (
        toks.join(F.broadcast(stop), toks.tok == stop.w)
        .groupBy("doc_id", "slang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    w = W.partitionBy("doc_id").orderBy(F.col("hits").desc(), F.col("slang").asc())
    best = scores.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    pairs = (
        docs.select("doc_id", F.col("lang").alias("label"))
        .join(best.select("doc_id", "slang"), "doc_id", "left")
        .select("label", F.coalesce(F.col("slang"), F.lit("und")).alias("pred"))
    )
    cells = pairs.groupBy("label", "pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    tot = cells.agg(F.sum("c").alias("nt"))
    agree = cells.filter(F.col("label") == F.col("pred")).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("agree")
    )
    lm = cells.groupBy("label").agg(F.sum("c").alias("lc"))
    pm = cells.groupBy("pred").agg(F.sum("c").alias("pc"))
    marg = lm.join(pm, lm.label == pm.pred, "full").select(
        F.coalesce(F.col("lc"), F.lit(0)).alias("lc"),
        F.coalesce(F.col("pc"), F.lit(0)).alias("pc"),
    )
    pe = marg.agg(F.sum(F.col("lc") * F.col("pc")).alias("ep"))
    po_d = F.col("agree").cast("double") / F.col("nt")
    pe_d = F.col("ep").cast("double") / (F.col("nt") * F.col("nt"))
    return (
        tot.join(F.broadcast(agree))
        .join(F.broadcast(pe))
        .select(
            F.col("nt").cast("bigint").alias("n"),
            F.round(po_d, 6).alias("p_observed"),
            F.round(pe_d, 6).alias("p_expected"),
            F.round((po_d - pe_d) / (1 - pe_d), 6).alias("kappa"),
        )
    )


# ---------------------------------------------------------------------------
# q303 — decile lift & gains table

LIFT_QS = [i / 10.0 for i in range(1, 10)]  # 0.1 .. 0.9


@query(
    "q303_decile_lift",
    oracle=f"""
    WITH scored AS (
      SELECT ROUND(value, 6) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    cuts AS (
      SELECT list_transform(
               quantile_cont(s, {LIFT_QS!r}), c -> ROUND(c, 6)) AS cs
      FROM scored
    ),
    binned AS (
      SELECT 10 - len(list_filter(c.cs, c -> sc.s > c)) AS decile,
             sc.y
      FROM scored sc, cuts c
    ),
    agg AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM binned GROUP BY decile
    ),
    tot AS (SELECT SUM(n) AS nt, SUM(pos) AS post FROM agg)
    SELECT a.decile, a.n, a.pos,
           ROUND(CAST(a.pos AS DOUBLE) / a.n, 6) AS response_rate,
           ROUND((CAST(a.pos AS DOUBLE) / a.n)
                 / (CAST(t.post AS DOUBLE) / t.nt), 6) AS lift,
           ROUND(CAST((SELECT SUM(b.pos) FROM agg b
                       WHERE b.decile <= a.decile) AS DOUBLE)
                 / t.post, 6) AS cum_gain
    FROM agg a, tot t
    ORDER BY a.decile
    """,
)
def q303_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift & gains: rank events by score (value), split into
    population deciles (decile 1 = highest scores), and report each
    decile's response rate, lift over the base rate, and cumulative
    share of all positives captured top-down — the targeting table a
    ranking model is actually used through (q135's AUC integrates
    this curve; this materializes it). Deciles come from exact
    decile cutpoints (one aggregate; swap percentile for
    percentile_approx at petabyte scale) broadcast back over the
    facts — no global-ordering window, so the fact table never
    single-partitions. Ties sit with the lower decile on both
    engines via identical round-then-compare arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.round("value", 6).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    cuts = scored.agg(
        F.transform(
            F.percentile("s", F.array(*[F.lit(q) for q in LIFT_QS])),
            lambda c: F.round(c, 6),
        ).alias("cs")
    )
    binned = scored.join(F.broadcast(cuts)).select(
        (
            F.lit(10)
            - F.size(F.filter("cs", lambda c: F.col("s") > c))
        ).alias("decile"),
        "y",
    )
    agg = binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    tot = agg.agg(F.sum("n").alias("nt"), F.sum("pos").alias("post"))
    cum = (
        agg.select(F.col("decile").alias("d2"), F.col("pos").alias("pos2"))
        .join(agg.select("decile"), F.col("d2") <= F.col("decile"))
        .groupBy("decile")
        .agg(F.sum("pos2").alias("cpos"))
    )
    rate = F.col("pos").cast("double") / F.col("n")
    base = F.col("post").cast("double") / F.col("nt")
    return (
        agg.join(cum, "decile")
        .join(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "pos",
            F.round(rate, 6).alias("response_rate"),
            F.round(rate / base, 6).alias("lift"),
            F.round(F.col("cpos").cast("double") / F.col("post"), 6).alias(
                "cum_gain"
            ),
        )
        .orderBy("decile")
    )
