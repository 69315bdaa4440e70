"""Evaluation & robust-statistics operators, batch 4 (q115-q119).

The measurement layer a production pipeline runs AROUND its operators:

- q115 ANN recall@k: the LSH index (q42) scored against the brute-force
  ground truth (q40), per probe — the metric that justifies (or
  condemns) a bucket-resolution choice.
- q116 MAD robust outliers: median-absolute-deviation z-scores
  (Iglewicz & Hoaglin's modified z, 0.6745·(x-med)/MAD) — the outlier
  gate that, unlike q84's mean/std z, does not let the outliers
  themselves inflate the threshold.
- q117 shingle containment: |A∩B|/|A| (and /|B|) per LSH candidate —
  catches doc-inside-doc duplication that symmetric Jaccard misses
  (a long doc quoting a short one wholesale has low Jaccard but
  containment ~1 on the short side).
- q118 inter-arrival statistics: exact percentiles of per-user event
  gaps by event type — the cadence profile behind session-gap and
  rate-limit choices.
- q119 per-source dataset cards: the datasheet row per source (docs,
  tokens, exact-dup rate, mean quality, dominant language) read before
  admitting a source into a training mix.

Determinism contract (DETERMINISM.md): ratio aggregates round per-row
and accumulate in DECIMAL; exact percentiles use PERCENTILE_CONT ↔
Spark `percentile` (both interpolate) rounded to 6 dp.

100 TB shapes: q115 composes two audited plans and joins them on the
probe key; q116/q118 are bounded two-pass aggregates (exact medians —
swap approx_percentile at scale, these are the anchors); q117 rides
the LSH bucket economics; q119 is one scan with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..operators import textdedup
from ..tables import ensure_parallelism, load_table
from . import query
from .textops import _SHINGLES_DUCK
from .vector import TOP_K, _bucket_duck


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# --- q115: ANN recall@k ------------------------------------------------------------
@query(
    "q115_ann_recall",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    truth AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ROUND(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rank
        FROM e a JOIN e b ON b.vec_id <> a.vec_id
        WHERE a.vec_id % 100 = 0
      ) WHERE rank <= {TOP_K}
    ),
    bucketed AS (SELECT vec_id, v, {_bucket_duck()} AS bucket FROM e),
    lsh AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY a.vec_id
                 ORDER BY ROUND(list_cosine_similarity(a.v, b.v), 6) DESC,
                          b.vec_id) AS rank
        FROM bucketed a JOIN bucketed b
          ON a.bucket = b.bucket AND b.vec_id <> a.vec_id
        WHERE a.vec_id % 100 = 0
      ) WHERE rank <= {TOP_K}
    )
    SELECT t.query_id,
           CAST(COUNT(*) AS BIGINT) AS n_true,
           CAST(COUNT(l.neighbor_id) AS BIGINT) AS n_hit,
           ROUND(COUNT(l.neighbor_id) * 1.0 / COUNT(*), 6) AS recall
    FROM truth t
    LEFT JOIN lsh l
      ON l.query_id = t.query_id AND l.neighbor_id = t.neighbor_id
    GROUP BY t.query_id
    """,
)
def q115_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the hyperplane-LSH index against brute-force ground
    truth, per probe — run on a sample exactly like this before
    trusting an ANN index at scale (the ground-truth side is O(n·
    probes), affordable for a probe SAMPLE, never the full corpus).
    Composes the two audited plans (q40, q42) and joins them on
    (probe, neighbor)."""
    from .vector import q40_cosine_topk, q42_lsh_ann

    truth = q40_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    lsh = q42_lsh_ann(spark, sf_dir).select(
        F.col("query_id").alias("lq"), F.col("neighbor_id").alias("ln")
    )
    return (
        truth.join(
            lsh,
            (F.col("query_id") == F.col("lq"))
            & (F.col("neighbor_id") == F.col("ln")),
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_true"),
            F.count("ln").alias("n_hit"),
            F.round(F.count("ln") * 1.0 / F.count(F.lit(1)), 6).alias("recall"),
        )
    )


# --- q116: MAD robust outliers -----------------------------------------------------
MAD_Z_CUT = 3.5  # Iglewicz & Hoaglin's recommended modified-z cutoff


@query(
    "q116_mad_outliers",
    oracle=f"""
    WITH med AS (
      SELECT event_type,
             PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY event_type
    ),
    mad AS (
      SELECT e.event_type,
             PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY ABS(e.value - m.med))
               AS mad
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND(0.6745 * (e.value - m.med) / d.mad, 6) AS robust_z
    FROM events e
    JOIN med m USING (event_type)
    JOIN mad d USING (event_type)
    WHERE d.mad > 0
      AND ABS(0.6745 * (e.value - m.med) / d.mad) > {MAD_Z_CUT}
    """,
)
def q116_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outliers per event type (modified
    z-score > 3.5): the robust twin of q84 — a heavy-tailed batch
    cannot widen its own gate, because both center and spread are
    medians. Two bounded aggregate passes broadcast back over the
    stream. Implementation: operators/robust.py::mad_outliers with
    exact medians (the oracle anchor); the SAME operator runs
    exact=False for the approx_percentile sketch mode at 100 TB
    (modes pinned against each other in test_robust)."""
    from ..operators.robust import mad_outliers

    ev = load_table(spark, sf_dir, "events")
    return mad_outliers(ev, exact=True)


# --- q117: shingle containment -----------------------------------------------------
CONTAIN_MIN = 0.8
_C_SEEDS = (0, 1, 2, 3)


def _containment_oracle() -> str:
    base = textdedup.MINHASH_BASE_DUCK.format(sh="sh")
    mins = ", ".join(
        f"MIN(xor({base}, {textdedup.minhash_mask(s)})) AS minhash_{s}"
        for s in _C_SEEDS
    )
    unions = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, {s} AS band, minhash_{s} AS h FROM sigs" for s in _C_SEEDS
    )
    return f"""
    WITH shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS sh FROM documents
    ),
    sigs AS (SELECT doc_id, {mins} FROM shingled GROUP BY doc_id),
    bands AS (
      {unions}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band = b.band AND a.h = b.h AND a.doc_id < b.doc_id
    ),
    sh_dist AS (SELECT DISTINCT doc_id, sh FROM shingled),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh_dist GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(s2.sh) AS ni
      FROM cand c
      JOIN sh_dist s1 ON s1.doc_id = c.doc_a
      LEFT JOIN sh_dist s2 ON s2.doc_id = c.doc_b AND s2.sh = s1.sh
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(i.ni * 1.0 / na.n, 6) AS contain_a,
           ROUND(i.ni * 1.0 / nb.n, 6) AS contain_b
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.ni * 1.0 / na.n >= {CONTAIN_MIN}
       OR i.ni * 1.0 / nb.n >= {CONTAIN_MIN}
    """


@query("q117_shingle_containment", oracle=_containment_oracle())
def q117_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric near-dup: shingle-set containment |A∩B|/|A| and /|B|
    per LSH candidate pair, kept when either side is >= 0.8 — the
    doc-inside-doc detector (a long doc wholesale-quoting a short one
    scores low symmetric Jaccard but containment ~1 on the short
    side). Candidates from the band bucket join; verification bounded
    by candidates x doc size."""
    docs = _docs(spark, sf_dir)
    shingled = textdedup.shingles(docs)
    # ONE tokenize pass (q109's pattern): checkpoint the distinct
    # (doc, shingle) set; signatures built FROM it are bit-identical
    # (MIN per seed is dedup-insensitive) and the 3 sh_dist consumers
    # read the checkpoint instead of re-running the shingle explode
    sh_dist = (
        shingled.select("doc_id", "sh").distinct().localCheckpoint(eager=True)
    )
    sigs = textdedup.minhash_signatures(sh_dist, seeds=_C_SEEDS)
    bands = textdedup.lsh_bands(sigs, seeds=_C_SEEDS)
    cand = textdedup.lsh_candidate_pairs(bands).select("doc_a", "doc_b")
    sizes = sh_dist.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    s1 = sh_dist.select(F.col("doc_id").alias("doc_a"), "sh")
    s2 = sh_dist.select(F.col("doc_id").alias("_b2"), F.col("sh").alias("sh_b"))
    inter = (
        cand.join(s1, "doc_a")
        .join(
            s2,
            (F.col("doc_b") == F.col("_b2")) & (F.col("sh") == F.col("sh_b")),
            "left",
        )
        .drop("_b2")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("sh_b").alias("ni"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    ca = F.col("ni") * 1.0 / F.col("na")
    cb = F.col("ni") * 1.0 / F.col("nb")
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter((ca >= CONTAIN_MIN) | (cb >= CONTAIN_MIN))
        .select(
            "doc_a",
            "doc_b",
            F.round(ca, 6).alias("contain_a"),
            F.round(cb, 6).alias("contain_b"),
        )
    )


# --- q118: inter-arrival statistics ------------------------------------------------
@query(
    "q118_interarrival_stats",
    oracle="""
    WITH gaps AS (
      SELECT event_type,
             CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS DOUBLE) / 1000000
               AS gap_s
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
           ROUND(PERCENTILE_CONT(0.5) WITHIN GROUP (ORDER BY gap_s), 6) AS p50_s,
           ROUND(PERCENTILE_CONT(0.9) WITHIN GROUP (ORDER BY gap_s), 6) AS p90_s,
           ROUND(MAX(gap_s), 6) AS max_s
    FROM gaps WHERE gap_s IS NOT NULL
    GROUP BY event_type
    """,
)
def q118_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap percentiles by event type — the cadence
    profile that grounds session-gap and watermark choices (q14's 30-min
    gap should sit far in this distribution's tail). Gap derivation is
    one window shuffle on (user, type); gaps are exact integer
    microseconds scaled once, so both engines aggregate identical
    doubles."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            ).cast("double")
            / 1000000
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    return gaps.groupBy("event_type").agg(
        F.count("gap_s").alias("n_gaps"),
        F.round(F.expr("percentile(gap_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(gap_s, 0.9)"), 6).alias("p90_s"),
        F.round(F.max("gap_s"), 6).alias("max_s"),
    )


# --- q119: per-source dataset cards ------------------------------------------------
@query(
    "q119_dataset_cards",
    oracle="""
    WITH feats AS (
      SELECT source, lang, md5(text) AS h,
             len(string_split(text, ' ')) AS n_toks,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
               / len(string_split(text, ' ')) AS q
      FROM documents
    ),
    langs AS (
      SELECT source, lang, COUNT(*) AS nl,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY COUNT(*) DESC, lang) AS rn
      FROM feats GROUP BY source, lang
    ),
    cards AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             ROUND(1.0 - COUNT(DISTINCT h) * 1.0 / COUNT(*), 6) AS dup_rate,
             ROUND(CAST(SUM(CAST(ROUND(q, 9) AS DECIMAL(38,9))) AS DOUBLE)
                   / COUNT(*), 6) AS mean_quality
      FROM feats GROUP BY source
    )
    SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs, c.n_tokens,
           c.dup_rate, c.mean_quality, l.lang AS top_lang
    FROM cards c JOIN langs l ON l.source = c.source AND l.rn = 1
    """,
)
def q119_dataset_cards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source datasheet: doc and token counts, exact-duplicate rate
    (1 - distinct content hashes / docs), mean quality score, dominant
    language — the one-row-per-source summary read before admitting a
    source into a mix (q57) or capping it (q108). One scan; the
    distinct-hash count is the only expansion (use approx_count_distinct
    at 100 TB); quality accumulates per-row-rounded in DECIMAL."""
    docs = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    feats = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.size(toks).alias("n_toks"),
        (
            F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and")))
            * 1.0
            / F.size(toks)
        ).alias("q"),
    )
    langs = (
        feats.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("nl"))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("source").orderBy(F.col("nl").desc(), F.col("lang"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("source", F.col("lang").alias("top_lang"))
    )
    cards = feats.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("n_tokens"),
        F.round(
            1.0 - F.countDistinct("h") * 1.0 / F.count(F.lit(1)), 6
        ).alias("dup_rate"),
        F.round(
            F.sum(F.round(F.col("q"), 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_quality"),
    )
    return cards.join(langs, "source").select(
        "source", "n_docs", "n_tokens", "dup_rate", "mean_quality", "top_lang"
    )


# --- q124: positional phrase search -------------------------------------------------
PHRASE = ("value", "table")


@query(
    "q124_phrase_match",
    oracle=f"""
    WITH pos AS (
      SELECT doc_id, tok, p FROM (
        SELECT doc_id, unnest(tk) AS tok,
               CAST(generate_subscripts(tk, 1) AS BIGINT) AS p
        FROM (SELECT doc_id, string_split(text, ' ') AS tk FROM documents)
      ) WHERE tok IN ('{PHRASE[0]}', '{PHRASE[1]}')
    )
    SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM pos a JOIN pos b
      ON b.doc_id = a.doc_id AND b.p = a.p + 1
    WHERE a.tok = '{PHRASE[0]}' AND b.tok = '{PHRASE[1]}'
    GROUP BY a.doc_id
    """,
)
def q124_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("{P0} {P1}") through a positional posting
    list: posexplode to (doc, term, position), filter to the phrase's
    terms INSIDE the scan stage (only matching postings reach any
    shuffle — q66's prefilter economics), then an adjacency equi-join
    on (doc, position+1). The search-engine primitive the q103 inverted
    index lacks; extends to k-word phrases with k-1 position joins, all
    hash-equi on (doc_id, position)."""
    docs = _docs(spark, sf_dir)
    pos = (
        docs.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("p0", "tok")
        )
        .filter(F.col("tok").isin(*PHRASE))
        .select("doc_id", "tok", (F.col("p0") + 1).cast("long").alias("p"))
    )
    a = pos.filter(F.col("tok") == PHRASE[0]).select("doc_id", "p")
    b = pos.filter(F.col("tok") == PHRASE[1]).select(
        "doc_id", (F.col("p") - 1).alias("p")
    )
    return (
        a.join(b, ["doc_id", "p"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


q124_phrase_match.__doc__ = q124_phrase_match.__doc__.replace(
    "{P0}", PHRASE[0]
).replace("{P1}", PHRASE[1])


# --- q125: LSH-kNN label prediction -------------------------------------------------
@query(
    "q125_lsh_knn_classify",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings
    ),
    bucketed AS (SELECT vec_id, label, {_bucket_duck()} AS bucket FROM e),
    votes AS (
      SELECT a.vec_id, a.label AS true_label, b.label AS nbr_label,
             COUNT(*) AS votes
      FROM bucketed a JOIN bucketed b
        ON b.bucket = a.bucket AND b.vec_id <> a.vec_id
      GROUP BY a.vec_id, a.label, b.label
    ),
    ranked AS (
      SELECT vec_id, true_label, nbr_label AS pred_label,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY votes DESC, nbr_label) AS rn
      FROM votes
    )
    SELECT vec_id, true_label, pred_label,
           pred_label = true_label AS correct
    FROM ranked WHERE rn = 1
    """,
)
def q125_lsh_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-majority label prediction: each vector's predicted label
    is the plurality label among its LSH-bucket neighbours (min-label
    tiebreak, self excluded) — a kNN classifier whose neighbourhood is
    the hash bucket, so the whole prediction is one bucket equi-join +
    one vote aggregate, never a distance computation. The per-vector
    correct flag is the raw material of a label-noise / label-structure
    audit: chance-level agreement (as on this synthetic corpus, whose
    labels are independent of the embedding geometry) means the labels
    do NOT cluster in embedding space — exactly the verdict the audit
    exists to catch."""
    from .vector import _bucket_spark

    e = ensure_parallelism(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    )
    bucketed = e.withColumn("bucket", F.expr(_bucket_spark())).drop("v")
    a = bucketed.select("vec_id", F.col("label").alias("true_label"), "bucket")
    b = bucketed.select(
        F.col("vec_id").alias("_nid"), F.col("label").alias("nbr_label"), "bucket"
    )
    votes = (
        a.join(b, "bucket")
        .filter(F.col("_nid") != F.col("vec_id"))
        .groupBy("vec_id", "true_label", "nbr_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = W.partitionBy("vec_id").orderBy(F.col("votes").desc(), F.col("nbr_label"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "vec_id",
            "true_label",
            F.col("nbr_label").alias("pred_label"),
            (F.col("nbr_label") == F.col("true_label")).alias("correct"),
        )
    )


# --- q126: seasonal residuals -------------------------------------------------------
@query(
    "q126_seasonal_residuals",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h,
             EXTRACT(hour FROM ts) AS hod, COUNT(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    season AS (
      SELECT event_type, hod,
             SUM(n) AS tot, COUNT(*) AS n_hours
      FROM hourly GROUP BY event_type, hod
    )
    SELECT h.event_type, h.h AS hour_ts, CAST(h.n AS BIGINT) AS n_events,
           ROUND(s.tot * 1.0 / s.n_hours, 6) AS seasonal_baseline,
           ROUND(h.n - s.tot * 1.0 / s.n_hours, 6) AS residual
    FROM hourly h
    JOIN season s ON s.event_type = h.event_type AND s.hod = h.hod
    WHERE ABS(h.n * s.n_hours - s.tot) > s.tot
    """,
)
def q126_seasonal_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal anomaly detection: hourly event counts vs the
    hour-of-day seasonal baseline (mean count for that hour across
    days), emitting hours whose residual exceeds the baseline itself —
    the traffic-anomaly primitive behind q96's outage windows. The
    threshold compares cross-multiplied INTEGERS (|n·k - tot| > 2·tot
    scaled), so boundary hours cannot flip between engines; the
    reported baseline/residual round once for display. Two bounded
    aggregates; the season table is types x 24 rows, broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.date_trunc("hour", "ts").alias("hour_ts"),
        F.hour("ts").alias("hod"),
    ).agg(F.count(F.lit(1)).alias("n"))
    season = hourly.groupBy("event_type", "hod").agg(
        F.sum("n").alias("tot"), F.count(F.lit(1)).alias("n_hours")
    )
    joined = hourly.join(F.broadcast(season), ["event_type", "hod"])
    baseline = F.col("tot") * 1.0 / F.col("n_hours")
    # integer-exact gate: |n - tot/k| > tot/k  <=>  |n*k - tot| > tot
    # (residual exceeding 1x the seasonal baseline — ~p99 on this data)
    gate = F.abs(F.col("n") * F.col("n_hours") - F.col("tot")) > F.col("tot")
    return joined.filter(gate).select(
        "event_type",
        "hour_ts",
        F.col("n").cast("bigint").alias("n_events"),
        F.round(baseline, 6).alias("seasonal_baseline"),
        F.round(F.col("n") - baseline, 6).alias("residual"),
    )


# --- q127: near-dup recall curve ----------------------------------------------------
def _neardup_recall_oracle() -> str:
    # reuse the registered oracles verbatim as subqueries: the metric's
    # ground truth and system-under-test are EXACTLY q41 and q48
    from . import REGISTRY
    from . import vector as _v  # noqa: F401  (side effect: registration)

    exact_sql = REGISTRY["q41_embedding_near_dup"].oracle.strip()
    lsh_sql = REGISTRY["q48_lsh_near_dup"].oracle.strip()
    return f"""
    WITH exact_pairs AS (SELECT vec_a, vec_b, cos_sim FROM ({exact_sql})),
    lsh_pairs AS (SELECT vec_a, vec_b FROM ({lsh_sql})),
    binned AS (
      SELECT CAST(FLOOR(e.cos_sim * 10) AS BIGINT) AS sim_bin,
             CASE WHEN l.vec_a IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM exact_pairs e
      LEFT JOIN lsh_pairs l ON l.vec_a = e.vec_a AND l.vec_b = e.vec_b
    )
    SELECT sim_bin, ROUND(sim_bin / 10.0, 1) AS sim_lo,
           CAST(COUNT(*) AS BIGINT) AS n_exact,
           CAST(SUM(hit) AS BIGINT) AS n_found,
           ROUND(SUM(hit) * 1.0 / COUNT(*), 6) AS recall
    FROM binned GROUP BY sim_bin
    """


@query("q127_neardup_recall", oracle=_neardup_recall_oracle())
def q127_neardup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall curve of the banded multi-probe LSH near-dup (q48)
    against the exact all-pairs answer (q41), per 0.1 cosine bin —
    LSH precision is 1.0 by construction (every emitted pair is
    exact-verified), so recall BY SIMILARITY is the entire quality
    story: the curve must approach 1 as similarity rises, and where it
    sags tells you which band resolution to change. Completes the
    calibration family (q109 MinHash error, q115 ANN recall)."""
    from .vector import q41_embedding_near_dup, q48_lsh_near_dup

    exact = q41_embedding_near_dup(spark, sf_dir).select(
        "vec_a", "vec_b", "cos_sim"
    )
    lsh = q48_lsh_near_dup(spark, sf_dir).select(
        F.col("vec_a").alias("la"), F.col("vec_b").alias("lb"), F.lit(1).alias("hit")
    )
    binned = exact.join(
        lsh,
        (F.col("vec_a") == F.col("la")) & (F.col("vec_b") == F.col("lb")),
        "left",
    ).select(
        F.floor(F.col("cos_sim") * 10).cast("bigint").alias("sim_bin"),
        F.coalesce(F.col("hit"), F.lit(0)).alias("hit"),
    )
    return (
        binned.groupBy("sim_bin")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.sum("hit").cast("bigint").alias("n_found"),
            F.round(F.sum("hit") * 1.0 / F.count(F.lit(1)), 6).alias("recall"),
        )
        .select(
            "sim_bin",
            F.round(F.col("sim_bin") / 10.0, 1).alias("sim_lo"),
            "n_exact",
            "n_found",
            "recall",
        )
    )


# --- q128: PSI drift between time windows -------------------------------------------
# Reference = first 15 days, current = the rest. Bin edges are the
# reference window's deciles, so "no drift" reads ~0 by construction.
PSI_SPLIT = "2024-01-16 00:00:00"
PSI_BINS = 10


@query(
    "q128_psi_drift",
    oracle=f"""
    WITH ref AS (SELECT value FROM events WHERE ts < TIMESTAMP '{PSI_SPLIT}'),
    cur AS (SELECT value FROM events WHERE ts >= TIMESTAMP '{PSI_SPLIT}'),
    edges AS (
      SELECT unnest(quantile_cont(value,
               [{", ".join(str(i / PSI_BINS) for i in range(1, PSI_BINS))}]))
               AS edge
      FROM ref
    ),
    rbin AS (
      SELECT r.value,
             COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM edges e
                       WHERE e.edge < r.value), 0) AS bin
      FROM ref r
    ),
    cbin AS (
      SELECT c.value,
             COALESCE((SELECT CAST(COUNT(*) AS BIGINT) FROM edges e
                       WHERE e.edge < c.value), 0) AS bin
      FROM cur c
    ),
    rcnt AS (SELECT bin, COUNT(*) AS nr FROM rbin GROUP BY bin),
    ccnt AS (SELECT bin, COUNT(*) AS nc FROM cbin GROUP BY bin),
    tot AS (SELECT (SELECT COUNT(*) FROM ref) AS tr,
                   (SELECT COUNT(*) FROM cur) AS tc),
    terms AS (
      SELECT r.bin,
             ROUND((r.nr * 1.0 / t.tr - c.nc * 1.0 / t.tc)
                   * ln((r.nr * 1.0 / t.tr) / (c.nc * 1.0 / t.tc)), 8) AS term
      FROM rcnt r JOIN ccnt c ON c.bin = r.bin, tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(38,8))) AS DOUBLE), 5) AS psi
    FROM terms
    """,
)
def q128_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the event-value distribution
    between a reference window (first 15 days) and the current window,
    binned by the REFERENCE deciles — the production drift alarm
    (<0.1 stable, >0.25 act). Decile edges are one bounded aggregate
    broadcast back over both windows; PSI terms round at 8 dp and
    accumulate in DECIMAL (3 decimals finer than the 5-dp output —
    DETERMINISM.md §5). Bins with zero mass on either side would make
    ln undefined; the inner join drops them (standard PSI practice is
    a smoothing constant — on this data every decile is populated)."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(PSI_SPLIT).cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("value")
    cur = ev.filter(F.col("ts") >= split).select("value")
    qs = [i / PSI_BINS for i in range(1, PSI_BINS)]
    edges_row = ref.agg(
        F.expr(
            f"percentile(value, array({', '.join(str(q) for q in qs)}))"
        ).alias("edges")
    )
    def binned(df):
        return (
            df.join(F.broadcast(edges_row))
            .select(
                F.size(F.filter("edges", lambda e: e < F.col("value"))).alias(
                    "bin"
                )
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"))
        )
    rcnt = binned(ref).withColumnRenamed("n", "nr")
    ccnt = binned(cur).withColumnRenamed("n", "nc")
    tots = ref.agg(F.count(F.lit(1)).cast("bigint").alias("tr")).crossJoin(
        cur.agg(F.count(F.lit(1)).cast("bigint").alias("tc"))
    )
    pr = F.col("nr") * 1.0 / F.col("tr")
    pc = F.col("nc") * 1.0 / F.col("tc")
    terms = rcnt.join(ccnt, "bin").crossJoin(F.broadcast(tots)).select(
        F.round((pr - pc) * F.log(pr / pc), 8).alias("term")
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.round(
            F.sum(F.col("term").cast("decimal(38,8)")).cast("double"), 5
        ).alias("psi"),
    )


# --- q129: chi-square independence test ---------------------------------------------
@query(
    "q129_chi_square",
    oracle="""
    WITH obs AS (
      SELECT event_type, EXTRACT(dow FROM ts) AS dow, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_t AS (SELECT event_type, SUM(o) AS nr FROM obs GROUP BY event_type),
    cols_t AS (SELECT dow, SUM(o) AS nc FROM obs GROUP BY dow),
    tot AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
      SELECT ROUND(
               (o.o - r.nr * 1.0 * c.nc / t.n)
               * (o.o - r.nr * 1.0 * c.nc / t.n)
               / (r.nr * 1.0 * c.nc / t.n), 8) AS term
      FROM obs o
      JOIN rows_t r ON r.event_type = o.event_type
      JOIN cols_t c ON c.dow = o.dow, tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(38,8))) AS DOUBLE), 5) AS chi2
    FROM terms
    """,
)
def q129_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square statistic for independence of event type and weekday
    — the categorical drift/association test beside q128's numeric PSI
    and q75's correlations. Contingency cells are one bounded
    aggregate; marginals re-join as broadcasts; each (o-e)^2/e term is
    pure arithmetic on integers (engine-identical doubles) rounded at
    8 dp into a DECIMAL sum, output at 5 dp."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow_s")
    ).agg(F.count(F.lit(1)).alias("o"))
    # DuckDB dow: Sunday=0..Saturday=6; Spark dayofweek: Sunday=1..7
    obs = obs.select("event_type", (F.col("dow_s") - 1).alias("dow"), "o")
    rows_t = obs.groupBy("event_type").agg(F.sum("o").alias("nr"))
    cols_t = obs.groupBy("dow").agg(F.sum("o").alias("nc"))
    tot = ev.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    e = F.col("nr") * 1.0 * F.col("nc") / F.col("nn")
    terms = (
        obs.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round((F.col("o") - e) * (F.col("o") - e) / e, 8).alias("term")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(F.col("term").cast("decimal(38,8)")).cast("double"), 5
        ).alias("chi2"),
    )
