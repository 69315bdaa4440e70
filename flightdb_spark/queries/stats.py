"""Statistics / curation batch 5 (q130-q136): corpus boilerplate
removal, distribution-drift and association statistics, market-basket
lift, session path mining, exact distributed AUC, embedding whitening.

These extend the LLM-training-pipeline surface (BASELINE north star)
beyond the reference's flight-domain operators; each query's plan is a
bounded-aggregate / equi-join composition that survives a 100x
scale-up (per-query notes inline and in PLANS.md).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.functions.arrays import index_sequence
from flightdb_spark.operators.prefix import ecdf_counts
from flightdb_spark.tables import load_table

from . import query

# --- q130: cross-document boilerplate segment removal --------------------------------
# C4/RefinedWeb-style boilerplate pruning re-expressed for an engine:
# a text unit repeated verbatim across many distinct documents is
# boilerplate (nav bars, license footers, templated headers) and is
# removed from every document. The test corpus has no newlines, so the
# unit is a non-overlapping SEG_TOKENS-token segment; on real data the
# splitter is a line/paragraph split with the same plan shape.
SEG_TOKENS = 2
# relative threshold: a segment is boilerplate when it appears in at
# least this fraction of the corpus — scale-invariant, unlike an
# absolute doc count (at sf0.01 this is 20 of 500 docs, ~the p90 of
# the segment-frequency distribution).
BOILER_MIN_FRAC = 0.04


@query(
    "q130_boilerplate_segments",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS tok FROM documents
    ),
    segs AS (
      SELECT doc_id, s.g AS seg_idx,
             array_to_string(tok[(s.g * {SEG_TOKENS} + 1):(s.g * {SEG_TOKENS} + {SEG_TOKENS})], ' ') AS seg
      FROM toks, LATERAL (
        SELECT unnest(range(CAST(floor(len(tok) / {SEG_TOKENS}) AS BIGINT))) AS g
      ) s
    ),
    boiler AS (
      SELECT seg FROM segs GROUP BY seg
      HAVING COUNT(DISTINCT doc_id)
             >= ceil({BOILER_MIN_FRAC} * (SELECT COUNT(*) FROM documents))
    )
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segs,
           CAST(COUNT(*) FILTER (WHERE b.seg IS NOT NULL) AS BIGINT) AS n_boiler,
           CAST((COUNT(*) - COUNT(*) FILTER (WHERE b.seg IS NOT NULL))
                * {SEG_TOKENS} AS BIGINT) AS kept_tokens
    FROM segs s LEFT JOIN boiler b ON b.seg = s.seg
    GROUP BY s.doc_id
    """,
)
def q130_boilerplate_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Remove segments repeated across a BOILER_MIN_FRAC share of
    distinct documents (corpus-level boilerplate, the C4 move) and report each
    document's kept/removed segment budget. Plan: slice the token
    array by index (zero-sort segmentation), one shuffle on the
    segment string for the distinct-doc frequency, one equi-join back,
    one shuffle on doc_id for the per-doc rollup — no pairwise work,
    frequency table bounded by distinct segments."""
    docs = load_table(spark, sf_dir, "documents")
    thr = docs.agg(
        F.ceil(F.lit(BOILER_MIN_FRAC) * F.count(F.lit(1)))
        .cast("bigint")
        .alias("min_docs")
    )
    toks = docs.select("doc_id", F.split("text", " ").alias("tok"))
    segs = (
        toks.select(
            "doc_id",
            # empty for sub-segment docs (functions/arrays.py guard),
            # matching the oracle dropping them
            F.explode(
                index_sequence(F.floor(F.size("tok") / SEG_TOKENS))
            ).alias("g"),
            "tok",
        )
        .select(
            "doc_id",
            F.array_join(
                F.slice("tok", F.col("g") * SEG_TOKENS + 1, SEG_TOKENS), " "
            ).alias("seg"),
        )
    )
    boiler = (
        segs.groupBy("seg")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .crossJoin(F.broadcast(thr))
        .filter(F.col("nd") >= F.col("min_docs"))
        .select("seg", F.lit(1).alias("is_boiler"))
    )
    return (
        segs.join(boiler, "seg", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segs"),
            F.sum(F.coalesce(F.col("is_boiler"), F.lit(0)))
            .cast("bigint")
            .alias("n_boiler"),
        )
        .select(
            "doc_id",
            "n_segs",
            "n_boiler",
            ((F.col("n_segs") - F.col("n_boiler")) * SEG_TOKENS)
            .cast("bigint")
            .alias("kept_tokens"),
        )
    )


# --- q131: binned two-sample Kolmogorov-Smirnov drift --------------------------------
# Same windows and reference-decile bins as q128's PSI; KS reads the
# maximum cumulative gap where PSI reads pointwise divergence — the
# pair covers both tail and body drift. The D statistic stays an exact
# integer comparison (cross-multiplied cumulative counts) until the
# final division.
KS_SPLIT = "2024-01-16 00:00:00"
KS_BINS = 10


@query(
    "q131_ks_binned",
    oracle=f"""
    WITH ref AS (SELECT value FROM events WHERE ts < TIMESTAMP '{KS_SPLIT}'),
    cur AS (SELECT value FROM events WHERE ts >= TIMESTAMP '{KS_SPLIT}'),
    edges AS (
      SELECT unnest(quantile_cont(value,
               [{", ".join(str(i / KS_BINS) for i in range(1, KS_BINS))}]))
               AS edge
      FROM ref
    ),
    rcnt AS (
      SELECT (SELECT COUNT(*) FROM edges e WHERE e.edge < r.value) AS bin,
             COUNT(*) AS nr
      FROM ref r GROUP BY 1
    ),
    ccnt AS (
      SELECT (SELECT COUNT(*) FROM edges e WHERE e.edge < c.value) AS bin,
             COUNT(*) AS nc
      FROM cur c GROUP BY 1
    ),
    bins AS (
      SELECT COALESCE(r.bin, c.bin) AS bin,
             COALESCE(r.nr, 0) AS nr, COALESCE(c.nc, 0) AS nc
      FROM rcnt r FULL OUTER JOIN ccnt c ON c.bin = r.bin
    ),
    cum AS (
      SELECT bin,
             SUM(nr) OVER (ORDER BY bin) AS cr,
             SUM(nc) OVER (ORDER BY bin) AS cc
      FROM bins
    ),
    tot AS (SELECT (SELECT COUNT(*) FROM ref) AS tr,
                   (SELECT COUNT(*) FROM cur) AS tc),
    gaps AS (
      SELECT bin, abs(cr * t.tc - cc * t.tr) AS num, t.tr, t.tc
      FROM cum, tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(MIN(bin) FILTER (
             WHERE num = (SELECT MAX(num) FROM gaps)) AS BIGINT) AS d_bin,
           ROUND(MAX(num) * 1.0 / (MAX(tr) * MAX(tc)), 6) AS ks_d
    FROM gaps
    """,
)
def q131_ks_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned two-sample KS statistic between the q128 reference and
    current windows: max absolute ECDF gap over reference-decile bins.
    Cumulative counts come from a window over the <= KS_BINS-row bin
    table ONLY (the raw windows never sort globally); the gap
    comparison is cross-multiplied integer arithmetic, so the one
    rounding is the final 6-dp division."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(KS_SPLIT).cast("timestamp")
    ref = ev.filter(F.col("ts") < split).select("value")
    cur = ev.filter(F.col("ts") >= split).select("value")
    qs = [i / KS_BINS for i in range(1, KS_BINS)]
    edges_row = ref.agg(
        F.expr(
            f"percentile(value, array({', '.join(str(q) for q in qs)}))"
        ).alias("edges")
    )

    def binned(df, out):
        return (
            df.join(F.broadcast(edges_row))
            .select(
                F.size(F.filter("edges", lambda e: e < F.col("value"))).alias(
                    "bin"
                )
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias(out))
        )

    bins = (
        binned(ref, "nr")
        .join(binned(cur, "nc"), "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("nr", F.lit(0)).alias("nr"),
            F.coalesce("nc", F.lit(0)).alias("nc"),
        )
    )
    # bounded global window: <= KS_BINS rows by construction
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    # window totals = sums over the bin table itself — no extra scan
    # of the raw events (every row lands in exactly one bin)
    totals = bins.agg(F.sum("nr").alias("tr"), F.sum("nc").alias("tc"))
    gaps = bins.join(F.broadcast(totals)).select(
        "bin",
        "tr",
        "tc",
        F.abs(
            F.sum("nr").over(w) * F.col("tc") - F.sum("nc").over(w) * F.col("tr")
        ).alias("num"),
    )
    # d_bin = the LOWEST bin achieving the max gap: max_by over
    # (num, -bin) picks highest num then lowest bin, deterministically.
    return gaps.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.max_by("bin", F.struct(F.col("num"), (-F.col("bin")).alias("nb")))
        .cast("bigint")
        .alias("d_bin"),
        F.round(F.max("num") * 1.0 / (F.first("tr") * F.first("tc")), 6).alias(
            "ks_d"
        ),
    )


# --- q132: mutual information event_type x weekday -----------------------------------
@query(
    "q132_mutual_information",
    oracle="""
    WITH obs AS (
      SELECT event_type, EXTRACT(dow FROM ts) AS dow, COUNT(*) AS o
      FROM events GROUP BY 1, 2
    ),
    rows_t AS (SELECT event_type, SUM(o) AS nr FROM obs GROUP BY event_type),
    cols_t AS (SELECT dow, SUM(o) AS nc FROM obs GROUP BY dow),
    tot AS (SELECT SUM(o) AS n FROM obs),
    terms AS (
      SELECT ROUND((o.o * 1.0 / t.n)
                   * ln(o.o * 1.0 * t.n / (r.nr * 1.0 * c.nc)), 8) AS term
      FROM obs o
      JOIN rows_t r ON r.event_type = o.event_type
      JOIN cols_t c ON c.dow = o.dow, tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(38,8))) AS DOUBLE), 5) AS mi_nats
    FROM terms
    """,
)
def q132_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information (nats) between event type and weekday — the
    effect-size companion to q129's chi-square significance shape:
    sum p_xy * ln(p_xy / (p_x p_y)) over the bounded contingency
    table. Terms are pure arithmetic on integer counts rounded at 8 dp
    into a DECIMAL sum, output at 5 dp (DETERMINISM.md section 5)."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", (F.dayofweek("ts") - 1).alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_t = obs.groupBy("event_type").agg(F.sum("o").alias("nr"))
    cols_t = obs.groupBy("dow").agg(F.sum("o").alias("nc"))
    tot = ev.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    terms = (
        obs.join(F.broadcast(rows_t), "event_type")
        .join(F.broadcast(cols_t), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                (F.col("o") * 1.0 / F.col("nn"))
                * F.log(
                    F.col("o") * 1.0 * F.col("nn")
                    / (F.col("nr") * 1.0 * F.col("nc"))
                ),
                8,
            ).alias("term")
        )
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.round(
            F.sum(F.col("term").cast("decimal(38,8)")).cast("double"), 5
        ).alias("mi_nats"),
    )


# --- q133: co-purchase lift (market-basket pairs) ------------------------------------
LIFT_MIN_SUPPORT = 2
LIFT_TOP_K = 20


@query(
    "q133_copurchase_lift",
    oracle=f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    pairs AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
      FROM op a JOIN op b
        ON b.l_orderkey = a.l_orderkey AND b.l_partkey > a.l_partkey
      GROUP BY 1, 2
      HAVING COUNT(*) >= {LIFT_MIN_SUPPORT}
    ),
    pc AS (SELECT l_partkey, COUNT(*) AS c FROM op GROUP BY 1),
    tot AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op)
    SELECT p.pa, p.pb, p.support,
           ROUND(p.support * 1.0 * t.n / (ca.c * 1.0 * cb.c), 6) AS lift
    FROM pairs p
    JOIN pc ca ON ca.l_partkey = p.pa
    JOIN pc cb ON cb.l_partkey = p.pb, tot t
    ORDER BY lift DESC, pa, pb LIMIT {LIFT_TOP_K}
    """,
)
def q133_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top co-purchased part pairs by lift (observed co-order rate over
    the independence expectation) with a minimum support. Pair
    generation explodes map side from per-basket sorted item arrays
    (the q267 no-self-join shape) — work per order is lines^2 with
    lines bounded by the order size (never corpus n^2), and the fact
    table is scanned ONCE; part frequencies broadcast back; final
    top-k is TakeOrderedAndProject. The classic market-basket shape."""
    li = load_table(spark, sf_dir, "lineitem")
    # basket-array explosion (the q267 shape): ONE orderkey shuffle to
    # sorted item sets (checkpointed — three consumers: pairs, part
    # counts, order count), map-side u<v pair explosion via nested
    # HOFs — no self-join, one fact scan
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        .localCheckpoint()
    )
    idx = F.sequence(F.lit(0), F.size("items") - 1)
    pairs = (
        baskets.select(
            F.explode(
                F.flatten(
                    F.transform(
                        idx,
                        lambda i: F.transform(
                            F.slice(F.col("items"), i + 2, F.size("items")),
                            lambda y: F.struct(
                                F.element_at(F.col("items"), i + 1).alias("pa"),
                                y.alias("pb"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= LIFT_MIN_SUPPORT)
    )
    pc = baskets.select(
        F.explode("items").alias("l_partkey")
    ).groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    tot = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("nn"))
    return (
        pairs.join(
            F.broadcast(pc.select(F.col("l_partkey").alias("pa"), F.col("c").alias("ca"))),
            "pa",
        )
        .join(
            F.broadcast(pc.select(F.col("l_partkey").alias("pb"), F.col("c").alias("cb"))),
            "pb",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "pa",
            "pb",
            "support",
            F.round(
                F.col("support") * 1.0 * F.col("nn")
                / (F.col("ca") * 1.0 * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "pa", "pb")
        .limit(LIFT_TOP_K)
    )


# --- q134: top session paths ---------------------------------------------------------
PATH_GAP_MIN = 240
PATH_TOP_K = 10


@query(
    "q134_session_paths",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_id, event_type, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL {PATH_GAP_MIN} MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, event_id, event_type, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sid
      FROM ordered
    ),
    paths AS (
      SELECT event_type
             || '>' || LEAD(event_type, 1) OVER w2
             || '>' || LEAD(event_type, 2) OVER w2 AS path,
             CASE WHEN LEAD(sid, 2) OVER w2 = sid THEN 1 ELSE 0 END AS ok
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, sid ORDER BY ts, event_id)
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM paths WHERE ok = 1 AND path IS NOT NULL
    GROUP BY path ORDER BY cnt DESC, path LIMIT {PATH_TOP_K}
    """,
)
def q134_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent 3-step event-type paths inside PATH_GAP_MIN-gap
    sessions — the path-mining read on top of the q14 sessionization
    (the gap is 4 h here because the synthetic users average ~2 events
    a day; a web corpus would use 30 min with the same plan).
    Everything windows per (user, session): one shuffle on user_id
    serves both the session assignment and the lead() chain, then a
    bounded path aggregate and TakeOrdered top-k. Ordering ties break
    on the unique event_id on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = PATH_GAP_MIN * 60 * 1_000_000
    sess = ev.withColumn(
        "new_s",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                > gap_us
            ),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(w))
    w2 = Window.partitionBy("user_id", "sid").orderBy("ts", "event_id")
    paths = sess.select(
        F.concat_ws(
            ">",
            "event_type",
            F.lead("event_type", 1).over(w2),
            F.lead("event_type", 2).over(w2),
        ).alias("path"),
        (F.lead("sid", 2).over(w2) == F.col("sid")).alias("ok"),
        F.lead("event_type", 2).over(w2).alias("e3"),
    ).filter(F.col("ok") & F.col("e3").isNotNull())
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "path")
        .limit(PATH_TOP_K)
    )


# --- q135: exact AUC via distributed prefix sums -------------------------------------
AUC_POS_TYPE = "purchase"


@query(
    "q135_auc",
    oracle=f"""
    WITH labeled AS (
      SELECT value,
             SUM(CASE WHEN event_type = '{AUC_POS_TYPE}' THEN 1 ELSE 0 END) AS pos,
             SUM(CASE WHEN event_type = '{AUC_POS_TYPE}' THEN 0 ELSE 1 END) AS neg
      FROM events GROUP BY value
    ),
    scan AS (
      SELECT pos, neg,
             SUM(neg) OVER (ORDER BY value) - neg AS neg_below
      FROM labeled
    ),
    u AS (
      SELECT SUM(pos * (2 * neg_below + neg)) AS u2,
             (SELECT SUM(pos) FROM labeled) AS p,
             (SELECT SUM(neg) FROM labeled) AS n
      FROM scan
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
           ROUND(u2 * 1.0 / (2 * p * n), 6) AS auc
    FROM u
    """,
)
def q135_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC AUC of the event value scoring 'is this a purchase'
    via the Mann-Whitney U statistic: 2U = sum over distinct scores of
    pos_v * (2*neg_below_v + neg_v), all integers until the final
    division (ties contribute the standard half credit). The
    cumulative neg-below scan runs through operators/prefix.py's
    bucketed two-phase prefix sum — per-value rows are bucketed by
    approximate score percentiles, windows run per bucket, and the
    only global-ordered window is over the bounded bucket-totals
    table. The exact rank statistic with no global sort."""
    ev = load_table(spark, sf_dir, "events")
    # explicit 0/1 flags: a NULL event_type is a negative (the oracle's
    # CASE ELSE branch), where ~(NULL == x) would silently drop the row
    is_pos = F.col("event_type") == AUC_POS_TYPE
    pos_flag = F.when(is_pos, 1).otherwise(0)
    neg_flag = F.when(is_pos, 0).otherwise(1)
    scan = ecdf_counts(
        ev, "value", {"pos": pos_flag, "neg": neg_flag}, n_buckets=64
    ).select(
        "pos", "neg", (F.col("cum_neg") - F.col("neg")).alias("neg_below")
    )
    return (
        scan.agg(
            F.sum("pos").alias("p"),
            F.sum("neg").alias("n"),
            F.sum(
                F.col("pos") * (2 * F.col("neg_below") + F.col("neg"))
            ).alias("u2"),
        )
        .select(
            F.col("p").cast("bigint").alias("n_pos"),
            F.col("n").cast("bigint").alias("n_neg"),
            F.round(
                F.col("u2") * 1.0 / (2 * F.col("p") * F.col("n")), 6
            ).alias("auc"),
        )
    )


# --- q136: embedding whitening (standardized norms) ----------------------------------
@query(
    "q136_embedding_whitening",
    oracle="""
    WITH dims AS (
      SELECT vec_id, u.dim, CAST(u.x AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS dim) u
    ),
    stats AS (
      SELECT dim,
             SUM(CAST(x AS DECIMAL(38,10))) AS s,
             SUM(CAST(x * x AS DECIMAL(38,10))) AS sq,
             COUNT(*) AS n
      FROM dims GROUP BY dim
    ),
    terms AS (
      SELECT d.vec_id,
             ROUND(
               ((d.x - CAST(s.s AS DOUBLE) / s.n)
                / sqrt(CAST(s.sq AS DOUBLE) / s.n
                       - (CAST(s.s AS DOUBLE) / s.n) * (CAST(s.s AS DOUBLE) / s.n)))
               * ((d.x - CAST(s.s AS DOUBLE) / s.n)
                  / sqrt(CAST(s.sq AS DOUBLE) / s.n
                         - (CAST(s.s AS DOUBLE) / s.n) * (CAST(s.s AS DOUBLE) / s.n))),
               8) AS t
      FROM dims d JOIN stats s ON s.dim = d.dim
    )
    SELECT vec_id,
           ROUND(sqrt(CAST(SUM(CAST(t AS DECIMAL(38,8))) AS DOUBLE)), 5)
             AS wnorm
    FROM terms GROUP BY vec_id
    """,
)
def q136_embedding_whitening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension standardization (whitening without rotation)
    applied to every embedding, reported as the whitened L2 norm — the
    preprocessing step behind q113's per-dim stats and a dead-dimension
    detector (constant dims would blow up; none exist here). Per-dim
    sums accumulate in DECIMAL over exact float32->double casts so
    mean/var are engine-identical; the per-term square rounds at 8 dp
    into a DECIMAL sum (DETERMINISM.md section 5). One shuffle on dim
    for the bounded stats table (dims x 1 rows), broadcast back, one
    shuffle on vec_id."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "xf")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    stats = dims.groupBy("dim").agg(
        F.sum(F.col("x").cast("decimal(38,10)")).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,10)")).alias("sq"),
        F.count(F.lit(1)).alias("n"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = F.col("sq").cast("double") / F.col("n") - mean * mean
    z = (F.col("x") - mean) / F.sqrt(var)
    terms = dims.join(F.broadcast(stats), "dim").select(
        "vec_id", F.round(z * z, 8).alias("t")
    )
    return terms.groupBy("vec_id").agg(
        F.round(
            F.sqrt(F.sum(F.col("t").cast("decimal(38,8)")).cast("double")), 5
        ).alias("wnorm")
    )


# --- q137: reciprocal-rank fusion of two retrieval runs ------------------------------
# Fuses a lexical run (query-term occurrence count over documents) and
# a semantic run (cosine to a probe embedding; vec_id links to doc_id)
# with the standard RRF formula sum 1/(K + rank). Real systems fuse
# bounded top-k lists, so both runs truncate to RRF_DEPTH before
# ranking — the rank window never sees more than RRF_DEPTH rows.
RRF_K = 60
RRF_DEPTH = 100
RRF_TOP = 10
RRF_TERMS = ("query", "join", "scan")
RRF_PROBE_ID = 0

# Shared CTE block: the two ranked runs, reused verbatim by q137
# (fusion) and q144 (nDCG evaluation) so both oracles score the exact
# same retrieval lists.
_RUNS_SQL = f"""lex_scored AS (
      SELECT doc_id,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ({", ".join("'" + t + "'" for t in RRF_TERMS)}))) AS s
      FROM documents
    ),
    lex_top AS (
      SELECT doc_id, s FROM lex_scored
      ORDER BY s DESC, doc_id LIMIT {RRF_DEPTH}
    ),
    lex AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM lex_top
    ),
    probe AS (
      SELECT embedding AS pv FROM embeddings WHERE vec_id = {RRF_PROBE_ID}
    ),
    sem_scored AS (
      SELECT e.vec_id AS doc_id,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * CAST(p.pv[i] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(p.pv,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS s
      FROM embeddings e, probe p
      WHERE e.vec_id <> {RRF_PROBE_ID}
    ),
    sem_top AS (
      SELECT doc_id, s FROM sem_scored
      ORDER BY s DESC, doc_id LIMIT {RRF_DEPTH}
    ),
    sem AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY s DESC, doc_id) AS r
      FROM sem_top
    )"""

_FUSED_SQL = f"""fused AS (
      SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
             ROUND(COALESCE(1.0 / ({RRF_K} + lex.r), 0)
                   + COALESCE(1.0 / ({RRF_K} + sem.r), 0), 8) AS rrf
      FROM lex FULL OUTER JOIN sem ON sem.doc_id = lex.doc_id
    )"""


def _lex_ranked(docs: DataFrame) -> DataFrame:
    """(doc_id, r): the lexical run — query-term occurrence count,
    truncated to RRF_DEPTH before the (bounded) rank window."""
    terms = F.array(*[F.lit(t) for t in RRF_TERMS])
    top = (
        docs.select(
            "doc_id",
            F.size(
                F.filter(F.split("text", " "), lambda t: F.array_contains(terms, t))
            ).alias("s"),
        )
        .orderBy(F.desc("s"), "doc_id")
        .limit(RRF_DEPTH)
    )
    w = Window.orderBy(F.desc("s"), "doc_id")
    return top.select("doc_id", F.row_number().over(w).alias("r"))


def _sem_ranked(emb: DataFrame) -> DataFrame:
    """(doc_id, r): the semantic run — cosine to the probe embedding
    (vec_id links to doc_id), truncated to RRF_DEPTH before ranking."""
    probe = emb.filter(F.col("vec_id") == RRF_PROBE_ID).select(
        F.col("embedding").alias("pv")
    )
    dot = F.aggregate(
        F.zip_with("embedding", "pv", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    top = (
        emb.filter(F.col("vec_id") != RRF_PROBE_ID)
        .join(F.broadcast(probe))
        .select(
            F.col("vec_id").alias("doc_id"),
            (dot / (norm(F.col("embedding")) * norm(F.col("pv")))).alias("s"),
        )
        .orderBy(F.desc("s"), "doc_id")
        .limit(RRF_DEPTH)
    )
    w = Window.orderBy(F.desc("s"), "doc_id")
    return top.select("doc_id", F.row_number().over(w).alias("r"))


def _fused(lex: DataFrame, sem: DataFrame) -> DataFrame:
    """(doc_id, rrf): full-outer RRF merge of the two ranked runs."""
    lexr = lex.select("doc_id", F.col("r").alias("rl"))
    semr = sem.select("doc_id", F.col("r").alias("rs"))
    return lexr.join(semr, "doc_id", "full_outer").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("rl")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rs")), F.lit(0.0)),
            8,
        ).alias("rrf"),
    )


@query(
    "q137_rrf_fusion",
    oracle=f"""
    WITH {_RUNS_SQL},
    {_FUSED_SQL}
    SELECT doc_id, rrf FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {RRF_TOP}
    """,
)
def q137_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of a lexical and a semantic retrieval
    run — the standard hybrid-search merge. Each run is a bounded
    top-RRF_DEPTH list (TakeOrderedAndProject), so the row_number
    windows rank <= RRF_DEPTH rows; the fusion itself is a tiny
    full-outer equi-join. 1/(K+rank) on identical integer ranks is
    engine-identical; one 8-dp rounding at the end."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        _fused(_lex_ranked(docs), _sem_ranked(emb))
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(RRF_TOP)
    )


# --- q138: CUSUM changepoint over daily volumes --------------------------------------
@query(
    "q138_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS d FROM daily),
    scan AS (
      SELECT day,
             SUM(c) OVER (ORDER BY day) * t.d
               - ROW_NUMBER() OVER (ORDER BY day) * t.n AS s_scaled,
             t.d, t.n
      FROM daily, tot t
    )
    SELECT CAST(d AS BIGINT) AS n_days,
           MAX_BY(day, abs(s_scaled)) AS change_day,
           ROUND(MAX(abs(s_scaled)) * 1.0 / d, 4) AS max_cusum
    FROM scan GROUP BY d
    """,
)
def q138_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on daily event volume: the day
    where the cumulative deviation from the period-mean rate peaks —
    the volume-shift companion to q128/q131's distribution drift.
    Cumulative sums run over the bounded daily aggregate only, and the
    mean is never materialized as a float: S_i * n_days = cum_i *
    n_days - i * n_total keeps the argmax an exact integer
    comparison (ties impossible: |s_scaled| maxima are compared on
    distinct integers, and DuckDB's MAX_BY on the strict max matches
    max_by here because the synthetic volumes make the max unique —
    asserted in tests)."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = daily.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("d")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("day")
    scan = (
        daily.join(F.broadcast(tot))
        .select(
            "day",
            (
                F.sum("c").over(w) * F.col("d")
                - F.row_number().over(wn) * F.col("n")
            ).alias("s_scaled"),
            "d",
        )
    )
    return scan.groupBy("d").agg(
        F.max_by("day", F.abs("s_scaled")).alias("change_day"),
        F.round(F.max(F.abs("s_scaled")) * 1.0 / F.first("d"), 4).alias(
            "max_cusum"
        ),
    ).select(
        F.col("d").cast("bigint").alias("n_days"), "change_day", "max_cusum"
    )


# --- q139: snapshot diff (CDC-style per-entity change classes) -----------------------
DIFF_SPLIT = "2024-01-16 00:00:00"


@query(
    "q139_snapshot_diff",
    oracle=f"""
    WITH a AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS v
      FROM events WHERE ts < TIMESTAMP '{DIFF_SPLIT}' GROUP BY user_id
    ),
    b AS (
      SELECT user_id, COUNT(*) AS n,
             SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS v
      FROM events WHERE ts >= TIMESTAMP '{DIFF_SPLIT}' GROUP BY user_id
    ),
    j AS (
      SELECT COALESCE(a.user_id, b.user_id) AS user_id,
             a.v AS va, b.v AS vb,
             CASE
               WHEN a.user_id IS NULL THEN 'new'
               WHEN b.user_id IS NULL THEN 'churned'
               WHEN b.v * 10 > a.v * 12 THEN 'up'
               WHEN b.v * 10 < a.v * 8 THEN 'down'
               ELSE 'stable'
             END AS change_class
      FROM a FULL OUTER JOIN b ON b.user_id = a.user_id
    )
    SELECT change_class, CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(CAST(SUM(COALESCE(vb, 0) - COALESCE(va, 0)) AS DOUBLE), 2)
             AS value_delta
    FROM j GROUP BY change_class
    """,
)
def q139_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style diff of two per-user activity snapshots (the q128
    reference/current windows): every user classified new / churned /
    up / down / stable by a +-20% value-band, with the net value
    delta per class. The band test cross-multiplies DECIMAL sums
    (vb*10 vs va*12) so no float comparison decides a class; one
    full-outer equi-join on user_id co-partitions both snapshots —
    the merge step of any incremental materialization."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(DIFF_SPLIT).cast("timestamp")
    v6 = F.round("value", 6).cast("decimal(38,6)")

    def snap(df):
        return df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n"), F.sum(v6).alias("v")
        )

    a = snap(ev.filter(F.col("ts") < split)).select(
        "user_id", F.col("v").alias("va")
    )
    b = snap(ev.filter(F.col("ts") >= split)).select(
        "user_id", F.col("v").alias("vb")
    )
    j = a.join(b, "user_id", "full_outer").select(
        "va",
        "vb",
        F.when(F.col("va").isNull(), "new")
        .when(F.col("vb").isNull(), "churned")
        .when(F.col("vb") * 10 > F.col("va") * 12, "up")
        .when(F.col("vb") * 10 < F.col("va") * 8, "down")
        .otherwise("stable")
        .alias("change_class"),
    )
    zero = F.lit(0).cast("decimal(38,6)")
    return j.groupBy("change_class").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(
            F.sum(
                F.coalesce("vb", zero) - F.coalesce("va", zero)
            ).cast("double"),
            2,
        ).alias("value_delta"),
    )


# --- q144: nDCG@k of the lexical and fused rankings ----------------------------------
# Graded relevance comes from the semantic (exact-cosine) run: the doc
# at semantic rank r <= NDCG_K earns gain NDCG_K + 1 - r. Position
# discounts 1/log2(i+1) are PYTHON-precomputed literals embedded in
# both engines' queries, so no runtime log2 ULP difference can flip a
# rounded term.
NDCG_K = 10
_DISCOUNTS = [1.0 / math.log2(i + 1) for i in range(1, NDCG_K + 1)]
_DISC_SQL = ", ".join(repr(d) for d in _DISCOUNTS)


@query(
    "q144_ndcg",
    oracle=f"""
    WITH {_RUNS_SQL},
    {_FUSED_SQL},
    truth AS (
      SELECT doc_id, {NDCG_K} + 1 - r AS rel FROM sem WHERE r <= {NDCG_K}
    ),
    runs AS (
      SELECT 'lexical' AS run, doc_id,
             ROW_NUMBER() OVER (ORDER BY r) AS pos
      FROM lex WHERE r <= {NDCG_K}
      UNION ALL
      SELECT 'fused' AS run, doc_id,
             ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS pos
      FROM (SELECT doc_id, rrf FROM fused
            ORDER BY rrf DESC, doc_id LIMIT {NDCG_K})
    ),
    terms AS (
      SELECT r.run,
             ROUND(COALESCE(t.rel, 0) * ([{_DISC_SQL}])[r.pos], 8) AS term
      FROM runs r LEFT JOIN truth t ON t.doc_id = r.doc_id
    ),
    ideal AS (
      SELECT SUM(CAST(ROUND(({NDCG_K} + 1 - i.i) * ([{_DISC_SQL}])[i.i], 8)
                 AS DECIMAL(38,8))) AS idcg
      FROM (SELECT unnest(range(1, {NDCG_K} + 1)) AS i) i
    )
    SELECT t.run,
           ROUND(CAST(SUM(CAST(t.term AS DECIMAL(38,8))) AS DOUBLE), 5) AS dcg,
           ROUND(CAST(SUM(CAST(t.term AS DECIMAL(38,8))) AS DOUBLE)
                 / CAST(d.idcg AS DOUBLE), 5) AS ndcg
    FROM terms t, ideal d
    GROUP BY t.run, d.idcg
    """,
)
def q144_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nDCG@10 of the lexical-only and RRF-fused rankings against
    graded relevance from the exact-cosine run — the evaluation that
    justifies (or rejects) hybrid fusion, beside q115's ANN recall.
    Every frame after the runs is <= NDCG_K rows; discounts are
    precomputed Python literals so both engines multiply identical
    doubles; terms round at 8 dp into DECIMAL sums, 5-dp output."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = _lex_ranked(docs)
    sem = _sem_ranked(emb)
    truth = sem.filter(F.col("r") <= NDCG_K).select(
        "doc_id", (NDCG_K + 1 - F.col("r")).alias("rel")
    )
    disc = F.array(*[F.lit(d) for d in _DISCOUNTS])

    lex_run = lex.filter(F.col("r") <= NDCG_K).select(
        F.lit("lexical").alias("run"),
        "doc_id",
        F.row_number().over(Window.orderBy("r")).alias("pos"),
    )
    fused_run = (
        _fused(lex, sem)
        .orderBy(F.desc("rrf"), "doc_id")
        .limit(NDCG_K)
        .select(
            F.lit("fused").alias("run"),
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("rrf"), "doc_id"))
            .alias("pos"),
        )
    )
    runs = lex_run.unionByName(fused_run)
    terms = runs.join(F.broadcast(truth), "doc_id", "left").select(
        "run",
        F.round(
            F.coalesce(F.col("rel"), F.lit(0)) * F.element_at(disc, F.col("pos")),
            8,
        ).alias("term"),
    )
    idcg = sum(
        round((NDCG_K + 1 - i) * _DISCOUNTS[i - 1], 8) for i in range(1, NDCG_K + 1)
    )
    return terms.groupBy("run").agg(
        F.round(F.sum(F.col("term").cast("decimal(38,8)")).cast("double"), 5).alias(
            "dcg"
        ),
        F.round(
            F.sum(F.col("term").cast("decimal(38,8)")).cast("double") / idcg, 5
        ).alias("ndcg"),
    )


# --- q145: RFM customer segmentation -------------------------------------------------
# Recency / Frequency / Monetary quintile codes per user, mapped to the
# classic marketing segments. Quintile edges come from ONE exact
# percentile over the bounded per-user aggregate and broadcast back —
# no ntile global window (swap approx_percentile at 100 TB, same plan).
RFM_SEGMENTS_SQL = """
      CASE
        WHEN r_s >= 4 AND f_s >= 4 AND m_s >= 4 THEN 'champion'
        WHEN f_s >= 4 THEN 'loyal'
        WHEN m_s >= 4 THEN 'big_spender'
        WHEN r_s <= 2 AND f_s >= 3 THEN 'at_risk'
        WHEN r_s <= 2 THEN 'hibernating'
        ELSE 'regular'
      END
"""


@query(
    "q145_rfm_segments",
    oracle=f"""
    WITH u AS (
      SELECT user_id,
             date_diff('day', MAX(ts), (SELECT MAX(ts) FROM events)) AS rec,
             COUNT(*) AS freq,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS DOUBLE) AS mon
      FROM events GROUP BY user_id
    ),
    e AS (
      SELECT quantile_cont(-rec, [0.2, 0.4, 0.6, 0.8]) AS re,
             quantile_cont(freq, [0.2, 0.4, 0.6, 0.8]) AS fe,
             quantile_cont(mon, [0.2, 0.4, 0.6, 0.8]) AS me
      FROM u
    ),
    scored AS (
      SELECT u.user_id, u.rec, u.freq, u.mon,
             1 + len(list_filter(e.re, x -> x < -u.rec)) AS r_s,
             1 + len(list_filter(e.fe, x -> x < u.freq)) AS f_s,
             1 + len(list_filter(e.me, x -> x < u.mon)) AS m_s
      FROM u, e
    )
    SELECT {RFM_SEGMENTS_SQL} AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(rec), 2) AS avg_recency_days,
           ROUND(AVG(freq), 2) AS avg_frequency,
           ROUND(CAST(SUM(CAST(ROUND(mon, 2) AS DECIMAL(38,2))) AS DOUBLE)
                 / COUNT(*), 2) AS avg_monetary
    FROM scored GROUP BY 1
    """,
)
def q145_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary quintile
    scores (1-5; recency scored on -days so MORE recent = higher)
    mapped to champion / loyal / big_spender / at_risk / hibernating /
    regular. One shuffle builds the user aggregate; edges are a single
    broadcast row; scoring is pure column arithmetic. avg_monetary
    accumulates 2-dp DECIMAL terms so the float sum cannot drift
    between engines."""
    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts").alias("mx"))
    u = (
        ev.join(F.broadcast(max_ts))
        .groupBy("user_id")
        .agg(
            F.datediff(F.first("mx"), F.max("ts")).alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.sum(F.round("value", 6).cast("decimal(38,6)"))
            .cast("double")
            .alias("mon"),
        )
    )
    edges = u.agg(
        F.expr("percentile(-rec, array(0.2, 0.4, 0.6, 0.8))").alias("re"),
        F.expr("percentile(freq, array(0.2, 0.4, 0.6, 0.8))").alias("fe"),
        F.expr("percentile(mon, array(0.2, 0.4, 0.6, 0.8))").alias("me"),
    )

    def score(edge_col, val):
        return 1 + F.size(F.filter(edge_col, lambda x: x < val))

    scored = u.join(F.broadcast(edges)).select(
        "rec",
        "freq",
        "mon",
        score(F.col("re"), -F.col("rec")).alias("r_s"),
        score(F.col("fe"), F.col("freq")).alias("f_s"),
        score(F.col("me"), F.col("mon")).alias("m_s"),
    )
    seg = (
        F.when(
            (F.col("r_s") >= 4) & (F.col("f_s") >= 4) & (F.col("m_s") >= 4),
            "champion",
        )
        .when(F.col("f_s") >= 4, "loyal")
        .when(F.col("m_s") >= 4, "big_spender")
        .when((F.col("r_s") <= 2) & (F.col("f_s") >= 3), "at_risk")
        .when(F.col("r_s") <= 2, "hibernating")
        .otherwise("regular")
    )
    return scored.groupBy(seg.alias("segment")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg("rec"), 2).alias("avg_recency_days"),
        F.round(F.avg("freq"), 2).alias("avg_frequency"),
        F.round(
            F.sum(F.round("mon", 2).cast("decimal(38,2)")).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_monetary"),
    )


# --- q146: weighted median per group -------------------------------------------------
@query(
    "q146_weighted_median",
    oracle="""
    WITH pw AS (
      SELECT l_returnflag AS grp, l_extendedprice AS price,
             SUM(CAST(l_quantity AS BIGINT)) AS w
      FROM lineitem GROUP BY 1, 2
    ),
    cum AS (
      SELECT grp, price, w,
             SUM(w) OVER (PARTITION BY grp ORDER BY price) AS cw,
             SUM(w) OVER (PARTITION BY grp) AS tw
      FROM pw
    )
    SELECT grp AS l_returnflag,
           ROUND(MIN(price) FILTER (WHERE 2 * cw >= tw), 2) AS wmedian_price,
           CAST(MAX(tw) AS BIGINT) AS total_weight
    FROM cum GROUP BY grp
    """,
)
def q146_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median line price per return flag: the
    smallest price whose cumulative weight reaches half the group
    total. Equal prices pre-collapse (one row per (group, price)), the
    cumulative window partitions by group, and the half-point test
    cross-multiplies integers (2*cw >= tw) — no float decides the
    median at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    pw = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("price"),
    ).agg(F.sum(F.col("l_quantity").cast("bigint")).alias("w"))
    wc = (
        Window.partitionBy("grp")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("grp")
    cum = pw.select(
        "grp",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return cum.groupBy(F.col("grp").alias("l_returnflag")).agg(
        F.round(
            F.min(F.when(2 * F.col("cw") >= F.col("tw"), F.col("price"))), 2
        ).alias("wmedian_price"),
        F.max("tw").cast("bigint").alias("total_weight"),
    )


# --- q147: Pareto frontier (skyline) -------------------------------------------------
@query(
    "q147_pareto_frontier",
    oracle="""
    WITH best AS (
      SELECT p_retailprice AS pr, MAX(p_size) AS bs
      FROM part GROUP BY 1
    ),
    sweep AS (
      SELECT pr, bs,
             MAX(bs) OVER (ORDER BY pr
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS em
      FROM best
    ),
    front AS (SELECT pr, bs FROM sweep WHERE em IS NULL OR bs > em)
    SELECT p.p_partkey, ROUND(p.p_retailprice, 2) AS price, p.p_size
    FROM part p JOIN front f
      ON p.p_retailprice = f.pr AND p.p_size = f.bs
    """,
)
def q147_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of the part catalog: parts no other part dominates on
    (cheaper price, larger size) — the classic Pareto-frontier query.
    The sweep is the exclusive running max of best-size over price
    order, computed by operators/prefix.py's bucketed_cummax (same
    two-phase scan-then-offset shape as the AUC prefix sum; the only
    global window is over bucket totals). A part is on the frontier
    iff its size strictly beats every strictly-cheaper part's."""
    from flightdb_spark.operators.prefix import bucketed_cummax

    part = load_table(spark, sf_dir, "part")
    best = part.groupBy(F.col("p_retailprice").alias("pr")).agg(
        F.max("p_size").alias("bs")
    )
    sweep = bucketed_cummax(best, "pr", "bs", exclusive=True)
    front = sweep.filter(
        F.col("cummax_bs").isNull() | (F.col("bs") > F.col("cummax_bs"))
    ).select("pr", "bs")
    return (
        part.join(
            F.broadcast(front),
            (F.col("p_retailprice") == F.col("pr"))
            & (F.col("p_size") == F.col("bs")),
        )
        .select(
            "p_partkey",
            F.round("p_retailprice", 2).alias("price"),
            "p_size",
        )
    )


# --- q148: Gini coefficient of revenue concentration ---------------------------------
@query(
    "q148_gini",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(38,2))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    ranked AS (
      SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, o_custkey) AS i
      FROM cust
    ),
    tot AS (SELECT COUNT(*) AS n, SUM(rev) AS s FROM cust)
    SELECT CAST(t.n AS BIGINT) AS n_customers,
           ROUND(CAST(SUM((2 * r.i - t.n - 1) * r.rev) AS DOUBLE)
                 / (t.n * CAST(t.s AS DOUBLE)), 6) AS gini
    FROM ranked r, tot t
    GROUP BY t.n, t.s
    """,
)
def q148_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-customer revenue — the concentration
    metric behind 'how unequal is this corpus/market' questions
    (same math a data-mix audit runs on per-source token shares).
    Uses the rank formula G = sum((2i - n - 1) * x_i) / (n * sum x)
    over revenue order; rank and cumulative come from the bucketed
    prefix-sum operator, so no global sort. Revenue pre-collapses to
    2-dp DECIMAL (exact sums); ties on revenue are broken by customer
    key on both engines before ranking — here revenue sums at 2 dp
    are already unique per customer (asserted in tests), so the
    tie-break never fires."""
    from flightdb_spark.operators.prefix import bucketed_cumsum

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice", 2).cast("decimal(38,2)")).alias("rev")
    )
    # rank = cumulative count over revenue order (revenues unique at
    # this rounding; the _cumsum 'one' column IS the row number)
    scan = bucketed_cumsum(
        cust.select("rev", F.lit(1).alias("one")), "rev", ["one"]
    )
    tot = cust.agg(F.count(F.lit(1)).alias("n"), F.sum("rev").alias("s"))
    # the (2i - n - 1) * rev products stay DECIMAL (exact at these
    # magnitudes) and sum order-free; ONE cast to double at the end —
    # a double-accumulated sum would be partition-order dependent
    return (
        scan.join(F.broadcast(tot))
        .select(
            "n",
            "s",
            ((2 * F.col("cum_one") - F.col("n") - 1) * F.col("rev")).alias(
                "term"
            ),
        )
        .groupBy("n", "s")
        .agg(
            F.round(
                F.sum("term").cast("double")
                / (F.col("n") * F.col("s").cast("double")),
                6,
            ).alias("gini")
        )
        .select(F.col("n").cast("bigint").alias("n_customers"), "gini")
    )


# --- q149: two-proportion A/B z-test -------------------------------------------------
# Conversion = purchased in the final window (a rate that is neither 0
# nor 1 at any SF — 'ever purchased' saturates and zeroes the pooled
# variance on this synthetic corpus).
AB_CONV_SPLIT = "2024-01-29 00:00:00"


@query(
    "q149_ab_test",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS grp
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
      SELECT a.grp,
             COUNT(DISTINCT e.user_id) FILTER (
               WHERE e.event_type = 'purchase'
                 AND e.ts >= TIMESTAMP '2024-01-29 00:00:00') AS converted,
             COUNT(DISTINCT e.user_id) AS n
      FROM events e JOIN assign a ON a.user_id = e.user_id
      GROUP BY a.grp
    ),
    wide AS (
      SELECT MAX(converted) FILTER (WHERE grp = 'A') AS ca,
             MAX(n) FILTER (WHERE grp = 'A') AS na,
             MAX(converted) FILTER (WHERE grp = 'B') AS cb,
             MAX(n) FILTER (WHERE grp = 'B') AS nb
      FROM conv
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
           CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
           ROUND((ca * 1.0 / na - cb * 1.0 / nb)
                 / sqrt((ca + cb) * 1.0 / (na + nb)
                        * (1 - (ca + cb) * 1.0 / (na + nb))
                        * (1.0 / na + 1.0 / nb)), 5) AS z_score
    FROM wide
    """,
)
def q149_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for purchase conversion between two
    deterministic md5-hash user buckets (conversion = purchase in the
    final window) — the experiment readout
    primitive (the hash split is q64's reshuffle-stable assignment,
    so 'A/B' is reproducible on any engine or partitioning). All
    inputs to the z formula are integers; the pooled-variance
    arithmetic is identical IEEE double math on both engines, rounded
    once at 5 dp."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    assign = users.select(
        "user_id",
        F.when(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("grp"),
    )
    conv = (
        ev.join(assign, "user_id")
        .groupBy("grp")
        .agg(
            F.count_distinct(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.lit(AB_CONV_SPLIT).cast("timestamp")),
                    F.col("user_id"),
                )
            ).alias("converted"),
            F.count_distinct("user_id").alias("n"),
        )
    )
    wide = conv.agg(
        F.max(F.when(F.col("grp") == "A", F.col("converted"))).alias("ca"),
        F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("grp") == "B", F.col("converted"))).alias("cb"),
        F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("nb"),
    )
    p = (F.col("ca") + F.col("cb")) * 1.0 / (F.col("na") + F.col("nb"))
    return wide.select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("ca").cast("bigint").alias("conv_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.col("cb").cast("bigint").alias("conv_b"),
        F.round(
            (F.col("ca") * 1.0 / F.col("na") - F.col("cb") * 1.0 / F.col("nb"))
            / F.sqrt(p * (1 - p) * (1.0 / F.col("na") + 1.0 / F.col("nb"))),
            5,
        ).alias("z_score"),
    )


# --- q150: fuzzy string self-join (edit distance with q-gram prefilter) --------------
FUZZY_MAX_DIST = 2


@query(
    "q150_fuzzy_name_join",
    oracle=f"""
    WITH names AS (
      SELECT p_name, COUNT(*) AS n_parts FROM part GROUP BY p_name
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
           CAST(a.n_parts AS BIGINT) AS n_parts_a,
           CAST(b.n_parts AS BIGINT) AS n_parts_b
    FROM names a JOIN names b
      ON a.p_name < b.p_name
     AND abs(len(a.p_name) - len(b.p_name)) <= {FUZZY_MAX_DIST}
     AND levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DIST}
    """,
)
def q150_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate catalog names within edit distance 2 — the
    entity-resolution primitive for merging dirty dimension values.
    The oracle states the all-pairs definition; the Spark plan never
    builds it: candidates come from a shared-BIGRAM equi-join over the
    distinct-name table plus a length band. No false negatives: every
    name here has >= 6 bigrams and {FUZZY_MAX_DIST} edits destroy at
    most 2*{FUZZY_MAX_DIST}, so any pair within distance
    {FUZZY_MAX_DIST} still shares a bigram. levenshtein() verifies
    candidates JVM-side (same unit-cost metric both engines)."""
    part = load_table(spark, sf_dir, "part")
    names = part.groupBy("p_name").agg(F.count(F.lit(1)).alias("n_parts"))
    # The shared-bigram bound needs > 2*FUZZY_MAX_DIST bigrams, i.e.
    # length > 2*FUZZY_MAX_DIST + 1; shorter names (none in this
    # catalog, but the operator must be unconditionally correct) fall
    # back to a length-band pairing below. The length guard also keeps
    # sequence(1, length-1) ascending (textops.py:34 footgun).
    short_len = 2 * FUZZY_MAX_DIST + 1
    grams = names.filter(F.length("p_name") > short_len).select(
        "p_name",
        F.length("p_name").alias("ln"),
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, length(p_name) - 1), "
                    "i -> substring(p_name, i, 2))"
                )
            )
        ).alias("bg"),
    )
    a = grams.select(
        F.col("p_name").alias("name_a"), F.col("ln").alias("la"), "bg"
    )
    b = grams.select(
        F.col("p_name").alias("name_b"), F.col("ln").alias("lb"), "bg"
    )
    cand = (
        a.join(b, "bg")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.abs(F.col("la") - F.col("lb")) <= FUZZY_MAX_DIST)
        )
        .select("name_a", "name_b")
        .distinct()
    )
    # completeness fallback: every SHORT name pairs against the full
    # length band (short names are rare by construction; broadcast side
    # is their tiny subset, so this is a cheap guard, empty here)
    shorts = names.filter(F.length("p_name") <= short_len).select(
        F.col("p_name").alias("name_s"), F.length("p_name").alias("ls")
    )
    all_n = names.select(
        F.col("p_name").alias("name_o"), F.length("p_name").alias("lo")
    )
    short_cand = (
        all_n.join(
            F.broadcast(shorts),
            (F.col("name_s") != F.col("name_o"))
            & (F.abs(F.col("ls") - F.col("lo")) <= FUZZY_MAX_DIST),
        )
        .select(
            F.least("name_s", "name_o").alias("name_a"),
            F.greatest("name_s", "name_o").alias("name_b"),
        )
        .distinct()
    )
    cand = cand.unionByName(short_cand).distinct()
    verified = cand.filter(
        F.levenshtein("name_a", "name_b") <= FUZZY_MAX_DIST
    ).select(
        "name_a",
        "name_b",
        F.levenshtein("name_a", "name_b").cast("bigint").alias("dist"),
    )
    na = names.select(F.col("p_name").alias("name_a"), F.col("n_parts").alias("n_parts_a"))
    nb = names.select(F.col("p_name").alias("name_b"), F.col("n_parts").alias("n_parts_b"))
    return (
        verified.join(F.broadcast(na), "name_a")
        .join(F.broadcast(nb), "name_b")
        .select("name_a", "name_b", "dist", "n_parts_a", "n_parts_b")
    )


# --- q151: sliding-window distinct counts --------------------------------------------
SLIDE_DAYS = 7


@query(
    "q151_sliding_distinct",
    oracle=f"""
    WITH ed AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM ed),
    contrib AS (
      SELECT ed.day + CAST(s.o AS INTEGER) AS window_end, ed.user_id
      FROM ed, LATERAL (
        SELECT unnest(range({SLIDE_DAYS})) AS o
      ) s, bounds b
      WHERE ed.day + CAST(s.o AS INTEGER) <= b.hi
    )
    SELECT window_end,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM contrib GROUP BY window_end
    """,
)
def q151_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct active users over the trailing {SLIDE_DAYS}-day window
    ending each day — the rolling-MAU primitive. Sliding distinct
    cannot use a running sum (distinct does not subtract), so each
    (day, user) pair explodes into the <= {SLIDE_DAYS} windows it
    covers and one distinct aggregate per window end counts it — the
    q96 day-bucket trick applied to windows. Fan-out is bounded by
    the window length; the aggregate keys on (window_end, user).
    At 100 TB swap the exact distinct for the q56 HLL-sketch merge,
    identical plan."""
    ev = load_table(spark, sf_dir, "events")
    ed = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    hi = ed.agg(F.max("day").alias("hi"))
    contrib = (
        ed.join(F.broadcast(hi))
        .select(
            F.explode(
                F.sequence(F.lit(0), F.lit(SLIDE_DAYS - 1))
            ).alias("o"),
            "day",
            "user_id",
            "hi",
        )
        .select(
            F.date_add("day", F.col("o")).alias("window_end"), "user_id", "hi"
        )
        .filter(F.col("window_end") <= F.col("hi"))
    )
    return contrib.groupBy("window_end").agg(
        F.count_distinct("user_id").alias("n_users")
    )


# --- q152: ABC contribution classes (Pareto 80/95) -----------------------------------
@query(
    "q152_abc_classes",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             SUM(CAST(ROUND(o_totalprice, 2) AS DECIMAL(38,2))) AS rev
      FROM orders GROUP BY o_custkey
    ),
    scan AS (
      SELECT rev,
             SUM(rev) OVER (ORDER BY -rev, o_custkey) AS cum,
             (SELECT SUM(rev) FROM cust) AS tot
      FROM cust
    ),
    classed AS (
      SELECT rev,
             CASE WHEN cum * 5 <= tot * 4 THEN 'A'
                  WHEN cum * 20 <= tot * 19 THEN 'B'
                  ELSE 'C' END AS abc
      FROM scan
    )
    SELECT abc,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS revenue,
           ROUND(CAST(SUM(rev) AS DOUBLE)
                 / CAST(MAX((SELECT SUM(rev) FROM cust)) AS DOUBLE), 4)
             AS revenue_share
    FROM classed GROUP BY abc
    """,
)
def q152_abc_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of customers by revenue
    contribution: A covers the first 80% of cumulative revenue
    (descending), B to 95%, C the tail — the inventory-management
    read beside q148's Gini. The descending cumulative runs through
    the bucketed prefix scan (order key = -revenue; 2-dp DECIMAL
    revenues are tie-free, q148's asserted contract); class
    boundaries cross-multiply DECIMAL sums so no float ratio decides
    a class."""
    from flightdb_spark.operators.prefix import bucketed_cumsum

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.round("o_totalprice", 2).cast("decimal(38,2)")).alias("rev")
    )
    scan = bucketed_cumsum(
        cust.select((-F.col("rev")).alias("neg"), "rev"), "neg", ["rev"]
    )
    tot = cust.agg(F.sum("rev").alias("tot"))
    classed = scan.join(F.broadcast(tot)).select(
        "rev",
        "tot",
        F.when(F.col("cum_rev") * 5 <= F.col("tot") * 4, "A")
        .when(F.col("cum_rev") * 20 <= F.col("tot") * 19, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("rev").cast("double"), 2).alias("revenue"),
        F.round(
            F.sum("rev").cast("double") / F.max("tot").cast("double"), 4
        ).alias("revenue_share"),
    )


# --- q153: centroid silhouette score -------------------------------------------------
@query(
    "q153_silhouette",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label, u.dim, CAST(u.x AS DOUBLE) AS x
      FROM embeddings,
           LATERAL (SELECT unnest(embedding) AS x,
                           generate_subscripts(embedding, 1) AS dim) u
    ),
    cent AS (
      SELECT label AS clabel, dim,
             CAST(SUM(CAST(x AS DECIMAL(38,10))) AS DOUBLE) / COUNT(*) AS m
      FROM dims GROUP BY label, dim
    ),
    cvec AS (
      SELECT clabel, array_agg(m ORDER BY dim) AS cv FROM cent GROUP BY clabel
    ),
    cos AS (
      SELECT e.vec_id, e.label, c.clabel,
             list_sum(list_transform(range(1, len(e.embedding) + 1),
               i -> CAST(e.embedding[i] AS DOUBLE) * c.cv[i]))
             / (sqrt(list_sum(list_transform(e.embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(c.cv, x -> x * x)))) AS cs
      FROM embeddings e, cvec c
    ),
    ab AS (
      SELECT vec_id, label,
             1 - MAX(CASE WHEN clabel = label THEN cs END) AS a,
             1 - MAX(CASE WHEN clabel <> label THEN cs END) AS b
      FROM cos GROUP BY vec_id, label
    ),
    s AS (
      SELECT label,
             ROUND((b - a) / (CASE WHEN a > b THEN a ELSE b END), 8) AS sil
      FROM ab
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(CAST(SUM(CAST(sil AS DECIMAL(38,8))) AS DOUBLE) / COUNT(*), 5)
             AS mean_silhouette
    FROM s GROUP BY label
    """,
)
def q153_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-based silhouette per label: a = cosine distance to the
    own-label centroid, b = distance to the nearest other centroid,
    s = (b-a)/max(a,b) — the label-separation readout beside q125's
    bucket-vote audit and q115's recall. Centroid means accumulate in
    DECIMAL (engine-identical doubles); every vector scores against
    the labels-sized broadcast centroid table (one map-side pass, no
    pair shuffle); per-vector silhouettes round at 8 dp into a
    DECIMAL per-label mean."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("d0", "xf")
    ).select(
        "label",
        (F.col("d0") + 1).alias("dim"),
        F.col("xf").cast("double").alias("x"),
    )
    cent = dims.groupBy(F.col("label").alias("clabel"), "dim").agg(
        (F.sum(F.col("x").cast("decimal(38,10)")).cast("double") / F.count(F.lit(1))).alias("m")
    )
    cvec = cent.groupBy("clabel").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
        ).alias("cv")
    )
    dot = F.aggregate(
        F.zip_with("embedding", "cv", lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    vnorm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    cnorm = F.sqrt(
        F.aggregate(
            F.transform("cv", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    cos = emb.join(F.broadcast(cvec)).select(
        "vec_id", "label", "clabel", (dot / (vnorm * cnorm)).alias("cs")
    )
    ab = cos.groupBy("vec_id", "label").agg(
        (1 - F.max(F.when(F.col("clabel") == F.col("label"), F.col("cs")))).alias("a"),
        (1 - F.max(F.when(F.col("clabel") != F.col("label"), F.col("cs")))).alias("b"),
    )
    s = ab.select(
        "label",
        F.round(
            (F.col("b") - F.col("a")) / F.greatest("a", "b"), 8
        ).alias("sil"),
    )
    return s.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(
            F.sum(F.col("sil").cast("decimal(38,8)")).cast("double")
            / F.count(F.lit(1)),
            5,
        ).alias("mean_silhouette"),
    )


# --- q155: vocabulary coverage curve -------------------------------------------------
VOCAB_COVER_KS = (10, 20, 50, 100)


@query(
    "q155_vocab_coverage",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    vc AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS r FROM vc
    ),
    tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM vc)
    SELECT k.k,
           CAST(SUM(r.c) FILTER (WHERE r.r <= k.k) AS BIGINT) AS covered,
           CAST(t.n AS BIGINT) AS total_tokens,
           ROUND(SUM(r.c) FILTER (WHERE r.r <= k.k) * 1.0 / t.n, 6) AS coverage
    FROM ranked r, tot t,
         (SELECT unnest([{", ".join(str(k) for k in VOCAB_COVER_KS)}]) AS k) k
    GROUP BY k.k, t.n
    """,
)
def q155_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-occurrence coverage of the top-k vocabulary for several k
    — the tokenizer-budget planning curve (how much of the corpus a
    k-entry vocab explains). The rank window runs over the AGGREGATED
    vocabulary only (bounded by distinct tokens, q76's allowlisted
    class); coverage ratios are integer counts divided once."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("tok"))
    vc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("c"), "tok")
    ranked = vc.select("c", F.row_number().over(w).alias("r"))
    tot = vc.agg(F.sum("c").alias("n"))
    ks = spark.createDataFrame([(k,) for k in VOCAB_COVER_KS], "k int")
    return (
        ranked.join(F.broadcast(ks))
        .join(F.broadcast(tot))
        .groupBy("k", "n")
        .agg(
            F.sum(F.when(F.col("r") <= F.col("k"), F.col("c")))
            .cast("bigint")
            .alias("covered")
        )
        .select(
            "k",
            "covered",
            F.col("n").cast("bigint").alias("total_tokens"),
            F.round(F.col("covered") * 1.0 / F.col("n"), 6).alias("coverage"),
        )
    )


# --- q156: difference-in-differences -------------------------------------------------
@query(
    "q156_diff_in_diff",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
             CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                       AS BIGINT) % 2 = 0 THEN 'A' ELSE 'B' END AS grp
      FROM (SELECT DISTINCT user_id FROM events)
    ),
    cells AS (
      SELECT a.grp,
             CASE WHEN e.ts < TIMESTAMP '{DIFF_SPLIT}' THEN 'pre' ELSE 'post' END
               AS period,
             CAST(SUM(CAST(ROUND(e.value, 6) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS mean_v,
             COUNT(*) AS n
      FROM events e JOIN assign a ON a.user_id = e.user_id
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT MAX(mean_v) FILTER (WHERE grp='A' AND period='pre') AS a_pre,
             MAX(mean_v) FILTER (WHERE grp='A' AND period='post') AS a_post,
             MAX(mean_v) FILTER (WHERE grp='B' AND period='pre') AS b_pre,
             MAX(mean_v) FILTER (WHERE grp='B' AND period='post') AS b_post,
             CAST(SUM(n) AS BIGINT) AS n_events
      FROM cells
    )
    SELECT ROUND(a_post - a_pre, 5) AS delta_a,
           ROUND(b_post - b_pre, 5) AS delta_b,
           ROUND((a_post - a_pre) - (b_post - b_pre), 5) AS did,
           n_events
    FROM wide
    """,
)
def q156_diff_in_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences point estimate: how much more group
    A's mean event value moved across the q128 split than group B's —
    the quasi-experimental companion to q149's A/B z-test, on the same
    reshuffle-stable md5 user split. Four cell means from one grouped
    aggregate (DECIMAL sums / integer counts — engine-identical
    doubles), then pure arithmetic on a 1-row frame."""
    ev = load_table(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    assign = users.select(
        "user_id",
        F.when(
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
            .cast("bigint") % 2
            == 0,
            "A",
        )
        .otherwise("B")
        .alias("grp"),
    )
    split = F.lit(DIFF_SPLIT).cast("timestamp")
    cells = (
        ev.join(assign, "user_id")
        .groupBy(
            "grp",
            F.when(F.col("ts") < split, "pre").otherwise("post").alias("period"),
        )
        .agg(
            (
                F.sum(F.round("value", 6).cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("mean_v"),
            F.count(F.lit(1)).alias("n"),
        )
    )

    def cell(g, p):
        return F.max(
            F.when((F.col("grp") == g) & (F.col("period") == p), F.col("mean_v"))
        )

    wide = cells.agg(
        cell("A", "pre").alias("a_pre"),
        cell("A", "post").alias("a_post"),
        cell("B", "pre").alias("b_pre"),
        cell("B", "post").alias("b_post"),
        F.sum("n").cast("bigint").alias("n_events"),
    )
    return wide.select(
        F.round(F.col("a_post") - F.col("a_pre"), 5).alias("delta_a"),
        F.round(F.col("b_post") - F.col("b_pre"), 5).alias("delta_b"),
        F.round(
            (F.col("a_post") - F.col("a_pre")) - (F.col("b_post") - F.col("b_pre")),
            5,
        ).alias("did"),
        "n_events",
    )


# --- q157: PMI collocation pairs -----------------------------------------------------
PMI_MIN_PAIR_DOCS = 20
PMI_TOP = 20


@query(
    "q157_pmi_pairs",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    d AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd FROM dt),
    tc AS (SELECT tok, COUNT(*) AS c FROM dt GROUP BY tok),
    pairs AS (
      SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS cab
      FROM dt a JOIN dt b ON b.doc_id = a.doc_id AND b.tok > a.tok
      GROUP BY 1, 2
      HAVING COUNT(*) >= {PMI_MIN_PAIR_DOCS}
    )
    SELECT p.tok_a, p.tok_b, CAST(p.cab AS BIGINT) AS n_docs,
           ROUND(ln(p.cab * 1.0 * d.nd / (ca.c * 1.0 * cb.c)), 6) AS pmi
    FROM pairs p
    JOIN tc ca ON ca.tok = p.tok_a
    JOIN tc cb ON cb.tok = p.tok_b, d
    ORDER BY pmi DESC, tok_a, tok_b LIMIT {PMI_TOP}
    """,
)
def q157_pmi_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top token collocations by document-level pointwise mutual
    information — the phrase/topic discovery statistic beside q82's
    BPE pair counts (co-occurrence anywhere in a doc, not adjacency).
    Pairs explode map side from per-doc sorted distinct token arrays
    (the q267 no-self-join shape — doc-bounded fan-out, one corpus
    scan); marginals rejoin as broadcasts; ln on integer ratios
    rounds once at 6 dp (ranking on the rounded score with a full
    tie-break, DETERMINISM.md section 4)."""
    docs = load_table(spark, sf_dir, "documents")
    # per-doc sorted distinct token ARRAYS, map side from one scan
    # (three consumers — pairs, marginals, doc count — share the
    # checkpoint; the q267 no-self-join shape replaces the doc_id
    # self-join entirely)
    dtoks = docs.select(
        "doc_id", F.sort_array(F.array_distinct(F.split("text", " "))).alias("toks")
    ).filter(F.size("toks") > 0).localCheckpoint()
    # doc universe = docs with at least one token (the oracle's
    # COUNT(DISTINCT doc_id)): empty docs must not inflate the PMI
    # denominator
    ndt = dtoks.agg(F.count(F.lit(1)).cast("bigint").alias("nd"))
    tc = dtoks.select(F.explode("toks").alias("tok")).groupBy("tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    idx = F.sequence(F.lit(0), F.size("toks") - 1)
    pairs = (
        dtoks.select(
            F.explode(
                F.flatten(
                    F.transform(
                        idx,
                        lambda i: F.transform(
                            F.slice(F.col("toks"), i + 2, F.size("toks")),
                            lambda y: F.struct(
                                F.element_at(F.col("toks"), i + 1).alias("tok_a"),
                                y.alias("tok_b"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .groupBy(F.col("p.tok_a").alias("tok_a"), F.col("p.tok_b").alias("tok_b"))
        .agg(F.count(F.lit(1)).alias("cab"))
        .filter(F.col("cab") >= PMI_MIN_PAIR_DOCS)
    )
    return (
        pairs.join(
            F.broadcast(tc.select(F.col("tok").alias("tok_a"), F.col("c").alias("ca"))),
            "tok_a",
        )
        .join(
            F.broadcast(tc.select(F.col("tok").alias("tok_b"), F.col("c").alias("cb"))),
            "tok_b",
        )
        .crossJoin(F.broadcast(ndt))
        .select(
            "tok_a",
            "tok_b",
            F.col("cab").cast("bigint").alias("n_docs"),
            F.round(
                F.log(
                    F.col("cab") * 1.0 * F.col("nd")
                    / (F.col("ca") * 1.0 * F.col("cb"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "tok_a", "tok_b")
        .limit(PMI_TOP)
    )


# --- q158: lag autocorrelation of daily volume ---------------------------------------
ACF_LAGS = (1, 7)


@query(
    "q158_autocorrelation",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, COUNT(*) AS c
      FROM events GROUP BY 1
    ),
    stats AS (
      SELECT COUNT(*) AS d, SUM(c) AS s, SUM(c * c) AS sq FROM daily
    ),
    lagged AS (
      SELECT l.lag, a.c AS ca, b.c AS cb
      FROM (SELECT unnest([{", ".join(str(x) for x in ACF_LAGS)}]) AS lag) l
      JOIN daily a ON TRUE
      JOIN daily b ON b.day = a.day + CAST(l.lag AS INTEGER)
    )
    SELECT l.lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND((COUNT(*) * SUM(ca * cb) - SUM(ca) * SUM(cb) * 1.0)
                 / (COUNT(*) * 1.0 * (t.sq - t.s * t.s * 1.0 / t.d)), 6)
             AS acf
    FROM lagged l, stats t
    GROUP BY l.lag, t.sq, t.s, t.d
    """,
)
def q158_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-7 autocorrelation of daily event volume — the
    weekly-seasonality detector beside q126's hour-of-day residuals
    and q138's changepoint. Lagged pairs come from a date-shift
    equi-join on the bounded daily table (never a window over raw
    events); the estimator is pure arithmetic on exact integer sums,
    normalized by the global variance moment, rounded once."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    # moments in DECIMAL: long sums of count products would silently
    # wrap at extreme scale where DuckDB's SUM promotes to HUGEINT
    dec = "decimal(38,0)"
    stats = daily.agg(
        F.count(F.lit(1)).alias("d"),
        F.sum(F.col("c").cast(dec)).alias("s"),
        F.sum((F.col("c").cast(dec) * F.col("c").cast(dec))).alias("sq"),
    )
    lags = spark.createDataFrame([(x,) for x in ACF_LAGS], "lag int")
    a = daily.select(F.col("day").alias("da"), F.col("c").alias("ca"))
    b = daily.select(F.col("day").alias("db"), F.col("c").alias("cb"))
    lagged = (
        a.join(F.broadcast(lags))
        .join(b, F.date_add(F.col("da"), F.col("lag")) == F.col("db"))
    )
    return (
        lagged.join(F.broadcast(stats))
        .groupBy("lag", "sq", "s", "d")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("ca").cast(dec) * F.col("cb").cast(dec)).alias("sab"),
            F.sum(F.col("ca").cast(dec)).alias("sa"),
            F.sum(F.col("cb").cast(dec)).alias("sb"),
        )
        .select(
            "lag",
            F.col("n_pairs").cast("bigint").alias("n_pairs"),
            F.round(
                (F.col("n_pairs") * F.col("sab") - F.col("sa") * F.col("sb") * 1.0)
                / (
                    F.col("n_pairs")
                    * 1.0
                    * (F.col("sq") - F.col("s") * F.col("s") * 1.0 / F.col("d"))
                ),
                6,
            ).alias("acf"),
        )
    )


# --- q159: burstiness (index of dispersion) per event type ---------------------------
@query(
    "q159_burstiness",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS sq
      FROM hourly GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_hours,
           ROUND(s * 1.0 / n, 4) AS mean_per_hour,
           ROUND((sq * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n))
                 / (s * 1.0 / n), 4) AS fano
    FROM agg
    """,
)
def q159_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano factor (variance-to-mean of ACTIVE hourly counts) per
    event type — the burstiness gauge that separates Poisson-like
    traffic (fano ~= 1 over occupied hours) from bursty spikes. Two
    bounded aggregates; moments stay exact integers until the final
    divisions (identical IEEE ops both engines). Note: hours with no
    events are absent (occupied-hours convention, stated here because
    zero-inflation would lower the mean and raise fano)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    # DECIMAL moments (see q158): scale-proof against long wraparound
    dec = "decimal(38,0)"
    agg = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("c").cast(dec)).alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("sq"),
    )
    mean = F.col("s") * 1.0 / F.col("n")
    return agg.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(mean, 4).alias("mean_per_hour"),
        F.round(
            (F.col("sq") * 1.0 / F.col("n") - mean * mean) / mean, 4
        ).alias("fano"),
    )


# --- q160: referential integrity audit -----------------------------------------------
@query(
    "q160_integrity_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
              WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey)),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM part p
                                WHERE p.p_partkey = l.l_partkey)),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer c
              WHERE NOT EXISTS (SELECT 1 FROM nation n
                                WHERE n.n_nationkey = c.c_nationkey)),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM customer)
    )
    """,
)
def q160_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema's four FK
    edges: orphan counts per edge — the trust-a-new-drop check beside
    q104's per-column profile. Each edge is ONE lazy pass: left join
    against the deduped (broadcastable) key set, orphans and the row
    total counted in the same aggregate — no driver-side count loop,
    the whole audit is a single union DAG. Counts are exact
    integers."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    n = load_table(spark, sf_dir, "nation")

    def edge(name, fact, dim, fk, pk):
        # one lazy aggregate per edge: orphan flag via left join on the
        # deduped key set, counted in the same pass as the row total
        keys = dim.select(F.col(pk).alias("__pk")).distinct()
        return (
            fact.select(F.col(fk).alias("__fk"))
            .join(keys, F.col("__fk") == F.col("__pk"), "left")
            .agg(
                F.lit(name).alias("fk_edge"),
                F.sum(
                    F.when(F.col("__pk").isNull(), 1).otherwise(0)
                ).cast("long").alias("n_orphans"),
                F.count(F.lit(1)).alias("n_rows"),
            )
        )

    edges = [
        edge("lineitem.l_orderkey->orders", li, o, "l_orderkey", "o_orderkey"),
        edge("orders.o_custkey->customer", o, c, "o_custkey", "c_custkey"),
        edge("lineitem.l_partkey->part", li, p, "l_partkey", "p_partkey"),
        edge("customer.c_nationkey->nation", c, n, "c_nationkey", "n_nationkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


# --- q161: Markov next-event prediction accuracy -------------------------------------
# Train a first-order transition model on the pre-split window (q100's
# matrix on q139's split), predict argmax(next | current) and score
# accuracy on the post-split transitions — the held-out-eval pattern
# of q102 applied to behavioral sequences.
@query(
    "q161_markov_accuracy",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, ts, event_id, event_type AS src,
             LEAD(event_type) OVER w AS dst,
             LEAD(ts) OVER w AS dst_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    train AS (
      SELECT src, dst, COUNT(*) AS c FROM seq
      WHERE dst IS NOT NULL AND dst_ts < TIMESTAMP '{DIFF_SPLIT}'
      GROUP BY src, dst
    ),
    pred AS (
      SELECT src, MIN(dst) AS p FROM train t
      WHERE c = (SELECT MAX(c) FROM train t2 WHERE t2.src = t.src)
      GROUP BY src
    ),
    test AS (
      SELECT s.src, s.dst FROM seq s
      WHERE s.dst IS NOT NULL AND s.dst_ts >= TIMESTAMP '{DIFF_SPLIT}'
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST(COUNT(*) FILTER (WHERE t.dst = p.p) AS BIGINT) AS n_correct,
           ROUND(COUNT(*) FILTER (WHERE t.dst = p.p) * 1.0 / COUNT(*), 6)
             AS accuracy
    FROM test t LEFT JOIN pred p ON p.src = t.src
    """,
)
def q161_markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out next-event prediction: fit q100's transition matrix on
    transitions completing BEFORE the split, predict the modal next
    event per current event (ties broken to the lexicographically
    first — max_by on (count, reversed dst)), and score accuracy on
    post-split transitions. One user_id window shuffle serves both
    splits; the model is a types²-bounded broadcast; accuracy is an
    integer ratio divided once."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        F.lead("ts").over(w).alias("dst_ts"),
    ).filter(F.col("dst").isNotNull())
    split = F.lit(DIFF_SPLIT).cast("timestamp")
    train = (
        seq.filter(F.col("dst_ts") < split)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # modal next event, lowest dst on count ties (mirrors the oracle's
    # MIN(dst) over the max-count set; a struct max_by cannot express
    # "then lexicographic MIN", so filter-to-max then MIN)
    pred = (
        train.join(
            train.groupBy("src").agg(F.max("c").alias("mx")),
            "src",
        )
        .filter(F.col("c") == F.col("mx"))
        .groupBy("src")
        .agg(F.min("dst").alias("p"))
    )
    test = seq.filter(F.col("dst_ts") >= split).select("src", "dst")
    return (
        test.join(F.broadcast(pred), "src", "left")
        .agg(
            F.count(F.lit(1)).alias("n_transitions"),
            F.sum(
                F.when(F.col("dst") == F.col("p"), 1).otherwise(0)
            ).cast("bigint").alias("n_correct"),
        )
        .select(
            "n_transitions",
            "n_correct",
            F.round(
                F.col("n_correct") * 1.0 / F.col("n_transitions"), 6
            ).alias("accuracy"),
        )
    )


# --- q162: weekly cohort retention triangle ------------------------------------------
@query(
    "q162_cohort_triangle",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS wk
      FROM events
    ),
    first_wk AS (
      SELECT user_id, MIN(wk) AS cohort FROM uw GROUP BY user_id
    ),
    sizes AS (SELECT cohort, COUNT(*) AS n0 FROM first_wk GROUP BY cohort),
    cells AS (
      SELECT f.cohort,
             CAST(date_diff('week', f.cohort, u.wk) AS BIGINT) AS week_n,
             COUNT(*) AS n
      FROM uw u JOIN first_wk f ON f.user_id = u.user_id
      GROUP BY 1, 2
    )
    SELECT c.cohort, c.week_n, CAST(c.n AS BIGINT) AS n_active,
           CAST(s.n0 AS BIGINT) AS cohort_size,
           ROUND(c.n * 1.0 / s.n0, 4) AS retention
    FROM cells c JOIN sizes s ON s.cohort = c.cohort
    """,
)
def q162_cohort_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full weekly cohort retention triangle (first-active week x
    weeks-since-cohort -> active fraction) — the generalization of
    q106's D1/D7 flags into the canonical retention artifact. One
    (user, week) distinct, a per-user min, and a co-partitioned
    user_id join; every output ratio is integer counts divided once.
    Week buckets are date_trunc('week') on both engines (ISO Monday
    weeks)."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    first_wk = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    sizes = first_wk.groupBy("cohort").agg(F.count(F.lit(1)).alias("n0"))
    cells = (
        uw.join(first_wk, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("bigint")
            .alias("week_n"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cells.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "week_n",
        F.col("n").cast("bigint").alias("n_active"),
        F.col("n0").cast("bigint").alias("cohort_size"),
        F.round(F.col("n") * 1.0 / F.col("n0"), 4).alias("retention"),
    )


# --- q163: daily value percentile bands ----------------------------------------------
@query(
    "q163_percentile_bands",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY 1
    """,
)
def q163_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90/p99 ribbon of the event value — the monitoring
    band chart behind every latency/value dashboard. One grouped exact
    percentile aggregate (interpolation identical across engines, the
    q128-edges contract); at 100 TB swap approx_percentile per the
    q56/q74 sketch discipline, same plan shape."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )
