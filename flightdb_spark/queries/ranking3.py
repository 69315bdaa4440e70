"""Ranking-evaluation batch 78 (q456-q460) — the rank-quality metrics
beside q144's nDCG / q220's AP / q324's MRR, over the SAME lexical and
semantic runs (stats.py `_lex_ranked` / `_sem_ranked`, graded truth
from the exact-cosine run):

- q456 ERR@10: expected reciprocal rank (Chapelle et al. 2009) — the
  cascade-model metric whose position-i credit is gated by the
  relevance MASS above i, not just the discount;
- q457 RBO@50: rank-biased overlap (Webber et al. 2010) between the
  lexical and semantic runs — the top-weighted agreement measure for
  comparing two rankers that q230's Kendall tau (uniform weights)
  understates;
- q458 alpha-DCG@10: diversity-aware gain (Clarke et al. 2008) with
  source as the subtopic and alpha = 0.5, plus subtopic recall@10 —
  the redundancy-punishing twin of q144 (reported unnormalized: the
  greedy-ideal normalizer is a sequential construction that belongs
  in a harness, not a scan);
- q459 clarity score (Cronen-Townsend et al. 2002): KL divergence in
  bits between the top-10 feedback-docs language model and the
  collection model — the classic query-performance predictor;
- q460 tau-AP (Yilmaz et al. 2008): top-weighted rank correlation
  between the two runs on their common items, both reference
  directions plus the symmetric mean.

Determinism: ERR's relevance values and alpha-DCG's novelty factors
are powers of two over 1024 (exact doubles, DETERMINISM.md rule 6 —
the whole unrolled cascade is one straight-line expression identical
in both engines); RBO weights (1-p)p^(d-1) and position discounts are
Python-precomputed literals (rule 11); clarity's ln terms round at
9 dp into DECIMAL sums with 5-dp output (rule 5); tau-AP is exact
integer pair counting with per-position rationals rounded at 10 dp
into a DECIMAL sum.

100 TB shapes: every metric computes over the TRUNCATED runs
(TakeOrdered bounds them at RRF_DEPTH before any window — the q137/
q144 economics); clarity's vocabulary is the 10 feedback docs' words
with collection stats from two integer aggregates broadcast back.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .stats import _RUNS_SQL, _lex_ranked, _sem_ranked

ERR_K = 10
ERR_GMAX = 10  # grades are 1..10 (sem rank r -> grade 11 - r)
RBO_P = 0.9
RBO_DEPTH = 50
ALPHA_K = 10
CLARITY_FB_DOCS = 10
LN2 = repr(math.log(2.0))

# relevance map for ERR: grade g -> (2^g - 1) / 2^gmax, an exact double
_ERR_R = {g: (2.0**g - 1.0) / 2.0**ERR_GMAX for g in range(0, ERR_GMAX + 1)}


# ---------------------------------------------------------------------------
# q456 — ERR@10


def _err_expr() -> str:
    """The unrolled cascade sum over pivoted columns r_1..r_K — pure
    arithmetic, the same text runs on both engines (rule 6)."""
    terms = []
    prefix = ""
    for i in range(1, ERR_K + 1):
        terms.append(f"{prefix}(r_{i} / {float(i)!r})")
        prefix += f"(1.0 - r_{i}) * "
    return "ROUND(" + " + ".join(terms) + ", 6)"


def _err_rel_case(g_expr: str) -> str:
    # CAST each literal: DuckDB parses bare numeric literals as DECIMAL
    # and the 10-deep cascade product would overflow scale 38
    whens = " ".join(
        f"WHEN {g} THEN CAST({r!r} AS DOUBLE)" for g, r in _ERR_R.items() if g > 0
    )
    return f"CASE {g_expr} {whens} ELSE CAST(0.0 AS DOUBLE) END"


def _err_oracle() -> str:
    pivots = ", ".join(
        f"MAX(CASE WHEN pos = {i} THEN rel ELSE CAST(0.0 AS DOUBLE) END) AS r_{i}"
        for i in range(1, ERR_K + 1)
    )
    return f"""
    WITH {_RUNS_SQL},
    run AS (
      SELECT l.doc_id, l.r AS pos,
             {_err_rel_case(f"({ERR_GMAX} + 1 - s.r)")} AS rel
      FROM lex l LEFT JOIN (SELECT doc_id, r FROM sem WHERE r <= {ERR_K}) s
        ON s.doc_id = l.doc_id
      WHERE l.r <= {ERR_K}
    ),
    piv AS (SELECT {pivots} FROM run)
    SELECT {ERR_K} AS k, {_err_expr()} AS err FROM piv
    """


@query("q456_err", oracle=_err_oracle())
def q456_err(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ERR@10 of the lexical run with graded relevance from the
    semantic run (grade = 11 - semantic rank): the cascade metric
    R_i/i * prod_{j<i}(1 - R_j) with R = (2^g - 1)/2^10 — every R is
    an exact power-of-two rational double, and the whole cascade is
    ONE straight-line expression shared verbatim with the oracle, so
    no rounding contract beyond the terminal ROUND is needed. Runs
    are TakeOrdered-truncated to 10 rows before the pivot."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = _lex_ranked(docs).filter(F.col("r") <= ERR_K)
    sem = _sem_ranked(emb).filter(F.col("r") <= ERR_K)
    rel = F.coalesce(
        F.expr(_err_rel_case(f"({ERR_GMAX} + 1 - s.r)")), F.lit(0.0)
    )
    run = lex.alias("l").join(
        F.broadcast(sem.alias("s")), F.col("s.doc_id") == F.col("l.doc_id"), "left"
    ).select(F.col("l.r").alias("pos"), rel.alias("rel"))
    piv = run.agg(
        *[
            F.max(F.when(F.col("pos") == i, F.col("rel")).otherwise(0.0)).alias(
                f"r_{i}"
            )
            for i in range(1, ERR_K + 1)
        ]
    )
    return piv.select(F.lit(ERR_K).alias("k"), F.expr(_err_expr()).alias("err"))


# ---------------------------------------------------------------------------
# q457 — RBO@50

_RBO_W = [(1.0 - RBO_P) * RBO_P ** (d - 1) for d in range(1, RBO_DEPTH + 1)]


def _rbo_oracle() -> str:
    w_arr = ", ".join(repr(w) for w in _RBO_W)
    return f"""
    WITH {_RUNS_SQL},
    both_ AS (
      SELECT l.r AS rl, s.r AS rs
      FROM lex l JOIN sem s ON s.doc_id = l.doc_id
    ),
    depths AS (SELECT unnest(range(1, {RBO_DEPTH} + 1)) AS d),
    ovl AS (
      SELECT d.d,
             CAST(COUNT(CASE WHEN b.rl <= d.d AND b.rs <= d.d THEN 1 END)
                  AS BIGINT) AS ov
      FROM depths d LEFT JOIN both_ b ON TRUE
      GROUP BY d.d
    )
    SELECT {RBO_P!r} AS p, {RBO_DEPTH} AS depth,
           MAX(CASE WHEN d = 10 THEN ov END) AS overlap_at_10,
           ROUND(CAST(SUM(CAST(ROUND(CAST(([{w_arr}])[d] AS DOUBLE) * ov / d, 10)
                     AS DECIMAL(38,10))) AS DOUBLE), 6) AS rbo
    FROM ovl
    """


@query("q457_rbo", oracle=_rbo_oracle())
def q457_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap at depth 50 (p = 0.9) between the lexical
    and semantic runs: RBO = sum_d (1-p) p^(d-1) |A_d ∩ B_d| / d. The
    geometric weights are Python-precomputed literals (rule 11);
    overlaps are exact integers from the joined rank pairs (bounded by
    RRF_DEPTH); per-depth terms round at 10 dp into a DECIMAL sum.
    The depth grid multiplies a <= 100-row intersection table — grid
    size never rescans anything."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = (
        _lex_ranked(docs)
        .select("doc_id", F.col("r").alias("rl"))
        .join(_sem_ranked(emb).select("doc_id", F.col("r").alias("rs")), "doc_id")
    )
    w_arr = F.array(*[F.lit(w) for w in _RBO_W])
    grid = spark.range(1, RBO_DEPTH + 1).select(F.col("id").cast("int").alias("d"))
    overlaps = (
        grid.join(pairs, F.lit(True), "left")
        .groupBy("d")
        .agg(
            F.count(
                F.when((F.col("rl") <= F.col("d")) & (F.col("rs") <= F.col("d")), 1)
            )
            .cast("bigint")
            .alias("ov")
        )
    )
    term = F.round(
        F.element_at(w_arr, F.col("d")) * F.col("ov") / F.col("d"), 10
    ).cast("decimal(38,10)")
    return overlaps.agg(
        F.lit(RBO_P).alias("p"),
        F.lit(RBO_DEPTH).alias("depth"),
        F.max(F.when(F.col("d") == 10, F.col("ov"))).alias("overlap_at_10"),
        F.round(F.sum(term).cast("double"), 6).alias("rbo"),
    )


# ---------------------------------------------------------------------------
# q458 — alpha-DCG@10 + subtopic recall

_ALPHA_DISC = [1.0 / math.log2(i + 1) for i in range(1, ALPHA_K + 1)]
_NOVELTY = {k: 0.5**k for k in range(0, ALPHA_K)}  # (1-alpha)^seen, alpha=.5


def _alpha_oracle() -> str:
    disc = ", ".join(repr(d) for d in _ALPHA_DISC)
    nov = " ".join(f"WHEN {k} THEN {v!r}" for k, v in _NOVELTY.items())
    return f"""
    WITH {_RUNS_SQL},
    run AS (
      SELECT l.r AS pos, d.source,
             CASE WHEN s.doc_id IS NOT NULL THEN 1 ELSE 0 END AS rel
      FROM lex l
      JOIN documents d ON d.doc_id = l.doc_id
      LEFT JOIN (SELECT doc_id FROM sem WHERE r <= {ALPHA_K}) s
        ON s.doc_id = l.doc_id
      WHERE l.r <= {ALPHA_K}
    ),
    seen AS (
      SELECT pos, rel,
             COUNT(CASE WHEN rel = 1 THEN 1 END) OVER (
               PARTITION BY source ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS k
      FROM run
    ),
    terms AS (
      SELECT ROUND(rel * (CASE COALESCE(k, 0) {nov} ELSE 0.0 END)
                   * ([{disc}])[pos], 8) AS term
      FROM seen
    ),
    cov AS (
      SELECT CAST(COUNT(DISTINCT d.source) AS BIGINT) AS covered
      FROM lex l JOIN documents d ON d.doc_id = l.doc_id
      WHERE l.r <= {ALPHA_K}
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sub
            FROM documents)
    SELECT 0.5 AS alpha,
           ROUND(CAST(SUM(CAST(t.term AS DECIMAL(38,8))) AS DOUBLE), 5)
             AS alpha_dcg,
           c.covered AS subtopics_covered,
           ROUND(CAST(c.covered AS DOUBLE) / n.n_sub, 6) AS subtopic_recall
    FROM terms t CROSS JOIN cov c CROSS JOIN tot n
    GROUP BY c.covered, n.n_sub
    """


@query("q458_alpha_ndcg", oracle=_alpha_oracle())
def q458_alpha_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """alpha-DCG@10 with source as the subtopic and alpha = 0.5: each
    relevant doc's gain is discounted by 0.5^(relevant same-source
    docs ranked above it) — redundancy-punished relevance — plus
    subtopic recall@10. Novelty factors 0.5^k and position discounts
    are Python literals (powers of two / precomputed log2, rule 11);
    the seen-counter window runs over the 10-row truncated run.
    Reported unnormalized: the greedy-ideal normalizer is sequential
    and belongs in an eval harness, not a distributed scan."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    lex = _lex_ranked(docs).filter(F.col("r") <= ALPHA_K)
    sem = _sem_ranked(emb).filter(F.col("r") <= ALPHA_K).select("doc_id")
    run = (
        lex.join(F.broadcast(docs.select("doc_id", "source")), "doc_id")
        .join(F.broadcast(sem.withColumn("rel", F.lit(1))), "doc_id", "left")
        .select(
            F.col("r").alias("pos"),
            "source",
            F.coalesce("rel", F.lit(0)).alias("rel"),
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seen = run.withColumn("k", F.count(F.when(F.col("rel") == 1, 1)).over(w))
    nov_expr = "CASE COALESCE(k, 0) " + " ".join(
        f"WHEN {k} THEN {v!r}" for k, v in _NOVELTY.items()
    ) + " ELSE 0.0 END"
    disc = F.array(*[F.lit(d) for d in _ALPHA_DISC])
    terms = seen.select(
        F.round(
            F.col("rel") * F.expr(nov_expr) * F.element_at(disc, F.col("pos")), 8
        )
        .cast("decimal(38,8)")
        .alias("term")
    )
    covered = lex.join(F.broadcast(docs.select("doc_id", "source")), "doc_id").agg(
        F.countDistinct("source").cast("bigint").alias("covered")
    )
    total = docs.agg(F.countDistinct("source").cast("bigint").alias("n_sub"))
    return (
        terms.agg(F.round(F.sum("term").cast("double"), 5).alias("alpha_dcg"))
        .crossJoin(F.broadcast(covered))
        .crossJoin(F.broadcast(total))
        .select(
            F.lit(0.5).alias("alpha"),
            "alpha_dcg",
            F.col("covered").alias("subtopics_covered"),
            F.round(F.col("covered").cast("double") / F.col("n_sub"), 6).alias(
                "subtopic_recall"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q459 — clarity score


def _clarity_oracle() -> str:
    return f"""
    WITH {_RUNS_SQL},
    fb AS (SELECT doc_id FROM lex WHERE r <= {CLARITY_FB_DOCS}),
    fb_tokens AS (
      SELECT d.doc_id, unnest(string_split(d.text, ' ')) AS w
      FROM documents d JOIN fb ON fb.doc_id = d.doc_id
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl
           FROM fb_tokens GROUP BY doc_id),
    tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
           FROM fb_tokens GROUP BY doc_id, w),
    qmodel AS (
      -- P(w|Q) = mean over feedback docs of tf/dl; each quotient is an
      -- exact-operand IEEE division rounded at 12 dp into a DECIMAL sum
      SELECT tf.w,
             CAST(SUM(CAST(ROUND(CAST(tf.tf AS DOUBLE) / dl.dl, 12)
                  AS DECIMAL(38,12))) AS DOUBLE) / {CLARITY_FB_DOCS} AS q
      FROM tf JOIN dl ON dl.doc_id = tf.doc_id
      GROUP BY tf.w
    ),
    coll_tokens AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    coll_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM coll_tokens),
    cf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cf
           FROM coll_tokens GROUP BY w)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
           ROUND(CAST(SUM(CAST(ROUND(
             q.q * LN(q.q * n.n / cf.cf) / {LN2}, 9)
             AS DECIMAL(38,9))) AS DOUBLE), 5) AS clarity_bits
    FROM qmodel q JOIN cf ON cf.w = q.w CROSS JOIN coll_n n
    """


@query("q459_clarity_score", oracle=_clarity_oracle())
def q459_clarity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query clarity (Cronen-Townsend 2002): KL(P(w|feedback-model) ||
    P(w|collection)) in bits, with the feedback model the uniform
    mixture of the top-10 lexical docs' MLE unigram models. High
    clarity = the retrieved set speaks a focused sub-language =
    the query will perform well — the classic pre-retrieval QPP.
    Vocabulary is the feedback docs' words only; collection stats are
    two integer aggregates. ln terms round at 9 dp into a DECIMAL sum,
    output at 5 dp (rule 5); P ratios are exact-operand divisions
    (KL rewritten as ln(q*N/cf) so both engines divide identical
    exact integers)."""
    docs = load_table(spark, sf_dir, "documents")
    fb = _lex_ranked(docs).filter(F.col("r") <= CLARITY_FB_DOCS).select("doc_id")
    fb_tokens = (
        docs.join(F.broadcast(fb), "doc_id")
        .select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    )
    dl = fb_tokens.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("dl"))
    tf = fb_tokens.groupBy("doc_id", "w").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    qmodel = (
        tf.join(dl, "doc_id")
        .groupBy("w")
        .agg(
            (
                F.sum(
                    F.round(F.col("tf").cast("double") / F.col("dl"), 12).cast(
                        "decimal(38,12)"
                    )
                ).cast("double")
                / CLARITY_FB_DOCS
            ).alias("q")
        )
    )
    coll_tokens = docs.select(F.explode(F.split("text", " ")).alias("w"))
    coll_n = coll_tokens.agg(F.count("*").cast("bigint").alias("n"))
    cf = coll_tokens.groupBy("w").agg(F.count("*").cast("bigint").alias("cf"))
    joined = qmodel.join(cf, "w").crossJoin(F.broadcast(coll_n))
    term = F.round(
        F.col("q")
        * F.log(F.col("q") * F.col("n") / F.col("cf"))
        / float(math.log(2.0)),
        9,
    ).cast("decimal(38,9)")
    return joined.agg(
        F.count("*").cast("bigint").alias("n_vocab"),
        F.round(F.sum(term).cast("double"), 5).alias("clarity_bits"),
    )


# ---------------------------------------------------------------------------
# q460 — tau-AP


def _tau_ap_oracle() -> str:
    return f"""
    WITH {_RUNS_SQL},
    inter AS (
      SELECT l.doc_id, l.r AS rl, s.r AS rs
      FROM lex l JOIN sem s ON s.doc_id = l.doc_id
    ),
    rr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY rl) AS ra,
             ROW_NUMBER() OVER (ORDER BY rs) AS rb
      FROM inter
    ),
    n_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rr),
    conc AS (
      -- unordered concordant pairs, credited at the LOWER-ranked
      -- item's position in each reference direction
      SELECT x.ra AS pa, x.rb AS pb
      FROM rr x JOIN rr y
        ON y.ra < x.ra AND y.rb < x.rb
    ),
    ca AS (SELECT pa AS pos, CAST(COUNT(*) AS BIGINT) AS c
           FROM conc GROUP BY pa),
    cb AS (SELECT pb AS pos, CAST(COUNT(*) AS BIGINT) AS c
           FROM conc GROUP BY pb),
    pos_ AS (SELECT ra AS pos FROM rr WHERE ra >= 2),
    terms AS (
      SELECT p.pos,
             CAST(ROUND(CAST(COALESCE(ca.c, 0) AS DOUBLE) / (p.pos - 1), 10)
                  AS DECIMAL(38,10)) AS ta,
             CAST(ROUND(CAST(COALESCE(cb.c, 0) AS DOUBLE) / (p.pos - 1), 10)
                  AS DECIMAL(38,10)) AS tb
      FROM pos_ p
      LEFT JOIN ca ON ca.pos = p.pos
      LEFT JOIN cb ON cb.pos = p.pos
    )
    SELECT n.n AS n_common,
           ROUND(2.0 * CAST(SUM(t.ta) AS DOUBLE) / (n.n - 1) - 1.0, 6)
             AS tau_ap_lex_ref,
           ROUND(2.0 * CAST(SUM(t.tb) AS DOUBLE) / (n.n - 1) - 1.0, 6)
             AS tau_ap_sem_ref,
           ROUND((2.0 * CAST(SUM(t.ta) AS DOUBLE) / (n.n - 1)
                  + 2.0 * CAST(SUM(t.tb) AS DOUBLE) / (n.n - 1)) / 2.0 - 1.0, 6)
             AS tau_ap_sym
    FROM terms t CROSS JOIN n_ n
    GROUP BY n.n
    """


@query("q460_tau_ap", oracle=_tau_ap_oracle())
def q460_tau_ap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tau-AP (Yilmaz et al. 2008): the top-weighted rank correlation
    between the lexical and semantic runs on their common items —
    position-i credit is the fraction of items above i in the
    reference that are concordant, so disagreement near the TOP costs
    more than at depth (what plain Kendall tau q230 cannot express).
    Both reference directions + symmetric mean. Exact integer pair
    counting over the bounded intersection (<= RRF_DEPTH rows, <= n^2
    = 10^4 pairs); per-position rationals round at 10 dp into DECIMAL
    sums. The re-rank windows run over the truncated intersection —
    q137's bounded class."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    inter = (
        _lex_ranked(docs)
        .select("doc_id", F.col("r").alias("rl"))
        .join(_sem_ranked(emb).select("doc_id", F.col("r").alias("rs")), "doc_id")
    )
    rr = inter.select(
        "doc_id",
        F.row_number().over(Window.orderBy("rl")).alias("ra"),
        F.row_number().over(Window.orderBy("rs")).alias("rb"),
    )
    # r10 P3 staging: rr is referenced 4x (n_, both conc sides, pos_) and
    # each reference re-ran the full lex+sem corpus pipeline under
    # Catalyst inlining (12 duplicate scans in the static plan). ONE
    # corpus pass checkpoints the <= RRF_DEPTH-row intersection; the
    # non-equi self-join gets an explicit broadcast because a
    # LogicalRDD's default size estimate blocks auto-broadcast (the
    # q645 lesson).
    rr = rr.localCheckpoint(eager=True)
    n_ = rr.agg(F.count("*").cast("bigint").alias("n"))
    x, y = rr.alias("x"), rr.alias("y")
    conc = x.join(
        F.broadcast(y),
        (F.col("y.ra") < F.col("x.ra")) & (F.col("y.rb") < F.col("x.rb")),
    ).select(F.col("x.ra").alias("pa"), F.col("x.rb").alias("pb"))
    ca = conc.groupBy(F.col("pa").alias("pos")).agg(
        F.count("*").cast("bigint").alias("c_a")
    )
    cb = conc.groupBy(F.col("pb").alias("pos")).agg(
        F.count("*").cast("bigint").alias("c_b")
    )
    pos_ = rr.filter(F.col("ra") >= 2).select(F.col("ra").alias("pos"))
    terms = (
        pos_.join(ca, "pos", "left")
        .join(cb, "pos", "left")
        .select(
            F.round(
                F.coalesce("c_a", F.lit(0)).cast("double") / (F.col("pos") - 1), 10
            )
            .cast("decimal(38,10)")
            .alias("ta"),
            F.round(
                F.coalesce("c_b", F.lit(0)).cast("double") / (F.col("pos") - 1), 10
            )
            .cast("decimal(38,10)")
            .alias("tb"),
        )
    )
    sum_a = F.sum("ta").cast("double")
    sum_b = F.sum("tb").cast("double")
    return (
        terms.crossJoin(F.broadcast(n_))
        .groupBy("n")
        .agg(
            F.round(2.0 * sum_a / (F.col("n") - 1) - 1.0, 6).alias(
                "tau_ap_lex_ref"
            ),
            F.round(2.0 * sum_b / (F.col("n") - 1) - 1.0, 6).alias(
                "tau_ap_sem_ref"
            ),
            F.round(
                (2.0 * sum_a / (F.col("n") - 1) + 2.0 * sum_b / (F.col("n") - 1))
                / 2.0
                - 1.0,
                6,
            ).alias("tau_ap_sym"),
        )
        .select(
            F.col("n").alias("n_common"),
            "tau_ap_lex_ref",
            "tau_ap_sem_ref",
            "tau_ap_sym",
        )
    )
