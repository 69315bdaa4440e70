"""Retrieval & LLM-eval batch 65 (q391-q396): the language-model
retrieval scorers beside q66's BM25, pseudo-relevance feedback, rank
fusion, and the two estimator-grade LLM evaluation metrics every
model-eval harness computes:

- q391 query-likelihood with Dirichlet smoothing (Zhai & Lafferty
  2001): score(d) = sum_t log((tf + mu*p(t|C)) / (dl + mu));
- q392 Jelinek-Mercer smoothing: sum_t log(lam*p(t|d) + (1-lam)*p(t|C));
- q393 pseudo-relevance feedback: expansion terms by tf-idf mass in
  the top-N feedback docs (Rocchio's positive term, the RM1 shape);
- q394 Borda-count rank fusion of two bounded top-D rankings (the
  positional cousin of q137's RRF);
- q395 pass@k: the unbiased estimator 1 - C(n-c,k)/C(n,k) per task
  (Chen et al. 2021, HumanEval) — computed as an exact integer-product
  ratio, never factorials;
- q396 length-controlled win rate: regression-adjusted preference win
  rate at zero length difference (the AlpacaEval-LC debiasing, as a
  closed-form one-feature OLS).

Determinism: per-term log scores round to 9 dp and accumulate in
DECIMAL (the q66 idiom); pass@k products stay in BIGINT; the OLS
moments accumulate exactly; single divisions at the edge.

100 TB shapes: LM scorers join a 3-term broadcast tf table against
per-doc lengths (docs WITHOUT query terms still score — the smoothing
penalty is a per-doc closed form, no explode of the full corpus
vocabulary); fusion ranks only top-D truncated lists (TakeOrdered
pre-truncates); pass@k and LC-winrate are one aggregate each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .textops import BM25_TERMS

LM_MU = 100.0
LM_LAMBDA = 0.5
LM_TOPK = 20
PRF_FEEDBACK_DOCS = 10
PRF_TERMS = 10
FUSION_DEPTH = 50
PASS_K = 5


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


def _terms_sql() -> str:
    return ", ".join(f"'{t}'" for t in BM25_TERMS)


# ---------------------------------------------------------------------------
# q391 / q392 — smoothed query-likelihood LMs
#
# Both scorers share the same skeleton: per-doc tf for the 3 query
# terms (0 when absent), per-term collection probability p(t|C)
# broadcast, then a per-doc sum of per-term log scores. Docs with no
# query term still score (the smoothing mass) — the oracle crosses the
# doc-length table with the 3-term dimension so every (doc, term) cell
# exists.


def _lm_oracle(kind: str) -> str:
    # CAST to DOUBLE before any division: a bare 0.5/100.0 literal is
    # DECIMAL in DuckDB and the decimal-division scale would diverge
    # from Spark's double math.
    if kind == "dirichlet":
        term_score = (
            f"LN((CAST(COALESCE(tf.tf, 0) AS DOUBLE) + {LM_MU} * ct.p_c)"
            f" / (CAST(dl.dl AS DOUBLE) + {LM_MU}))"
        )
    else:  # jelinek-mercer
        term_score = (
            f"LN({LM_LAMBDA} * CAST(COALESCE(tf.tf, 0) AS DOUBLE) / dl.dl"
            f" + {1 - LM_LAMBDA} * ct.p_c)"
        )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    coll AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c_len FROM toks),
    qterms AS (SELECT unnest([{_terms_sql()}]) AS term),
    ct AS (
      SELECT q.term,
             SUM(CASE WHEN t.term = q.term THEN 1 ELSE 0 END)
               / (SELECT c_len FROM coll) AS p_c
      FROM qterms q, toks t GROUP BY q.term
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN ({_terms_sql()}) GROUP BY doc_id, term
    ),
    scored AS (
      SELECT dl.doc_id,
             SUM(CAST(ROUND({term_score}, 9) AS DECIMAL(38,9))) AS score
      FROM dl CROSS JOIN ct
      LEFT JOIN tf ON tf.doc_id = dl.doc_id AND tf.term = ct.term
      GROUP BY dl.doc_id
    )
    SELECT doc_id, ROUND(CAST(score AS DOUBLE), 6) AS lm_score
    FROM scored ORDER BY lm_score DESC, doc_id LIMIT {LM_TOPK}
    """


def _lm_spark(spark: SparkSession, sf_dir: str, kind: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks_arr = F.split("text", " ")
    dl = docs.select("doc_id", F.size(toks_arr).alias("dl"))
    words = docs.select("doc_id", F.explode(toks_arr).alias("term"))
    c_len = words.agg(F.count(F.lit(1)).cast("double").alias("c_len"))
    qterms = spark.createDataFrame([(t,) for t in BM25_TERMS], "term string")
    ct = (
        words.join(F.broadcast(qterms), "term", "left_semi")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cf"))
        .join(F.broadcast(qterms), "term", "right")
        .crossJoin(F.broadcast(c_len))
        .select(
            "term",
            (F.coalesce(F.col("cf"), F.lit(0)) / F.col("c_len")).alias("p_c"),
        )
    )
    tf = (
        words.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    cells = (
        dl.crossJoin(F.broadcast(ct))
        .join(tf, ["doc_id", "term"], "left")
        .withColumn("tf", F.coalesce(F.col("tf"), F.lit(0)))
    )
    if kind == "dirichlet":
        term_score = F.log(
            (F.col("tf") + LM_MU * F.col("p_c")) / (F.col("dl") + LM_MU)
        )
    else:
        term_score = F.log(
            LM_LAMBDA * F.col("tf") / F.col("dl")
            + (1 - LM_LAMBDA) * F.col("p_c")
        )
    scored = cells.groupBy("doc_id").agg(
        F.sum(F.round(term_score, 9).cast("decimal(38,9)")).alias("score")
    )
    return (
        scored.select(
            "doc_id", F.round(F.col("score").cast("double"), 6).alias("lm_score")
        )
        .orderBy(F.desc("lm_score"), "doc_id")
        .limit(LM_TOPK)
    )


@query("q391_lm_dirichlet", oracle=_lm_oracle("dirichlet"))
def q391_lm_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet-prior smoothing
    (mu={LM_MU}): every doc scores sum_t log((tf + mu p(t|C)) /
    (dl + mu)) for the fixed 3-term query — the probabilistic ranker
    beside q66's BM25 (Zhai & Lafferty 2001). The per-(doc, term) cell
    table comes from crossing doc lengths with the 3-row broadcast term
    dimension and LEFT-joining sparse tfs — docs without query terms
    still score their smoothing mass, with no corpus-vocabulary
    explode. Per-term logs round to 9 dp into DECIMAL; top-{LM_TOPK}
    via TakeOrdered."""
    return _lm_spark(spark, sf_dir, "dirichlet")


@query("q392_lm_jelinek_mercer", oracle=_lm_oracle("jm"))
def q392_lm_jelinek_mercer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Jelinek-Mercer interpolation
    (lambda={LM_LAMBDA}): sum_t log(lam tf/dl + (1-lam) p(t|C)) — the
    linear-interpolation smoother, same broadcast cell plan as q391;
    the two scorers differ only in the per-cell expression (the
    documented smoothing tradeoff: JM favors long docs less than
    Dirichlet). Identical determinism contract."""
    return _lm_spark(spark, sf_dir, "jm")


# ---------------------------------------------------------------------------
# q393 — pseudo-relevance feedback expansion terms


def _prf_oracle() -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    qtf AS (
      SELECT doc_id, COUNT(*) AS hits FROM toks
      WHERE term IN ({_terms_sql()}) GROUP BY doc_id
    ),
    feedback AS (
      SELECT doc_id FROM qtf ORDER BY hits DESC, doc_id
      LIMIT {PRF_FEEDBACK_DOCS}
    ),
    n_docs AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ),
    fb_tf AS (
      SELECT t.term, COUNT(*) AS fb_count
      FROM toks t JOIN feedback f ON f.doc_id = t.doc_id
      WHERE t.term NOT IN ({_terms_sql()})
      GROUP BY t.term
    )
    SELECT f.term, CAST(f.fb_count AS BIGINT) AS fb_count,
           CAST(d.df AS BIGINT) AS df,
           ROUND(f.fb_count * LN((SELECT n FROM n_docs) / d.df), 6)
             AS rocchio_weight
    FROM fb_tf f JOIN dfreq d ON d.term = f.term
    ORDER BY rocchio_weight DESC, f.term LIMIT {PRF_TERMS}
    """


@query("q393_prf_expansion", oracle=_prf_oracle())
def q393_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance feedback: take the top-{PRF_FEEDBACK_DOCS} docs
    by query-term hits as the feedback set, and rank candidate
    expansion terms by tf-in-feedback x idf (Rocchio's positive term /
    the RM1 shape) — the query-expansion pass in front of a second
    retrieval round. The feedback set is a TakeOrdered {PRF_FEEDBACK_DOCS}-row
    broadcast; the expansion aggregate runs only over those docs' terms;
    df comes from the corpus-level term aggregate. Single terminal
    double per term."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    qtf = (
        toks.filter(F.col("term").isin(BM25_TERMS))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    feedback = qtf.orderBy(F.desc("hits"), "doc_id").limit(PRF_FEEDBACK_DOCS)
    n_docs = docs.agg(F.count(F.lit(1)).cast("double").alias("n"))
    dfreq = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    fb_tf = (
        toks.join(F.broadcast(feedback.select("doc_id")), "doc_id")
        .filter(~F.col("term").isin(BM25_TERMS))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("fb_count"))
    )
    return (
        fb_tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            F.col("fb_count").cast("bigint").alias("fb_count"),
            F.col("df").cast("bigint").alias("df"),
            F.round(
                F.col("fb_count") * F.log(F.col("n") / F.col("df")), 6
            ).alias("rocchio_weight"),
        )
        .orderBy(F.desc("rocchio_weight"), "term")
        .limit(PRF_TERMS)
    )


# ---------------------------------------------------------------------------
# q394 — Borda-count fusion


def _borda_oracle() -> str:
    return f"""
    WITH scored AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS dl,
             len(list_filter(string_split(text, ' '),
                 t -> t IN ('the', 'a', 'of', 'and'))) * 1.0
               / len(string_split(text, ' ')) AS quality
      FROM documents
    ),
    run_a AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY dl DESC, doc_id) AS rk
      FROM scored QUALIFY rk <= {FUSION_DEPTH}
    ),
    run_b AS (
      SELECT doc_id, ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id) AS rk
      FROM scored QUALIFY rk <= {FUSION_DEPTH}
    ),
    points AS (
      SELECT doc_id, {FUSION_DEPTH} - rk + 1 AS pts FROM run_a
      UNION ALL
      SELECT doc_id, {FUSION_DEPTH} - rk + 1 AS pts FROM run_b
    )
    SELECT doc_id,
           CAST(SUM(pts) AS BIGINT) AS borda_points,
           CAST(COUNT(*) AS BIGINT) AS n_runs
    FROM points GROUP BY doc_id
    ORDER BY borda_points DESC, doc_id LIMIT {LM_TOPK}
    """


@query("q394_borda_fusion", oracle=_borda_oracle())
def q394_borda_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borda-count fusion of two bounded rankings (by length, by
    stopword quality): each run awards {FUSION_DEPTH}-rank+1 points to
    its top-{FUSION_DEPTH}, fused docs rank by total points — the
    positional fusion baseline beside q137's RRF (Borda is sensitive to
    run depth, RRF is not; shipping both is how fusion choices get
    justified). TakeOrdered pre-truncates each run to {FUSION_DEPTH}
    rows before the rank window, so the only ordered windows run on
    {FUSION_DEPTH}-row inputs. Pure integer points."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    scored = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        (
            F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and")))
            * 1.0
            / F.size(toks)
        ).alias("quality"),
    ).localCheckpoint()

    def run(order_col, name):
        top = scored.orderBy(F.desc(order_col), "doc_id").limit(FUSION_DEPTH)
        return top.withColumn(
            "rk", F.row_number().over(W.orderBy(F.desc(order_col), "doc_id"))
        ).select("doc_id", (F.lit(FUSION_DEPTH) - F.col("rk") + 1).alias("pts"))

    points = run("dl", "a").unionByName(run("quality", "b"))
    return (
        points.groupBy("doc_id")
        .agg(
            F.sum("pts").cast("bigint").alias("borda_points"),
            F.count(F.lit(1)).cast("bigint").alias("n_runs"),
        )
        .orderBy(F.desc("borda_points"), "doc_id")
        .limit(LM_TOPK)
    )


# ---------------------------------------------------------------------------
# q395 — pass@k


def _passk_oracle() -> str:
    # 1 - C(n-c, k)/C(n, k) = 1 - prod_{i=0}^{k-1} (n-c-i)/(n-i),
    # computed as one exact BIGINT product per side (k fixed at
    # {PASS_K}); estimate 0 when c = 0 and 1 when n - c < k.
    num = " * ".join(f"GREATEST(n - c - {i}, 0)" for i in range(PASS_K))
    den = " * ".join(f"(n - {i})" for i in range(PASS_K))
    return f"""
    WITH tasks AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN (('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                                  1, 4))::BIGINT) % 4 = 0
                           THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM documents GROUP BY source
    )
    SELECT source, n AS n_samples, c AS n_correct,
           ROUND(1.0 - CAST({num} AS DOUBLE) / ({den}), 6)
             AS pass_at_k
    FROM tasks ORDER BY source
    """


@query("q395_pass_at_k", oracle=_passk_oracle())
def q395_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k (k={PASS_K}) per task: the unbiased estimator
    1 - C(n-c,k)/C(n,k) from n samples with c correct (Chen et al.
    2021) — THE LLM code-eval metric, computed the numerically-stable
    way: the binomial ratio collapses to a product of {PASS_K} exact
    integer factors per side (never a factorial, never a float
    intermediate), so the result is one exact division. Tasks = the 20
    sources; correctness = an md5-derived deterministic predicate.
    Scale: one 20-key aggregate; the estimator is per-row algebra."""
    docs = _docs(spark, sf_dir)
    h = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
    tasks = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(h.cast("bigint") % 4 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("c"),
    )
    num = F.lit(1).cast("bigint")
    den = F.lit(1).cast("bigint")
    for i in range(PASS_K):
        num = num * F.greatest(F.col("n") - F.col("c") - i, F.lit(0))
        den = den * (F.col("n") - i)
    return tasks.select(
        "source",
        F.col("n").alias("n_samples"),
        F.col("c").alias("n_correct"),
        F.round(1.0 - num.cast("double") / den, 6).alias("pass_at_k"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# q396 — length-controlled win rate


def _lc_oracle() -> str:
    return """
    WITH pairs AS (
      SELECT a.doc_id AS pair_id,
             len(string_split(a.text, ' ')) AS len_a,
             len(string_split(b.text, ' ')) AS len_b,
             CASE WHEN (('0x' || substr(md5(CAST(a.doc_id AS VARCHAR) || '_w'),
                         1, 4))::BIGINT
                        + len(string_split(a.text, ' '))
                        - len(string_split(b.text, ' '))) % 100 < 55
                  THEN 1 ELSE 0 END AS win_a
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      WHERE a.doc_id % 2 = 0
    ),
    moments AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(len_a - len_b) AS BIGINT) AS sx,
             CAST(SUM(win_a) AS BIGINT) AS sy,
             CAST(SUM((len_a - len_b) * (len_a - len_b)) AS BIGINT) AS sxx,
             CAST(SUM((len_a - len_b) * win_a) AS BIGINT) AS sxy
      FROM pairs
    )
    SELECT n AS n_pairs,
           ROUND(CAST(sy AS DOUBLE) / n, 6) AS raw_winrate,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx), 9)
             AS beta_length,
           ROUND(CAST(sy AS DOUBLE) / n
                 - ((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                    / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx))
                   * (CAST(sx AS DOUBLE) / n), 6) AS lc_winrate
    FROM moments
    """


@query("q396_length_controlled_winrate", oracle=_lc_oracle())
def q396_length_controlled_winrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-controlled win rate: pair consecutive docs as model-A /
    model-B responses, with a deterministic win indicator whose odds
    tilt with the length difference (planted bias), then report the
    OLS-adjusted win rate at ZERO length difference — the AlpacaEval-LC
    debiasing reduced to its closed form (one-feature linear
    probability model: alpha = ybar - beta*xbar). Moments are exact
    BIGINTs; beta/alpha are terminal double expressions. Scale: one
    self-join on doc_id+1 (co-partitioned equi-join) and a single
    moment aggregate."""
    docs = _docs(spark, sf_dir)
    a = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("pair_id"),
        F.size(F.split("text", " ")).alias("len_a"),
    )
    b = docs.select(
        (F.col("doc_id") - 1).alias("pair_id"),
        F.size(F.split("text", " ")).alias("len_b"),
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.col("pair_id").cast("string"), F.lit("_w"))), 1, 4),
        16,
        10,
    ).cast("bigint")
    pairs = a.join(b, "pair_id").select(
        "pair_id",
        "len_a",
        "len_b",
        F.when(
            (h + F.col("len_a") - F.col("len_b")) % 100 < 55, 1
        ).otherwise(0).alias("win_a"),
    )
    x = F.col("len_a") - F.col("len_b")
    m = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x).cast("bigint").alias("sx"),
        F.sum("win_a").cast("bigint").alias("sy"),
        F.sum(x * x).cast("bigint").alias("sxx"),
        F.sum(x * F.col("win_a")).cast("bigint").alias("sxy"),
    )
    beta = (
        F.col("n") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.col("n") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx")
    )
    return m.select(
        F.col("n").alias("n_pairs"),
        F.round(F.col("sy").cast("double") / F.col("n"), 6).alias("raw_winrate"),
        F.round(beta, 9).alias("beta_length"),
        F.round(
            F.col("sy").cast("double") / F.col("n")
            - beta * (F.col("sx").cast("double") / F.col("n")),
            6,
        ).alias("lc_winrate"),
    )
