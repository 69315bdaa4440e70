"""Centrality & unsupervised-ranking batch 87 (q501-q505) — the
graph/text/outlier scoring operators beside q86 (PageRank), q312
(HITS), and q293 (anomaly ensemble):

- q501 TextRank keywords (Mihalcea & Tarau 2004): PageRank with
  d = 0.85 over the word co-occurrence (bigram) graph, 3 unrolled
  iterations in q86's integer-mass discipline — top-20 corpus
  keywords with no supervision;
- q502 Katz centrality: x <- beta + alpha * A x over the q86
  part<->supplier graph, 4 unrolled iterations with alpha = 1/1024
  (a power of two BELOW 1/lambda_max, so the integer mass both
  converges and cannot overflow BIGINT);
- q503 RAKE keyword phrases (Rose et al. 2010): stopword-delimited
  phrases via per-doc gaps-and-islands, word score = degree/freq,
  phrase score = sum of member scores — top-20 phrases;
- q504 ECOD outliers (Li et al. 2022, simplified symmetric variant):
  per-dimension ECDF tail probabilities of every embedding value,
  summed as -ln(2 min(F, 1-F)) across the 64 dims — top-10 outlier
  vectors with no distance computation at all;
- q505 theta forecast (Assimakopoulos & Nikolopoulos 2000, the
  two-line variant): equal blend of the linear-trend extrapolation
  and an alpha = 1/2 SES on the theta=2 line over the 28-day daily
  series — 7-day-ahead forecasts.

Determinism: graph masses are BIGINT with floor division (the q86
contract); RAKE/ECOD ratios are exact rationals with ln terms at
9 dp into DECIMAL sums (rule 5); the SES alpha = 1/2 weights are
exact powers of two (q114's trick) with per-term rounding for
order-free sums; ECDF ranks use RANK() so ties share one F value.

100 TB shapes: TextRank/Katz iterations are vocab/node-bounded
joins + aggregates (two shuffles per iteration); RAKE's islands are
per-doc windows; ECOD's per-dim rank windows partition on dim —
at 100 TB route them through the bucketed prefix scan
(operators/prefix.py), the documented swap for value-domain ECDFs;
theta runs on the 28-row calendar table.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TR_ITERS = 3
TR_TOP = 20
TR_TOTAL = 10**12
KATZ_ITERS = 4
KATZ_TOP = 20
KATZ_SCALE = 10**9
KATZ_DIV = 1024  # alpha = 1/1024, a power of two under 1/lambda_max
STOPWORDS = "'the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for', 'with'"
RAKE_TOP = 20
ECOD_TOP = 10
N_DAYS = 28
ANCHOR = "2024-01-01"
HORIZONS = 7
# SES alpha=1/2 weights for a 28-point series: the latest point gets
# 1/2, each step back halves (w_i = 2^-(n+1-i)), and the first point
# keeps the leftover (1-alpha)^(n-1) initial mass — weights sum to 1
_SES_W = [2.0 ** -(N_DAYS + 1 - i) for i in range(1, N_DAYS + 1)]
_SES_W[0] *= 2.0


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _idiv(dialect: str, a: str, b: str) -> str:
    return f"({a} div {b})" if dialect == "spark" else f"({a} // {b})"


def _toks(dialect: str) -> str:
    return "string_split(text, ' ')" if dialect == "duck" else "split(text, ' ')"


# ---------------------------------------------------------------------------
# q501 — TextRank keywords


# --- Spark-side staging for q501 (oracle keeps the single statement) --------
#
# Every unrolled TextRank iteration references `ew`, and ew's lineage
# (bigram explode -> e0 -> edges x2 -> strength join) re-expanded the
# corpus pass per reference under Catalyst inlining (138 Exchanges).
# ONE corpus pass materializes the vocab-bounded weighted edge table;
# strength and nn are exact derivations of it (ew = edges JOIN strength
# ON src, so DISTINCT (src, s) over ew IS strength).

_EW_VIEW = "rankcentral_ew_mv"

_TR_STAGED_HEAD = f"""ew AS (
      SELECT src, dst, w, s FROM {_EW_VIEW}
    ),
    strength AS (
      SELECT DISTINCT src, s FROM ew
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM strength)"""


def _ew_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE bigram corpus pass -> checkpointed (src, dst, w, s)."""
    _views(spark, sf_dir, "documents")
    full = _textrank_sql("spark")
    head, sep, _ = full.partition("),\n    nn AS (")
    assert sep, "textrank CTE marker drifted"
    df = spark.sql(head + ") SELECT src, dst, w, s FROM ew")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_EW_VIEW)


def _textrank_sql(dialect: str, staged: bool = False) -> str:
    if dialect == "duck":
        bigrams = (
            f"list_transform(range(1, len({_toks(dialect)})), "
            f"i -> ({_toks(dialect)})[i] || ' ' || ({_toks(dialect)})[i+1])"
        )
        unn = "unnest"
    else:
        bigrams = (
            f"CASE WHEN size({_toks(dialect)}) < 2 THEN array() "
            f"ELSE transform(sequence(1, size({_toks(dialect)}) - 1), "
            f"i -> concat_ws(' ', slice({_toks(dialect)}, i, 2))) END"
        )
        unn = "explode"
    iters = []
    prev = "tr0"
    for i in range(1, TR_ITERS + 1):
        share = _idiv(dialect, "p.r * ew.w", "ew.s")
        base = _idiv(dialect, f"{_idiv(dialect, str(TR_TOTAL * 15), '100')}", "nn.n")
        iters.append(f"""
    tr{i} AS (
      SELECT ew.dst AS w, {base}
               + {_idiv(dialect, f"(SUM({share}) * 85)", "100")} AS r
      FROM ew JOIN {prev} p ON p.w = ew.src CROSS JOIN nn
      GROUP BY ew.dst, nn.n
    )""")
        prev = f"tr{i}"
    if staged:
        head = f"""
    WITH {_TR_STAGED_HEAD},
    tr0 AS ("""
    else:
        head = f"""
    WITH bg AS (
      SELECT {unn}({bigrams}) AS b FROM documents
    ),
    e0 AS (
      SELECT string_split(b, ' ')[1] AS src, string_split(b, ' ')[2] AS dst,
             CAST(COUNT(*) AS BIGINT) AS w
      FROM bg GROUP BY 1, 2
    ) """.replace(
            "string_split(b, ' ')[1]",
            "split(b, ' ')[0]" if dialect == "spark" else "string_split(b, ' ')[1]",
        ).replace(
            "string_split(b, ' ')[2]",
            "split(b, ' ')[1]" if dialect == "spark" else "string_split(b, ' ')[2]",
        ) + f""",
    edges AS (
      SELECT src, dst, w FROM e0 WHERE src <> dst
      UNION ALL
      SELECT dst, src, w FROM e0 WHERE src <> dst
    ),
    strength AS (
      SELECT src, CAST(SUM(w) AS BIGINT) AS s FROM edges GROUP BY src
    ),
    ew AS (
      SELECT e.src, e.dst, e.w, st.s
      FROM edges e JOIN strength st ON st.src = e.src
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM strength),
    tr0 AS ("""
    return (
        head
        + f"""
      SELECT src AS w, {_idiv(dialect, f"CAST({TR_TOTAL} AS BIGINT)", "nn.n")} AS r
      FROM strength CROSS JOIN nn
    ),{",".join(iters)}
    SELECT w AS keyword, CAST(r AS BIGINT) AS rank_mass
    FROM tr{TR_ITERS}
    ORDER BY rank_mass DESC, keyword LIMIT {TR_TOP}
    """
    )


@query("q501_textrank_keywords", oracle=_textrank_sql("duck"))
def q501_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextRank: weighted PageRank (d = 0.85, 3 iterations, uniform
    init) over the corpus bigram co-occurrence graph — the
    unsupervised keyword extractor. Rank is BIGINT mass out of 1e12
    with floor division (q86's bit-exact iteration discipline; mass x
    max edge weight stays far under 2^63). Each iteration = one
    vocab-bounded equi-join + aggregate. Top-20 via orderBy+limit
    (TakeOrdered)."""
    _ew_view(spark, sf_dir)
    return spark.sql(_textrank_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q502 — Katz centrality


_KATZ_EDGES_MV = "rankcentral_edges_mv"


def _katz_edges_view(spark: SparkSession, sf_dir: str) -> None:
    """r10 P3 staging: `edges` is referenced by nodes and by every
    unrolled Katz iteration, and each reference re-ran the DISTINCT
    corpus pass under Catalyst inlining (10 duplicate lineitem scans
    in the static plan). ONE corpus pass checkpoints the deduplicated
    part<->supplier edge list (dimension-pair-bounded, the q93/q310
    edge-list precedent); the oracle keeps the one-statement form."""
    _views(spark, sf_dir, "lineitem")
    df = spark.sql(
        """
        WITH e0 AS (
          SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM lineitem
        )
        SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0"""
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_KATZ_EDGES_MV)


def _katz_sql(dialect: str, staged: bool = False) -> str:
    iters = []
    prev = "kz0"
    for i in range(1, KATZ_ITERS + 1):
        iters.append(f"""
    kz{i} AS (
      SELECT e.dst AS node,
             CAST({KATZ_SCALE} AS BIGINT)
               + {_idiv(dialect, "SUM(p.x)", str(KATZ_DIV))} AS x
      FROM edges e JOIN {prev} p ON p.node = e.src
      GROUP BY e.dst
    )""")
        prev = f"kz{i}"
    label = (
        "CASE WHEN node % 2 = 0 THEN 'p' || CAST("
        + _idiv(dialect, "node", "2")
        + " AS "
        + ("STRING" if dialect == "spark" else "VARCHAR")
        + ") ELSE 's' || CAST("
        + _idiv(dialect, "node", "2")
        + " AS "
        + ("STRING" if dialect == "spark" else "VARCHAR")
        + ") END"
    )
    if staged:
        head = f"edges AS (SELECT src, dst FROM {_KATZ_EDGES_MV}),"
    else:
        head = """e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),"""
    return f"""
    WITH {head}
    nodes AS (SELECT src AS node FROM edges GROUP BY src),
    kz0 AS (SELECT node, CAST({KATZ_SCALE} AS BIGINT) AS x FROM nodes),
    {",".join(iters)}
    SELECT {label} AS node, CAST(x AS BIGINT) AS katz_mass
    FROM kz{KATZ_ITERS}
    ORDER BY katz_mass DESC, node LIMIT {KATZ_TOP}
    """


@query("q502_katz_centrality", oracle=_katz_sql("duck"))
def q502_katz_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality x = sum_k alpha^k A^k 1 over the q86
    part<->supplier graph, 4 unrolled iterations of x <- 1 + alpha A x
    with alpha = 1/1024 — a power of two chosen BELOW 1/lambda_max so
    the attenuated-path series converges AND the BIGINT mass (scale
    1e9) cannot overflow. Unlike degree (k=1) it credits nodes for
    well-connected neighbors; unlike PageRank it doesn't normalize
    out hub mass. Each iteration is one node-bounded join+agg."""
    _katz_edges_view(spark, sf_dir)
    return spark.sql(_katz_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q503 — RAKE keyword phrases


def _rake_sql(dialect: str) -> str:
    if dialect == "duck":
        posexpl = (
            "SELECT doc_id, unnest(generate_series(1, len(toks))) AS pos, "
            "unnest(toks) AS tok FROM tokd"
        )
        toks = "string_split(text, ' ')"
        str_agg = "string_agg(pw.tok, ' ' ORDER BY pw.pos)"
    else:
        posexpl = (
            "SELECT doc_id, posexplode(toks) AS (pos0, tok), pos0 + 1 AS pos "
            "FROM tokd"
        )
        toks = "split(text, ' ')"
        # collect (pos, tok) structs and sort — array_agg alone has no
        # deterministic order in Spark
        str_agg = (
            "array_join(transform(array_sort(collect_list("
            "struct(pw.pos, pw.tok))), s -> s.tok), ' ')"
        )
    # Spark posexplode needs LATERAL VIEW-free syntax: use SELECT with
    # posexplode directly is invalid with extra cols in older forms —
    # handled below with a dedicated branch.
    if dialect == "spark":
        positions = f"""tokd AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ),
    pos_tok AS (
      SELECT doc_id, pos0 + 1 AS pos, tok
      FROM tokd LATERAL VIEW posexplode(toks) t AS pos0, tok
    )"""
    else:
        positions = f"""tokd AS (
      SELECT doc_id, {toks} AS toks FROM documents
    ),
    pos_tok AS ({posexpl})"""
    return f"""
    WITH {positions},
    marked AS (
      SELECT doc_id, pos, tok,
             CASE WHEN tok IN ({STOPWORDS}) THEN 1 ELSE 0 END AS stop
      FROM pos_tok
    ),
    runs AS (
      -- stopword-delimited phrase islands per doc
      SELECT doc_id, pos, tok,
             pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      FROM marked WHERE stop = 0
    ),
    phrase_words AS (
      SELECT doc_id, grp, tok,
             CAST(COUNT(*) OVER (PARTITION BY doc_id, grp) AS BIGINT) AS plen,
             pos
      FROM runs
    ),
    word_stats AS (
      -- RAKE: freq = occurrences, degree = sum of phrase lengths
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM phrase_words GROUP BY tok
    ),
    phrases AS (
      SELECT pw.doc_id, pw.grp,
             {str_agg} AS phrase,
             SUM(CAST(ROUND(CAST(ws.deg AS DOUBLE) / ws.freq, 9)
                 AS DECIMAL(38,9))) AS score
      FROM phrase_words pw JOIN word_stats ws ON ws.tok = pw.tok
      GROUP BY pw.doc_id, pw.grp
    ),
    best AS (
      SELECT phrase, MAX(CAST(score AS DOUBLE)) AS score,
             CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM phrases GROUP BY phrase
    )
    SELECT phrase, ROUND(score, 5) AS rake_score, n_occurrences
    FROM best
    ORDER BY ROUND(score, 5) DESC, phrase LIMIT {RAKE_TOP}
    """


@query("q503_rake_phrases", oracle=_rake_sql("duck"))
def q503_rake_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: phrases are maximal stopword-free
    token runs (per-doc gaps-and-islands on token positions), word
    score = co-occurrence degree / frequency, phrase score = sum of
    member word scores — top-20 phrases corpus-wide. Degree/freq are
    exact integers; per-word ratios round at 9 dp into DECIMAL phrase
    sums; ranking keys on the rounded score with the phrase text as
    tie-break (rule 4). Phrase assembly orders by position inside
    each (doc, island) group."""
    _views(spark, sf_dir, "documents")
    return spark.sql(_rake_sql("spark"))


# ---------------------------------------------------------------------------
# q504 — ECOD outliers


def _ecod_sql(dialect: str) -> str:
    if dialect == "duck":
        expl = (
            "SELECT vec_id, unnest(generate_series(1, len(embedding))) AS dim, "
            "unnest(list_transform(embedding, x -> CAST(x AS DOUBLE))) AS val "
            "FROM embeddings"
        )
    else:
        expl = (
            "SELECT vec_id, pos0 + 1 AS dim, CAST(val AS DOUBLE) AS val "
            "FROM embeddings LATERAL VIEW posexplode(embedding) t AS pos0, val"
        )
    return f"""
    WITH vals AS ({expl}),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS n FROM vals),
    ranked AS (
      -- ties share one ECDF value (RANK, not ROW_NUMBER)
      SELECT vec_id, dim, val,
             RANK() OVER (PARTITION BY dim ORDER BY val) AS rk
      FROM vals
    ),
    tails AS (
      SELECT r.vec_id,
             CAST(ROUND(-LN(LEAST(
               2 * LEAST(CAST(r.rk AS DOUBLE) / (n.n + 1),
                         CAST(1.0 AS DOUBLE)
                           - CAST(r.rk AS DOUBLE) / (n.n + 1)
                           + CAST(1.0 AS DOUBLE) / (n.n + 1)),
               CAST(1.0 AS DOUBLE))), 9) AS DECIMAL(38,9)) AS t
      FROM ranked r CROSS JOIN nn n
    ),
    scores AS (
      SELECT vec_id, CAST(SUM(t) AS DOUBLE) AS score
      FROM tails GROUP BY vec_id
    )
    SELECT vec_id, ROUND(score, 5) AS ecod_score
    FROM scores
    ORDER BY ROUND(score, 5) DESC, vec_id LIMIT {ECOD_TOP}
    """


@query("q504_ecod_outliers", oracle=_ecod_sql("duck"))
def q504_ecod_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ECOD outlier scores (simplified symmetric variant): each
    embedding value's two-sided ECDF tail probability per dimension,
    scored as sum over 64 dims of -ln(2 min(F, 1-F)) — distribution-
    free, parameter-free, NO pairwise distances (the O(n) outlier
    detector). ECDF ranks use RANK() so ties share one F; ln terms
    round at 9 dp into DECIMAL sums; top-10 ranks on the rounded
    score. The per-dim rank windows partition on dim — at 100 TB
    swap in the bucketed prefix scan (operators/prefix.py), the
    documented ECDF scale path (rule 12)."""
    _views(spark, sf_dir, "embeddings")
    return spark.sql(_ecod_sql("spark"))


# ---------------------------------------------------------------------------
# q505 — theta forecast


def _theta_sql(dialect: str) -> str:
    if dialect == "spark":
        day = f"datediff(CAST(ts AS DATE), DATE '{ANCHOR}')"
        grid = f"(SELECT explode(sequence(1, {HORIZONS})) AS h)"
    else:
        day = f"(CAST(ts AS DATE) - DATE '{ANCHOR}')"
        grid = f"(SELECT unnest(range(1, {HORIZONS} + 1)) AS h)"
    w_arr = ", ".join(repr(w) for w in _SES_W)
    arr = f"[{w_arr}]" if dialect == "duck" else f"array({w_arr})"
    idx = "t + 1" if dialect == "duck" else "t"
    return f"""
    WITH daily AS (
      SELECT {day} AS t,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2))) AS DOUBLE) AS x
      FROM events
      WHERE {day} BETWEEN 0 AND {N_DAYS - 1}
      GROUP BY {day}
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(t AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ROUND(t * x, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(t * t AS DECIMAL(38,0))) AS DOUBLE) AS sxx
      FROM daily
    ),
    trend AS (
      SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
             (sy * sxx - sx * sxy) / (n * sxx - sx * sx) AS icpt,
             n
      FROM mom
    ),
    theta2 AS (
      -- theta=2 line: 2x - trend; SES with alpha=1/2 = one weighted
      -- sum with exact power-of-two weights (q114's trick)
      SELECT SUM(CAST(ROUND(
               (2 * d.x - (tr.icpt + tr.slope * d.t)) * ({arr})[{idx}], 9)
               AS DECIMAL(38,9))) AS lvl2
      FROM daily d CROSS JOIN trend tr
    ),
    fc AS (
      SELECT g.h,
             tr.icpt + tr.slope * (tr.n - 1 + g.h) AS f_trend,
             CAST(t2.lvl2 AS DOUBLE) AS f_ses2
      FROM {grid} g CROSS JOIN trend tr CROSS JOIN theta2 t2
    )
    SELECT h AS horizon_days,
           ROUND(f_trend, 4) AS trend_line,
           ROUND((f_trend + f_ses2) / 2, 4) AS theta_forecast
    FROM fc
    """


@query("q505_theta_forecast", oracle=_theta_sql("duck"))
def q505_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (the M3-winning two-line variant): the
    daily series splits into its linear trend (theta=0) and the
    double-curvature theta=2 line smoothed by SES with alpha = 1/2 —
    exact power-of-two weights, the q114 EWMA trick — and the h-step
    forecast blends the two equally. Trend comes from closed-form
    OLS on exact DECIMAL moments; SES is ONE weighted sum with
    per-term 9-dp rounding (order-free). All post-aggregate work is
    on the 28-row calendar table."""
    _views(spark, sf_dir, "events")
    return spark.sql(_theta_sql("spark"))
