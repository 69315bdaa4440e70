"""Good-Turing batch 171 (q927-q931) — the frequency-of-frequencies
machinery behind every smoothed language model and coverage estimate
(Good 1953; Gale & Sampson's Simple Good-Turing), over the documents
token stream: how much probability mass belongs to words you have
NEVER seen, estimated from how many words you saw exactly once.

- q927 frequency of frequencies: N_r = how many trigram types occur
  exactly r times (the input table of the whole family);
- q928 Good-Turing discounts: r* = (r+1) N_{r+1} / N_r for small r —
  the adjusted counts an LM actually uses;
- q929 unseen mass & coverage: P0 = N_1/N (Good's estimator) and the
  Good coverage 1 - N_1/N;
- q930 Simple Good-Turing regression: the log-log OLS of N_r on r
  (nano-quantized logs, exact integer-moment fit) whose slope < -1 is
  the validity condition for the smoothed tail;
- q931 split coverage: vocabulary from the first half of documents vs
  tokens of the second half — the EMPIRICAL out-of-vocabulary rate
  beside q929's estimate (estimator vs holdout reality).

100 TB shape: one token-key aggregate (the only corpus shuffle) →
type-count table → a count-keyed aggregate bounded by MAX TOKEN
FREQUENCY, not corpus size; the SGT fit runs on that bounded table;
q931 is two half-corpus aggregates and one vocab anti-join.

Determinism: all counts exact integers; r* and P0 terminal ratios;
the log-log fit quantizes LN to exact nano-units (FLOOR quantizer)
before the integer-moment OLS — the hedonic.py discipline, with the
residual LN-ulp note in DETERMINISM.md applying here too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

GT_MAX_R = 10


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _shingles(d: str, src: str = "documents") -> str:
    """3-token shingle stream: the corpus vocabulary is a closed
    31-word set with no rare words (every unigram occurs hundreds of
    times), so the GT machinery runs on TRIGRAM types — the unit
    language models actually smooth, with a genuine hapax tail."""
    if d == "spark":
        # tokenize once into `_w` — split() inlined in the lambda is
        # re-evaluated per trigram (O(len²) characters per doc)
        return (
            f"SELECT doc_id, explode(transform("
            f"sequence(1, greatest(0, size(_w) - 2)), "
            f"i -> array_join(slice(_w, i, 3), ' '))) AS tok "
            f"FROM (SELECT doc_id, split(text, ' ') AS _w FROM {src})"
        )
    return (
        f"SELECT doc_id, arr[i:i+2] AS tok3, array_to_string(arr[i:i+2], ' ') AS tok "
        f"FROM (SELECT doc_id, string_split(text, ' ') AS arr FROM {src}) z, "
        f"LATERAL unnest(generate_series(1, greatest(0, len(arr) - 2))) AS g(i)"
    )


def _toks_cte(d: str) -> str:
    un = _shingles(d)
    return f"""toks0 AS ({un}),
    toks AS (SELECT doc_id, tok FROM toks0),
    types AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS r
      FROM toks WHERE tok != '' GROUP BY tok
    ),
    fof AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS nr
      FROM types GROUP BY r
    )"""


# ---------------------------------------------------------------------------
# q927 — frequency of frequencies


def _q927_sql(d: str) -> str:
    return f"""
    WITH {_toks_cte(d)}
    SELECT r, nr,
           CAST(r * nr AS BIGINT) AS tokens_at_r
    FROM fof
    WHERE r <= {GT_MAX_R}
    ORDER BY r
    """


@query("q927_freq_of_freqs", oracle=_q927_sql("duckdb"))
def q927_freq_of_freqs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N_r: how many token types occur exactly r times (head of the
    table, r <= {GT_MAX_R}). One token shuffle, then a count-keyed
    aggregate bounded by max frequency — the input every Good-Turing
    quantity reads."""
    _views(spark, sf_dir)
    return spark.sql(_q927_sql("spark"))


# ---------------------------------------------------------------------------
# q928 — GT discounts


def _q928_sql(d: str) -> str:
    return f"""
    WITH {_toks_cte(d)}
    SELECT a.r, a.nr,
           b.nr AS nr_plus_1,
           ROUND(CAST((a.r + 1) * b.nr AS DOUBLE) / a.nr, 6) AS r_star,
           ROUND(CAST((a.r + 1) * b.nr AS DOUBLE) / a.nr / a.r, 6)
             AS discount_ratio
    FROM fof a JOIN fof b ON b.r = a.r + 1
    WHERE a.r <= {GT_MAX_R}
    ORDER BY a.r
    """


@query("q928_gt_discounts", oracle=_q928_sql("duckdb"))
def q928_gt_discounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good-Turing adjusted counts r* = (r+1) N_(r+1) / N_r for the
    head frequencies — the discounted counts an LM substitutes for raw
    r (discount_ratio < 1 is mass flowing to the unseen). A self-join
    of the BOUNDED frequency table on r+1."""
    _views(spark, sf_dir)
    return spark.sql(_q928_sql("spark"))


# ---------------------------------------------------------------------------
# q929 — unseen mass


def _q929_sql(d: str) -> str:
    return f"""
    WITH {_toks_cte(d)}
    SELECT CAST(SUM(r * nr) AS BIGINT) AS n_tokens,
           CAST(SUM(nr) AS BIGINT) AS n_types,
           CAST(MAX(CASE WHEN r = 1 THEN nr ELSE 0 END) AS BIGINT)
             AS n_hapax,
           ROUND(CAST(MAX(CASE WHEN r = 1 THEN nr ELSE 0 END) AS DOUBLE)
                 / SUM(r * nr), 6) AS unseen_mass_p0,
           ROUND(1 - CAST(MAX(CASE WHEN r = 1 THEN nr ELSE 0 END) AS DOUBLE)
                 / SUM(r * nr), 6) AS good_coverage
    FROM fof
    """


@query("q929_unseen_mass", oracle=_q929_sql("duckdb"))
def q929_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good's estimator: the probability the NEXT token is a
    never-seen type equals the hapax share N_1/N — and its complement,
    the coverage. Plain aggregates of the bounded frequency table;
    q931 checks this estimate against a real holdout."""
    _views(spark, sf_dir)
    return spark.sql(_q929_sql("spark"))


# ---------------------------------------------------------------------------
# q930 — Simple Good-Turing log-log fit

NANO = "1000000000"


def _q930_sql(d: str) -> str:
    lnq = f"CAST(FLOOR(LN(CAST({{x}} AS DOUBLE)) * {NANO} + 0.5) AS BIGINT)"
    lr = lnq.format(x="r")
    lz = lnq.format(x="nr")
    return f"""
    WITH {_toks_cte(d)},
    pts AS (
      SELECT {lr} AS lx, {lz} AS ly FROM fof
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(lx) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(ly) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(lx AS DECIMAL(24,0)) * CAST(ly AS DECIMAL(24,0)))
               AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(lx AS DECIMAL(24,0)) * CAST(lx AS DECIMAL(24,0)))
               AS DECIMAL(38,0)) AS sxx
      FROM pts
    )
    SELECT n AS n_points,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS sgt_slope,
           CAST(CASE WHEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) < -1
                THEN 1 ELSE 0 END AS INT) AS slope_below_minus_1
    FROM mom
    """


@query("q930_sgt_loglog_fit", oracle=_q930_sql("duckdb"))
def q930_sgt_loglog_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple Good-Turing's smoothing line: OLS of ln N_r on ln r over
    the whole frequency table, with logs FLOOR-quantized to exact nano
    integers before DECIMAL-exact moment sums (the hedonic discipline;
    LN's residual ulp risk is documented in DETERMINISM.md). Slope
    below -1 is Gale & Sampson's condition for the smoothed tail to
    define proper probabilities."""
    _views(spark, sf_dir)
    return spark.sql(_q930_sql("spark"))


# ---------------------------------------------------------------------------
# q931 — split coverage (estimator vs holdout)


def _q931_sql(d: str) -> str:
    un = _shingles(d)
    return f"""
    WITH alltoks AS ({un}),
    toks AS (SELECT doc_id, tok FROM alltoks WHERE tok != ''),
    mid AS (SELECT CAST(MAX(doc_id) + MIN(doc_id) AS BIGINT) / 2.0 AS m
            FROM toks),
    train_vocab AS (
      SELECT /*+ BROADCAST(m) */ DISTINCT tok
      FROM toks CROSS JOIN mid m WHERE doc_id <= m.m
    ),
    test_toks AS (
      SELECT /*+ BROADCAST(m) */ tok
      FROM toks CROSS JOIN mid m WHERE doc_id > m.m
    ),
    train_hapax AS (
      SELECT /*+ BROADCAST(m) */
             CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(c) AS BIGINT) AS n
      FROM (
        SELECT tok, COUNT(*) AS c
        FROM toks CROSS JOIN mid m WHERE doc_id <= m.m GROUP BY tok
      ) z CROSS JOIN mid m
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS test_tokens,
           CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS oov_tokens,
           ROUND(CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS empirical_oov_rate,
           ROUND(CAST(MAX(h.n1) AS DOUBLE) / MAX(h.n), 6)
             AS good_turing_estimate
    FROM test_toks t
    LEFT JOIN train_vocab v ON v.tok = t.tok
    CROSS JOIN train_hapax h
    """


@query("q931_split_coverage", oracle=_q931_sql("duckdb"))
def q931_split_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The estimator meets reality: train a vocabulary on the first
    half of documents, measure the actual out-of-vocabulary token rate
    on the second half, print it beside the Good-Turing N_1/N estimate
    computed from the TRAIN half alone. One vocab anti-join (hash,
    never pairwise) plus bounded aggregates."""
    _views(spark, sf_dir)
    return spark.sql(_q931_sql("spark"))
