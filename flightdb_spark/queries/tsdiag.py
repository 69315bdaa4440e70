"""Time-series diagnostics & fidelity batch 67 (q402-q406):

- q402 partial autocorrelation (PACF) at lags 1-3 via the
  Durbin-Levinson recursion in closed form on the q158 ACF estimates —
  the AR-order selection diagnostic (ACF says "correlated"; PACF says
  "how many AR terms");
- q403 STL-lite decomposition of daily volume: centered 7-day
  moving-average trend, day-of-week seasonal effects from the
  detrended series, per-dow remainder RMS — the
  trend/seasonal/remainder split behind every seasonal forecast
  (q313/q364 consume exactly this structure);
- q404 readability scoring (Flesch adapted to the synthetic corpus:
  vowel-group syllables, fixed 15-word pseudo-sentences) per source —
  the fluency gate beside q35's stopword quality;
- q405 int8 scalar-quantization audit: per-dimension min/max scales,
  quantize-reconstruct error (MSE, max abs) for the worst dimensions —
  the fidelity table a vector store reads before switching its index
  to SQ8 (codebook PQ fidelity is q226's);
- q406 stationary distribution of the event-type Markov chain: 4
  unrolled power-iteration steps on the row-normalized 5x5 transition
  matrix — the long-run behavioral mix (q161 scores one-step
  prediction; this is the fixed point).

Determinism: PACF/stationary iterate on values rounded to 12 dp with
DECIMAL accumulation (bounded 5-way sums, order-free); STL components
round detrended values to 9 dp before seasonal means; readability and
quantization are integer/exact-scale arithmetic with single terminal
divisions; FLOOR(x + 0.5) replaces ROUND for quantization codes (both
engines floor identically; round-half behavior differs).

100 TB shapes: every query aggregates to a bounded table first (days,
dows, dims, event types) — windows and iterations only ever touch
those; the corpus-scale passes are single map-side aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

PACF_MAX_LAG = 3
STL_WINDOW = 3  # +/- days -> centered 7-day MA
QUANT_WORST_DIMS = 8
MARKOV_ITERS = 4


def _events_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _docs_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "documents")
    ).createOrReplaceTempView("documents")


def _emb_view(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(
        load_table(spark, sf_dir, "embeddings")
    ).createOrReplaceTempView("embeddings")


# ---------------------------------------------------------------------------
# q402 — PACF via Durbin-Levinson


def _pacf_sql(dialect: str) -> str:
    # r_k from the q158 estimator (lag join on the bounded day table,
    # exact integer moments); Durbin-Levinson closed forms:
    #   phi11 = r1
    #   phi22 = (r2 - r1^2) / (1 - r1^2);  phi21 = r1 * (1 - phi22)
    #   phi33 = (r3 - phi21*r2 - phi22*r1) / (1 - phi21*r1 - phi22*r2)
    if dialect == "spark":
        day = "CAST(date_trunc('day', ts) AS DATE)"
        shift = "date_add(a.day, l.lag)"
        lags = "(SELECT explode(sequence(1, 3)) AS lag)"
    else:
        day = "CAST(date_trunc('day', ts) AS DATE)"
        shift = "a.day + CAST(l.lag AS INTEGER)"
        lags = "(SELECT unnest(range(1, 4)) AS lag)"
    return f"""
    WITH daily AS (
      SELECT {day} AS day, COUNT(*) AS c FROM events GROUP BY 1
    ),
    gstats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS d,
             CAST(SUM(c) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(c AS DECIMAL(38,0)) * c) AS DECIMAL(38,0)) AS sq
      FROM daily
    ),
    lagged AS (
      SELECT l.lag, a.c AS ca, b.c AS cb
      FROM {lags} l
      JOIN daily a ON 1 = 1
      JOIN daily b ON b.day = {shift}
    ),
    acfs AS (
      -- exact DECIMAL moments, ONE cast to DOUBLE per side of the
      -- division (decimal division scales differ between engines)
      SELECT lag,
             CAST(COUNT(*) * SUM(CAST(ca AS DECIMAL(38,0)) * cb)
                  - SUM(CAST(ca AS DECIMAL(38,0)))
                    * SUM(CAST(cb AS DECIMAL(38,0))) AS DOUBLE)
             / (COUNT(*)
                * (CAST(t.sq AS DOUBLE)
                   - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.d)) AS r
      FROM lagged, gstats t
      GROUP BY lag, t.sq, t.s, t.d
    ),
    rvec AS (
      SELECT MAX(CASE WHEN lag = 1 THEN r END) AS r1,
             MAX(CASE WHEN lag = 2 THEN r END) AS r2,
             MAX(CASE WHEN lag = 3 THEN r END) AS r3
      FROM acfs
    ),
    dl AS (
      SELECT r1, r2, r3,
             r1 AS phi11,
             (r2 - r1 * r1) / (1 - r1 * r1) AS phi22
      FROM rvec
    ),
    dl2 AS (
      SELECT r1, r2, r3, phi11, phi22,
             r1 * (1 - phi22) AS phi21
      FROM dl
    )
    SELECT lag,
           ROUND(CASE lag WHEN 1 THEN r1 WHEN 2 THEN r2 ELSE r3 END, 6)
             AS acf,
           ROUND(CASE lag
                 WHEN 1 THEN phi11
                 WHEN 2 THEN phi22
                 ELSE (r3 - phi21 * r2 - phi22 * r1)
                      / (1 - phi21 * r1 - phi22 * r2) END, 6) AS pacf
    FROM dl2 CROSS JOIN {lags} l
    ORDER BY lag
    """


@query("q402_pacf", oracle=_pacf_sql("duck"))
def q402_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation of daily event volume at lags 1-3:
    Durbin-Levinson unrolled in closed form over the q158 ACF
    estimates — PACF is the AR-order selector (an AR(p) process has
    PACF ~ 0 beyond lag p, while its ACF tails forever). The lag pairs
    come from date-shift equi-joins on the BOUNDED daily table; the
    recursion is 1-row algebra. Both engines evaluate the identical
    expression tree on identical exact-moment inputs."""
    _events_view(spark, sf_dir)
    return spark.sql(_pacf_sql("spark"))


# ---------------------------------------------------------------------------
# q403 — STL-lite decomposition


def _stl_sql(dialect: str) -> str:
    if dialect == "spark":
        day = "CAST(date_trunc('day', ts) AS DATE)"
        dow = "((datediff(day, DATE '1970-01-01') % 7) + 7) % 7"
    else:
        day = "CAST(date_trunc('day', ts) AS DATE)"
        dow = "(((day - DATE '1970-01-01') % 7) + 7) % 7"
    return f"""
    WITH daily AS (
      SELECT {day} AS day, COUNT(*) AS c FROM events GROUP BY 1
    ),
    trended AS (
      SELECT day, c,
             CAST(SUM(c) OVER w AS DOUBLE) / COUNT(*) OVER w AS trend
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {STL_WINDOW} PRECEDING
                   AND {STL_WINDOW} FOLLOWING)
    ),
    detr AS (
      SELECT day, {dow} AS dow,
             ROUND(c - trend, 9) AS dt
      FROM trended
    ),
    seasonal AS (
      SELECT dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             ROUND(CAST(SUM(CAST(dt AS DECIMAL(38,9))) AS DOUBLE)
                   / COUNT(*), 6) AS seasonal_effect
      FROM detr GROUP BY dow
    ),
    remainder_ AS (
      SELECT d.dow,
             ROUND(d.dt - s.seasonal_effect, 9) AS rem
      FROM detr d JOIN seasonal s ON s.dow = d.dow
    )
    SELECT s.dow, s.n_days, s.seasonal_effect,
           ROUND(SQRT(CAST(SUM(CAST(ROUND(r.rem * r.rem, 9)
                                    AS DECIMAL(38,9))) AS DOUBLE)
                      / s.n_days), 6) AS remainder_rms
    FROM seasonal s JOIN remainder_ r ON r.dow = s.dow
    GROUP BY s.dow, s.n_days, s.seasonal_effect
    ORDER BY s.dow
    """


@query("q403_stl_decomposition", oracle=_stl_sql("duck"))
def q403_stl_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition of daily volume: centered 7-day
    moving-average trend (a ROWS frame on the bounded daily table —
    edge days use their partial frame identically on both engines),
    day-of-week seasonal effects as DECIMAL means of the 9-dp-rounded
    detrended series, and the per-dow remainder RMS — how much signal
    the trend+seasonal model leaves unexplained, the readiness check
    before a seasonal forecast (q313/q364). Day-of-week is epoch-day
    mod 7 (engine-neutral; DATE functions disagree on Sunday's
    number). All corpus work is one daily aggregate."""
    _events_view(spark, sf_dir)
    return spark.sql(_stl_sql("spark"))


# ---------------------------------------------------------------------------
# q404 — readability per source


def _readability_sql(dialect: str) -> str:
    if dialect == "spark":
        words = "(SELECT doc_id, source, explode(split(text, ' ')) AS w FROM documents)"
        syl = "GREATEST(size(regexp_extract_all(w, '[aeiou]+', 0)), 1)"
        idiv = "div"
    else:
        words = (
            "(SELECT doc_id, source, unnest(string_split(text, ' ')) AS w"
            " FROM documents)"
        )
        syl = "GREATEST(len(regexp_extract_all(w, '[aeiou]+')), 1)"
        idiv = "//"
    return f"""
    WITH words AS {words},
    per_doc AS (
      SELECT doc_id, source,
             CAST(COUNT(*) AS BIGINT) AS n_words,
             CAST(SUM({syl}) AS BIGINT) AS n_syll
      FROM words GROUP BY doc_id, source
    ),
    scored AS (
      SELECT source,
             ROUND(206.835
                   - 1.015 * (CAST(n_words AS DOUBLE)
                              / ((n_words + 14) {idiv} 15))
                   - 84.6 * (CAST(n_syll AS DOUBLE) / n_words), 9)
               AS flesch
      FROM per_doc
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(flesch AS DECIMAL(38,9))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_flesch,
           CAST(SUM(CASE WHEN flesch < 30 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hard_docs
    FROM scored GROUP BY source ORDER BY source
    """


@query("q404_readability", oracle=_readability_sql("duck"))
def q404_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch readability per source (adapted to the synthetic corpus:
    vowel-group syllable counting, fixed 15-word pseudo-sentences since
    the text has no punctuation) — the fluency/complexity gate a
    curation pipeline runs beside stopword quality (q35) and gibberish
    entropy (q112). Per-doc scores are exact rational arithmetic
    rounded once at 9 dp; source means accumulate in DECIMAL. Scale:
    one token explode into a doc-keyed aggregate, then a 20-key
    rollup."""
    _docs_view(spark, sf_dir)
    return spark.sql(_readability_sql("spark"))


# ---------------------------------------------------------------------------
# q405 — int8 scalar-quantization audit


def _quant_sql(dialect: str) -> str:
    if dialect == "spark":
        dims = (
            "(SELECT vec_id, posexplode(CAST(embedding AS ARRAY<DOUBLE>))"
            " AS (pos, val) FROM embeddings)"
        )
        dimcol = "pos + 1"
    else:
        dims = (
            "(SELECT vec_id, unnest(embedding::DOUBLE[]) AS val,"
            " generate_subscripts(embedding, 1) AS pos1 FROM embeddings)"
        )
        dimcol = "pos1"
    return f"""
    WITH dims AS (
      SELECT vec_id, {dimcol} AS dim, val FROM {dims} t
    ),
    scales AS (
      SELECT dim, MIN(val) AS lo, MAX(val) AS hi,
             (MAX(val) - MIN(val)) / 255.0 AS scale
      FROM dims GROUP BY dim
    ),
    coded AS (
      SELECT d.dim, d.val, s.lo, s.scale,
             CASE WHEN s.scale = 0 THEN 0
                  ELSE LEAST(FLOOR((d.val - s.lo) / s.scale + 0.5), 255)
             END AS code
      FROM dims d JOIN scales s ON s.dim = d.dim
    ),
    err AS (
      SELECT dim,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(ROUND((val - (lo + code * scale))
                            * (val - (lo + code * scale)), 12)
                      AS DECIMAL(38,12))) AS sse,
             MAX(ABS(val - (lo + code * scale))) AS max_abs_err
      FROM coded GROUP BY dim
    )
    SELECT CAST(dim AS INT) AS dim,
           ROUND(CAST(sse AS DOUBLE) / n, 9) AS mse,
           ROUND(max_abs_err, 9) AS max_abs_err
    FROM err
    ORDER BY mse DESC, dim LIMIT {QUANT_WORST_DIMS}
    """


@query("q405_int8_quantization", oracle=_quant_sql("duck"))
def q405_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization fidelity: per-dimension min/max scales
    (what a vector store's SQ8 index computes at build time), quantize
    with FLOOR(x + 0.5) (round-half behavior differs between engines;
    floor doesn't), reconstruct, and report the {QUANT_WORST_DIMS}
    worst dimensions by reconstruction MSE — the audit that decides
    whether SQ8 is safe or the index needs PQ (q226) / full floats.
    Squared errors round to 12 dp into DECIMAL. Scale: one dim explode
    into a 64-key scale aggregate, broadcast back, one more 64-key
    error aggregate."""
    _emb_view(spark, sf_dir)
    return spark.sql(_quant_sql("spark"))


# ---------------------------------------------------------------------------
# q406 — stationary distribution of the event-type chain


def _stationary_sql(dialect: str) -> str:
    iters = []
    prev = "p0"
    for i in range(1, MARKOV_ITERS + 1):
        iters.append(
            f"""p{i} AS (
      SELECT m.dst AS typ,
             CAST(SUM(CAST(ROUND(v.pr * m.p, 12) AS DECIMAL(38,12)))
                  AS DOUBLE) AS pr
      FROM {prev} v JOIN pmat m ON m.src = v.typ
      GROUP BY m.dst
    )"""
        )
        prev = f"p{i}"
    return f"""
    WITH seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    trans AS (
      SELECT src, dst, COUNT(*) AS c FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    rowsum AS (SELECT src, SUM(c) AS tot FROM trans GROUP BY src),
    pmat AS (
      SELECT t.src, t.dst, ROUND(CAST(t.c AS DOUBLE) / r.tot, 12) AS p
      FROM trans t JOIN rowsum r ON r.src = t.src
    ),
    p0 AS (SELECT DISTINCT src AS typ, 0.2 AS pr FROM trans),
    {', '.join(iters)},
    selfp AS (
      SELECT src AS typ, ROUND(p, 6) AS self_loop_prob
      FROM pmat WHERE src = dst
    )
    SELECT p.typ AS event_type,
           ROUND(p.pr, 6) AS stationary_prob,
           s.self_loop_prob
    FROM {prev} p JOIN selfp s ON s.typ = p.typ
    ORDER BY event_type
    """


def _stationary_spark_sql() -> str:
    """Spark side of q406 with the transition matrix staged: under CTE
    inlining every `pmat` reference (one per power-iteration step +
    selfp) re-expanded trans -> seq — the corpus LEAD window ran 11x
    (11 events scans, 106 Exchanges). The 25-cell matrix is
    checkpointed once; the unrolled iterates re-expand only bounded
    arithmetic over the view (the q435 staging shape)."""
    iters = []
    prev = "p0"
    for i in range(1, MARKOV_ITERS + 1):
        iters.append(
            f"""p{i} AS (
      SELECT m.dst AS typ,
             CAST(SUM(CAST(ROUND(v.pr * m.p, 12) AS DECIMAL(38,12)))
                  AS DOUBLE) AS pr
      FROM {prev} v JOIN pmat m ON m.src = v.typ
      GROUP BY m.dst
    )"""
        )
        prev = f"p{i}"
    return f"""
    WITH pmat AS (SELECT src, dst, p FROM tsdiag_pmat_mv),
    p0 AS (SELECT DISTINCT src AS typ, 0.2 AS pr FROM pmat),
    {', '.join(iters)},
    selfp AS (
      SELECT src AS typ, ROUND(p, 6) AS self_loop_prob
      FROM pmat WHERE src = dst
    )
    SELECT p.typ AS event_type,
           ROUND(p.pr, 6) AS stationary_prob,
           s.self_loop_prob
    FROM {prev} p JOIN selfp s ON s.typ = p.typ
    ORDER BY event_type
    """


def _pmat_view(spark: SparkSession) -> None:
    spark.sql(
        """
    WITH seq AS (
      SELECT event_type AS src,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    trans AS (
      SELECT src, dst, COUNT(*) AS c FROM seq
      WHERE dst IS NOT NULL GROUP BY src, dst
    ),
    rowsum AS (SELECT src, SUM(c) AS tot FROM trans GROUP BY src),
    pmat AS (
      SELECT t.src, t.dst, ROUND(CAST(t.c AS DOUBLE) / r.tot, 12) AS p
      FROM trans t JOIN rowsum r ON r.src = t.src
    )
    SELECT src, dst, p FROM pmat
    """
    ).localCheckpoint(eager=True).createOrReplaceTempView("tsdiag_pmat_mv")


@query("q406_stationary_distribution", oracle=_stationary_sql("duck"))
def q406_stationary_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-run event-type mix: {MARKOV_ITERS} unrolled power-iteration
    steps of pi' = pi P on the row-normalized transition matrix
    (q100/q161's construction) from the uniform start — the stationary
    behavioral distribution a capacity model multiplies rates by
    (q161 scores one-step prediction; this is the chain's fixed
    point). Every iterate rounds products to 12 dp and accumulates in
    DECIMAL over the 5-row type domain — order-free and bounded. The
    one corpus pass is the user-partitioned LEAD window, checkpointed
    to the 25-cell matrix; every iterate runs on the view (the oracle
    keeps the one-statement form, which re-expanded the window 11x)."""
    _events_view(spark, sf_dir)
    _pmat_view(spark)
    return spark.sql(_stationary_spark_sql())
