"""Robust-estimator batch 115 (q641-q645) — the breakdown-resistant
location/scale toolkit beside robust.py's Huber fits, all on the
daily revenue series in exact integer cents and all rank-exact (every
order statistic is selected by integer rank from triangle joins on
bounded tables — no engine median(), no interpolation semantics):

- q641 Hodges-Lehmann location: the median Walsh average
  (x_i + x_j)/2 over i <= j, lo/hi middle elements emitted as exact
  2x-scaled integers;
- q642 trimmed & winsorized means: 10%-per-tail trimming with exact
  rank cutoffs; winsorization clamps to the exact boundary order
  statistics;
- q643 Qn scale: the k-th order statistic (k = C(h,2), h = n div 2
  + 1) of all pairwise |x_i - x_j| — Rousseeuw-Croux Qn's core,
  unnormalized (the consistency constant is a known scalar);
- q644 Sn scale: lomed_i himed_j |x_i - x_j| — the nested-median
  scale, inner medians per i (rank partitioned by i), outer low
  median by triangle rank;
- q645 biweight midvariance: MAD-gated Tukey weights as exact
  rationals (u^2 = ((x-med)*1)^2 / (9*MAD)^2 compared
  cross-multiplied), terminal double assembly.

100 TB shape: ONE aggregate collapses the corpus to <= calendar-days
rows; all pairwise work is days^2/2 on that bounded table. The
pattern to copy at scale: collapse first, then rank-exact algebra on
the collapsed table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TRIM_PCT = 10


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _daily_cte(dialect: str) -> str:
    return f"""daily0 AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    mind AS (SELECT MIN(d) AS d0, CAST(COUNT(*) AS BIGINT) AS n FROM daily0),
    daily AS (
      SELECT CAST({_days(dialect, 'm.d0', 'x.d')} AS BIGINT) AS i,
             x.cents, m.n
      FROM daily0 x CROSS JOIN mind m
    ),
    ranked AS (
      -- exact rank by (cents, i) via the bounded triangle join
      SELECT a.i, a.cents, a.n, CAST(COUNT(*) AS BIGINT) AS r
      FROM daily a JOIN daily b
        ON b.cents < a.cents OR (b.cents = a.cents AND b.i <= a.i)
      GROUP BY a.i, a.cents, a.n
    )"""


# --- Spark-side staging (oracle strings keep the single-statement CTE
# form) -----------------------------------------------------------------------
#
# Every robust estimator references `daily`/`ranked` 2-6x (triangle
# joins, medians, MAD gates), and each reference re-ran the events
# corpus aggregate under Catalyst inlining (q645: 146 Exchanges). ONE
# corpus pass checkpoints the calendar-bounded ranked table; `daily`
# is its projection (ranked has exactly one row per day).

_RANKED_VIEW = "robust2_ranked_mv"

_DAILY_MV_CTE = f"""ranked AS (
      SELECT i, cents, n, r FROM {_RANKED_VIEW}
    ),
    daily AS (
      SELECT i, cents, n FROM {_RANKED_VIEW}
    )"""


def _ranked_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE events aggregate -> checkpointed (i, cents, n, r).

    The view is registered with a BROADCAST hint: a localCheckpoint's
    LogicalRDD reports the default (huge) size estimate, so without
    the hint q645's non-equi dev x dev self-join degraded from a
    broadcast nested loop to CartesianProduct (planlint catch). The
    table is calendar-bounded (~2.4k rows) at any corpus size."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_daily_cte('spark')} SELECT i, cents, n, r FROM ranked"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_RANKED_VIEW)


# ---------------------------------------------------------------------------
# q641 — Hodges-Lehmann


def _hl_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_DAILY_MV_CTE if staged else _daily_cte(dialect)},
    walsh AS (
      SELECT /*+ BROADCAST(b) */ a.cents + b.cents AS s2, a.i AS i, b.i AS j
      FROM daily a JOIN daily b ON b.i >= a.i
    ),
    wr AS (
      SELECT /*+ BROADCAST(y) */ x.s2, CAST(COUNT(*) AS BIGINT) AS r,
             CAST((SELECT COUNT(*) FROM walsh) AS BIGINT) AS nw
      FROM walsh x JOIN walsh y
        ON y.s2 < x.s2 OR (y.s2 = x.s2 AND (y.i < x.i
           OR (y.i = x.i AND y.j <= x.j)))
      GROUP BY x.s2, x.i, x.j
    )
    SELECT MAX(nw) AS n_walsh,
           CAST(MAX(CASE WHEN r = {_idiv(dialect, 'nw + 1', '2')}
                    THEN s2 END) AS BIGINT) AS hl_x2_lo,
           CAST(MAX(CASE WHEN r = {_idiv(dialect, 'nw + 2', '2')}
                    THEN s2 END) AS BIGINT) AS hl_x2_hi,
           ROUND(CAST(MAX(CASE WHEN r = {_idiv(dialect, 'nw + 1', '2')}
                          THEN s2 END)
                      + MAX(CASE WHEN r = {_idiv(dialect, 'nw + 2', '2')}
                            THEN s2 END) AS DOUBLE) / 400.0, 2)
             AS hl_dollars
    FROM wr
    """


@query("q641_hodges_lehmann", oracle=_hl_sql("duck"))
def q641_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Hodges-Lehmann location estimate: the median Walsh average
    (x_i+x_j)/2 over i<=j, selected by exact integer rank over the
    ~n^2/2 Walsh table (ranks from a pair-table triangle join with a
    full (s2, i, j) tie-break). Emitted as exact 2x-scaled cents plus
    a terminal dollars division."""
    _ranked_view(spark, sf_dir)
    return spark.sql(_hl_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q642 — trimmed & winsorized means


def _trim_sql(dialect: str, staged: bool = False) -> str:
    k = _idiv(dialect, f"n * {TRIM_PCT}", "100")
    return f"""
    WITH {_DAILY_MV_CTE if staged else _daily_cte(dialect)},
    bounds AS (
      SELECT MAX(n) AS n, MAX({k}) AS k,
             MAX(CASE WHEN r = {k} + 1 THEN cents END) AS lo_val,
             MAX(CASE WHEN r = n - {k} THEN cents END) AS hi_val
      FROM ranked
    )
    SELECT b.n AS n_days, b.k AS trimmed_per_tail,
           ROUND(CAST(SUM(CASE WHEN r.r > b.k AND r.r <= b.n - b.k
                               THEN r.cents END) AS DOUBLE)
                 / (100.0 * (b.n - 2 * b.k)), 2) AS trimmed_mean_dollars,
           ROUND(CAST(SUM(CASE WHEN r.r <= b.k THEN b.lo_val
                               WHEN r.r > b.n - b.k THEN b.hi_val
                               ELSE r.cents END) AS DOUBLE)
                 / (100.0 * b.n), 2) AS winsorized_mean_dollars,
           ROUND(CAST(SUM(r.cents) AS DOUBLE) / (100.0 * b.n), 2)
             AS plain_mean_dollars
    FROM ranked r CROSS JOIN bounds b
    GROUP BY b.n, b.k
    """


@query("q642_trimmed_winsorized", oracle=_trim_sql("duck"))
def q642_trimmed_winsorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-per-tail trimmed and winsorized means with exact rank
    cutoffs (k = n*10 div 100; ranks from the bounded triangle join)
    next to the plain mean — the outlier-robustness ladder. Sums are
    exact integer cents; each mean divides once."""
    _ranked_view(spark, sf_dir)
    return spark.sql(_trim_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q643 — Qn scale


def _qn_sql(dialect: str, staged: bool = False) -> str:
    h = _idiv(dialect, "n", "2")
    return f"""
    WITH {_DAILY_MV_CTE if staged else _daily_cte(dialect)},
    pdiffs AS (
      SELECT /*+ BROADCAST(b) */ ABS(a.cents - b.cents) AS ad, a.i AS i, b.i AS j, a.n
      FROM daily a JOIN daily b ON b.i > a.i
    ),
    pr AS (
      SELECT /*+ BROADCAST(y) */ x.ad, x.n, CAST(COUNT(*) AS BIGINT) AS r
      FROM pdiffs x JOIN pdiffs y
        ON y.ad < x.ad OR (y.ad = x.ad AND (y.i < x.i
           OR (y.i = x.i AND y.j <= x.j)))
      GROUP BY x.ad, x.i, x.j, x.n
    )
    SELECT MAX(n) AS n_days,
           CAST(MAX(({h} + 1) * (({h} + 1) - 1) / 2) AS BIGINT) AS k_index,
           CAST(MAX(CASE WHEN r = ({h} + 1) * (({h} + 1) - 1) / 2
                    THEN ad END) AS BIGINT) AS qn_cents_unnormalized,
           ROUND(CAST(MAX(CASE WHEN r = ({h} + 1) * (({h} + 1) - 1) / 2
                          THEN ad END) AS DOUBLE) / 100.0, 2)
             AS qn_dollars
    FROM pr
    """


@query("q643_qn_scale", oracle=_qn_sql("duck"))
def q643_qn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rousseeuw-Croux Qn (unnormalized): the k-th order statistic
    (k = C(h,2), h = n div 2 + 1 — always integral) of all pairwise
    |x_i - x_j|, selected by exact rank over the bounded pair table.
    A 50% breakdown scale that needs no location estimate."""
    _ranked_view(spark, sf_dir)
    return spark.sql(_qn_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q644 — Sn scale


def _sn_sql(dialect: str, staged: bool = False) -> str:
    # inner: himed over n-1 values -> rank = (n-1) div 2 + 1
    him = _idiv(dialect, "a.n - 1", "2")
    lom = _idiv(dialect, "n + 1", "2")
    return f"""
    WITH {_DAILY_MV_CTE if staged else _daily_cte(dialect)},
    absd AS (
      SELECT /*+ BROADCAST(b) */ a.i, ABS(a.cents - b.cents) AS ad, b.i AS j, a.n
      FROM daily a JOIN daily b ON b.i <> a.i
    ),
    inner_ranked AS (
      SELECT x.i, x.ad, x.n, CAST(COUNT(*) AS BIGINT) AS r
      FROM absd x JOIN absd y
        ON y.i = x.i AND (y.ad < x.ad OR (y.ad = x.ad AND y.j <= x.j))
      GROUP BY x.i, x.ad, x.j, x.n
    ),
    inner_med AS (
      SELECT a.i, a.n,
             MAX(CASE WHEN a.r = {him} + 1 THEN a.ad END) AS himed
      FROM inner_ranked a GROUP BY a.i, a.n
    ),
    outer_ranked AS (
      SELECT /*+ BROADCAST(y) */ x.himed, x.n, CAST(COUNT(*) AS BIGINT) AS r
      FROM inner_med x JOIN inner_med y
        ON y.himed < x.himed OR (y.himed = x.himed AND y.i <= x.i)
      GROUP BY x.himed, x.i, x.n
    )
    SELECT MAX(n) AS n_days,
           CAST(MAX(CASE WHEN r = {lom} THEN himed END) AS BIGINT)
             AS sn_cents_unnormalized,
           ROUND(CAST(MAX(CASE WHEN r = {lom} THEN himed END) AS DOUBLE)
                 / 100.0, 2) AS sn_dollars
    FROM outer_ranked
    """


@query("q644_sn_scale", oracle=_sn_sql("duck"))
def q644_sn_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rousseeuw-Croux Sn (unnormalized): for each day the high median
    of its |x_i - x_j| to all other days (rank partitioned by i via
    the per-i triangle join), then the low median across days — the
    nested-median robust scale, rank-exact end to end."""
    _ranked_view(spark, sf_dir)
    return spark.sql(_sn_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q645 — biweight midvariance


def _biweight_sql(dialect: str, staged: bool = False) -> str:
    med_lo = _idiv(dialect, "n + 1", "2")
    # staged-only hint: the checkpointed view's LogicalRDD reports the
    # default (huge) size estimate, so the non-equi dev x dev rank join
    # planned CartesianProduct without it (planlint catch); the table
    # is calendar-bounded (~2.4k rows) at any corpus size. The oracle
    # path (dialect="duck", never staged) is byte-unchanged.
    adr_hint = "/*+ BROADCAST(y) */ " if staged else ""
    return f"""
    WITH {_DAILY_MV_CTE if staged else _daily_cte(dialect)},
    med AS (
      SELECT MAX(CASE WHEN r = {med_lo} THEN cents END) AS m FROM ranked
    ),
    dev AS (
      SELECT /*+ BROADCAST(md) */ d.i, d.cents, d.n,
             d.cents - md.m AS e,
             ABS(d.cents - md.m) AS ae
      FROM daily d CROSS JOIN med md
    ),
    adr AS (
      SELECT {adr_hint}x.ae, CAST(COUNT(*) AS BIGINT) AS r
      FROM dev x JOIN dev y
        ON y.ae < x.ae OR (y.ae = x.ae AND y.i <= x.i)
      GROUP BY x.ae, x.i
    ),
    madv AS (
      SELECT /*+ BROADCAST(d2) */
             MAX(CASE WHEN r = {med_lo} THEN ae END) AS mad
      FROM adr CROSS JOIN (SELECT MAX(n) AS n FROM daily) d2
    ),
    weighted AS (
      -- u^2 = e^2 / (9*MAD)^2; include iff u^2 < 1, i.e. |e| < 9*MAD
      -- (exact integer gate)
      SELECT /*+ BROADCAST(m2) */ v.e, v.n,
             CASE WHEN v.ae < 9 * m2.mad THEN 1 ELSE 0 END AS inc,
             CAST(v.e AS DOUBLE) / (9.0 * m2.mad) AS u
      FROM dev v CROSS JOIN madv m2
    )
    SELECT MAX(n) AS n_days,
           CAST(SUM(inc) AS BIGINT) AS n_included,
           -- contract sums: numerator terms at 2 dp, denominator terms
           -- at 9 dp, DECIMAL-accumulated (partial-agg order safety)
           ROUND(MAX(n)
                 * CAST(SUM(CASE WHEN inc = 1
                       THEN CAST(ROUND(e * 1.0 * e * POWER(1 - u * u, 4), 2)
                                 AS DECIMAL(38,2)) END) AS DOUBLE)
                 / POWER(CAST(SUM(CASE WHEN inc = 1
                             THEN CAST(ROUND((1 - u * u) * (1 - 5 * u * u), 9)
                                       AS DECIMAL(38,9)) END) AS DOUBLE), 2)
                 / 10000.0, 4) AS biweight_midvariance_dollars2
    FROM weighted
    """


@query("q645_biweight_midvariance", oracle=_biweight_sql("duck"))
def q645_biweight_midvariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey's biweight midvariance: MAD-gated weights (the u^2 < 1
    gate is the exact integer compare |e| < 9*MAD; median and MAD are
    rank-exact order statistics), then the classical ratio assembled
    in doubles from identical exact inputs, reported in dollars^2.
    The robust variance that ignores the tails smoothly."""
    _ranked_view(spark, sf_dir)
    return spark.sql(_biweight_sql("spark", staged=True))
