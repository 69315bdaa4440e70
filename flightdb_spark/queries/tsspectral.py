"""Spectral & structural time-series batch 82 (q476-q480) — the
frequency-domain and structure diagnostics beside q402/q403 (PACF,
STL) and q138 (CUSUM), over the daily event-value series (the events
feed spans Jan 2024; the analysis window is the fixed first 28 days,
so every trigonometric constant is a Python-precomputed literal —
rule 11, no runtime cos/sin anywhere):

- q476 periodogram: DFT power at 28/14/7/4/2-day periods — which
  cycle dominates the feed (the input to q403's period choice);
- q477 binary segmentation: the best CUSUM-statistic changepoint,
  then the best split within each resulting half — one recursion
  level of the classic multiple-changepoint search (Scott & Knott
  1974) on top of q138's single-pass CUSUM;
- q478 Hurst exponent by rescaled-range analysis over 7/14/28-day
  blocks — long-range dependence (H > 0.5 = persistent trend,
  < 0.5 = mean-reverting) via a 3-point log-log OLS;
- q479 spectral entropy: normalized periodogram entropy — 0 for a
  pure tone, ln(K) for white noise — the one-number "is there
  structure" gauge;
- q480 turning-point test: count of strict local extrema vs the
  2(n-2)/3 expectation under exchangeability (Kendall) — the
  cheapest randomness audit a daily KPI can get.

Determinism: the daily series accumulates 2-dp DECIMAL; every trig /
expectation constant is inlined from Python; DFT and R/S terms round
at 6-9 dp into DECIMAL sums; the few ln() calls ride the rule-5
contract (terms rounded finer than outputs); all windows run over the
28-row daily aggregate (calendar-bounded, rule 15).

100 TB shapes: ONE shuffle each — the daily aggregate; everything
after is arithmetic on <= 28 rows joined to literal grids. At any
corpus size the series table stays calendar-sized.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_DAYS = 28
FREQS = (1, 2, 4, 7, 14)  # cycles per 28 days -> periods 28,14,7,4,2
HURST_BLOCKS = (7, 14, 28)
ANCHOR = "2024-01-01"

_COS = {
    k: [math.cos(2.0 * math.pi * k * t / N_DAYS) for t in range(N_DAYS)]
    for k in FREQS
}
_SIN = {
    k: [math.sin(2.0 * math.pi * k * t / N_DAYS) for t in range(N_DAYS)]
    for k in FREQS
}
LN_K = repr(math.log(float(len(FREQS))))


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _day(dialect: str) -> str:
    if dialect == "spark":
        return f"datediff(CAST(ts AS DATE), DATE '{ANCHOR}')"
    return f"(CAST(ts AS DATE) - DATE '{ANCHOR}')"


_DAILY_VIEW = "tsspectral_daily_mv"


def _daily(dialect: str, staged: bool = False) -> str:
    """The 28-row daily series CTE (shared by every query here).

    staged=True reads the checkpointed view instead: the per-frequency
    DFT CTEs reference `daily` once per frequency, so Catalyst
    inlining re-ran the events corpus aggregate ~10-20x per query
    (q479's before plan held 20 events scans; P3, guide §2.4)."""
    if staged:
        return f"""daily AS (
      SELECT t, x FROM {_DAILY_VIEW}
    )"""
    return f"""daily AS (
      SELECT {_day(dialect)} AS t,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2))) AS DOUBLE) AS x
      FROM events
      WHERE {_day(dialect)} BETWEEN 0 AND {N_DAYS - 1}
      GROUP BY {_day(dialect)}
    )"""


def _daily_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE events aggregate -> checkpointed 28-row daily series."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_daily('spark')} SELECT t, x FROM daily")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_DAILY_VIEW)


def _arr(dialect: str, vals: list[float]) -> str:
    lits = ", ".join(repr(v) for v in vals)
    return f"[{lits}]" if dialect == "duck" else f"array({lits})"


def _grid(dialect: str, vals: tuple, col: str) -> str:
    lits = ", ".join(str(v) for v in vals)
    if dialect == "spark":
        return f"(SELECT explode(array({lits})) AS {col})"
    return f"(SELECT unnest([{lits}]) AS {col})"


# ---------------------------------------------------------------------------
# q476 — periodogram


def _power_ctes(dialect: str) -> str:
    """Per-frequency DFT power CTEs pow1..powK + a union CTE `spec`."""
    # DuckDB list indexing is 1-based, Spark array indexing 0-based
    idx = "t + 1" if dialect == "duck" else "t"
    ctes, sel = [], []
    for k in FREQS:
        cos_a = _arr(dialect, _COS[k])
        sin_a = _arr(dialect, _SIN[k])
        ctes.append(f"""
    pow{k} AS (
      SELECT CAST(SUM(CAST(ROUND(x * ({cos_a})[{idx}], 6)
                 AS DECIMAL(38,6))) AS DOUBLE) AS c,
             CAST(SUM(CAST(ROUND(x * ({sin_a})[{idx}], 6)
                 AS DECIMAL(38,6))) AS DOUBLE) AS s
      FROM daily
    )""")
        sel.append(
            f"SELECT {k} AS k, {N_DAYS // k} AS period_days, "
            f"c * c + s * s AS power FROM pow{k}"
        )
    return ",".join(ctes) + f""",
    spec AS ({" UNION ALL ".join(sel)})"""


def _periodogram_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_daily(dialect, staged)},{_power_ctes(dialect)},
    tot AS (SELECT SUM(CAST(ROUND(power, 2) AS DECIMAL(38,2))) AS tp FROM spec)
    SELECT s.k AS cycles_per_28d, s.period_days,
           ROUND(s.power, 2) AS power,
           ROUND(s.power / CAST(t.tp AS DOUBLE), 6) AS power_share
    FROM spec s CROSS JOIN tot t
    """


@query("q476_periodogram", oracle=_periodogram_sql("duck"))
def q476_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFT periodogram of the 28-day daily-value series at the 28/14/
    7/4/2-day periods: power_k = (sum x_t cos)^2 + (sum x_t sin)^2
    with every cos/sin a Python literal indexed by day (rule 11 — no
    runtime trig). Terms round at 6 dp into DECIMAL sums; the square
    is one straight-line op. One daily shuffle; the spectrum is 5
    rows of arithmetic. Index bases differ per dialect (DuckDB lists
    1-based, Spark arrays 0-based) — folded into the generator."""
    _daily_view(spark, sf_dir)
    return spark.sql(_periodogram_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q477 — binary segmentation (one recursion level)


def _binseg_sql(dialect: str, staged: bool = False) -> str:
    # CUSUM-like split statistic over prefix sums of the bounded daily
    # table; the level-2 searches reuse the same table filtered by the
    # level-1 argmax.
    def seg(name: str, lo: str, hi: str) -> str:
        return f"""
    pre_{name} AS (
      SELECT t, x,
             SUM(CAST(ROUND(x, 6) AS DECIMAL(38,6)))
               OVER (ORDER BY t) AS cx,
             COUNT(*) OVER (ORDER BY t) AS i,
             SUM(CAST(ROUND(x, 6) AS DECIMAL(38,6))) OVER () AS tot,
             COUNT(*) OVER () AS n
      FROM daily WHERE t >= {lo} AND t < {hi}
    ),
    stat_{name} AS (
      SELECT t,
             ABS(CAST(cx AS DOUBLE) / i
                 - (CAST(tot AS DOUBLE) - CAST(cx AS DOUBLE)) / (n - i))
             * SQRT(CAST(i AS DOUBLE) * (n - i) / n) AS g
      FROM pre_{name} WHERE i < n
    ),
    best_{name} AS (
      SELECT t, g FROM (
        SELECT t, g, ROW_NUMBER() OVER (ORDER BY ROUND(g, 6) DESC, t) AS rn
        FROM stat_{name}
      ) z WHERE rn = 1
    )"""

    return f"""
    WITH {_daily(dialect, staged)},{seg("all", "0", str(N_DAYS))},
    lvl1 AS (SELECT t AS tau FROM best_all),
    {seg("left", "0", "(SELECT tau FROM lvl1)")},
    {seg("right", "(SELECT tau FROM lvl1)", str(N_DAYS))}
    SELECT 'root' AS segment, b.t AS split_day, ROUND(b.g, 4) AS cusum_stat
    FROM best_all b
    UNION ALL
    SELECT 'left', b.t, ROUND(b.g, 4) FROM best_left b
    UNION ALL
    SELECT 'right', b.t, ROUND(b.g, 4) FROM best_right b
    """


@query("q477_binary_segmentation", oracle=_binseg_sql("duck"))
def q477_binary_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One recursion level of binary changepoint segmentation: the
    day maximizing the scaled mean-shift statistic |mean_left -
    mean_right| * sqrt(i(n-i)/n) over the 28-day series, then the
    best split inside each resulting half — the search that finds
    MULTIPLE level shifts where q138's single CUSUM pass reports one.
    Prefix sums ride DECIMAL accumulators over the calendar-bounded
    daily table (rule 15); argmax ranks on the 6-dp-rounded statistic
    with the day as tie-break (rule 4)."""
    _daily_view(spark, sf_dir)
    return spark.sql(_binseg_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q478 — Hurst exponent (rescaled range)


def _hurst_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_daily(dialect, staged)},
    blocks AS (
      SELECT b.b, CAST(FLOOR(CAST(d.t AS DOUBLE) / b.b) AS BIGINT) AS blk,
             d.t, d.x
      FROM {_grid(dialect, HURST_BLOCKS, "b")} b CROSS JOIN daily d
    ),
    bstats AS (
      SELECT b, blk,
             CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS mu,
             COUNT(*) AS m
      FROM blocks GROUP BY b, blk
    ),
    dev AS (
      SELECT bl.b, bl.blk, bl.t, bl.x - bs.mu AS d,
             SUM(CAST(ROUND(bl.x - bs.mu, 6) AS DECIMAL(38,6)))
               OVER (PARTITION BY bl.b, bl.blk ORDER BY bl.t) AS cd
      FROM blocks bl JOIN bstats bs ON bs.b = bl.b AND bs.blk = bl.blk
    ),
    rs AS (
      SELECT b, blk,
             CAST(MAX(cd) AS DOUBLE) - CAST(MIN(cd) AS DOUBLE) AS r,
             SQRT(CAST(SUM(CAST(ROUND(d * d, 6) AS DECIMAL(38,6))) AS DOUBLE)
                  / COUNT(*)) AS s
      FROM dev GROUP BY b, blk
    ),
    per_b AS (
      SELECT b,
             CAST(SUM(CAST(ROUND(r / s, 8) AS DECIMAL(38,8))) AS DOUBLE)
               / COUNT(*) AS rs_avg
      FROM rs WHERE s > CAST(0.0 AS DOUBLE) GROUP BY b
    ),
    logs AS (
      SELECT ROUND(LN(CAST(b AS DOUBLE)), 9) AS lx,
             ROUND(LN(rs_avg), 9) AS ly
      FROM per_b
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(lx AS DECIMAL(38,9))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(ly AS DECIMAL(38,9))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(ROUND(lx * ly, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sxy,
             CAST(SUM(CAST(ROUND(lx * lx, 9) AS DECIMAL(38,9))) AS DOUBLE) AS sxx
      FROM logs
    )
    SELECT CAST(n AS BIGINT) AS n_block_sizes,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 4) AS hurst_exponent
    FROM mom
    """


@query("q478_hurst_exponent", oracle=_hurst_sql("duck"))
def q478_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent by rescaled-range analysis: per 7/14/28-day
    block, R = range of cumulative mean-deviations and S = block std;
    H = slope of ln(avg R/S) on ln(block size) over the three sizes
    (closed-form 3-point OLS). H ~ 0.5 = no long-range dependence.
    Cumulative deviations are per-(size, block) DECIMAL window sums
    over the 28-row daily table; ln terms round at 9 dp (rule 5).
    The block grid multiplies 28 rows — constant work."""
    _daily_view(spark, sf_dir)
    return spark.sql(_hurst_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q479 — spectral entropy


def _sentropy_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_daily(dialect, staged)},{_power_ctes(dialect)},
    tot AS (SELECT SUM(CAST(ROUND(power, 2) AS DECIMAL(38,2))) AS tp FROM spec),
    probs AS (
      SELECT s.k, s.power / CAST(t.tp AS DOUBLE) AS p
      FROM spec s CROSS JOIN tot t
    ),
    ent AS (
      SELECT CAST(SUM(CAST(ROUND(-p * LN(p), 9) AS DECIMAL(38,9))) AS DOUBLE)
               AS h
      FROM probs WHERE p > CAST(0.0 AS DOUBLE)
    ),
    dom AS (
      SELECT k FROM (
        SELECT k, ROW_NUMBER() OVER (ORDER BY ROUND(p, 9) DESC, k) AS rn
        FROM probs
      ) z WHERE rn = 1
    )
    SELECT ROUND(e.h / {LN_K}, 5) AS spectral_entropy,
           d.k AS dominant_cycles_per_28d
    FROM ent e CROSS JOIN dom d
    """


@query("q479_spectral_entropy", oracle=_sentropy_sql("duck"))
def q479_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized spectral entropy of the q476 periodogram: -sum p
    ln p / ln(K) over the 5 frequency shares — 0 when one cycle
    carries everything, 1 for a flat spectrum — plus the dominant
    frequency. The structure-vs-noise one-liner used to gate seasonal
    models (q403's strength measure from the frequency side). ln
    terms at 9 dp into DECIMAL (rule 5); ln(K) is a Python literal."""
    _daily_view(spark, sf_dir)
    return spark.sql(_sentropy_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q480 — turning-point randomness test

_TP_EXPECTED = repr(2.0 * (N_DAYS - 2) / 3.0)
_TP_VAR = repr((16.0 * N_DAYS - 29.0) / 90.0)


def _turning_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_daily(dialect, staged)},
    lagged AS (
      SELECT t, x,
             LAG(x) OVER (ORDER BY t) AS xp,
             LEAD(x) OVER (ORDER BY t) AS xn
      FROM daily
    ),
    tp AS (
      SELECT CAST(SUM(CASE WHEN (x > xp AND x > xn) OR (x < xp AND x < xn)
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_turning,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lagged WHERE xp IS NOT NULL AND xn IS NOT NULL
    )
    SELECT n + 2 AS n_days, n_turning,
           ROUND(CAST({_TP_EXPECTED} AS DOUBLE), 4) AS expected_turning,
           ROUND((n_turning - CAST({_TP_EXPECTED} AS DOUBLE))
                 / SQRT(CAST({_TP_VAR} AS DOUBLE)), 4) AS z_score
    FROM tp
    """


@query("q480_turning_points", oracle=_turning_sql("duck"))
def q480_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's turning-point randomness test on the daily series:
    count strict local extrema and compare to the exchangeability
    expectation 2(n-2)/3 with variance (16n-29)/90 (both Python
    literals). |z| >> 2 means the KPI has real serial structure and
    naive day-over-day alerting will misfire. One lag/lead window
    over the 28-row calendar table."""
    _daily_view(spark, sf_dir)
    return spark.sql(_turning_sql("spark", staged=True))
