"""Nonparametric-trend batch 105 (q591-q595) — the distribution-free
trend tests beside q- mining's Mann-Kendall: Sen's slope, the
Wald-Wolfowitz runs test, the turning-points test, seasonal
Mann-Kendall, and the rank von Neumann ratio, all over the DAILY
revenue series (events.value summed per day in EXACT INTEGER CENTS:
each row contributes FLOOR(value*100+0.5) before the sum, so the
series is a BIGINT on both engines and every rank/sign/pairwise
comparison is exact — no double-sum low-bit hazards anywhere).

- q591 Sen's slope: the median pairwise slope over the ~30-day
  series (odd/even handled by explicit order statistics, never an
  engine median()) with rank-based 90% bounds;
- q592 runs test: signs vs the series median, observed runs vs the
  E/Var closed form;
- q593 turning points: local extrema count vs 2(n-2)/3 expectation;
- q594 seasonal Mann-Kendall: the MK S statistic per day-of-week
  season, summed with summed variances;
- q595 rank von Neumann: squared successive rank differences over
  the day series — serial dependence in ranks.

100 TB shape: ONE aggregate collapses the corpus to the bounded
daily table (<= calendar days); every window and pairwise join after
that runs on that bounded table (the q339/q356 allowlist class —
calendar-bounded, never corpus rows). Pairwise slope/MK joins are
triangle joins over <= n_days^2/2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _idiv(dialect: str, a: str, b: str) -> str:
    """Exact integer division (DuckDB `/` on integers yields DOUBLE
    and CAST rounds; Spark's cast truncates — q307/q367)."""
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _daily_cte(dialect: str) -> str:
    """Bounded daily series in exact integer cents with a 0-based
    contiguous day index."""
    return f"""daily0 AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    mind AS (SELECT MIN(d) AS d0, CAST(COUNT(*) AS BIGINT) AS n FROM daily0),
    daily AS (
      SELECT s.d, s.cents,
             CAST({_days(dialect, 'm.d0', 's.d')} AS BIGINT) AS i, m.n
      FROM daily0 s CROSS JOIN mind m
    )"""


# ---------------------------------------------------------------------------
# q591 — Sen's slope


def _sen_sql(dialect: str) -> str:
    return f"""
    WITH {_daily_cte(dialect)},
    slopes AS (
      SELECT CAST(y.cents - x.cents AS DOUBLE) / (y.i - x.i) AS slope,
             x.i AS i, y.i AS j
      FROM daily x JOIN daily y ON y.i > x.i
    ),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, i, j) AS rn,
             CAST(COUNT(*) OVER () AS BIGINT) AS np
      FROM slopes
    )
    SELECT MAX(np) AS n_pairs,
           ROUND(MAX(CASE WHEN rn = {_idiv(dialect, 'np + 1', '2')}
                          THEN slope END), 6) AS sen_slope_lo,
           ROUND(MAX(CASE WHEN rn = {_idiv(dialect, 'np + 2', '2')}
                          THEN slope END), 6) AS sen_slope_hi,
           ROUND(MAX(CASE WHEN rn = {_idiv(dialect, 'np * 5', '100')} + 1
                          THEN slope END), 6) AS slope_p05,
           ROUND(MAX(CASE WHEN rn = {_idiv(dialect, 'np * 95', '100')}
                          THEN slope END), 6) AS slope_p95
    FROM ranked
    """


@query("q591_sen_slope", oracle=_sen_sql("duck"))
def q591_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sen's slope estimator: the median of all pairwise slopes over
    the daily cents series, as explicit order statistics (lo/hi
    middle elements — their mean is the textbook estimate; emitting
    both avoids an even-count interpolation divergence) plus the
    rank-based 5%/95% slope bounds. The pair triangle and the rank
    window run on the <=days^2/2 bounded slope table (q356 class).
    All order-statistic indices use exact integer division (div/ //)
    on both engines."""
    _views(spark, sf_dir)
    return spark.sql(_sen_sql("spark"))


# ---------------------------------------------------------------------------
# q592 — Wald-Wolfowitz runs test


def _runs_sql(dialect: str) -> str:
    return f"""
    WITH {_daily_cte(dialect)},
    med AS (
      SELECT MAX(CASE WHEN rn = {_idiv(dialect, 'n + 1', '2')}
                      THEN cents END) AS m_lo,
             MAX(CASE WHEN rn = {_idiv(dialect, 'n + 2', '2')}
                      THEN cents END) AS m_hi
      FROM (SELECT cents, n,
                   ROW_NUMBER() OVER (ORDER BY cents, i) AS rn
            FROM daily) r
    ),
    signed AS (
      SELECT d.i,
             CASE WHEN 2 * d.cents > m.m_lo + m.m_hi THEN 1
                  WHEN 2 * d.cents < m.m_lo + m.m_hi THEN -1
                  ELSE 0 END AS sgn
      FROM daily d CROSS JOIN med m
    ),
    nz AS (SELECT i, sgn FROM signed WHERE sgn <> 0),
    runs AS (
      SELECT sgn,
             CASE WHEN LAG(sgn) OVER (ORDER BY i) IS NULL
                    OR LAG(sgn) OVER (ORDER BY i) <> sgn
                  THEN 1 ELSE 0 END AS new_run
      FROM nz
    )
    SELECT CAST(SUM(new_run) AS BIGINT) AS n_runs,
           CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
           ROUND(CAST(2 AS DOUBLE)
                     * SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                     * SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                     / COUNT(*) + 1.0, 6) AS expected_runs
    FROM runs
    """


@query("q592_runs_test", oracle=_runs_sql("duck"))
def q592_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald-Wolfowitz runs test vs the series median: observed sign
    runs against the 2*n1*n2/n + 1 expectation. The median compare is
    exact (2*cents vs m_lo+m_hi integer arithmetic, ties dropped per
    the textbook treatment); run boundaries come from one LAG over
    the bounded daily table."""
    _views(spark, sf_dir)
    return spark.sql(_runs_sql("spark"))


# ---------------------------------------------------------------------------
# q593 — turning-points test


def _turning_sql(dialect: str) -> str:
    return f"""
    WITH {_daily_cte(dialect)},
    tri AS (
      SELECT i, cents,
             LAG(cents) OVER (ORDER BY i) AS prev,
             LEAD(cents) OVER (ORDER BY i) AS nxt,
             n
      FROM daily
    )
    SELECT CAST(SUM(CASE WHEN (cents > prev AND cents > nxt)
                          OR (cents < prev AND cents < nxt)
                         THEN 1 ELSE 0 END) AS BIGINT) AS turning_points,
           CAST(MAX(n) AS BIGINT) AS n_days,
           ROUND(CAST(2 AS DOUBLE) * (MAX(n) - 2) / 3.0, 6) AS expected_tp,
           ROUND((CAST(16 AS DOUBLE) * MAX(n) - 29.0) / 90.0, 6) AS var_tp
    FROM tri WHERE prev IS NOT NULL AND nxt IS NOT NULL
    """


@query("q593_turning_points", oracle=_turning_sql("duck"))
def q593_turning_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The turning-points randomness test: local extrema in the daily
    cents series (strict integer compares; plateau points are not
    turning points) vs the 2(n-2)/3 expectation and (16n-29)/90
    variance. One LAG/LEAD pass over the bounded daily table."""
    _views(spark, sf_dir)
    return spark.sql(_turning_sql("spark"))


# ---------------------------------------------------------------------------
# q594 — seasonal Mann-Kendall


def _smk_sql(dialect: str) -> str:
    dow = "dayofweek(d)" if dialect == "spark" else "dayofweek(d) + 1"
    return f"""
    WITH {_daily_cte(dialect)},
    seasoned AS (SELECT {dow} AS season, i, cents FROM daily),
    pairs AS (
      SELECT x.season,
             CASE WHEN y.cents > x.cents THEN 1
                  WHEN y.cents < x.cents THEN -1 ELSE 0 END AS sgn
      FROM seasoned x JOIN seasoned y
        ON y.season = x.season AND y.i > x.i
    ),
    per_season AS (
      SELECT season,
             CAST(SUM(sgn) AS BIGINT) AS s_stat,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY season
    ),
    counts AS (
      SELECT season, CAST(COUNT(*) AS BIGINT) AS nk
      FROM seasoned GROUP BY season
    )
    SELECT CAST(SUM(p.s_stat) AS BIGINT) AS s_total,
           CAST(SUM(p.n_pairs) AS BIGINT) AS total_pairs,
           CAST(COUNT(*) AS BIGINT) AS n_seasons,
           ROUND(SUM(CAST(c.nk AS DOUBLE) * (c.nk - 1)
                     * (2 * c.nk + 5) / 18.0), 6) AS var_s
    FROM per_season p JOIN counts c ON c.season = p.season
    """


@query("q594_seasonal_mann_kendall", oracle=_smk_sql("duck"))
def q594_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall: the MK S statistic within each
    day-of-week season (exact integer sign pairs on the bounded daily
    table, ~n^2/14 pairs per season), seasons summed with summed
    no-ties variance nk(nk-1)(2nk+5)/18. Spark's dayofweek is
    1-based Sunday; DuckDB's is 0-based — the oracle shifts by one so
    season labels agree."""
    _views(spark, sf_dir)
    return spark.sql(_smk_sql("spark"))


# ---------------------------------------------------------------------------
# q595 — rank von Neumann ratio


def _rvn_sql(dialect: str) -> str:
    return f"""
    WITH {_daily_cte(dialect)},
    ranked AS (
      SELECT i, CAST(ROW_NUMBER() OVER (ORDER BY cents, i) AS BIGINT) AS r
      FROM daily
    ),
    ordered AS (
      SELECT i, r, LAG(r) OVER (ORDER BY i) AS prev_r
      FROM ranked
    ),
    nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily)
    SELECT CAST(SUM((r - prev_r) * (r - prev_r)) AS BIGINT) AS sq_rank_diffs,
           MAX(nm.n) AS n_days,
           -- RVN = 12 * NM / (n (n^2 - 1)); independence expectation 2
           ROUND(CAST(12 AS DOUBLE) * SUM((r - prev_r) * (r - prev_r))
                 / (CAST(MAX(nm.n) AS DOUBLE)
                    * (MAX(nm.n) * MAX(nm.n) - 1)), 6) AS rvn_ratio
    FROM ordered CROSS JOIN nm
    WHERE prev_r IS NOT NULL
    """


@query("q595_rank_von_neumann", oracle=_rvn_sql("duck"))
def q595_rank_von_neumann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank von Neumann ratio: 12*sum((r_t - r_{t-1})^2) /
    (n(n^2-1)) over day-order ranks (exact integer numerator; ranks
    are unambiguous because the cents series is integer with an
    i tie-break). Near 2 = serially independent ranks; below =
    positive dependence. Two windows on the bounded daily table."""
    _views(spark, sf_dir)
    return spark.sql(_rvn_sql("spark"))
