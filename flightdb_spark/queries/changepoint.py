"""Changepoint-detection batch 184 (q987-q991) — offline single-split
detection over the hourly revenue series (binary segmentation's first
step, Scott-Knott style; CUSUM location; Page-Hinkley) — the drift
alarms a metrics platform runs on every KPI, and the split primitive
hierarchical segmentation recurses on.

The series is the calendar-bounded hourly total (exact cents). All
split statistics reduce to prefix sums: with S_L, n_L the left prefix
and S, n the totals, the between-segment SSE reduction at split t is
  gain(t) = (S_L*n_R - S_R*n_L)^2 / (n_L * n_R * n)
— exact integer numerators in DECIMAL(38) (the squares overflow
BIGINT; q245 widening rule), ranked by the identically-computed
double ratio with a t tie-break.

- q987 best single split: the argmax-gain hour, its gain and the
  segment means;
- q988 CUSUM changepoint location: argmax |cumulative deviation from
  the grand mean| in exact cents x hours units;
- q989 Page-Hinkley statistic: cum deviation minus its running
  MINIMUM (a window, not a recursion), alarm flags at a literal
  threshold;
- q990 shift magnitude: pre/post means and their exact-rational
  difference at the q987 split;
- q991 split-half variance ratio: second-moment comparison of the
  two halves (exact DECIMAL moments, terminal ratio).

100 TB shape: ONE events pass to the hourly aggregate; every window
is a prefix over the ~720-row calendar-bounded series (q339's class).

Determinism: integer cents sums; DECIMAL(38) squared numerators;
rank keys are identically-computed doubles with integer tie-breaks;
running min is exact integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

PH_THRESHOLD_U = 2_000_000_000  # Page-Hinkley alarm, cents x hours units


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _series_cte() -> str:
    return """hourly AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS v
      FROM events GROUP BY hr
    ),
    ser AS (
      SELECT hr, v,
             ROW_NUMBER() OVER (ORDER BY hr) AS t,
             CAST(SUM(v) OVER (ORDER BY hr
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cs
      FROM hourly
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS BIGINT) AS s
      FROM hourly
    )"""


def _gain_cte() -> str:
    """Per split t (1..n-1): exact DECIMAL gain numerator/denominator
    and the double ratio used for ranking."""
    return f"""{_series_cte()},
    gains AS (
      SELECT /*+ BROADCAST(tt) */ r.t, r.hr, r.cs AS s_l, tt.n, tt.s,
             CAST(r.cs AS DECIMAL(38,0)) * (tt.n - r.t)
               - CAST(tt.s - r.cs AS DECIMAL(38,0)) * r.t AS num_root,
             CAST(r.t AS DECIMAL(38,0)) * (tt.n - r.t) * tt.n AS den
      FROM ser r CROSS JOIN tot tt
      WHERE r.t < tt.n
    ),
    scored AS (
      SELECT t, hr, s_l, n, s,
             CAST(num_root * num_root AS DOUBLE) / CAST(den AS DOUBLE)
               AS gain
      FROM gains
    ),
    best AS (
      SELECT * FROM (
        SELECT scored.*,
               ROW_NUMBER() OVER (ORDER BY gain DESC, t) AS rk
        FROM scored
      ) z WHERE rk = 1
    )"""


_Q987_SQL = f"""
    WITH {_gain_cte()}
    SELECT t AS split_t, hr AS split_hr,
           gain AS sse_reduction,
           CAST(s_l AS DOUBLE) / t AS mean_before_cents,
           CAST(s - s_l AS DOUBLE) / (n - t) AS mean_after_cents
    FROM best
    """


@query("q987_binary_split", oracle=_Q987_SQL)
def q987_binary_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The best single changepoint by between-segment SSE reduction —
    binary segmentation's first (and recursed) step. Gains come from
    prefix sums only: exact DECIMAL(38) squared numerators ranked by
    the identically-computed double ratio, tie-broken on t."""
    _views(spark, sf_dir)
    return spark.sql(_Q987_SQL)


_Q988_SQL = f"""
    WITH {_series_cte()},
    dev AS (
      SELECT /*+ BROADCAST(tt) */ r.t, r.hr,
             CAST(r.cs * tt.n - tt.s * r.t AS BIGINT) AS cumdev_u
      FROM ser r CROSS JOIN tot tt WHERE r.t < tt.n
    )
    SELECT t AS cusum_t, hr AS cusum_hr, cumdev_u,
           CAST(ABS(cumdev_u) AS BIGINT) AS abs_cumdev_u
    FROM (
      SELECT dev.*, ROW_NUMBER() OVER (ORDER BY ABS(cumdev_u) DESC, t) AS rk
      FROM dev
    ) z WHERE rk = 1
    """


@query("q988_cusum_location", oracle=_Q988_SQL)
def q988_cusum_location(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSUM changepoint estimator: the hour maximizing the
    absolute cumulative deviation from the grand mean, in exact
    cents x hours integer units (the mean never becomes a double) —
    the classical location estimate that q987's SSE split refines."""
    _views(spark, sf_dir)
    return spark.sql(_Q988_SQL)


_Q989_SQL = f"""
    WITH {_series_cte()},
    dev AS (
      SELECT /*+ BROADCAST(tt) */ r.t, r.hr,
             CAST(r.cs * tt.n - tt.s * r.t AS BIGINT) AS cumdev_u
      FROM ser r CROSS JOIN tot tt
    ),
    ph AS (
      SELECT t, hr, cumdev_u,
             CAST(cumdev_u - MIN(cumdev_u) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS ph_stat_u
      FROM dev
    )
    SELECT hr, cumdev_u, ph_stat_u,
           CAST(CASE WHEN ph_stat_u > {PH_THRESHOLD_U} THEN 1 ELSE 0 END
             AS INT) AS alarm
    FROM ph ORDER BY hr
    """


@query("q989_page_hinkley", oracle=_Q989_SQL)
def q989_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley upward-drift statistic: the cumulative deviation
    minus its RUNNING MINIMUM — algebraically the recursive PH test,
    but expressed as a prefix-min window (no recursion needed), all
    exact integers; alarms at a literal threshold."""
    _views(spark, sf_dir)
    return spark.sql(_Q989_SQL)


_Q990_SQL = f"""
    WITH {_gain_cte()}
    SELECT t AS split_t,
           CAST(s_l AS BIGINT) AS sum_before_u,
           CAST(s - s_l AS BIGINT) AS sum_after_u,
           CAST(t AS BIGINT) AS n_before,
           CAST(n - t AS BIGINT) AS n_after,
           -- shift = mean_after - mean_before as the exact rational
           -- ((s-s_l)*t - s_l*(n-t)) / (t*(n-t)), emitted num/den + double
           CAST((s - s_l) * t - s_l * (n - t) AS BIGINT) AS shift_num_u,
           CAST(t * (n - t) AS BIGINT) AS shift_den,
           CAST((s - s_l) * t - s_l * (n - t) AS DOUBLE)
             / (CAST(t AS DOUBLE) * (n - t)) AS shift_cents
    FROM best
    """


@query("q990_shift_magnitude", oracle=_Q990_SQL)
def q990_shift_magnitude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mean shift at the detected changepoint as an EXACT rational
    (numerator/denominator in integer cents) beside its display
    double — the effect size a drift alert reports next to the
    location."""
    _views(spark, sf_dir)
    return spark.sql(_Q990_SQL)


_Q991_SQL = f"""
    WITH {_gain_cte()},
    halves AS (
      SELECT /*+ BROADCAST(b) */ r.t, r.v,
             CASE WHEN r.t <= b.t THEN 0 ELSE 1 END AS seg
      FROM ser r CROSS JOIN best b
    ),
    mom AS (
      SELECT seg,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS BIGINT) AS s,
             SUM(CAST(v AS DECIMAL(38,0)) * v) AS ss
      FROM halves GROUP BY seg
    )
    SELECT a.n AS n_before, b.n AS n_after,
           -- population variance * n^2 as exact integers:
           -- n*ss - s^2 per segment; ratio as identically-computed doubles
           CAST(a.n * a.ss - CAST(a.s AS DECIMAL(38,0)) * a.s AS DOUBLE)
             / (CAST(a.n AS DOUBLE) * a.n) AS var_before,
           CAST(b.n * b.ss - CAST(b.s AS DECIMAL(38,0)) * b.s AS DOUBLE)
             / (CAST(b.n AS DOUBLE) * b.n) AS var_after,
           (CAST(b.n * b.ss - CAST(b.s AS DECIMAL(38,0)) * b.s AS DOUBLE)
             / (CAST(b.n AS DOUBLE) * b.n))
           / (CAST(a.n * a.ss - CAST(a.s AS DECIMAL(38,0)) * a.s AS DOUBLE)
             / (CAST(a.n AS DOUBLE) * a.n)) AS variance_ratio
    FROM (SELECT * FROM mom WHERE seg = 0) a
    CROSS JOIN (SELECT * FROM mom WHERE seg = 1) b
    """


@query("q991_split_variance_ratio", oracle=_Q991_SQL)
def q991_split_variance_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance ratio across the detected split — does the changepoint
    separate regimes of different volatility, not just level? Moments
    are exact DECIMAL(38) integer sums; the ratio is a terminal
    double of identically-computed operands."""
    _views(spark, sf_dir)
    return spark.sql(_Q991_SQL)
