"""Kalman-filter batch 152 (q826-q830) — a local-level Kalman filter
over each event type's daily revenue, run WITHOUT a sequential loop:
for a linear-Gaussian filter the gain schedule k_t is data-INDEPENDENT
(it depends only on P0/Q/R), so the whole schedule is precomputed in
Python and inlined as exact literals, and the state recurrence
x_t = (1-k_t) x_{t-1} + k_t z_t unrolls into the closed form

    x_n = G_n * sum_{t<=n} (k_t / G_t) z_t,   G_t = prod_{j<=t}(1-k_j)

— a plain partitioned PREFIX SUM of precomputed-coefficient terms.
The same trick that turned Lindley (q756) and the flow shop (q824)
into windows turns sequential filtering into one scan.

- q826 the filter trace: observed daily cents, filtered level, and
  one-step innovation per (event type, day step);
- q827 innovation whiteness: mean ~ 0, variance, and the lag-1
  autocorrelation of innovations per type (the filter-is-right
  diagnostic);
- q828 the gain schedule: k_t, G_t, convergence gap to the steady-
  state gain, truncated at the observed horizon;
- q829 filter vs naive one-step prediction SSE per type;
- q830 innovation-band coverage: the share of days whose innovation
  falls inside the +-1.96 sqrt(P_pred + R) band, against the nominal
  95%.

100 TB shape: one aggregate to the (type, day) spine; every window
partitions by event type over its <= ~40-day series (bounded by the
calendar, never event rows); the coefficient table is a 40-row
constant VALUES broadcast.

Determinism: daily revenue in exact BIGINT cents; gain/decay
coefficients are Python-exact inlined literals (the q791 idiom, e0
exponent forms); each prefix-sum term c_t * z_t is FLOOR(x + 0.5)-
quantized to integers before the BIGINT cumulative (unit grain —
magnitudes reach 1e14 where nano would overflow); filtered levels
are terminal straight-line doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MAX_T = 40
P0 = 1e12  # diffuse prior variance (cents^2)
QVAR = 1e9  # level innovation variance
RVAR = 1e10  # observation variance


def _gain_schedule() -> list[tuple[int, float, float, float, float]]:
    """(t, k_t, G_t, c_t = k_t/G_t, P_pred_t) — pure Python floats."""
    rows = []
    p = P0
    g = 1.0
    for t in range(1, MAX_T + 1):
        p_pred = p + QVAR
        k = p_pred / (p_pred + RVAR)
        p = (1 - k) * p_pred
        g *= 1 - k
        rows.append((t, k, g, k / g, p_pred))
    return rows


def _k_steady() -> float:
    p = 1e9
    for _ in range(300):
        p_pred = p + QVAR
        k = p_pred / (p_pred + RVAR)
        p = (1 - k) * p_pred
    return (p + QVAR) / (p + QVAR + RVAR)


def _lit(x: float) -> str:
    r = repr(x)
    return r if "e" in r else f"{r}e0"


def _gains_values() -> str:
    return ",\n      ".join(
        f"({t}, CAST({_lit(k)} AS DOUBLE), CAST({_lit(g)} AS DOUBLE), "
        f"CAST({_lit(c)} AS DOUBLE), CAST({_lit(pp)} AS DOUBLE))"
        for t, k, g, c, pp in _gain_schedule()
    )


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _filter_cte() -> str:
    """(type, step) daily series joined to gains -> filtered level."""
    return f"""daily AS (
      SELECT event_type AS et, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS z
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    stepped AS (
      SELECT et, d, z,
             ROW_NUMBER() OVER (PARTITION BY et ORDER BY d) AS t
      FROM daily
    ),
    gains(t, k, g, c, p_pred) AS (VALUES
      {_gains_values()}
    ),
    scanned AS (
      SELECT /*+ BROADCAST(g) */ s.et, s.t, s.d, s.z,
             g.k, g.g, g.p_pred,
             CAST(SUM(CAST(FLOOR(g.c * s.z + 0.5) AS BIGINT))
                  OVER (PARTITION BY s.et ORDER BY s.t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS s_cum
      FROM stepped s JOIN gains g ON g.t = s.t
    ),
    filt AS (
      SELECT et, t, d, z, k, p_pred,
             g * s_cum AS x_filt,
             LAG(g * s_cum) OVER (PARTITION BY et ORDER BY t) AS x_prev
      FROM scanned
    )"""


# ---------------------------------------------------------------------------
# q826 — filter trace

_Q826_SQL = f"""
    WITH {_filter_cte()}
    SELECT et AS event_type, CAST(t AS BIGINT) AS step, z AS z_cents,
           x_filt AS filtered_cents,
           z - x_prev AS innovation_cents
    FROM filt
    ORDER BY et, t
    """


@query("q826_kalman_trace", oracle=_Q826_SQL)
def q826_kalman_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The filtered daily-revenue level per event type — the Kalman
    recurrence solved as a partitioned prefix sum over inlined exact
    gain coefficients (x_n = G_n * cumsum(c_t z_t)); no loop, no
    state, one window."""
    _views(spark, sf_dir)
    return spark.sql(_Q826_SQL)


# ---------------------------------------------------------------------------
# q827 — innovation whiteness

_Q827_SQL = f"""
    WITH {_filter_cte()},
    innov AS (
      SELECT et, t,
             CAST(FLOOR(z - x_prev + 0.5) AS BIGINT) AS e
      FROM filt WHERE x_prev IS NOT NULL
    ),
    lagged AS (
      SELECT et, e,
             LAG(e) OVER (PARTITION BY et ORDER BY t) AS e_prev
      FROM innov
    ),
    mom AS (
      SELECT et,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(e) AS BIGINT) AS s1,
             CAST(SUM(CAST(e AS DECIMAL(38,0)) * e) AS DECIMAL(38,0)) AS s2,
             CAST(SUM(CASE WHEN e_prev IS NOT NULL
                      THEN CAST(e AS DECIMAL(38,0)) * e_prev
                      ELSE CAST(0 AS DECIMAL(38,0)) END) AS DECIMAL(38,0))
               AS s_cross,
             CAST(SUM(CASE WHEN e_prev IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_pairs
      FROM lagged GROUP BY et
    )
    SELECT et AS event_type, n AS n_innovations,
           CAST(s1 AS DOUBLE) / n AS mean_innovation,
           (CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
             - CAST(s1 AS DOUBLE) * s1) / (CAST(n AS DOUBLE) * n)
             AS var_innovation,
           CAST(s_cross AS DOUBLE) / CAST(s2 AS DOUBLE) AS lag1_autocorr
    FROM mom
    ORDER BY et
    """


@query("q827_innovation_whiteness", oracle=_Q827_SQL)
def q827_innovation_whiteness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whiteness diagnostics for the one-step innovations: mean near
    zero, variance, and the lag-1 autocorrelation (|rho| << 1 when the
    local-level model fits). Integer innovations, exact moments."""
    _views(spark, sf_dir)
    return spark.sql(_Q827_SQL)


# ---------------------------------------------------------------------------
# q828 — gain schedule

_Q828_SQL = f"""
    WITH {_filter_cte()},
    horizon AS (
      SELECT CAST(MAX(t) AS BIGINT) AS tmax,
             CAST(COUNT(DISTINCT et) AS BIGINT) AS n_series
      FROM stepped
    )
    SELECT g.t AS step, g.k AS gain, g.g AS decay_g,
           ABS(g.k - CAST({_lit(_k_steady())} AS DOUBLE)) AS gap_to_steady,
           h.n_series
    FROM gains g CROSS JOIN horizon h
    WHERE g.t <= h.tmax
    ORDER BY g.t
    """


@query("q828_gain_schedule", oracle=_Q828_SQL)
def q828_gain_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The precomputed gain schedule truncated at the observed
    horizon: k_t decays from ~1 (diffuse prior) toward the steady-
    state gain; the gap column is monotonically shrinking
    (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q828_SQL)


# ---------------------------------------------------------------------------
# q829 — filter vs naive one-step SSE

_Q829_SQL = f"""
    WITH {_filter_cte()},
    preds AS (
      SELECT et, t, z,
             CAST(FLOOR(z - x_prev + 0.5) AS BIGINT) AS e_kalman,
             CAST(z - LAG(z) OVER (PARTITION BY et ORDER BY t) AS BIGINT)
               AS e_naive
      FROM filt
    )
    SELECT et AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_predictions,
           CAST(SUM(CAST(e_kalman AS DECIMAL(38,0)) * e_kalman)
                AS DOUBLE) AS sse_kalman,
           CAST(SUM(CAST(e_naive AS DECIMAL(38,0)) * e_naive)
                AS DOUBLE) AS sse_naive,
           CAST(SUM(CAST(e_kalman AS DECIMAL(38,0)) * e_kalman) AS DOUBLE)
             / CAST(SUM(CAST(e_naive AS DECIMAL(38,0)) * e_naive) AS DOUBLE)
             AS sse_ratio
    FROM preds
    WHERE e_kalman IS NOT NULL AND e_naive IS NOT NULL
    GROUP BY et
    ORDER BY et
    """


@query("q829_kalman_vs_naive", oracle=_Q829_SQL)
def q829_kalman_vs_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead SSE of the filtered level against the naive
    last-value predictor, per type. For a noisy level series the
    filter's averaging should not lose badly to naive (ratio sanity-
    banded by the test)."""
    _views(spark, sf_dir)
    return spark.sql(_Q829_SQL)


# ---------------------------------------------------------------------------
# q830 — innovation-band coverage

_Q830_SQL = f"""
    WITH {_filter_cte()}
    SELECT et AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(CASE WHEN ABS(z - x_prev)
                    <= CAST(1.96e0 AS DOUBLE) * SQRT(p_pred + {_lit(RVAR)})
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_inside,
           CAST(SUM(CASE WHEN ABS(z - x_prev)
                    <= CAST(1.96e0 AS DOUBLE) * SQRT(p_pred + {_lit(RVAR)})
                    THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS coverage,
           CAST(0.95e0 AS DOUBLE) AS nominal
    FROM filt
    WHERE x_prev IS NOT NULL
    GROUP BY et
    ORDER BY et
    """


@query("q830_innovation_coverage", oracle=_Q830_SQL)
def q830_innovation_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration of the innovation band: the share of days whose
    innovation lies inside +-1.96 sqrt(P_pred + R), per type, against
    the nominal 95% (off when R/Q are mis-specified for the data —
    this is the diagnostic that says so)."""
    _views(spark, sf_dir)
    return spark.sql(_Q830_SQL)
