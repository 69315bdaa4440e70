"""Reliability-growth batch 147 (q801-q805) — Duane / Crow-AMSAA
analysis of the error stream, the curve a reliability engineer fits
to decide whether a system is actually getting better: under the
NHPP power-law model N(t) = lambda * t^beta, cumulative failures are
linear in log-log (the Duane plot); beta < 1 means reliability
growth, beta > 1 deterioration.

- q801 the Duane plot points: cumulative error count at 10
  deterministic time cutoffs across the observation span;
- q802 the power-law fit: log-log OLS over those points -> beta,
  scale lambda, and the growth verdict;
- q803 cumulative vs instantaneous MTBF at end of test: T/N and its
  Crow-AMSAA correction (T/N)/beta;
- q804 per-event-type beta comparison (each type as its own failure
  mode, same cutoff machinery);
- q805 fit diagnostics: per-cutoff log-residuals and the worst
  absolute deviation.

100 TB shape: one stream pass computes arrival micros; cutoff counts
are ONE aggregate with 10 CASE counters (no per-cutoff rescan, the
q771 idiom done even cheaper — the grid is a constant, so it folds
into the aggregate); the OLS runs on 10 rows. Per-type variant is
the same aggregate keyed by type.

Determinism: timestamps in exact BIGINT micros (unix_micros /
epoch_us dialect split); cutoffs are integer micro arithmetic;
log-log terms FLOOR-micro-quantized (q761 lesson; micro not nano so the
moment PRODUCTS stay below 2^53 — the q679 DECIMAL-to-double ulp
class bit the nano version on one event type) and summed as BIGINT; lambda's EXP is display-rounded (q762 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_CUTS = 10
MICRO = "1000000"  # micro-quantized log terms: moment products stay < 2^53


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _nq(expr: str) -> str:
    return f"CAST(FLOOR(({expr}) * {MICRO} + 0.5) AS BIGINT)"


def _wide_cte(dialect: str, by_type: bool = False) -> str:
    """fails -> bounds -> rel -> 1-row-per-type wide counter table."""
    key = "event_type AS et," if by_type else "'error' AS et,"
    flt = "" if by_type else "WHERE event_type = 'error'"
    counters = ",\n             ".join(
        f"CAST(SUM(CASE WHEN rel_us * {N_CUTS} <= span_us * {k} "
        f"THEN 1 ELSE 0 END) AS BIGINT) AS n{k}"
        for k in range(1, N_CUTS + 1)
    )
    return f"""fails AS (
      SELECT {key}
             CAST({_us(dialect)} AS BIGINT) AS t_us
      FROM events {flt}
    ),
    bounds AS (
      SELECT et, CAST(MIN(t_us) AS BIGINT) AS t0,
             CAST(MAX(t_us) - MIN(t_us) AS BIGINT) AS span_us
      FROM fails GROUP BY et
    ),
    rel AS (
      SELECT f.et, CAST(f.t_us - b.t0 AS BIGINT) AS rel_us, b.span_us
      FROM fails f JOIN bounds b ON b.et = f.et
    ),
    wide AS (
      SELECT et, CAST(MAX(span_us) AS BIGINT) AS span_us,
             {counters}
      FROM rel GROUP BY et
    )"""


def _points_cte(dialect: str, by_type: bool = False, staged: bool = False) -> str:
    """Cumulative failure counts at N_CUTS span fractions, one pass.

    The pts unpivot references `wide` once per cutoff, so Catalyst
    inlining re-ran the whole corpus pass N_CUTS times (and q805's
    lpts+fit pair doubled that — 206 Exchanges before). staged=True
    reads the checkpointed 1-row-per-type wide view instead (P3
    pattern, guide §2.4); the oracle keeps the single statement."""
    unpivot = "\n      UNION ALL\n      ".join(
        f"SELECT et, CAST({k} AS BIGINT) AS cut, span_us, n{k} AS n "
        f"FROM wide" for k in range(1, N_CUTS + 1)
    )
    if staged:
        cols = ", ".join(f"n{k}" for k in range(1, N_CUTS + 1))
        head = f"""wide AS (
      SELECT et, span_us, {cols} FROM {_wide_view_name(by_type)}
    )"""
    else:
        head = _wide_cte(dialect, by_type)
    return f"""{head},
    pts AS (
      {unpivot}
    )"""


def _wide_view_name(by_type: bool) -> str:
    return "reliagrowth_widet_mv" if by_type else "reliagrowth_wide_mv"


def _wide_view(spark: SparkSession, sf_dir: str, by_type: bool = False) -> None:
    """ONE corpus pass -> checkpointed wide counter table."""
    _views(spark, sf_dir)
    cols = ", ".join(f"n{k}" for k in range(1, N_CUTS + 1))
    df = spark.sql(
        f"WITH {_wide_cte('spark', by_type)} "
        f"SELECT et, span_us, {cols} FROM wide"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_wide_view_name(by_type))


def _fit_cte(dialect: str, by_type: bool = False, staged: bool = False) -> str:
    """Log-log OLS moments over the cutoff points (t in hours)."""
    return f"""{_points_cte(dialect, by_type, staged)},
    lpts AS (
      SELECT et, cut, n,
             {_nq(f'LN(CAST(span_us AS DOUBLE) * cut / {N_CUTS} / 3.6e9)')}
               AS xn,
             {_nq('LN(CAST(n AS DOUBLE))')} AS yn
      FROM pts WHERE n > 0
    ),
    mom AS (
      SELECT et,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(SUM(xn) AS BIGINT) AS sx,
             CAST(SUM(yn) AS BIGINT) AS sy,
             CAST(SUM(xn * yn) AS BIGINT) AS sxy,
             CAST(SUM(xn * xn) AS BIGINT) AS sxx
      FROM lpts GROUP BY et
    ),
    fit AS (
      SELECT et, k,
             (CAST(k AS DOUBLE) * sxy
               - CAST(sx AS DOUBLE) * sy)
               / (CAST(k AS DOUBLE) * sxx
                  - CAST(sx AS DOUBLE) * sx) AS beta,
             (CAST(sy AS DOUBLE) - ((CAST(k AS DOUBLE) * sxy
               - CAST(sx AS DOUBLE) * sy)
               / (CAST(k AS DOUBLE) * sxx
                  - CAST(sx AS DOUBLE) * sx)) * sx) / k / {MICRO}
               AS ln_lambda_q
      FROM mom
    )"""


# ---------------------------------------------------------------------------
# q801 — Duane plot points

def _q801_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_points_cte(dialect, staged=staged)}
    SELECT cut AS cutoff_idx,
           CAST(span_us AS DOUBLE) * cut / {N_CUTS} / 3.6e9 AS t_hours,
           n AS cum_failures,
           CAST(span_us AS DOUBLE) * cut / {N_CUTS} / 3.6e9 / n
             AS cum_mtbf_hours
    FROM pts WHERE n > 0
    ORDER BY cut
    """


@query("q801_duane_points", oracle=_q801_sql("duckdb"))
def q801_duane_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Duane plot: cumulative error count and cumulative MTBF at
    10 span fractions, from ONE aggregate with CASE counters (the
    cutoff grid folds into the pass — no rescan, no window)."""
    _wide_view(spark, sf_dir, by_type=False)
    return spark.sql(_q801_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q802 — power-law fit

def _q802_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_fit_cte(dialect, staged=staged)}
    SELECT k AS n_points,
           beta,
           0.0 + ROUND(EXP(ln_lambda_q), 6) AS lambda_per_hour_pow,
           CASE WHEN beta < 1 THEN 'improving'
                WHEN beta > 1 THEN 'deteriorating'
                ELSE 'stable' END AS verdict
    FROM fit
    """


@query("q802_crow_amsaa_fit", oracle=_q802_sql("duckdb"))
def q802_crow_amsaa_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Crow-AMSAA power-law parameters from the log-log OLS:
    growth exponent beta (the verdict column reads it), and the scale
    lambda (display-rounded EXP). A homogeneous Poisson stream fits
    beta ~ 1 — the test asserts a sane band."""
    _wide_view(spark, sf_dir, by_type=False)
    return spark.sql(_q802_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q803 — cumulative vs instantaneous MTBF

def _q803_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_fit_cte(dialect, staged=staged)},
    endpt AS (
      SELECT et, span_us, n FROM pts WHERE cut = {N_CUTS}
    )
    SELECT e.n AS total_failures,
           CAST(e.span_us AS DOUBLE) / 3.6e9 AS test_hours,
           CAST(e.span_us AS DOUBLE) / 3.6e9 / e.n AS cum_mtbf_hours,
           CAST(e.span_us AS DOUBLE) / 3.6e9 / e.n / f.beta
             AS inst_mtbf_hours,
           f.beta
    FROM endpt e JOIN fit f ON f.et = e.et
    """


@query("q803_mtbf_projection", oracle=_q803_sql("duckdb"))
def q803_mtbf_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-of-test MTBF two ways: the naive cumulative T/N and the
    Crow-AMSAA instantaneous (T/N)/beta — the number that actually
    predicts the NEXT failure gap under the power law."""
    _wide_view(spark, sf_dir, by_type=False)
    return spark.sql(_q803_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q804 — per-type growth comparison

def _q804_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_fit_cte(dialect, by_type=True, staged=staged)}
    SELECT et AS event_type, k AS n_points, beta,
           CASE WHEN beta < 1 THEN 'improving'
                WHEN beta > 1 THEN 'deteriorating'
                ELSE 'stable' END AS verdict
    FROM fit
    ORDER BY et
    """


@query("q804_per_type_growth", oracle=_q804_sql("duckdb"))
def q804_per_type_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event type fitted as its own failure mode — the
    comparison table that says which stream's arrival intensity is
    accelerating. Same one-pass cutoff machinery, keyed by type."""
    _wide_view(spark, sf_dir, by_type=True)
    return spark.sql(_q804_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q805 — fit diagnostics

def _q805_sql(dialect: str, staged: bool = False) -> str:
    return f"""
    WITH {_fit_cte(dialect, staged=staged)}
    SELECT l.cut AS cutoff_idx,
           CAST(l.yn AS DOUBLE) / {MICRO} AS ln_observed,
           f.ln_lambda_q + f.beta * l.xn / CAST({MICRO} AS DOUBLE)
             AS ln_fitted,
           CAST(l.yn AS DOUBLE) / {MICRO}
             - (f.ln_lambda_q + f.beta * l.xn / CAST({MICRO} AS DOUBLE))
             AS log_residual
    FROM lpts l JOIN fit f ON f.et = l.et
    ORDER BY l.cut
    """


@query("q805_duane_residuals", oracle=_q805_sql("duckdb"))
def q805_duane_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cutoff log-residuals of the power-law fit — the curvature
    check that says whether one beta describes the whole test or the
    process changed mid-way. OLS residuals sum to ~0 over the fitted
    points (test-asserted)."""
    _wide_view(spark, sf_dir, by_type=False)
    return spark.sql(_q805_sql("spark", staged=True))
