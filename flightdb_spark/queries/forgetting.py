"""Forgetting-curve batch 177 (q952-q956) — Ebbinghaus-style
re-engagement decay fitted parametrically to the inter-event gaps of
the events log: how fast does the probability a user comes back decay
with time away, what is the half-life, and does a single exponential
actually fit. The nonparametric survival machinery lives in survival2
(Kaplan-Meier, q204); this batch is the PARAMETRIC side a growth team
uses to set reminder timing — exponential hazard, closed-form
log-linear fit, per-type comparison, fit diagnostics and the
censoring audit.

- q952 gap survival: R(t) = share of inter-event gaps exceeding t
  hours, on the bounded hour-bucket table (reverse cumulative via a
  broadcast-hinted inequality join over <= {MAX_H} rows — the q806
  pattern, never a global window);
- q953 exponential fit: ln R(t) = a - lambda*t by OLS over the
  bounded survival points (nano-quantized LN, exact integer-moment
  fit) -> decay rate and half-life;
- q954 per-type half-lives: the same fit partitioned by the type of
  the event the user went quiet AFTER — which behaviors retain;
- q955 fit quality: observed vs fitted R(t) (display-rounded EXP per
  the q679 rule), max and mean absolute deviation — the single-
  exponential adequacy check;
- q956 censoring audit: every user's final open-ended gap is
  right-censored; its share and size against observed gaps bound the
  bias direction of the fit.

100 TB shape: one per-user lag window (user partitions) to gaps, then
everything runs on hour-bucket tables bounded by the {MAX_H}-hour
domain. The fit is a <= {MAX_H}-row integer-moment OLS.

Determinism: gaps are exact integer micros -> integer hour buckets;
survival shares are ratios of exact counts; LN nano-quantizes before
the moment sums (hedonic discipline; DETERMINISM.md LN note); EXP
outputs display-round at 6 dp (q679 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MAX_H = 48
NANO = "1000000000"


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(d: str) -> str:
    return "unix_micros(ts)" if d == "spark" else "epoch_us(ts)"


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _gaps_cte(d: str) -> str:
    hr = _idiv(d, "gap_us", "3600000000")
    return f"""hops AS (
      SELECT user_id, event_type,
             (LEAD(CAST({_us(d)} AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id))
             - CAST({_us(d)} AS BIGINT) AS gap_us
      FROM events
    ),
    gaps AS (
      SELECT user_id, event_type,
             CAST(LEAST({hr}, {MAX_H}) AS BIGINT) AS hr
      FROM hops WHERE gap_us IS NOT NULL
    ),
    hist AS (
      SELECT hr, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM gaps GROUP BY hr
    ),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist),
    surv AS (
      -- R(t) = share of gaps with hr >= t: reverse cumulative via a
      -- broadcast-hinted inequality join over the bounded hour table
      SELECT /*+ BROADCAST(b) */ a.hr,
             CAST(SUM(b.cnt) AS BIGINT) AS n_ge
      FROM hist a JOIN hist b ON b.hr >= a.hr
      GROUP BY a.hr
    )"""


# ---------------------------------------------------------------------------
# q952 — gap survival table


def _q952_sql(d: str) -> str:
    return f"""
    WITH {_gaps_cte(d)}
    SELECT /*+ BROADCAST(t) */ s.hr,
           s.n_ge,
           ROUND(CAST(s.n_ge AS DOUBLE) / t.n, 6) AS retention
    FROM surv s CROSS JOIN tot t
    ORDER BY s.hr
    """


@query("q952_gap_survival", oracle=_q952_sql("duckdb"))
def q952_gap_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw forgetting curve: R(t) = share of inter-event gaps at
    least t hours (hour buckets, {MAX_H}-hour cap). One per-user lag
    window, one hour aggregate, a bounded reverse cumulative — the
    table every parametric fit below reads."""
    _views(spark, sf_dir)
    return spark.sql(_q952_sql("spark"))


# ---------------------------------------------------------------------------
# q953 — exponential fit

_LNQ = f"CAST(FLOOR(LN(CAST({{x}} AS DOUBLE)) * {NANO} + 0.5) AS BIGINT)"


def _fit_cte(d: str) -> str:
    lny = _LNQ.format(x="CAST(s.n_ge AS DOUBLE) / t.n")
    return f"""{_gaps_cte(d)},
    pts AS (
      SELECT /*+ BROADCAST(t) */ s.hr AS x, {lny} AS y
      FROM surv s CROSS JOIN tot t
      WHERE s.n_ge > 0 AND s.hr < {MAX_H}
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts
    ),
    fit AS (
      SELECT n,
             -- slope of ln R on t, in nano-units/hour -> lambda /hr
             CAST(n * sxy - sx * sy AS DOUBLE)
               / (n * sxx - sx * sx) / 1e9 AS slope,
             (CAST(sy AS DOUBLE) / n
              - CAST(n * sxy - sx * sy AS DOUBLE)
                / (n * sxx - sx * sx) * sx / n) / 1e9 AS intercept
      FROM mom
    )"""


def _q953_sql(d: str) -> str:
    return f"""
    WITH {_fit_cte(d)}
    SELECT n AS n_points,
           ROUND(-slope, 6) AS lambda_per_hour,
           ROUND(intercept, 6) AS ln_r0,
           ROUND(0.6931471805599453 / (0.0 - slope), 4) AS half_life_hours
    FROM fit
    """


@query("q953_exponential_fit", oracle=_q953_sql("duckdb"))
def q953_exponential_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exponential forgetting fit: OLS of ln R(t) on t over the
    bounded survival points (LN nano-quantized to exact integers
    before the moment sums), decay rate lambda and the half-life
    ln 2 / lambda — the number a re-engagement campaign schedules
    against."""
    _views(spark, sf_dir)
    return spark.sql(_q953_sql("spark"))


# ---------------------------------------------------------------------------
# q954 — per-type half-lives


def _q954_sql(d: str) -> str:
    hr = _idiv(d, "gap_us", "3600000000")
    lny = _LNQ.format(x="CAST(s.n_ge AS DOUBLE) / tt.n")
    return f"""
    WITH hops AS (
      SELECT user_id, event_type,
             (LEAD(CAST({_us(d)} AS BIGINT)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id))
             - CAST({_us(d)} AS BIGINT) AS gap_us
      FROM events
    ),
    gaps AS (
      SELECT event_type,
             CAST(LEAST({hr}, {MAX_H}) AS BIGINT) AS hr
      FROM hops WHERE gap_us IS NOT NULL
    ),
    hist AS (
      SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM gaps GROUP BY event_type, hr
    ),
    tt AS (
      SELECT event_type, CAST(SUM(cnt) AS BIGINT) AS n
      FROM hist GROUP BY event_type
    ),
    surv AS (
      SELECT a.event_type, a.hr, CAST(SUM(b.cnt) AS BIGINT) AS n_ge
      FROM hist a JOIN hist b
        ON b.event_type = a.event_type AND b.hr >= a.hr
      GROUP BY a.event_type, a.hr
    ),
    pts AS (
      SELECT s.event_type, s.hr AS x, {lny} AS y
      FROM surv s JOIN tt ON tt.event_type = s.event_type
      WHERE s.n_ge > 0 AND s.hr < {MAX_H}
    ),
    mom AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM pts GROUP BY event_type
    )
    SELECT event_type,
           n AS n_points,
           ROUND(-(CAST(n * sxy - sx * sy AS DOUBLE)
                   / (n * sxx - sx * sx) / 1e9), 6) AS lambda_per_hour,
           ROUND(0.6931471805599453
                 / (0.0 - CAST(n * sxy - sx * sy AS DOUBLE)
                    / (n * sxx - sx * sx) / 1e9), 4) AS half_life_hours
    FROM mom
    ORDER BY event_type
    """


@query("q954_type_half_lives", oracle=_q954_sql("duckdb"))
def q954_type_half_lives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Half-life by the activity the user went quiet AFTER: the same
    log-linear fit per event type (the survival inequality join keys
    on type, so every partition stays <= {MAX_H} rows). Which
    behaviors hold attention — the retention-design table."""
    _views(spark, sf_dir)
    return spark.sql(_q954_sql("spark"))


# ---------------------------------------------------------------------------
# q955 — fit quality


def _q955_sql(d: str) -> str:
    return f"""
    WITH {_fit_cte(d)},
    obs AS (
      SELECT /*+ BROADCAST(t) */ s.hr,
             CAST(s.n_ge AS DOUBLE) / t.n AS r_obs
      FROM surv s CROSS JOIN tot t
      WHERE s.hr < {MAX_H}
    ),
    dev AS (
      SELECT /*+ BROADCAST(f) */ o.hr,
             -- display-rounded EXP (q679 rule: half-window >> 1 ulp)
             ROUND(ABS(o.r_obs
                   - (0.0 + ROUND(EXP(f.intercept + f.slope * o.hr), 6))),
                   6) AS adev
      FROM obs o CROSS JOIN fit f
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(MAX(adev), 6) AS max_abs_dev,
           ROUND(CAST(SUM(CAST(adev AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_abs_dev
    FROM dev
    """


@query("q955_fit_quality", oracle=_q955_sql("duckdb"))
def q955_fit_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Is one exponential enough? Observed R(t) against the fitted
    exp(a - lambda t) (EXP display-rounded at 6 dp — the q679
    cross-engine rule), with the max and mean absolute deviation over
    the bounded survival points. Large deviations say the process is
    a mixture — fit per type (q954) instead."""
    _views(spark, sf_dir)
    return spark.sql(_q955_sql("spark"))


# ---------------------------------------------------------------------------
# q956 — censoring audit


def _q956_sql(d: str) -> str:
    return f"""
    WITH anchor AS (
      SELECT CAST(MAX({_us(d)}) AS BIGINT) AS t_end FROM events
    ),
    lastseen AS (
      SELECT user_id, CAST(MAX({_us(d)}) AS BIGINT) AS t_last,
             CAST(COUNT(*) - 1 AS BIGINT) AS n_observed_gaps
      FROM events GROUP BY user_id
    )
    SELECT /*+ BROADCAST(a) */
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_observed_gaps) AS BIGINT) AS n_observed_gaps,
           ROUND(CAST(COUNT(*) AS DOUBLE)
                 / (SUM(n_observed_gaps) + COUNT(*)), 6)
             AS censored_share,
           ROUND(CAST(SUM(a.t_end - t_last) AS DOUBLE)
                 / COUNT(*) / 3600000000.0, 4) AS mean_censored_tail_hours
    FROM lastseen CROSS JOIN anchor a
    """


@query("q956_censoring_audit", oracle=_q956_sql("duckdb"))
def q956_censoring_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What the fit cannot see: every user's final gap is open-ended
    (right-censored at the corpus end). Its share of all spells and
    the mean censored tail bound the direction of the bias — dropping
    censored spells makes the fitted decay LOOK faster than reality.
    One user aggregate and a 1-row anchor broadcast."""
    _views(spark, sf_dir)
    return spark.sql(_q956_sql("spark"))
