"""Media-mix batch 157 (q851-q855) — adstock carryover analysis on
the event stream (clicks as the media pressure, same-day purchase
revenue as the response): the geometric-decay transform marketing
mix models apply before regressing, computed with an 8-day FINITE
window so the carryover is an exact weighted sum (the infinite
recurrence truncates at lambda^8 < 2% for every grid lambda — no
sequential state, no overflow-prone lambda^-t prefix trick):

- q851 the adstocked series for lambda in {0.3, 0.5, 0.7} (decay
  weights inlined as exact Python literals, micro-quantized terms);
- q852 the response regression per lambda: slope and R^2 of daily
  purchase revenue on adstocked clicks — which carryover fits best;
- q853 dose-response quintiles at lambda = 0.5: mean response per
  adstock quintile (exact bounded-rank quintiles) — the saturation
  read;
- q854 the raw lag-correlation table corr(revenue_t, clicks_{t-j})
  for j = 0..7 — the model-free carryover evidence;
- q855 the half-life table per lambda (ln 0.5 / ln lambda, inlined
  literals) with the share of infinite-horizon adstock weight the
  8-day window captures.

100 TB shape: one aggregate to the ~30-row daily spine; adstock and
lag joins are day-index self-joins bounded by the 8-day window (no
global window over the spine — day indexes are datediff arithmetic);
regressions are exact BIGINT moments over <= 30 rows.

Determinism: clicks/revenue exact integers; day index = integer
datediff from the global min date; decay weights exact literals;
adstock terms FLOOR(x + 0.5)-quantized to integer micro-clicks;
moment products sized under 2^53 (q804 lesson); slopes terminal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

K_LAGS = 8
LAMBDAS = [0.3, 0.5, 0.7]


def _lit(x: float) -> str:
    r = repr(x)
    return r if "e" in r else f"{r}e0"


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _weights_values() -> str:
    rows = []
    for lam in LAMBDAS:
        lam_id = int(lam * 10)
        for j in range(K_LAGS):
            rows.append(f"({lam_id}, {j}, CAST({_lit(lam ** j)} AS DOUBLE))")
    return ",\n      ".join(rows)


def _daily_cte(dialect: str) -> str:
    return f"""raw AS (
      SELECT CAST(ts AS DATE) AS d, event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    d0 AS (SELECT CAST(MIN(d) AS DATE) AS dmin FROM raw),
    daily AS (
      SELECT /*+ BROADCAST(z) */
             CAST({_days(dialect, 'z.dmin', 'r.d')} AS BIGINT) AS t,
             CAST(SUM(CASE WHEN r.event_type = 'click' THEN 1 ELSE 0 END)
                  AS BIGINT) AS clicks,
             CAST(SUM(CASE WHEN r.event_type = 'purchase' THEN r.cents
                      ELSE 0 END) AS BIGINT) AS rev
      FROM raw r CROSS JOIN d0 z
      GROUP BY CAST({_days(dialect, 'z.dmin', 'r.d')} AS BIGINT)
    )"""


def _adstock_cte(dialect: str) -> str:
    """Micro-quantized adstock per (lambda, day) via bounded lag join."""
    return f"""{_daily_cte(dialect)},
    w(lam_id, j, wgt) AS (VALUES
      {_weights_values()}
    ),
    ad AS (
      SELECT /*+ BROADCAST(w) */ w.lam_id, a.t,
             CAST(SUM(CAST(FLOOR(w.wgt * b.clicks * 1000000 + 0.5)
                  AS BIGINT)) AS BIGINT) AS adstock_u,
             CAST(MAX(a.rev) AS BIGINT) AS rev
      FROM daily a
      JOIN daily b ON b.t BETWEEN a.t - {K_LAGS - 1} AND a.t
      JOIN w ON w.j = a.t - b.t
      GROUP BY w.lam_id, a.t
    )"""


# ---------------------------------------------------------------------------
# q851 — adstocked series

def _q851_sql(dialect: str) -> str:
    return f"""
    WITH {_adstock_cte(dialect)}
    SELECT CAST(lam_id AS DOUBLE) / 10 AS lam, t AS day_idx,
           CAST(adstock_u AS DOUBLE) / 1000000 AS adstocked_clicks,
           rev AS purchase_cents
    FROM ad
    ORDER BY lam_id, t
    """


@query("q851_adstock_series", oracle=_q851_sql("duckdb"))
def q851_adstock_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adstocked click pressure at three decay rates — an exact
    8-lag weighted sum per day via a bounded day-index self-join
    (never a window over the spine), micro-quantized terms."""
    _views(spark, sf_dir)
    return spark.sql(_q851_sql("spark"))


# ---------------------------------------------------------------------------
# q852 — response regression per lambda

def _q852_sql(dialect: str) -> str:
    return f"""
    WITH {_adstock_cte(dialect)},
    scaled AS (
      SELECT lam_id, t,
             CAST(FLOOR(CAST(adstock_u AS DOUBLE) / 1000000 + 0.5)
                  AS BIGINT) AS x,
             CAST(FLOOR(CAST(rev AS DOUBLE) / 100 + 0.5) AS BIGINT) AS y
      FROM ad
    ),
    mom AS (
      SELECT lam_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM scaled GROUP BY lam_id
    )
    SELECT CAST(lam_id AS DOUBLE) / 10 AS lam,
           n AS n_days,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
             AS response_slope,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS r_squared
    FROM mom
    ORDER BY lam_id
    """


@query("q852_adstock_regression", oracle=_q852_sql("duckdb"))
def q852_adstock_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase revenue (in whole dollars) regressed on the
    adstocked clicks at each decay rate: slope and R^2 — the carryover
    the data actually supports. Integer moments on a 30-row spine."""
    _views(spark, sf_dir)
    return spark.sql(_q852_sql("spark"))


# ---------------------------------------------------------------------------
# q853 — dose-response quintiles

_MID_MV = "adstock_mid_mv"


def _mid_view(spark: SparkSession, sf_dir: str) -> None:
    """r10 P3 staging: q853's `mid` (the ~30-row lambda=0.5 adstock
    spine) is referenced 3x (cnt + both rank-join sides) and each
    reference re-expanded ad -> daily (self-joined) -> the events
    corpus under Catalyst inlining (12 duplicate events scans in the
    static plan). ONE corpus pass checkpoints the calendar-bounded
    spine; the oracle keeps the single-statement form."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_adstock_cte('spark')} "
        "SELECT t, adstock_u, rev FROM ad WHERE lam_id = 5"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_MID_MV)


def _q853_sql(dialect: str, staged: bool = False) -> str:
    mid_cte = (
        f"mid AS (\n      SELECT t, adstock_u, rev FROM {_MID_MV}\n    )"
        if staged
        else "mid AS (\n      SELECT t, adstock_u, rev FROM ad WHERE lam_id = 5\n    )"
    )
    head = "" if staged else f"{_adstock_cte(dialect)},\n    "
    return f"""
    WITH {head}{mid_cte},
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM mid),
    ranked AS (
      SELECT /*+ BROADCAST(z) */ x.t, x.adstock_u, x.rev,
             CAST(SUM(CASE WHEN z.adstock_u < x.adstock_u
                      OR (z.adstock_u = x.adstock_u AND z.t <= x.t)
                      THEN 1 ELSE 0 END) AS BIGINT) AS rk,
             CAST(MAX(c.n) AS BIGINT) AS n
      FROM mid x JOIN mid z ON 1 = 1 CROSS JOIN cnt c
      GROUP BY x.t, x.adstock_u, x.rev
    ),
    binned AS (
      SELECT CAST(LEAST(CAST(FLOOR((rk - 1) * 5 / CAST(n AS DOUBLE))
                  AS BIGINT), 4) + 1 AS BIGINT) AS quintile,
             adstock_u, rev
      FROM ranked
    )
    SELECT quintile,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(adstock_u) AS DOUBLE) / 1000000 / COUNT(*)
             AS mean_adstock,
           CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS mean_revenue_cents
    FROM binned
    GROUP BY quintile
    ORDER BY quintile
    """


@query("q853_dose_response", oracle=_q853_sql("duckdb"))
def q853_dose_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean purchase revenue per adstock quintile (lambda = 0.5):
    the saturation read — does more accumulated pressure keep paying?
    Quintiles from an exact bounded rank over the ~30-day spine."""
    _mid_view(spark, sf_dir)
    return spark.sql(_q853_sql("spark", staged=True))


# ---------------------------------------------------------------------------
# q854 — lag-correlation table

def _q854_sql(dialect: str) -> str:
    return f"""
    WITH {_daily_cte(dialect)},
    lags(j) AS (VALUES {", ".join(f"({j})" for j in range(K_LAGS))}),
    paired AS (
      SELECT /*+ BROADCAST(l) */ l.j,
             a.rev AS y, b.clicks AS x
      FROM daily a
      JOIN lags l ON 1 = 1
      JOIN daily b ON b.t = a.t - l.j
    ),
    mom AS (
      SELECT j, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(CAST(FLOOR(y / 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS sy,
             CAST(SUM(x * CAST(FLOOR(y / 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(CAST(FLOOR(y / 100.0 + 0.5) AS BIGINT)
                  * CAST(FLOOR(y / 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS syy
      FROM paired GROUP BY j
    )
    SELECT j AS lag_days, n AS n_pairs,
           (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy))
             AS lag_correlation
    FROM mom
    ORDER BY j
    """


@query("q854_lag_correlations", oracle=_q854_sql("duckdb"))
def q854_lag_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-free carryover: corr(revenue_t, clicks_{t-j}) for
    j = 0..7 via a bounded day-index join — the evidence the adstock
    decay grid should match. Dollar-quantized revenue keeps moment
    products exact."""
    _views(spark, sf_dir)
    return spark.sql(_q854_sql("spark"))


# ---------------------------------------------------------------------------
# q855 — half-life table

def _q855_rows() -> str:
    import math

    rows = []
    for lam in LAMBDAS:
        lam_id = int(lam * 10)
        half_life = math.log(0.5) / math.log(lam)
        window_share = (1 - lam**K_LAGS) / (1 / (1 - lam)) * (1 / (1 - lam))
        # share of infinite-horizon weight inside the 8-day window:
        window_share = 1 - lam**K_LAGS
        rows.append(
            f"({lam_id}, CAST({_lit(half_life)} AS DOUBLE), "
            f"CAST({_lit(window_share)} AS DOUBLE))"
        )
    return ",\n      ".join(rows)


def _q855_sql(dialect: str) -> str:
    return f"""
    WITH {_daily_cte(dialect)},
    hl(lam_id, half_life_days, window_weight_share) AS (VALUES
      {_q855_rows()}
    ),
    span AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
    )
    SELECT CAST(h.lam_id AS DOUBLE) / 10 AS lam,
           h.half_life_days,
           h.window_weight_share,
           s.n_days AS observed_days
    FROM hl h CROSS JOIN span s
    ORDER BY h.lam_id
    """


@query("q855_carryover_half_life", oracle=_q855_sql("duckdb"))
def q855_carryover_half_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decay-grid reference card: half-life ln(0.5)/ln(lambda) and
    the share of infinite-horizon adstock weight the 8-day window
    captures (1 - lambda^8 >= 93% for the whole grid — the truncation
    is honest), joined with the observed spine length."""
    _views(spark, sf_dir)
    return spark.sql(_q855_sql("spark"))
