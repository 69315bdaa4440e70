"""Metrics-layer batch 93 (q531-q535) — the semantic-layer
calculations every BI deployment runs daily, beside q300 (KPI
snapshot), q321 (price-volume-mix), q298 (seasonal anomaly):

- q531 MoM/YoY growth: monthly revenue with month-over-month and
  year-over-year deltas on a complete month spine (missing months
  surface as zeros, not silently skipped rows);
- q532 delta-method ratio CI: the per-user purchase-rate ratio
  (purchase events / all events) with the delta-method variance
  Var(X/Y) ~ (mx/my)^2 (vx/mx^2 - 2 cov/(mx my) + vy/my^2) / n from
  exact moments — the CI BI tools fake by bootstrapping;
- q533 contribution analysis: the year-over-year revenue change
  decomposed per priority segment into RATE (avg order value) and
  MIX (order-share) contributions that sum exactly to the total
  change — "why did the metric move";
- q534 forecast reconciliation: naive per-segment forecasts vs the
  top-down split of the total forecast by historical proportions —
  the coherence gap hierarchical forecasting closes;
- q535 anomaly attribution: the per-segment z-scores behind one
  anomalous month — which segment drove the spike, ranked.

Determinism: revenue is integer cents; all moments accumulate in
DECIMAL and convert to DOUBLE once (rule 1); contribution identities
are exact in cents; z-scores are straight-line expressions over
identical doubles.

100 TB shapes: everything derives from ONE (month[, segment])
aggregate of orders — a single keyed shuffle — followed by bounded
calendar-table arithmetic (rule 15 windows over month spines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

O_CENTS = "CAST(FLOOR(o_totalprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
BASE = 1995 * 12
N_MONTHS = 80  # 1995-01 .. 2001-08
YR_A, YR_B = 1996, 1997  # contribution-analysis years
Z_MONTH = 12  # q535 target month index (1996-01)


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _m() -> str:
    return f"(year(o_orderdate) * 12 + month(o_orderdate) - 1 - {BASE})"


def _spine(dialect: str) -> str:
    if dialect == "spark":
        return f"(SELECT explode(sequence(0, {N_MONTHS - 1})) AS m)"
    return f"(SELECT unnest(range(0, {N_MONTHS})) AS m)"


# ---------------------------------------------------------------------------
# q531 — MoM / YoY


def _yoy_sql(dialect: str) -> str:
    return f"""
    WITH monthly AS (
      SELECT {_m()} AS m, CAST(SUM({O_CENTS}) AS BIGINT) AS rev
      FROM orders GROUP BY {_m()}
    ),
    spine AS (
      SELECT s.m, COALESCE(mo.rev, 0) AS rev
      FROM {_spine(dialect)} s LEFT JOIN monthly mo ON mo.m = s.m
    ),
    shifted AS (
      SELECT m, rev,
             LAG(rev, 1) OVER (ORDER BY m) AS prev_m,
             LAG(rev, 12) OVER (ORDER BY m) AS prev_y
      FROM spine
    )
    SELECT m AS month_index, rev AS revenue_cents,
           CASE WHEN prev_m > 0
                THEN ROUND(CAST(rev - prev_m AS DOUBLE) / prev_m, 4) END
             AS mom_growth,
           CASE WHEN prev_y > 0
                THEN ROUND(CAST(rev - prev_y AS DOUBLE) / prev_y, 4) END
             AS yoy_growth
    FROM shifted
    WHERE m >= 12 AND m < 36
    """


@query("q531_mom_yoy", oracle=_yoy_sql("duck"))
def q531_mom_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue growth for
    1996-1997 on a COMPLETE month spine (zero-revenue months stay
    visible — the silent-gap bug q519's spine pattern exists to
    kill). One monthly aggregate; lags run over the 80-row spine
    (calendar-bounded)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_yoy_sql("spark"))


# ---------------------------------------------------------------------------
# q532 — delta-method ratio CI


def _delta_sql(dialect: str) -> str:
    return f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY user_id
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(y * y AS DECIMAL(38,0))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(x * y AS DECIMAL(38,0))) AS DOUBLE) AS sxy
      FROM per_user
    ),
    parts AS (
      SELECT n, sx / n AS mx, sy / n AS my,
             (sxx - sx * sx / n) / (n - 1) AS vx,
             (syy - sy * sy / n) / (n - 1) AS vy,
             (sxy - sx * sy / n) / (n - 1) AS cxy
      FROM mom
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND(mx / my, 6) AS ratio,
           ROUND((mx / my) * (mx / my)
                 * (vx / (mx * mx) - 2 * cxy / (mx * my) + vy / (my * my))
                 / n, 10) AS delta_var,
           ROUND(mx / my - 1.959964 * SQRT((mx / my) * (mx / my)
                 * (vx / (mx * mx) - 2 * cxy / (mx * my) + vy / (my * my))
                 / n), 6) AS ci_lo,
           ROUND(mx / my + 1.959964 * SQRT((mx / my) * (mx / my)
                 * (vx / (mx * mx) - 2 * cxy / (mx * my) + vy / (my * my))
                 / n), 6) AS ci_hi
    FROM parts
    """


@query("q532_delta_method_ci", oracle=_delta_sql("duck"))
def q532_delta_method_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-method CI for a ratio-of-means metric (per-user purchase
    events over all events — the 'ratio metric' every experiment
    platform mishandles by treating users as independent rows):
    Var(X/Y) from exact integer moments via the first-order Taylor
    expansion, with the 1.96 normal quantile as a literal. One
    per-user aggregate -> one moment row -> straight-line closed
    form."""
    _views(spark, sf_dir, "events")
    return spark.sql(_delta_sql("spark"))


# ---------------------------------------------------------------------------
# q533 — contribution analysis


def _contrib_sql(dialect: str) -> str:
    return f"""
    WITH seg AS (
      SELECT o_orderpriority AS p,
             year(o_orderdate) AS yr,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM({O_CENTS}) AS BIGINT) AS rev
      FROM orders
      WHERE year(o_orderdate) IN ({YR_A}, {YR_B})
      GROUP BY o_orderpriority, year(o_orderdate)
    ),
    tot AS (
      SELECT yr, CAST(SUM(n) AS BIGINT) AS n_tot,
             CAST(SUM(rev) AS BIGINT) AS rev_tot
      FROM seg GROUP BY yr
    ),
    both_ AS (
      SELECT a.p,
             a.n AS n_a, b.n AS n_b, a.rev AS rev_a, b.rev AS rev_b,
             ta.n_tot AS na_tot, tb.n_tot AS nb_tot
      FROM (SELECT * FROM seg WHERE yr = {YR_A}) a
      JOIN (SELECT * FROM seg WHERE yr = {YR_B}) b ON b.p = a.p
      CROSS JOIN (SELECT n_tot FROM tot WHERE yr = {YR_A}) ta
      CROSS JOIN (SELECT n_tot FROM tot WHERE yr = {YR_B}) tb
    )
    SELECT p AS segment,
           rev_b - rev_a AS total_change_cents,
           -- rate effect: volume held at year A, order value moves
           CAST(ROUND(n_a * (CAST(rev_b AS DOUBLE) / n_b
                             - CAST(rev_a AS DOUBLE) / n_a), 0) AS BIGINT)
             AS rate_effect_cents,
           -- volume effect: order value held at year B
           CAST(ROUND((n_b - n_a) * (CAST(rev_b AS DOUBLE) / n_b), 0)
                AS BIGINT) AS volume_effect_cents
    FROM both_
    """


@query("q533_contribution_analysis", oracle=_contrib_sql("duck"))
def q533_contribution_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis of the 1996->1997 revenue change per
    priority segment: rate effect (order count held, avg order value
    moves) + volume effect (value held at the new level, count moves)
    — the exact two-term decomposition (rate + volume = total change,
    up to the half-cent rounding of the two reported effects; q321 is
    the three-term price-volume-mix cousin on products). One
    (segment, year) aggregate; all else is 5-row arithmetic."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_contrib_sql("spark"))


# ---------------------------------------------------------------------------
# q534 — forecast reconciliation


def _reconcile_sql(dialect: str) -> str:
    return f"""
    WITH seg AS (
      SELECT o_orderpriority AS p, {_m()} AS m,
             CAST(SUM({O_CENTS}) AS BIGINT) AS rev
      FROM orders WHERE {_m()} BETWEEN 0 AND 23
      GROUP BY o_orderpriority, {_m()}
    ),
    hist AS (SELECT p, rev, m FROM seg WHERE m < 12),
    bottom_fc AS (
      -- naive bottom-up forecast: each segment's year-1 monthly mean
      SELECT p, CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE) / 12 AS fc
      FROM hist GROUP BY p
    ),
    top_fc AS (
      SELECT CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE) / 12 AS fc
      FROM hist
    ),
    props AS (
      SELECT h.p,
             CAST(SUM(CAST(h.rev AS DECIMAL(38,0))) AS DOUBLE)
               / (SELECT CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE)
                  FROM hist) AS share
      FROM hist h GROUP BY h.p
    ),
    actual AS (
      SELECT p, CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DOUBLE) / 12 AS act
      FROM seg WHERE m >= 12 GROUP BY p
    )
    SELECT b.p AS segment,
           ROUND(b.fc / 100, 2) AS bottom_up_fc,
           ROUND(t.fc * pr.share / 100, 2) AS top_down_fc,
           ROUND(a.act / 100, 2) AS actual_mean,
           ROUND(ABS(b.fc - a.act) / 100, 2) AS bu_abs_err,
           ROUND(ABS(t.fc * pr.share - a.act) / 100, 2) AS td_abs_err
    FROM bottom_fc b
    JOIN props pr ON pr.p = b.p
    JOIN actual a ON a.p = b.p
    CROSS JOIN top_fc t
    """


@query("q534_forecast_reconciliation", oracle=_reconcile_sql("duck"))
def q534_forecast_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical-forecast reconciliation audit: per-segment naive
    forecasts (year-1 monthly means) vs the TOP-DOWN split of the
    total forecast by historical revenue shares, both scored against
    year-2 actuals — bottom-up is coherent by construction; the table
    shows what the top-down proportions cost per segment. All from
    one (segment, month) aggregate; forecasts are DECIMAL means."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_reconcile_sql("spark"))


# ---------------------------------------------------------------------------
# q535 — anomaly attribution


def _attrib_sql(dialect: str) -> str:
    return f"""
    WITH seg AS (
      SELECT o_orderpriority AS p, {_m()} AS m,
             CAST(SUM({O_CENTS}) AS BIGINT) AS rev
      FROM orders WHERE {_m()} BETWEEN 0 AND {Z_MONTH}
      GROUP BY o_orderpriority, {_m()}
    ),
    base AS (
      SELECT p,
             CAST(SUM(CASE WHEN m < {Z_MONTH}
                      THEN CAST(rev AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
               / {Z_MONTH} AS mu,
             CAST(SUM(CASE WHEN m < {Z_MONTH}
                      THEN CAST(rev AS DECIMAL(38,0))
                           * CAST(rev AS DECIMAL(38,0)) ELSE 0 END) AS DOUBLE)
               / {Z_MONTH} AS m2,
             MAX(CASE WHEN m = {Z_MONTH} THEN rev END) AS target
      FROM seg GROUP BY p
    )
    SELECT p AS segment,
           CAST(target AS BIGINT) AS target_rev_cents,
           ROUND(mu, 2) AS baseline_mean,
           ROUND((target - mu)
                 / SQRT(GREATEST(m2 - mu * mu, CAST(1.0 AS DOUBLE))), 4)
             AS z_score,
           CAST(CAST(target AS BIGINT) - CAST(ROUND(mu, 0) AS BIGINT)
                AS BIGINT) AS delta_vs_baseline_cents
    FROM base
    """


@query("q535_anomaly_attribution", oracle=_attrib_sql("duck"))
def q535_anomaly_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly attribution for one target month: each segment's
    revenue z-score against its own 12-month baseline plus the raw
    delta — the per-segment breakdown that answers 'which segment
    drove the spike' the moment q298's detector fires. One (segment,
    month) aggregate; baseline moments are DECIMAL-exact; the
    GREATEST variance floor keeps a constant segment from dividing
    by zero."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_attrib_sql("spark"))
