"""Diffusion-of-innovation batch 191 (q1022-q1026) — the Bass (1969)
new-product diffusion model and its Verhulst-logistic sibling replayed
against the empirical adoption curve of the customer base (first-order
week per customer): the marketing-science view of growth curves that
also models dataset-source saturation in corpus collection.

The empirical series is exact integers (weekly new adopters, week =
days-since-1995-01-01 // 7). The model recurrences are inherently
sequential IEEE double chains, so they run per-series in Arrow-batched
applyInPandas (the q261 Holt pattern) with p/q/r constants inlined via
repr() into the ORACLE's recursive CTE — both engines execute the
identical operation sequence, states match bit-for-bit, and the
micro-quantized outputs hash-match:

- q1022 empirical adoption curve: weekly new adopters, cumulative,
  exact cumulative-share rationals (pure SQL both engines);
- q1023 Bass replay (literal p=0.003, q=0.25, M = eventual adopters):
  nhat_t = (p + q N_t / M)(M - N_t) walked over the dense week spine,
  actual-vs-model with milli-quantized model values;
- q1024 logistic (Verhulst) replay: nhat_t = r N_t (1 - N_t / M),
  seeded N_1 = actual week-0 adopters, same machinery;
- q1025 Bass (p, q) grid tournament: 9 literal cells replayed, SSE in
  EXACT milli-unit integers (residuals quantized before squaring so
  the sum is order-independent), winner by exact integer argmin;
- q1026 peak-week diagnostics: empirical argmax week vs the replayed
  Bass model's argmax week and the closed-form-free comparison of
  time-to-half-saturation — one summary row.

100 TB shape: ONE orders shuffle to (custkey, min date), one weekly
census (<= ~350 calendar rows); Python sees only the bounded weekly
series. The recursion length is calendar-bounded, not data-bounded.

Determinism: integer adopter counts; repr-inlined double constants;
FLOOR(x*1000+0.5) milli-quantization (half-up, both engines);
argmax/argmin tie-break on week / grid order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

ANCHOR = "1995-01-01"
BASS_P = 0.003
BASS_Q = 0.25
LOGI_R = 0.22
GRID = [(p, q) for p in (0.001, 0.003, 0.009) for q in (0.15, 0.25, 0.4)]


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _weekly_cte(d: str) -> str:
    """(wk, adopters) weekly new-adopter census — exact integers."""
    if d == "spark":
        wk = (
            f"CAST(datediff(CAST(first_d AS DATE), DATE '{ANCHOR}') AS BIGINT)"
            " div 7"
        )
    else:
        wk = (
            f"date_diff('day', TIMESTAMP '{ANCHOR} 00:00:00', first_d) // 7"
        )
    return f"""firsts AS (
      SELECT o_custkey, MIN(o_orderdate) AS first_d
      FROM orders GROUP BY o_custkey
    ),
    weekly AS (
      SELECT CAST({wk} AS BIGINT) AS wk,
             CAST(COUNT(*) AS BIGINT) AS adopters
      FROM firsts GROUP BY 1
    )"""


def _q1022_sql(d: str) -> str:
    return f"""
    WITH {_weekly_cte(d)},
    tot AS (SELECT CAST(SUM(adopters) AS BIGINT) AS m FROM weekly)
    SELECT w.wk, w.adopters,
           CAST(SUM(w.adopters) OVER (ORDER BY w.wk
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_adopters,
           t.m AS eventual_adopters,
           CAST(SUM(w.adopters) OVER (ORDER BY w.wk
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / t.m AS cum_share
    FROM weekly w CROSS JOIN tot t
    ORDER BY w.wk
    """


@query("q1022_adoption_curve", oracle=_q1022_sql("duckdb"))
def q1022_adoption_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The empirical adoption curve: weekly first-purchase counts,
    cumulative adopters and cumulative share — the series every
    diffusion model below is judged against. The cumulative window
    runs over the calendar-bounded weekly aggregate (~350 rows), the
    q339 class."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_q1022_sql("spark"))


def _milli(x: float) -> float:
    return math.floor(x * 1000.0 + 0.5) / 1000.0


def _bass_replay(weeks, adopters, p: float, q: float, m: int):
    """Walk Bass over the dense spine 0..max(wk). Returns rows of
    (wk, actual, nhat_milli, cum_model_milli). Pure left-to-right IEEE
    doubles — the exact operation sequence the oracle's recursive CTE
    replays."""
    by_wk = dict(zip(weeks, adopters))
    wmax = max(weeks)
    rows = []
    n_cum = 0.0
    for t in range(0, int(wmax) + 1):
        nhat = (p + q * n_cum / m) * (m - n_cum)
        rows.append((t, int(by_wk.get(t, 0)), _milli(nhat), _milli(n_cum + nhat)))
        n_cum = n_cum + nhat
    return rows


_BASS_SCHEMA = "wk bigint, actual bigint, nhat double, cum_model double"


@query(
    "q1023_bass_replay",
    oracle=f"""
    WITH RECURSIVE {{weekly}},
    tot AS (SELECT CAST(SUM(adopters) AS BIGINT) AS m,
                   CAST(MAX(wk) AS BIGINT) AS wmax FROM weekly),
    bass AS (
      SELECT CAST(0 AS BIGINT) AS wk,
             (CAST({BASS_P!r} AS DOUBLE)
              + CAST({BASS_Q!r} AS DOUBLE) * 0.0 / t.m) * (t.m - 0.0) AS nhat,
             CAST(0.0 AS DOUBLE) AS n_cum
      FROM tot t
      UNION ALL
      SELECT b.wk + 1,
             (CAST({BASS_P!r} AS DOUBLE)
              + CAST({BASS_Q!r} AS DOUBLE) * (b.n_cum + b.nhat) / t.m)
               * (t.m - (b.n_cum + b.nhat)),
             b.n_cum + b.nhat
      FROM bass b CROSS JOIN tot t
      WHERE b.wk < t.wmax
    )
    SELECT b.wk,
           CAST(COALESCE(w.adopters, 0) AS BIGINT) AS actual,
           CAST(CAST(FLOOR(b.nhat * 1000.0 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000.0 AS nhat,
           CAST(CAST(FLOOR((b.n_cum + b.nhat) * 1000.0 + 0.5) AS BIGINT)
                AS DOUBLE) / 1000.0 AS cum_model
    FROM bass b LEFT JOIN weekly w ON w.wk = b.wk
    ORDER BY b.wk
    """.replace("{weekly}", _weekly_cte("duckdb")),
)
def q1023_bass_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass-diffusion replay at literal (p=0.003, q=0.25) with the
    data-derived market size M: the model's weekly adoption curve next
    to the actual one. The recurrence runs in ONE applyInPandas group
    over the bounded weekly series (the q261 pattern); the oracle's
    recursive CTE replays the identical IEEE chain with repr-inlined
    constants."""
    _views(spark, sf_dir, "orders")
    weekly = spark.sql(f"WITH {_weekly_cte('spark')} SELECT wk, adopters FROM weekly")

    def _apply(pdf):
        import pandas as pd

        m = int(pdf["adopters"].sum())
        rows = _bass_replay(
            pdf["wk"].tolist(), pdf["adopters"].tolist(), BASS_P, BASS_Q, m
        )
        return pd.DataFrame(
            rows, columns=["wk", "actual", "nhat", "cum_model"]
        )

    return (
        weekly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: _apply(pdf), schema=_BASS_SCHEMA)
        .orderBy("wk")
    )


def _logistic_replay(weeks, adopters, r: float, m: int):
    by_wk = dict(zip(weeks, adopters))
    wmax = max(weeks)
    rows = []
    n_cum = float(by_wk.get(0, 0))  # seed: week-0 actual adopters
    for t in range(1, int(wmax) + 1):
        nhat = r * n_cum * (1.0 - n_cum / m)
        rows.append((t, int(by_wk.get(t, 0)), _milli(nhat), _milli(n_cum + nhat)))
        n_cum = n_cum + nhat
    return rows


@query(
    "q1024_logistic_replay",
    oracle=f"""
    WITH RECURSIVE {{weekly}},
    tot AS (SELECT CAST(SUM(adopters) AS BIGINT) AS m,
                   CAST(MAX(wk) AS BIGINT) AS wmax FROM weekly),
    seed AS (SELECT CAST(COALESCE(
               (SELECT adopters FROM weekly WHERE wk = 0), 0) AS DOUBLE)
             AS n0),
    logi AS (
      SELECT CAST(1 AS BIGINT) AS wk,
             CAST({LOGI_R!r} AS DOUBLE) * s.n0 * (1.0 - s.n0 / t.m) AS nhat,
             s.n0 AS n_cum
      FROM seed s CROSS JOIN tot t
      UNION ALL
      SELECT l.wk + 1,
             CAST({LOGI_R!r} AS DOUBLE) * (l.n_cum + l.nhat)
               * (1.0 - (l.n_cum + l.nhat) / t.m),
             l.n_cum + l.nhat
      FROM logi l CROSS JOIN tot t
      WHERE l.wk < t.wmax
    )
    SELECT l.wk,
           CAST(COALESCE(w.adopters, 0) AS BIGINT) AS actual,
           CAST(CAST(FLOOR(l.nhat * 1000.0 + 0.5) AS BIGINT) AS DOUBLE)
             / 1000.0 AS nhat,
           CAST(CAST(FLOOR((l.n_cum + l.nhat) * 1000.0 + 0.5) AS BIGINT)
                AS DOUBLE) / 1000.0 AS cum_model
    FROM logi l LEFT JOIN weekly w ON w.wk = l.wk
    ORDER BY l.wk
    """.replace("{weekly}", _weekly_cte("duckdb")),
)
def q1024_logistic_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verhulst-logistic replay at literal r=0.22, seeded with the
    actual week-0 adopters: the S-curve with no innovation term — its
    slow takeoff vs Bass's p-driven jumpstart is the comparison
    q1025 quantifies. Same applyInPandas / recursive-CTE machinery as
    q1023."""
    _views(spark, sf_dir, "orders")
    weekly = spark.sql(f"WITH {_weekly_cte('spark')} SELECT wk, adopters FROM weekly")

    def _apply(pdf):
        import pandas as pd

        m = int(pdf["adopters"].sum())
        rows = _logistic_replay(
            pdf["wk"].tolist(), pdf["adopters"].tolist(), LOGI_R, m
        )
        return pd.DataFrame(rows, columns=["wk", "actual", "nhat", "cum_model"])

    return (
        weekly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: _apply(pdf), schema=_BASS_SCHEMA)
        .orderBy("wk")
    )


def _grid_values() -> str:
    return ", ".join(f"({p!r}, {q!r})" for p, q in GRID)


_SSE_SCHEMA = "p double, q double, sse_milli bigint, rk int, is_winner int"


@query(
    "q1025_bass_grid_tournament",
    oracle=f"""
    WITH RECURSIVE {{weekly}},
    tot AS (SELECT CAST(SUM(adopters) AS BIGINT) AS m,
                   CAST(MAX(wk) AS BIGINT) AS wmax FROM weekly),
    grid(p, q) AS (VALUES {{grid}}),
    bass AS (
      SELECT g.p, g.q, CAST(0 AS BIGINT) AS wk,
             (g.p + g.q * 0.0 / t.m) * (t.m - 0.0) AS nhat,
             CAST(0.0 AS DOUBLE) AS n_cum
      FROM grid g CROSS JOIN tot t
      UNION ALL
      SELECT b.p, b.q, b.wk + 1,
             (b.p + b.q * (b.n_cum + b.nhat) / t.m)
               * (t.m - (b.n_cum + b.nhat)),
             b.n_cum + b.nhat
      FROM bass b CROSS JOIN tot t
      WHERE b.wk < t.wmax
    ),
    resid AS (
      SELECT b.p, b.q,
             CAST(FLOOR(b.nhat * 1000.0 + 0.5) AS BIGINT)
               - CAST(COALESCE(w.adopters, 0) AS BIGINT) * 1000 AS r_milli
      FROM bass b LEFT JOIN weekly w ON w.wk = b.wk
    ),
    sse AS (
      SELECT p, q, CAST(SUM(r_milli * r_milli) AS BIGINT) AS sse_milli
      FROM resid GROUP BY p, q
    )
    SELECT p, q, sse_milli,
           CAST(ROW_NUMBER() OVER (ORDER BY sse_milli, p, q) AS INT) AS rk,
           CAST(CASE WHEN ROW_NUMBER() OVER (ORDER BY sse_milli, p, q) = 1
                THEN 1 ELSE 0 END AS INT) AS is_winner
    FROM sse
    ORDER BY rk
    """.replace("{weekly}", _weekly_cte("duckdb")).replace(
        "{grid}", _grid_values()
    ),
)
def q1025_bass_grid_tournament(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass calibration by literal (p, q) grid search: nine replays,
    SSE carried as EXACT milli-unit integers (residuals quantized
    BEFORE squaring, so the per-cell sum is order-independent and the
    argmin is an exact integer comparison). The tournament that picks
    which diffusion story the adoption data tells."""
    _views(spark, sf_dir, "orders")
    weekly = spark.sql(f"WITH {_weekly_cte('spark')} SELECT wk, adopters FROM weekly")

    def _apply(pdf):
        import pandas as pd

        m = int(pdf["adopters"].sum())
        by_wk = dict(zip(pdf["wk"].tolist(), pdf["adopters"].tolist()))
        wmax = int(max(by_wk))
        cells = []
        for p, q in GRID:
            n_cum = 0.0
            sse = 0
            for t in range(0, wmax + 1):
                nhat = (p + q * n_cum / m) * (m - n_cum)
                r_milli = int(math.floor(nhat * 1000.0 + 0.5)) - int(
                    by_wk.get(t, 0)
                ) * 1000
                sse += r_milli * r_milli
                n_cum = n_cum + nhat
            cells.append((p, q, sse))
        cells.sort(key=lambda c: (c[2], c[0], c[1]))
        rows = [
            (p, q, sse, rk + 1, 1 if rk == 0 else 0)
            for rk, (p, q, sse) in enumerate(cells)
        ]
        return pd.DataFrame(
            rows, columns=["p", "q", "sse_milli", "rk", "is_winner"]
        )

    return (
        weekly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: _apply(pdf), schema=_SSE_SCHEMA)
        .orderBy("rk")
    )


_PEAK_SCHEMA = (
    "empirical_peak_wk bigint, model_peak_wk bigint, "
    "empirical_half_wk bigint, model_half_wk bigint, m bigint"
)


@query(
    "q1026_peak_week",
    oracle=f"""
    WITH RECURSIVE {{weekly}},
    tot AS (SELECT CAST(SUM(adopters) AS BIGINT) AS m,
                   CAST(MAX(wk) AS BIGINT) AS wmax FROM weekly),
    bass AS (
      SELECT CAST(0 AS BIGINT) AS wk,
             (CAST({BASS_P!r} AS DOUBLE)
              + CAST({BASS_Q!r} AS DOUBLE) * 0.0 / t.m) * (t.m - 0.0) AS nhat,
             CAST(0.0 AS DOUBLE) AS n_cum
      FROM tot t
      UNION ALL
      SELECT b.wk + 1,
             (CAST({BASS_P!r} AS DOUBLE)
              + CAST({BASS_Q!r} AS DOUBLE) * (b.n_cum + b.nhat) / t.m)
               * (t.m - (b.n_cum + b.nhat)),
             b.n_cum + b.nhat
      FROM bass b CROSS JOIN tot t
      WHERE b.wk < t.wmax
    ),
    bq AS (
      SELECT wk, CAST(FLOOR(nhat * 1000.0 + 0.5) AS BIGINT) AS nhat_milli,
             CAST(FLOOR((n_cum + nhat) * 1000.0 + 0.5) AS BIGINT) AS cum_milli
      FROM bass
    ),
    emp_cum AS (
      SELECT wk, adopters,
             CAST(SUM(adopters) OVER (ORDER BY wk
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum
      FROM weekly
    )
    SELECT
      (SELECT wk FROM weekly
       ORDER BY adopters DESC, wk LIMIT 1) AS empirical_peak_wk,
      (SELECT wk FROM bq
       ORDER BY nhat_milli DESC, wk LIMIT 1) AS model_peak_wk,
      (SELECT MIN(wk) FROM emp_cum CROSS JOIN tot t
       WHERE cum * 2 >= t.m) AS empirical_half_wk,
      (SELECT MIN(wk) FROM bq CROSS JOIN tot t
       WHERE cum_milli * 2 >= t.m * 1000) AS model_half_wk,
      (SELECT m FROM tot) AS m
    """.replace("{weekly}", _weekly_cte("duckdb")),
)
def q1026_peak_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak-week diagnostics: the empirical argmax adoption week and
    time-to-half-saturation vs the replayed Bass model's — one summary
    row, all comparisons on exact integers (model values
    milli-quantized first). The 'did the campaign peak when theory
    says' read-out."""
    _views(spark, sf_dir, "orders")
    weekly = spark.sql(f"WITH {_weekly_cte('spark')} SELECT wk, adopters FROM weekly")

    def _apply(pdf):
        import pandas as pd

        m = int(pdf["adopters"].sum())
        by_wk = dict(zip(pdf["wk"].tolist(), pdf["adopters"].tolist()))
        wmax = int(max(by_wk))
        rows = _bass_replay(
            pdf["wk"].tolist(), pdf["adopters"].tolist(), BASS_P, BASS_Q, m
        )
        nhat_milli = [
            (t, int(math.floor(nh * 1000.0 + 0.5)))
            for (t, _, nh, _) in [
                (r[0], r[1], 0.0, 0.0) for r in rows
            ]
        ]
        # recompute from the raw replay states for exactness
        n_cum = 0.0
        nm, cm = [], []
        for t in range(0, wmax + 1):
            nhat = (BASS_P + BASS_Q * n_cum / m) * (m - n_cum)
            nm.append((t, int(math.floor(nhat * 1000.0 + 0.5))))
            cm.append((t, int(math.floor((n_cum + nhat) * 1000.0 + 0.5))))
            n_cum = n_cum + nhat
        emp_peak = max(by_wk.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        model_peak = max(nm, key=lambda kv: (kv[1], -kv[0]))[0]
        cum = 0
        emp_half = None
        for t in sorted(by_wk):
            cum += by_wk[t]
            if cum * 2 >= m:
                emp_half = t
                break
        model_half = next(t for t, c in cm if c * 2 >= m * 1000)
        return pd.DataFrame(
            [(emp_peak, model_peak, emp_half, model_half, m)],
            columns=[
                "empirical_peak_wk",
                "model_peak_wk",
                "empirical_half_wk",
                "model_half_wk",
                "m",
            ],
        )

    return (
        weekly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(lambda pdf: _apply(pdf), schema=_PEAK_SCHEMA)
    )
