"""Market-microstructure batch 166 (q902-q906) — the tick-data
statistics a trading-analytics engine computes over a 100 TB trade
tape, run on events-as-trades: price = event value in exact cents,
size = the props JSON "k" field, tape order = (ts, event_id).

- q902 VWAP by hour: volume-weighted average price from exact integer
  notional/volume sums;
- q903 order-flow imbalance: tick-rule signed volume (uptick = buy)
  per hour — buy/sell pressure;
- q904 volatility signature: realized variance at 1/5/15/60-minute
  sampling against the same tape — the microstructure-noise
  diagnostic (RV inflates as sampling speeds up);
- q905 Kyle's lambda: price-impact slope of price change on signed
  volume, closed-form OLS from integer moments per hour bucket;
- q906 Roll spread: the effective bid-ask spread implied by the
  negative serial covariance of price changes, 2*sqrt(-cov) (NULL
  when cov >= 0 — the estimator's documented blind spot).

100 TB shape: the tape is windowed ONCE per query partitioned by hour
(or sampled bucket) — never a global tick window; every estimator
reduces to integer moment sums (notional, volume, cross-products)
with terminal double ratios. Sampling for q904 keys ticks to their
bucket's LAST trade via max-struct aggregation, not a sort.

Determinism: prices quantize to integer cents (FLOOR(x*100+0.5));
sizes are exact JSON integers; tick signs are integer comparisons with
the unique event_id tie-break; per-term products round into DECIMAL
sums where doubles must accumulate (DETERMINISM.md section 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

SAMPLE_MINUTES = (1, 5, 15, 60)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _jint(d: str) -> str:
    if d == "spark":
        return "CAST(get_json_object(props, '$.k') AS BIGINT)"
    return "CAST(json_extract_string(props, '$.k') AS BIGINT)"


def _us(d: str) -> str:
    return "unix_micros(ts)" if d == "spark" else "epoch_us(ts)"


def _tape_cte(d: str) -> str:
    return f"""tape AS (
      SELECT event_id, ts,
             CAST({_us(d)} AS BIGINT) AS t_us,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS px,
             {_jint(d)} AS qty,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr
      FROM events
    )"""


# ---------------------------------------------------------------------------
# q902 — VWAP by hour


def _q902_sql(d: str) -> str:
    return f"""
    WITH {_tape_cte(d)}
    SELECT hr,
           CAST(COUNT(*) AS BIGINT) AS n_trades,
           CAST(SUM(qty) AS BIGINT) AS volume,
           CAST(SUM(px * qty) AS BIGINT) AS notional_cents,
           CAST(MIN(px) AS BIGINT) AS min_px_cents,
           CAST(MAX(px) AS BIGINT) AS max_px_cents,
           ROUND(CAST(SUM(px * qty) AS DOUBLE) / NULLIF(SUM(qty), 0), 6)
             AS vwap_cents
    FROM tape
    GROUP BY hr
    ORDER BY hr
    """


@query("q902_vwap_hourly", oracle=_q902_sql("duckdb"))
def q902_vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly VWAP: one hour-keyed aggregate of exact integer notional
    (price-cents x size) and volume sums, VWAP as the terminal ratio.
    The execution-quality benchmark every trading desk reconciles
    against — and the map-side-combining shape that makes it free at
    tape scale."""
    _views(spark, sf_dir)
    return spark.sql(_q902_sql("spark"))


# ---------------------------------------------------------------------------
# q903 — tick-rule order-flow imbalance


def _ticks_cte(d: str) -> str:
    return f"""{_tape_cte(d)},
    ticks AS (
      SELECT hr, px, qty,
             px - LAG(px) OVER (PARTITION BY hr ORDER BY t_us, event_id)
               AS dpx
      FROM tape
    ),
    signed AS (
      SELECT hr, px, qty, dpx,
             CASE WHEN dpx > 0 THEN 1 WHEN dpx < 0 THEN -1 ELSE 0 END
               AS sgn
      FROM ticks WHERE dpx IS NOT NULL
    )"""


def _q903_sql(d: str) -> str:
    return f"""
    WITH {_ticks_cte(d)}
    SELECT hr,
           CAST(COUNT(*) AS BIGINT) AS n_ticks,
           CAST(SUM(CASE WHEN sgn = 1 THEN qty ELSE 0 END) AS BIGINT)
             AS buy_volume,
           CAST(SUM(CASE WHEN sgn = -1 THEN qty ELSE 0 END) AS BIGINT)
             AS sell_volume,
           ROUND(CAST(SUM(sgn * qty) AS DOUBLE)
                 / NULLIF(SUM(CASE WHEN sgn != 0 THEN qty ELSE 0 END), 0),
                 6) AS imbalance
    FROM signed
    GROUP BY hr
    ORDER BY hr
    """


@query("q903_orderflow_imbalance", oracle=_q903_sql("duckdb"))
def q903_orderflow_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tick-rule trade classification (uptick = buyer-initiated) and
    the hourly signed-volume imbalance — the classic buy/sell pressure
    gauge when quote data is absent. The lag window partitions by HOUR
    (bounded spans), signs are exact integer compares, the imbalance a
    terminal ratio with a zero-volume guard."""
    _views(spark, sf_dir)
    return spark.sql(_q903_sql("spark"))


# ---------------------------------------------------------------------------
# q904 — volatility signature


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _q904_sql(d: str) -> str:
    branches = []
    for m in SAMPLE_MINUTES:
        us = m * 60_000_000
        # deterministic bucket close: arg-max on the zero-padded
        # (t_us, event_id) string key — lexicographic == numeric for
        # padded non-negatives, unique, portable to both engines
        key = "CONCAT(LPAD(CAST(t_us AS {vtyp}), 20, '0'), LPAD(CAST(event_id AS {vtyp}), 12, '0'))".format(
            vtyp="STRING" if d == "spark" else "VARCHAR"
        )
        branches.append(f"""
    sampled_{m} AS (
      SELECT bucket, MAX_BY(px, {key}) AS close_px
      FROM (SELECT CAST({_idiv(d, 't_us', str(us))} AS BIGINT) AS bucket,
                   t_us, px, event_id
            FROM tape) z
      GROUP BY bucket
    ),
    rets_{m} AS (
      -- nano-quantize the return FIRST (exact BIGINT on identical
      -- doubles), square in DECIMAL(24) operands (int128 product,
      -- the q245 DuckDB lesson) — never ROUND a double beyond its
      -- binary precision (returns here span 1e-4..1e4)
      SELECT CAST(FLOOR(r * 1000000000 + 0.5) AS DECIMAL(24,0))
             * CAST(FLOOR(r * 1000000000 + 0.5) AS DECIMAL(24,0)) AS r2
      FROM (
        SELECT (close_px - LAG(close_px) OVER (ORDER BY bucket))
               / NULLIF(0.0 + LAG(close_px) OVER (ORDER BY bucket), 0.0) AS r
        FROM sampled_{m}
      ) rr WHERE r IS NOT NULL
    ),
    rv_{m} AS (
      SELECT CAST({m} AS BIGINT) AS sample_minutes,
             CAST(COUNT(r2) AS BIGINT) AS n_returns,
             ROUND(CAST(SUM(r2) AS DOUBLE) / 1e18, 6) AS realized_variance
      FROM rets_{m}
    )""")
    union = "\n      UNION ALL\n      ".join(
        f"SELECT * FROM rv_{m}" for m in SAMPLE_MINUTES
    )
    return f"""
    WITH {_tape_cte(d)},{",".join(branches)}
    SELECT * FROM (
      {union}
    ) u
    ORDER BY sample_minutes
    """


@query("q904_volatility_signature", oracle=_q904_sql("duckdb"))
def q904_volatility_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The volatility signature plot: realized variance (sum of squared
    simple returns on bucket-close prices) at 1/5/15/60-minute
    sampling. Bucket closes come from MAX_BY on the exact padded
    (t_us, event_id) key (no sort); the per-frequency return windows
    run over BOUNDED bucket tables (calendar buckets, q339 class).
    Returns nano-quantize to exact integers BEFORE squaring (DECIMAL
    int128 products, exact sums — the synthetic tape's returns span
    eight orders of magnitude, far beyond safe double rounding).
    Microstructure noise shows up as RV growing at finer sampling."""
    _views(spark, sf_dir)
    return spark.sql(_q904_sql("spark"))


# ---------------------------------------------------------------------------
# q905 — Kyle's lambda


def _q905_sql(d: str) -> str:
    return f"""
    WITH {_ticks_cte(d)},
    xy AS (
      SELECT hr,
             CAST(sgn * qty AS BIGINT) AS x,
             CAST(dpx AS BIGINT) AS y
      FROM signed
    ),
    mom AS (
      SELECT hr,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM xy GROUP BY hr
    )
    SELECT hr, n AS n_ticks,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / NULLIF(n * sxx - sx * sx, 0), 8) AS kyle_lambda
    FROM mom
    ORDER BY hr
    """


@query("q905_kyle_lambda", oracle=_q905_sql("duckdb"))
def q905_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kyle's lambda: the price-impact slope of price change (cents) on
    signed volume, per hour — closed-form OLS from EXACT integer moment
    sums (n*sxy - sx*sy over n*sxx - sx^2), one terminal double ratio.
    The liquidity number market-impact models calibrate to."""
    _views(spark, sf_dir)
    return spark.sql(_q905_sql("spark"))


# ---------------------------------------------------------------------------
# q906 — Roll spread


def _q906_sql(d: str) -> str:
    return f"""
    WITH {_tape_cte(d)},
    dp AS (
      SELECT hr,
             px - (LAG(px) OVER w) AS d1,
             (LEAD(px) OVER w) - px AS d2
      FROM tape
      WINDOW w AS (PARTITION BY hr ORDER BY t_us, event_id)
    ),
    pairs AS (
      SELECT hr, CAST(d1 AS BIGINT) AS a, CAST(d2 AS BIGINT) AS b
      FROM dp WHERE d1 IS NOT NULL AND d2 IS NOT NULL
    ),
    mom AS (
      SELECT hr,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(a) AS BIGINT) AS sa,
             CAST(SUM(b) AS BIGINT) AS sb,
             CAST(SUM(a * b) AS BIGINT) AS sab
      FROM pairs GROUP BY hr
    )
    SELECT hr, n AS n_pairs,
           -- 4 dp: cov magnitudes reach 1e7+, so an 8-dp round would
           -- exceed double precision (the q904 lesson); half-window
           -- 5e-5 >> ulp at this magnitude
           ROUND(CAST(n * sab - sa * sb AS DOUBLE) / (n * n), 4)
             AS serial_cov,
           CASE WHEN n * sab - sa * sb < 0
                THEN ROUND(2 * SQRT(CAST(-(n * sab - sa * sb) AS DOUBLE)
                           / (n * n)), 6)
                ELSE CAST(NULL AS DOUBLE)
           END AS roll_spread_cents
    FROM mom
    ORDER BY hr
    """


@query("q906_roll_spread", oracle=_q906_sql("duckdb"))
def q906_roll_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roll's implied effective spread: 2*sqrt(-cov(dp_t, dp_t+1)) per
    hour from the EXACT integer covariance numerator of adjacent price
    changes; NULL when the serial covariance is non-negative (the
    estimator's documented blind spot, decided by an integer sign
    test, never a double threshold). One hour-partitioned window, one
    moment aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_q906_sql("spark"))
