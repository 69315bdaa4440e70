"""Time-series / privacy batch 18 (q260-q263): KMV sketch SET algebra
(union + inclusion-exclusion intersection estimates audited against
exact), Holt linear-trend forecasting (the double-exponential-
smoothing recurrence, replayed bit-exactly by a recursive-CTE oracle
since r8; Python parity pin remains), rolling
z-score anomaly flagging over exact decimal window moments, and a
reproducible Laplace-mechanism noisy-count release (the DP shape with
hash-seeded noise so both engines — and reruns — agree).

Determinism: sketch estimators are pure integer order statistics
(q231's 60-bit md5 domain); window moments are DECIMAL sums so the
engine's segment-tree accumulation order cannot leak into the values;
ln terms round at 7 dp (DETERMINISM.md §5); the Laplace inverse-CDF
draws its uniform from md5 — reproducible by construction (a
production DP release would draw real entropy; the mechanism,
sensitivity and epsilon accounting are what this query pins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

KMV2_K = 16
KMV2_DOMAIN = float(1 << 60)

# 60-bit md5 of the user-day member key
_UD_SPARK = (
    "cast(conv(substring(md5(concat(cast(user_id as string), '-', "
    "cast(cast(ts as date) as string))), 1, 15), 16, 10) as bigint)"
)
_UD_DUCK = (
    "('0x' || substr(md5(CAST(user_id AS VARCHAR) || '-' "
    "|| strftime(ts, '%Y-%m-%d')), 1, 15))::BIGINT"
)


# ---------------------------------------------------------------------------
# q260 — KMV sketch set algebra


@query(
    "q260_kmv_set_ops",
    oracle=f"""
    WITH members AS (
      SELECT event_type AS lbl, {_UD_DUCK} AS hv
      FROM events WHERE event_type IN ('click', 'purchase')
      GROUP BY lbl, hv
    ),
    tall AS (
      SELECT lbl, hv FROM members
      UNION ALL
      SELECT 'union' AS lbl, hv FROM (SELECT DISTINCT hv FROM members)
    ),
    ranked AS (
      SELECT lbl, hv,
             ROW_NUMBER() OVER (PARTITION BY lbl ORDER BY hv) AS rn,
             COUNT(*) OVER (PARTITION BY lbl) AS nd
      FROM tall
    ),
    ests AS (
      SELECT lbl,
             CAST(MAX(nd) AS BIGINT) AS exact_ndv,
             ROUND(CASE WHEN MAX(nd) < {KMV2_K} THEN CAST(MAX(nd) AS DOUBLE)
                   ELSE ({KMV2_K} - 1) * {KMV2_DOMAIN}
                        / MAX(CASE WHEN rn = {KMV2_K} THEN hv END)
                   END, 3) AS est
      FROM ranked WHERE rn <= {KMV2_K} GROUP BY lbl
    )
    SELECT a.exact_ndv AS exact_a, b.exact_ndv AS exact_b,
           u.exact_ndv AS exact_union,
           a.exact_ndv + b.exact_ndv - u.exact_ndv AS exact_inter,
           a.est AS est_a, b.est AS est_b, u.est AS est_union,
           ROUND(a.est + b.est - u.est, 3) AS est_inter
    FROM (SELECT * FROM ests WHERE lbl = 'click') a
    CROSS JOIN (SELECT * FROM ests WHERE lbl = 'purchase') b
    CROSS JOIN (SELECT * FROM ests WHERE lbl = 'union') u
    """,
)
def q260_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV sketch SET algebra (Beyer et al. 2007): estimate the
    distinct user-day cardinalities of the click set, the purchase
    set, their union (the k smallest hashes of the merged member
    stream — the property that makes KMV mergeable), and their
    intersection by inclusion-exclusion — all beside the exact
    answers, which is the audit a platform runs before trusting
    sketches at 100 TB. Estimator: (k-1) * DOMAIN / kth_min, exact
    fallback under k.

    Plan: one shuffle dedupes (label, hash) members; the union label
    is a distinct over the same frame (no re-scan of the fact); k-min
    per label rides a label-PARTITIONED window (WindowGroupLimit
    prunes to k per label map-side); the final assembly is three
    one-row frames cross-joined. Pure integer order statistics —
    fully oracle-checkable, unlike an opaque HLL register blob."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    members = (
        ev.filter(F.col("event_type").isin("click", "purchase"))
        .select(F.col("event_type").alias("lbl"), F.expr(_UD_SPARK).alias("hv"))
        .distinct()
    )
    tall = members.unionByName(
        members.select(F.lit("union").alias("lbl"), "hv").distinct()
    )
    w = Window.partitionBy("lbl")
    ranked = tall.withColumn("rn", F.row_number().over(w.orderBy("hv"))).withColumn(
        "nd", F.count(F.lit(1)).over(w)
    )
    ests = (
        ranked.filter(F.col("rn") <= KMV2_K)
        .groupBy("lbl")
        .agg(
            F.max("nd").cast("bigint").alias("exact_ndv"),
            F.round(
                F.when(
                    F.max("nd") < KMV2_K, F.max("nd").cast("double")
                ).otherwise(
                    (KMV2_K - 1)
                    * KMV2_DOMAIN
                    / F.max(F.when(F.col("rn") == KMV2_K, F.col("hv")))
                ),
                3,
            ).alias("est"),
        )
    )
    a = ests.filter(F.col("lbl") == "click").select(
        F.col("exact_ndv").alias("exact_a"), F.col("est").alias("est_a")
    )
    b = ests.filter(F.col("lbl") == "purchase").select(
        F.col("exact_ndv").alias("exact_b"), F.col("est").alias("est_b")
    )
    u = ests.filter(F.col("lbl") == "union").select(
        F.col("exact_ndv").alias("exact_union"), F.col("est").alias("est_union")
    )
    return (
        a.join(F.broadcast(b))
        .join(F.broadcast(u))
        .select(
            "exact_a",
            "exact_b",
            "exact_union",
            (F.col("exact_a") + F.col("exact_b") - F.col("exact_union")).alias(
                "exact_inter"
            ),
            "est_a",
            "est_b",
            "est_union",
            F.round(F.col("est_a") + F.col("est_b") - F.col("est_union"), 3).alias(
                "est_inter"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q261 — Holt linear-trend forecast (hash-verified: recursive-CTE oracle)


_HOLT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("h", IntegerType()),
        StructField("yhat", DoubleType()),
    ]
)

HOLT_ALPHA = 0.3
HOLT_BETA = 0.1


def _holt_forecast(pdf, alpha: float = HOLT_ALPHA, beta: float = HOLT_BETA, horizon: int = 7):
    """Holt's linear method over one key's day-ordered series; init
    level = y0, trend = y1 - y0. Pure function shared with the parity
    test. yhat quantizes via floor(x*1e4 + 0.5)/1e4 — the exact op
    sequence the recursive-CTE oracle replays (NOT Python round():
    half-even vs DuckDB half-up would diverge on ties)."""
    import math

    import pandas as pd

    pdf = pdf.sort_values("day").reset_index(drop=True)
    y = pdf["v"].to_numpy()
    key = pdf["event_type"].iloc[0]
    level, trend = float(y[0]), float(y[1] - y[0])
    for t in range(1, len(y)):
        prev_level = level
        level = alpha * float(y[t]) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1 - beta) * trend
    rows = [
        (key, h, math.floor((level + h * trend) * 10000 + 0.5) / 10000.0)
        for h in range(1, horizon + 1)
    ]
    return pd.DataFrame(rows, columns=["event_type", "h", "yhat"])


def _q261_oracle() -> str:
    """Recursive-CTE oracle replaying Holt's EXACT recurrence (r7
    VERDICT item 4): each recursion step evaluates the same IEEE
    double expressions the Python loop runs — constants inlined via
    repr() so both engines hold bit-identical alpha/(1-alpha)/beta/
    (1-beta) — so the final (level, trend) match bit-for-bit and the
    quantized forecasts hash-match."""
    a, oma = HOLT_ALPHA, 1 - HOLT_ALPHA
    b, omb = HOLT_BETA, 1 - HOLT_BETA
    return f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS v
      FROM events GROUP BY event_type, day
    ),
    seq AS (
      SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
      FROM daily
    ),
    holt AS (
      SELECT s0.event_type, CAST(2 AS BIGINT) AS t,
             CAST({a!r} AS DOUBLE) * s1.v
               + CAST({oma!r} AS DOUBLE) * (s0.v + (s1.v - s0.v)) AS lvl,
             CAST({b!r} AS DOUBLE)
               * ((CAST({a!r} AS DOUBLE) * s1.v
                   + CAST({oma!r} AS DOUBLE) * (s0.v + (s1.v - s0.v)))
                  - s0.v)
               + CAST({omb!r} AS DOUBLE) * (s1.v - s0.v) AS trd
      FROM seq s0 JOIN seq s1
        ON s1.event_type = s0.event_type AND s0.t = 1 AND s1.t = 2
      UNION ALL
      SELECT h.event_type, h.t + 1,
             CAST({a!r} AS DOUBLE) * s.v
               + CAST({oma!r} AS DOUBLE) * (h.lvl + h.trd),
             CAST({b!r} AS DOUBLE)
               * ((CAST({a!r} AS DOUBLE) * s.v
                   + CAST({oma!r} AS DOUBLE) * (h.lvl + h.trd)) - h.lvl)
               + CAST({omb!r} AS DOUBLE) * h.trd
      FROM holt h JOIN seq s
        ON s.event_type = h.event_type AND s.t = h.t + 1
    ),
    lastt AS (
      SELECT event_type, MAX(t) AS t FROM holt GROUP BY event_type
    ),
    fin AS (
      SELECT h.event_type, h.lvl, h.trd
      FROM holt h JOIN lastt l ON l.event_type = h.event_type AND l.t = h.t
    )
    SELECT f.event_type, CAST(hz.h AS INT) AS h,
           CAST(CAST(FLOOR((f.lvl + hz.h * f.trd) * 10000 + 0.5) AS BIGINT)
                AS DOUBLE) / CAST(10000 AS DOUBLE) AS yhat
    FROM fin f
    CROSS JOIN (VALUES (1), (2), (3), (4), (5), (6), (7)) hz(h)
    ORDER BY f.event_type, hz.h
    """


@query("q261_holt_forecast", oracle=_q261_oracle())
def q261_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast (double exponential smoothing,
    Holt 1957): 7-day-ahead daily-revenue forecasts per event type.
    The level/trend recurrence is inherently sequential, so it runs
    per key in Arrow-batched applyInPandas over the BOUNDED daily
    series (30 points per key, 5 keys) — the per-key-recurrence
    pattern (q234, q258). The ORACLE replays the identical recurrence
    as a recursive CTE with repr-inlined double constants, so the
    coupled level/trend states match bit-for-bit and the micro-unit-
    quantized forecasts hash-match (was rows-only before r8).

    Plan: one shuffle to the (type, day) daily aggregate — the only
    fact-sized exchange; Python sees 150 tiny rows."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).cast("double").alias("v"))

    def _apply(pdf):
        return _holt_forecast(pdf)

    return (
        daily.groupBy("event_type")
        .applyInPandas(_apply, schema=_HOLT_SCHEMA)
        .orderBy("event_type", "h")
    )


# ---------------------------------------------------------------------------
# q262 — rolling z-score anomalies


@query(
    "q262_rolling_zscore",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(CAST(ROUND(value, 2) AS DECIMAL(18,2))) AS v
      FROM events GROUP BY event_type, day
    ),
    windowed AS (
      SELECT event_type, day, v,
             COUNT(*) OVER w AS n,
             SUM(v) OVER w AS s1,
             SUM(CAST(v * v AS DECIMAL(38,4))) OVER w AS s2
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    ),
    scored AS (
      SELECT event_type, day, v,
             (CAST(v AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
             / sqrt((7.0 * CAST(s2 AS DOUBLE)
                     - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / (7.0 * 6.0))
               AS z
      FROM windowed WHERE n = 7
    )
    SELECT event_type, day, ROUND(CAST(v AS DOUBLE), 2) AS daily_value,
           ROUND(z, 6) AS zscore
    FROM scored WHERE ABS(z) > 1.5
    ORDER BY event_type, day
    """,
)
def q262_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags: each day's revenue per event
    type scored against its own trailing 7-day mean/std, flagging
    |z| > 1.5 — the ops-dashboard alert primitive. The window moments
    (count, sum, sum-of-squares) are DECIMAL, so whatever segment-tree
    accumulation order the engine's window implementation uses cannot
    change the values; the z assembly is one straight-line double.

    Plan: one shuffle to the (type, day) daily table; the rolling
    frame is a type-partitioned 7-row window over ~30 rows per key."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)")).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-6, Window.currentRow)
    )
    windowed = (
        daily.withColumn("n", F.count(F.lit(1)).over(w))
        .withColumn("s1", F.sum("v").over(w))
        .withColumn("s2", F.sum((F.col("v") * F.col("v")).cast("decimal(38,4)")).over(w))
    )
    z = (F.col("v").cast("double") - F.col("s1").cast("double") / 7.0) / F.sqrt(
        (7.0 * F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1").cast("double"))
        / (7.0 * 6.0)
    )
    return (
        windowed.filter(F.col("n") == 7)
        .withColumn("z", z)
        .filter(F.abs("z") > 1.5)
        .select(
            "event_type",
            "day",
            F.round(F.col("v").cast("double"), 2).alias("daily_value"),
            F.round("z", 6).alias("zscore"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# q263 — reproducible Laplace-mechanism noisy counts


@query(
    "q263_dp_noisy_counts",
    oracle="""
    WITH weekly AS (
      SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS week,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, week
    ),
    noised AS (
      SELECT event_type, week, n,
             (('0x' || substr(md5(event_type || '|'
                  || strftime(week, '%Y-%m-%d')), 1, 15))::BIGINT
              / 1152921504606846976.0) AS u
      FROM weekly
    )
    SELECT event_type, week, n,
           ROUND(n + ROUND(-10.0 * sign(u - 0.5)
                           * ln(1.0 - 2.0 * abs(u - 0.5)), 7), 4)
             AS noisy_n
    FROM noised
    ORDER BY event_type, week
    """,
)
def q263_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laplace-mechanism noisy count release (Dwork et al. 2006): the
    weekly event counts released with Laplace(b = sensitivity/epsilon
    = 1/0.1 = 10) noise via the inverse CDF —
    -b*sign(u-1/2)*ln(1-2|u-1/2|). The uniform u here is hash-seeded
    from the release key so the query is REPRODUCIBLE and
    oracle-checkable — it pins the mechanism, the sensitivity-1
    count shape, and the epsilon accounting; a production DP release
    swaps the hash for real entropy (reproducible noise is NOT
    differentially private) and drops the true n column.

    Plan: one shuffle to the ~25-key weekly counts; noise is a
    map-side straight-line expression with its ln term rounded at
    7 dp (DETERMINISM.md §5)."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    weekly = ev.groupBy(
        "event_type", F.date_trunc("week", "ts").cast("date").alias("week")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    u = (
        F.expr(
            "cast(conv(substring(md5(concat(event_type, '|', "
            "cast(week as string))), 1, 15), 16, 10) as bigint)"
        )
        / F.lit(1152921504606846976.0)
    )
    noise = F.round(
        -10.0 * F.signum(u - 0.5) * F.log(1.0 - 2.0 * F.abs(u - 0.5)), 7
    )
    return weekly.select(
        "event_type", "week", "n", F.round(F.col("n") + noise, 4).alias("noisy_n")
    ).orderBy("event_type", "week")
