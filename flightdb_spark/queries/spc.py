"""Statistical-process-control batch 181 (q972-q976) — the Shewhart /
EWMA / CUSUM chart family (Shewhart 1931; Roberts 1959; Page 1954)
over the event stream's value column in exact cents: the monitoring
layer a data-platform SLO or manufacturing line runs on every metric.

Subgroups are the classic fixed-n form: each hour's FIRST n=5 events
by event_id (deterministic subsample), value in integer cents.

- q972 Xbar-R chart: per-hour subgroup mean/range, center lines and
  A2/D3/D4 control limits (literal Shewhart constants for n=5),
  out-of-control flags;
- q973 EWMA chart: z_t = lambda*x_t + (1-lambda)*z_{t-1} replayed by
  a recursive-CTE oracle (the q261 Holt pattern) with EXACT
  variable-width limits — the (1-lambda)^{2t} term is itself carried
  recursively as a product, so no POWER() ever runs;
- q974 CUSUM (tabular, Page): one-sided C+ and C- in exact
  "cents x hours" integer units (target and allowance cross-
  multiplied away), recursive integer replay on both engines;
- q975 p-chart: daily error proportion vs 3-sigma binomial limits,
  compared by exact DECIMAL cross-products (never a sqrt);
- q976 Western Electric runs rules: rule 1 (beyond 3 sigma), rule 2
  (2-of-3 consecutive beyond 2 sigma, either side — the side-pooled
  variant), rule 4 (8 consecutive same side of center) over the Xbar
  series, zone tests by identically-computed double thresholds.

100 TB shape: ONE events pass to the hourly/daily aggregate
(subsample via a per-hour rank window — partitioned, map-side
prunable); every chart then lives on the calendar-bounded hour/day
table. The sequential charts (EWMA, CUSUM) run per-series over that
bounded table (q261's bounded-recurrence contract — 10x data is 10x
events per hour, the SAME number of hours).

Determinism: subgroup stats exact integers; Shewhart constants are
repr-inlined literals; EWMA doubles are replayed with identical IEEE
expressions (Holt contract); CUSUM is pure integer; p-chart
comparisons are DECIMAL(38) cross-products (q245 widening rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType
from pyspark.sql.types import TimestampType

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

SUB_N = 5
# Shewhart constants for n=5 (public SPC tables), repr-inlined
A2 = 0.577
D3 = 0.0  # n=5: LCL_R = D3*Rbar = 0, so no lower range limit is emitted
D4 = 2.114
D2 = 2.326
EWMA_LAMBDA = 0.2
EWMA_L = 3.0



def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


# hour subgroups: first SUB_N events by event_id, value in exact cents
def _subgroups_cte() -> str:
    return f"""evs AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    picked AS (
      SELECT hr, cents,
             ROW_NUMBER() OVER (PARTITION BY hr ORDER BY event_id) AS rn
      FROM evs
    ),
    sub AS (
      SELECT hr,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS s,
             CAST(MAX(cents) - MIN(cents) AS BIGINT) AS r
      FROM picked WHERE rn <= {SUB_N}
      GROUP BY hr HAVING COUNT(*) = {SUB_N}
    ),
    grand AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(s) AS BIGINT) AS ss,
             CAST(SUM(r) AS BIGINT) AS sr
      FROM sub
    )"""


_Q972_SQL = f"""
    WITH {_subgroups_cte()}
    SELECT /*+ BROADCAST(g) */ u.hr,
           CAST(u.s AS DOUBLE) / {SUB_N} AS xbar_cents,
           u.r AS range_cents,
           CAST(g.ss AS DOUBLE) / (g.m * {SUB_N}) AS center_cents,
           CAST(g.ss AS DOUBLE) / (g.m * {SUB_N})
             + CAST({A2!r} AS DOUBLE) * (CAST(g.sr AS DOUBLE) / g.m) AS ucl_x,
           CAST(g.ss AS DOUBLE) / (g.m * {SUB_N})
             - CAST({A2!r} AS DOUBLE) * (CAST(g.sr AS DOUBLE) / g.m) AS lcl_x,
           CAST({D4!r} AS DOUBLE) * (CAST(g.sr AS DOUBLE) / g.m) AS ucl_r,
           CAST(CASE WHEN CAST(u.s AS DOUBLE) / {SUB_N}
                       > CAST(g.ss AS DOUBLE) / (g.m * {SUB_N})
                         + CAST({A2!r} AS DOUBLE)
                           * (CAST(g.sr AS DOUBLE) / g.m)
                     OR CAST(u.s AS DOUBLE) / {SUB_N}
                       < CAST(g.ss AS DOUBLE) / (g.m * {SUB_N})
                         - CAST({A2!r} AS DOUBLE)
                           * (CAST(g.sr AS DOUBLE) / g.m)
                THEN 1 ELSE 0 END AS INT) AS ooc_x,
           CAST(CASE WHEN CAST(u.r AS DOUBLE)
                       > CAST({D4!r} AS DOUBLE)
                         * (CAST(g.sr AS DOUBLE) / g.m)
                THEN 1 ELSE 0 END AS INT) AS ooc_r
    FROM sub u CROSS JOIN grand g
    ORDER BY u.hr
    """


@query("q972_xbar_r_chart", oracle=_Q972_SQL)
def q972_xbar_r_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Xbar-R chart: per-hour fixed-n subgroup mean and range
    against A2/D4 Shewhart limits estimated from the grand averages —
    the first chart any process-monitoring deployment ships. All
    subgroup stats are exact integers; limits are identical double
    expressions on both engines."""
    _views(spark, sf_dir)
    return spark.sql(_Q972_SQL)


# --- q973 EWMA chart (recursive replay) ---------------------------------------


def _q973_oracle() -> str:
    lam, oml = EWMA_LAMBDA, 1 - EWMA_LAMBDA
    om2 = (1 - EWMA_LAMBDA) * (1 - EWMA_LAMBDA)
    return f"""
    WITH RECURSIVE {_subgroups_cte()},
    xser AS (
      SELECT hr, CAST(s AS DOUBLE) / {SUB_N} AS x,
             ROW_NUMBER() OVER (ORDER BY hr) AS t
      FROM sub
    ),
    params AS (
      SELECT CAST(ss AS DOUBLE) / (m * {SUB_N}) AS mu,
             (CAST(sr AS DOUBLE) / m) / CAST({D2!r} AS DOUBLE) AS sigma
      FROM grand
    ),
    ew AS (
      SELECT x.t, x.hr, x.x,
             CAST({lam!r} AS DOUBLE) * x.x
               + CAST({oml!r} AS DOUBLE) * p.mu AS z,
             CAST({om2!r} AS DOUBLE) AS wpow
      FROM xser x CROSS JOIN params p WHERE x.t = 1
      UNION ALL
      SELECT x.t, x.hr, x.x,
             CAST({lam!r} AS DOUBLE) * x.x
               + CAST({oml!r} AS DOUBLE) * e.z,
             e.wpow * CAST({om2!r} AS DOUBLE)
      FROM ew e JOIN xser x ON x.t = e.t + 1
    )
    SELECT /*+ BROADCAST(p) */ e.hr, e.x AS xbar_cents, e.z AS ewma_cents,
           p.mu + CAST({EWMA_L!r} AS DOUBLE) * p.sigma
             * SQRT(CAST({lam!r} AS DOUBLE)
                    / (CAST(2 AS DOUBLE) - CAST({lam!r} AS DOUBLE))
                    * (CAST(1 AS DOUBLE) - e.wpow)) AS ucl,
           p.mu - CAST({EWMA_L!r} AS DOUBLE) * p.sigma
             * SQRT(CAST({lam!r} AS DOUBLE)
                    / (CAST(2 AS DOUBLE) - CAST({lam!r} AS DOUBLE))
                    * (CAST(1 AS DOUBLE) - e.wpow)) AS lcl,
           CAST(CASE WHEN e.z > p.mu + CAST({EWMA_L!r} AS DOUBLE) * p.sigma
                    * SQRT(CAST({lam!r} AS DOUBLE)
                           / (CAST(2 AS DOUBLE) - CAST({lam!r} AS DOUBLE))
                           * (CAST(1 AS DOUBLE) - e.wpow))
                  OR e.z < p.mu - CAST({EWMA_L!r} AS DOUBLE) * p.sigma
                    * SQRT(CAST({lam!r} AS DOUBLE)
                           / (CAST(2 AS DOUBLE) - CAST({lam!r} AS DOUBLE))
                           * (CAST(1 AS DOUBLE) - e.wpow))
                THEN 1 ELSE 0 END AS INT) AS breach
    FROM ew e CROSS JOIN params p
    ORDER BY e.hr
    """


_EWMA_SCHEMA = StructType(
    [
        StructField("hr", TimestampType()),
        StructField("xbar_cents", DoubleType()),
        StructField("ewma_cents", DoubleType()),
        StructField("ucl", DoubleType()),
        StructField("lcl", DoubleType()),
        StructField("breach", LongType()),
    ]
)


@query("q973_ewma_chart", oracle=_q973_oracle())
def q973_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959) with exact variable-width
    limits: the smoothing recurrence AND the (1-lambda)^(2t) width
    term both replay recursively — identical IEEE expressions on both
    engines (the q261 Holt contract; SQRT is IEEE-correctly-rounded,
    so even the limits are bit-identical). Sequential, so it runs in
    one bounded applyInPandas group over the calendar-bounded hourly
    series."""
    _views(spark, sf_dir)
    sub = spark.sql(
        f"WITH {_subgroups_cte()} "
        f"SELECT /*+ BROADCAST(g) */ u.hr, CAST(u.s AS DOUBLE) / {SUB_N} AS x, "
        f"CAST(g.ss AS DOUBLE) / (g.m * {SUB_N}) AS mu, "
        f"(CAST(g.sr AS DOUBLE) / g.m) / CAST({D2!r} AS DOUBLE) AS sigma "
        f"FROM sub u CROSS JOIN grand g"
    )
    lam, oml = EWMA_LAMBDA, 1 - EWMA_LAMBDA
    om2 = oml * oml
    ell = EWMA_L

    def _apply(pdf):
        import math

        import pandas as pd

        pdf = pdf.sort_values("hr").reset_index(drop=True)
        mu = float(pdf["mu"].iloc[0])
        sigma = float(pdf["sigma"].iloc[0])
        z, wpow = mu, 1.0
        rows = []
        for rec in pdf.itertuples(index=False):
            x = float(rec.x)
            z = lam * x + oml * z
            wpow = wpow * om2
            half = (
                ell * sigma
                * math.sqrt(lam / (2.0 - lam) * (1.0 - wpow))
            )
            rows.append(
                (rec.hr, x, z, mu + half, mu - half,
                 1 if (z > mu + half or z < mu - half) else 0)
            )
        return pd.DataFrame(
            rows,
            columns=["hr", "xbar_cents", "ewma_cents", "ucl", "lcl", "breach"],
        )

    return (
        sub.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(_apply, schema=_EWMA_SCHEMA)
        .orderBy("hr")
    )


# --- q974 CUSUM (integer) ------------------------------------------------------


def _q974_oracle() -> str:
    return f"""
    WITH RECURSIVE {_subgroups_cte()},
    xser AS (
      SELECT hr, s, ROW_NUMBER() OVER (ORDER BY hr) AS t
      FROM sub
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS h, CAST(SUM(s) AS BIGINT) AS tsum
      FROM xser
    ),
    -- units: cents x hours; dev = (s*h - tsum) is the subgroup's
    -- exact excess over the grand hourly mean (k=0 allowance form)
    cus AS (
      SELECT /*+ BROADCAST(t) */ x.t, x.hr,
             GREATEST(CAST(0 AS BIGINT), x.s * t.h - t.tsum) AS cpos,
             GREATEST(CAST(0 AS BIGINT), t.tsum - x.s * t.h) AS cneg
      FROM xser x CROSS JOIN tot t WHERE x.t = 1
      UNION ALL
      SELECT x.t, x.hr,
             GREATEST(CAST(0 AS BIGINT), c.cpos + (x.s * t.h - t.tsum)),
             GREATEST(CAST(0 AS BIGINT), c.cneg + (t.tsum - x.s * t.h))
      FROM cus c
      JOIN xser x ON x.t = c.t + 1
      CROSS JOIN tot t
    )
    SELECT hr, cpos AS cusum_pos_u, cneg AS cusum_neg_u
    FROM cus ORDER BY hr
    """


_CUSUM_SCHEMA = StructType(
    [
        StructField("hr", TimestampType()),
        StructField("cusum_pos_u", LongType()),
        StructField("cusum_neg_u", LongType()),
    ]
)


@query("q974_cusum_chart", oracle=_q974_oracle())
def q974_cusum_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tabular CUSUM (Page 1954) on hourly subgroup totals in EXACT
    integer cross-multiplied units (cents x hours — the grand mean
    never becomes a double; k=0 allowance form): C+ accumulates upward deviations,
    C- downward, both clamped at zero. Pure-integer recursion on both
    engines; Spark runs it in one bounded applyInPandas group."""
    _views(spark, sf_dir)
    sub = spark.sql(
        f"WITH {_subgroups_cte()} SELECT hr, s FROM sub"
    )

    def _apply(pdf):
        import pandas as pd

        pdf = pdf.sort_values("hr").reset_index(drop=True)
        h = len(pdf)
        tsum = int(pdf["s"].sum())
        cpos = cneg = 0
        rows = []
        for rec in pdf.itertuples(index=False):
            dev = int(rec.s) * h - tsum
            cpos = max(0, cpos + dev)
            cneg = max(0, cneg - dev)
            rows.append((rec.hr, cpos, cneg))
        return pd.DataFrame(
            rows, columns=["hr", "cusum_pos_u", "cusum_neg_u"]
        )

    return (
        sub.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(_apply, schema=_CUSUM_SCHEMA)
        .orderBy("hr")
    )


# --- q975 p-chart ---------------------------------------------------------------

_Q975_SQL = """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
               AS BIGINT) AS c
      FROM events GROUP BY day
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(c) AS BIGINT) AS ee
      FROM daily
    )
    SELECT /*+ BROADCAST(t) */ d.day, d.n, d.c,
           CAST(d.c AS DOUBLE) / d.n AS p_hat,
           CAST(t.ee AS DOUBLE) / t.nn AS p_bar,
           -- |p_i - pbar| > 3*sqrt(pbar(1-pbar)/n_i), squared and
           -- cross-multiplied into exact DECIMAL(38) integer products
           CAST(CASE WHEN
             CAST(d.c * t.nn - t.ee * d.n AS DECIMAL(38,0))
               * CAST(d.c * t.nn - t.ee * d.n AS DECIMAL(38,0))
               * CAST(1 AS DECIMAL(38,0))
             > CAST(9 AS DECIMAL(38,0))
               * CAST(t.ee AS DECIMAL(38,0))
               * CAST(t.nn - t.ee AS DECIMAL(38,0)) * d.n
           THEN 1 ELSE 0 END AS INT) AS ooc
    FROM daily d CROSS JOIN tot t
    ORDER BY d.day
    """


@query("q975_p_chart", oracle=_Q975_SQL)
def q975_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The p-chart: daily error proportion against 3-sigma binomial
    limits, with the out-of-control test cross-multiplied into exact
    DECIMAL(38) integer products so no sqrt (a 1-ulp engine class)
    ever decides a flag. Display p's are terminal doubles."""
    _views(spark, sf_dir)
    return spark.sql(_Q975_SQL)


# --- q976 Western Electric runs rules --------------------------------------------

_Q976_SQL = f"""
    WITH {_subgroups_cte()},
    xser AS (
      SELECT /*+ BROADCAST(g) */ u.hr,
             CAST(u.s AS DOUBLE) / {SUB_N} AS x,
             CAST(g.ss AS DOUBLE) / (g.m * {SUB_N}) AS mu,
             (CAST(g.sr AS DOUBLE) / g.m) / CAST({D2!r} AS DOUBLE)
               / SQRT(CAST({SUB_N} AS DOUBLE)) AS se
      FROM sub u CROSS JOIN grand g
    ),
    flagged AS (
      SELECT hr, x, mu,
             CASE WHEN x > mu THEN 1 ELSE 0 END AS above,
             CASE WHEN x > mu + 3 * se OR x < mu - 3 * se
                  THEN 1 ELSE 0 END AS beyond3,
             CASE WHEN x > mu + 2 * se OR x < mu - 2 * se
                  THEN 1 ELSE 0 END AS beyond2
      FROM xser
    ),
    runs AS (
      SELECT hr, x, above, beyond3, beyond2,
             SUM(above) OVER (ORDER BY hr
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS above8,
             CAST(COUNT(*) OVER (ORDER BY hr
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS BIGINT) AS w8,
             SUM(beyond2) OVER (ORDER BY hr
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS b2in3
      FROM flagged
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_subgroups,
           CAST(SUM(beyond3) AS BIGINT) AS rule1_beyond_3sigma,
           CAST(SUM(CASE WHEN b2in3 >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS rule2_two_of_three_beyond_2sigma,
           CAST(SUM(CASE WHEN w8 = 8 AND (above8 = 8 OR above8 = 0)
                    THEN 1 ELSE 0 END) AS BIGINT)
             AS rule4_eight_same_side
    FROM runs
    """


@query("q976_western_electric", oracle=_Q976_SQL)
def q976_western_electric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric runs rules over the Xbar series: rule 1
    (beyond 3 sigma), rule 2 (2-of-3 beyond 2 sigma), rule 4 (8
    consecutive on one side of center) — the pattern tests that catch
    drifts a single-point limit misses. Zone thresholds are
    identically-computed doubles; run counting is window arithmetic
    over the calendar-bounded hourly series."""
    _views(spark, sf_dir)
    return spark.sql(_Q976_SQL)
