"""Demand-analytics batch 38 (q313-q315): Croston's method for
intermittent demand (the forecasting standard for sparse SKUs),
STL-style trend/seasonal strength per event series (Hyndman's
decomposition-strength diagnostics), and the Herfindahl-Hirschman
supplier-concentration index per brand (the antitrust-grade
concentration measure next to q166's market shares).

Determinism: Croston uses alpha = 1/2 so every EWMA weight is an
exact power of two; weighted terms round to 12-dp DECIMAL before
summing (order-free). The STL moving average sums 2-dp DECIMAL
daily revenues exactly; variances assemble from DECIMAL moment
sums. HHI shares are exact DECIMAL revenue ratios squared once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# ---------------------------------------------------------------------------
# q313 — Croston intermittent-demand forecast (alpha = 1/2), brand rollup


@query(
    "q313_croston_forecast",
    oracle="""
    WITH dd AS (
      SELECT l_partkey,
             DATE_DIFF('day', DATE '1970-01-01', l_shipdate) AS ed,
             SUM(CAST(ROUND(l_quantity, 2) AS DECIMAL(38,2))) AS qty
      FROM lineitem GROUP BY 1, 2
    ),
    seq AS (
      SELECT l_partkey, ed, qty,
             ROW_NUMBER() OVER w AS rn,
             COUNT(*) OVER (PARTITION BY l_partkey) AS n,
             ed - LAG(ed) OVER w AS gap
      FROM dd
      WINDOW w AS (PARTITION BY l_partkey ORDER BY ed)
    ),
    terms AS (
      SELECT l_partkey, n,
             CAST(ROUND(CAST(qty AS DOUBLE)
               * POWER(0.5, CASE WHEN rn = 1 THEN n - 1
                                 ELSE n - rn + 1 END), 12)
               AS DECIMAL(38,12)) AS zterm,
             CASE WHEN rn >= 2 THEN
               CAST(ROUND(gap
                 * POWER(0.5, CASE WHEN rn = 2 THEN n - 2
                                   ELSE n - rn + 1 END), 12)
                 AS DECIMAL(38,12))
             ELSE CAST(0 AS DECIMAL(38,12)) END AS pterm
      FROM seq WHERE n >= 2
    ),
    fc AS (
      SELECT l_partkey,
             CAST(SUM(zterm) AS DOUBLE)
               / CAST(SUM(pterm) AS DOUBLE) AS croston
      FROM terms GROUP BY l_partkey
    )
    SELECT p.p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(CAST(ROUND(f.croston, 9) AS DECIMAL(38,9)))
                 AS DOUBLE) / COUNT(*), 6) AS avg_daily_demand
    FROM fc f JOIN part p ON p.p_partkey = f.l_partkey
    GROUP BY p.p_brand ORDER BY brand
    """,
)
def q313_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's intermittent-demand forecast per part, rolled up to
    brand: demand sizes and inter-demand intervals get separate
    exponential smoothers (alpha = 1/2 — every weight an exact power
    of two, so the closed-form EWMA z_n = 0.5^(n-1) x_1 +
    sum 0.5^(n-i+1) x_i is engine-exact after 12-dp DECIMAL term
    rounding) and the demand rate is their ratio z/p — the method
    inventory systems use when most days sell zero. Scale: one
    (part, day) aggregate, one part-partitioned window sort, one
    brand rollup — shuffles ride natural keys throughout."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part")
    dd = li.groupBy(
        "l_partkey",
        F.datediff("l_shipdate", F.lit("1970-01-01").cast("date")).alias("ed"),
    ).agg(F.sum(F.round("l_quantity", 2).cast("decimal(38,2)")).alias("qty"))
    w = W.partitionBy("l_partkey").orderBy("ed")
    seq = dd.select(
        "l_partkey",
        "qty",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_partkey")).alias("n"),
        (F.col("ed") - F.lag("ed").over(w)).alias("gap"),
    ).filter(F.col("n") >= 2)
    zexp = F.when(F.col("rn") == 1, F.col("n") - 1).otherwise(
        F.col("n") - F.col("rn") + 1
    )
    pexp = F.when(F.col("rn") == 2, F.col("n") - 2).otherwise(
        F.col("n") - F.col("rn") + 1
    )
    dec12 = "decimal(38,12)"
    terms = seq.select(
        "l_partkey",
        F.round(F.col("qty").cast("double") * F.pow(F.lit(0.5), zexp), 12)
        .cast(dec12)
        .alias("zterm"),
        F.when(
            F.col("rn") >= 2,
            F.round(F.col("gap") * F.pow(F.lit(0.5), pexp), 12).cast(dec12),
        )
        .otherwise(F.lit(0).cast(dec12))
        .alias("pterm"),
    )
    fc = terms.groupBy("l_partkey").agg(
        (
            F.sum("zterm").cast("double") / F.sum("pterm").cast("double")
        ).alias("croston")
    )
    return (
        fc.join(part, fc.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.round(
                F.sum(F.round("croston", 9).cast("decimal(38,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_daily_demand"),
        )
        .orderBy("brand")
    )


# ---------------------------------------------------------------------------
# q314 — STL-style trend/seasonal strength per event type


@query(
    "q314_stl_strength",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value, 2) AS DECIMAL(38,2)))
               AS DECIMAL(38,2)) AS rev
      FROM events GROUP BY 1, 2
    ),
    ma AS (
      SELECT event_type, d, rev,
             SUM(rev) OVER w AS s7,
             COUNT(*) OVER w AS c7
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    ),
    detr AS (
      SELECT event_type, d,
             CAST(rev AS DOUBLE) - CAST(s7 AS DOUBLE) / c7 AS dt,
             CAST(s7 AS DOUBLE) / c7 AS trend
      FROM ma WHERE c7 = 7
    ),
    seas AS (
      SELECT event_type, DAYOFWEEK(d) AS dow,
             CAST(SUM(CAST(ROUND(dt, 6) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS s
      FROM detr GROUP BY 1, 2
    ),
    comp AS (
      SELECT de.event_type, de.dt - se.s AS r, se.s AS s, de.trend
      FROM detr de JOIN seas se
        ON se.event_type = de.event_type AND se.dow = DAYOFWEEK(de.d)
    ),
    mom AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(r, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sr,
             CAST(SUM(CAST(ROUND(r * r, 9) AS DECIMAL(38,9))) AS DOUBLE) AS srr,
             CAST(SUM(CAST(ROUND(s + r, 6) AS DECIMAL(38,6))) AS DOUBLE) AS ssr,
             CAST(SUM(CAST(ROUND((s + r) * (s + r), 9) AS DECIMAL(38,9)))
               AS DOUBLE) AS ssrr,
             CAST(SUM(CAST(ROUND(trend + r, 6) AS DECIMAL(38,6))) AS DOUBLE)
               AS str_,
             CAST(SUM(CAST(ROUND((trend + r) * (trend + r), 9)
               AS DECIMAL(38,9))) AS DOUBLE) AS strr
      FROM comp GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           ROUND(GREATEST(0.0, 1.0 - (srr / n - (sr / n) * (sr / n))
                 / (ssrr / n - (ssr / n) * (ssr / n))), 6)
             AS seasonal_strength,
           ROUND(GREATEST(0.0, 1.0 - (srr / n - (sr / n) * (sr / n))
                 / (strr / n - (str_ / n) * (str_ / n))), 6)
             AS trend_strength
    FROM mom ORDER BY event_type
    """,
)
def q314_stl_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-style decomposition strengths per event-type revenue
    series: trend = 7-day centered moving average (interior days
    only), seasonal = weekday mean of the detrended series,
    remainder = what's left; report Hyndman's strength diagnostics
    seasonal = max(0, 1 - Var(R)/Var(S+R)) and trend = max(0,
    1 - Var(R)/Var(T+R)) — the two numbers that say whether a series
    deserves seasonal modeling at all (q126 flags anomalies against
    a season table; this scores the decomposition itself). Scale:
    windows partition by event_type (never global); the MA sums 2-dp
    DECIMAL revenues exactly; variances assemble from 6/9-dp DECIMAL
    moment sums."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("d")
    ).agg(
        F.sum(F.round("value", 2).cast("decimal(38,2)"))
        .cast("decimal(38,2)")
        .alias("rev")
    )
    wma = (
        W.partitionBy("event_type").orderBy("d").rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "d",
        "rev",
        F.sum("rev").over(wma).alias("s7"),
        F.count(F.lit(1)).over(wma).alias("c7"),
    ).filter(F.col("c7") == 7)
    detr = ma.select(
        "event_type",
        "d",
        (F.col("rev").cast("double") - F.col("s7").cast("double") / F.col("c7"))
        .alias("dt"),
        (F.col("s7").cast("double") / F.col("c7")).alias("trend"),
    )
    seas = (
        detr.groupBy("event_type", F.dayofweek("d").alias("dow"))
        .agg(
            (
                F.sum(F.round("dt", 6).cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("s")
        )
        .select(
            F.col("event_type").alias("s_et"),
            F.col("dow").alias("s_dow"),
            "s",
        )
    )
    comp = (
        detr.withColumn("dow", F.dayofweek("d"))
        .join(
            F.broadcast(seas),
            (F.col("event_type") == F.col("s_et"))
            & (F.col("dow") == F.col("s_dow")),
        )
        .select(
            F.col("event_type").alias("et"),
            (F.col("dt") - F.col("s")).alias("r"),
            "s",
            "trend",
        )
    )
    def _m(col, scale):
        return F.sum(F.round(col, scale).cast(f"decimal(38,{scale})")).cast(
            "double"
        )

    mom = comp.groupBy(F.col("et").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        _m(F.col("r"), 6).alias("sr"),
        _m(F.col("r") * F.col("r"), 9).alias("srr"),
        _m(F.col("s") + F.col("r"), 6).alias("ssr"),
        _m((F.col("s") + F.col("r")) * (F.col("s") + F.col("r")), 9).alias(
            "ssrr"
        ),
        _m(F.col("trend") + F.col("r"), 6).alias("str_"),
        _m(
            (F.col("trend") + F.col("r")) * (F.col("trend") + F.col("r")), 9
        ).alias("strr"),
    )
    n = F.col("n")
    var_r = F.col("srr") / n - (F.col("sr") / n) * (F.col("sr") / n)
    var_sr = F.col("ssrr") / n - (F.col("ssr") / n) * (F.col("ssr") / n)
    var_tr = F.col("strr") / n - (F.col("str_") / n) * (F.col("str_") / n)
    return mom.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_r / var_sr), 6).alias(
            "seasonal_strength"
        ),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_r / var_tr), 6).alias(
            "trend_strength"
        ),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# q315 — Herfindahl-Hirschman supplier concentration per brand


@query(
    "q315_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT p.p_brand AS brand, l.l_suppkey AS supp,
             SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount), 4)
                 AS DECIMAL(38,4))) AS r
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    tot AS (SELECT brand, SUM(r) AS rt FROM rev GROUP BY brand)
    SELECT r.brand,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           ROUND(CAST(SUM(CAST(ROUND(10000
                 * (CAST(r.r AS DOUBLE) / CAST(t.rt AS DOUBLE))
                 * (CAST(r.r AS DOUBLE) / CAST(t.rt AS DOUBLE)), 9)
                 AS DECIMAL(38,9))) AS DOUBLE), 4) AS hhi,
           ROUND(MAX(CAST(r.r AS DOUBLE) / CAST(t.rt AS DOUBLE)), 6)
             AS top_share
    FROM rev r JOIN tot t ON t.brand = r.brand
    GROUP BY r.brand ORDER BY r.brand
    """,
)
def q315_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier concentration within
    each brand: HHI = 10000 * sum of squared revenue shares (the
    antitrust scale where <1500 is competitive and >2500 is
    concentrated), with the top supplier's share beside it. q166
    reports shares; this is the single-number concentration summary
    procurement risk reviews ask for. Scale: one (brand, supplier)
    revenue aggregate, brand totals broadcast back, squared shares
    accumulate 9-dp DECIMAL."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("l_suppkey").alias("supp"))
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
                ).cast("decimal(38,4)")
            ).alias("r")
        )
    )
    tot = rev.groupBy("brand").agg(F.sum("r").alias("rt"))
    share = F.col("r").cast("double") / F.col("rt").cast("double")
    return (
        rev.join(F.broadcast(tot), "brand")
        .groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.round(
                F.sum(
                    F.round(10000 * share * share, 9).cast("decimal(38,9)")
                ).cast("double"),
                4,
            ).alias("hhi"),
            F.round(F.max(share), 6).alias("top_share"),
        )
        .orderBy("brand")
    )
