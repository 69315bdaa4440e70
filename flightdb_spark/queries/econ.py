"""Econometrics batch 25 (q281-q283): weekday seasonality indices
(the retail calendar-effect table), log-log price elasticity per
product type (the demand-curve slope), and the ABC-XYZ inventory
classification matrix (value concentration x demand variability —
the planning grid q152's ABC is one axis of).

Determinism: seasonal indices are one double division over exact
DECIMAL sums; elasticity ln terms round at 7 dp into DECIMAL moment
sums (DETERMINISM.md §5); CV thresholds compare straight-line doubles
computed identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

_DEC6 = "decimal(38,6)"
_DEC7 = "decimal(38,7)"


# ---------------------------------------------------------------------------
# q281 — weekday seasonality index


@query(
    "q281_weekday_seasonality",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             -- DuckDB dayofweek is 0=Sunday..6; Spark's is 1=Sunday..7 —
             -- +1 aligns the numbering
             CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
             SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(38,6))) AS rev
      FROM orders GROUP BY day, dow
    ),
    per_dow AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days, SUM(rev) AS rev
      FROM daily GROUP BY dow
    ),
    tot AS (
      SELECT SUM(rev) AS trev, SUM(n_days) AS tdays FROM per_dow
    )
    SELECT dow, n_days,
           ROUND(CAST(p.rev AS DOUBLE) / CAST(p.n_days AS DOUBLE), 2)
             AS avg_daily_rev,
           ROUND((CAST(p.rev AS DOUBLE) / CAST(p.n_days AS DOUBLE))
                 / (CAST(t.trev AS DOUBLE) / CAST(t.tdays AS DOUBLE)), 6)
             AS seasonal_index
    FROM per_dow p CROSS JOIN tot t
    ORDER BY dow
    """,
)
def q281_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality indices: average daily revenue per
    day-of-week relative to the overall daily average — index > 1
    marks the heavy weekdays, the calendar-effect table demand
    planning deseasonalizes with (and q126's residual decomposition
    assumes known).

    Plan: one shuffle to the (day, dow) DECIMAL daily table; the
    7-row per-weekday rollup and the single-row total broadcast back
    — divisions happen once per output row, straight-line."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
        F.dayofweek("o_orderdate").cast("bigint").alias("dow"),
    ).agg(F.sum(F.round(F.col("o_totalprice"), 6).cast(_DEC6)).alias("rev"))
    per_dow = daily.groupBy("dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"), F.sum("rev").alias("rev")
    )
    tot = per_dow.agg(
        F.sum("rev").alias("trev"), F.sum("n_days").alias("tdays")
    )
    avg_daily = F.col("rev").cast("double") / F.col("n_days").cast("double")
    overall = F.col("trev").cast("double") / F.col("tdays").cast("double")
    return (
        per_dow.join(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            F.round(avg_daily, 2).alias("avg_daily_rev"),
            F.round(avg_daily / overall, 6).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


# ---------------------------------------------------------------------------
# q282 — log-log price elasticity


@query(
    "q282_price_elasticity",
    oracle="""
    WITH obs AS (
      SELECT p.p_type,
             CAST(ROUND(ln(l.l_quantity), 7) AS DECIMAL(38,7)) AS ln_q,
             CAST(ROUND(ln(l.l_extendedprice / l.l_quantity), 7)
                  AS DECIMAL(38,7)) AS ln_p
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity > 0 AND l.l_extendedprice > 0
    ),
    mom AS (
      SELECT p_type, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(ln_p) AS sx, SUM(ln_q) AS sy,
             SUM(CAST(ln_p * ln_p AS DECIMAL(38,14))) AS sxx,
             SUM(CAST(ln_p * ln_q AS DECIMAL(38,14))) AS sxy
      FROM obs GROUP BY p_type
    )
    SELECT p_type, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6)
             AS elasticity
    FROM mom
    ORDER BY p_type
    """,
)
def q282_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-log price elasticity of demand per product type: the OLS
    slope of ln(quantity) on ln(unit price) — the demand-curve
    exponent pricing teams read as "% quantity change per % price
    change". ln terms at 7 dp into DECIMAL moment sums; the slope is
    one straight-line double per 6-row type group.

    Plan: part broadcasts onto lineitem; one shuffle to the 6-key
    moment aggregate (map-side partials); NULLIF guards a
    degenerate zero-variance group."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    obs = (
        li.filter((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "p_type",
            F.round(F.log("l_quantity"), 7).cast(_DEC7).alias("ln_q"),
            F.round(
                F.log(F.col("l_extendedprice") / F.col("l_quantity")), 7
            )
            .cast(_DEC7)
            .alias("ln_p"),
        )
    )
    mom = obs.groupBy("p_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ln_p").alias("sx"),
        F.sum("ln_q").alias("sy"),
        F.sum((F.col("ln_p") * F.col("ln_p")).cast("decimal(38,14)")).alias("sxx"),
        F.sum((F.col("ln_p") * F.col("ln_q")).cast("decimal(38,14)")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    denom = F.nullif(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double"),
        F.lit(0.0),
    )
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / denom
    return mom.select("p_type", "n", F.round(slope, 6).alias("elasticity")).orderBy(
        "p_type"
    )


# ---------------------------------------------------------------------------
# q283 — ABC-XYZ classification matrix


@query(
    "q283_abc_xyz_matrix",
    oracle="""
    WITH daily AS (
      SELECT l_partkey, CAST(date_trunc('day', l_shipdate) AS DATE) AS day,
             SUM(CAST(l_quantity AS BIGINT)) AS qty,
             SUM(CAST(ROUND(l_extendedprice, 6) AS DECIMAL(38,6))) AS rev
      FROM lineitem GROUP BY l_partkey, day
    ),
    per_part AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             SUM(rev) AS rev,
             SUM(qty) AS s1,
             SUM(qty * qty) AS s2
      FROM daily GROUP BY l_partkey
      HAVING COUNT(*) >= 5
    ),
    tot AS (SELECT SUM(rev) AS trev FROM per_part),
    classed AS (
      SELECT p.l_partkey,
             CASE WHEN CAST(p.rev AS DOUBLE) >= 0.001 * CAST(t.trev AS DOUBLE)
                  THEN 'A'
                  WHEN CAST(p.rev AS DOUBLE) >= 0.0004 * CAST(t.trev AS DOUBLE)
                  THEN 'B' ELSE 'C' END AS abc,
             CASE WHEN sqrt((CAST(p.n_days AS DOUBLE) * CAST(p.s2 AS DOUBLE)
                             - CAST(p.s1 AS DOUBLE) * CAST(p.s1 AS DOUBLE))
                            / (CAST(p.n_days AS DOUBLE)
                               * (CAST(p.n_days AS DOUBLE) - 1.0)))
                       / (CAST(p.s1 AS DOUBLE) / CAST(p.n_days AS DOUBLE)) < 0.6
                  THEN 'X'
                  WHEN sqrt((CAST(p.n_days AS DOUBLE) * CAST(p.s2 AS DOUBLE)
                             - CAST(p.s1 AS DOUBLE) * CAST(p.s1 AS DOUBLE))
                            / (CAST(p.n_days AS DOUBLE)
                               * (CAST(p.n_days AS DOUBLE) - 1.0)))
                       / (CAST(p.s1 AS DOUBLE) / CAST(p.n_days AS DOUBLE)) < 1.0
                  THEN 'Y' ELSE 'Z' END AS xyz
      FROM per_part p CROSS JOIN tot t
    )
    SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM classed
    GROUP BY abc, xyz
    ORDER BY abc, xyz
    """,
)
def q283_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ classification matrix: every part placed on the
    value-concentration axis (A/B/C by revenue share thresholds —
    q152's axis) crossed with the demand-variability axis (X/Y/Z by
    the coefficient of variation of daily demand, thresholds
    0.6/1.0) — the 9-cell inventory-planning grid (A-X: automate,
    C-Z: don't bother forecasting). CV comes from exact integer
    moments; every comparison is a straight-line double identical on
    both engines.

    Plan: one shuffle to (part, day) demand; one to the per-part
    moment row; the revenue total is one broadcast row; the matrix
    is a 9-key aggregate."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    daily = li.groupBy(
        "l_partkey", F.date_trunc("day", "l_shipdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("l_quantity").cast("bigint")).alias("qty"),
        F.sum(F.round(F.col("l_extendedprice"), 6).cast(_DEC6)).alias("rev"),
    )
    per_part = (
        daily.groupBy("l_partkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("rev").alias("rev"),
            F.sum("qty").alias("s1"),
            F.sum(F.col("qty") * F.col("qty")).alias("s2"),
        )
        .filter(F.col("n_days") >= 5)
    )
    tot = per_part.agg(F.sum("rev").alias("trev"))
    nd = F.col("n_days").cast("double")
    s1d = F.col("s1").cast("double")
    s2d = F.col("s2").cast("double")
    cv = F.sqrt((nd * s2d - s1d * s1d) / (nd * (nd - 1.0))) / (s1d / nd)
    revd = F.col("rev").cast("double")
    trevd = F.col("trev").cast("double")
    abc = (
        F.when(revd >= 0.001 * trevd, "A")
        .when(revd >= 0.0004 * trevd, "B")
        .otherwise("C")
    )
    xyz = F.when(cv < 0.6, "X").when(cv < 1.0, "Y").otherwise("Z")
    return (
        per_part.join(F.broadcast(tot))
        .select(abc.alias("abc"), xyz.alias("xyz"))
        .groupBy("abc", "xyz")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .orderBy("abc", "xyz")
    )
