"""Master-data batch 24 (q279-q280): survivorship golden-record
merging (the MDM move that q248's candidate pairs feed) and a
retention-decay curve fit (the exponential half-life summary on top
of q162's cohort triangle).

Determinism: survivorship picks values on a TOTAL (date, key) order
with IGNORE NULLS semantics identical on both engines; the decay fit
does its ln() terms at 7 dp over pooled integer retention shares and
assembles one straight-line OLS on the bounded age table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q279 — survivorship golden record


@query(
    "q279_golden_record",
    oracle="""
    WITH recs AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             CASE WHEN o_orderkey % 7 = 0 THEN NULL
                  ELSE o_orderpriority END AS priority_n,
             CASE WHEN o_orderkey % 5 = 0 THEN NULL
                  ELSE o_orderstatus END AS status_n
      FROM orders
    ),
    filled AS (
      SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             LAST_VALUE(priority_n IGNORE NULLS) OVER w AS last_priority,
             LAST_VALUE(status_n IGNORE NULLS) OVER w AS last_status,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC)
               AS rn_desc,
             COUNT(*) OVER (PARTITION BY o_custkey) AS n_records,
             MIN(o_orderdate) OVER (PARTITION BY o_custkey) AS first_seen
      FROM recs
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT o_custkey AS custkey,
           CAST(n_records AS BIGINT) AS n_records,
           CAST(first_seen AS DATE) AS first_seen,
           COALESCE(last_priority, 'UNKNOWN') AS priority,
           COALESCE(last_status, 'UNKNOWN') AS status,
           ROUND(o_totalprice, 2) AS latest_total
    FROM filled WHERE rn_desc = 1
    ORDER BY custkey
    """,
)
def q279_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship golden-record merge (the MDM step after duplicate
    detection): collapse each customer's record history into ONE
    master row where every field takes its most recent NON-NULL value
    — sparse records (nulls synthesized deterministically from the
    order key, since the corpus has none) must not erase previously
    known values. Field-level survivorship = last-non-null over the
    total (date, key) order; record-level attributes (latest total,
    first seen, record count) ride the same partition.

    Plan: ONE customer-partitioned Exchange carries all five window
    computations (two IGNORE-NULLS last-values, the descending rank,
    count, min) over the same sort; the golden rows are the rank-1
    filter. No joins, no second shuffle."""
    o = load_table(spark, sf_dir, "orders")
    recs = o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        F.when(F.col("o_orderkey") % 7 == 0, None)
        .otherwise(F.col("o_orderpriority"))
        .alias("priority_n"),
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderstatus"))
        .alias("status_n"),
    )
    wp = Window.partitionBy("o_custkey")
    w = wp.orderBy("o_orderdate", "o_orderkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    filled = recs.select(
        "o_custkey",
        "o_totalprice",
        F.last("priority_n", ignorenulls=True).over(w).alias("last_priority"),
        F.last("status_n", ignorenulls=True).over(w).alias("last_status"),
        F.row_number()
        .over(wp.orderBy(F.desc("o_orderdate"), F.desc("o_orderkey")))
        .alias("rn_desc"),
        F.count(F.lit(1)).over(wp).alias("n_records"),
        F.min("o_orderdate").over(wp).alias("first_seen"),
    )
    return (
        filled.filter(F.col("rn_desc") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("n_records").cast("bigint").alias("n_records"),
            F.col("first_seen").cast("date").alias("first_seen"),
            F.coalesce("last_priority", F.lit("UNKNOWN")).alias("priority"),
            F.coalesce("last_status", F.lit("UNKNOWN")).alias("status"),
            F.round("o_totalprice", 2).alias("latest_total"),
        )
        .orderBy("custkey")
    )


# ---------------------------------------------------------------------------
# q280 — retention decay fit


@query(
    "q280_retention_decay_fit",
    oracle="""
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    cohorts AS (
      SELECT user_id, MIN(week) AS cohort_week FROM activity GROUP BY user_id
    ),
    aged AS (
      SELECT a.user_id, c.cohort_week,
             CAST(date_diff('week', c.cohort_week, a.week) AS BIGINT) AS age
      FROM activity a JOIN cohorts c USING (user_id)
    ),
    max_age AS (SELECT MAX(age) AS m FROM aged),
    pooled AS (
      SELECT g.age,
             CAST(COUNT(DISTINCT g.user_id) AS BIGINT) AS active_users,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM cohorts c2
              WHERE date_diff('week', c2.cohort_week,
                    (SELECT MAX(week) FROM activity)) >= g.age) AS eligible_users
      FROM aged g WHERE g.age >= 1
      GROUP BY g.age
    ),
    terms AS (
      SELECT age,
             active_users, eligible_users,
             CAST(ROUND(ln(active_users * 1.0 / eligible_users), 7)
                  AS DECIMAL(38,7)) AS ln_r
      FROM pooled WHERE active_users > 0
    ),
    fit AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             SUM(age) AS sx, SUM(CAST(age * age AS BIGINT)) AS sxx,
             SUM(ln_r) AS sy,
             SUM(CAST(age AS DECIMAL(38,7)) * ln_r) AS sxy
      FROM terms
    )
    SELECT n AS n_ages,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 6) AS decay_b,
           ROUND(-0.6931471805599453
                 / NULLIF((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                    / NULLIF(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0.0), 0.0), 4)
             AS half_life_weeks
    FROM fit
    """,
)
def q280_retention_decay_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention decay fit: pool weekly cohort retention by age
    (active users at age k over users whose cohort is old enough to
    be observed at age k), fit ln(retention) = a + b·age by OLS over
    the bounded age axis, and report the decay slope and implied
    half-life (-ln2 / b) — the one-number summary of q162's cohort
    triangle that a growth team tracks release over release. ln2 is
    a literal (no runtime transcendental), retention ln terms round
    at 7 dp.

    Plan: distinct (user, week) collapse; cohort join rides the user
    key; the pooled table is age-bounded (weeks in span), the
    eligibility denominator is a broadcast of the cohort-week counts;
    the fit is one single-row moment aggregate."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    max_week = activity.agg(F.max("week").alias("max_week"))
    aged = activity.join(cohorts, "user_id").select(
        "user_id",
        (F.datediff("week", "cohort_week") / 7).cast("bigint").alias("age"),
    )
    active = (
        aged.filter(F.col("age") >= 1)
        .groupBy("age")
        .agg(F.count_distinct("user_id").cast("bigint").alias("active_users"))
    )
    cohort_ages = cohorts.join(F.broadcast(max_week)).select(
        (F.datediff("max_week", "cohort_week") / 7).cast("bigint").alias("max_obs_age")
    )
    # collapse cohorts to per-observable-age counts FIRST (weeks-bounded,
    # ~5 rows) so the eligibility theta-join is tiny×tiny — never a
    # users-sized broadcast
    cohort_age_counts = cohort_ages.groupBy("max_obs_age").agg(
        F.count(F.lit(1)).alias("n_cohort_users")
    )
    ages = active.select("age")
    eligible = (
        ages.join(
            F.broadcast(cohort_age_counts), F.col("max_obs_age") >= F.col("age")
        )
        .groupBy("age")
        .agg(F.sum("n_cohort_users").cast("bigint").alias("eligible_users"))
    )
    terms = (
        active.join(eligible, "age")
        .filter(F.col("active_users") > 0)
        .select(
            "age",
            "active_users",
            "eligible_users",
            F.round(
                F.log(F.col("active_users") * 1.0 / F.col("eligible_users")), 7
            )
            .cast("decimal(38,7)")
            .alias("ln_r"),
        )
    )
    fit = terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("age").alias("sx"),
        F.sum((F.col("age") * F.col("age")).cast("bigint")).alias("sxx"),
        F.sum("ln_r").alias("sy"),
        F.sum(F.col("age").cast("decimal(38,7)") * F.col("ln_r")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    # NULLIF guards: with a single observable age (tiny spans) the OLS
    # denominator is 0 — report NULL slope/half-life, never a crash
    denom = F.nullif(
        nd * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double"),
        F.lit(0.0),
    )
    slope = (
        nd * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    ) / denom
    return fit.select(
        F.col("n").alias("n_ages"),
        F.round(slope, 6).alias("decay_b"),
        F.round(
            F.lit(-0.6931471805599453) / F.nullif(slope, F.lit(0.0)), 4
        ).alias("half_life_weeks"),
    )
