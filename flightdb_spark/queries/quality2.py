"""Quality-control batch 49 (q345-q347): an order-statistics battery
(mean / continuous and discrete medians / 10%-trimmed mean /
deterministic mode — the location estimates a robust report prints
side by side, completing q95 winsorize and q116 MAD), a Shewhart
X-bar/R control chart (the SPC standard: daily subgroup means and
ranges against control limits derived from the average range), and a
charm-pricing audit (how much of the catalog ends in .9x — the
retail pricing-psychology scan).

Determinism: percentiles are exact with identical interpolation on
both engines; the mode uses an explicit (count DESC, value ASC)
tie-break instead of the engines' nondeterministic mode();
control-limit constants are literals; all sums ride DECIMAL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# ---------------------------------------------------------------------------
# q345 — order-statistics battery


@query(
    "q345_order_statistics",
    oracle="""
    WITH vals AS (
      SELECT event_type, ROUND(value, 6) AS v FROM events
    ),
    cuts AS (
      SELECT event_type,
             quantile_cont(v, 0.5) AS med_cont,
             quantile_disc(v, 0.5) AS med_disc,
             quantile_cont(v, 0.1) AS p10,
             quantile_cont(v, 0.9) AS p90
      FROM vals GROUP BY event_type
    ),
    trimmed AS (
      SELECT v.event_type,
             CAST(SUM(CAST(v.v AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
               AS trim_mean
      FROM vals v JOIN cuts c ON c.event_type = v.event_type
      WHERE v.v >= c.p10 AND v.v <= c.p90
      GROUP BY v.event_type
    ),
    modes AS (
      SELECT event_type, iv AS mode_val FROM (
        SELECT event_type, CAST(FLOOR(v) AS BIGINT) AS iv, COUNT(*) AS c,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY COUNT(*) DESC, CAST(FLOOR(v)
                                  AS BIGINT)) AS rn
        FROM vals GROUP BY event_type, iv
      ) WHERE rn = 1
    ),
    means AS (
      SELECT event_type,
             CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
               AS mean_v,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM vals GROUP BY event_type
    )
    SELECT m.event_type, m.n,
           ROUND(m.mean_v, 6) AS mean_v,
           ROUND(c.med_cont, 6) AS median_cont,
           ROUND(c.med_disc, 6) AS median_disc,
           ROUND(t.trim_mean, 6) AS trimmed_mean,
           mo.mode_val AS mode_bucket
    FROM means m
    JOIN cuts c ON c.event_type = m.event_type
    JOIN trimmed t ON t.event_type = m.event_type
    JOIN modes mo ON mo.event_type = m.event_type
    ORDER BY m.event_type
    """,
)
def q345_order_statistics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistics battery per event type: mean, continuous
    median (linear interpolation), discrete median (an actual data
    value), 10%-trimmed mean (between exact p10/p90), and the modal
    integer bucket with a deterministic (count DESC, value ASC)
    tie-break — the engines' own mode() is tie-nondeterministic, so
    the battery derives it explicitly. Scale: one percentile
    aggregate per type, one trimmed re-aggregate through broadcast
    cutpoints, one bucket-count window on the aggregated buckets."""
    ev = load_table(spark, sf_dir, "events")
    vals = ev.select("event_type", F.round("value", 6).alias("v"))
    cuts = vals.groupBy("event_type").agg(
        F.percentile("v", 0.5).alias("med_cont"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias(
            "med_disc"
        ),
        F.percentile("v", 0.1).alias("p10"),
        F.percentile("v", 0.9).alias("p90"),
    )
    trimmed = (
        vals.join(F.broadcast(cuts.select("event_type", "p10", "p90")),
                  "event_type")
        .filter((F.col("v") >= F.col("p10")) & (F.col("v") <= F.col("p90")))
        .groupBy("event_type")
        .agg(
            (
                F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("trim_mean")
        )
    )
    wmode = W.partitionBy("event_type").orderBy(
        F.col("c").desc(), F.col("iv").asc()
    )
    modes = (
        vals.groupBy("event_type", F.floor("v").cast("bigint").alias("iv"))
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(wmode))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("iv").alias("mode_bucket"))
    )
    means = vals.groupBy("event_type").agg(
        (
            F.sum(F.col("v").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_v"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    return (
        means.join(cuts.select("event_type", "med_cont", "med_disc"),
                   "event_type")
        .join(trimmed, "event_type")
        .join(modes, "event_type")
        .select(
            "event_type",
            "n",
            F.round("mean_v", 6).alias("mean_v"),
            F.round("med_cont", 6).alias("median_cont"),
            F.round("med_disc", 6).alias("median_disc"),
            F.round("trim_mean", 6).alias("trimmed_mean"),
            "mode_bucket",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# q346 — Shewhart X-bar / R control chart

# Standard SPC constants for subgroup statistics from the average
# range; the subgroup here is each day's first 5 events per type is
# too fiddly — we use ALL events per day and the d2-free sigma-hat
# from the mean absolute daily range of a fixed-size lead window.
# Constants for n=5 subgroups (literals on both engines):
SPC_A2 = 0.577
SPC_D3 = 0.0
SPC_D4 = 2.114


@query(
    "q346_spc_xbar_chart",
    oracle=f"""
    WITH seq AS (
      SELECT CAST(ts AS DATE) AS d, value,
             ROW_NUMBER() OVER (PARTITION BY CAST(ts AS DATE)
                                ORDER BY event_id) AS rn
      FROM events WHERE event_type = 'purchase'
    ),
    sub AS (  -- subgroup: first 5 purchases per day
      SELECT d,
             CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*) AS xbar,
             MAX(value) - MIN(value) AS r,
             COUNT(*) AS n
      FROM seq WHERE rn <= 5
      GROUP BY d HAVING COUNT(*) = 5
    ),
    lims AS (
      SELECT CAST(SUM(CAST(ROUND(xbar, 9) AS DECIMAL(38,9))) AS DOUBLE)
               / COUNT(*) AS xbb,
             CAST(SUM(CAST(ROUND(r, 9) AS DECIMAL(38,9))) AS DOUBLE)
               / COUNT(*) AS rbar
      FROM sub
    )
    SELECT s.d,
           ROUND(s.xbar, 6) AS xbar,
           ROUND(s.r, 6) AS subgroup_range,
           ROUND(l.xbb + {SPC_A2!r} * l.rbar, 6) AS ucl_x,
           ROUND(l.xbb - {SPC_A2!r} * l.rbar, 6) AS lcl_x,
           CAST(CASE WHEN s.xbar > l.xbb + {SPC_A2!r} * l.rbar
                       OR s.xbar < l.xbb - {SPC_A2!r} * l.rbar
                     THEN 1 ELSE 0 END AS INT) AS out_of_control_x,
           CAST(CASE WHEN s.r > {SPC_D4!r} * l.rbar
                       OR s.r < {SPC_D3!r} * l.rbar
                     THEN 1 ELSE 0 END AS INT) AS out_of_control_r
    FROM sub s, lims l
    ORDER BY s.d
    """,
)
def q346_spc_xbar_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart X-bar/R control chart over daily purchase subgroups
    (first 5 purchases each day, in arrival order): subgroup means
    and ranges plotted against control limits X-double-bar +/- A2*R-bar
    and [D3, D4]*R-bar with the standard n=5 constants — the SPC
    chart that separates common-cause noise from assignable-cause
    shifts (q138's CUSUM accumulates small drifts; this flags big
    ones point-wise). Scale: one day-partitioned window picks
    subgroups, two tiny aggregates set the limits, broadcast back."""
    ev = load_table(spark, sf_dir, "events")
    seq = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("ts").cast("date").alias("d"),
            "value",
            F.row_number().over(
                W.partitionBy(F.col("ts").cast("date")).orderBy("event_id")
            ).alias("rn"),
        )
    )
    sub = (
        seq.filter(F.col("rn") <= 5)
        .groupBy("d")
        .agg(
            (
                F.sum(F.round("value", 6).cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("xbar"),
            (F.max("value") - F.min("value")).alias("r"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") == 5)
    )
    lims = sub.agg(
        (
            F.sum(F.round("xbar", 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("xbb"),
        (
            F.sum(F.round("r", 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("rbar"),
    )
    ucl = F.col("xbb") + SPC_A2 * F.col("rbar")
    lcl = F.col("xbb") - SPC_A2 * F.col("rbar")
    return (
        sub.join(F.broadcast(lims))
        .select(
            "d",
            F.round("xbar", 6).alias("xbar"),
            F.round("r", 6).alias("subgroup_range"),
            F.round(ucl, 6).alias("ucl_x"),
            F.round(lcl, 6).alias("lcl_x"),
            F.when((F.col("xbar") > ucl) | (F.col("xbar") < lcl), 1)
            .otherwise(0)
            .cast("int")
            .alias("out_of_control_x"),
            F.when(
                (F.col("r") > SPC_D4 * F.col("rbar"))
                | (F.col("r") < SPC_D3 * F.col("rbar")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("out_of_control_r"),
        )
        .orderBy("d")
    )


# ---------------------------------------------------------------------------
# q347 — charm-pricing audit


@query(
    "q347_charm_pricing",
    oracle="""
    WITH priced AS (
      SELECT p_brand,
             CAST(ROUND(p_retailprice * 100, 0) AS BIGINT) % 100 AS cents
      FROM part
    )
    SELECT p_brand AS brand,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN cents >= 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_charm,
           CAST(SUM(CASE WHEN cents = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_round,
           ROUND(SUM(CASE WHEN cents >= 90 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS charm_rate
    FROM priced GROUP BY p_brand ORDER BY brand
    """,
)
def q347_charm_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charm-pricing audit: per brand, the share of catalog prices
    ending in .90-.99 (psychological endings) vs exact round prices —
    the pricing-strategy scan merchandising runs on a catalog (q295
    measures ladder GAPS; this measures ending conventions). Cents
    are exact integers via round-then-mod, so no float ending is
    misclassified. Scale: map-only arithmetic, one brand aggregate."""
    part = ensure_parallelism(load_table(spark, sf_dir, "part"))
    cents = (
        F.round(F.col("p_retailprice") * 100, 0).cast("bigint") % 100
    )
    priced = part.select(F.col("p_brand").alias("brand"), cents.alias("cents"))
    charm = F.when(F.col("cents") >= 90, 1).otherwise(0)
    return (
        priced.groupBy("brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum(charm).cast("bigint").alias("n_charm"),
            F.sum(F.when(F.col("cents") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_round"),
            F.round(F.sum(charm) * 1.0 / F.count(F.lit(1)), 6).alias(
                "charm_rate"
            ),
        )
        .orderBy("brand")
    )
