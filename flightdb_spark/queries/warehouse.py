"""Warehouse-maintenance batch (q174-q177): incremental aggregate
maintenance, SCD Type-2 dimension building, CDC last-wins upsert
(MERGE semantics), and range-partition planning.

Like queries/layout.py these are engine-side surfaces with no
reference analog — the maintenance DML/DDL half of a 100 TB
deployment: keep rollups fresh without recomputing, version dimension
attributes, apply change feeds idempotently, and pick balanced range
boundaries before a clustered write. All bounded-aggregate /
co-partitioned-join compositions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query

_CUTOVER = "2024-01-21"  # base = days before, delta = days from


@query(
    "q174_incremental_rollup",
    oracle=f"""
    WITH base AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS s
      FROM events WHERE ts < TIMESTAMP '{_CUTOVER}'
      GROUP BY event_type, day
    ),
    delta AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS s
      FROM events WHERE ts >= TIMESTAMP '{_CUTOVER}'
      GROUP BY event_type, day
    ),
    merged AS (
      SELECT event_type, day, SUM(n) AS n, SUM(s) AS s
      FROM (SELECT * FROM base UNION ALL SELECT * FROM delta)
      GROUP BY event_type, day
    ),
    full_rc AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS n, SUM(CAST(ROUND(value, 6) AS DECIMAL(38,6))) AS s
      FROM events GROUP BY event_type, day
    )
    SELECT m.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(m.n) AS BIGINT) AS total_events,
           ROUND(CAST(SUM(m.s) AS DOUBLE), 2) AS total_value,
           BOOL_AND(m.n = f.n AND m.s = f.s) AS matches_full
    FROM merged m JOIN full_rc f ON f.event_type = m.event_type AND f.day = m.day
    GROUP BY m.event_type ORDER BY m.event_type
    """,
)
def q174_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: a daily rollup kept as
    mergeable partials (count + DECIMAL sum per (type, day)) absorbs a
    new-data delta by partial-union-reaggregate — never by
    recomputing history — and the audit proves merge == full
    recompute cell-for-cell. This is THE pattern that keeps a 100 TB
    rollup fresh (commutative partials = Spark's own partial-agg
    contract, lifted to storage). Plan: three bounded aggregates on
    the same (type, day) key, one co-partitioned equality join; the
    DECIMAL partials make merge order irrelevant."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_CUTOVER).cast("timestamp")
    day = F.col("ts").cast("date").alias("day")
    val6 = F.round("value", 6).cast("decimal(38,6)")

    def rollup(df: DataFrame) -> DataFrame:
        return df.groupBy("event_type", day).agg(
            F.count(F.lit(1)).alias("n"), F.sum(val6).alias("s")
        )

    base = rollup(ev.filter(F.col("ts") < cut))
    delta = rollup(ev.filter(F.col("ts") >= cut))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    )
    full = rollup(ev).select(
        F.col("event_type").alias("f_type"),
        F.col("day").alias("f_day"),
        F.col("n").alias("f_n"),
        F.col("s").alias("f_s"),
    )
    return (
        merged.join(
            full,
            (F.col("event_type") == F.col("f_type")) & (F.col("day") == F.col("f_day")),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("n").alias("total_events"),
            F.round(F.sum("s").cast("double"), 2).alias("total_value"),
            F.min(
                (F.col("n") == F.col("f_n")) & (F.col("s") == F.col("f_s"))
            ).alias("matches_full"),
        )
        .orderBy("event_type")
    )


@query(
    "q175_scd2_intervals",
    oracle="""
    WITH ranked AS (
      SELECT user_id, CAST(ts AS DATE) AS day, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ),
    daily AS (
      SELECT user_id, day, event_type AS attr FROM ranked WHERE rn = 1
    ),
    runs AS (
      SELECT user_id, day, attr,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
           - ROW_NUMBER() OVER (PARTITION BY user_id, attr ORDER BY day) AS grp
      FROM daily
    )
    SELECT user_id, attr,
           MIN(day) AS valid_from, MAX(day) AS valid_to,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM runs GROUP BY user_id, attr, grp
    ORDER BY user_id, valid_from
    """,
)
def q175_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build: each user's daily attribute (the
    type of their last event that day, (ts, event_id)-deterministic)
    collapses into validity intervals [valid_from, valid_to] via
    gaps-and-islands — the versioned-dimension table a warehouse
    maintains for as-of joins (q79's consumer side). Plan: one
    shuffle on user_id serves the daily collapse AND both run-id
    windows (same partition key); intervals are a bounded per-user
    aggregate. Active days are consecutive observations, so runs
    break on attribute change (the q15 island discipline)."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(
            F.max_by("event_type", F.struct("ts", "event_id")).alias("attr")
        )
    )
    w_all = Window.partitionBy("user_id").orderBy("day")
    w_attr = Window.partitionBy("user_id", "attr").orderBy("day")
    runs = daily.withColumn(
        "grp", F.row_number().over(w_all) - F.row_number().over(w_attr)
    )
    return (
        runs.groupBy("user_id", "attr", "grp")
        .agg(
            F.min("day").alias("valid_from"),
            F.max("day").alias("valid_to"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .drop("grp")
        .select("user_id", "attr", "valid_from", "valid_to", "n_days")
        .orderBy("user_id", "valid_from")
    )


@query(
    "q176_cdc_upsert",
    oracle=f"""
    WITH ranked_b AS (
      SELECT user_id, event_type, ROUND(value, 6) AS val6,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts < TIMESTAMP '{_CUTOVER}'
    ),
    base AS (
      SELECT user_id, event_type AS attr, val6 AS val FROM ranked_b WHERE rn = 1
    ),
    ranked_c AS (
      SELECT user_id, event_type, ROUND(value, 6) AS val6,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{_CUTOVER}'
    ),
    changes AS (
      SELECT user_id, event_type AS attr, val6 AS val FROM ranked_c WHERE rn = 1
    ),
    merged AS (
      SELECT COALESCE(b.user_id, c.user_id) AS user_id,
             CASE
               WHEN c.user_id IS NULL THEN 'unchanged'
               WHEN c.attr = 'error' THEN 'deleted'
               WHEN b.user_id IS NULL THEN 'inserted'
               ELSE 'updated'
             END AS outcome,
             COALESCE(c.val, b.val) AS val
      FROM base b FULL OUTER JOIN changes c ON c.user_id = b.user_id
    )
    SELECT outcome,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           ROUND(CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE), 2) AS sum_val
    FROM merged GROUP BY outcome ORDER BY outcome
    """,
)
def q176_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE semantics: the post-cutover change feed collapses to
    one last-wins row per key ((ts, event_id)-deterministic), then
    full-outer-merges into the base snapshot — insert / update /
    delete (tombstone = a final 'error' event) / unchanged, the
    outcome audit a lakehouse MERGE INTO reports. Plan: both sides
    collapse map-side into (key, last) aggregates on the SAME user_id
    shuffle the merge join reuses; the feed never replays row-by-row.
    Idempotent by construction: re-applying the same feed yields the
    same outcomes."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(_CUTOVER).cast("timestamp")
    order = F.struct("ts", "event_id")

    def collapse(df: DataFrame, prefix: str) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.max_by("event_type", order).alias(f"{prefix}_attr"),
            F.max_by(F.round("value", 6), order).alias(f"{prefix}_val"),
        )

    base = collapse(ev.filter(F.col("ts") < cut), "b").withColumnRenamed(
        "user_id", "b_user"
    )
    changes = collapse(ev.filter(F.col("ts") >= cut), "c").withColumnRenamed(
        "user_id", "c_user"
    )
    merged = base.join(
        changes, F.col("b_user") == F.col("c_user"), "full_outer"
    ).select(
        F.coalesce("b_user", "c_user").alias("user_id"),
        F.when(F.col("c_user").isNull(), "unchanged")
        .when(F.col("c_attr") == "error", "deleted")
        .when(F.col("b_user").isNull(), "inserted")
        .otherwise("updated")
        .alias("outcome"),
        F.coalesce("c_val", "b_val").alias("val"),
    )
    return (
        merged.groupBy("outcome")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.round(
                F.sum(F.col("val").cast("decimal(38,6)")).cast("double"), 2
            ).alias("sum_val"),
        )
        .orderBy("outcome")
    )


_RANGE_PARTS = 8


@query(
    "q177_range_partition_plan",
    oracle=f"""
    WITH edges AS (
      SELECT list_transform(
               quantile_cont(value, [{", ".join(str(i / _RANGE_PARTS) for i in range(1, _RANGE_PARTS))}]),
               x -> ROUND(x, 6)) AS e
      FROM events
    ),
    assigned AS (
      SELECT v.value,
             len(list_filter(e.e, x -> x < v.value)) AS part_id
      FROM events v, edges e
    ),
    tot AS (SELECT COUNT(*) AS n FROM events)
    SELECT CAST(a.part_id AS BIGINT) AS part_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(MIN(a.value), 2) AS min_val,
           ROUND(MAX(a.value), 2) AS max_val,
           ROUND(COUNT(*) * {_RANGE_PARTS}.0 / t.n, 4) AS balance_ratio
    FROM assigned a, tot t
    GROUP BY a.part_id, t.n ORDER BY a.part_id
    """,
)
def q177_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition planning: exact 1/{_RANGE_PARTS} quantile
    boundaries of the sort column, partition assignment by edge
    count, and the per-partition balance audit (ratio vs the ideal
    even share) — what repartitionByRange's sampler does, made
    explicit and auditable before a clustered write (q170's
    companion). Plan: one bounded percentile aggregate broadcast back
    over the scan (edge placement affects BALANCE, never
    correctness); assignment is a map-side array count; the audit is
    one bounded rollup. At 100 TB swap approx_percentile — same plan,
    documented sampler tolerance."""
    ev = load_table(spark, sf_dir, "events")
    qs = [i / _RANGE_PARTS for i in range(1, _RANGE_PARTS)]
    edges = ev.agg(
        F.expr(
            "transform(percentile(value, array("
            + ", ".join(str(q) for q in qs)
            + ")), x -> round(x, 6))"
        ).alias("e")
    )
    n_total = ev.agg(F.count(F.lit(1)).alias("n"))
    assigned = (
        ev.select("value")
        .join(F.broadcast(edges))
        .withColumn(
            "part_id",
            F.size(F.filter("e", lambda x: x < F.col("value"))).cast("long"),
        )
    )
    return (
        assigned.join(F.broadcast(n_total))
        .groupBy("part_id", "n")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("value"), 2).alias("min_val"),
            F.round(F.max("value"), 2).alias("max_val"),
            F.round(
                F.count(F.lit(1)) * float(_RANGE_PARTS) / F.col("n"), 4
            ).alias("balance_ratio"),
        )
        .drop("n")
        .orderBy("part_id")
    )
