"""Data-integrity batch 21 (q270-q272): completeness audits beside
q160's FK orphans — calendar gap detection (days a series went
silent), duplicate-payment candidate pairs (the fraud-ops time-bucket
self-join), and mixture coverage holes (empty cells in the
source x lang grid a dataset card promises to fill).

Determinism: everything is integer counts, date arithmetic and
equi-joins; the only doubles are rounded per row before output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q270 — calendar gap detection


@query(
    "q270_calendar_gaps",
    oracle="""
    WITH span AS (
      SELECT MIN(CAST(o_orderdate AS DATE)) AS lo,
             MAX(CAST(o_orderdate AS DATE)) AS hi
      FROM orders
    ),
    cal AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    ),
    pri AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
    grid AS (SELECT priority, day FROM pri CROSS JOIN cal),
    obs AS (
      SELECT DISTINCT o_orderpriority AS priority, CAST(o_orderdate AS DATE) AS day
      FROM orders
    ),
    missing AS (SELECT * FROM grid ANTI JOIN obs USING (priority, day))
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_missing_days,
           MIN(day) AS first_missing,
           MAX(day) AS last_missing
    FROM missing
    GROUP BY priority
    ORDER BY priority
    """,
)
def q270_calendar_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap audit: for each order-priority series, the days in
    the table's global date span with NO orders — the went-silent
    check a freshness monitor runs per partition key. The expected
    calendar derives from the data's own min/max (one single-row
    aggregate exploded via sequence — never a driver-side date loop).

    Plan: the calendar x key grid is (span-days x 5 keys), built from
    two broadcast-sized frames; the observed (key, day) set collapses
    via distinct (one shuffle of the pruned 2-column scan); the gap
    set is a broadcast LEFT ANTI of grid against observed (grid is
    the small side at any scale — keys x days, not rows)."""
    o = load_table(spark, sf_dir, "orders")
    span = o.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("lo"),
        F.max(F.col("o_orderdate").cast("date")).alias("hi"),
    )
    cal = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    pri = o.select(F.col("o_orderpriority").alias("priority")).distinct()
    grid = F.broadcast(pri).join(F.broadcast(cal))
    obs = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").cast("date").alias("day"),
    ).distinct()
    missing = grid.join(obs, ["priority", "day"], "left_anti")
    return (
        missing.groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_missing_days"),
            F.min("day").alias("first_missing"),
            F.max("day").alias("last_missing"),
        )
        .orderBy("priority")
    )


# ---------------------------------------------------------------------------
# q271 — duplicate-payment candidates


@query(
    "q271_duplicate_payments",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id,
             CAST(FLOOR(value / 5) AS BIGINT) AS amount_bucket,
             CAST(ROUND(value, 2) AS DECIMAL(12,2)) AS amount,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS e,
             CAST(FLOOR(FLOOR(epoch(ts)) / 7200) AS BIGINT) AS slot
      FROM events WHERE event_type = 'purchase'
    ),
    expanded AS (
      SELECT event_id, user_id, amount_bucket, amount, e, slot FROM p
      UNION ALL
      SELECT event_id, user_id, amount_bucket, amount, e, slot + 1 FROM p
      UNION ALL
      SELECT event_id, user_id, amount_bucket, amount, e, slot - 1 FROM p
    )
    SELECT a.event_id AS event_a, b.event_id AS event_b,
           a.user_id AS user_id, a.amount AS amount_a, b.amount AS amount_b,
           CAST(ABS(a.e - b.e) AS BIGINT) AS gap_seconds
    FROM expanded a JOIN p b
      ON a.user_id = b.user_id AND a.amount_bucket = b.amount_bucket
     AND a.slot = b.slot AND a.event_id < b.event_id
    WHERE ABS(a.e - b.e) <= 7200
    GROUP BY ALL
    ORDER BY event_a, event_b
    """,
)
def q271_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment candidates: two purchases by the same user,
    in the same coarse amount bucket (FLOOR — never ROUND, whose
    half-way ties break differently across engines), within two hours
    — the fraud / double-charge triage query. The time proximity join
    is an exact (user, bucket, slot) HASH EQUI-join with one side
    expanded to slot±1 (the q233 bucket rewrite in one dimension;
    BOTH directions because the event_id pair order is uncorrelated
    with time order): any two events within the window have slots
    differing by at most 1, so every qualifying pair shares a slot in
    the expanded frame, and the residual |Δt| filter trims the
    corners — never a per-user theta-join. The dedup (a pair can
    match in several slots) is the final distinct.

    Plan: map-side bucketing; one shuffle on the composite bucket key;
    at 100 TB the slot key keeps the join linear in bucket sizes."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.floor(F.col("value") / 5).cast("bigint").alias("amount_bucket"),
        F.round(F.col("value"), 2).cast("decimal(12,2)").alias("amount"),
        F.unix_timestamp("ts").alias("e"),
        F.floor(F.unix_timestamp("ts") / 7200).cast("bigint").alias("slot"),
    )
    expanded = p.unionByName(p.withColumn("slot", F.col("slot") + 1)).unionByName(
        p.withColumn("slot", F.col("slot") - 1)
    )
    a = expanded.select(
        F.col("event_id").alias("event_a"),
        "user_id",
        "amount_bucket",
        F.col("amount").alias("amount_a"),
        F.col("e").alias("ea"),
        "slot",
    )
    b = p.select(
        F.col("event_id").alias("event_b"),
        F.col("user_id").alias("ub"),
        F.col("amount_bucket").alias("bb"),
        F.col("amount").alias("amount_b"),
        F.col("e").alias("eb"),
        F.col("slot").alias("sb"),
    )
    pairs = (
        a.join(
            b,
            (F.col("user_id") == F.col("ub"))
            & (F.col("amount_bucket") == F.col("bb"))
            & (F.col("slot") == F.col("sb"))
            & (F.col("event_a") < F.col("event_b")),
        )
        .filter(F.abs(F.col("ea") - F.col("eb")) <= 7200)
        .select(
            "event_a",
            "event_b",
            "user_id",
            "amount_a",
            "amount_b",
            F.abs(F.col("ea") - F.col("eb")).cast("bigint").alias("gap_seconds"),
        )
        .distinct()
    )
    return pairs.orderBy("event_a", "event_b")


# ---------------------------------------------------------------------------
# q272 — mixture coverage holes


@query(
    "q272_coverage_holes",
    oracle="""
    WITH srcs AS (SELECT DISTINCT source FROM documents),
    langs AS (SELECT DISTINCT lang FROM documents),
    grid AS (SELECT source, lang FROM srcs CROSS JOIN langs),
    obs AS (
      SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY source, lang
    )
    SELECT g.source, g.lang,
           COALESCE(o.n_docs, 0) AS n_docs,
           o.n_docs IS NULL AS is_hole
    FROM grid g LEFT JOIN obs o USING (source, lang)
    WHERE o.n_docs IS NULL OR o.n_docs < 3
    ORDER BY g.source, g.lang
    """,
)
def q272_coverage_holes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture coverage holes: cells of the source x lang grid that a
    dataset card implies should exist but are EMPTY (or nearly so,
    < 3 docs) — the audit run before shipping a "balanced" corpus
    mix. The grid is the cross of the two observed key sets, so a
    hole is defined relative to the data's own domains.

    Plan: one shuffle to the (source, lang) counts; the grid is the
    cross of two broadcast-sized distinct frames; the hole check is a
    broadcast left join of grid against counts — nothing fact-sized
    moves twice."""
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    srcs = docs.select("source").distinct()
    langs = docs.select("lang").distinct()
    grid = F.broadcast(srcs).join(F.broadcast(langs))
    obs = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    joined = grid.join(obs, ["source", "lang"], "left")
    return (
        joined.filter(F.col("n_docs").isNull() | (F.col("n_docs") < 3))
        .select(
            "source",
            "lang",
            F.coalesce("n_docs", F.lit(0).cast("bigint")).alias("n_docs"),
            F.col("n_docs").isNull().alias("is_hole"),
        )
        .orderBy("source", "lang")
    )
