"""Engine-surface batch 16 (q250-q254): Spark-4-native surfaces a
migrating user expects the engine to cover, each oracle-checked —
VARIANT semi-structured shredding (the Spark 4 open variant type),
schema-evolution union (unionByName with missing columns), log-line
field extraction (the regexp ingest battery), timezone-aware
localization (convert_timezone), and the array higher-order-function
battery (collect -> sort -> transform/filter/aggregate/zip_with).

Determinism: the VARIANT and log queries build their semi-structured
inputs from table columns with pure string concat (both engines
construct byte-identical strings before parsing them back); tz
localization is exercised over a span with no DST transition so the
DuckDB oracle can pin fixed offsets while Spark runs the real tz
machinery; array aggregates ride sorted arrays and integer/decimal
terms only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q250 — VARIANT shredding


@query(
    "q250_variant_shred",
    oracle="""
    WITH payloads AS (
      SELECT '{"user":{"id":' || CAST(user_id AS VARCHAR)
             || ',"seg":"s' || CAST(user_id % 5 AS VARCHAR)
             || '"},"metric":{"v":' || CAST(CAST(ROUND(value, 2) AS DECIMAL(12,2)) AS VARCHAR)
             || ',"typ":"' || event_type
             || '"},"flags":[' || CAST(event_id % 2 AS VARCHAR)
             || ',' || CAST(event_id % 3 AS VARCHAR) || ']}' AS payload
      FROM events
    ),
    shredded AS (
      SELECT CAST(json_extract_string(payload, '$.user.seg') AS VARCHAR) AS seg,
             CAST(json_extract_string(payload, '$.metric.typ') AS VARCHAR) AS typ,
             CAST(json_extract_string(payload, '$.metric.v') AS DECIMAL(12,2)) AS v,
             CAST(json_extract_string(payload, '$.flags[1]') AS BIGINT) AS flag1
      FROM payloads
    )
    SELECT seg, typ,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(CAST(SUM(v) AS DOUBLE), 2) AS sum_v,
           CAST(SUM(flag1) AS BIGINT) AS sum_flag1
    FROM shredded
    GROUP BY seg, typ
    ORDER BY seg, typ
    """,
)
def q250_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT end-to-end: build a nested JSON payload from the
    event columns (both engines construct the identical string),
    ``parse_json`` it into an open VARIANT value, shred typed paths
    back out with ``variant_get`` — nested object fields AND an array
    index — and aggregate. This is the semi-structured fast path a
    user migrating JSON-heavy pipelines needs: VARIANT keeps the
    binary-encoded value columnar, and ``variant_get`` evaluates
    JVM-side in the scan stage with no per-row full JSON re-parse
    (unlike get_json_object's JsonPath probe, the variant is parsed
    ONCE at construction).

    Plan: parse + shred are map-side; one shuffle on the 10-key
    (seg, typ) aggregate. The metric value rides DECIMAL(12,2) from
    construction through the sum."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    payload = F.concat(
        F.lit('{"user":{"id":'), F.col("user_id").cast("string"),
        F.lit(',"seg":"s'), (F.col("user_id") % 5).cast("string"),
        F.lit('"},"metric":{"v":'),
        F.round(F.col("value"), 2).cast("decimal(12,2)").cast("string"),
        F.lit(',"typ":"'), F.col("event_type"),
        F.lit('"},"flags":['), (F.col("event_id") % 2).cast("string"),
        F.lit(","), (F.col("event_id") % 3).cast("string"), F.lit("]}"),
    )
    shredded = ev.select(F.parse_json(payload).alias("v")).select(
        F.variant_get("v", "$.user.seg", "string").alias("seg"),
        F.variant_get("v", "$.metric.typ", "string").alias("typ"),
        F.variant_get("v", "$.metric.v", "decimal(12,2)").alias("val"),
        F.variant_get("v", "$.flags[1]", "bigint").alias("flag1"),
    )
    return (
        shredded.groupBy("seg", "typ")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.sum("val").cast("double"), 2).alias("sum_v"),
            F.sum("flag1").cast("bigint").alias("sum_flag1"),
        )
        .orderBy("seg", "typ")
    )


# ---------------------------------------------------------------------------
# q251 — schema-evolution union


@query(
    "q251_schema_evolution_union",
    oracle="""
    WITH v1 AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority,
             CAST(NULL AS VARCHAR) AS o_orderstatus
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    v2 AS (
      SELECT o_orderkey, o_totalprice, o_orderpriority, o_orderstatus
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    merged AS (
      SELECT *, 'v1' AS src FROM v1
      UNION ALL
      SELECT *, 'v2' AS src FROM v2
    )
    SELECT src, COALESCE(o_orderpriority, 'UNKNOWN') AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(ROUND(o_totalprice, 6) AS DECIMAL(38,6))) AS DOUBLE), 2)
             AS total
    FROM merged
    GROUP BY src, priority
    ORDER BY src, priority
    """,
)
def q251_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution merge: an old extract (v1: two columns) and a
    new extract (v2: adds priority and status) combine via
    ``unionByName(allowMissingColumns=True)`` — the missing v1 columns
    null-fill BY NAME, not by position, which is what keeps a century
    of accumulated parquet vintages unionable without hand-written
    projection lists. Nulls then normalize to an 'UNKNOWN' bucket.

    Plan: both branches read the SAME orders scan with disjoint pushed
    date filters; the union is a zero-cost plan node (no shuffle) and
    the only exchange is the small (src, priority) aggregate."""
    o = load_table(spark, sf_dir, "orders")
    v1 = o.filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice"
    ).withColumn("src", F.lit("v1"))
    v2 = o.filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "o_orderstatus"
    ).withColumn("src", F.lit("v2"))
    merged = v1.unionByName(v2, allowMissingColumns=True)
    return (
        merged.groupBy(
            "src", F.coalesce("o_orderpriority", F.lit("UNKNOWN")).alias("priority")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.round(F.col("o_totalprice"), 6).cast("decimal(38,6)")).cast(
                    "double"
                ),
                2,
            ).alias("total"),
        )
        .orderBy("src", "priority")
    )


# ---------------------------------------------------------------------------
# q252 — log-line parsing


@query(
    "q252_log_parse",
    oracle="""
    WITH lines AS (
      SELECT 'level=' || CASE WHEN event_type = 'error' THEN 'ERROR' ELSE 'INFO' END
             || ' code=' || CAST(event_id % 100 AS VARCHAR)
             || ' user=u' || CAST(user_id AS VARCHAR)
             || ' latency_ms=' || CAST(CAST(ROUND(value * 10, 0) AS BIGINT) AS VARCHAR)
             AS line
      FROM events
    ),
    parsed AS (
      SELECT regexp_extract(line, 'level=([A-Z]+)', 1) AS level,
             CAST(regexp_extract(line, 'code=([0-9]+)', 1) AS BIGINT) AS code,
             CAST(regexp_extract(line, 'latency_ms=([0-9]+)', 1) AS BIGINT) AS latency_ms
      FROM lines
    )
    SELECT level, code % 10 AS code_class,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(latency_ms) AS BIGINT) AS total_latency_ms,
           CAST(MAX(latency_ms) AS BIGINT) AS max_latency_ms
    FROM parsed
    GROUP BY level, code_class
    ORDER BY level, code_class
    """,
)
def q252_log_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log ingest battery: build the canonical key=value log line from
    event columns (both engines byte-identical), then field-extract it
    back with anchored regexp groups — the shape every raw-log
    pipeline starts with. Patterns stay in the RE2/Java-regex common
    subset (character classes + groups, no lookaround) so both engines
    match identically; numeric fields re-cast from the captures.

    Plan: construct + extract + cast are all map-side expressions in
    the scan stage; one shuffle on the 20-key (level, code_class)
    aggregate. latency is built as an integer so sums stay exact."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    line = F.concat(
        F.lit("level="),
        F.when(F.col("event_type") == "error", "ERROR").otherwise("INFO"),
        F.lit(" code="), (F.col("event_id") % 100).cast("string"),
        F.lit(" user=u"), F.col("user_id").cast("string"),
        F.lit(" latency_ms="),
        F.round(F.col("value") * 10, 0).cast("bigint").cast("string"),
    )
    parsed = ev.select(line.alias("line")).select(
        F.regexp_extract("line", r"level=([A-Z]+)", 1).alias("level"),
        F.regexp_extract("line", r"code=([0-9]+)", 1).cast("bigint").alias("code"),
        F.regexp_extract("line", r"latency_ms=([0-9]+)", 1)
        .cast("bigint")
        .alias("latency_ms"),
    )
    return (
        parsed.groupBy("level", (F.col("code") % 10).alias("code_class"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            F.sum("latency_ms").cast("bigint").alias("total_latency_ms"),
            F.max("latency_ms").cast("bigint").alias("max_latency_ms"),
        )
        .orderBy("level", "code_class")
    )


# ---------------------------------------------------------------------------
# q253 — timezone localization


@query(
    "q253_tz_localization",
    oracle="""
    WITH localized AS (
      SELECT CAST(ts - INTERVAL 8 HOUR AS DATE) AS local_date, 'America/Los_Angeles' AS zone
      FROM events
      UNION ALL
      SELECT CAST(ts + INTERVAL 9 HOUR AS DATE) AS local_date, 'Asia/Tokyo' AS zone
      FROM events
    )
    SELECT zone, local_date, CAST(COUNT(*) AS BIGINT) AS n_events
    FROM localized
    GROUP BY zone, local_date
    ORDER BY zone, local_date
    """,
)
def q253_tz_localization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timezone-aware localization: bucket UTC events by their LOCAL
    calendar date in Los Angeles and Tokyo via the real tz database
    (``convert_timezone``), the off-by-one-day class of bug every
    global rollup hits. The data span (2024-01) contains no DST
    transition, so the DuckDB oracle pins the then-current fixed
    offsets (PST=UTC-8, JST=UTC+9) while Spark runs the actual
    tz-rules path — agreement proves the tz machinery lands on the
    correct offsets.

    Plan: the localization is a map-side expression; the two zones
    union before one (zone, date) aggregate on a ~60-key domain. At
    scale N zones stay a union of map-side projections over one scan
    (Catalyst collapses to a single pass), never a join against a
    zone table of instants."""
    ev = ensure_parallelism(load_table(spark, sf_dir, "events"))
    la = ev.select(
        F.convert_timezone(F.lit("UTC"), F.lit("America/Los_Angeles"), F.col("ts").cast("timestamp_ntz"))
        .cast("date")
        .alias("local_date"),
        F.lit("America/Los_Angeles").alias("zone"),
    )
    tk = ev.select(
        F.convert_timezone(F.lit("UTC"), F.lit("Asia/Tokyo"), F.col("ts").cast("timestamp_ntz"))
        .cast("date")
        .alias("local_date"),
        F.lit("Asia/Tokyo").alias("zone"),
    )
    return (
        la.unionByName(tk)
        .groupBy("zone", "local_date")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .orderBy("zone", "local_date")
    )


# ---------------------------------------------------------------------------
# q254 — array higher-order-function battery


@query(
    "q254_array_hof_battery",
    oracle="""
    WITH arrs AS (
      SELECT l_orderkey,
             list_sort(list(CAST(l_quantity AS BIGINT))) AS qtys
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT l_orderkey,
           CAST(len(qtys) AS INTEGER) AS n_items,
           CAST(qtys[1] AS BIGINT) AS min_qty,
           CAST(qtys[-1] AS BIGINT) AS max_qty,
           CAST(COALESCE(list_sum(list_transform(list_filter(qtys, q -> q > 25),
                                                 q -> q * q)), 0) AS BIGINT)
             AS big_sq_sum,
           CAST(CASE WHEN len(qtys) < 2 THEN 0
                ELSE list_max(list_transform(range(1, len(qtys)),
                                             i -> qtys[i + 1] - qtys[i]))
                END AS BIGINT) AS max_gap
    FROM arrs
    ORDER BY l_orderkey
    """,
)
def q254_array_hof_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array analytics battery: collect each order's quantities into a
    sorted array, then answer array-shaped questions entirely with
    higher-order functions — filter -> transform -> aggregate for the
    sum of squares of large quantities, and an index zip over adjacent
    elements for the largest gap in the sorted sequence. HOFs run as
    JVM codegen lambdas inside the executor (no UDF boundary, no
    Python) — the idiom that replaces per-group Python loops for
    bounded per-key sequences.

    Plan: one shuffle builds the per-order arrays (collect_list +
    sort_array, deterministic because sorted); every HOF is map-side
    on arrays bounded by order size (~7). big_sq_sum is an integer
    fold; null-free by construction."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_list(F.col("l_quantity").cast("bigint"))).alias("qtys")
    )
    qtys = F.col("qtys")
    big_sq_sum = F.aggregate(
        F.transform(F.filter(qtys, lambda q: q > 25), lambda q: q * q),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    max_gap = F.when(F.size(qtys) < 2, F.lit(0).cast("bigint")).otherwise(
        F.array_max(
            F.transform(
                F.sequence(F.lit(1), F.size(qtys) - 1),
                lambda i: F.element_at(qtys, i + 1) - F.element_at(qtys, i),
            )
        )
    )
    return arrs.select(
        "l_orderkey",
        F.size(qtys).alias("n_items"),
        F.element_at(qtys, 1).alias("min_qty"),
        F.element_at(qtys, -1).alias("max_qty"),
        big_sq_sum.alias("big_sq_sum"),
        max_gap.cast("bigint").alias("max_gap"),
    ).orderBy("l_orderkey")
