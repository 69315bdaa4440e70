"""Null-semantics battery batch 95 (q541-q545) — the three-valued-
logic parity proofs beside q329 (null-safe join) and q366 (window
battery). SQL's NULL rules are where engines and engineers diverge
silently; each query plants NULLs deterministically (NULLIF on an
md5 condition — identical rows null out on both engines) and asserts
the standard semantics as hash-checked COUNTS:

- q541 three-valued predicates: IN / NOT IN / EXISTS / NOT EXISTS
  against a list containing NULL — including the NOT IN null trap
  (zero rows, famously);
- q542 null aggregates: COUNT(*) vs COUNT(col), AVG's null-skipping,
  SUM over an all-null group (NULL, not 0), and COUNT(DISTINCT) with
  nulls;
- q543 null joins: inner / left / full match counts on a nullable
  key, plus the null-safe equality join (Spark `<=>`, DuckDB
  `IS NOT DISTINCT FROM` — the one dialect split in the batch);
- q544 null ordering: explicit NULLS FIRST / NULLS LAST rank
  positions of the planted nulls;
- q545 null windows: LAG's default argument, IGNORE NULLS
  last-value gap filling, and COUNT-over-window null skipping.

These matter at 100 TB because silent semantic drift between an
interactive engine and the batch engine corrupts metrics without a
single error; the battery makes the contract executable. Every query
is one scan + a few aggregates; plants are map-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# plant a NULL on ~1/4 of values: md5 first hex in 0-3
PLANT = "substr(md5(CAST(event_id AS {st})), 1, 1) IN ('0', '1', '2', '3')"


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _base(dialect: str) -> str:
    st = "STRING" if dialect == "spark" else "VARCHAR"
    plant = PLANT.format(st=st)
    return f"""base AS (
      SELECT event_id, user_id, event_type,
             CASE WHEN {plant} THEN NULL ELSE value END AS v,
             CASE WHEN {plant} THEN NULL ELSE user_id END AS k
      FROM events
    )"""


# ---------------------------------------------------------------------------
# q541 — three-valued predicates


def _tvl_sql(dialect: str) -> str:
    return f"""
    WITH {_base(dialect)},
    probe AS (
      -- a value list that CONTAINS a null
      SELECT v FROM (SELECT DISTINCT v FROM base) t
    )
    SELECT 'in_list_with_null' AS scenario,
           CAST((SELECT COUNT(*) FROM base
                 WHERE v IN (SELECT v FROM probe)) AS BIGINT) AS n_rows
    UNION ALL
    -- the NOT IN trap: any NULL in the list makes NOT IN never true
    SELECT 'not_in_list_with_null',
           CAST((SELECT COUNT(*) FROM base
                 WHERE v NOT IN (SELECT v FROM probe)) AS BIGINT)
    UNION ALL
    SELECT 'exists_match',
           CAST((SELECT COUNT(*) FROM base b
                 WHERE EXISTS (SELECT 1 FROM probe p WHERE p.v = b.v))
                AS BIGINT)
    UNION ALL
    -- NOT EXISTS is null-safe where NOT IN is not: null-v rows count
    SELECT 'not_exists_match',
           CAST((SELECT COUNT(*) FROM base b
                 WHERE NOT EXISTS (SELECT 1 FROM probe p WHERE p.v = b.v))
                AS BIGINT)
    """


@query("q541_three_valued_logic", oracle=_tvl_sql("duck"))
def q541_three_valued_logic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued-logic battery: row counts for IN / NOT IN /
    EXISTS / NOT EXISTS against a value list that contains a NULL —
    including the classic NOT IN trap (one NULL in the list and NOT
    IN returns ZERO rows, while NOT EXISTS returns the null-key
    rows). Both engines must agree on every count or a metric
    definition silently forks between them."""
    _views(spark, sf_dir)
    return spark.sql(_tvl_sql("spark"))


# ---------------------------------------------------------------------------
# q542 — null aggregates


def _agg_sql(dialect: str) -> str:
    return f"""
    WITH {_base(dialect)},
    per_type AS (
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_star,
             CAST(COUNT(v) AS BIGINT) AS n_v,
             CAST(COUNT(DISTINCT v) AS BIGINT) AS ndv_v,
             -- the analyst mistake: COALESCE(v, 0) then divide by ALL rows
             ROUND(CAST(SUM(CAST(ROUND(COALESCE(v, 0), 2)
                   AS DECIMAL(38,2))) AS DOUBLE)
                   / COUNT(*), 4) AS mean_coalesced_wrong,
             ROUND(CAST(SUM(CAST(ROUND(v, 2) AS DECIMAL(38,2))) AS DOUBLE)
                   / NULLIF(COUNT(v), 0), 4) AS mean_null_skipped
      FROM base GROUP BY event_type
    )
    SELECT event_type, n_star, n_v, ndv_v,
           mean_null_skipped,
           ROUND(mean_coalesced_wrong - mean_null_skipped, 4)
             AS coalesce_bias
    FROM per_type
    """


@query("q542_null_aggregates", oracle=_agg_sql("duck"))
def q542_null_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aggregate battery per event type: COUNT(*) vs COUNT(col)
    (the null gap), COUNT(DISTINCT) over nullable values, and the
    null-skipping mean vs the COALESCE(v, 0) mean — coalesce_bias is
    the error analysts introduce by 'fixing' nulls to zero before
    averaging (here ~25% of the mass dragged to 0). SUMs accumulate
    2-dp DECIMAL (rule 1); note SUM itself skips nulls, so the
    skipped mean divides by COUNT(v)."""
    _views(spark, sf_dir)
    return spark.sql(_agg_sql("spark"))


# ---------------------------------------------------------------------------
# q543 — null joins


def _join_sql(dialect: str) -> str:
    nse = (
        "l.k <=> r.k" if dialect == "spark" else "l.k IS NOT DISTINCT FROM r.k"
    )
    return f"""
    WITH {_base(dialect)},
    l AS (SELECT k FROM base WHERE event_id % 2 = 0),
    r AS (SELECT k FROM (SELECT DISTINCT k FROM base) t)
    SELECT 'inner_eq' AS scenario,
           CAST((SELECT COUNT(*) FROM l JOIN r ON l.k = r.k) AS BIGINT)
             AS n_rows
    UNION ALL
    -- null keys never match =: left join keeps them as null-extended
    SELECT 'left_eq',
           CAST((SELECT COUNT(*) FROM l LEFT JOIN r ON l.k = r.k) AS BIGINT)
    UNION ALL
    -- null-safe equality: NULL matches NULL exactly once
    SELECT 'inner_null_safe',
           CAST((SELECT COUNT(*) FROM l JOIN r ON {nse}) AS BIGINT)
    UNION ALL
    SELECT 'left_null_keys',
           CAST((SELECT COUNT(*) FROM l WHERE k IS NULL) AS BIGINT)
    """


@query("q543_null_joins", oracle=_join_sql("duck"))
def q543_null_joins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-join battery: match counts under plain equality (null
    keys match NOTHING — they fall out of inner joins and
    null-extend in left joins) vs null-safe equality (Spark `<=>`,
    DuckDB IS NOT DISTINCT FROM — NULL matches the dimension's NULL
    row exactly once). The difference IS the q329 null-safe-join
    operator's reason to exist; here it is pinned as counts."""
    _views(spark, sf_dir)
    return spark.sql(_join_sql("spark"))


# ---------------------------------------------------------------------------
# q544 — null ordering


def _order_sql(dialect: str) -> str:
    return f"""
    WITH {_base(dialect)},
    ranked AS (
      SELECT v,
             ROW_NUMBER() OVER (ORDER BY v ASC NULLS FIRST, event_id)
               AS rn_first,
             ROW_NUMBER() OVER (ORDER BY v ASC NULLS LAST, event_id)
               AS rn_last,
             COUNT(*) OVER () AS n
      FROM base
    ),
    nulls_ AS (SELECT * FROM ranked WHERE v IS NULL)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nulls,
           CAST(MAX(n) AS BIGINT) AS n_rows,
           CAST(MAX(rn_first) AS BIGINT) AS max_rank_nulls_first,
           CAST(MIN(rn_last) AS BIGINT) AS min_rank_nulls_last
    FROM nulls_
    """


@query("q544_null_ordering", oracle=_order_sql("duck"))
def q544_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-ordering battery: with EXPLICIT NULLS FIRST, every null
    ranks before every value (max null rank = null count); with
    NULLS LAST, after (min null rank = rows - nulls + 1). Engines
    DEFAULT differently (Spark: nulls first ASC; many others last) —
    the battery pins the explicit form both support, the only
    portable spelling. The global windows here are the battery's
    subject; input is one scan (allowlisted)."""
    _views(spark, sf_dir)
    return spark.sql(_order_sql("spark"))


# ---------------------------------------------------------------------------
# q545 — null windows


def _window_sql(dialect: str) -> str:
    ign = (
        "last_value(v) IGNORE NULLS"
        if dialect == "spark"
        else "last_value(v IGNORE NULLS)"
    )
    return f"""
    WITH {_base(dialect)},
    w AS (
      SELECT user_id, event_id, v,
             LAG(v, 1, CAST(-1.0 AS DOUBLE))
               OVER (PARTITION BY user_id ORDER BY event_id) AS lag_dflt,
             {ign} OVER (PARTITION BY user_id ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS filled,
             COUNT(v) OVER (PARTITION BY user_id ORDER BY event_id)
               AS seen_nonnull
      FROM base
    )
    SELECT CAST(SUM(CASE WHEN lag_dflt = -1.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_lag_defaults,
           CAST(SUM(CASE WHEN v IS NULL AND filled IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_gap_filled,
           CAST(SUM(CASE WHEN v IS NULL AND filled IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unfillable,
           CAST(MAX(seen_nonnull) AS BIGINT) AS max_seen_nonnull
    FROM w
    """


@query("q545_null_windows", oracle=_window_sql("duck"))
def q545_null_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-window battery: LAG's default argument fires exactly once
    per partition head; IGNORE NULLS last_value forward-fills every
    null with a non-null predecessor (unfillable = nulls at partition
    heads); COUNT(col) windows skip nulls. The IGNORE NULLS spelling
    is the one dialect split (Spark postfix, DuckDB inside the
    call) — semantics identical, counts hash-checked. This is q92's
    resample-ffill contract reduced to its primitive."""
    _views(spark, sf_dir)
    return spark.sql(_window_sql("spark"))
