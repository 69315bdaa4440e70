"""Columnar-encoding planning batch 89 (q511-q515) — the codec
decisions a parquet/ORC writer makes, computed from the live data
(the within-file companion to batch 84's between-file layout
planning):

- q511 RLE runs: run-length statistics of event_type within each
  user's time-ordered stream — the run census that decides
  run-length encoding;
- q512 delta bits: per-user timestamp deltas bucketed by the exact
  bit width needed (an integer CASE ladder — no floating log2, whose
  FLOOR flips at exact powers of two) — the delta-encoding width
  histogram;
- q513 dictionary benefit: per column, NDV vs rows and the implied
  dictionary index width — the dictionary-encoding go/no-go table;
- q514 sort benefit: event_type RLE runs in arrival order vs sorted-
  within-user order — what a sort-before-write buys, as a ratio;
- q515 bit-packing audit: value ranges of the integer columns and
  the bits PLAIN packing wastes vs range-based packing.

Determinism: everything is integer counting over windows partitioned
by user/day (never global); bit widths come from literal power-of-two
CASE ladders (exact comparisons); ratios are terminal divisions.

100 TB shapes: one user-keyed window pass per run census (the q14
shuffle); NDV/range audits are single aggregates with map-side
partials. These are the statistics a writer collects in one pass
over each row group — the queries ARE that pass, distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MAX_BITS = 41


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _bits_case(expr: str) -> str:
    """Exact bit width of a nonnegative BIGINT via a literal ladder."""
    whens = " ".join(
        f"WHEN {expr} < {1 << k} THEN {k}" for k in range(1, MAX_BITS)
    )
    return f"(CASE {whens} ELSE {MAX_BITS} END)"


# ---------------------------------------------------------------------------
# q511 — RLE run census


def _rle_sql(dialect: str) -> str:
    return f"""
    WITH seq AS (
      SELECT user_id, event_type,
             CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                       = event_type THEN 0 ELSE 1 END AS brk
      FROM events
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_values,
             CAST(SUM(brk) AS BIGINT) AS n_runs
      FROM seq
    )
    SELECT n_values, n_runs,
           ROUND(CAST(n_values AS DOUBLE) / n_runs, 4) AS mean_run_length,
           ROUND(CAST(n_runs AS DOUBLE) / n_values, 4) AS rle_ratio
    FROM stats
    """


@query("q511_rle_runs", oracle=_rle_sql("duck"))
def q511_rle_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length census of event_type in each user's arrival order:
    total values, runs (LAG breakpoints), mean run length, and the
    RLE ratio (runs/values — the fraction of entries an RLE codec
    must store). One user-keyed window pass; run counting is exact
    integer summing of breakpoint flags."""
    _views(spark, sf_dir, "events")
    return spark.sql(_rle_sql("spark"))


# ---------------------------------------------------------------------------
# q512 — delta-encoding bit widths


def _delta_sql(dialect: str) -> str:
    us = _us(dialect)
    return f"""
    WITH deltas AS (
      SELECT {us} - LAG({us}) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS d
      FROM events
    ),
    widths AS (
      SELECT {_bits_case("d")} AS bits
      FROM deltas WHERE d IS NOT NULL AND d >= 0
    )
    SELECT bits AS delta_bits,
           CAST(COUNT(*) AS BIGINT) AS n_deltas
    FROM widths GROUP BY bits
    """


@query("q512_delta_bits", oracle=_delta_sql("duck"))
def q512_delta_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-encoding width histogram: per-user timestamp deltas
    (integer microseconds) bucketed by the EXACT bit width each needs
    — a literal power-of-two CASE ladder, because FLOOR(log2(x))
    flips at exact powers of two when log2 is off by an ulp. The
    histogram is the evidence for delta + bit-packing over PLAIN
    64-bit timestamps (most mass far below 64 bits). One user-keyed
    window pass."""
    _views(spark, sf_dir, "events")
    return spark.sql(_delta_sql("spark"))


# ---------------------------------------------------------------------------
# q513 — dictionary benefit


def _dict_sql(dialect: str) -> str:
    cols = [
        ("events", "event_type", "LENGTH(event_type)"),
        ("events", "user_id", "8"),
        ("documents", "lang", "LENGTH(lang)"),
        ("documents", "source", "LENGTH(source)"),
        ("orders", "o_orderpriority", "LENGTH(o_orderpriority)"),
        ("lineitem", "l_returnflag", "LENGTH(l_returnflag)"),
    ]
    parts = []
    for tbl, col, width in cols:
        parts.append(f"""
      SELECT '{tbl}.{col}' AS column_name,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT {col}) AS BIGINT) AS ndv,
             CAST(SUM(CAST({width} AS BIGINT)) AS BIGINT) AS raw_bytes
      FROM {tbl}""")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH raw AS ({union})
    SELECT column_name, n_rows, ndv,
           {_bits_case("ndv - 1")} AS index_bits,
           ROUND(CAST(raw_bytes AS DOUBLE) / n_rows, 3) AS raw_bytes_per_row,
           ROUND(CAST({_bits_case("ndv - 1")} AS DOUBLE) / 8
                 / (CAST(raw_bytes AS DOUBLE) / n_rows), 4)
             AS dict_size_ratio
    FROM raw
    """


@query("q513_dict_benefit", oracle=_dict_sql("duck"))
def q513_dict_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-encoding go/no-go table: per column, NDV vs rows,
    the dictionary index width (exact bit ladder on ndv-1), and the
    index-bytes : raw-bytes ratio — below ~0.5 the dictionary wins
    before even counting the page-level dedup. One aggregate per
    column with map-side partials; at 100 TB swap COUNT(DISTINCT)
    for the q453 HLL registers."""
    _views(spark, sf_dir, "events", "documents", "orders", "lineitem")
    return spark.sql(_dict_sql("spark"))


# ---------------------------------------------------------------------------
# q514 — sort-before-write benefit


def _sort_benefit_sql(dialect: str) -> str:
    return f"""
    WITH natural_runs AS (
      SELECT CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                       = event_type THEN 0 ELSE 1 END AS brk
      FROM events
    ),
    sorted_runs AS (
      SELECT CASE WHEN LAG(event_type) OVER (PARTITION BY user_id
                                             ORDER BY event_type, ts, event_id)
                       = event_type THEN 0 ELSE 1 END AS brk
      FROM events
    ),
    a AS (SELECT CAST(SUM(brk) AS BIGINT) AS runs_natural,
                 CAST(COUNT(*) AS BIGINT) AS n FROM natural_runs),
    b AS (SELECT CAST(SUM(brk) AS BIGINT) AS runs_sorted FROM sorted_runs)
    SELECT a.n AS n_values,
           a.runs_natural, b.runs_sorted,
           ROUND(CAST(a.runs_natural AS DOUBLE) / b.runs_sorted, 4)
             AS run_reduction_factor
    FROM a CROSS JOIN b
    """


@query("q514_sort_benefit", oracle=_sort_benefit_sql("duck"))
def q514_sort_benefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-before-write audit: event_type runs in arrival order vs
    sorted-within-user order. The run-reduction factor is exactly the
    RLE gain a writer buys by sorting each partition on the low-
    cardinality column before writing — here bounded by the 5-value
    domain (sorted runs = 5 per user). Two window passes over the
    same user-keyed shuffle (Catalyst reuses the exchange)."""
    _views(spark, sf_dir, "events")
    return spark.sql(_sort_benefit_sql("spark"))


# ---------------------------------------------------------------------------
# q515 — bit-packing audit


def _bitpack_sql(dialect: str) -> str:
    cols = [
        ("lineitem", "l_quantity", 32),
        ("lineitem", "l_linenumber", 32),
        ("events", "user_id", 64),
        ("orders", "o_custkey", 64),
        ("part", "p_size", 32),
    ]
    parts = []
    for tbl, col, plain in cols:
        parts.append(f"""
      SELECT '{tbl}.{col}' AS column_name,
             CAST(MIN(CAST({col} AS BIGINT)) AS BIGINT) AS min_v,
             CAST(MAX(CAST({col} AS BIGINT)) AS BIGINT) AS max_v,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             {plain} AS plain_bits
      FROM {tbl}""")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH raw AS ({union})
    SELECT column_name, min_v, max_v, plain_bits,
           {_bits_case("max_v - min_v")} AS packed_bits,
           ROUND(CAST(1.0 AS DOUBLE)
                 - CAST({_bits_case("max_v - min_v")} AS DOUBLE) / plain_bits,
                 4) AS savings_share,
           CAST(FLOOR(n_rows * (plain_bits
                - {_bits_case("max_v - min_v")}) / CAST(8.0 AS DOUBLE))
                AS BIGINT) AS bytes_saved
    FROM raw
    """


@query("q515_bitpack_audit", oracle=_bitpack_sql("duck"))
def q515_bitpack_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bit-packing audit: per integer column, the value RANGE and the
    exact bits frame-of-reference packing needs (bit ladder on
    max-min) vs the PLAIN width — savings share and total bytes
    saved. min/max/count are order-free aggregates; one scan per
    column (a writer gets them free in its row-group pass)."""
    _views(spark, sf_dir, "lineitem", "events", "orders", "part")
    return spark.sql(_bitpack_sql("spark"))
