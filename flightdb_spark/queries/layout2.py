"""Storage-layout planning batch 84 (q486-q490) — the physical-design
calculators beside layout batch 1 (q170 Z-order tiles, q171
compaction, q172 bloom pruning, q177 range partitioning) and
storage.py's bucketize/manifest machinery:

- q486 space-filling-curve locality: the SAME rectangular query
  window measured against row-major, Z-order, and HILBERT file
  layouts — files touched per scheme (Hilbert's one-number selling
  point). The Hilbert index is the classic xy2d algorithm (order 8,
  16-bit index) with all 8 rounds UNROLLED as integer CASE algebra —
  no bit-shift dialect, no loop;
- q487 min/max pruning: per-file value min/max under
  insertion-ordered vs Hilbert-clustered file assignment, and the
  file-skip rate for a grid of range predicates — why clustering
  exists, as a number;
- q488 bloom-filter sizing: the closed-form m/n = -ln(p)/ln(2)^2,
  k = ln(2) m/n planner table for a grid of target FPRs, sized with
  the LIVE key cardinality (q453's NDV twin) — pairs with q349's
  measured-FPR audit;
- q489 row-group planner: bytes/row estimates per table from live
  column-width aggregates -> rows per 128 MB row group and file
  counts at 100 TB — the knob SURVEY's partitioning advice turns;
- q490 clustering drift: append a hash-simulated 10% batch of
  out-of-distribution rows as new insertion-order files and
  re-measure the q487 skip rate — how fast a clustered table decays
  without re-clustering (the compaction-trigger metric).

Determinism: every curve/bucket code is integer CASE algebra (the
(3*rx) XOR ry term is a 4-way CASE — no xor, whose operator differs
across engines); epoch anchors and ln() constants are Python literals
(rule 11); min/max/count aggregates are order-free.

100 TB shapes: curve indexes are map-side expressions (zero shuffle);
file stats are one (scheme, file) aggregate; the predicate grids
multiply 64-row file-stat tables, never the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

ORDER_BITS = 8
SIDE = 1 << ORDER_BITS  # 256
N_FILES = 64
CELLS = SIDE * SIDE
ANCHOR_US = 1_704_067_200_000_000  # 2024-01-01 UTC in microseconds
SPAN_US = 30 * 86_400_000_000
Y_BUCKET_US = SPAN_US // SIDE
X_WIDTH = repr(327.53 / 255.0)  # value domain -> 0..255
LN2SQ = repr(math.log(2.0) ** 2)
LN2 = repr(math.log(2.0))
FPR_GRID = (0.1, 0.01, 0.001)
_FPR_LN = {p: repr(-math.log(p)) for p in FPR_GRID}


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _xy(dialect: str) -> str:
    """events -> 8-bit (x, y) grid cell: x = value bucket, y = position
    in the month."""
    return f"""xy AS (
      SELECT event_id,
             CAST(LEAST(CAST({SIDE - 1} AS BIGINT),
                  CAST(FLOOR(value / CAST({X_WIDTH} AS DOUBLE)) AS BIGINT))
                  AS BIGINT) AS x,
             CAST(LEAST(CAST({SIDE - 1} AS BIGINT),
                  CAST(FLOOR(CAST({_us(dialect)} - {ANCHOR_US} AS DOUBLE)
                       / {Y_BUCKET_US}) AS BIGINT)) AS BIGINT) AS y,
             value
      FROM events
      WHERE {_us(dialect)} >= {ANCHOR_US}
    )"""


def _hilbert_ctes() -> str:
    """Unrolled xy2d: 8 rounds of the standard Hilbert rotation, pure
    integer CASE algebra (shared SQL). State: (hx, hy, hd)."""
    ctes = []
    prev = "xy"
    prev_cols = "x AS hx, y AS hy, CAST(0 AS BIGINT) AS hd"
    for i, k in enumerate(range(ORDER_BITS - 1, -1, -1)):
        s = 1 << k
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        # (3*rx) XOR ry without xor: 00->0, 01->1, 10->3, 11->2
        quad = (
            f"(CASE {rx} * 2 + {ry} WHEN 0 THEN 0 WHEN 1 THEN 1 "
            f"WHEN 2 THEN 3 ELSE 2 END)"
        )
        new_x = (
            f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - hy "
            f"WHEN {ry} = 0 THEN hy ELSE hx END"
        )
        new_y = (
            f"CASE WHEN {ry} = 0 AND {rx} = 1 THEN {s - 1} - hx "
            f"WHEN {ry} = 0 THEN hx ELSE hy END"
        )
        ctes.append(f"""
    h{i} AS (
      SELECT event_id, x, y, value,
             {new_x} AS nhx, {new_y} AS nhy,
             hd + {s * s} * {quad} AS nhd
      FROM (SELECT event_id, x, y, value, {prev_cols} FROM {prev}) b
    )""")
        prev = f"h{i}"
        prev_cols = "nhx AS hx, nhy AS hy, nhd AS hd"
    ctes.append(f"""
    hilbert AS (
      SELECT event_id, x, y, value, nhd AS hindex FROM {prev}
    )""")
    return ",".join(ctes)


_ZBITS = " + ".join(
    f"(CASE WHEN (x & {1 << k}) > 0 THEN {4 ** k} ELSE 0 END)"
    f" + (CASE WHEN (y & {1 << k}) > 0 THEN {2 * 4 ** k} ELSE 0 END)"
    for k in range(ORDER_BITS)
)

# the audit window: a value band x a 2.5-day time slice
WIN = "x BETWEEN 76 AND 107 AND y BETWEEN 85 AND 102"
FILE_DIV = CELLS // N_FILES


def _schemes_sql(dialect: str) -> str:
    return f"""
    WITH {_xy(dialect)},{_hilbert_ctes()},
    indexed AS (
      SELECT event_id, x, y, value, hindex,
             ({_ZBITS}) AS zindex,
             y * {SIDE} + x AS rindex
      FROM hilbert
    )"""


def _locality_sql(dialect: str) -> str:
    return f"""{_schemes_sql(dialect)},
    win AS (SELECT * FROM indexed WHERE {WIN}),
    per_scheme AS (
      SELECT 'row_major' AS layout,
             CAST(COUNT(DISTINCT CAST(FLOOR(CAST(rindex AS DOUBLE)
                  / {FILE_DIV}) AS BIGINT)) AS BIGINT) AS files_touched,
             CAST(COUNT(*) AS BIGINT) AS rows_selected
      FROM win
      UNION ALL
      SELECT 'zorder',
             CAST(COUNT(DISTINCT CAST(FLOOR(CAST(zindex AS DOUBLE)
                  / {FILE_DIV}) AS BIGINT)) AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM win
      UNION ALL
      SELECT 'hilbert',
             CAST(COUNT(DISTINCT CAST(FLOOR(CAST(hindex AS DOUBLE)
                  / {FILE_DIV}) AS BIGINT)) AS BIGINT),
             CAST(COUNT(*) AS BIGINT)
      FROM win
    )
    SELECT layout, files_touched, rows_selected FROM per_scheme
    """


@query("q486_hilbert_locality", oracle=_locality_sql("duck"))
def q486_hilbert_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-filling-curve locality audit: the same rectangular
    (value-band x time-slice) query window against 64-file layouts
    clustered by row-major, Z-order, and Hilbert indexes — files
    touched per scheme for identical rows selected. The Hilbert xy2d
    transform is fully unrolled (8 rounds of integer CASE rotations,
    shared SQL — the 3rx XOR ry quadrant is a 4-way CASE, so no
    engine-specific bit operators); indexes are map-side expressions,
    zero shuffle. The table that justifies (or rejects) curve
    clustering for this workload."""
    _views(spark, sf_dir, "events")
    return spark.sql(_locality_sql("spark"))


# ---------------------------------------------------------------------------
# q487 — min/max pruning


PRED_GRID = ((0, 50), (50, 100), (100, 200), (200, 330))


def _pruning_sql(dialect: str) -> str:
    preds = " UNION ALL ".join(
        f"SELECT {lo} AS lo, {hi} AS hi" for lo, hi in PRED_GRID
    )
    return f"""{_schemes_sql(dialect)},
    assigned AS (
      SELECT value,
             CAST(FLOOR(CAST(hindex AS DOUBLE) / {FILE_DIV}) AS BIGINT)
               AS f_hil,
             CAST(FLOOR(CAST(event_id % 100000 AS DOUBLE)
                  / CAST(100000.0 / {N_FILES} AS DOUBLE)) AS BIGINT)
               AS f_ins
      FROM indexed
    ),
    stats AS (
      SELECT 'hilbert' AS layout, f_hil AS f,
             MIN(value) AS lo_v, MAX(value) AS hi_v
      FROM assigned GROUP BY f_hil
      UNION ALL
      SELECT 'insertion', f_ins,
             MIN(value), MAX(value)
      FROM assigned GROUP BY f_ins
    ),
    grid AS ({preds})
    SELECT s.layout, g.lo AS pred_lo, g.hi AS pred_hi,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(CASE WHEN s.hi_v >= g.lo AND s.lo_v < g.hi
                    THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
           ROUND(CAST(1.0 AS DOUBLE)
                 - CAST(SUM(CASE WHEN s.hi_v >= g.lo AND s.lo_v < g.hi
                       THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4)
             AS skip_rate
    FROM stats s CROSS JOIN grid g
    GROUP BY s.layout, g.lo, g.hi
    """


@query("q487_minmax_pruning", oracle=_pruning_sql("duck"))
def q487_minmax_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max zone-map pruning audit: per-file value ranges under
    insertion-ordered vs Hilbert-clustered 64-file layouts, and the
    file-skip rate for a 4-predicate range grid. Insertion order
    scatters values so every file overlaps every predicate (skip
    ~0); the curve layout concentrates them (skip >> 0) — the number
    the parquet row-group stats actually deliver. File stats are one
    (layout, file) aggregate; the grid multiplies 128 stat rows."""
    _views(spark, sf_dir, "events")
    return spark.sql(_pruning_sql("spark"))


# ---------------------------------------------------------------------------
# q488 — bloom-filter sizing


def _bloom_sql(dialect: str) -> str:
    rows = " UNION ALL ".join(
        f"SELECT CAST({p!r} AS DOUBLE) AS target_fpr, "
        f"CAST({_FPR_LN[p]} AS DOUBLE) AS neg_ln_p"
        for p in FPR_GRID
    )
    return f"""
    WITH ndv AS (
      SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n FROM orders
    ),
    grid AS ({rows})
    SELECT g.target_fpr,
           n.n AS n_keys,
           ROUND(g.neg_ln_p / {LN2SQ}, 4) AS bits_per_key,
           CAST(FLOOR(g.neg_ln_p / {LN2SQ} * {LN2} + CAST(0.5 AS DOUBLE))
                AS BIGINT) AS n_hashes,
           ROUND(g.neg_ln_p / {LN2SQ} * n.n / 8 / 1048576, 4) AS filter_mb
    FROM grid g CROSS JOIN ndv n
    """


@query("q488_bloom_size_planner", oracle=_bloom_sql("duck"))
def q488_bloom_size_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing table: for each target FPR, the closed-form
    optimum bits/key = -ln(p)/ln(2)^2 and hash count k = ln(2) * m/n
    (Bloom 1970), sized with the live key NDV — the planner half of
    q349's measured-FPR audit and q172's bloom-prune join. All ln
    values are Python literals (rule 11); the only scan is the NDV
    anchor (swap q453's HLL registers at 100 TB)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_bloom_sql("spark"))


# ---------------------------------------------------------------------------
# q489 — row-group planner


ROWGROUP_MB = 128
FIXED_BYTES = {"events": 40, "documents": 24, "orders": 44, "lineitem": 60}


def _rowgroup_sql(dialect: str) -> str:
    parts = []
    for t, fixed in FIXED_BYTES.items():
        var = {
            "events": "LENGTH(event_type) + LENGTH(COALESCE(props, ''))",
            "documents": "LENGTH(text) + LENGTH(lang) + LENGTH(source)",
            "orders": "LENGTH(o_orderstatus) + LENGTH(o_orderpriority)",
            "lineitem": "LENGTH(l_returnflag) + LENGTH(l_linestatus)",
        }[t]
        parts.append(f"""
      SELECT '{t}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST({fixed} AS BIGINT) AS fixed_bytes,
             CAST(SUM(CAST({var} AS BIGINT)) AS BIGINT) AS var_bytes
      FROM {t}""")
    union = " UNION ALL ".join(parts)
    return f"""
    WITH raw AS ({union})
    SELECT tbl, n_rows,
           ROUND(CAST(fixed_bytes * n_rows + var_bytes AS DOUBLE)
                 / n_rows, 2) AS est_bytes_per_row,
           CAST(FLOOR({ROWGROUP_MB} * 1048576.0
                / (CAST(fixed_bytes * n_rows + var_bytes AS DOUBLE) / n_rows))
                AS BIGINT) AS rows_per_rowgroup
    FROM raw
    """


@query("q489_rowgroup_planner", oracle=_rowgroup_sql("duck"))
def q489_rowgroup_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-group sizing table: estimated uncompressed bytes/row per
    table (fixed column widths as literals + live variable-width
    sums) and the row count that fills a 128 MB row group — the
    number spark.sql.files.maxPartitionBytes and parquet block size
    get tuned against. One aggregate per table, map-side partials."""
    _views(spark, sf_dir, "events", "documents", "orders", "lineitem")
    return spark.sql(_rowgroup_sql("spark"))


# ---------------------------------------------------------------------------
# q490 — clustering drift after append


def _drift_sql(dialect: str) -> str:
    return f"""{_schemes_sql(dialect)},
    base AS (
      SELECT value,
             CAST(FLOOR(CAST(hindex AS DOUBLE) / {FILE_DIV}) AS BIGINT) AS f
      FROM indexed
    ),
    appended AS (
      -- a 10% hash-sampled out-of-distribution batch lands in 8 new
      -- insertion-order files (no re-clustering)
      SELECT value + 400 AS value,
             {N_FILES} + (CAST(event_id % 8 AS BIGINT)) AS f
      FROM indexed
      WHERE substr(md5(CAST(event_id AS {"STRING" if dialect == "spark" else "VARCHAR"})), 1, 1) IN ('0', '1')
    ),
    before_ AS (
      SELECT f, MIN(value) AS lo_v, MAX(value) AS hi_v FROM base GROUP BY f
    ),
    after_ AS (
      SELECT f, MIN(value) AS lo_v, MAX(value) AS hi_v
      FROM (SELECT * FROM base UNION ALL SELECT * FROM appended) u
      GROUP BY f
    )
    SELECT 'before_append' AS state,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           ROUND(CAST(SUM(CAST(ROUND(hi_v - lo_v, 2) AS DECIMAL(38,2)))
                 AS DOUBLE) / COUNT(*), 4) AS mean_value_span,
           CAST(SUM(CASE WHEN hi_v >= 0 AND lo_v < 50 THEN 1 ELSE 0 END)
                AS BIGINT) AS files_scanned_lt50
    FROM before_
    UNION ALL
    SELECT 'after_append',
           CAST(COUNT(*) AS BIGINT),
           ROUND(CAST(SUM(CAST(ROUND(hi_v - lo_v, 2) AS DECIMAL(38,2)))
                 AS DOUBLE) / COUNT(*), 4),
           CAST(SUM(CASE WHEN hi_v >= 0 AND lo_v < 50 THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM after_
    """


@query("q490_clustering_drift", oracle=_drift_sql("duck"))
def q490_clustering_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering decay audit: append a hash-sampled 10% batch of
    out-of-distribution rows as 8 new insertion-order files and
    re-measure mean per-file value span and files scanned for a
    value < 50 predicate. The span/skip delta is the compaction
    trigger: it quantifies how fast q486's curve layout rots under
    naive appends. Same one-aggregate file-stat economics as q487."""
    _views(spark, sf_dir, "events")
    return spark.sql(_drift_sql("spark"))
