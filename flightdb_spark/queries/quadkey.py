"""Quadkey spatial-index batch 165 (q897-q901) — Bing-maps-style
quadtree keys over the synthetic trackpoints (queries/synth.py): encode
every point into a level-12 quadkey by pure INTEGER tile arithmetic,
then run the index workloads a geo store needs — cell census,
hierarchical prefix rollup, 3x3 neighborhood hotspots, corridor
sharing, and the bbox-query-as-prefix-scan equivalence that justifies
the index at 100 TB (reference: the grid-cell bucketing in
operators/waypoints.py:147 and geo/sfo region tiling; quadkeys are the
serialized form of that grid).

Tile math (NO trig, NO floats past the shared centi-degree quantizer):
lat/lon quantize to integer centi-degrees (FLOOR(x*100+0.5) — the
repo-wide exact quantizer), then level-L tile indexes are integer
div/mod against the full [-90,90]x[-180,180] domain; quadkey digits
interleave the tile bits via div/mod by powers of two — identical
BIGINT arithmetic on both engines, so every key is hash-exact.

- q897 cell census: top occupied cells with tile coordinates;
- q898 prefix rollup: level-12 counts folded to level-9 ancestors by
  substring — the quadtree aggregation property (children sum to the
  parent, test-asserted);
- q899 neighborhood hotspots: 3x3 tile sums via a 9-row literal
  offset grid equi-join (never a spatial theta join);
- q900 corridor sharing: distinct flights per cell — where traffic
  concentrates;
- q901 bbox-vs-index equivalence: a rectangle query answered (a) by
  the direct predicate and (b) by quadkey cells split into
  fully-contained (count lookup, no point reads) + boundary cells
  (refined) — counts must agree exactly.

100 TB shape: encoding is map-side integer arithmetic (pushdown-safe);
every aggregate is keyed by cell (bounded by occupied tiles, not
points); neighborhood joins are equi-joins on (tx+dx, ty+dy); the
q901 index path reads points ONLY in boundary cells — the partition-
pruning story, measured.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .synth import SYNTH_TP_CTE

LEVEL = 12
TOP_CELLS = 20
# q901 query rectangle in exact centi-degrees
QLAT0, QLAT1 = 3750, 3800  # [37.50, 38.00]
QLON0, QLON1 = -12200, -12150  # [-122.00, -121.50]


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _idiv(d: str, a: str, b: str) -> str:
    return f"({a}) div ({b})" if d == "spark" else f"({a}) // ({b})"


def _tiles_cte(d: str) -> str:
    """Point -> integer centi-degrees -> level-LEVEL tile indexes."""
    n = 1 << LEVEL
    tx = _idiv(d, f"(lon_c + 18000) * {n}", "36000")
    ty = _idiv(d, f"(9000 - lat_c) * {n}", "18000")
    return f"""{SYNTH_TP_CTE},
    quant AS (
      SELECT flight_id,
             CAST(FLOOR(lat * 100 + 0.5) AS BIGINT) AS lat_c,
             CAST(FLOOR(lon * 100 + 0.5) AS BIGINT) AS lon_c
      FROM trackpoints
    ),
    tiles AS (
      SELECT flight_id, lat_c, lon_c,
             CAST(LEAST({tx}, {n - 1}) AS BIGINT) AS tx,
             CAST(LEAST({ty}, {n - 1}) AS BIGINT) AS ty
      FROM quant
    )"""


def _qk_expr(d: str) -> str:
    """Quadkey string: digit k = 2*bit_k(ty) + bit_k(tx), MSB first,
    via div/mod by powers of two (dialect-neutral integer ops)."""
    parts = []
    for k in range(LEVEL):
        sh = 1 << (LEVEL - 1 - k)
        bx = f"(({_idiv(d, 'tx', str(sh))}) % 2)"
        by = f"(({_idiv(d, 'ty', str(sh))}) % 2)"
        parts.append(f"CAST(2 * {by} + {bx} AS INT)")
    concat = ", ".join(f"CAST({p} AS STRING)" if d == "spark" else f"CAST({p} AS VARCHAR)" for p in parts)
    return f"CONCAT({concat})"


def _cells_cte(d: str) -> str:
    return f"""{_tiles_cte(d)},
    cells AS (
      SELECT tx, ty, {_qk_expr(d)} AS qk,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(COUNT(DISTINCT flight_id) AS BIGINT) AS n_flights
      FROM tiles GROUP BY tx, ty
    )"""


# ---------------------------------------------------------------------------
# q897 — cell census


def _q897_sql(d: str) -> str:
    return f"""
    WITH {_cells_cte(d)}
    SELECT qk, tx, ty, n_points
    FROM cells
    ORDER BY n_points DESC, qk
    LIMIT {TOP_CELLS}
    """


@query("q897_quadkey_census", oracle=_q897_sql("duckdb"))
def q897_quadkey_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Occupied level-{LEVEL} quadkey cells ranked by point count. The
    key is built map-side from exact integer tile math (no trig, no
    floats past the shared centi-degree quantizer), so the census is
    ONE cell-keyed aggregate — the primitive every other index workload
    composes."""
    _views(spark, sf_dir)
    return spark.sql(_q897_sql("spark"))


# ---------------------------------------------------------------------------
# q898 — prefix rollup


ROLLUP_LEN = 9  # level-9 ancestors: ~0.7 deg tiles, several over the domain


def _q898_sql(d: str) -> str:
    sub = (
        f"substring(qk, 1, {ROLLUP_LEN})"
        if d == "spark"
        else f"substr(qk, 1, {ROLLUP_LEN})"
    )
    return f"""
    WITH {_cells_cte(d)}
    SELECT {sub} AS qk_parent,
           CAST(COUNT(*) AS BIGINT) AS n_child_cells,
           CAST(SUM(n_points) AS BIGINT) AS n_points,
           CAST(MAX(n_points) AS BIGINT) AS max_child_points
    FROM cells
    GROUP BY {sub}
    ORDER BY qk_parent
    """


@query("q898_quadkey_rollup", oracle=_q898_sql("duckdb"))
def q898_quadkey_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quadtree aggregation property: level-12 cells fold to their
    level-9 ancestors by PREFIX (substring — no re-encoding, no joins),
    and children counts sum exactly to the parent. This is why quadkeys
    make hierarchical spatial rollups free at scale."""
    _views(spark, sf_dir)
    return spark.sql(_q898_sql("spark"))


# ---------------------------------------------------------------------------
# q899 — 3x3 neighborhood hotspots


def _q899_sql(d: str) -> str:
    offs = ", ".join(f"({dx}, {dy})" for dx in (-1, 0, 1) for dy in (-1, 0, 1))
    return f"""
    WITH {_cells_cte(d)},
    offsets(dx, dy) AS (VALUES {offs}),
    hood AS (
      SELECT c.tx, c.ty, c.qk, c.n_points,
             CAST(SUM(nb.n_points) AS BIGINT) AS hood_points,
             CAST(COUNT(*) AS BIGINT) AS hood_cells
      FROM cells c
      JOIN offsets o ON TRUE
      JOIN cells nb ON nb.tx = c.tx + o.dx AND nb.ty = c.ty + o.dy
      GROUP BY c.tx, c.ty, c.qk, c.n_points
    )
    SELECT qk, tx, ty, n_points, hood_points, hood_cells
    FROM hood
    ORDER BY hood_points DESC, qk
    LIMIT {TOP_CELLS}
    """


@query("q899_neighborhood_hotspots", oracle=_q899_sql("duckdb"))
def q899_neighborhood_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hotspots with context: each cell's 3x3 tile-neighborhood point
    sum, computed as an EQUI-join of the cell table against a 9-row
    literal offset grid (tx+dx, ty+dy) — the standard trick that keeps
    neighborhood analytics out of spatial theta-join territory."""
    _views(spark, sf_dir)
    return spark.sql(_q899_sql("spark"))


# ---------------------------------------------------------------------------
# q900 — corridor sharing


def _q900_sql(d: str) -> str:
    return f"""
    WITH {_cells_cte(d)}
    SELECT qk, tx, ty, n_flights, n_points,
           ROUND(CAST(n_points AS DOUBLE) / n_flights, 6)
             AS points_per_flight
    FROM cells
    WHERE n_flights >= 2
    ORDER BY n_flights DESC, n_points DESC, qk
    LIMIT {TOP_CELLS}
    """


@query("q900_corridor_sharing", oracle=_q900_sql("duckdb"))
def q900_corridor_sharing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-corridor cells: tiles crossed by the most distinct
    flights (the airspace-congestion view of the same cell table; the
    reference's waypoint-box matching asks this per named fix,
    flightpath.go:26-43). Distinct-flight counting happens inside the
    one cell-keyed aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_q900_sql("spark"))


# ---------------------------------------------------------------------------
# q901 — bbox query vs index path


def _q901_sql(d: str) -> str:
    n = 1 << LEVEL
    # EXACT inverse-map tile bounds: lon_c is in tile tx iff
    # tx*36000 <= (lon_c+18000)*n < (tx+1)*36000, so the tile's
    # centi-lon range is [ceil(tx*36000/n), ceil((tx+1)*36000/n) - 1]
    # (ceil(a/b) = (a+b-1) div b for non-negative a); same for ty over
    # u = 9000 - lat_c. Floor-based bounds misclassify boundary cells
    # (caught by the sf0.001 paths_agree test).
    lon_min = f"({_idiv(d, f't.tx * 36000 + {n - 1}', str(n))}) - 18000"
    lon_max = f"({_idiv(d, f'(t.tx + 1) * 36000 + {n - 1}', str(n))}) - 1 - 18000"
    u_min = _idiv(d, f"t.ty * 18000 + {n - 1}", str(n))
    u_max = f"({_idiv(d, f'(t.ty + 1) * 18000 + {n - 1}', str(n))}) - 1"
    lat_min = f"9000 - ({u_max})"
    lat_max = f"9000 - ({u_min})"
    return f"""
    WITH {_tiles_cte(d)},
    cellsb AS (
      SELECT tx, ty,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(SUM(CASE WHEN lat_c >= {QLAT0} AND lat_c < {QLAT1}
                            AND lon_c >= {QLON0} AND lon_c < {QLON1}
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_inside
      FROM tiles GROUP BY tx, ty
    ),
    classified AS (
      SELECT t.tx, t.ty, t.n_points, t.n_inside,
             CASE WHEN ({lon_min}) >= {QLON0}
                   AND ({lon_max}) <= {QLON1} - 1
                   AND ({lat_min}) >= {QLAT0}
                   AND ({lat_max}) <= {QLAT1} - 1
                  THEN 1 ELSE 0 END AS fully_inside,
             CASE WHEN ({lon_max}) < {QLON0}
                   OR ({lon_min}) > {QLON1} - 1
                   OR ({lat_max}) < {QLAT0}
                   OR ({lat_min}) > {QLAT1} - 1
                  THEN 1 ELSE 0 END AS fully_outside
      FROM cellsb t
    )
    SELECT CAST(SUM(n_inside) AS BIGINT) AS n_direct,
           CAST(SUM(CASE WHEN fully_inside = 1 THEN n_points
                         WHEN fully_outside = 0 THEN n_inside
                         ELSE 0 END) AS BIGINT) AS n_via_index,
           CAST(SUM(fully_inside) AS BIGINT) AS n_full_cells,
           CAST(SUM(CASE WHEN fully_inside = 0 AND fully_outside = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_cells,
           CAST(SUM(fully_outside) AS BIGINT) AS n_pruned_cells,
           CAST(CASE WHEN SUM(n_inside) =
                SUM(CASE WHEN fully_inside = 1 THEN n_points
                         WHEN fully_outside = 0 THEN n_inside
                         ELSE 0 END) THEN 1 ELSE 0 END AS INT) AS paths_agree
    FROM classified
    """


@query("q901_bbox_index_equivalence", oracle=_q901_sql("duckdb"))
def q901_bbox_index_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The index-pruning contract, measured: a rectangle query answered
    directly (point predicate) and via the quadkey index — cells fully
    inside contribute their stored counts WITHOUT reading points,
    boundary cells refine, fully-outside cells prune. Both paths must
    agree exactly (paths_agree = 1, test-asserted); the pruned/full/
    boundary census is the scan-savings evidence. All containment
    tests are exact integer tile-bound arithmetic."""
    _views(spark, sf_dir)
    return spark.sql(_q901_sql("spark"))
