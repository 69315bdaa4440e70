"""Spatial-statistics batch 97 (q551-q555) — the classical spatial-
autocorrelation toolkit (Moran 1950, Geary 1954, Getis & Ord 1992,
Cliff & Ord join counts) over the deterministic synthetic trackpoint
grid (queries/synth.py), extending the reference's geospatial surface
(SURVEY.md §2.6; ref geo/, analysis/ density consumers) from "which
cells did a flight cross" to "is the traffic surface itself clustered":

- q551 global Moran's I of per-cell point counts under rook adjacency
  — the single-number "is density spatially clustered" statistic;
- q552 Geary's C on the same lattice — the local-contrast twin
  (C < 1 clustered, > 1 dispersed), sensitive where Moran is not;
- q553 Getis-Ord Gi* hotspot cells — the per-cell z-surface that
  turns global autocorrelation into a ranked hotspot list;
- q554 join-count statistics (BB / WW / BW) for the binary high-
  traffic split, with CSR-expected counts — the categorical-surface
  analogue;
- q555 spatial-lag smoothing residuals under queen adjacency — the
  cells that most disagree with their neighborhood, the anomaly
  surface a sector-load monitor watches.

Determinism: the grid is derived with pure integer arithmetic
(cell = event_id-residue DIV 10 — exactly the FLOOR(lat*10) binning of
the synthetic lat/lon, without touching a float); cell values are
COUNTs; Moran/Geary/join-counts are computed as exact integer/DECIMAL
cross-products with ONE terminal double division (DETERMINISM.md §2);
Gi* uses only IEEE-exact ops (add/sub/mul/div/sqrt — no pow/exp) on
identical inputs, then ranks on ROUND(z, 6) with a cell tie-break
(§4, §5).

100 TB shape: the lattice is BOUNDED (19 x 23 cells here; any fixed
grid at scale) — one map-side-partial groupBy collapses the corpus to
the cell table, and every subsequent join (4- or 8-offset neighbor
equi-join against a VALUES offset table) is a broadcast over that
bounded table. Nothing downstream of the first aggregate scales with
the data volume; there is no theta-join and no global window anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

# Integer grid: cx in 0..18 (lat residue DIV 10 over 0..180),
# cy in 0..22 (lon residue DIV 10 over 0..228). Matches
# FLOOR((lat-37)*10) / FLOOR((lon+122.5)*10) of synth.py exactly.
CELLS_CTE = """
cells AS (
  SELECT CAST((event_id % 181) / 10 AS BIGINT) AS cx,
         CAST(((event_id * 7) % 229) / 10 AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events
  GROUP BY 1, 2
)
"""

# DuckDB's integer / is float division; force integer semantics with //
CELLS_CTE_DUCK = """
cells AS (
  SELECT CAST((event_id % 181) // 10 AS BIGINT) AS cx,
         CAST(((event_id * 7) % 229) // 10 AS BIGINT) AS cy,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM events
  GROUP BY 1, 2
)
"""

ROOK = "(VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)"
QUEEN = (
    "(VALUES (1,0), (-1,0), (0,1), (0,-1), (1,1), (1,-1), (-1,1), (-1,-1))"
    " AS o(dx, dy)"
)


def _cells(dialect: str) -> str:
    # Spark's `/` on integers is double division; `DIV` is integer.
    if dialect == "spark":
        return CELLS_CTE.replace("/ 10", "DIV 10")
    return CELLS_CTE_DUCK


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


# ---------------------------------------------------------------------------
# q551 — global Moran's I (rook adjacency, integer-exact)


def _moran_sql(dialect: str) -> str:
    # z'_i = n*x_i - S (integer, = n * (x_i - mean)); the n factors
    # cancel between numerator and denominator, leaving one terminal
    # double division: I = n * sum(w z' z') / (S0 * sum(z'^2)).
    return f"""
    WITH {_cells(dialect)},
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM cells
    ),
    dev AS (
      SELECT c.cx, c.cy, t.n * c.x - t.s AS z
      FROM cells c CROSS JOIN tot t
    ),
    pairs AS (
      SELECT a.z AS za, b.z AS zb
      FROM dev a
      CROSS JOIN {ROOK}
      JOIN dev b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
    ),
    num AS (
      SELECT CAST(SUM(CAST(za AS DECIMAL(38,0)) * zb) AS DECIMAL(38,0)) AS wzz,
             CAST(COUNT(*) AS BIGINT) AS s0
      FROM pairs
    ),
    den AS (
      SELECT CAST(SUM(CAST(z AS DECIMAL(38,0)) * z) AS DECIMAL(38,0)) AS zz
      FROM dev
    )
    SELECT t.n AS n_cells,
           num.s0 AS s0_links,
           ROUND(CAST(t.n * num.wzz AS DOUBLE)
                 / CAST(num.s0 * den.zz AS DOUBLE), 6) AS moran_i,
           ROUND(-1.0 / (t.n - 1), 6) AS expected_i
    FROM tot t CROSS JOIN num CROSS JOIN den
    """


@query("q551_moran_i", oracle=_moran_sql("duck"))
def q551_moran_i(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I of per-cell traffic counts on the synthetic
    lattice under rook adjacency. Computed integer-exactly: deviations
    are scaled by n (z' = n*x - S, an integer), cross-products
    accumulate in DECIMAL(38,0), and the statistic is ONE terminal
    double division — bit-identical across engines and partitionings.
    At 100 TB the corpus collapses to the bounded cell table in one
    map-side-partial aggregate; the rook join is a broadcast over
    ~400 rows."""
    _views(spark, sf_dir)
    return spark.sql(_moran_sql("spark"))


# ---------------------------------------------------------------------------
# q552 — Geary's C


def _geary_sql(dialect: str) -> str:
    # C = (n-1) * sum(w (x_i - x_j)^2) / (2 S0 sum(z^2)); with
    # z' = n*z the denominator is sum(z'^2)/n^2, so
    # C = (n-1) * n^2 * sum(w d^2) / (2 S0 sum(z'^2)) — integer-exact
    # until one terminal division.
    return f"""
    WITH {_cells(dialect)},
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM cells
    ),
    dev AS (
      SELECT c.cx, c.cy, c.x, t.n * c.x - t.s AS z
      FROM cells c CROSS JOIN tot t
    ),
    pairs AS (
      SELECT a.x - b.x AS d
      FROM dev a
      CROSS JOIN {ROOK}
      JOIN dev b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
    ),
    num AS (
      SELECT CAST(SUM(CAST(d AS DECIMAL(38,0)) * d) AS DECIMAL(38,0)) AS wdd,
             CAST(COUNT(*) AS BIGINT) AS s0
      FROM pairs
    ),
    den AS (
      SELECT CAST(SUM(CAST(z AS DECIMAL(38,0)) * z) AS DECIMAL(38,0)) AS zz
      FROM dev
    )
    SELECT t.n AS n_cells,
           num.s0 AS s0_links,
           ROUND(CAST((t.n - 1) * t.n * t.n * num.wdd AS DOUBLE)
                 / CAST(2 * num.s0 * den.zz AS DOUBLE), 6) AS geary_c
    FROM tot t CROSS JOIN num CROSS JOIN den
    """


@query("q552_geary_c", oracle=_geary_sql("duck"))
def q552_geary_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geary's C on the same lattice — the local-contrast
    autocorrelation statistic (C < 1 clustered, C > 1 dispersed).
    Same integer-exact construction as q551: squared neighbor
    differences and scaled deviations accumulate in DECIMAL(38,0),
    one terminal double division. Same bounded-lattice 100 TB shape."""
    _views(spark, sf_dir)
    return spark.sql(_geary_sql("spark"))


# ---------------------------------------------------------------------------
# q553 — Getis-Ord Gi* hotspots


def _getis_sql(dialect: str) -> str:
    # Gi* includes self in the neighborhood (queen + self). All float
    # ops are IEEE-exact (add/sub/mul/div/sqrt) on identical integer
    # inputs, so the z surface is bit-identical; rank on ROUND(z,6)
    # with the cell id as total tie-break (DETERMINISM.md §4).
    return f"""
    WITH {_cells(dialect)},
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS s,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS ss
      FROM cells
    ),
    nbr AS (
      SELECT a.cx, a.cy,
             CAST(SUM(b.x) AS BIGINT) AS wx,
             CAST(COUNT(*) AS BIGINT) AS wi
      FROM cells a
      CROSS JOIN {QUEEN}
      JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
      GROUP BY a.cx, a.cy
    ),
    star AS (
      -- include self: wx* = wx + x, wi* = wi + 1
      SELECT c.cx, c.cy, c.x,
             n.wx + c.x AS wx, n.wi + 1 AS wi
      FROM cells c
      JOIN nbr n ON n.cx = c.cx AND n.cy = c.cy
    ),
    zed AS (
      SELECT s.cx, s.cy, s.x, s.wi,
             -- numerator: wx - mean*wi  (exact rational -> double once)
             (CAST(s.wx AS DOUBLE) - CAST(t.s AS DOUBLE) * s.wi / t.n)
             / (SQRT(CAST(t.ss AS DOUBLE) / t.n
                     - (CAST(t.s AS DOUBLE) / t.n)
                       * (CAST(t.s AS DOUBLE) / t.n))
                * SQRT((CAST(t.n AS DOUBLE) * s.wi - CAST(s.wi AS DOUBLE) * s.wi)
                       / (t.n - 1))) AS gi
      FROM star s CROSS JOIN tot t
    )
    SELECT cx, cy, x AS cell_count, wi AS neighborhood_size,
           ROUND(gi, 6) AS gi_star
    FROM zed
    ORDER BY ROUND(gi, 6) DESC, cx, cy
    LIMIT 15
    """


@query("q553_getis_hotspots", oracle=_getis_sql("duck"))
def q553_getis_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Getis-Ord Gi* hotspot detection: the 15 lattice cells whose
    (self-inclusive queen) neighborhood traffic is most above the
    global mean, as a z-like surface. Every float op is IEEE-exact on
    integer inputs (no pow/exp), ranked on the rounded statistic with
    a cell tie-break. The neighbor sum is an 8-offset broadcast
    equi-join over the bounded cell table — TakeOrdered top-k, no
    global sort."""
    _views(spark, sf_dir)
    return spark.sql(_getis_sql("spark"))


# ---------------------------------------------------------------------------
# q554 — join-count statistics (binary high/low surface)

HI_PER_CELL = 2  # "high-traffic" = cell count >= 2x the integer mean floor


def _joincount_sql(dialect: str) -> str:
    # Binary split at an exact integer threshold: x*n >= 2*S compares
    # cross-multiplied integers (DETERMINISM.md §3). BB/WW/BW counts
    # are integers; CSR expectations are one terminal double each.
    return f"""
    WITH {_cells(dialect)},
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      FROM cells
    ),
    lab AS (
      SELECT c.cx, c.cy,
             CASE WHEN c.x * t.n >= {HI_PER_CELL} * t.s THEN 1 ELSE 0 END AS b
      FROM cells c CROSS JOIN tot t
    ),
    pairs AS (
      SELECT a.b AS ba, bb.b AS bb
      FROM lab a
      CROSS JOIN {ROOK}
      JOIN lab bb ON bb.cx = a.cx + o.dx AND bb.cy = a.cy + o.dy
    ),
    cnt AS (
      SELECT CAST(SUM(ba * bb) AS BIGINT) AS bb2,
             CAST(SUM((1 - ba) * (1 - bb)) AS BIGINT) AS ww2,
             CAST(SUM(ba + bb - 2 * ba * bb) AS BIGINT) AS bw2,
             CAST(COUNT(*) AS BIGINT) AS s02
      FROM pairs
    ),
    nb AS (
      SELECT CAST(SUM(b) AS BIGINT) AS k FROM lab
    )
    SELECT t.n AS n_cells, nb.k AS n_high,
           cnt.bb2 / 2 AS bb_joins,
           cnt.ww2 / 2 AS ww_joins,
           cnt.bw2 / 2 AS bw_joins,
           -- leading 0.0 + kills IEEE -0.0 (k=0 makes k*(k-1) negative-zero
           -- after the double product; DuckDB's ROUND keeps the sign)
           ROUND(0.0 + CAST(cnt.s02 AS DOUBLE) / 2
                 * nb.k * (nb.k - 1)
                 / (CAST(t.n AS DOUBLE) * (t.n - 1)), 4) AS expected_bb,
           ROUND(0.0 + CAST(cnt.s02 AS DOUBLE) / 2
                 * 2.0 * nb.k * (t.n - nb.k)
                 / (CAST(t.n AS DOUBLE) * (t.n - 1)), 4) AS expected_bw
    FROM tot t CROSS JOIN cnt CROSS JOIN nb
    """


@query("q554_join_counts", oracle=_joincount_sql("duck"))
def q554_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cliff-Ord join-count statistics for the binary high-traffic
    surface (cell count >= 2x mean, compared as cross-multiplied
    integers): observed BB / WW / BW rook joins vs their CSR
    expectations. The categorical analogue of q551 — the test an
    airspace-sector analyst runs on a congestion bitmap. Integer-exact
    counts; expectations are terminal doubles."""
    _views(spark, sf_dir)
    return spark.sql(_joincount_sql("spark"))


# ---------------------------------------------------------------------------
# q555 — spatial-lag smoothing residuals


def _lag_sql(dialect: str) -> str:
    # residual r_i = x_i - mean(neighbors); exact as the cross-
    # multiplied integer x_i*wi - wx with one terminal division for
    # display. Rank on the integer cross-product — no float compare.
    return f"""
    WITH {_cells(dialect)},
    nbr AS (
      SELECT a.cx, a.cy, a.x,
             CAST(SUM(b.x) AS BIGINT) AS wx,
             CAST(COUNT(*) AS BIGINT) AS wi
      FROM cells a
      CROSS JOIN {QUEEN}
      JOIN cells b ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
      GROUP BY a.cx, a.cy, a.x
    )
    SELECT cx, cy, x AS cell_count, wi AS neighborhood_size,
           ROUND(CAST(wx AS DOUBLE) / wi, 4) AS neighbor_mean,
           ROUND(CAST(x AS DOUBLE) - CAST(wx AS DOUBLE) / wi, 4) AS residual
    FROM nbr
    ORDER BY ABS(x * wi - wx) * 8 / wi DESC, cx, cy
    LIMIT 12
    """


@query("q555_spatial_lag_residuals", oracle=_lag_sql("duck"))
def q555_spatial_lag_residuals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial-lag smoothing: each cell vs the mean of its queen
    neighborhood, ranked by the cells that most disagree with their
    surroundings — the local-anomaly surface (a sudden hole or spike
    in an otherwise smooth traffic field). The ranking key is the
    cross-multiplied integer |x*wi - wx| scaled by 8/wi (integer,
    exact — edge cells with wi<8 are upweighted to their full-
    neighborhood equivalent), so no float comparison decides order."""
    _views(spark, sf_dir)
    return spark.sql(_lag_sql("spark"))
