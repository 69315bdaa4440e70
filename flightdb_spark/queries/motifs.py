"""Time-series motif batch 104 (q586-q590) — matrix-profile-style
motif/discord discovery over the per-flight synthetic altitude
series (queries/synth.py), in EXACT INTEGER arithmetic: windows of
m=4 points are mean-centered at 4x scale (4*a_k - sum(a), always an
integer since alt_ft is integral), so squared distances between
windows are exact BIGINTs — no sqrt, no float z-scores, and the
whole profile is oracle-checkable bit-for-bit.

- q586 motif pairs: per flight the minimum-distance NON-OVERLAPPING
  window pair (|i-j| >= m), global top-10 tightest motifs;
- q587 discords: each window's nearest-neighbor distance, the
  per-flight maximum (the most anomalous subsequence), top-10;
- q588 shape census: exact-match centered signatures grouped
  globally — which 4-point shapes recur across MANY flights;
- q589 series complexity: per-flight sum of squared steps (the
  complexity-estimate screen that orders motif work), banded by
  digit count;
- q590 banded cross-flight motif search: LSH-style half-sum buckets
  -> candidate pairs across flights -> exact-distance verify (the
  MinHash->verify architecture of textdedup applied to time
  series), one-row funnel summary.

100 TB shape: window extraction is LEAD windows PARTITIONED BY
flight; q586/q587's all-pairs join is per-flight bounded (width^2
within one key, the bucketed-as-of economics); q588 is one exact
groupBy; q590's candidate join is an equi-join on bucket keys with a
size guard — never corpus n^2. Negative-safe integer bucketing uses
an additive offset instead of floor-division (Spark div truncates
toward zero, DuckDB // floors — they diverge on negatives).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .synth import SYNTH_TP_CTE

M = 4  # window length
BUCKET_W = 400  # half-sum quantization width for q590
OFFSET = 1_000_000  # makes half-sums positive before integer div
TOP_K = 10


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _win_cte() -> str:
    """Sliding m=4 windows with 4x-scaled mean-centered components
    (exact integers). alt is integral by construction (synth.py)."""
    return f"""
    {SYNTH_TP_CTE.strip().rstrip()},
    pts AS (
      SELECT flight_id, CAST(alt_ft AS BIGINT) AS alt,
             ROW_NUMBER() OVER (PARTITION BY flight_id ORDER BY ts, event_id)
               AS i
      FROM trackpoints
    ),
    lagd AS (
      SELECT flight_id, i, alt AS a1,
             LEAD(alt, 1) OVER w AS a2,
             LEAD(alt, 2) OVER w AS a3,
             LEAD(alt, 3) OVER w AS a4
      FROM pts
      WINDOW w AS (PARTITION BY flight_id ORDER BY i)
    ),
    win AS (
      SELECT flight_id, i,
             4 * a1 - (a1 + a2 + a3 + a4) AS c1,
             4 * a2 - (a1 + a2 + a3 + a4) AS c2,
             4 * a3 - (a1 + a2 + a3 + a4) AS c3,
             4 * a4 - (a1 + a2 + a3 + a4) AS c4
      FROM lagd WHERE a4 IS NOT NULL
    )"""


_DIST = (
    "(x.c1 - y.c1) * (x.c1 - y.c1) + (x.c2 - y.c2) * (x.c2 - y.c2)"
    " + (x.c3 - y.c3) * (x.c3 - y.c3) + (x.c4 - y.c4) * (x.c4 - y.c4)"
)


# ---------------------------------------------------------------------------
# q586 — motif pairs


def _motif_sql() -> str:
    return f"""
    WITH {_win_cte()},
    dists AS (
      SELECT x.flight_id, x.i AS i, y.i AS j,
             CAST({_DIST} AS BIGINT) AS dist
      FROM win x JOIN win y
        ON y.flight_id = x.flight_id AND y.i >= x.i + {M}
    ),
    ranked AS (
      SELECT flight_id, i, j, dist,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY dist, i, j) AS rn
      FROM dists
    )
    SELECT flight_id, i, j, dist
    FROM ranked WHERE rn = 1
    ORDER BY dist, flight_id, i, j
    LIMIT {TOP_K}
    """


@query("q586_motif_pairs", oracle=_motif_sql())
def q586_motif_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matrix-profile motif: per flight the tightest
    non-overlapping window pair by exact integer distance, global
    top-10. The all-pairs join is bounded WITHIN each flight key
    (width^2 per key, one equi-join shuffle on flight_id); the
    per-flight argmin is a partitioned rank window."""
    _views(spark, sf_dir)
    return spark.sql(_motif_sql())


# ---------------------------------------------------------------------------
# q587 — discords


def _discord_sql() -> str:
    return f"""
    WITH {_win_cte()},
    dists AS (
      SELECT x.flight_id, x.i AS i,
             CAST({_DIST} AS BIGINT) AS dist
      FROM win x JOIN win y
        ON y.flight_id = x.flight_id
       AND (y.i >= x.i + {M} OR y.i <= x.i - {M})
    ),
    nn AS (
      SELECT flight_id, i, CAST(MIN(dist) AS BIGINT) AS nn_dist
      FROM dists GROUP BY flight_id, i
    ),
    ranked AS (
      SELECT flight_id, i, nn_dist,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY nn_dist DESC, i) AS rn
      FROM nn
    )
    SELECT flight_id, i AS discord_i, nn_dist
    FROM ranked WHERE rn = 1
    ORDER BY nn_dist DESC, flight_id, discord_i
    LIMIT {TOP_K}
    """


@query("q587_discords", oracle=_discord_sql())
def q587_discords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The matrix-profile discord: per window the nearest
    NON-OVERLAPPING neighbor distance, per flight the maximum (the
    subsequence least like anything else in its series), top-10
    global. Same per-flight bounded join as q586 plus one
    (flight, window) aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_discord_sql())


# ---------------------------------------------------------------------------
# q588 — recurring shape census


def _shape_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    sig = (
        f"concat(CAST(c1 AS {s}), ':', CAST(c2 AS {s}), ':', "
        f"CAST(c3 AS {s}), ':', CAST(c4 AS {s}))"
    )
    return f"""
    WITH {_win_cte()}
    SELECT {sig} AS shape,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(COUNT(DISTINCT flight_id) AS BIGINT) AS n_flights
    FROM win
    GROUP BY {sig}
    ORDER BY n_flights DESC, n_windows DESC, shape
    LIMIT {TOP_K}
    """


@query("q588_shape_census", oracle=_shape_sql("duck"))
def q588_shape_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-shape recurrence: mean-centered window signatures grouped
    globally — the shapes that recur across the most flights. One
    exact groupBy on the integer signature (the degenerate-but-exact
    end of motif hashing); map-side partial aggregation applies."""
    _views(spark, sf_dir)
    return spark.sql(_shape_sql("spark"))


# ---------------------------------------------------------------------------
# q589 — series complexity


def _complexity_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH {SYNTH_TP_CTE.strip()},
    pts AS (
      SELECT flight_id, CAST(alt_ft AS BIGINT) AS alt,
             ROW_NUMBER() OVER (PARTITION BY flight_id ORDER BY ts, event_id)
               AS i
      FROM trackpoints
    ),
    steps AS (
      SELECT flight_id,
             alt - LAG(alt) OVER (PARTITION BY flight_id ORDER BY i) AS d
      FROM pts
    ),
    ce AS (
      SELECT flight_id, CAST(SUM(d * d) AS BIGINT) AS ce
      FROM steps WHERE d IS NOT NULL
      GROUP BY flight_id
    )
    SELECT CAST(LENGTH(CAST(ce AS {s})) AS BIGINT) AS ce_digits,
           CAST(COUNT(*) AS BIGINT) AS n_flights,
           CAST(MIN(ce) AS BIGINT) AS min_ce,
           CAST(MAX(ce) AS BIGINT) AS max_ce
    FROM ce
    GROUP BY LENGTH(CAST(ce AS {s}))
    ORDER BY ce_digits
    """


@query("q589_series_complexity", oracle=_complexity_sql("duck"))
def q589_series_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complexity-estimate screen (sum of squared steps, exact
    BIGINT) that orders motif work — low-complexity series cannot
    contain high-contrast motifs, so a 100 TB motif job prunes on
    this first. One LAG window per flight + one aggregate, flights
    banded by CE digit count."""
    _views(spark, sf_dir)
    return spark.sql(_complexity_sql("spark"))


# ---------------------------------------------------------------------------
# q590 — banded cross-flight motif search


def _banded_sql(dialect: str) -> str:
    h1 = _idiv(dialect, f"c1 + c2 + {OFFSET}", str(BUCKET_W))
    h2 = _idiv(dialect, f"c3 + c4 + {OFFSET}", str(BUCKET_W))
    return f"""
    WITH {_win_cte()},
    keyed AS (
      SELECT flight_id, i, c1, c2, c3, c4,
             {h1} AS b1, {h2} AS b2
      FROM win
    ),
    cands AS (
      SELECT x.flight_id AS fa, x.i AS ia, y.flight_id AS fb, y.i AS ib,
             CAST({_DIST} AS BIGINT) AS dist
      FROM keyed x JOIN keyed y
        ON y.b1 = x.b1 AND y.b2 = x.b2
       AND (y.flight_id > x.flight_id)
    )
    SELECT CAST((SELECT COUNT(*) FROM keyed) AS BIGINT) AS n_windows,
           CAST((SELECT COUNT(*) FROM
                 (SELECT b1, b2 FROM keyed GROUP BY b1, b2) b) AS BIGINT)
             AS n_buckets,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_exact_matches,
           CAST(COUNT(DISTINCT CASE WHEN dist = 0 THEN fa END) AS BIGINT)
             AS flights_with_match
    FROM cands
    """


@query("q590_banded_motif_search", oracle=_banded_sql("duck"))
def q590_banded_motif_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-flight motif search, LSH-banded: windows bucket on
    quantized half-sums (offset-shifted so integer division never
    sees a negative — Spark div truncates, DuckDB // floors), the
    candidate join is an EQUI-join on bucket keys across different
    flights, and exact zero-distance verification closes the funnel
    — textdedup's band->verify architecture on time series. Output
    is the one-row funnel summary (windows -> buckets -> candidates
    -> exact matches)."""
    _views(spark, sf_dir)
    return spark.sql(_banded_sql("spark"))
