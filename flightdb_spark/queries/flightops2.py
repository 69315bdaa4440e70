"""Flight-operations batch 96 (q546-q550) — the ops-review queries
beside q334-q336 (holding, go-around, phase segments) on the same
deterministic synthetic trackpoints (queries/synth.py), extending the
reference's report family (reports/canned.py; ref report/report.go,
track.go PostProcess consumers):

- q546 descent profile: per-flight vertical-speed census over descent
  steps — mean/max descent rate and the steep-descent (>2,000 fpm)
  share, the stabilized-approach metric;
- q547 level busts: altitude excursions >= 300 ft that immediately
  return to the prior level — the altitude-deviation event an ops
  review counts per flight;
- q548 terminal-area census: points within a box around two literal
  "airports", split by altitude band — the approach/departure
  traffic count (q23's waypoint-crossing shape with an ops
  interpretation);
- q549 track-gap census: per-flight time gaps exceeding 3x the
  flight's median gap — the reference's assembly gap rule
  (streaming/assembly.py's 10-min/3x constants) re-run as a batch
  audit over existing tracks;
- q550 vertical reversals: climb<->descend sign changes per flight —
  the porpoising/instability proxy, pure integer counting on
  altitude deltas.

Determinism: the synthetic track columns are integer-derived (no
trig in the derivation); vertical rates are exact integer ft over
integer microseconds with one terminal division; medians are order
statistics per flight; every window partitions by flight_id.

100 TB shapes: all five are one flight-keyed window pass + one
aggregate — the q13/q26 trackpoint economics (bucketed storage on
flight_id removes the exchange entirely, storage.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .synth import SYNTH_TP_CTE

STEEP_FPM = 2000.0
BUST_FT = 300
RETURN_FT = 100
GAP_MULT = 3
APTS = ((37.6, -121.9), (38.2, -120.8))  # literal "airports"
APT_BOX_DEG = 0.15
APPROACH_ALT = 10_000


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _us(dialect: str) -> str:
    return "unix_micros(ts)" if dialect == "spark" else "epoch_us(ts)"


def _steps(dialect: str) -> str:
    us = _us(dialect)
    return f"""{SYNTH_TP_CTE},
    steps AS (
      SELECT flight_id, ts, event_id,
             alt_ft - LAG(alt_ft) OVER (PARTITION BY flight_id
                                        ORDER BY ts, event_id) AS d_alt,
             {us} - LAG({us}) OVER (PARTITION BY flight_id
                                    ORDER BY ts, event_id) AS d_us
      FROM trackpoints
    )"""


# ---------------------------------------------------------------------------
# q546 — descent profile


def _descent_sql(dialect: str) -> str:
    return f"""
    WITH {_steps(dialect)},
    rates AS (
      -- fpm = ft / minutes; exact integer operands, one division
      SELECT flight_id,
             -d_alt / (CAST(d_us AS DOUBLE) / 60000000) AS fpm_down
      FROM steps WHERE d_alt < 0 AND d_us > 0
    )
    SELECT flight_id,
           CAST(COUNT(*) AS BIGINT) AS n_descent_steps,
           ROUND(CAST(SUM(CAST(ROUND(fpm_down, 4) AS DECIMAL(38,4)))
                 AS DOUBLE) / COUNT(*), 2) AS mean_descent_fpm,
           ROUND(MAX(fpm_down), 2) AS max_descent_fpm,
           ROUND(CAST(SUM(CASE WHEN fpm_down > {STEEP_FPM!r} THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 4) AS steep_share
    FROM rates GROUP BY flight_id
    """


@query("q546_descent_profile", oracle=_descent_sql("duck"))
def q546_descent_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-flight descent-rate census: mean/max vertical speed over
    descending steps and the share steeper than 2,000 fpm — the
    stabilized-approach audit (ref track.go PostProcess consumers
    band vertical rates the same way). One flight-keyed LAG window;
    fpm is exact integer feet over integer microseconds with a
    single terminal division; rates round 4 dp into DECIMAL means."""
    _views(spark, sf_dir)
    return spark.sql(_descent_sql("spark"))


# ---------------------------------------------------------------------------
# q547 — level busts


def _bust_sql(dialect: str) -> str:
    return f"""
    WITH {SYNTH_TP_CTE},
    tri AS (
      SELECT flight_id,
             LAG(alt_ft) OVER (PARTITION BY flight_id
                               ORDER BY ts, event_id) AS prev_alt,
             alt_ft,
             LEAD(alt_ft) OVER (PARTITION BY flight_id
                                ORDER BY ts, event_id) AS next_alt
      FROM trackpoints
    ),
    busts AS (
      SELECT flight_id,
             CASE WHEN prev_alt IS NOT NULL AND next_alt IS NOT NULL
                   AND ABS(alt_ft - prev_alt) >= {BUST_FT}
                   AND ABS(next_alt - prev_alt) <= {RETURN_FT}
                  THEN 1 ELSE 0 END AS bust
      FROM tri
    )
    SELECT flight_id,
           CAST(SUM(bust) AS BIGINT) AS n_level_busts,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM busts GROUP BY flight_id
    """


@query("q547_level_busts", oracle=_bust_sql("duck"))
def q547_level_busts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Level-bust census: points that jump >= 300 ft off the prior
    altitude and RETURN to within 100 ft on the very next point — the
    transient altitude-deviation event (a real bust sustains; the
    return distinguishes sensor blips and short excursions, the same
    shape sanity_filter rejects at ingest). Integer-exact altitude
    comparisons; one flight-keyed lag/lead window."""
    _views(spark, sf_dir)
    return spark.sql(_bust_sql("spark"))


# ---------------------------------------------------------------------------
# q548 — terminal-area census


def _terminal_sql(dialect: str) -> str:
    branches = []
    for i, (alat, alon) in enumerate(APTS, start=1):
        branches.append(f"""
      SELECT 'apt{i}' AS airport,
             CASE WHEN alt_ft < {APPROACH_ALT} THEN 'terminal'
                  ELSE 'overflight' END AS band,
             CAST(COUNT(*) AS BIGINT) AS n_points,
             CAST(COUNT(DISTINCT flight_id) AS BIGINT) AS n_flights
      FROM trackpoints
      WHERE lat BETWEEN {alat!r} - {APT_BOX_DEG!r} AND {alat!r} + {APT_BOX_DEG!r}
        AND lon BETWEEN {alon!r} - {APT_BOX_DEG!r} AND {alon!r} + {APT_BOX_DEG!r}
      GROUP BY 2""")
    union = " UNION ALL ".join(branches)
    return f"""
    WITH {SYNTH_TP_CTE}
    {union}
    """


@query("q548_terminal_area_census", oracle=_terminal_sql("duck"))
def q548_terminal_area_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal-area traffic census: points and distinct flights
    inside a 0.15-degree box around each literal airport, split into
    terminal (< 10,000 ft) vs overflight bands — q23's box-predicate
    scan with the ops interpretation (the reference's
    airspace/sfo.go boxes are exactly such literals). Pure range
    predicates, pushdown-eligible; one aggregate per airport box."""
    _views(spark, sf_dir)
    return spark.sql(_terminal_sql("spark"))


# ---------------------------------------------------------------------------
# q549 — track-gap census


def _gap_sql(dialect: str) -> str:
    return f"""
    WITH {_steps(dialect)},
    gaps AS (SELECT flight_id, d_us FROM steps WHERE d_us IS NOT NULL),
    med AS (
      SELECT flight_id, CAST(MEDIAN(d_us) AS DOUBLE) AS med_us
      FROM gaps GROUP BY flight_id
    )
    SELECT g.flight_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(FLOOR(m.med_us / 1000000) AS BIGINT) AS median_gap_s,
           CAST(SUM(CASE WHEN g.d_us > {GAP_MULT} * m.med_us
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_break_gaps
    FROM gaps g JOIN med m ON m.flight_id = g.flight_id
    GROUP BY g.flight_id, m.med_us
    """


@query("q549_track_gap_census", oracle=_gap_sql("duck"))
def q549_track_gap_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Track-gap audit: per flight, inter-point gaps exceeding 3x the
    flight's own median gap — the batch re-run of the assembly gap
    rule (streaming/assembly.py closes a flight on 10-min/3x-gap;
    this census is how those constants get VALIDATED against
    assembled tracks). Per-flight medians are order statistics;
    integer microsecond gaps; the med join is co-keyed on
    flight_id."""
    _views(spark, sf_dir)
    return spark.sql(_gap_sql("spark"))


# ---------------------------------------------------------------------------
# q550 — vertical reversals


def _reversal_sql(dialect: str) -> str:
    return f"""
    WITH {_steps(dialect)},
    signs AS (
      SELECT flight_id, ts, event_id,
             CASE WHEN d_alt > 0 THEN 1 WHEN d_alt < 0 THEN -1 END AS s
      FROM steps WHERE d_alt IS NOT NULL AND d_alt <> 0
    ),
    flips AS (
      SELECT flight_id,
             CASE WHEN LAG(s) OVER (PARTITION BY flight_id
                                    ORDER BY ts, event_id) IS NOT NULL
                   AND s <> LAG(s) OVER (PARTITION BY flight_id
                                         ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS flip
      FROM signs
    )
    SELECT flight_id,
           CAST(SUM(flip) AS BIGINT) AS n_reversals,
           CAST(COUNT(*) AS BIGINT) AS n_moves,
           ROUND(CAST(SUM(flip) AS DOUBLE) / COUNT(*), 4) AS reversal_rate
    FROM flips GROUP BY flight_id
    """


@query("q550_vertical_reversals", oracle=_reversal_sql("duck"))
def q550_vertical_reversals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertical-rate reversal census: climb<->descend sign flips per
    flight over nonzero altitude steps — the porpoising/instability
    proxy an ops dashboard trends (q336 segments phases; this counts
    the TRANSITIONS). Integer sign arithmetic; one flight-keyed
    window pass."""
    _views(spark, sf_dir)
    return spark.sql(_reversal_sql("spark"))
