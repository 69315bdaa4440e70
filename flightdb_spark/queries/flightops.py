"""Flight-operations batch 45 (q334-q336): the safety-analytics trio
on top of the synthetic tracks — holding-pattern detection by
cumulative turn (a full 360 of accumulated heading change inside a
short window is the classic loiter signature), go-around detection
(descent through low altitude followed by an immediate sustained
climb — the approach-abort event every ops review counts), and
climb/level/descent phase segmentation (the gaps-and-islands pass
that turns raw altitude into flight phases; q26 bands altitude,
this segments its DERIVATIVE).

Reference parity: these extend the report family of
reports/canned.py (levelflight2, sfoclassb, approachsignature) with
the three ops queries the reference's users compute downstream of
its PostProcess columns (ref f/flight.go PostProcess,
track.go:849-913 closest/level analysis).

Determinism: bearings use functions/geo.bearing_deg's exact formula
inlined into the oracle; per-step turns round to 4 dp into DECIMAL
before any accumulation; altitude arithmetic is exact (synthetic
altitudes are integer-valued doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.geo import bearing_deg
from . import query
from .synth import SYNTH_TP_CTE, synth_trackpoints

HOLD_WINDOW = 10  # points
HOLD_TURN_DEG = 300.0
GA_ALT_FT = 8000.0
GA_CLIMB_FT = 1000.0
GA_LOOKAHEAD = 5  # points

# DuckDB twin of functions/geo.bearing_deg (same formula, term by term)
_BEARING_DUCK = """
  fmod(fmod(degrees(atan2(
      sin(radians(lon - plon)) * cos(radians(lat)),
      cos(radians(plat)) * sin(radians(lat))
        - sin(radians(plat)) * cos(radians(lat))
          * cos(radians(lon - plon))
  )), 360) + 360, 360)
"""


@query(
    "q334_holding_detection",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    seq AS (
      SELECT flight_id, ts, event_id, lat, lon,
             LAG(lat) OVER w AS plat, LAG(lon) OVER w AS plon
      FROM trackpoints
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    ),
    brg AS (
      SELECT flight_id, ts, event_id,
             CASE WHEN plat IS NULL THEN NULL ELSE {_BEARING_DUCK} END AS b
      FROM seq
    ),
    turns AS (
      SELECT flight_id, ts, event_id,
             CAST(ROUND(fmod(fmod(b - LAG(b) OVER w, 360) + 540, 360) - 180,
                        4) AS DECIMAL(38,4)) AS turn
      FROM brg WHERE b IS NOT NULL
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    ),
    rolled AS (
      SELECT flight_id,
             SUM(turn) OVER (PARTITION BY flight_id ORDER BY ts, event_id
                             ROWS BETWEEN {HOLD_WINDOW - 1} PRECEDING
                             AND CURRENT ROW) AS cum_turn,
             COUNT(turn) OVER (PARTITION BY flight_id ORDER BY ts, event_id
                             ROWS BETWEEN {HOLD_WINDOW - 1} PRECEDING
                             AND CURRENT ROW) AS n_in_w
      FROM turns WHERE turn IS NOT NULL
    )
    SELECT flight_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN n_in_w = {HOLD_WINDOW}
                    AND ABS(cum_turn) >= {HOLD_TURN_DEG!r}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_holding_windows,
           ROUND(CAST(MAX(ABS(cum_turn)) AS DOUBLE), 4) AS max_abs_turn
    FROM rolled
    GROUP BY flight_id
    HAVING SUM(CASE WHEN n_in_w = {HOLD_WINDOW}
               AND ABS(cum_turn) >= {HOLD_TURN_DEG!r}
               THEN 1 ELSE 0 END) > 0
    ORDER BY flight_id
    """,
)
def q334_holding_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holding-pattern (loiter) detection: accumulate wrapped heading
    change over a sliding {HOLD_WINDOW}-point window per flight and
    flag windows whose |cumulative turn| reaches {HOLD_TURN_DEG} deg
    — near-full-circle turning in a short span is the racetrack-hold
    signature (the geometric complement of canned.py's levelflight,
    which looks at altitude instead of heading). Returns only
    flights with at least one flagged window. Scale: everything is
    flight-partitioned windows over the point stream — one shuffle
    on flight_id serves the lag, the turn, and the rolling sum;
    turns round 4 dp into DECIMAL so the rolling sums are exact."""
    tp = synth_trackpoints(spark, sf_dir)
    w = W.partitionBy("flight_id").orderBy("ts", "event_id")
    seq = tp.select(
        "flight_id",
        "ts",
        "event_id",
        "lat",
        "lon",
        F.lag("lat").over(w).alias("plat"),
        F.lag("lon").over(w).alias("plon"),
    )
    brg = seq.select(
        "flight_id",
        "ts",
        "event_id",
        F.when(
            F.col("plat").isNotNull(),
            bearing_deg(
                F.col("plat"), F.col("plon"), F.col("lat"), F.col("lon")
            ),
        ).alias("b"),
    ).filter(F.col("b").isNotNull())
    turn = (
        F.pmod(F.pmod(F.col("b") - F.lag("b").over(w), F.lit(360.0)) + 540.0,
               F.lit(360.0))
        - 180.0
    )
    turns = brg.select(
        "flight_id",
        "ts",
        "event_id",
        F.round(turn, 4).cast("decimal(38,4)").alias("turn"),
    ).filter(F.col("turn").isNotNull())
    wr = w.rowsBetween(-(HOLD_WINDOW - 1), 0)
    rolled = turns.select(
        "flight_id",
        F.sum("turn").over(wr).alias("cum_turn"),
        F.count("turn").over(wr).alias("n_in_w"),
    )
    flagged = F.when(
        (F.col("n_in_w") == HOLD_WINDOW)
        & (F.abs(F.col("cum_turn")) >= HOLD_TURN_DEG),
        1,
    ).otherwise(0)
    return (
        rolled.groupBy("flight_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_windows"),
            F.sum(flagged).cast("bigint").alias("n_holding_windows"),
            F.round(F.max(F.abs(F.col("cum_turn"))).cast("double"), 4).alias(
                "max_abs_turn"
            ),
        )
        .filter(F.col("n_holding_windows") > 0)
        .orderBy("flight_id")
    )


@query(
    "q335_go_around",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    seq AS (
      SELECT flight_id, ts, event_id, alt_ft,
             alt_ft - LAG(alt_ft) OVER w AS vs,
             SUM(alt_ft) OVER (PARTITION BY flight_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND {GA_LOOKAHEAD} FOLLOWING)
               AS next_sum,
             COUNT(*) OVER (PARTITION BY flight_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND {GA_LOOKAHEAD} FOLLOWING)
               AS next_n
      FROM trackpoints
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    ),
    hits AS (
      SELECT flight_id, alt_ft
      FROM seq
      WHERE vs < 0 AND alt_ft < {GA_ALT_FT!r}
        AND next_n = {GA_LOOKAHEAD}
        AND next_sum / next_n >= alt_ft + {GA_CLIMB_FT!r}
    )
    SELECT flight_id,
           CAST(COUNT(*) AS BIGINT) AS n_go_arounds,
           ROUND(MIN(alt_ft), 1) AS lowest_abort_alt_ft
    FROM hits GROUP BY flight_id ORDER BY flight_id
    """,
)
def q335_go_around(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Go-around detection: a point that is DESCENDING below
    {GA_ALT_FT:.0f} ft whose next {GA_LOOKAHEAD} points average at
    least {GA_CLIMB_FT:.0f} ft higher — the approach was abandoned
    and the aircraft climbed away. Reported per flight with the
    lowest abort altitude (the number a go-around review starts
    from). Scale: one flight-partitioned window pass provides the
    descent flag and the forward-looking climb average; altitude
    arithmetic is exact on the synthetic integer-valued altitudes."""
    tp = synth_trackpoints(spark, sf_dir)
    w = W.partitionBy("flight_id").orderBy("ts", "event_id")
    fwd = w.rowsBetween(1, GA_LOOKAHEAD)
    seq = tp.select(
        "flight_id",
        "alt_ft",
        (F.col("alt_ft") - F.lag("alt_ft").over(w)).alias("vs"),
        F.sum("alt_ft").over(fwd).alias("next_sum"),
        F.count(F.lit(1)).over(fwd).alias("next_n"),
    )
    hits = seq.filter(
        (F.col("vs") < 0)
        & (F.col("alt_ft") < GA_ALT_FT)
        & (F.col("next_n") == GA_LOOKAHEAD)
        & (F.col("next_sum") / F.col("next_n")
           >= F.col("alt_ft") + GA_CLIMB_FT)
    )
    return (
        hits.groupBy("flight_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_go_arounds"),
            F.round(F.min("alt_ft"), 1).alias("lowest_abort_alt_ft"),
        )
        .orderBy("flight_id")
    )


@query(
    "q336_phase_segments",
    oracle=f"""
    WITH {SYNTH_TP_CTE},
    seq AS (
      SELECT flight_id, ts, event_id, alt_ft,
             alt_ft - LAG(alt_ft) OVER w AS vs,
             ROW_NUMBER() OVER w AS rn
      FROM trackpoints
      WINDOW w AS (PARTITION BY flight_id ORDER BY ts, event_id)
    ),
    phased AS (
      SELECT flight_id, rn,
             CASE WHEN vs > 0 THEN 'climb'
                  WHEN vs < 0 THEN 'descent'
                  ELSE 'level' END AS phase
      FROM seq WHERE vs IS NOT NULL
    ),
    islands AS (
      SELECT flight_id, phase,
             rn - ROW_NUMBER() OVER (PARTITION BY flight_id, phase
                                     ORDER BY rn) AS grp
      FROM phased
    ),
    segs AS (
      SELECT flight_id, phase, grp, COUNT(*) AS seg_len
      FROM islands GROUP BY flight_id, phase, grp
    )
    SELECT phase,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           ROUND(AVG(CAST(seg_len AS DOUBLE)), 6) AS avg_len,
           CAST(MAX(seg_len) AS BIGINT) AS max_len
    FROM segs GROUP BY phase ORDER BY phase
    """,
)
def q336_phase_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Climb/level/descent phase segmentation: classify every step by
    the sign of the altitude delta and collapse consecutive
    same-phase steps with the gaps-and-islands trick (rn minus
    per-phase rn — the q15/q26 primitive applied to the altitude
    DERIVATIVE), then summarize segment counts and lengths per
    phase. The segmentation every downstream ops metric (time in
    climb, average descent length) starts from. Scale: two window
    functions share one flight_id shuffle; the island key is pure
    arithmetic; the final aggregate has 3 rows."""
    tp = synth_trackpoints(spark, sf_dir)
    w = W.partitionBy("flight_id").orderBy("ts", "event_id")
    seq = tp.select(
        "flight_id",
        (F.col("alt_ft") - F.lag("alt_ft").over(w)).alias("vs"),
        F.row_number().over(w).alias("rn"),
    ).filter(F.col("vs").isNotNull())
    phased = seq.select(
        "flight_id",
        "rn",
        F.when(F.col("vs") > 0, "climb")
        .when(F.col("vs") < 0, "descent")
        .otherwise("level")
        .alias("phase"),
    )
    wp = W.partitionBy("flight_id", "phase").orderBy("rn")
    islands = phased.withColumn(
        "grp", F.col("rn") - F.row_number().over(wp)
    )
    segs = islands.groupBy("flight_id", "phase", "grp").agg(
        F.count(F.lit(1)).alias("seg_len")
    )
    return (
        segs.groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_segments"),
            F.round(F.avg(F.col("seg_len").cast("double")), 6).alias(
                "avg_len"
            ),
            F.max("seg_len").cast("bigint").alias("max_len"),
        )
        .orderBy("phase")
    )
