"""Haar-wavelet batch 106 (q596-q600) — multiresolution analysis of
the per-flight synthetic altitude series (queries/synth.py) with the
UNNORMALIZED integer Haar transform: a detail coefficient at level L
and block k is (sum of the block's first half) - (sum of its second
half) over blocks of 2^L points, so every coefficient and every
energy is an exact BIGINT (the 1/sqrt(2) normalization is a known
per-level constant and never touches the data). No recursion needed:
each level is computed independently as ONE signed aggregate over
(flight, level, block) — the closed form of the lifting scheme.

- q596 energy spectrum: total detail energy per level across all
  flights, with shares — where the series' variance lives by scale;
- q597 compression concentration: per flight the energy share of its
  top-8 |coefficients| (how compressible each series is), banded;
- q598 threshold census: per level, coefficients surviving a hard
  threshold and the energy they keep;
- q599 Allan variance: mean squared difference of SUCCESSIVE block
  sums per level — the multi-resolution stability metric;
- q600 spikiness ranking: flights whose finest-level (L=1) energy
  share is highest — the wavelet anomaly screen, top 10.

100 TB shape: the 6-level expansion is a 6-row VALUES cross join
(6x map-side fan-out, no shuffle), coefficients come from ONE
(flight, level, block) aggregate — co-keyed with flight bucketing —
and per-flight ranks partition by flight. Series length is capped at
the first 64 points per flight (row_number window per flight).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query
from .synth import SYNTH_TP_CTE

N_PTS = 64
LEVELS = 6
TOP_COEF = 8
HARD_T = 4000  # |d| threshold for q598


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _idiv(dialect: str, a: str, b: str) -> str:
    if dialect == "spark":
        return f"(({a}) div ({b}))"
    return f"(({a}) // ({b}))"


def _coef_cte(dialect: str) -> str:
    """Detail coefficients for all levels in one signed aggregate.
    i is 1-based; pos = i-1; block = pos div 2^L; sign = +1 in the
    first half of the block, -1 in the second."""
    levels = ", ".join(f"({lv})" for lv in range(1, LEVELS + 1))
    blk = _idiv(dialect, "p.i - 1", "CAST(POWER(2, l.lv) AS BIGINT)")
    # position within block < half-width ? +1 : -1, all integer:
    inblk = f"(p.i - 1) % CAST(POWER(2, l.lv) AS BIGINT)"
    half = f"CAST(POWER(2, l.lv - 1) AS BIGINT)"
    return f"""
    {SYNTH_TP_CTE.strip()},
    pts AS (
      SELECT flight_id, CAST(alt_ft AS BIGINT) AS alt,
             ROW_NUMBER() OVER (PARTITION BY flight_id ORDER BY ts, event_id)
               AS i
      FROM trackpoints
    ),
    capped AS (SELECT * FROM pts WHERE i <= {N_PTS}),
    lvls(lv) AS (VALUES {levels}),
    coefs AS (
      SELECT p.flight_id, l.lv,
             CAST({blk} AS BIGINT) AS blk,
             CAST(SUM(CASE WHEN {inblk} < {half} THEN p.alt
                           ELSE -p.alt END) AS BIGINT) AS d
      FROM capped p CROSS JOIN lvls l
      GROUP BY p.flight_id, l.lv, {blk}
    )"""


# ---------------------------------------------------------------------------
# q596 — energy spectrum


def _spectrum_sql(dialect: str) -> str:
    return f"""
    WITH {_coef_cte(dialect)},
    per_level AS (
      SELECT lv, CAST(SUM(d * d) AS BIGINT) AS energy,
             CAST(COUNT(*) AS BIGINT) AS n_coefs
      FROM coefs GROUP BY lv
    ),
    tot AS (SELECT CAST(SUM(energy) AS BIGINT) AS t FROM per_level)
    SELECT p.lv AS level, p.n_coefs, p.energy,
           ROUND(CAST(p.energy AS DOUBLE) / t.t, 6) AS energy_share
    FROM per_level p CROSS JOIN tot t
    ORDER BY level
    """


@query("q596_haar_energy_spectrum", oracle=_spectrum_sql("duck"))
def q596_haar_energy_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Haar detail-energy spectrum: exact BIGINT energy per level
    across all flights, with shares — which time scales carry the
    altitude variance. Six levels computed in ONE signed
    (flight, level, block) aggregate (6x map-side fan-out, one
    shuffle co-keyed with flight bucketing)."""
    _views(spark, sf_dir)
    return spark.sql(_spectrum_sql("spark"))


# ---------------------------------------------------------------------------
# q597 — compression concentration


def _compress_sql(dialect: str) -> str:
    return f"""
    WITH {_coef_cte(dialect)},
    ranked AS (
      SELECT flight_id, d * d AS e,
             ROW_NUMBER() OVER (PARTITION BY flight_id
                                ORDER BY d * d DESC, lv, blk) AS rn
      FROM coefs
    ),
    per_flight AS (
      SELECT flight_id,
             CAST(SUM(e) AS BIGINT) AS total_e,
             CAST(SUM(CASE WHEN rn <= {TOP_COEF} THEN e ELSE 0 END) AS BIGINT)
               AS top_e
      FROM ranked GROUP BY flight_id
    ),
    shares AS (
      SELECT flight_id,
             CAST({_idiv(dialect, f'top_e * 100', 'total_e')} AS BIGINT)
               AS pct_band
      FROM per_flight WHERE total_e > 0
    )
    SELECT CAST({_idiv(dialect, 'pct_band', '10')} AS BIGINT) AS decile_band,
           CAST(COUNT(*) AS BIGINT) AS n_flights,
           CAST(MIN(pct_band) AS BIGINT) AS min_pct,
           CAST(MAX(pct_band) AS BIGINT) AS max_pct
    FROM shares
    GROUP BY {_idiv(dialect, 'pct_band', '10')}
    ORDER BY decile_band
    """


@query("q597_haar_compression", oracle=_compress_sql("duck"))
def q597_haar_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility: the share of each flight's detail energy held
    by its 8 largest |coefficients| (exact integer percent via
    floor-division), banded by decile. High concentration = the
    series compresses to a few wavelet terms. The coefficient rank
    partitions by flight."""
    _views(spark, sf_dir)
    return spark.sql(_compress_sql("spark"))


# ---------------------------------------------------------------------------
# q598 — hard-threshold census


def _threshold_sql(dialect: str) -> str:
    return f"""
    WITH {_coef_cte(dialect)}
    SELECT lv AS level,
           CAST(COUNT(*) AS BIGINT) AS n_coefs,
           CAST(SUM(CASE WHEN d >= {HARD_T} OR d <= -{HARD_T}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(d * d) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN d >= {HARD_T} OR d <= -{HARD_T}
                         THEN d * d ELSE 0 END) AS BIGINT) AS energy_kept,
           ROUND(CAST(SUM(CASE WHEN d >= {HARD_T} OR d <= -{HARD_T}
                               THEN d * d ELSE 0 END) AS DOUBLE)
                 / SUM(d * d), 6) AS energy_kept_share
    FROM coefs
    GROUP BY lv
    ORDER BY level
    """


@query("q598_haar_threshold_census", oracle=_threshold_sql("duck"))
def q598_haar_threshold_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-threshold denoising census: per level, how many
    coefficients survive |d| >= 4000 and how much energy they keep —
    the keep/kill table a wavelet compressor ships. Pure integer
    compares on the coefficient aggregate."""
    _views(spark, sf_dir)
    return spark.sql(_threshold_sql("spark"))


# ---------------------------------------------------------------------------
# q599 — Allan variance (successive block sums)


def _allan_sql(dialect: str) -> str:
    levels = ", ".join(f"({lv})" for lv in range(1, LEVELS + 1))
    blk = _idiv(dialect, "p.i - 1", "CAST(POWER(2, l.lv) AS BIGINT)")
    return f"""
    WITH {SYNTH_TP_CTE.strip()},
    pts AS (
      SELECT flight_id, CAST(alt_ft AS BIGINT) AS alt,
             ROW_NUMBER() OVER (PARTITION BY flight_id ORDER BY ts, event_id)
               AS i
      FROM trackpoints
    ),
    capped AS (SELECT * FROM pts WHERE i <= {N_PTS}),
    lvls(lv) AS (VALUES {levels}),
    blocks AS (
      SELECT p.flight_id, l.lv, CAST({blk} AS BIGINT) AS blk,
             CAST(SUM(p.alt) AS BIGINT) AS s
      FROM capped p CROSS JOIN lvls l
      GROUP BY p.flight_id, l.lv, {blk}
    ),
    diffs AS (
      SELECT flight_id, lv,
             s - LAG(s) OVER (PARTITION BY flight_id, lv ORDER BY blk) AS ds
      FROM blocks
    )
    SELECT lv AS level,
           CAST(COUNT(ds) AS BIGINT) AS n_diffs,
           CAST(SUM(ds * ds) AS BIGINT) AS sum_sq_diffs,
           ROUND(CAST(SUM(ds * ds) AS DOUBLE) / (2.0 * COUNT(ds)
                 * POWER(4, lv)), 6) AS allan_var
    FROM diffs WHERE ds IS NOT NULL
    GROUP BY lv
    ORDER BY level
    """


@query("q599_allan_variance", oracle=_allan_sql("duck"))
def q599_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allan variance by averaging scale: mean squared difference of
    SUCCESSIVE block sums per level, normalized by 2*(2^L)^2 — the
    stability-vs-scale curve (white noise falls as 1/tau, drift
    rises). Exact BIGINT numerators; the block LAG partitions by
    (flight, level)."""
    _views(spark, sf_dir)
    return spark.sql(_allan_sql("spark"))


# ---------------------------------------------------------------------------
# q600 — spikiness ranking


def _spiky_sql(dialect: str) -> str:
    return f"""
    WITH {_coef_cte(dialect)},
    per_flight AS (
      SELECT flight_id,
             CAST(SUM(CASE WHEN lv = 1 THEN d * d ELSE 0 END) AS BIGINT)
               AS fine_e,
             CAST(SUM(d * d) AS BIGINT) AS total_e
      FROM coefs GROUP BY flight_id
    )
    SELECT flight_id, fine_e, total_e,
           ROUND(CAST(fine_e AS DOUBLE) / total_e, 6) AS fine_share
    FROM per_flight WHERE total_e > 0
    ORDER BY fine_share DESC, flight_id
    LIMIT 10
    """


@query("q600_wavelet_spikiness", oracle=_spiky_sql("duck"))
def q600_wavelet_spikiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The wavelet anomaly screen: flights whose finest-scale (L=1)
    detail energy share is highest — point-to-point spikiness that a
    coarse trend model would miss. One coefficient aggregate + a
    top-10 TakeOrdered on the exact integer ratio."""
    _views(spark, sf_dir)
    return spark.sql(_spiky_sql("spark"))
