"""Proper-scoring batch 175 (q942-q946) — distributional forecast
verification (CRPS, PIT, Winkler interval scores; Gneiting & Raftery
2007) for the daily revenue series under a 7-day persistence ensemble:
the forecast for day d is the empirical distribution of the previous
seven daily totals, verified against day d's actual. Everything
reduces to EXACT integer cent differences over a bounded 7-member
ensemble built by a literal 7-offset day-spine equi-join — the
fully-SQL form of ensemble verification a forecasting platform runs
nightly.

- q942 ensemble CRPS: mean_i |x_i - y| - 0.5 mean_ij |x_i - x_j|
  (49 integer pairs per day, exact sums, terminal ratio);
- q943 PIT histogram: the verifying rank of y inside its ensemble —
  flat means calibrated, U-shaped means underdispersed;
- q944 Winkler score for the ensemble's 2nd..6th-member central
  interval (alpha = 0.5): width plus 4x the miss distance, with the
  empirical coverage beside it;
- q945 CRPS skill vs the persistence point forecast (CRPS of a point
  forecast is plain MAE) — the ensemble must beat |y_(d-1) - y_d| to
  earn its keep;
- q946 sharpness vs coverage: mean interval width against achieved
  coverage — the tradeoff every probabilistic forecaster optimizes.

100 TB shape: one day aggregate, then every ensemble is a 7-row
equi-join against a literal offset grid (d = d' + k) — per-day work is
a constant 7 members / 49 pairs, never a window over history and
never a quadratic in days.

Determinism: daily totals are exact integer cents; all |differences|
integer; order statistics come from array_sort over exactly 7 integer
members; scores are terminal ratios (6 dp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

ENS = 7  # ensemble members = previous 7 days


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _ens_cte(d: str) -> str:
    offs = ", ".join(f"({k})" for k in range(1, ENS + 1))
    if d == "spark":
        dsub = "date_sub(v.d, o.k)"
        srt = "array_sort(collect_list(m.cents))"
    else:
        dsub = "v.d - o.k"
        srt = "list_sort(list(m.cents))"
    return f"""daily AS (
      SELECT CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY CAST(ts AS DATE)
    ),
    offs(k) AS (VALUES {offs}),
    ens AS (
      -- verifying day v joined to its 7 predecessor members; only days
      -- with a FULL ensemble verify
      SELECT v.d, v.cents AS y, {srt} AS xs
      FROM daily v
      JOIN offs o ON TRUE
      JOIN daily m ON m.d = {dsub}
      GROUP BY v.d, v.cents
      HAVING COUNT(*) = {ENS}
    )"""


def _abs_sum(d: str, arr: str, y: str) -> str:
    """SUM over members of |x - y| as exact integers."""
    if d == "spark":
        return (
            f"aggregate(transform({arr}, x -> abs(x - {y})), "
            f"CAST(0 AS BIGINT), (s, t) -> s + t)"
        )
    return f"list_sum(list_transform({arr}, x -> abs(x - {y})))"


def _pair_sum(d: str, arr: str) -> str:
    """S = SUM over unordered pairs (i < j) of |x_i - x_j|: for the
    SORTED array this is sum_i x_i * (2i - n - 1) — a LINEAR exact
    formula (each x_i counts + for the i-1 smaller, - for the n-i
    larger). The all-ordered-pairs sum is 2S."""
    n = ENS
    if d == "spark":
        return (
            f"aggregate(transform(sequence(1, {n}), "
            f"i -> element_at({arr}, i) * CAST(2 * i - {n} - 1 AS BIGINT)), "
            f"CAST(0 AS BIGINT), (s, t) -> s + t)"
        )
    return (
        f"list_sum(list_transform(range(1, {n + 1}), "
        f"i -> {arr}[i] * CAST(2 * i - {n} - 1 AS BIGINT)))"
    )


# ---------------------------------------------------------------------------
# q942 — ensemble CRPS


def _q942_sql(d: str) -> str:
    return f"""
    WITH {_ens_cte(d)},
    scored AS (
      SELECT d,
             CAST({_abs_sum(d, "xs", "y")} AS BIGINT) AS sum_abs_err,
             CAST({_pair_sum(d, "xs")} AS BIGINT) AS sum_pair_gaps
      FROM ens
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           -- CRPS = mean|x-y| - (1/(2n^2)) * all-ordered-pairs sum
           --      = mean|x-y| - S/n^2   (S = unordered-pair sum)
           ROUND(CAST(SUM(sum_abs_err) AS DOUBLE) / COUNT(*) / {ENS}
                 - CAST(SUM(sum_pair_gaps) AS DOUBLE)
                   / COUNT(*) / {ENS * ENS}, 6) AS mean_crps_cents,
           ROUND(CAST(SUM(sum_abs_err) AS DOUBLE) / COUNT(*) / {ENS}, 6)
             AS mean_abs_component,
           ROUND(CAST(SUM(sum_pair_gaps) AS DOUBLE) / COUNT(*)
                 / {ENS * ENS}, 6) AS mean_spread_component
    FROM scored
    """


@query("q942_crps_ensemble", oracle=_q942_sql("duckdb"))
def q942_crps_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble CRPS: mean |member - actual| minus half the mean
    inter-member gap. The pairwise term uses the SORTED-array identity
    sum_ij |x_i - x_j| = 2 * sum_i x_i (2i - n - 1) — linear in
    members, exact integers, no pair explosion even inside the array.
    One day aggregate + a 7-offset equi-join."""
    _views(spark, sf_dir)
    return spark.sql(_q942_sql("spark"))


# ---------------------------------------------------------------------------
# q943 — PIT histogram


def _q943_sql(d: str) -> str:
    if d == "spark":
        rank = "size(filter(xs, x -> x < y))"
    else:
        rank = "len(list_filter(xs, x -> x < y))"
    return f"""
    WITH {_ens_cte(d)},
    pit AS (
      SELECT d, CAST({rank} AS BIGINT) AS rnk FROM ens
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pit)
    SELECT /*+ BROADCAST(t) */ p.rnk AS pit_rank,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(t.n), 6) AS share,
           -- CAST: a bare decimal literal ratio stays DECIMAL in Spark
           ROUND(CAST(1.0 AS DOUBLE) / {ENS + 1}, 6) AS uniform_share
    FROM pit p CROSS JOIN tot t
    GROUP BY p.rnk
    ORDER BY p.rnk
    """


@query("q943_pit_histogram", oracle=_q943_sql("duckdb"))
def q943_pit_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probability-integral-transform check: the verifying value's
    rank among its 7 members (0..7). Calibrated ensembles make this
    flat at 1/8 per bin; U-shapes mean the ensemble is too narrow.
    Integer rank per day, an 8-row rollup."""
    _views(spark, sf_dir)
    return spark.sql(_q943_sql("spark"))


# ---------------------------------------------------------------------------
# q944 — Winkler interval score (alpha = 0.5: the 2nd..6th members)

ALPHA_INV = 4  # 2/alpha with alpha = 0.5


def _q944_sql(d: str) -> str:
    lo = "xs[2]" if d == "duckdb" else "element_at(xs, 2)"
    hi = "xs[6]" if d == "duckdb" else "element_at(xs, 6)"
    return f"""
    WITH {_ens_cte(d)},
    iv AS (
      SELECT d, y,
             CAST({lo} AS BIGINT) AS lo,
             CAST({hi} AS BIGINT) AS hi
      FROM ens
    ),
    scored AS (
      SELECT d,
             CAST(hi - lo AS BIGINT) AS width,
             CAST(CASE WHEN y < lo THEN {ALPHA_INV} * (lo - y)
                       WHEN y > hi THEN {ALPHA_INV} * (y - hi)
                       ELSE 0 END AS BIGINT) AS penalty,
             CASE WHEN y >= lo AND y <= hi THEN 1 ELSE 0 END AS covered
      FROM iv
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
           ROUND(CAST(SUM(width + penalty) AS DOUBLE) / COUNT(*), 6)
             AS mean_winkler_cents,
           ROUND(CAST(SUM(width) AS DOUBLE) / COUNT(*), 6)
             AS mean_width_cents,
           ROUND(CAST(SUM(covered) AS DOUBLE) / COUNT(*), 6)
             AS empirical_coverage
    FROM scored
    """


@query("q944_winkler_interval", oracle=_q944_sql("duckdb"))
def q944_winkler_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winkler score for the ensemble's central interval (2nd..6th
    order statistics, nominal 50%): width plus {ALPHA_INV}x the miss
    distance — the proper score that punishes both vague and
    overconfident intervals. Exact integer order statistics from the
    sorted 7-member array; empirical coverage beside the score."""
    _views(spark, sf_dir)
    return spark.sql(_q944_sql("spark"))


# ---------------------------------------------------------------------------
# q945 — CRPS skill vs persistence


def _q945_sql(d: str) -> str:
    dsub1 = "date_sub(v.d, 1)" if d == "spark" else "v.d - 1"
    return f"""
    WITH {_ens_cte(d)},
    scored AS (
      SELECT d,
             CAST({_abs_sum(d, "xs", "y")} AS BIGINT) AS sum_abs_err,
             CAST({_pair_sum(d, "xs")} AS BIGINT) AS sum_pair_gaps
      FROM ens
    ),
    crps AS (
      SELECT CAST(SUM(sum_abs_err) AS DOUBLE) / COUNT(*) / {ENS}
             - CAST(SUM(sum_pair_gaps) AS DOUBLE)
               / COUNT(*) / {ENS * ENS} AS c
      FROM scored
    ),
    pers AS (
      SELECT CAST(SUM(ABS(v.cents - m.cents)) AS BIGINT) AS sae,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily v JOIN daily m ON m.d = {dsub1}
      JOIN ens e ON e.d = v.d
    )
    SELECT ROUND(c.c, 6) AS ensemble_crps_cents,
           ROUND(CAST(p.sae AS DOUBLE) / p.n, 6) AS persistence_mae_cents,
           ROUND(1 - c.c / (CAST(p.sae AS DOUBLE) / p.n), 6)
             AS crps_skill_score
    FROM crps c CROSS JOIN pers p
    """


@query("q945_crps_skill", oracle=_q945_sql("duckdb"))
def q945_crps_skill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRPS skill: the ensemble against the persistence POINT forecast
    (whose CRPS is plain MAE of |y_(d-1) - y_d|, restricted to the same
    verifiable days). Positive skill = the distribution earns its keep
    over the naive point guess."""
    _views(spark, sf_dir)
    return spark.sql(_q945_sql("spark"))


# ---------------------------------------------------------------------------
# q946 — sharpness vs coverage


def _q946_sql(d: str) -> str:
    pairs = []
    for lo_i, hi_i, label in ((1, 7, "a_full"), (2, 6, "b_central50"), (3, 5, "c_narrow")):
        lo = f"xs[{lo_i}]" if d == "duckdb" else f"element_at(xs, {lo_i})"
        hi = f"xs[{hi_i}]" if d == "duckdb" else f"element_at(xs, {hi_i})"
        pairs.append(f"""
      SELECT '{label}' AS interval_label,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             ROUND(CAST(SUM({hi} - {lo}) AS DOUBLE) / COUNT(*), 6)
               AS mean_width_cents,
             ROUND(CAST(SUM(CASE WHEN y >= {lo} AND y <= {hi}
                            THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
               AS coverage
      FROM ens""")
    union = "\n      UNION ALL\n      ".join(pairs)
    return f"""
    WITH {_ens_cte(d)}
    SELECT * FROM (
      {union}
    ) u ORDER BY interval_label
    """


@query("q946_sharpness_coverage", oracle=_q946_sql("duckdb"))
def q946_sharpness_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sharpness/calibration tradeoff: three nested ensemble
    intervals (full range, central 2..6, narrow 3..5) with mean width
    vs achieved coverage — wider must cover more (both monotonicities
    test-asserted). Same sorted arrays, three branch aggregates."""
    _views(spark, sf_dir)
    return spark.sql(_q946_sql("spark"))
