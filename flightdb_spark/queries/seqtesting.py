"""Group-sequential testing batch 126 (q696-q700) — the interim-
analysis machinery an experimentation platform runs: five scheduled
looks over the 30-day event stream, a hash-assigned A/B split, and
the O'Brien-Fleming / Pocock boundary discipline that keeps repeated
peeking honest:

- q696 sequential monitoring table: per look, cumulative
  arm counts, the z statistic, OBF and Pocock boundaries, and the
  crossing decisions;
- q697 stopped-estimate bias: the effect estimate AT the first
  Pocock crossing vs the day-30 estimate — early stops overstate;
- q698 information vs calendar: how much statistical information
  (events) each calendar-spaced look actually accrues — the
  information-fraction table a Lan-DeMets spending design needs;
- q699 repeated confidence intervals: boundary-widened CIs per look
  (Jennison-Turnbull RCIs) that hold jointly across looks;
- q700 A/A null calibration: the same machinery on a null split
  INSIDE arm A — naive fixed-1.96 peeking vs the OBF boundary on
  data with no true effect.

Boundary constants are the published two-sided alpha=0.05, K=5
values (O'Brien-Fleming C_B = 2.04, Pocock C_P = 2.41; Pocock 1977,
O'Brien & Fleming 1979) inlined as short literals.

100 TB shape: one scan reduces events to (arm, look-day) daily
counts; the 5-look expansion is a broadcast BNLJ over a literal
table; every statistic reads the <= 10-row cumulative table. The
assignment hash is content-derived (md5, DETERMINISM.md §7) — no
rand(), reproducible on any partitioning.

Determinism: counts exact integers; z and CI bounds are straight-
line doubles over exact counts (one sqrt, IEEE-exact §5), rounded at
6 dp; day numbers from integer microseconds (§9/§16).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

LOOK_DAYS = (6, 12, 18, 24, 30)
C_OBF = "CAST(2.04 AS DOUBLE)"
C_POCOCK = "CAST(2.41 AS DOUBLE)"
K_LOOKS = len(LOOK_DAYS)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _arm(dialect: str, digit: int = 1) -> str:
    """Deterministic hash arm from the md5 of the user id (§7); digit
    picks which hex nibble drives the split so q700 can sub-split
    arm A with an independent nibble."""
    if dialect == "spark":
        return (
            f"(CAST(CONV(SUBSTR(MD5(CAST(user_id AS STRING)), {digit}, 1),"
            f" 16, 10) AS BIGINT) % 2)"
        )
    return (
        f"(('0x' || substr(md5(CAST(user_id AS VARCHAR)), {digit}, 1))"
        f"::BIGINT % 2)"
    )


def _day(dialect: str) -> str:
    us = (
        "unix_micros(CAST(ts AS TIMESTAMP))"
        if dialect == "spark"
        else "epoch_us(ts)"
    )
    return (
        f"CAST(FLOOR(CAST({us} AS DOUBLE)"
        f" / CAST(86400000000 AS DOUBLE)) AS BIGINT)"
    )


def _looks_union() -> str:
    return " UNION ALL ".join(
        f"SELECT {i + 1} AS look, {d} AS cutoff_days"
        if i == 0
        else f"SELECT {i + 1}, {d}"
        for i, d in enumerate(LOOK_DAYS)
    )


def _cum_cte(dialect: str, arm_expr: str | None = None, where: str = "") -> str:
    """Cumulative per-(look, arm) event and conversion counts: daily
    pre-aggregate, then a broadcast BNLJ against the 5-row look table."""
    arm = arm_expr or _arm(dialect)
    return f"""daily AS (
      SELECT {arm} AS arm,
             {_day(dialect)} - (SELECT MIN({_day(dialect)}) FROM events)
               AS rel_day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_conv
      FROM events
      {where}
      GROUP BY {arm},
               {_day(dialect)} - (SELECT MIN({_day(dialect)}) FROM events)
    ),
    cum AS (
      SELECT /*+ BROADCAST(l) */ l.look, l.cutoff_days, d.arm,
             CAST(SUM(d.n_events) AS BIGINT) AS n,
             CAST(SUM(d.n_conv) AS BIGINT) AS x
      FROM daily d JOIN ({_looks_union()}) l
        ON d.rel_day < l.cutoff_days
      GROUP BY l.look, l.cutoff_days, d.arm
    ),
    wide AS (
      SELECT look, cutoff_days,
             MAX(CASE WHEN arm = 0 THEN n END) AS na,
             MAX(CASE WHEN arm = 0 THEN x END) AS xa,
             MAX(CASE WHEN arm = 1 THEN n END) AS nb,
             MAX(CASE WHEN arm = 1 THEN x END) AS xb
      FROM cum GROUP BY look, cutoff_days
    )"""


# Shared straight-line z expression over the wide table's exact counts.
_Z_EXPR = """
      (CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)
       - CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))
      / sqrt((CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
             * (CAST(1 AS DOUBLE)
                - CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
             * (CAST(1 AS DOUBLE) / CAST(na AS DOUBLE)
                + CAST(1 AS DOUBLE) / CAST(nb AS DOUBLE)))
"""

_OBF_BOUND = (
    f"{C_OBF} * sqrt(CAST({K_LOOKS} AS DOUBLE) / CAST(look AS DOUBLE))"
)


# ---------------------------------------------------------------------------
# q696 — sequential monitoring table


def _q696_sql(dialect: str) -> str:
    return f"""
    WITH {_cum_cte(dialect)}
    SELECT look, cutoff_days, na, xa, nb, xb,
           ROUND({_Z_EXPR}, 6) AS z_stat,
           ROUND({_OBF_BOUND}, 6) AS obf_bound,
           ROUND({C_POCOCK}, 6) AS pocock_bound,
           CASE WHEN ABS({_Z_EXPR}) > {_OBF_BOUND}
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS crosses_obf,
           CASE WHEN ABS({_Z_EXPR}) > {C_POCOCK}
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS crosses_pocock
    FROM wide
    ORDER BY look
    """


@query("q696_sequential_looks", oracle=_q696_sql("duck"))
def q696_sequential_looks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The group-sequential monitoring table: five calendar looks,
    cumulative per-arm purchase conversions, the two-proportion z,
    and the O'Brien-Fleming (early looks nearly unspendable) vs
    Pocock (flat) boundaries with crossing flags. The whole table is
    one daily aggregate joined to a 5-row literal look table."""
    _views(spark, sf_dir)
    return spark.sql(_q696_sql("spark"))


# ---------------------------------------------------------------------------
# q697 — stopped-estimate bias


def _q697_sql(dialect: str) -> str:
    return f"""
    WITH {_cum_cte(dialect)},
    scored AS (
      SELECT look,
             CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS diff,
             CASE WHEN ABS({_Z_EXPR}) > {C_POCOCK}
                  THEN 1 ELSE 0 END AS crossed
      FROM wide
    ),
    firstcross AS (
      SELECT MIN(look) AS stop_look FROM scored WHERE crossed = 1
    ),
    finals AS (
      SELECT diff AS final_diff FROM scored WHERE look = {K_LOOKS}
    )
    SELECT /*+ BROADCAST(f) */
           COALESCE(f.stop_look, CAST({K_LOOKS} AS INT)) AS effective_look,
           CASE WHEN f.stop_look IS NULL THEN CAST(0 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS stopped_early,
           ROUND(MAX(CASE WHEN s.look = COALESCE(f.stop_look, {K_LOOKS})
                     THEN s.diff END), 6) AS estimate_at_stop,
           ROUND(MAX(fi.final_diff), 6) AS estimate_at_final,
           ROUND(MAX(CASE WHEN s.look = COALESCE(f.stop_look, {K_LOOKS})
                     THEN s.diff END) - MAX(fi.final_diff), 6)
             AS overstatement
    FROM scored s CROSS JOIN firstcross f CROSS JOIN finals fi
    GROUP BY f.stop_look
    """


@query("q697_stopped_estimate_bias", oracle=_q697_sql("duck"))
def q697_stopped_estimate_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Early-stopping bias audit: the effect estimate at the first
    Pocock crossing (if any) against the full 30-day estimate. Trials
    that stop early select on noise, so the stopped estimate
    systematically overstates — this row quantifies it for this
    stream (no crossing -> both estimates coincide, overstatement 0)."""
    _views(spark, sf_dir)
    return spark.sql(_q697_sql("spark"))


# ---------------------------------------------------------------------------
# q698 — information vs calendar fractions


def _q698_sql(dialect: str) -> str:
    return f"""
    WITH {_cum_cte(dialect)},
    tot AS (
      SELECT CAST(na + nb AS BIGINT) AS n_final FROM wide
      WHERE look = {K_LOOKS}
    )
    SELECT /*+ BROADCAST(t) */ w.look, w.cutoff_days,
           CAST(w.na + w.nb AS BIGINT) AS n_events,
           CAST(w.cutoff_days AS DOUBLE) / CAST({LOOK_DAYS[-1]} AS DOUBLE)
             AS calendar_fraction,
           CAST(w.na + w.nb AS DOUBLE) / CAST(t.n_final AS DOUBLE)
             AS information_fraction
    FROM wide w CROSS JOIN tot t
    ORDER BY w.look
    """


@query("q698_information_fractions", oracle=_q698_sql("duck"))
def q698_information_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar fraction vs information (event-count) fraction at
    each look — the input a Lan-DeMets alpha-spending schedule needs.
    Where traffic is nonuniform the two diverge and calendar-spaced
    looks misspend alpha. Exact integer ratios, unrounded."""
    _views(spark, sf_dir)
    return spark.sql(_q698_sql("spark"))


# ---------------------------------------------------------------------------
# q699 — repeated confidence intervals


def _q699_sql(dialect: str) -> str:
    se = """sqrt((CAST(xa AS DOUBLE) / CAST(na AS DOUBLE))
             * (CAST(1 AS DOUBLE) - CAST(xa AS DOUBLE) / CAST(na AS DOUBLE))
             / CAST(na AS DOUBLE)
             + (CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))
               * (CAST(1 AS DOUBLE)
                  - CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))
               / CAST(nb AS DOUBLE))"""
    diff = """(CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)
               - CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))"""
    return f"""
    WITH {_cum_cte(dialect)}
    SELECT look, cutoff_days,
           ROUND({diff}, 6) AS diff,
           ROUND({diff} - {_OBF_BOUND} * {se}, 6) AS rci_lo,
           ROUND({diff} + {_OBF_BOUND} * {se}, 6) AS rci_hi
    FROM wide
    ORDER BY look
    """


@query("q699_repeated_cis", oracle=_q699_sql("duck"))
def q699_repeated_cis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jennison-Turnbull repeated confidence intervals: per look, the
    conversion-rate difference widened by the OBF boundary instead of
    1.96 — intervals valid JOINTLY across all five peeks. Early looks
    get very wide intervals, the price of peeking honestly."""
    _views(spark, sf_dir)
    return spark.sql(_q699_sql("spark"))


# ---------------------------------------------------------------------------
# q700 — A/A null calibration


def _q700_sql(dialect: str) -> str:
    # Sub-split arm 0 by an independent md5 nibble (position 2).
    return f"""
    WITH {_cum_cte(dialect, arm_expr=_arm(dialect, digit=2),
                   where=f"WHERE {_arm(dialect, digit=1)} = 0")}
    SELECT look, cutoff_days, na, nb,
           ROUND({_Z_EXPR}, 6) AS z_null,
           CASE WHEN ABS({_Z_EXPR}) > CAST(1.96 AS DOUBLE)
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS naive_reject,
           CASE WHEN ABS({_Z_EXPR}) > {_OBF_BOUND}
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS obf_reject
    FROM wide
    ORDER BY look
    """


@query("q700_aa_null_calibration", oracle=_q700_sql("duck"))
def q700_aa_null_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/A calibration: the same five-look machinery on a null split
    (an independent md5 nibble INSIDE arm A, so no true effect
    exists). naive_reject marks looks a fixed-1.96 peeker would call
    significant; obf_reject stays 0 except for the design's own 5%
    type-I rate (and is never looser than naive peeking) — the
    inflation-vs-control contrast in one table."""
    _views(spark, sf_dir)
    return spark.sql(_q700_sql("spark"))
