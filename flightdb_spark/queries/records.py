"""Record-statistics batch 144 (q786-q790) — the theory of records
over each user's event-value sequence, the classic exchangeability
audit: in an i.i.d. sequence of length n the number of running-max
records has mean H_n (the harmonic number) and records cluster early;
systematic drift shows up as record counts far from H_n.

- q786 per-user record census: sequence length, record count, and
  the user's own harmonic expectation H_n (computed from the user's
  own row numbers — no lookup table);
- q787 population summary: mean records vs mean H_n, the variance
  of record counts vs the i.i.d. variance H_n - H_n^(2), and the
  excess-record user share;
- q788 record spacing: gaps between successive record indices
  (records thin out ~ geometrically in an exchangeable sequence);
- q789 forward vs backward records: running-max records scanning
  left-to-right vs right-to-left — equal in expectation under
  exchangeability, so their aggregate asymmetry is a drift signal;
- q790 record magnitudes: the jump ratio new-max/old-max at each
  record, summarized per event type.

100 TB shape: every window partitions by user (or (user, direction))
over that user's own events — the natural key, bounded per-user
state; aggregates are one shuffle each. A user-bucketed layout makes
all of it shuffle-free. Nothing global, nothing paired.

Determinism: values are exact integer cents; record flags are
integer comparisons with ties broken as NOT-a-record (strict >, the
standard convention) and arrival order fixed by (ts, event_id);
harmonic terms 1/rn are nano-quantized with FLOOR (q761 lesson) and
summed as BIGINT; jump ratios are terminal exact integer ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

NANO = "1000000000"


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _seq_cte() -> str:
    """Per-user ordered sequence with record flags (strict new max)."""
    return f"""seq AS (
      SELECT user_id AS u, event_type AS et,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             ROW_NUMBER() OVER w AS rn,
             CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                       > COALESCE(MAX(CAST(FLOOR(value * 100 + 0.5)
                                      AS BIGINT))
                         OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), CAST(-1 AS BIGINT))
                  THEN 1 ELSE 0 END AS is_record,
             COALESCE(MAX(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS BIGINT)) AS prev_max
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )"""


def _census_cte() -> str:
    return f"""{_seq_cte()},
    census AS (
      SELECT u,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(is_record) AS BIGINT) AS n_records,
             CAST(SUM(CAST(FLOOR(CAST(1 AS DOUBLE) / rn * {NANO} + 0.5)
                  AS BIGINT)) AS BIGINT) AS hn_nano,
             CAST(SUM(CAST(FLOOR(CAST(1 AS DOUBLE) / rn / rn * {NANO} + 0.5)
                  AS BIGINT)) AS BIGINT) AS hn2_nano
      FROM seq GROUP BY u
    )"""


# ---------------------------------------------------------------------------
# q786 — per-user record census

_Q786_SQL = f"""
    WITH {_census_cte()}
    SELECT u AS user_id, n AS seq_len, n_records,
           CAST(hn_nano AS DOUBLE) / {NANO} AS harmonic_expectation,
           n_records - CAST(hn_nano AS DOUBLE) / {NANO} AS excess_records
    FROM census
    ORDER BY u
    """


@query("q786_record_census", oracle=_Q786_SQL)
def q786_record_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-max records per user beside the exchangeable-sequence
    expectation H_n, with H_n summed from the user's OWN row numbers
    (nano-quantized 1/rn terms — no harmonic lookup table, no extra
    pass). First event is always a record, so n_records >= 1."""
    _views(spark, sf_dir)
    return spark.sql(_Q786_SQL)


# ---------------------------------------------------------------------------
# q787 — population summary

_Q787_SQL = f"""
    WITH {_census_cte()}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_records) AS DOUBLE) / COUNT(*) AS mean_records,
           CAST(SUM(hn_nano) AS DOUBLE) / {NANO} / COUNT(*)
             AS mean_harmonic_expectation,
           (CAST(COUNT(*) AS DOUBLE) * SUM(n_records * n_records)
             - CAST(SUM(n_records) AS DOUBLE) * SUM(n_records))
             / (CAST(COUNT(*) AS DOUBLE) * COUNT(*)) AS var_records,
           CAST(SUM(hn_nano - hn2_nano) AS DOUBLE) / {NANO} / COUNT(*)
             AS iid_variance,
           CAST(SUM(CASE WHEN n_records * {NANO} > hn_nano
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS share_above_expectation
    FROM census
    """


@query("q787_record_population", oracle=_Q787_SQL)
def q787_record_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The population check: mean record count vs mean H_n and the
    observed record-count variance vs the i.i.d. variance
    H_n - H_n^(2) — agreement says the value sequences are
    exchangeable (no drift); exact integer moments throughout."""
    _views(spark, sf_dir)
    return spark.sql(_Q787_SQL)


# ---------------------------------------------------------------------------
# q788 — record spacing

_Q788_SQL = f"""
    WITH {_seq_cte()},
    recs AS (
      SELECT u, rn,
             CAST(rn - LAG(rn) OVER (PARTITION BY u ORDER BY rn) AS BIGINT)
               AS gap,
             ROW_NUMBER() OVER (PARTITION BY u ORDER BY rn) AS rec_idx
      FROM seq WHERE is_record = 1
    )
    SELECT CAST(rec_idx AS BIGINT) AS record_number,
           CAST(COUNT(*) AS BIGINT) AS n_users_reaching,
           CAST(SUM(gap) AS DOUBLE) / COUNT(*) AS mean_gap,
           CAST(MAX(gap) AS BIGINT) AS max_gap
    FROM recs
    WHERE gap IS NOT NULL AND rec_idx <= 6
    GROUP BY rec_idx
    ORDER BY rec_idx
    """


@query("q788_record_spacing", oracle=_Q788_SQL)
def q788_record_spacing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spacing between the k-th and (k-1)-th record by record number:
    mean gaps grow roughly geometrically in an exchangeable sequence
    (later records are exponentially rarer). Bounded output (first six
    record numbers)."""
    _views(spark, sf_dir)
    return spark.sql(_Q788_SQL)


# ---------------------------------------------------------------------------
# q789 — forward vs backward records

_Q789_SQL = f"""
    WITH {_seq_cte()},
    bwd AS (
      SELECT u,
             CASE WHEN cents > COALESCE(MAX(cents)
                  OVER (PARTITION BY u ORDER BY rn DESC
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  CAST(-1 AS BIGINT)) THEN 1 ELSE 0 END AS is_brecord
      FROM seq
    ),
    f AS (SELECT u, CAST(SUM(is_record) AS BIGINT) AS fwd FROM seq GROUP BY u),
    b AS (SELECT u, CAST(SUM(is_brecord) AS BIGINT) AS bwd FROM bwd GROUP BY u)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(f.fwd) AS BIGINT) AS total_forward_records,
           CAST(SUM(b.bwd) AS BIGINT) AS total_backward_records,
           CAST(SUM(f.fwd - b.bwd) AS DOUBLE) / COUNT(*)
             AS mean_asymmetry,
           CAST(SUM(CASE WHEN f.fwd > b.bwd THEN 1
                         WHEN f.fwd < b.bwd THEN -1 ELSE 0 END) AS BIGINT)
             AS sign_balance
    FROM f JOIN b ON b.u = f.u
    """


@query("q789_record_symmetry", oracle=_Q789_SQL)
def q789_record_symmetry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward vs time-reversed record counts: equal in expectation
    under exchangeability, so a population-level asymmetry (mean or
    sign balance) is a trend detector that needs no parametric model.
    Two window passes over the same user partitioning."""
    _views(spark, sf_dir)
    return spark.sql(_Q789_SQL)


# ---------------------------------------------------------------------------
# q790 — record magnitudes

_Q790_SQL = f"""
    WITH {_seq_cte()},
    jumps AS (
      SELECT et, cents, prev_max
      FROM seq WHERE is_record = 1 AND prev_max > 0
    )
    SELECT et AS event_type,
           CAST(COUNT(*) AS BIGINT) AS n_improvements,
           CAST(SUM(cents - prev_max) AS BIGINT) AS total_jump_cents,
           CAST(SUM(cents - prev_max) AS DOUBLE) / COUNT(*)
             AS mean_jump_cents,
           CAST(SUM(CAST(FLOOR(CAST(cents AS DOUBLE) / prev_max * {NANO}
                + 0.5) AS BIGINT)) AS DOUBLE) / {NANO} / COUNT(*)
             AS mean_jump_ratio
    FROM jumps
    GROUP BY et
    ORDER BY et
    """


@query("q790_record_magnitudes", oracle=_Q790_SQL)
def q790_record_magnitudes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How big record-breaking improvements are: jump size in exact
    cents and the nano-quantized mean new/old ratio, by event type
    (first records excluded — no previous max to beat)."""
    _views(spark, sf_dir)
    return spark.sql(_Q790_SQL)
