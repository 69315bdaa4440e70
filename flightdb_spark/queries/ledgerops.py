"""Double-entry ledger batch 167 (q907-q911) — the accounting-integrity
workloads a finance-data platform runs nightly over a journal of
billions of lines, synthesized deterministically from events: every
event posts a two-leg journal entry (debit an account derived from the
event type, credit CASH), amounts in exact integer cents; every 997th
entry drops its credit leg to plant imbalances for the integrity check.

- q907 trial balance: per-account debit/credit/balance totals (the
  planted imbalance is exactly the out-of-balance amount);
- q908 running daily balances per account — the balance-sheet spine —
  via per-account cumulative sums over the bounded day table;
- q909 journal integrity: unbalanced entries found by a per-entry
  debit-credit compare; count + total drift must equal the planted
  amounts (structural double-entry audit);
- q910 receivables aging: each user's open balance bucketed by days
  since their last posting — the aging report;
- q911 accrual vs cash: purchases recognized cash-basis (at posting)
  vs accrual-basis (spread over 3 months, integer thirds with the
  remainder to month one), with the deferred-revenue balance.

100 TB shape: journal legs explode map-side (2 rows per event, a
literal unnest); every report is one keyed aggregate — accounts are a
bounded alphabet, days/months calendar-bounded; the q908 cumulative
partitions BY ACCOUNT over days (bounded partitions). Nothing joins
fact-to-fact.

Determinism: all amounts are exact integer cents (FLOOR quantizer);
aging/recognition arithmetic is integer date/month math; every output
ratio is terminal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

IMBALANCE_MOD = 997
AGING_EDGES = (30, 90, 180)


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events"
    )


def _legs_cte() -> str:
    """Two journal legs per event: debit <event_type>, credit cash —
    except every IMBALANCE_MOD-th entry, which drops its credit leg."""
    return f"""amounts AS (
      SELECT event_id, user_id, ts, CAST(ts AS DATE) AS d,
             event_type AS acct,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    legs AS (
      SELECT event_id, user_id, d, acct, cents AS debit,
             CAST(0 AS BIGINT) AS credit
      FROM amounts
      UNION ALL
      SELECT event_id, user_id, d, 'cash' AS acct,
             CAST(0 AS BIGINT) AS debit, cents AS credit
      FROM amounts
      WHERE event_id % {IMBALANCE_MOD} != 0
    )"""


# ---------------------------------------------------------------------------
# q907 — trial balance

_Q907_SQL = f"""
    WITH {_legs_cte()}
    SELECT acct,
           CAST(SUM(debit) AS BIGINT) AS total_debit_cents,
           CAST(SUM(credit) AS BIGINT) AS total_credit_cents,
           CAST(SUM(debit) - SUM(credit) AS BIGINT) AS balance_cents,
           CAST(COUNT(*) AS BIGINT) AS n_legs
    FROM legs
    GROUP BY acct
    ORDER BY acct
    """


@query("q907_trial_balance", oracle=_Q907_SQL)
def q907_trial_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trial balance: per-account debit/credit totals and balances
    in exact integer cents. With clean double entry the balances sum to
    zero; here they sum to exactly the planted imbalance (q909 finds
    the culprit entries). One account-keyed aggregate over the
    map-side-exploded legs."""
    _views(spark, sf_dir)
    return spark.sql(_Q907_SQL)


# ---------------------------------------------------------------------------
# q908 — running daily balances

_Q908_SQL = f"""
    WITH {_legs_cte()},
    daily AS (
      SELECT acct, d,
             CAST(SUM(debit) - SUM(credit) AS BIGINT) AS net_cents
      FROM legs GROUP BY acct, d
    )
    SELECT acct, d,
           net_cents,
           CAST(SUM(net_cents) OVER (PARTITION BY acct ORDER BY d
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS balance_cents
    FROM daily
    ORDER BY acct, d
    """


@query("q908_running_balances", oracle=_Q908_SQL)
def q908_running_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily balance-sheet spine: per-account running balance over the
    day-level aggregate — the cumulative window partitions by ACCOUNT
    and runs over calendar days (bounded partitions, never journal
    lines). Exact integer cents end to end."""
    _views(spark, sf_dir)
    return spark.sql(_Q908_SQL)


# ---------------------------------------------------------------------------
# q909 — journal integrity

_Q909_SQL = f"""
    WITH {_legs_cte()},
    per_entry AS (
      SELECT event_id,
             CAST(SUM(debit) AS BIGINT) AS dr,
             CAST(SUM(credit) AS BIGINT) AS cr
      FROM legs GROUP BY event_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_entries,
           CAST(SUM(CASE WHEN dr != cr THEN 1 ELSE 0 END) AS BIGINT)
             AS n_unbalanced,
           CAST(SUM(dr - cr) AS BIGINT) AS total_drift_cents,
           CAST(MAX(CASE WHEN dr != cr THEN dr - cr ELSE 0 END) AS BIGINT)
             AS max_entry_drift_cents
    FROM per_entry
    """


@query("q909_journal_integrity", oracle=_Q909_SQL)
def q909_journal_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The double-entry audit: per-entry debit==credit checked by an
    entry-keyed aggregate; reports how many entries are unbalanced and
    the exact total drift — which must equal q907's trial-balance
    residual (the structural identity a closing process asserts before
    posting, test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_Q909_SQL)


# ---------------------------------------------------------------------------
# q910 — receivables aging

_Q910_SQL = f"""
    WITH {_legs_cte()},
    anchor AS (SELECT MAX(d) AS today FROM legs),
    peruser AS (
      SELECT user_id,
             CAST(SUM(debit) - SUM(credit) AS BIGINT) AS open_cents,
             MAX(d) AS last_d
      FROM legs GROUP BY user_id
    ),
    aged AS (
      SELECT /*+ BROADCAST(a) */ p.user_id, p.open_cents,
             datediff({{dd}}) AS age_days
      FROM peruser p CROSS JOIN anchor a
    )
    SELECT CASE WHEN age_days <= {AGING_EDGES[0]} THEN 'a_current'
                WHEN age_days <= {AGING_EDGES[1]} THEN 'b_30_90'
                WHEN age_days <= {AGING_EDGES[2]} THEN 'c_90_180'
                ELSE 'd_over_180' END AS age_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_accounts,
           CAST(SUM(open_cents) AS BIGINT) AS open_cents,
           CAST(MAX(age_days) AS BIGINT) AS max_age_days
    FROM aged
    GROUP BY 1
    ORDER BY 1
    """


def _q910_sql(d: str) -> str:
    dd = "a.today, p.last_d" if d == "spark" else "'day', p.last_d, a.today"
    return _Q910_SQL.replace("{dd}", dd)


@query("q910_receivables_aging", oracle=_q910_sql("duckdb"))
def q910_receivables_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The aging report: each user's open balance bucketed by days
    since their last posting (anchored to the ledger's own last day —
    deterministic, no wall clock). Integer date math, one user-keyed
    aggregate, a bounded 4-bucket rollup."""
    _views(spark, sf_dir)
    return spark.sql(_q910_sql("spark"))


# ---------------------------------------------------------------------------
# q911 — accrual vs cash

_Q911_BASE = """
    WITH rev AS (
      SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
             (year(ts) * 12 + month(ts) - 1) AS m
      FROM events WHERE event_type = 'purchase'
    ),
    thirds AS (
      -- integer thirds; the remainder posts to month one
      SELECT m, cents,
             CAST({third} AS BIGINT) AS third,
             CAST(cents - 2 * ({third}) AS BIGINT) AS first_part
      FROM rev
    ),
    accrual AS (
      SELECT m + offs AS m,
             CAST(SUM(CASE WHEN offs = 0 THEN first_part ELSE third END)
               AS BIGINT) AS accrual_cents
      FROM thirds
      CROSS JOIN (SELECT offs FROM (VALUES (0), (1), (2)) AS t(offs)) o
      GROUP BY m + offs
    ),
    cash AS (
      SELECT m, CAST(SUM(cents) AS BIGINT) AS cash_cents
      FROM rev GROUP BY m
    )
    SELECT COALESCE(a.m, c.m) AS month_idx,
           CAST(COALESCE(c.cash_cents, 0) AS BIGINT) AS cash_cents,
           CAST(COALESCE(a.accrual_cents, 0) AS BIGINT) AS accrual_cents,
           CAST(COALESCE(a.accrual_cents, 0) - COALESCE(c.cash_cents, 0)
             AS BIGINT) AS recognition_shift_cents
    FROM accrual a
    FULL OUTER JOIN cash c ON c.m = a.m
    ORDER BY month_idx
    """


def _q911_sql(d: str) -> str:
    third = "cents div 3" if d == "spark" else "cents // 3"
    return _Q911_BASE.replace("{third}", third)


@query("q911_accrual_vs_cash", oracle=_q911_sql("duckdb"))
def q911_accrual_vs_cash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deferred-revenue waterfall: purchases recognized cash-basis at
    posting vs accrual-basis spread over 3 months in EXACT integer
    thirds (remainder to month one, so per-purchase recognition sums
    are cent-exact — test-asserted that lifetime accrual == lifetime
    cash). The 3-way spread is a literal-offset cross join (3 rows),
    never a calendar window."""
    _views(spark, sf_dir)
    return spark.sql(_q911_sql("spark"))
