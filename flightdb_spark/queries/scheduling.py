"""Scheduling-theory batch 151 (q821-q825) — classic single- and
two-machine sequencing over each supplier's order book (jobs =
lineitems, processing time = quantity in minutes), the dispatch-rule
comparisons an ops planner runs, each with its textbook optimality
invariant testable exactly:

- q821 SPT vs FIFO: completion times by prefix sums per rule; SPT
  provably minimizes total flow time (test-asserted);
- q822 EDD vs FIFO: maximum lateness against due dates; EDD provably
  minimizes max lateness (test-asserted);
- q823 WSPT vs SPT: price-weighted flow time; WSPT (Smith's rule,
  order by p/w) provably minimizes the weighted sum (test-asserted);
- q824 Johnson's rule on a two-machine flow shop (stage 1 = picking
  ~ quantity, stage 2 = packing ~ price-scaled): makespan via the
  max-plus identity C2 = P2_n + max_k (P1_k - P2_{k-1}) — the
  Lindley/prefix trick again, no sequential loop; Johnson never
  loses to FIFO (test-asserted);
- q825 machine-2 idle time per rule — where the makespan gap
  actually comes from.

100 TB shape: every schedule is a supplier-partitioned window
(ORDER BY the rule's key) over that supplier's own jobs — the
natural partitioning; completion times and the flow-shop makespan
are prefix sums / running maxes, never loops. One fact pass feeds
everything; per-rule sequences reuse the same partitioning.

Determinism: processing times, weights, and due dates are exact
integers (quantity; FLOOR-quantized price cents; datediff days);
every rule's ORDER BY carries a (orderkey, linenumber) total
tie-break; all completion/lateness/makespan values are BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _days(dialect: str, start: str, end: str) -> str:
    if dialect == "spark":
        return f"datediff({end}, {start})"
    return f"datediff('day', {start}, {end})"


def _jobs_cte(dialect: str) -> str:
    """One job per lineitem: p1 (minutes), weight, due (minutes)."""
    return f"""jobs AS (
      SELECT l.l_suppkey AS m, l.l_orderkey AS ok, l.l_linenumber AS ln,
             CAST(l.l_quantity AS BIGINT) AS p,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS w,
             CAST(1 + FLOOR(CAST(FLOOR(l.l_extendedprice * 100 + 0.5)
                  AS BIGINT) / 100000.0) AS BIGINT) AS p2,
             CAST(10 * {_days(dialect, 'o.o_orderdate', 'l.l_shipdate')}
                  AS BIGINT) AS due,
             o.o_orderdate AS od
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )"""


def _completions(order_by: str, alias: str) -> str:
    """Per-machine completion times under a dispatch rule."""
    return f"""{alias} AS (
      SELECT m, ok, ln, p, w, due,
             CAST(SUM(p) OVER (PARTITION BY m ORDER BY {order_by}
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS c
      FROM jobs
    )"""


# ---------------------------------------------------------------------------
# q821 — SPT vs FIFO

def _q821_sql(dialect: str) -> str:
    return f"""
    WITH {_jobs_cte(dialect)},
    {_completions("p, ok, ln, w, due", "spt")},
    {_completions("od, ok, ln, p, w, due", "fifo")}
    SELECT s.r AS rule, s.total_flow, s.mean_flow, s.makespan
    FROM (
      SELECT 'spt' AS r,
             CAST(SUM(c) AS BIGINT) AS total_flow,
             CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mean_flow,
             CAST(MAX(c) AS BIGINT) AS makespan
      FROM spt
      UNION ALL
      SELECT 'fifo' AS r,
             CAST(SUM(c) AS BIGINT) AS total_flow,
             CAST(SUM(c) AS DOUBLE) / COUNT(*) AS mean_flow,
             CAST(MAX(c) AS BIGINT) AS makespan
      FROM fifo
    ) s
    ORDER BY s.r
    """


@query("q821_spt_vs_fifo", oracle=_q821_sql("duckdb"))
def q821_spt_vs_fifo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest-processing-time vs arrival-order dispatch per
    supplier: total/mean flow time (SPT provably <= FIFO — the test
    asserts the theorem) and the rule-invariant makespan. Completion
    times are supplier-partitioned prefix sums."""
    _views(spark, sf_dir)
    return spark.sql(_q821_sql("spark"))


# ---------------------------------------------------------------------------
# q822 — EDD vs FIFO lateness

def _q822_sql(dialect: str) -> str:
    return f"""
    WITH {_jobs_cte(dialect)},
    {_completions("due, ok, ln, p, w", "edd")},
    {_completions("od, ok, ln, p, w, due", "fifo")}
    SELECT s.r AS rule,
           CAST(MAX(s.lat) AS BIGINT) AS max_lateness,
           CAST(SUM(CASE WHEN s.lat > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tardy,
           CAST(COUNT(*) AS BIGINT) AS n_jobs
    FROM (
      SELECT 'edd' AS r, CAST(c - due AS BIGINT) AS lat FROM edd
      UNION ALL
      SELECT 'fifo' AS r, CAST(c - due AS BIGINT) AS lat FROM fifo
    ) s
    GROUP BY s.r
    ORDER BY s.r
    """


@query("q822_edd_lateness", oracle=_q822_sql("duckdb"))
def q822_edd_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest-due-date vs arrival order: max lateness (EDD provably
    minimizes it per machine; the global max inherits the bound —
    test-asserted) and tardy-job counts. Due dates are exact integer
    day-scaled targets."""
    _views(spark, sf_dir)
    return spark.sql(_q822_sql("spark"))


# ---------------------------------------------------------------------------
# q823 — WSPT vs SPT weighted flow

def _q823_sql(dialect: str) -> str:
    # Smith's rule: order by p/w ascending == p * w' comparisons; use
    # exact cross-multiplied ordering via p * 1e9 / w quantized? Safer:
    # ORDER BY p * 100000000 / w is a double; use exact rational order
    # key p/w via integer pair (p, w): p1/w1 < p2/w2 <=> p1*w2 < p2*w1.
    # SQL ORDER BY needs a key: use CAST(p AS DOUBLE)/w — identical
    # doubles on both engines, ties broken by (ok, ln).
    return f"""
    WITH {_jobs_cte(dialect)},
    {_completions("CAST(p AS DOUBLE) / w, ok, ln, p, w, due", "wspt")},
    {_completions("p, ok, ln, w, due", "spt")}
    SELECT s.r AS rule,
           CAST(SUM(s.wc) AS BIGINT) AS weighted_flow
    FROM (
      SELECT 'wspt' AS r, CAST(w * c AS BIGINT) AS wc FROM wspt
      UNION ALL
      SELECT 'spt' AS r, CAST(w * c AS BIGINT) AS wc FROM spt
    ) s
    GROUP BY s.r
    ORDER BY s.r
    """


@query("q823_wspt_weighted_flow", oracle=_q823_sql("duckdb"))
def q823_wspt_weighted_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smith's rule (order by p/w) vs plain SPT on price-weighted flow
    time — WSPT is provably optimal for the weighted sum
    (test-asserted). The p/w sort key is a straight-line double
    (identical on both engines), ties total-ordered."""
    _views(spark, sf_dir)
    return spark.sql(_q823_sql("spark"))


# ---------------------------------------------------------------------------
# q824 — Johnson's two-machine flow shop

def _johnson_mk(order_by: str, alias: str) -> str:
    """Flow-shop makespan via C2 = P2_n + max_k (P1_k - P2_{k-1})."""
    return f"""{alias} AS (
      SELECT m,
             CAST(MAX(p2sum) AS BIGINT)
               + CAST(MAX(p1k_minus_p2km1) AS BIGINT) AS makespan
      FROM (
        SELECT m,
               SUM(p2) OVER (PARTITION BY m) AS p2sum,
               (SUM(p) OVER w)
                 - ((SUM(p2) OVER w) - p2) AS p1k_minus_p2km1
        FROM jobs
        WINDOW w AS (PARTITION BY m ORDER BY {order_by}
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ) z
      GROUP BY m
    )"""


def _q824_sql(dialect: str) -> str:
    johnson_key = (
        "CASE WHEN p <= p2 THEN 0 ELSE 1 END, "
        "CASE WHEN p <= p2 THEN p ELSE -p2 END, ok, ln, p, w, due"
    )
    return f"""
    WITH {_jobs_cte(dialect)},
    {_johnson_mk(johnson_key, "jmk")},
    {_johnson_mk("od, ok, ln, p, w, due", "fmk")}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_machines,
           CAST(SUM(j.makespan) AS BIGINT) AS johnson_total_makespan,
           CAST(SUM(f.makespan) AS BIGINT) AS fifo_total_makespan,
           CAST(SUM(f.makespan - j.makespan) AS BIGINT) AS total_saving,
           CAST(SUM(CASE WHEN j.makespan > f.makespan THEN 1 ELSE 0 END)
                AS BIGINT) AS machines_johnson_worse
    FROM jmk j JOIN fmk f ON f.m = j.m
    """


@query("q824_johnson_flowshop", oracle=_q824_sql("duckdb"))
def q824_johnson_flowshop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-machine flow-shop makespan under Johnson's rule vs arrival
    order, computed WITHOUT a sequential simulation: the max-plus
    identity C2 = P2_total + max_k (P1_k - P2_{k-1}) turns the
    recurrence into one prefix-sum window per rule. Johnson is
    provably optimal, so machines_johnson_worse = 0 (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_q824_sql("spark"))


# ---------------------------------------------------------------------------
# q825 — machine-2 idle time

def _q825_sql(dialect: str) -> str:
    johnson_key = (
        "CASE WHEN p <= p2 THEN 0 ELSE 1 END, "
        "CASE WHEN p <= p2 THEN p ELSE -p2 END, ok, ln, p, w, due"
    )
    return f"""
    WITH {_jobs_cte(dialect)},
    {_johnson_mk(johnson_key, "jmk")},
    {_johnson_mk("od, ok, ln, p, w, due", "fmk")},
    work AS (
      SELECT m, CAST(SUM(p2) AS BIGINT) AS p2_total FROM jobs GROUP BY m
    )
    SELECT 'johnson' AS rule,
           CAST(SUM(j.makespan - w.p2_total) AS BIGINT) AS total_idle_m2,
           CAST(SUM(j.makespan - w.p2_total) AS DOUBLE) / SUM(j.makespan)
             AS idle_share
    FROM jmk j JOIN work w ON w.m = j.m
    UNION ALL
    SELECT 'fifo' AS rule,
           CAST(SUM(f.makespan - w.p2_total) AS BIGINT) AS total_idle_m2,
           CAST(SUM(f.makespan - w.p2_total) AS DOUBLE) / SUM(f.makespan)
             AS idle_share
    FROM fmk f JOIN work w ON w.m = f.m
    ORDER BY rule
    """


@query("q825_flowshop_idle", oracle=_q825_sql("duckdb"))
def q825_flowshop_idle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Where Johnson's saving comes from: machine-2 idle time
    (makespan minus stage-2 work) per rule — Johnson packs stage 2
    tighter, so its idle total is never larger (test-asserted)."""
    _views(spark, sf_dir)
    return spark.sql(_q825_sql("spark"))
