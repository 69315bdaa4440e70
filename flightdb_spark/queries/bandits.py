"""Best-arm-identification batch 154 (q836-q840) — successive halving
(Karnin 2013) replayed deterministically on brands as arms: the month
span splits into five equal phases, and after each phase the bottom
half of surviving brands (by cumulative revenue so far, ties by
name) is eliminated — 25 -> 13 -> 7 -> 4 -> 2 -> 1. Because rewards
are historical, the replay is exact relational algebra: five rounds
of bounded rank joins over a 25-row arm table.

- q836 the arm x phase reward table;
- q837 the halving trace: survivors, elimination cutoff, and the
  kept set per round;
- q838 the final pick vs the full-horizon oracle best: hit flag and
  the pick's true rank;
- q839 simple-regret comparison vs the one-phase baseline (pick the
  phase-1 leader) — halving uses the same total observation budget
  far more adaptively;
- q840 the observation-budget ledger per round (arms x phases
  consumed) against uniform allocation.

100 TB shape: ONE fact pass to the 125-cell (brand, phase) table;
the five halving rounds are rank joins over <= 25 rows each (single
reference per round — a linear chain, no CTE blowup); everything
else reads those bounded tables.

Determinism: revenue in exact BIGINT cents; phase ids are integer
month arithmetic; every elimination ranks by (cumulative cents DESC,
brand ASC) — a total order; keep-counts use ceil((n+1)/2) in integer
arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_PHASES = 5
BASE_MONTH = 1995 * 12

# survivor counts per round for 25 arms: ceil(n/2) each halving
_KEEPS = [13, 7, 4, 2, 1]


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _arms_cte() -> str:
    return f"""rev AS (
      SELECT p.p_brand AS b,
             (year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1
               - {BASE_MONTH}) AS m,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    span AS (
      SELECT CAST(MIN(m) AS BIGINT) AS m0,
             CAST(MAX(m) - MIN(m) + 1 AS BIGINT) AS w
      FROM rev
    ),
    arms AS (
      SELECT /*+ BROADCAST(s) */ r.b,
             CAST(LEAST(CAST(FLOOR((r.m - s.m0) * {N_PHASES}
                  / CAST(s.w AS DOUBLE)) AS BIGINT),
                  {N_PHASES - 1}) + 1 AS BIGINT) AS phase,
             CAST(SUM(r.cents) AS BIGINT) AS cents
      FROM rev r CROSS JOIN span s
      GROUP BY r.b, CAST(LEAST(CAST(FLOOR((r.m - s.m0) * {N_PHASES}
                  / CAST(s.w AS DOUBLE)) AS BIGINT),
                  {N_PHASES - 1}) + 1 AS BIGINT)
    )"""


def _halving_ctes() -> str:
    """Five rounds: cumulative-through-phase rank among survivors."""
    parts = [
        """s0 AS (SELECT DISTINCT b FROM arms)"""
    ]
    for r in range(1, N_PHASES + 1):
        keep = _KEEPS[r - 1]
        parts.append(
            f"""cum{r} AS (
      SELECT s.b, CAST(COALESCE(SUM(a.cents), 0) AS BIGINT) AS c
      FROM s{r - 1} s
      LEFT JOIN arms a ON a.b = s.b AND a.phase <= {r}
      GROUP BY s.b
    ),
    rk{r} AS (
      SELECT /*+ BROADCAST(z) */ x.b, x.c,
             CAST(1 + SUM(CASE WHEN z.c > x.c
                          OR (z.c = x.c AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rnk
      FROM cum{r} x JOIN cum{r} z ON z.b <> x.b OR z.b = x.b
      GROUP BY x.b, x.c
    ),
    s{r} AS (
      SELECT b FROM rk{r} WHERE rnk <= {keep}
    )"""
        )
    return ",\n    ".join(parts)




_ARMS_VIEW = "bandits_arms_mv"
_HALVING_VIEW = "bandits_halving_mv"


def _halving_pandas(key, pdf):  # pragma: no cover - runs on executors
    """The whole five-round halving ledger over the bounded 125-row
    arm table in ONE in-process pass — the exact `_halving_ctes`
    recurrence (cumulative-through-phase sums, inequality-count ranks
    with name tie-breaks, KEEP cuts), emitted as a long
    (tbl, round, b, c, rnk) table the chain CTEs select from. Exact
    int64 cents; brand names are ASCII so Python `<` == SQL `<`."""
    import pandas as pd

    cents: dict[tuple[str, int], int] = {}
    for b, ph, c in zip(pdf["b"], pdf["phase"], pdf["cents"]):
        cents[(str(b), int(ph))] = cents.get((str(b), int(ph)), 0) + int(c)
    surv = sorted({b for b, _ in cents})
    rows = [("s", 0, b, 0, 0) for b in surv]
    for r in range(1, N_PHASES + 1):
        keep = _KEEPS[r - 1]
        cum = {
            b: sum(c for (bb, ph), c in cents.items() if bb == b and ph <= r)
            for b in surv
        }
        rk = {
            b: 1
            + sum(
                1
                for z in surv
                if cum[z] > cum[b] or (cum[z] == cum[b] and z < b)
            )
            for b in surv
        }
        rows.extend(("cum", r, b, cum[b], 0) for b in surv)
        rows.extend(("rk", r, b, cum[b], rk[b]) for b in surv)
        surv = [b for b in surv if rk[b] <= keep]
        rows.extend(("s", r, b, 0, 0) for b in surv)
    return pd.DataFrame(rows, columns=["tbl", "round", "b", "c", "rnk"])


def _arms_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 125-row arm table once (q812 lesson — the five
    halving rounds reference it ~15 times via scalar subqueries), and
    the halving ledger over it in one Arrow pass (guide §4.2: the
    chain CTEs re-expanded each other multiplicatively when inlined;
    the per-round state is <= 25 rows, so the recurrence runs as a
    single vectorized task and each former CTE becomes a filter on
    the ledger view)."""
    _views(spark, sf_dir)
    df = spark.sql(f"WITH {_arms_cte()} SELECT * FROM arms")
    df.localCheckpoint(eager=True).createOrReplaceTempView(_ARMS_VIEW)
    from pyspark.sql import functions as F

    ledger = (
        spark.table(_ARMS_VIEW)
        .withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            lambda key, pdf: _halving_pandas(key, pdf),
            "tbl string, round int, b string, c bigint, rnk bigint",
        )
    )
    ledger.localCheckpoint(eager=True).createOrReplaceTempView(_HALVING_VIEW)


def _spark_chain(body: str) -> str:
    """Spark side: the halving chain's CTE names, each a bounded
    filter over the one-pass ledger view (same shapes/columns the
    unrolled chain produced, so every tail body runs unchanged)."""
    parts = [
        f"arms AS (SELECT * FROM {_ARMS_VIEW})",
        f"s0 AS (SELECT b FROM {_HALVING_VIEW} WHERE tbl = 's' AND round = 0)",
    ]
    for r in range(1, N_PHASES + 1):
        parts.append(
            f"cum{r} AS (SELECT b, c FROM {_HALVING_VIEW} "
            f"WHERE tbl = 'cum' AND round = {r})"
        )
        parts.append(
            f"rk{r} AS (SELECT b, c, rnk FROM {_HALVING_VIEW} "
            f"WHERE tbl = 'rk' AND round = {r})"
        )
        parts.append(
            f"s{r} AS (SELECT b FROM {_HALVING_VIEW} "
            f"WHERE tbl = 's' AND round = {r})"
        )
    return "WITH " + ",\n    ".join(parts) + body


def _oracle_chain(body: str) -> str:
    txt = f"WITH {_arms_cte()},\n    {_halving_ctes()}{body}"
    for name in ["rev", "arms"] + [
        f"cum{r}" for r in range(1, N_PHASES + 1)
    ] + [f"rk{r}" for r in range(1, N_PHASES + 1)] + [
        f"s{r}" for r in range(0, N_PHASES + 1)
    ]:
        txt = txt.replace(f"{name} AS (", f"{name} AS MATERIALIZED (")
    return txt


# ---------------------------------------------------------------------------
# q836 — arm x phase rewards

_Q836_SQL = f"""
    WITH {_arms_cte()}
    SELECT b AS brand, phase, cents AS phase_revenue_cents
    FROM arms
    ORDER BY b, phase
    """


@query("q836_arm_rewards", oracle=_Q836_SQL)
def q836_arm_rewards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The arm x phase reward table: per-brand revenue in each of the
    five equal month-span phases. One fact pass with map-side
    combine; the phase id is integer month arithmetic."""
    _views(spark, sf_dir)
    return spark.sql(_Q836_SQL)


# ---------------------------------------------------------------------------
# q837 — halving trace

_TRACE_ROWS = """SELECT CAST(1 AS BIGINT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s0) AS survivors_in,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS survivors_out,
           (SELECT CAST(MIN(k.c) AS BIGINT) FROM rk1 k
            WHERE k.rnk <= 13) AS cutoff_cents
    UNION ALL
    SELECT CAST(2 AS BIGINT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS survivors_in,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS survivors_out,
           (SELECT CAST(MIN(k.c) AS BIGINT) FROM rk2 k
            WHERE k.rnk <= 7) AS cutoff_cents
    UNION ALL
    SELECT CAST(3 AS BIGINT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS survivors_in,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS survivors_out,
           (SELECT CAST(MIN(k.c) AS BIGINT) FROM rk3 k
            WHERE k.rnk <= 4) AS cutoff_cents
    UNION ALL
    SELECT CAST(4 AS BIGINT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS survivors_in,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s4) AS survivors_out,
           (SELECT CAST(MIN(k.c) AS BIGINT) FROM rk4 k
            WHERE k.rnk <= 2) AS cutoff_cents
    UNION ALL
    SELECT CAST(5 AS BIGINT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s4) AS survivors_in,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s5) AS survivors_out,
           (SELECT CAST(MIN(k.c) AS BIGINT) FROM rk5 k
            WHERE k.rnk <= 1) AS cutoff_cents"""

_Q837_BODY = "\n    " + _TRACE_ROWS + "\n    ORDER BY round\n    "


@query("q837_halving_trace", oracle=_oracle_chain(_Q837_BODY))
def q837_halving_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The successive-halving ledger: arms in, arms kept, and the
    cumulative-revenue cutoff at each of the five rounds
    (25 -> 13 -> 7 -> 4 -> 2 -> 1, test-asserted)."""
    _arms_view(spark, sf_dir)
    return spark.sql(_spark_chain(_Q837_BODY))


# ---------------------------------------------------------------------------
# q838 — final pick vs oracle

_Q838_BODY = """,
    
    full_rank AS (
      SELECT /*+ BROADCAST(z) */ x.b, x.c,
             CAST(1 + SUM(CASE WHEN z.c > x.c
                          OR (z.c = x.c AND z.b < x.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rnk
      FROM (SELECT b, CAST(SUM(cents) AS BIGINT) AS c
            FROM arms GROUP BY b) x
      JOIN (SELECT b, CAST(SUM(cents) AS BIGINT) AS c
            FROM arms GROUP BY b) z ON z.b <> x.b OR z.b = x.b
      GROUP BY x.b, x.c
    )
    SELECT s.b AS picked_brand,
           f.rnk AS picked_true_rank,
           CASE WHEN f.rnk = 1 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS found_best,
           f.c AS picked_total_cents,
           (SELECT CAST(MAX(c) AS BIGINT) FROM full_rank) AS best_total_cents
    FROM s5 s JOIN full_rank f ON f.b = s.b
    """


@query("q838_halving_pick", oracle=_oracle_chain(_Q838_BODY))
def q838_halving_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The surviving arm against the full-horizon oracle: its true
    rank among all 25 brands and whether halving found the best.
    Because cumulative revenue through round 5 IS the full horizon,
    the final comparison is exact."""
    _arms_view(spark, sf_dir)
    return spark.sql(_spark_chain(_Q838_BODY))


# ---------------------------------------------------------------------------
# q839 — simple regret vs one-phase baseline

_Q839_BODY = """,
    
    totals AS (
      SELECT b, CAST(SUM(cents) AS BIGINT) AS c FROM arms GROUP BY b
    ),
    best AS (SELECT CAST(MAX(c) AS BIGINT) AS c FROM totals),
    p1 AS (
      SELECT a.b FROM arms a WHERE a.phase = 1
      ORDER BY a.cents DESC, a.b ASC LIMIT 1
    )
    SELECT r.rule,
           r.picked_c AS picked_total_cents,
           b.c AS best_total_cents,
           CAST(b.c - r.picked_c AS BIGINT) AS simple_regret_cents,
           CAST(b.c - r.picked_c AS DOUBLE) / b.c AS relative_regret
    FROM (
      SELECT 'halving' AS rule, t.c AS picked_c
      FROM s5 s JOIN totals t ON t.b = s.b
      UNION ALL
      SELECT 'phase1_leader' AS rule, t.c AS picked_c
      FROM p1 JOIN totals t ON t.b = p1.b
    ) r CROSS JOIN best b
    ORDER BY r.rule
    """


@query("q839_simple_regret", oracle=_oracle_chain(_Q839_BODY))
def q839_simple_regret(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple regret of the halving pick vs the naive phase-1-leader
    pick, both against the full-horizon best arm. Halving sees every
    phase for its finalists, so its regret is never larger
    (test-asserted)."""
    _arms_view(spark, sf_dir)
    return spark.sql(_spark_chain(_Q839_BODY))


# ---------------------------------------------------------------------------
# q840 — observation-budget ledger

_BUDGET_ROWS = "\n    UNION ALL\n    ".join(
    f"""SELECT CAST({r} AS BIGINT) AS round,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s{r - 1})
             AS arms_observed,
           CAST(1 AS BIGINT) AS phases_each"""
    for r in range(1, N_PHASES + 1)
)

_Q840_BODY = """,
    
    ledger AS (
      BUDGETROWSPLACEHOLDER
    )
    SELECT /*+ BROADCAST(l2) */ l.round, l.arms_observed, l.phases_each,
           CAST(l.arms_observed * l.phases_each AS BIGINT)
             AS cells_this_round,
           CAST(SUM(l2.arms_observed * l2.phases_each) AS BIGINT)
             AS cells_cumulative,
           CAST(25 * 5 AS BIGINT) AS uniform_total_cells
    FROM ledger l JOIN ledger l2 ON l2.round <= l.round
    GROUP BY l.round, l.arms_observed, l.phases_each
    ORDER BY l.round
    """.replace("BUDGETROWSPLACEHOLDER", _BUDGET_ROWS)


@query("q840_halving_budget", oracle=_oracle_chain(_Q840_BODY))
def q840_halving_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The observation ledger: arm-phase cells consumed per round and
    cumulatively vs the uniform-allocation total (125 cells) — the
    adaptive-budget argument for halving in one table. The cumulative
    is a bounded 5-row inequality self-join — no window at all."""
    _arms_view(spark, sf_dir)
    return spark.sql(_spark_chain(_Q840_BODY))
