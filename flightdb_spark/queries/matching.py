"""Stable-matching batch 146 (q796-q800) — two-sided market design
over the top-5 brands and the 5 regions: brands rank regions by their
own revenue there, regions rank brands the same way, and the engine
finds the stable assignments (no brand-region pair would both rather
defect — Gale-Shapley 1962). Because both sides are bounded entity
sets BY CONSTRUCTION, the whole stable lattice is computed EXACTLY by
enumerating all 5! = 120 assignments and checking every blocking pair
— no iterative proposal rounds, no convergence question, and the
brand-optimal element is the unique stable matching minimizing the
sum of brand ranks (pointwise minimality makes that argmin unique).

- q796 the preference tables: revenue cents with both sides' ranks
  per (brand, region) cell;
- q797 the brand-optimal stable matching: 5 pairs with both ranks
  and a verified blocking-pair count of 0;
- q798 stable-set census: how many of the 120 assignments are
  stable, the brand-optimal vs region-optimal rank sums (the two
  ends of the stable lattice), and uniqueness;
- q799 instability of the greedy assignment (each brand grabs its
  top region, ties broken by brand priority): its blocking-pair
  count, vs 0 for the stable one;
- q800 the price of stability: total matched revenue under the
  brand-optimal stable matching vs the revenue-maximal assignment
  (the 120-perm exact solution of the assignment problem).

100 TB shape: ONE fact pass to the 25-cell (brand, region) revenue
table; everything else — ranks via 25x25 bounded self-joins, the
120x5 assignment unpivot, the 120x25 blocking-pair check — is
constant-size and broadcast. Ranks use inequality-count joins, not
windows.

Determinism: revenue in exact BIGINT cents; ranks are integer counts
with name tie-breaks (total orders); stability checks are pure
integer comparisons; argmins order by (rank sum, pid) — total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N = 5


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "customer", "nation", "region", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _br_cte() -> str:
    """The one corpus pass: (brand, region) revenue cents."""
    return """br AS (
      SELECT p.p_brand AS b, r.r_name AS r,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY p.p_brand, r.r_name
    )"""


def _market_rest() -> str:
    """top5 -> ... -> pref on any relation named br."""
    return f"""top5 AS (
      SELECT b FROM (
        SELECT b, CAST(SUM(cents) AS BIGINT) AS tot FROM br GROUP BY b
      ) g ORDER BY tot DESC, b ASC LIMIT {N}
    ),
    regions AS (SELECT DISTINCT r FROM br),
    cells AS (
      SELECT /*+ BROADCAST(t) */ t.b, g.r,
             COALESCE(x.cents, CAST(0 AS BIGINT)) AS cents
      FROM top5 t CROSS JOIN regions g
      LEFT JOIN br x ON x.b = t.b AND x.r = g.r
    ),
    bidx AS (
      SELECT /*+ BROADCAST(c) */ a.b, CAST(COUNT(*) AS BIGINT) AS i
      FROM top5 a JOIN top5 c ON c.b <= a.b GROUP BY a.b
    ),
    ridx AS (
      SELECT /*+ BROADCAST(c) */ a.r, CAST(COUNT(*) AS BIGINT) AS j
      FROM regions a JOIN regions c ON c.r <= a.r GROUP BY a.r
    ),
    brank AS (
      SELECT a.b, a.r,
             CAST(1 + SUM(CASE WHEN c.cents > a.cents
                               OR (c.cents = a.cents AND c.r < a.r)
                          THEN 1 ELSE 0 END) AS BIGINT) AS brk
      FROM cells a JOIN cells c ON c.b = a.b
      GROUP BY a.b, a.r
    ),
    rrank AS (
      SELECT a.b, a.r,
             CAST(1 + SUM(CASE WHEN c.cents > a.cents
                               OR (c.cents = a.cents AND c.b < a.b)
                          THEN 1 ELSE 0 END) AS BIGINT) AS rrk
      FROM cells a JOIN cells c ON c.r = a.r
      GROUP BY a.b, a.r
    ),
    pref AS (
      SELECT c.b, c.r, c.cents, bi.i, ri.j, bk.brk, rk.rrk
      FROM cells c
      JOIN bidx bi ON bi.b = c.b
      JOIN ridx ri ON ri.r = c.r
      JOIN brank bk ON bk.b = c.b AND bk.r = c.r
      JOIN rrank rk ON rk.b = c.b AND rk.r = c.r
    )"""


def _market_cte() -> str:
    """25-cell revenue table with both sides' preference ranks."""
    return f"""{_br_cte()},
    {_market_rest()}"""


def _stable_tail(pref: str, matched_src: str | None = None) -> str:
    """dig -> perms -> assign -> matched -> blocking -> stable, built on
    any relation named `pref` (the CTE chain for the oracle, a
    materialized 25-row view on the Spark side). With `matched_src`,
    the 600-row matched table is read from a materialized view instead
    of rebuilding the dig->perms->assign chain — Spark re-expanded that
    chain (5-way unpivot x 4 broadcast joins each) at every one of the
    3-4 `matched` references per query (the P3 pattern, guide §2.4);
    the ORACLE keeps the full single-statement chain."""
    if matched_src is not None:
        return f"""matched AS (
      SELECT pid, b, r, cents, brk, rrk FROM {matched_src}
    ),
    blocking AS (
      SELECT m_b.pid,
             CAST(SUM(CASE WHEN c.brk < m_b.brk AND c.rrk < m_r.rrk
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_blocking
      FROM {pref} c
      JOIN matched m_b ON m_b.b = c.b
      JOIN matched m_r ON m_r.pid = m_b.pid AND m_r.r = c.r
      GROUP BY m_b.pid
    ),
    stable AS (
      SELECT b2.pid,
             CAST(SUM(m.brk) AS BIGINT) AS brand_rank_sum,
             CAST(SUM(m.rrk) AS BIGINT) AS region_rank_sum,
             CAST(SUM(m.cents) AS BIGINT) AS total_cents
      FROM blocking b2 JOIN matched m ON m.pid = b2.pid
      WHERE b2.n_blocking = 0
      GROUP BY b2.pid
    )"""
    digits = ", ".join(f"({d})" for d in range(1, N + 1))
    unpivot = "\n      UNION ALL\n      ".join(
        f"SELECT pid, CAST({i} AS BIGINT) AS i, a{i} AS j FROM perms"
        for i in range(1, N + 1)
    )
    return f"""dig(v) AS (VALUES {digits}),
    perms AS (
      SELECT /*+ BROADCAST(d2), BROADCAST(d3), BROADCAST(d4), BROADCAST(d5) */
             d1.v AS a1, d2.v AS a2, d3.v AS a3, d4.v AS a4, d5.v AS a5,
             CAST(d1.v * 625 + d2.v * 125 + d3.v * 25 + d4.v * 5 + d5.v
                  AS BIGINT) AS pid
      FROM dig d1 CROSS JOIN dig d2 CROSS JOIN dig d3
      CROSS JOIN dig d4 CROSS JOIN dig d5
      WHERE d1.v <> d2.v AND d1.v <> d3.v AND d1.v <> d4.v AND d1.v <> d5.v
        AND d2.v <> d3.v AND d2.v <> d4.v AND d2.v <> d5.v
        AND d3.v <> d4.v AND d3.v <> d5.v
        AND d4.v <> d5.v
    ),
    assign AS (
      {unpivot}
    ),
    matched AS (
      SELECT a.pid, p.b, p.r, p.cents, p.brk, p.rrk
      FROM assign a JOIN {pref} p ON p.i = a.i AND p.j = a.j
    ),
    blocking AS (
      SELECT m_b.pid,
             CAST(SUM(CASE WHEN c.brk < m_b.brk AND c.rrk < m_r.rrk
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_blocking
      FROM {pref} c
      JOIN matched m_b ON m_b.b = c.b
      JOIN matched m_r ON m_r.pid = m_b.pid AND m_r.r = c.r
      GROUP BY m_b.pid
    ),
    stable AS (
      SELECT b2.pid,
             CAST(SUM(m.brk) AS BIGINT) AS brand_rank_sum,
             CAST(SUM(m.rrk) AS BIGINT) AS region_rank_sum,
             CAST(SUM(m.cents) AS BIGINT) AS total_cents
      FROM blocking b2 JOIN matched m ON m.pid = b2.pid
      WHERE b2.n_blocking = 0
      GROUP BY b2.pid
    )"""




def _stable_sql(tail_and_select: str, pref: str, with_market: bool) -> str:
    head = f"WITH {_market_cte()},\n    " if with_market else "WITH "
    return head + tail_and_select.format(pref=pref)


_PREF_VIEW = "matching_pref_mv"
_MATCHED_VIEW = "matching_matched_mv"
_BR_VIEW = "matching_br_mv"


def _pref_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 25-row preference table once — the CTE chain
    behind it joins six tables, and inlining it at every reference
    made the Spark plan exponential (~50 s of pure planning at any
    SF). localCheckpoint truncates the lineage; DuckDB materializes
    CTEs natively so the oracle keeps the one-statement form."""
    _views(spark, sf_dir)
    # ONE corpus pass: `br` (25 rows) is referenced by top5, regions
    # AND cells — inlined, the 6-table join+aggregate ran three times
    # per pref build (guide §2.4). Materialize it first.
    br = spark.sql(f"WITH {_br_cte()} SELECT b, r, cents FROM br")
    br.localCheckpoint(eager=True).createOrReplaceTempView(_BR_VIEW)
    df = spark.sql(
        f"WITH br AS (SELECT b, r, cents FROM {_BR_VIEW}),\n"
        f"    {_market_rest()} SELECT * FROM pref"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_PREF_VIEW)


def _assign_values() -> str:
    """The 600-row (pid, i, j) assignment unpivot as literal VALUES:
    5! = 120 permutations of (1..5), pid exactly as the oracle's
    base-5 encoding d1*625 + d2*125 + d3*25 + d4*5 + d5. A constant
    table — evaluating it through the dig->perms chain cost ~20
    sequential BroadcastExchanges per build."""
    from itertools import permutations

    rows = []
    for perm in permutations(range(1, N + 1)):
        pid = sum(v * 5 ** (N - 1 - k) for k, v in enumerate(perm))
        rows.extend(f"({pid}, {i}, {j})" for i, j in enumerate(perm, 1))
    return ", ".join(rows)


def _matched_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 600-row (pid x 5 pairs) matched table once per
    query on top of the pref view (see _stable_tail: avoids the
    per-reference re-expansion of the dig->perms->assign chain)."""
    _pref_view(spark, sf_dir)
    df = spark.sql(
        f"""SELECT CAST(a.pid AS BIGINT) AS pid, p.b, p.r, p.cents,
                   p.brk, p.rrk
            FROM (VALUES {_assign_values()}) AS a(pid, i, j)
            JOIN {_PREF_VIEW} p ON p.i = a.i AND p.j = a.j"""
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_MATCHED_VIEW)


# ---------------------------------------------------------------------------
# q796 — preference tables

_Q796_TAIL = """{pref_select}
    SELECT b AS brand, r AS region, cents,
           brk AS brand_rank_of_region, rrk AS region_rank_of_brand
    FROM {pref}
    ORDER BY b, brk
    """

_Q796_ORACLE = f"WITH {_market_cte()}" + _Q796_TAIL.format(
    pref="pref", pref_select="")


@query("q796_matching_preferences", oracle=_Q796_ORACLE)
def q796_matching_preferences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-sided preference table: per (brand, region) cell, the
    exact revenue and both sides' ranks (inequality-count joins over
    the 25-cell table — no windows, name tie-breaks)."""
    _pref_view(spark, sf_dir)
    return spark.sql(_Q796_TAIL.format(pref=_PREF_VIEW, pref_select=""))


# ---------------------------------------------------------------------------
# q797 — the brand-optimal stable matching

def _q797_tail(pref: str = "{pref}", matched_src: str | None = None) -> str:
    return _stable_tail(pref, matched_src) + """,
    best AS (
      SELECT pid FROM stable ORDER BY brand_rank_sum ASC, pid ASC LIMIT 1
    )
    SELECT m.b AS brand, m.r AS region, m.cents,
           m.brk AS brand_rank, m.rrk AS region_rank,
           CAST(0 AS BIGINT) AS blocking_pairs
    FROM matched m JOIN best w ON w.pid = m.pid
    ORDER BY m.b
    """


_Q797_ORACLE = f"WITH {_market_cte()},\n    " + _q797_tail().format(pref="pref")


@query("q797_stable_matching", oracle=_Q797_ORACLE)
def q797_stable_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The brand-optimal stable matching: the stable assignment with
    the minimal brand-rank sum (unique by pointwise minimality). Its
    blocking-pair count is zero by membership in the stable set —
    re-verified independently by the test."""
    _matched_view(spark, sf_dir)
    return spark.sql("WITH " + _q797_tail(_PREF_VIEW, _MATCHED_VIEW))


# ---------------------------------------------------------------------------
# q798 — stable-set census

def _q798_tail(pref: str = "{pref}", matched_src: str | None = None) -> str:
    return _stable_tail(pref, matched_src) + """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_stable,
           CAST(MIN(brand_rank_sum) AS BIGINT) AS brand_optimal_rank_sum,
           CAST(MIN(region_rank_sum) AS BIGINT) AS region_optimal_rank_sum,
           CASE WHEN COUNT(*) = 1 THEN CAST(1 AS BIGINT)
                ELSE CAST(0 AS BIGINT) END AS is_unique
    FROM stable
    """


_Q798_ORACLE = f"WITH {_market_cte()},\n    " + _q798_tail().format(pref="pref")


@query("q798_stable_set_census", oracle=_Q798_ORACLE)
def q798_stable_set_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stable lattice summarized: how many of the 120 assignments
    are stable (>= 1 always, by Gale-Shapley existence), the two ends'
    rank sums, and whether the market has a unique stable outcome."""
    _matched_view(spark, sf_dir)
    return spark.sql("WITH " + _q798_tail(_PREF_VIEW, _MATCHED_VIEW))


# ---------------------------------------------------------------------------
# q799 — greedy instability

_Q799_TAIL = """claims AS (
      SELECT b, r, brk, rrk FROM {pref} WHERE brk = 1
    ),
    winners AS (
      SELECT c.b, c.r FROM claims c
      WHERE NOT EXISTS (
        SELECT 1 FROM claims c2 WHERE c2.r = c.r AND c2.b < c.b
      )
    ),
    losers AS (
      SELECT c.b FROM claims c
      WHERE NOT EXISTS (SELECT 1 FROM winners w WHERE w.b = c.b)
    ),
    leftover AS (
      SELECT g.r FROM (SELECT DISTINCT r FROM {pref}) g
      WHERE NOT EXISTS (SELECT 1 FROM winners w WHERE w.r = g.r)
    ),
    lidx AS (
      SELECT /*+ BROADCAST(c) */ a.b, CAST(COUNT(*) AS BIGINT) AS i
      FROM losers a JOIN losers c ON c.b <= a.b GROUP BY a.b
    ),
    ridx2 AS (
      SELECT /*+ BROADCAST(c) */ a.r, CAST(COUNT(*) AS BIGINT) AS i
      FROM leftover a JOIN leftover c ON c.r <= a.r GROUP BY a.r
    ),
    gmatch AS (
      SELECT b, r FROM winners
      UNION ALL
      SELECT l.b, x.r FROM lidx l JOIN ridx2 x ON x.i = l.i
    ),
    gm AS (
      SELECT p.b, p.r, p.cents, p.brk, p.rrk
      FROM gmatch g JOIN {pref} p ON p.b = g.b AND p.r = g.r
    ),
    gblock AS (
      SELECT CAST(SUM(CASE WHEN c.brk < m_b.brk AND c.rrk < m_r.rrk
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_blocking
      FROM {pref} c
      JOIN gm m_b ON m_b.b = c.b
      JOIN gm m_r ON m_r.r = c.r
    )
    SELECT (SELECT n_blocking FROM gblock) AS greedy_blocking_pairs,
           CAST(0 AS BIGINT) AS stable_blocking_pairs,
           (SELECT CAST(SUM(brk) AS BIGINT) FROM gm) AS greedy_brand_rank_sum
    """

_Q799_ORACLE = f"WITH {_market_cte()},\n    " + _Q799_TAIL.format(pref="pref")


@query("q799_greedy_instability", oracle=_Q799_ORACLE)
def q799_greedy_instability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A naive first-choice-grab assignment (each brand takes its top
    region; collisions resolved by brand-name priority, losers sent to
    leftover regions by name) audited for blocking pairs, beside the
    stable matching's guaranteed zero. Shows WHY deferred acceptance
    matters."""
    _pref_view(spark, sf_dir)
    return spark.sql("WITH " + _Q799_TAIL.format(pref=_PREF_VIEW))


# ---------------------------------------------------------------------------
# q800 — price of stability

def _q800_tail(pref: str = "{pref}", matched_src: str | None = None) -> str:
    return _stable_tail(pref, matched_src) + """,
    opt AS (
      SELECT m.pid, CAST(SUM(m.cents) AS BIGINT) AS total_cents
      FROM matched m GROUP BY m.pid
    ),
    maxrev AS (
      SELECT pid, total_cents FROM opt
      ORDER BY total_cents DESC, pid ASC LIMIT 1
    ),
    bopt AS (
      SELECT pid, total_cents FROM stable
      ORDER BY brand_rank_sum ASC, pid ASC LIMIT 1
    )
    SELECT b.total_cents AS stable_total_cents,
           x.total_cents AS maxrev_total_cents,
           CAST(x.total_cents - b.total_cents AS BIGINT)
             AS stability_cost_cents,
           CAST(b.total_cents AS DOUBLE) / x.total_cents
             AS stable_efficiency
    FROM bopt b CROSS JOIN maxrev x
    """


_Q800_ORACLE = f"WITH {_market_cte()},\n    " + _q800_tail().format(pref="pref")


@query("q800_price_of_stability", oracle=_Q800_ORACLE)
def q800_price_of_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total matched revenue under the brand-optimal stable matching
    vs the revenue-maximal assignment (the assignment problem solved
    exactly over the 120 permutations): the price of requiring
    stability, with efficiency <= 1 (test-asserted)."""
    _matched_view(spark, sf_dir)
    return spark.sql("WITH " + _q800_tail(_PREF_VIEW, _MATCHED_VIEW))
