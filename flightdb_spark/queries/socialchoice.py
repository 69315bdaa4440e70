"""Social-choice batch 132 (q726-q730) — the voting-theory toolkit a
ranking/aggregation pipeline runs when many parties rank few options.
Voters = the 25 customer nations; candidates = the five globally
top-revenue brands; each nation's ballot ranks the five by its own
spend (exact cents, ties broken by brand name — a total order, §8):

- q726 Condorcet pairwise matrix: for each candidate pair, how many
  ballots prefer each — majority cycles live here;
- q727 Copeland + Borda scoreboard: pairwise-win counts vs rank-sum
  points, and whether a Condorcet winner exists (Copeland 4/4);
- q728 instant-runoff rounds: four unrolled elimination rounds with
  vote redistribution — the IRV tally sheet;
- q729 Kendall distance between the Borda ranking and the
  first-preference plurality ranking — do the two rules agree?;
- q730 approval vs plurality: each nation approves brands at or
  above its own mean spend; approval counts against plurality.

100 TB shape: one fact pass to (nation, brand) cents; the ballot
table is 25 x 5 rows and every rule runs on it (pairwise joins are
<= 625 rows; IRV rounds are chained 1-row scalar eliminations). The
rank window partitions per nation over exactly five rows.

Determinism: ballots rank exact integers with name tie-breaks;
every tally is an integer count; eliminations order by (votes ASC,
brand ASC) — total; no floats anywhere except final share columns
(unrounded exact rationals, q666 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

N_CAND = 5


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "customer", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _ballots_cte() -> str:
    return f"""nb AS (
      SELECT c.c_nationkey AS nat, p.p_brand AS brand,
             CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY c.c_nationkey, p.p_brand
    ),
    top5 AS (
      SELECT brand FROM (
        SELECT brand, CAST(SUM(cents) AS BIGINT) AS tot
        FROM nb GROUP BY brand
      ) g
      ORDER BY tot DESC, brand ASC
      LIMIT {N_CAND}
    ),
    nations AS (SELECT DISTINCT nat FROM nb),
    grid AS (
      SELECT /*+ BROADCAST(t) */ n.nat, t.brand
      FROM nations n CROSS JOIN top5 t
    ),
    ballots AS (
      SELECT g.nat, g.brand,
             COALESCE(x.cents, CAST(0 AS BIGINT)) AS cents,
             ROW_NUMBER() OVER (
               PARTITION BY g.nat
               ORDER BY COALESCE(x.cents, CAST(0 AS BIGINT)) DESC,
                        g.brand ASC) AS rk
      FROM grid g LEFT JOIN nb x ON x.nat = g.nat AND x.brand = g.brand
    )"""


_BALLOTS_VIEW = "socialchoice_ballots_mv"


def _ballots_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the 125-row ballot table once per query (guide
    §2.4): every rule references `ballots` 2-8x (self-joins, the IRV
    elimination chain), and Spark inlines CTEs per reference — so the
    4-table fact join + rank window behind it re-ran per reference.
    One localCheckpoint makes each re-reference a 125-row scan."""
    _views(spark, sf_dir)
    df = spark.sql(
        f"WITH {_ballots_cte()} SELECT nat, brand, cents, rk FROM ballots"
    )
    df.localCheckpoint(eager=True).createOrReplaceTempView(_BALLOTS_VIEW)


def _spark_sql(full_sql: str) -> str:
    """The shared SQL text with the ballot chain swapped for the
    materialized view (the oracle keeps the one-statement form)."""
    return full_sql.replace(
        _ballots_cte(),
        f"ballots AS (SELECT * FROM {_BALLOTS_VIEW})",
        1,
    )


# ---------------------------------------------------------------------------
# q726 — Condorcet pairwise matrix

_CONDORCET_SQL = f"""
    WITH {_ballots_cte()}
    SELECT a.brand AS brand_a, b.brand AS brand_b,
           CAST(SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END) AS BIGINT)
             AS prefers_a,
           CAST(SUM(CASE WHEN b.rk < a.rk THEN 1 ELSE 0 END) AS BIGINT)
             AS prefers_b,
           CASE WHEN SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN b.rk < a.rk THEN 1 ELSE 0 END)
                THEN a.brand
                WHEN SUM(CASE WHEN b.rk < a.rk THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END)
                THEN b.brand
                ELSE 'tie' END AS majority_winner
    FROM ballots a JOIN ballots b
      ON b.nat = a.nat AND a.brand < b.brand
    GROUP BY a.brand, b.brand
    ORDER BY a.brand, b.brand
    """


@query("q726_condorcet_matrix", oracle=_CONDORCET_SQL)
def q726_condorcet_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Condorcet pairwise-majority matrix: for each of the ten
    candidate pairs, how many nation-ballots rank each higher and who
    wins the head-to-head. The self-join runs on the 125-row ballot
    table, never the facts."""
    _ballots_view(spark, sf_dir)
    return spark.sql(_spark_sql(_CONDORCET_SQL))


# ---------------------------------------------------------------------------
# q727 — Copeland + Borda scoreboard

_SCOREBOARD_SQL = f"""
    WITH {_ballots_cte()},
    duels AS (
      SELECT a.brand AS cand, b.brand AS opp,
             CASE WHEN SUM(CASE WHEN a.rk < b.rk THEN 1 ELSE 0 END)
                       > SUM(CASE WHEN b.rk < a.rk THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS win
      FROM ballots a JOIN ballots b
        ON b.nat = a.nat AND b.brand <> a.brand
      GROUP BY a.brand, b.brand
    ),
    copeland AS (
      SELECT cand AS brand, CAST(SUM(win) AS BIGINT) AS copeland_score
      FROM duels GROUP BY cand
    ),
    borda AS (
      SELECT brand,
             CAST(SUM({N_CAND} - rk) AS BIGINT) AS borda_points
      FROM ballots GROUP BY brand
    )
    SELECT c.brand, c.copeland_score, b.borda_points,
           CASE WHEN c.copeland_score = {N_CAND - 1}
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
             AS is_condorcet_winner
    FROM copeland c JOIN borda b ON b.brand = c.brand
    ORDER BY c.copeland_score DESC, b.borda_points DESC, c.brand ASC
    """


@query("q727_copeland_borda", oracle=_SCOREBOARD_SQL)
def q727_copeland_borda(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scoreboard: Copeland score (head-to-head wins out of 4)
    beside Borda points (rank-sum); a 4/4 Copeland row is a Condorcet
    winner. Integer tallies over the bounded ballot table; ordered by
    (Copeland, Borda, name) — total."""
    _ballots_view(spark, sf_dir)
    return spark.sql(_spark_sql(_SCOREBOARD_SQL))


# ---------------------------------------------------------------------------
# q728 — instant-runoff rounds


def _irv_round(k: int, excluded: list[str]) -> str:
    """Round k: each nation's top choice among non-eliminated brands."""
    excl = ""
    if excluded:
        excl = " AND " + " AND ".join(
            f"b.brand <> (SELECT brand FROM {e})" for e in excluded
        )
    return f"""choice{k} AS (
      SELECT b.nat, b.brand,
             ROW_NUMBER() OVER (PARTITION BY b.nat
                                ORDER BY b.rk ASC) AS pref
      FROM ballots b
      WHERE 1 = 1{excl}
    ),
    counts{k} AS (
      SELECT brand, CAST(COUNT(*) AS BIGINT) AS votes
      FROM choice{k} WHERE pref = 1
      GROUP BY brand
    ),
    lose{k} AS (
      SELECT brand FROM counts{k}
      ORDER BY votes ASC, brand ASC
      LIMIT 1
    )"""


_IRV_SQL = f"""
    WITH {_ballots_cte()},
    {_irv_round(1, [])},
    {_irv_round(2, ["lose1"])},
    {_irv_round(3, ["lose1", "lose2"])},
    {_irv_round(4, ["lose1", "lose2", "lose3"])}
    SELECT CAST(1 AS BIGINT) AS round, brand, votes FROM counts1
    UNION ALL
    SELECT CAST(2 AS BIGINT), brand, votes FROM counts2
    UNION ALL
    SELECT CAST(3 AS BIGINT), brand, votes FROM counts3
    UNION ALL
    SELECT CAST(4 AS BIGINT), brand, votes FROM counts4
    ORDER BY round, votes DESC, brand
    """


@query("q728_irv_rounds", oracle=_IRV_SQL)
def q728_irv_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instant-runoff tally sheet: four unrolled rounds — each
    eliminates the fewest-votes candidate (brand-name tie-break, a
    total order) and redistributes those ballots to their next
    surviving preference. The round-4 leader is the IRV winner. Each
    round is a window + count over the 125-row ballot table."""
    _ballots_view(spark, sf_dir)
    return spark.sql(_spark_sql(_IRV_SQL))


# ---------------------------------------------------------------------------
# q729 — Kendall distance between Borda and plurality rankings

_KENDALL_SQL = f"""
    WITH {_ballots_cte()},
    borda AS (
      SELECT brand, CAST(SUM({N_CAND} - rk) AS BIGINT) AS pts
      FROM ballots GROUP BY brand
    ),
    plur AS (
      SELECT brand,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS firsts
      FROM ballots GROUP BY brand
    ),
    merged AS (
      SELECT b.brand, b.pts, p.firsts
      FROM borda b JOIN plur p ON p.brand = b.brand
    ),
    pairs AS (
      SELECT /*+ BROADCAST(b) */
             CASE WHEN (a.pts - b.pts) * (a.firsts - b.firsts) < 0
                  OR ((a.pts = b.pts) <> (a.firsts = b.firsts))
                  THEN 1 ELSE 0 END AS discordant
      FROM merged a JOIN merged b ON a.brand < b.brand
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(discordant) AS BIGINT) AS discordant_pairs,
           CAST(SUM(discordant) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS normalized_kendall_distance
    FROM pairs
    """


@query("q729_rule_disagreement", oracle=_KENDALL_SQL)
def q729_rule_disagreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How differently do Borda and plurality order the candidates?
    Kendall distance over the ten candidate pairs (integer sign
    tests; a pair also counts discordant when exactly one rule ties
    it). 0 = same ranking, 1 = exact reversal."""
    _ballots_view(spark, sf_dir)
    return spark.sql(_spark_sql(_KENDALL_SQL))


# ---------------------------------------------------------------------------
# q730 — approval vs plurality

_APPROVAL_SQL = f"""
    WITH {_ballots_cte()},
    thresholds AS (
      -- a nation approves brands at/above its mean spend over the 5:
      -- 5*cents >= sum(cents), an exact integer test
      SELECT nat, CAST(SUM(cents) AS BIGINT) AS total5
      FROM ballots GROUP BY nat
    ),
    approvals AS (
      SELECT b.brand,
             CAST(SUM(CASE WHEN CAST({N_CAND} AS BIGINT) * b.cents
                                >= t.total5
                      THEN 1 ELSE 0 END) AS BIGINT) AS approvals
      FROM ballots b JOIN thresholds t ON t.nat = b.nat
      GROUP BY b.brand
    ),
    plur AS (
      SELECT brand,
             CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS firsts
      FROM ballots GROUP BY brand
    )
    SELECT a.brand, a.approvals, p.firsts,
           CAST(a.approvals AS DOUBLE)
             / (SELECT CAST(COUNT(*) AS DOUBLE) FROM thresholds)
             AS approval_share
    FROM approvals a JOIN plur p ON p.brand = a.brand
    ORDER BY a.approvals DESC, p.firsts DESC, a.brand ASC
    """


@query("q730_approval_vs_plurality", oracle=_APPROVAL_SQL)
def q730_approval_vs_plurality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approval voting against plurality: each nation approves the
    brands it spends at least its five-candidate average on (the
    exact integer test 5*cents >= total), tallied beside
    first-preference counts — broad consensus vs narrow intensity in
    one table."""
    _ballots_view(spark, sf_dir)
    return spark.sql(_spark_sql(_APPROVAL_SQL))
