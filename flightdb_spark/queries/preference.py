"""Preference-data batch 35 (q304-q306): the RLHF/arena analytics
suite. Preference datasets are pairwise comparisons ("output A beat
output B"); before training a reward model on them, a pipeline
audits the pairs — per-system win rates and ratings, the verbosity
bias (does "longer" just win?), and a Bradley-Terry strength fit.

Here the corpus stands in for arena logs: documents are the
"outputs", their `source` is the "system", and matches are formed
deterministically by pairing doc_id-adjacent documents within a
language (one lead() per doc — linear in the corpus, never a
self-join). The winner is the document with more distinct tokens
(vocabulary richness), ties to the lower doc_id.

Determinism: match construction is exact integer/window logic; the
BT fit unrolls THREE multiplicative MM iterations on the tiny
source-level win matrix, rounding ratings to 12 dp between
iterations on both engines so double addition order can't drift the
hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from flightdb_spark.tables import load_table

from . import query

# Shared match-construction SQL (DuckDB): one row per adjacent pair.
_PAIRS_CTE = """
    scored AS (
      SELECT doc_id, source, lang,
             len(list_distinct(string_split(text, ' '))) AS rich,
             length(text) AS n_chars
      FROM documents
    ),
    nxt AS (
      SELECT doc_id, source, lang, rich, n_chars,
             LEAD(doc_id)  OVER w AS b_doc_id,
             LEAD(source)  OVER w AS b_source,
             LEAD(rich)    OVER w AS b_rich,
             LEAD(n_chars) OVER w AS b_chars
      FROM scored
      WINDOW w AS (PARTITION BY lang ORDER BY doc_id)
    ),
    pairs AS (
      SELECT source AS a_source, b_source, lang,
             rich AS a_rich, b_rich, n_chars AS a_chars, b_chars,
             CASE WHEN rich > b_rich THEN 'a'
                  WHEN b_rich > rich THEN 'b'
                  ELSE 'a' END AS winner
      FROM nxt WHERE b_doc_id IS NOT NULL
    )
"""


def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent-doc preference pairs (see module docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "lang",
        F.size(F.array_distinct(F.split("text", " "))).alias("rich"),
        F.length("text").alias("n_chars"),
    )
    w = W.partitionBy("lang").orderBy("doc_id")
    nxt = scored.select(
        "source",
        "lang",
        "rich",
        "n_chars",
        F.lead("doc_id").over(w).alias("b_doc_id"),
        F.lead("source").over(w).alias("b_source"),
        F.lead("rich").over(w).alias("b_rich"),
        F.lead("n_chars").over(w).alias("b_chars"),
    ).filter(F.col("b_doc_id").isNotNull())
    return nxt.select(
        F.col("source").alias("a_source"),
        "b_source",
        "lang",
        F.col("rich").alias("a_rich"),
        "b_rich",
        F.col("n_chars").alias("a_chars"),
        "b_chars",
        F.when(F.col("rich") > F.col("b_rich"), F.lit("a"))
        .when(F.col("b_rich") > F.col("rich"), F.lit("b"))
        .otherwise(F.lit("a"))
        .alias("winner"),
    )


# ---------------------------------------------------------------------------
# q304 — per-system win rate + log-odds rating


@query(
    "q304_pairwise_winrate",
    oracle=f"""
    WITH {_PAIRS_CTE},
    outcomes AS (
      SELECT a_source AS src,
             CASE WHEN winner = 'a' THEN 1 ELSE 0 END AS win
      FROM pairs WHERE a_source <> b_source
      UNION ALL
      SELECT b_source AS src,
             CASE WHEN winner = 'b' THEN 1 ELSE 0 END AS win
      FROM pairs WHERE a_source <> b_source
    )
    SELECT src AS source,
           CAST(COUNT(*) AS BIGINT) AS matches,
           CAST(SUM(win) AS BIGINT) AS wins,
           ROUND(CAST(SUM(win) AS DOUBLE) / COUNT(*), 6) AS win_rate,
           ROUND(LN((SUM(win) + 0.5)
                    / (COUNT(*) - SUM(win) + 0.5)), 6) AS log_odds
    FROM outcomes GROUP BY src ORDER BY src
    """,
)
def q304_pairwise_winrate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arena leaderboard: per-system match count, wins, win rate and
    the smoothed log-odds rating ln((w+.5)/(l+.5)) — the one-shot
    rating you read before fitting anything fancier (q306 is the
    Bradley-Terry refinement on the same matches). Self-matches
    (both sides from one system) are excluded as uninformative.
    Scale: the pair stream unions into (system, win) rows and
    collapses in one shuffle onto ~20 keys."""
    p = _pairs(spark, sf_dir).filter(F.col("a_source") != F.col("b_source"))
    a_side = p.select(
        F.col("a_source").alias("src"),
        F.when(F.col("winner") == "a", 1).otherwise(0).alias("win"),
    )
    b_side = p.select(
        F.col("b_source").alias("src"),
        F.when(F.col("winner") == "b", 1).otherwise(0).alias("win"),
    )
    return (
        a_side.unionByName(b_side)
        .groupBy(F.col("src").alias("source"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("matches"),
            F.sum("win").cast("bigint").alias("wins"),
            F.round(F.sum("win").cast("double") / F.count(F.lit(1)), 6).alias(
                "win_rate"
            ),
            F.round(
                F.log(
                    (F.sum("win") + 0.5)
                    / (F.count(F.lit(1)) - F.sum("win") + 0.5)
                ),
                6,
            ).alias("log_odds"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q305 — verbosity-bias audit


@query(
    "q305_length_bias",
    oracle=f"""
    WITH {_PAIRS_CTE},
    unequal AS (
      SELECT lang,
             CASE WHEN (winner = 'a' AND a_chars > b_chars)
                    OR (winner = 'b' AND b_chars > a_chars)
                  THEN 1 ELSE 0 END AS longer_won
      FROM pairs WHERE a_chars <> b_chars
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(longer_won) AS BIGINT) AS longer_wins,
           ROUND(CAST(SUM(longer_won) AS DOUBLE) / COUNT(*), 6)
             AS longer_win_rate
    FROM unequal GROUP BY lang ORDER BY lang
    """,
)
def q305_length_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verbosity-bias audit: among pairs with unequal lengths, how
    often does the LONGER document win? A rate far above 0.5 means
    the preference signal is really a length signal — the classic
    reward-hacking trap a preference pipeline checks before
    training. Reported per language (per-slice bias detection).
    Scale: same linear pair stream, one shuffle onto ~5 keys."""
    p = _pairs(spark, sf_dir).filter(F.col("a_chars") != F.col("b_chars"))
    longer_won = (
        F.when(
            ((F.col("winner") == "a") & (F.col("a_chars") > F.col("b_chars")))
            | ((F.col("winner") == "b") & (F.col("b_chars") > F.col("a_chars"))),
            1,
        )
        .otherwise(0)
        .alias("longer_won")
    )
    return (
        p.select("lang", longer_won)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("longer_won").cast("bigint").alias("longer_wins"),
            F.round(
                F.sum("longer_won").cast("double") / F.count(F.lit(1)), 6
            ).alias("longer_win_rate"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# q306 — Bradley-Terry strengths via unrolled MM iterations

_BT_ROUND = 12  # inter-iteration rounding: pins double order both engines


def _bt_oracle() -> str:
    """Build the DuckDB side: 3 unrolled MM iterations over the win
    matrix. r_i <- W_i / sum_j n_ij/(r_i+r_j), renormalized to mean 1."""
    steps = []
    prev = "r0"
    for it in range(1, 4):
        steps.append(
            f"""
    raw{it} AS (
      SELECT m.i,
             MAX(w.wins) / SUM(m.n / (ri.r + rj.r)) AS raw
      FROM matrix m
      JOIN {prev} ri ON ri.i = m.i
      JOIN {prev} rj ON rj.i = m.j
      JOIN winsum w ON w.i = m.i
      GROUP BY m.i
    ),
    norm{it} AS (SELECT AVG(raw) AS mu FROM raw{it}),
    r{it} AS (
      SELECT i, ROUND(raw / mu, {_BT_ROUND}) AS r
      FROM raw{it}, norm{it}
    )"""
        )
        prev = f"r{it}"
    return f"""
    WITH {_PAIRS_CTE},
    cells AS (
      SELECT a_source AS i, b_source AS j,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN winner = 'a' THEN 1 ELSE 0 END) AS BIGINT)
               AS wi
      FROM pairs WHERE a_source <> b_source
      GROUP BY a_source, b_source
    ),
    matrix AS (
      SELECT i, j, SUM(n) AS n FROM (
        SELECT i, j, n FROM cells
        UNION ALL SELECT j AS i, i AS j, n FROM cells
      ) GROUP BY i, j
    ),
    winsum AS (
      SELECT i, SUM(wi) AS wins FROM (
        SELECT i, wi FROM cells
        UNION ALL SELECT j AS i, n - wi AS wi FROM cells
      ) GROUP BY i
    ),
    r0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS r FROM winsum),
    {",".join(steps)}
    SELECT w.i AS source, CAST(w.wins AS BIGINT) AS wins,
           ROUND(r3.r, 6) AS bt_strength
    FROM winsum w JOIN r3 ON r3.i = w.i
    ORDER BY source
    """


@query("q306_bradley_terry", oracle=_bt_oracle())
def q306_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths for the arena systems: three unrolled
    MM iterations r_i <- W_i / sum_j n_ij/(r_i+r_j) from uniform
    init, renormalized to mean 1 each step (Hunter 2004's MM
    algorithm, fixed-depth so it is closed-form SQL on both
    engines). Three iterations on a ~20-system matrix is within
    rounding of convergence; ratings are rounded to 12 dp between
    steps so double summation order agrees across engines.
    Scale: the ONLY corpus-size work is the pair aggregation into
    the <=400-cell matrix; the MM joins run on that tiny table, so
    iteration depth costs nothing at 100 TB."""
    p = _pairs(spark, sf_dir).filter(F.col("a_source") != F.col("b_source"))
    # The win matrix is tiny (<= ~400 cells) but every MM iteration
    # references it several times; checkpoint so the corpus-wide pair
    # stream is scanned exactly once, not once per lineage path.
    cells = (
        p.groupBy(F.col("a_source").alias("i"), F.col("b_source").alias("j"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("winner") == "a", 1).otherwise(0))
            .cast("bigint")
            .alias("wi"),
        )
        .localCheckpoint()
    )
    sym = cells.select("i", "j", "n").unionByName(
        cells.select(F.col("j").alias("i"), F.col("i").alias("j"), "n")
    )
    matrix = sym.groupBy("i", "j").agg(F.sum("n").alias("n"))
    wins_rows = cells.select("i", "wi").unionByName(
        cells.select(F.col("j").alias("i"), (F.col("n") - F.col("wi")).alias("wi"))
    )
    winsum = wins_rows.groupBy("i").agg(F.sum("wi").alias("wins"))
    r = winsum.select("i", F.lit(1.0).cast("double").alias("r"))
    for _ in range(3):
        ri = r.select(F.col("i").alias("mi"), F.col("r").alias("r_i"))
        rj = r.select(F.col("i").alias("mj"), F.col("r").alias("r_j"))
        raw = (
            matrix.join(ri, matrix.i == F.col("mi"))
            .join(rj, matrix.j == F.col("mj"))
            .join(winsum.select(F.col("i").alias("wi_key"), "wins"),
                  matrix.i == F.col("wi_key"))
            .groupBy(matrix.i)
            .agg(
                (
                    F.max("wins") / F.sum(F.col("n") / (F.col("r_i") + F.col("r_j")))
                ).alias("raw")
            )
        )
        mu = raw.agg(F.avg("raw").alias("mu"))
        # checkpoint the ~20-row rating vector: each iteration reads it
        # twice (ri, rj), so an uncheckpointed chain doubles plan size
        # per iteration
        r = (
            raw.join(F.broadcast(mu))
            .select(
                "i", F.round(F.col("raw") / F.col("mu"), _BT_ROUND).alias("r")
            )
            .localCheckpoint()
        )
    return (
        winsum.join(r, "i")
        .select(
            F.col("i").alias("source"),
            F.col("wins").cast("bigint").alias("wins"),
            F.round("r", 6).alias("bt_strength"),
        )
        .orderBy("source")
    )
