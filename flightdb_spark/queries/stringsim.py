"""String-similarity batch 185 (q992-q996) — character-level document
comparison over a LINEAR pairing (each doc against the next doc_id in
its source): edit distance, similarity ratios, trigram Jaccard, and
common-prefix structure — the record-linkage feature block beside
linkage.py's Fellegi-Sunter (which consumes exactly these scores) and
texteval.py's corpus metrics.

Both engines ship the SAME classic Wagner-Fischer levenshtein builtin
(integer edit distance over unicode chars), so the distances are
exact-integer parity anchors; everything derived stays rational
(num/den) until one terminal double. Texts cap at a literal prefix
length so the per-pair DP is bounded (the 100 TB contract for any
quadratic-in-length string op).

- q992 edit distances on 30-char prefixes for every consecutive
  same-source pair (the builtin parity anchor);
- q993 normalized similarity 1 - lev/maxlen as an exact rational,
  bucketed into a 10-bin histogram per source;
- q994 positional trigram Jaccard on the same prefixes (explicit
  3-gram sets both sides — never an engine-private similarity
  builtin);
- q995 longest common prefix via a literal k-grid (max k with equal
  k-prefixes — no recursion, no UDF);
- q996 metric agreement: edit similarity vs trigram Jaccard per
  pair, with exact cross-product concordance counts (does the cheap
  metric rank like the expensive one?).

100 TB shape: the pairing is a doc_id lag within source (one
partitioned window over docs, linear); every comparison is one row
per pair with literal-bounded work (30-char prefixes, 28 trigrams,
30-row k-grid). No pair explosion anywhere.

Determinism: levenshtein is integer; similarities carried as exact
num/den rationals; Jaccard counts are integers; terminal doubles
only for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

PFX = 30
TRI_N = 3


def _views(spark: SparkSession, sf_dir: str) -> None:
    ensure_parallelism(load_table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )


def _pairs_cte(d: str) -> str:
    """Consecutive same-source doc pairs with PFX-char prefixes."""
    lower = "lower" if d else "lower"
    return f"""docs0 AS (
      SELECT doc_id, source,
             SUBSTR({lower}(text), 1, {PFX}) AS pfx
      FROM documents WHERE length(text) > 0
    ),
    pairs AS (
      SELECT doc_id AS id_a, source, pfx AS a,
             LEAD(doc_id) OVER w AS id_b,
             LEAD(pfx) OVER w AS b
      FROM docs0
      WINDOW w AS (PARTITION BY source ORDER BY doc_id)
    ),
    cmp AS (
      SELECT id_a, id_b, source, a, b,
             CAST(levenshtein(a, b) AS BIGINT) AS lev,
             CAST(GREATEST(length(a), length(b)) AS BIGINT) AS maxlen
      FROM pairs WHERE id_b IS NOT NULL
    )"""


def _q992_sql(d: str) -> str:
    return f"""
    WITH {_pairs_cte(d)}
    SELECT id_a, id_b, source, lev, maxlen
    FROM cmp ORDER BY id_a
    """


@query("q992_edit_distances", oracle=_q992_sql("duckdb"))
def q992_edit_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levenshtein edit distance on 30-char lowercased prefixes for
    every consecutive same-source doc pair — both engines run the
    textbook Wagner-Fischer builtin, so the integers are a direct
    cross-engine parity anchor. The pairing is a lag window (linear),
    never a pair join."""
    _views(spark, sf_dir)
    return spark.sql(_q992_sql("spark"))


def _q993_sql(d: str) -> str:
    return f"""
    WITH {_pairs_cte(d)},
    sim AS (
      SELECT source,
             CAST(maxlen - lev AS BIGINT) AS sim_num,
             maxlen AS sim_den,
             -- decile bucket: FLOOR of the exact-when-even division,
             -- THEN cast (CAST(double AS BIGINT) rounds on DuckDB but
             -- truncates on Spark — the documented q307 hazard),
             -- clamped at 9 for the sim=1 pairs
             LEAST(CAST(FLOOR((maxlen - lev) * 10.0 / maxlen) AS BIGINT),
                   CAST(9 AS BIGINT)) AS bucket10
      FROM cmp
    )
    SELECT source, CAST(bucket10 AS INT) AS sim_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(sim_num) AS BIGINT) AS sum_sim_num,
           CAST(SUM(sim_den) AS BIGINT) AS sum_sim_den
    FROM sim GROUP BY source, sim_decile
    ORDER BY source, sim_decile
    """


@query("q993_similarity_histogram", oracle=_q993_sql("duckdb"))
def q993_similarity_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized edit similarity (maxlen - lev)/maxlen bucketed into
    deciles per source — similarity stays an exact integer rational
    (the decile test is a cross-product; the per-bucket sums stay
    num/den pairs). The linkage-threshold tuning table."""
    _views(spark, sf_dir)
    return spark.sql(_q993_sql("spark"))


def _grams_frag(d: str, col: str) -> str:
    """Distinct positional trigram set of ``col`` as (pair keys, gram)."""
    if d == "spark":
        seq = f"explode(sequence(1, length({col}) - {TRI_N - 1})) AS i"
        return seq
    return f"UNNEST(GENERATE_SERIES(1, length({col}) - {TRI_N - 1})) AS i"


def _q994_sql(d: str) -> str:
    return f"""
    WITH {_pairs_cte(d)},
    longcmp AS (SELECT * FROM cmp WHERE length(a) >= {TRI_N}
                AND length(b) >= {TRI_N}),
    ga AS (
      SELECT DISTINCT id_a, id_b, SUBSTR(a, i, {TRI_N}) AS g
      FROM (SELECT id_a, id_b, a, {_grams_frag(d, 'a')} FROM longcmp) t
    ),
    gb AS (
      SELECT DISTINCT id_a, id_b, SUBSTR(b, i, {TRI_N}) AS g
      FROM (SELECT id_a, id_b, b, {_grams_frag(d, 'b')} FROM longcmp) t
    ),
    sa AS (
      SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS na
      FROM ga GROUP BY id_a, id_b
    ),
    sb AS (
      SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS nb
      FROM gb GROUP BY id_a, id_b
    ),
    si AS (
      SELECT ga.id_a, ga.id_b, CAST(COUNT(*) AS BIGINT) AS inter
      FROM ga JOIN gb ON gb.g = ga.g AND gb.id_a = ga.id_a
        AND gb.id_b = ga.id_b
      GROUP BY ga.id_a, ga.id_b
    )
    SELECT c.id_a, c.id_b,
           sa.na AS n_grams_a,
           sb.nb AS n_grams_b,
           CAST(COALESCE(si.inter, 0) AS BIGINT) AS n_common,
           CAST(COALESCE(si.inter, 0) AS DOUBLE)
             / (sa.na + sb.nb - COALESCE(si.inter, 0)) AS trigram_jaccard
    FROM longcmp c
    JOIN sa ON sa.id_a = c.id_a AND sa.id_b = c.id_b
    JOIN sb ON sb.id_a = c.id_a AND sb.id_b = c.id_b
    LEFT JOIN si ON si.id_a = c.id_a AND si.id_b = c.id_b
    ORDER BY c.id_a
    """


@query("q994_trigram_jaccard", oracle=_q994_sql("duckdb"))
def q994_trigram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-set Jaccard on the same pair prefixes, from EXPLICIT
    3-gram sets (positions exploded, distinct grams, equi-joined
    intersection) — integer counts, one terminal division; no
    engine-private similarity builtin whose gram semantics could
    differ."""
    _views(spark, sf_dir)
    return spark.sql(_q994_sql("spark"))


def _q995_sql(d: str) -> str:
    if d == "spark":
        grid = f"SELECT explode(sequence(1, {PFX})) AS k"
    else:
        grid = f"SELECT UNNEST(GENERATE_SERIES(1, {PFX})) AS k"
    return f"""
    WITH {_pairs_cte(d)},
    ks AS ({grid}),
    lcp AS (
      SELECT c.id_a, c.id_b, c.source,
             CAST(COALESCE(MAX(CASE WHEN SUBSTR(c.a, 1, k.k)
                  = SUBSTR(c.b, 1, k.k)
                  AND length(c.a) >= k.k AND length(c.b) >= k.k
                  THEN k.k END), 0) AS BIGINT) AS lcp_len
      FROM cmp c CROSS JOIN ks k
      GROUP BY c.id_a, c.id_b, c.source
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(lcp_len) AS BIGINT) AS total_lcp,
           CAST(MAX(lcp_len) AS BIGINT) AS max_lcp,
           CAST(SUM(CASE WHEN lcp_len = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_disjoint_starts
    FROM lcp GROUP BY source ORDER BY source
    """


@query("q995_common_prefix", oracle=_q995_sql("duckdb"))
def q995_common_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest-common-prefix lengths per pair via a literal k-grid
    (max k with equal k-prefixes — a 30-row broadcast grid, no UDF or
    recursion), rolled up per source — the shared-boilerplate signal
    a template detector reads."""
    _views(spark, sf_dir)
    return spark.sql(_q995_sql("spark"))


def _q996_sql(d: str) -> str:
    return f"""
    WITH {_pairs_cte(d)},
    longcmp AS (SELECT * FROM cmp WHERE length(a) >= {TRI_N}
                AND length(b) >= {TRI_N}),
    ga AS (
      SELECT DISTINCT id_a, id_b, SUBSTR(a, i, {TRI_N}) AS g
      FROM (SELECT id_a, id_b, a, {_grams_frag(d, 'a')} FROM longcmp) t
    ),
    gb AS (
      SELECT DISTINCT id_a, id_b, SUBSTR(b, i, {TRI_N}) AS g
      FROM (SELECT id_a, id_b, b, {_grams_frag(d, 'b')} FROM longcmp) t
    ),
    inter AS (
      SELECT ga.id_a, ga.id_b, CAST(COUNT(*) AS BIGINT) AS ic
      FROM ga JOIN gb ON gb.g = ga.g AND gb.id_a = ga.id_a
        AND gb.id_b = ga.id_b
      GROUP BY ga.id_a, ga.id_b
    ),
    sizes AS (
      SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS na FROM ga
      GROUP BY id_a, id_b
    ),
    sizesb AS (
      SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS nb FROM gb
      GROUP BY id_a, id_b
    ),
    feat AS (
      SELECT c.id_a, c.id_b,
             CAST(c.maxlen - c.lev AS BIGINT) AS e_num, c.maxlen AS e_den,
             COALESCE(i.ic, 0) AS j_num,
             s.na + sb.nb - COALESCE(i.ic, 0) AS j_den
      FROM longcmp c
      JOIN sizes s ON s.id_a = c.id_a AND s.id_b = c.id_b
      JOIN sizesb sb ON sb.id_a = c.id_a AND sb.id_b = c.id_b
      LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    ),
    pairs2 AS (
      SELECT CASE WHEN (x.e_num * y.e_den - y.e_num * x.e_den)
                       * (x.j_num * y.j_den - y.j_num * x.j_den) > 0
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (x.e_num * y.e_den - y.e_num * x.e_den)
                       * (x.j_num * y.j_den - y.j_num * x.j_den) < 0
                  THEN 1 ELSE 0 END AS disc
      FROM feat x JOIN feat y
        ON x.id_a < y.id_a OR (x.id_a = y.id_a AND x.id_b < y.id_b)
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_of_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(SUM(disc) AS BIGINT) AS discordant,
           CAST(SUM(conc) - SUM(disc) AS DOUBLE) / COUNT(*)
             AS kendall_tau_a
    FROM pairs2
    """


@query("q996_metric_concordance", oracle=_q996_sql("duckdb"))
def q996_metric_concordance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Do edit similarity and trigram Jaccard RANK pairs the same way?
    Kendall tau-a over pair-of-pairs with both similarities compared
    as exact integer cross-products (rationals never become doubles
    before the sign test). High concordance justifies using the cheap
    trigram metric as the blocking filter for the expensive one.
    NOTE the pair-of-pairs join is quadratic in the PAIR table — the
    declared exact-anchor pattern (q46 class): fine at the bounded
    test SFs, and the statistic subsamples trivially at fleet scale.

    r10 P3 staging: `feat` feeds BOTH sides of the pair-of-pairs
    join, and each side re-ran the whole pair + Levenshtein + trigram
    pipeline under Catalyst inlining (10 duplicate documents scans in
    the static plan — the Levenshtein pass computed twice). ONE
    corpus pass checkpoints the bounded pair-feature table; the
    self-join reads the checkpoint twice with an explicit broadcast
    (LogicalRDD default size estimate blocks auto-broadcast — the
    q645 lesson). Oracle keeps the one-statement form."""
    _views(spark, sf_dir)
    full = _q996_sql("spark")
    marker = ",\n    pairs2 AS ("
    head, sep, tail = full.partition(marker)
    assert sep, "q996: feat CTE marker drifted"
    feat = spark.sql(
        head + "\n    SELECT id_a, id_b, e_num, e_den, j_num, j_den FROM feat"
    ).localCheckpoint(eager=True)
    feat.createOrReplaceTempView("stringsim_feat_mv")
    assert "SELECT CASE WHEN" in tail, "q996: pairs2 SELECT drifted"
    staged = (
        "\n    WITH feat AS (SELECT * FROM stringsim_feat_mv),\n    pairs2 AS ("
        + tail.replace("SELECT CASE WHEN",
                       "SELECT /*+ BROADCAST(y) */ CASE WHEN", 1)
    )
    return spark.sql(staged)
