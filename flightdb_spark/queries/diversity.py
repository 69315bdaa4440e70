"""Ecological-diversity batch 188 (q1007-q1011) — the species-
abundance index family (Simpson 1949; Hill 1973; Chao 1984; Morisita-
Horn; Whittaker 1960) applied to assortment analytics: "communities"
are customer nations, "species" are the brands (or parts) their
lineitems touch. The same mathematics curates training corpora
(how concentrated is a shard on few sources?) and catalogs (how
diverse is a market's demand?).

All abundance counts are exact integers from one star-join pass
(lineitem -> orders -> customer -> nation); every index is an exact
integer rational (num/den columns) with one terminal double:

- q1007 Simpson concentration per nation: D = sum n_i(n_i-1) /
  (N(N-1)) over brand abundances, plus Gini-Simpson 1-D — exact
  rational num/den;
- q1008 Hill-number profile per nation: q=0 richness, q=2 inverse-
  Simpson N^2/sum n_i^2, Berger-Parker max-share — the diversity
  spectrum that orders markets consistently;
- q1009 Chao1 richness estimate per nation over PART-level abundances
  (rare species regime): S_obs + F1(F1-1)/(2(F2+1)) bias-corrected,
  with singleton/doubleton censuses — the "how many parts does this
  market actually demand" extrapolation;
- q1010 Morisita-Horn similarity for every nation pair (brand
  abundances): 2*sum(ab)*A*B / (sum(a^2)*B^2 + sum(b^2)*A^2) — the
  abundance-weighted community overlap, computed as doubles OF exact
  integers (scale-safe where a bigint product would overflow);
- q1011 incidence-based overlap for every nation pair: Jaccard and
  Sorensen-Dice on brand SETS — exact integer rationals.

100 TB shape: ONE shuffled star join to the (nation x brand) /
(nation x part) abundance grid (625 / ~nation*|part| cells), then
everything is arithmetic on the tiny aggregate; the pairwise queries
self-join the 25-row per-nation summary (bounded triangle, broadcast).

Determinism: integer counts; num/den rationals; terminal doubles are
identical IEEE expressions over identical integers in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


_ABUND_BRAND = """abund AS (
      SELECT n.n_name, p.p_brand AS species,
             CAST(COUNT(*) AS BIGINT) AS n_i
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY n.n_name, p.p_brand
    )"""

_ABUND_PART = """abund AS (
      SELECT n.n_name, l.l_partkey AS species,
             CAST(COUNT(*) AS BIGINT) AS n_i
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY n.n_name, l.l_partkey
    )"""


def _q1007_sql(d: str) -> str:
    return f"""
    WITH {_ABUND_BRAND}
    SELECT n_name,
           CAST(SUM(n_i) AS BIGINT) AS n_total,
           CAST(COUNT(*) AS BIGINT) AS s_obs,
           CAST(SUM(n_i * (n_i - 1)) AS BIGINT) AS simpson_num,
           CAST(SUM(n_i) * (SUM(n_i) - 1) AS BIGINT) AS simpson_den,
           CAST(SUM(n_i * (n_i - 1)) AS DOUBLE)
             / (SUM(n_i) * (SUM(n_i) - 1)) AS simpson_d,
           1.0 - CAST(SUM(n_i * (n_i - 1)) AS DOUBLE)
             / (SUM(n_i) * (SUM(n_i) - 1)) AS gini_simpson
    FROM abund
    GROUP BY n_name
    ORDER BY n_name
    """


@query("q1007_simpson_concentration", oracle=_q1007_sql("duckdb"))
def q1007_simpson_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson concentration per market: the probability two random
    lineitems share a brand, as the exact rational
    sum n_i(n_i-1) / (N(N-1)), with Gini-Simpson diversity 1-D. One
    star join to the 625-cell abundance grid; all arithmetic on the
    grid."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "part")
    return spark.sql(_q1007_sql("spark"))


def _q1008_sql(d: str) -> str:
    return f"""
    WITH {_ABUND_BRAND}
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS hill_q0,
           CAST(SUM(n_i) * SUM(n_i) AS BIGINT) AS hill_q2_num,
           CAST(SUM(n_i * n_i) AS BIGINT) AS hill_q2_den,
           CAST(SUM(n_i) * SUM(n_i) AS DOUBLE) / SUM(n_i * n_i) AS hill_q2,
           CAST(MAX(n_i) AS BIGINT) AS bp_num,
           CAST(SUM(n_i) AS BIGINT) AS bp_den,
           CAST(MAX(n_i) AS DOUBLE) / SUM(n_i) AS berger_parker
    FROM abund
    GROUP BY n_name
    ORDER BY n_name
    """


@query("q1008_hill_profile", oracle=_q1008_sql("duckdb"))
def q1008_hill_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill-number diversity profile per market: q=0 (richness), q=2
    (inverse Simpson, N^2 / sum n_i^2) and the Berger-Parker dominance
    (max share) — exact integer rationals with terminal doubles. The
    concentration spectrum a corpus-curation shard report uses."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "part")
    return spark.sql(_q1008_sql("spark"))


def _q1009_sql(d: str) -> str:
    return f"""
    WITH {_ABUND_PART}
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS s_obs,
           CAST(SUM(CASE WHEN n_i = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
           CAST(SUM(CASE WHEN n_i = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
           CAST(COUNT(*) AS DOUBLE)
             + CAST(SUM(CASE WHEN n_i = 1 THEN 1 ELSE 0 END)
                    * (SUM(CASE WHEN n_i = 1 THEN 1 ELSE 0 END) - 1) AS DOUBLE)
               / (2.0 * (SUM(CASE WHEN n_i = 2 THEN 1 ELSE 0 END) + 1))
             AS chao1,
           CAST(SUM(n_i) AS BIGINT) AS n_total
    FROM abund
    GROUP BY n_name
    ORDER BY n_name
    """


@query("q1009_chao1_richness", oracle=_q1009_sql("duckdb"))
def q1009_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chao1 richness extrapolation per market over PART-level
    abundances (the rare-species regime: most parts are bought once or
    twice): S_obs + F1(F1-1)/(2(F2+1)), the bias-corrected estimator —
    'how many distinct parts does this market really demand'. Exact
    singleton/doubleton censuses; the estimator is one terminal-double
    expression."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    return spark.sql(_q1009_sql("spark"))


def _q1010_sql(d: str) -> str:
    return f"""
    WITH {_ABUND_BRAND},
    paired AS (
      SELECT a.n_name AS nation_a, b.n_name AS nation_b,
             CAST(SUM(a.n_i * b.n_i) AS BIGINT) AS sum_ab
      FROM abund a JOIN abund b
        ON a.species = b.species AND a.n_name < b.n_name
      GROUP BY a.n_name, b.n_name
    ),
    moments AS (
      SELECT n_name,
             CAST(SUM(n_i) AS BIGINT) AS n_tot,
             CAST(SUM(n_i * n_i) AS BIGINT) AS sum_sq
      FROM abund GROUP BY n_name
    )
    SELECT p.nation_a, p.nation_b, p.sum_ab,
           ma.n_tot AS a_total, mb.n_tot AS b_total,
           2.0 * CAST(p.sum_ab AS DOUBLE) * ma.n_tot * mb.n_tot
             / (CAST(ma.sum_sq AS DOUBLE) * mb.n_tot * mb.n_tot
                + CAST(mb.sum_sq AS DOUBLE) * ma.n_tot * ma.n_tot)
             AS morisita_horn
    FROM paired p
    JOIN moments ma ON ma.n_name = p.nation_a
    JOIN moments mb ON mb.n_name = p.nation_b
    ORDER BY p.nation_a, p.nation_b
    """


@query("q1010_morisita_horn", oracle=_q1010_sql("duckdb"))
def q1010_morisita_horn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morisita-Horn abundance-weighted overlap for every market pair:
    2*sum(ab)*A*B / (sum(a^2)*B^2 + sum(b^2)*A^2). The cross terms are
    computed as DOUBLES of exact integers (the bigint product would
    overflow near 1e19 at two decades up — documented scale choice);
    both engines evaluate the identical IEEE expression. The pair join
    runs on the 625-cell grid, not on facts."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "part")
    return spark.sql(_q1010_sql("spark"))


def _q1011_sql(d: str) -> str:
    return f"""
    WITH {_ABUND_BRAND},
    sets AS (
      SELECT n_name, species FROM abund
    ),
    sizes AS (
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS s FROM sets GROUP BY n_name
    ),
    inter AS (
      SELECT a.n_name AS nation_a, b.n_name AS nation_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sets a JOIN sets b
        ON a.species = b.species AND a.n_name < b.n_name
      GROUP BY a.n_name, b.n_name
    )
    SELECT i.nation_a, i.nation_b, i.n_common,
           sa.s AS s_a, sb.s AS s_b,
           CAST(i.n_common AS DOUBLE) / (sa.s + sb.s - i.n_common) AS jaccard,
           CAST(2 * i.n_common AS DOUBLE) / (sa.s + sb.s) AS sorensen_dice
    FROM inter i
    JOIN sizes sa ON sa.n_name = i.nation_a
    JOIN sizes sb ON sb.n_name = i.nation_b
    ORDER BY i.nation_a, i.nation_b
    """


@query("q1011_community_overlap", oracle=_q1011_sql("duckdb"))
def q1011_community_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incidence-based community overlap for every market pair: Jaccard
    and Sorensen-Dice on brand sets — exact integer set sizes with
    terminal-double ratios. Same bounded pair-join economics as
    q1010."""
    _views(spark, sf_dir, "lineitem", "orders", "customer", "nation", "part")
    return spark.sql(_q1011_sql("spark"))
