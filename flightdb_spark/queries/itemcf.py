"""Item-item collaborative-filtering batch 136 (q746-q750) — the
neighborhood recommender a merchandising team runs over the
customer x brand purchase matrix (brands as items, customers as
users, purchase counts as implicit ratings):

- q746 brand co-occurrence + Jaccard over customer sets;
- q747 cosine similarity on the integer count vectors;
- q748 top-3 nearest neighbor brands per brand;
- q749 one recommendation per customer: the best-scoring brand the
  customer has NOT bought (neighborhood score = sum of similarity x
  owned-brand count), ties broken by brand name;
- q750 recommendation audit: how concentrated the recommended-brand
  distribution is, with catalog coverage.

100 TB shape: ONE fact pass collapses lineitem x orders x part to
the (customer, brand, count) spine — the only corpus-sized shuffle.
Pair generation self-joins the SPINE on customer (per-customer brand
fan-out is bounded by the 25-brand catalog, so the join emits at
most C(25,2) pairs per customer — never open-vocabulary n²; the
basket-array-explosion rewrite in operators/textdedup applies
unchanged if the catalog grows). Scoring joins the 300-row
similarity table broadcast against the spine.

Determinism: counts and co-counts are exact integers; cosine is a
terminal double from exact integer sums; neighborhood scores
accumulate 9dp-quantized sim x count terms in DECIMAL(38,9) (q602
contract) so the per-customer argmax compares identical doubles on
both engines, with brand-name tie-breaks (total order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

TOP_K = 3


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "customer", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _spine_cte() -> str:
    return """ub AS (
      SELECT o.o_custkey AS u, p.p_brand AS b,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      GROUP BY o.o_custkey, p.p_brand
    )"""


def _sim_cte() -> str:
    """Pairwise integer dots + per-brand norms -> cosine (symmetric pairs)."""
    return f"""{_spine_cte()},
    norms AS (
      SELECT b, CAST(SUM(cnt * cnt) AS BIGINT) AS n2,
             CAST(COUNT(*) AS BIGINT) AS n_users
      FROM ub GROUP BY b
    ),
    dots AS (
      SELECT a.b AS ba, c.b AS bb,
             CAST(SUM(a.cnt * c.cnt) AS BIGINT) AS dot,
             CAST(COUNT(*) AS BIGINT) AS n_both
      FROM ub a JOIN ub c ON c.u = a.u AND a.b < c.b
      GROUP BY a.b, c.b
    ),
    sim AS (
      SELECT d.ba, d.bb, d.dot, d.n_both,
             na.n_users AS users_a, nb.n_users AS users_b,
             CAST(d.dot AS DOUBLE) / SQRT(CAST(na.n2 AS DOUBLE) * nb.n2)
               AS cosine
      FROM dots d
      JOIN norms na ON na.b = d.ba
      JOIN norms nb ON nb.b = d.bb
    )"""


_UB_VIEW = "itemcf_ub_mv"
_SIM_VIEW = "itemcf_sim_mv"


def _sim_view(spark: SparkSession, sf_dir: str) -> None:
    """Materialize the (customer, brand, count) spine once and the
    300-row similarity table over it (guide §2.4): the shared CTE
    chain referenced `ub` up to 5x per query (norms, both dot sides,
    scoring, the ownership anti-join), and Spark inlines CTEs per
    reference — so the lineitem x orders x part corpus aggregate
    re-ran per reference. After the two checkpoints every re-reference
    is a bounded scan; the oracle keeps the one-statement form."""
    _views(spark, sf_dir)
    ub = spark.sql(f"WITH {_spine_cte()} SELECT * FROM ub")
    ub.localCheckpoint(eager=True).createOrReplaceTempView(_UB_VIEW)
    sim_sql = _sim_cte().replace(
        _spine_cte(), f"ub AS (SELECT * FROM {_UB_VIEW})", 1
    )
    sim = spark.sql(f"WITH {sim_sql} SELECT * FROM sim")
    sim.localCheckpoint(eager=True).createOrReplaceTempView(_SIM_VIEW)


def _spark_sql(full_sql: str) -> str:
    """The shared SQL text with the spine/similarity chain swapped for
    the materialized views."""
    return full_sql.replace(
        _sim_cte(),
        f"ub AS (SELECT * FROM {_UB_VIEW}),\n"
        f"    sim AS (SELECT * FROM {_SIM_VIEW})",
        1,
    )


# ---------------------------------------------------------------------------
# q746 — co-occurrence + Jaccard

_Q746_SQL = f"""
    WITH {_sim_cte()}
    SELECT ba AS brand_a, bb AS brand_b,
           n_both AS users_both,
           users_a, users_b,
           CAST(n_both AS DOUBLE) / (users_a + users_b - n_both) AS jaccard
    FROM sim
    ORDER BY ba, bb
    """


@query("q746_brand_cooccurrence", oracle=_Q746_SQL)
def q746_brand_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-set overlap per brand pair: co-purchase user counts and
    Jaccard. The pair join runs on the (customer, brand) spine keyed by
    customer — fan-out bounded by the 25-brand catalog."""
    _sim_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q746_SQL))


# ---------------------------------------------------------------------------
# q747 — cosine similarity

_Q747_SQL = f"""
    WITH {_sim_cte()}
    SELECT ba AS brand_a, bb AS brand_b, dot AS dot_product, cosine
    FROM sim
    ORDER BY ba, bb
    """


@query("q747_item_cosine", oracle=_Q747_SQL)
def q747_item_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine similarity between brand purchase-count vectors: exact
    BIGINT dot products and norms, one terminal double division."""
    _sim_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q747_SQL))


# ---------------------------------------------------------------------------
# q748 — top-k neighbors

_Q748_SQL = f"""
    WITH {_sim_cte()},
    sym AS (
      SELECT ba AS b, bb AS nb, cosine FROM sim
      UNION ALL
      SELECT bb AS b, ba AS nb, cosine FROM sim
    ),
    ranked AS (
      SELECT b, nb, cosine,
             ROW_NUMBER() OVER (PARTITION BY b
                                ORDER BY cosine DESC, nb ASC) AS rk
      FROM sym
    )
    SELECT b AS brand, nb AS neighbor, cosine, CAST(rk AS BIGINT) AS rank
    FROM ranked WHERE rk <= {TOP_K}
    ORDER BY b, rk
    """


@query("q748_topk_neighbors", oracle=_Q748_SQL)
def q748_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most-similar brands per brand: symmetrized pair table,
    brand-partitioned rank over <= 24 rows (ties by neighbor name)."""
    _sim_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q748_SQL))


# ---------------------------------------------------------------------------
# q749 — per-customer recommendation

def _rec_cte() -> str:
    return f"""{_sim_cte()},
    sym AS (
      SELECT ba AS b, bb AS nb, cosine FROM sim
      UNION ALL
      SELECT bb AS b, ba AS nb, cosine FROM sim
    ),
    scores AS (
      SELECT u2.u, s.nb AS cand,
             CAST(SUM(CAST(0.0 + ROUND(s.cosine * u2.cnt, 9)
                  AS DECIMAL(38,9))) AS DOUBLE) AS score
      FROM ub u2 JOIN sym s ON s.b = u2.b
      WHERE NOT EXISTS (
        SELECT 1 FROM ub owned WHERE owned.u = u2.u AND owned.b = s.nb
      )
      GROUP BY u2.u, s.nb
    ),
    best AS (
      SELECT u, cand, score,
             ROW_NUMBER() OVER (PARTITION BY u
                                ORDER BY score DESC, cand ASC) AS rk
      FROM scores
    )"""


_Q749_SQL = f"""
    WITH {_rec_cte()}
    SELECT u AS custkey, cand AS recommended_brand, score
    FROM best WHERE rk = 1
    ORDER BY u
    """


@query("q749_user_recommendation", oracle=_Q749_SQL)
def q749_user_recommendation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One next-brand recommendation per purchasing customer: the
    unowned brand with the highest neighborhood score (sum over owned
    brands of cosine x count, 9dp-quantized DECIMAL accumulation),
    ties by brand name. The anti-join and scoring both key on the
    bounded per-customer brand set."""
    _sim_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q749_SQL))


# ---------------------------------------------------------------------------
# q750 — recommendation audit

_Q750_SQL = f"""
    WITH {_rec_cte()},
    recs AS (
      SELECT u, cand FROM best WHERE rk = 1
    ),
    dist AS (
      SELECT cand AS brand, CAST(COUNT(*) AS BIGINT) AS n_recommended
      FROM recs GROUP BY cand
    ),
    tot AS (
      SELECT CAST(SUM(n_recommended) AS BIGINT) AS t,
             CAST(COUNT(*) AS BIGINT) AS n_brands
      FROM dist
    )
    SELECT d.brand, d.n_recommended,
           CAST(d.n_recommended AS DOUBLE) / t.t AS share,
           CAST(t.n_brands AS DOUBLE) / 25 AS catalog_coverage
    FROM dist d CROSS JOIN tot t
    ORDER BY d.n_recommended DESC, d.brand
    """


@query("q750_recommendation_audit", oracle=_Q750_SQL)
def q750_recommendation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How the recommender spreads its suggestions: per-brand
    recommendation counts/shares and catalog coverage (distinct
    recommended brands over the 25-brand catalog) — the popularity-
    bias audit a recsys team reads before shipping."""
    _sim_view(spark, sf_dir)
    return spark.sql(_spark_sql(_Q750_SQL))
