"""Association-rules batch 103 (q581-q585) — the market-basket rule
layer above q133's pair lift: directional rule metrics, maximality
against triples, rule improvement, and negative associations, over
BRAND baskets (order -> distinct part brands, a 25-value item domain
so every rule table is bounded).

- q581 directional rules A->B: support, confidence, lift, leverage,
  conviction (NULL when confidence = 1, decided by the exact integer
  compare supp_ab = supp_a, never by a double equality);
- q582 maximal frequent pairs: frequent pairs contained in NO
  frequent triple — the Apriori border, with triples generated
  map-side by a three-level indexed-lambda explosion;
- q583 rule improvement: conf({A,B} -> C) - conf(B -> C), the lift a
  second antecedent adds — top improvements;
- q584 basket-size profile: baskets, exact pair instances
  k(k-1)/2, and brand diversity per basket-size band;
- q585 negative associations: the bounded 25x25 brand triangle LEFT
  JOINed to observed co-occurrence, bottom lifts (including pairs
  that NEVER co-occur — the zero-support rows a pure explosion
  can't see).

100 TB shape: ONE orderkey shuffle to sorted basket arrays
(localCheckpointed, multiple consumers); pairs AND triples explode
map-side via nested indexed HOF lambdas (work per basket is size^3
with size bounded by order width, never corpus n^2 — the q267/q133
shape); item supports broadcast back; q585's triangle is a 25-row
self-join. Oracles are the textbook DISTINCT self-joins so the two
formulations must agree.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MIN_SUP_PAIR = 20
MIN_SUP_TRIPLE = 20
MIN_ITEM_SUP = 50
TOP_K = 15


def _views(spark: SparkSession, sf_dir: str) -> None:
    for t in ("lineitem", "part"):
        ensure_parallelism(load_table(spark, sf_dir, t)).createOrReplaceTempView(t)


def _ob_cte() -> str:
    """Order->brand DISTINCT pairs (the oracle's basket base)."""
    return """ob AS (
      SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    )"""


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE orderkey shuffle to sorted brand arrays, checkpointed for
    its multiple consumers (q133 shape)."""
    _views(spark, sf_dir)
    li = spark.table("lineitem").select("l_orderkey", "l_partkey")
    pt = spark.table("part").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("items"))
        .localCheckpoint()
    )


def _pair_explode(baskets: DataFrame) -> DataFrame:
    """Map-side u<v pair explosion from sorted basket arrays."""
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("items"),
                    lambda x, i: F.transform(
                        F.slice(F.col("items"), i + 2, F.size("items")),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("supp_ab")
    )


def _triple_explode(baskets: DataFrame) -> DataFrame:
    """Map-side u<v<w triple explosion: three-level indexed lambdas;
    inner slice starts at 1-based i+j+3 (j indexes the mid slice)."""
    triples = baskets.select(
        F.explode(
            F.flatten(
                F.flatten(
                    F.transform(
                        F.col("items"),
                        lambda x, i: F.transform(
                            F.slice(F.col("items"), i + 2, F.size("items")),
                            lambda y, j: F.transform(
                                F.slice(F.col("items"), i + j + 3, F.size("items")),
                                lambda z: F.struct(
                                    x.alias("a"), y.alias("b"), z.alias("c")
                                ),
                            ),
                        ),
                    )
                )
            )
        ).alias("t")
    )
    return triples.groupBy(
        F.col("t.a").alias("a"), F.col("t.b").alias("b"), F.col("t.c").alias("c")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("supp_abc"))


def _item_support(baskets: DataFrame) -> DataFrame:
    return (
        baskets.select(F.explode("items").alias("brand"))
        .groupBy("brand")
        .agg(F.count(F.lit(1)).cast("bigint").alias("supp"))
    )


# ---------------------------------------------------------------------------
# q581 — directional association rules

_RULES_ORACLE = f"""
    WITH {_ob_cte()},
    pairs AS (
      SELECT x.brand AS a, y.brand AS b, CAST(COUNT(*) AS BIGINT) AS supp_ab
      FROM ob x JOIN ob y ON y.okey = x.okey AND y.brand > x.brand
      GROUP BY x.brand, y.brand
      HAVING COUNT(*) >= {MIN_SUP_PAIR}
    ),
    directed AS (
      SELECT a, b, supp_ab FROM pairs
      UNION ALL
      SELECT b, a, supp_ab FROM pairs
    ),
    item AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS supp FROM ob GROUP BY brand),
    tot AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM ob)
    SELECT d.a AS antecedent, d.b AS consequent, d.supp_ab,
           ROUND(CAST(d.supp_ab AS DOUBLE) / ia.supp, 6) AS confidence,
           ROUND(CAST(d.supp_ab AS DOUBLE) * t.n / (ia.supp * 1.0 * ib.supp), 6)
             AS lift,
           ROUND(CAST(d.supp_ab AS DOUBLE) / t.n
                 - (CAST(ia.supp AS DOUBLE) / t.n)
                   * (CAST(ib.supp AS DOUBLE) / t.n), 6) AS leverage,
           CASE WHEN d.supp_ab = ia.supp THEN CAST(NULL AS DOUBLE)
                ELSE ROUND((1.0 - CAST(ib.supp AS DOUBLE) / t.n)
                           / (1.0 - CAST(d.supp_ab AS DOUBLE) / ia.supp), 6)
           END AS conviction
    FROM directed d
    JOIN item ia ON ia.brand = d.a
    JOIN item ib ON ib.brand = d.b
    CROSS JOIN tot t
    ORDER BY lift DESC, antecedent, consequent
    LIMIT {TOP_K}
    """


@query("q581_association_rules", oracle=_RULES_ORACLE)
def q581_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional brand rules A->B with the full metric set
    (confidence, lift, leverage, conviction). Pairs explode map-side
    from basket arrays; both directions materialize at the AGGREGATED
    pair level (support is symmetric); item supports broadcast back.
    Conviction's divide-by-zero guard is the exact integer compare
    supp_ab = supp_a."""
    baskets = _baskets(spark, sf_dir)
    pairs = _pair_explode(baskets).filter(F.col("supp_ab") >= MIN_SUP_PAIR)
    directed = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "supp_ab")
    )
    item = _item_support(baskets)
    nt = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    ia = item.select(F.col("brand").alias("a"), F.col("supp").alias("supp_a"))
    ib = item.select(F.col("brand").alias("b"), F.col("supp").alias("supp_b"))
    conf = F.col("supp_ab").cast("double") / F.col("supp_a")
    return (
        directed.join(F.broadcast(ia), "a")
        .join(F.broadcast(ib), "b")
        .crossJoin(F.broadcast(nt))
        .select(
            F.col("a").alias("antecedent"),
            F.col("b").alias("consequent"),
            "supp_ab",
            F.round(conf, 6).alias("confidence"),
            F.round(
                F.col("supp_ab").cast("double")
                * F.col("nb")
                / (F.col("supp_a") * 1.0 * F.col("supp_b")),
                6,
            ).alias("lift"),
            F.round(
                F.col("supp_ab").cast("double") / F.col("nb")
                - (F.col("supp_a").cast("double") / F.col("nb"))
                * (F.col("supp_b").cast("double") / F.col("nb")),
                6,
            ).alias("leverage"),
            F.when(F.col("supp_ab") == F.col("supp_a"), F.lit(None).cast("double"))
            .otherwise(
                F.round(
                    (1.0 - F.col("supp_b").cast("double") / F.col("nb"))
                    / (1.0 - conf),
                    6,
                )
            )
            .alias("conviction"),
        )
        .orderBy(F.desc("lift"), "antecedent", "consequent")
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# q582 — maximal frequent pairs

_MAXIMAL_ORACLE = f"""
    WITH {_ob_cte()},
    pairs AS (
      SELECT x.brand AS a, y.brand AS b, CAST(COUNT(*) AS BIGINT) AS supp_ab
      FROM ob x JOIN ob y ON y.okey = x.okey AND y.brand > x.brand
      GROUP BY x.brand, y.brand
      HAVING COUNT(*) >= {MIN_SUP_PAIR}
    ),
    triples AS (
      SELECT x.brand AS a, y.brand AS b, z.brand AS c
      FROM ob x
      JOIN ob y ON y.okey = x.okey AND y.brand > x.brand
      JOIN ob z ON z.okey = x.okey AND z.brand > y.brand
      GROUP BY x.brand, y.brand, z.brand
      HAVING COUNT(*) >= {MIN_SUP_TRIPLE}
    ),
    covered AS (
      SELECT a, b FROM triples
      UNION SELECT a, c FROM triples
      UNION SELECT b, c FROM triples
    )
    SELECT p.a, p.b, p.supp_ab
    FROM pairs p
    LEFT JOIN covered c ON c.a = p.a AND c.b = p.b
    WHERE c.a IS NULL
    ORDER BY p.supp_ab DESC, p.a, p.b
    LIMIT {TOP_K}
    """


@query("q582_maximal_frequent_pairs", oracle=_MAXIMAL_ORACLE)
def q582_maximal_frequent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Apriori border at width 2: frequent pairs contained in NO
    frequent triple. Triples explode map-side via three nested indexed
    lambdas (basket-width^3 work per order, one fact scan); the
    covered-pair projection is a bounded anti-join. The oracle
    generates triples with the textbook triple self-join."""
    baskets = _baskets(spark, sf_dir)
    pairs = _pair_explode(baskets).filter(F.col("supp_ab") >= MIN_SUP_PAIR)
    triples = _triple_explode(baskets).filter(F.col("supp_abc") >= MIN_SUP_TRIPLE)
    covered = (
        triples.select("a", "b")
        .unionByName(triples.select("a", F.col("c").alias("b")))
        .unionByName(triples.select(F.col("b").alias("a"), F.col("c").alias("b")))
        .distinct()
    )
    return (
        pairs.join(F.broadcast(covered), ["a", "b"], "left_anti")
        .orderBy(F.desc("supp_ab"), "a", "b")
        .limit(TOP_K)
    )


# ---------------------------------------------------------------------------
# q583 — rule improvement

_IMPROVE_ORACLE = f"""
    WITH {_ob_cte()},
    pairs AS (
      SELECT x.brand AS a, y.brand AS b, CAST(COUNT(*) AS BIGINT) AS supp
      FROM ob x JOIN ob y ON y.okey = x.okey AND y.brand <> x.brand
      GROUP BY x.brand, y.brand
    ),
    triples AS (
      SELECT x.brand AS a, y.brand AS b, z.brand AS c,
             CAST(COUNT(*) AS BIGINT) AS supp_abc
      FROM ob x
      JOIN ob y ON y.okey = x.okey AND y.brand > x.brand
      JOIN ob z ON z.okey = x.okey AND z.brand <> x.brand
                AND z.brand <> y.brand
      GROUP BY x.brand, y.brand, z.brand
      HAVING COUNT(*) >= {MIN_SUP_TRIPLE}
    ),
    ab AS (
      SELECT x.brand AS a, y.brand AS b, CAST(COUNT(*) AS BIGINT) AS supp_ab
      FROM ob x JOIN ob y ON y.okey = x.okey AND y.brand > x.brand
      GROUP BY x.brand, y.brand
    )
    SELECT t.a, t.b, t.c, t.supp_abc,
           ROUND(CAST(t.supp_abc AS DOUBLE) / ab.supp_ab, 6) AS conf_ab_c,
           ROUND(CAST(p.supp AS DOUBLE) / ib.supp, 6) AS conf_b_c,
           ROUND(CAST(t.supp_abc AS DOUBLE) / ab.supp_ab
                 - CAST(p.supp AS DOUBLE) / ib.supp, 6) AS improvement
    FROM triples t
    JOIN ab ON ab.a = t.a AND ab.b = t.b
    JOIN pairs p ON p.a = t.b AND p.b = t.c
    JOIN (SELECT brand, CAST(COUNT(*) AS BIGINT) AS supp FROM ob GROUP BY brand) ib
      ON ib.brand = t.b
    ORDER BY improvement DESC, t.a, t.b, t.c
    LIMIT 10
    """


@query("q583_rule_improvement", oracle=_IMPROVE_ORACLE)
def q583_rule_improvement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What a second antecedent buys: conf({A,B}->C) - conf(B->C) for
    frequent triples (C distinct from A and B, order-free on {A,B}).
    All supports come from the same basket arrays (pairs directed,
    triples u<v on the antecedent set); the comparison joins run on
    bounded aggregated rule tables."""
    baskets = _baskets(spark, sf_dir)
    und = _pair_explode(baskets)  # a<b undirected
    directed = und.select("a", "b", F.col("supp_ab").alias("supp")).unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"),
                   F.col("supp_ab").alias("supp"))
    )
    tri = _triple_explode(baskets)
    # antecedent set {a,b} with a<b, consequent c distinct from both:
    # each sorted triple (a<b<c) yields 3 (pairset, consequent) combos
    combos = (
        tri.select(F.col("a"), F.col("b"), F.col("c").alias("cons"),
                   F.col("supp_abc"))
        .unionByName(
            tri.select(F.col("a"), F.col("c").alias("b"),
                       F.col("b").alias("cons"), F.col("supp_abc"))
        )
        .unionByName(
            tri.select(F.col("b").alias("a"), F.col("c").alias("b"),
                       F.col("a").alias("cons"), F.col("supp_abc"))
        )
        .filter(F.col("supp_abc") >= MIN_SUP_TRIPLE)
    )
    item = _item_support(baskets)
    return (
        combos.join(
            F.broadcast(und.select("a", "b", "supp_ab")), ["a", "b"]
        )
        .join(
            F.broadcast(
                directed.select(
                    F.col("a").alias("b"), F.col("b").alias("cons"),
                    F.col("supp").alias("supp_bc"),
                )
            ),
            ["b", "cons"],
        )
        .join(
            F.broadcast(item.select(F.col("brand").alias("b"),
                                    F.col("supp").alias("supp_b"))),
            "b",
        )
        .select(
            "a", "b", F.col("cons").alias("c"), "supp_abc",
            F.round(F.col("supp_abc").cast("double") / F.col("supp_ab"), 6)
            .alias("conf_ab_c"),
            F.round(F.col("supp_bc").cast("double") / F.col("supp_b"), 6)
            .alias("conf_b_c"),
            F.round(
                F.col("supp_abc").cast("double") / F.col("supp_ab")
                - F.col("supp_bc").cast("double") / F.col("supp_b"),
                6,
            ).alias("improvement"),
        )
        .orderBy(F.desc("improvement"), "a", "b", "c")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q584 — basket-size profile

_PROFILE_ORACLE = f"""
    WITH {_ob_cte()},
    sizes AS (
      SELECT okey, CAST(COUNT(*) AS BIGINT) AS k FROM ob GROUP BY okey
    )
    SELECT k AS basket_size,
           CAST(COUNT(*) AS BIGINT) AS n_baskets,
           CAST(SUM(k * (k - 1) / 2) AS BIGINT) AS pair_instances,
           CAST(SUM(k) AS BIGINT) AS item_instances
    FROM sizes
    GROUP BY k
    ORDER BY basket_size
    """


@query("q584_basket_size_profile", oracle=_PROFILE_ORACLE)
def q584_basket_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-width census: baskets, exact pair instances k(k-1)/2
    (always integral), and item instances per distinct-brand count —
    the denominator structure behind every rule metric, and the proof
    the pair/triple explosions are basket-width bounded. One
    aggregate over the basket arrays."""
    baskets = _baskets(spark, sf_dir)
    return (
        baskets.select(F.size("items").cast("bigint").alias("k"))
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_baskets"),
            F.sum(F.col("k") * (F.col("k") - 1) / 2)
            .cast("bigint")
            .alias("pair_instances"),
            F.sum("k").cast("bigint").alias("item_instances"),
        )
        .withColumnRenamed("k", "basket_size")
        .orderBy("basket_size")
    )


# ---------------------------------------------------------------------------
# q585 — negative associations

_NEGATIVE_ORACLE = f"""
    WITH {_ob_cte()},
    item AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS supp FROM ob GROUP BY brand),
    pairs AS (
      SELECT x.brand AS a, y.brand AS b, CAST(COUNT(*) AS BIGINT) AS supp_ab
      FROM ob x JOIN ob y ON y.okey = x.okey AND y.brand > x.brand
      GROUP BY x.brand, y.brand
    ),
    tot AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n FROM ob)
    SELECT ia.brand AS a, ib.brand AS b,
           ia.supp AS supp_a, ib.supp AS supp_b,
           CAST(COALESCE(p.supp_ab, 0) AS BIGINT) AS supp_ab,
           ROUND(CAST(COALESCE(p.supp_ab, 0) AS DOUBLE) * t.n
                 / (ia.supp * 1.0 * ib.supp), 6) AS lift
    FROM item ia
    JOIN item ib ON ib.brand > ia.brand
    LEFT JOIN pairs p ON p.a = ia.brand AND p.b = ib.brand
    CROSS JOIN tot t
    WHERE ia.supp >= {MIN_ITEM_SUP} AND ib.supp >= {MIN_ITEM_SUP}
    ORDER BY lift ASC, a, b
    LIMIT 10
    """


@query("q585_negative_associations", oracle=_NEGATIVE_ORACLE)
def q585_negative_associations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand pairs that co-occur LESS than independence predicts —
    including pairs that never co-occur, which a pure basket explosion
    cannot emit: the bounded 25x25 brand triangle (self-join on the
    AGGREGATED item table, right side EXPLICITLY broadcast so the
    planner can never degrade the theta join to a CartesianProduct
    regardless of size estimates) LEFT JOINs observed pair support
    with COALESCE 0. Bottom lifts with both items above a support
    floor."""
    baskets = _baskets(spark, sf_dir)
    item = _item_support(baskets).filter(F.col("supp") >= MIN_ITEM_SUP)
    pairs = _pair_explode(baskets)
    nt = baskets.agg(F.count(F.lit(1)).cast("bigint").alias("nb"))
    ia = item.select(F.col("brand").alias("a"), F.col("supp").alias("supp_a"))
    ib = item.select(F.col("brand").alias("b"), F.col("supp").alias("supp_b"))
    return (
        ia.join(F.broadcast(ib), F.col("b") > F.col("a"))
        .join(F.broadcast(pairs), ["a", "b"], "left")
        .crossJoin(F.broadcast(nt))
        .select(
            "a", "b", "supp_a", "supp_b",
            F.coalesce(F.col("supp_ab"), F.lit(0)).cast("bigint").alias("supp_ab"),
            F.round(
                F.coalesce(F.col("supp_ab"), F.lit(0)).cast("double")
                * F.col("nb")
                / (F.col("supp_a") * 1.0 * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.asc("lift"), "a", "b")
        .limit(10)
    )
