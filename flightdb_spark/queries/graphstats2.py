"""Graph-analytics batch 37 (q310-q312): local clustering
coefficients (how clique-like each node's neighborhood is), Jaccard
link prediction (the common-neighbors recommender baseline), and
HITS hubs/authorities on the customer-supplier bipartite graph —
extending the graph family (q86 PageRank, q93 triangles, q234
k-core, q286/q287 degree statistics) with the three classics it was
still missing.

Determinism: triangle/common-neighbor counts are exact integers and
every coefficient is one int/int division rounded at the edge; HITS
unrolls three fixed iterations with 12-dp DECIMAL accumulation so
both engines sum contributions exactly (no double-order drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import load_table

from . import query
from .graphstats import _edges, _edges_sql

# ---------------------------------------------------------------------------
# q310 — local clustering coefficient by degree bucket


@query(
    "q310_clustering_coefficient",
    oracle=f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    tri AS (
      SELECT e1.u AS a, e1.v AS b, e2.v AS c
      FROM edges e1
      JOIN edges e2 ON e2.u = e1.v
      JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    node_tri AS (
      SELECT node, COUNT(*) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    ),
    cc AS (
      SELECT d.node, d.d,
             CAST(COALESCE(nt.t, 0) AS DOUBLE)
               / (d.d * (d.d - 1) / 2.0) AS coef
      FROM deg d LEFT JOIN node_tri nt ON nt.node = d.node
      WHERE d.d >= 2
    )
    SELECT CAST(FLOOR(LOG2(d)) AS INT) AS degree_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           ROUND(AVG(CAST(d AS DOUBLE)), 4) AS avg_degree,
           ROUND(SUM(CAST(ROUND(coef, 9) AS DECIMAL(38,9))) / COUNT(*), 6)
             AS avg_clustering
    FROM cc GROUP BY 1 ORDER BY 1
    """,
)
def q310_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient cc(x) = triangles(x) /
    C(deg(x), 2) over the co-purchase graph, summarized by log2
    degree bucket (the curve network papers plot: does clustering
    decay with degree?). Triangle membership comes from exploding
    the per-edge common-neighbor intersection into (a, b, c) triples
    — output is 3x the triangle count, never the wedge stream — and
    each triple credits all three corners. Scale: the q93 edge
    build (one basket shuffle), adjacency intersect JVM-side, and a
    ~20-row bucket aggregate; coefficients accumulate 9-dp DECIMAL."""
    e = _edges(spark, sf_dir).localCheckpoint()
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    adj = e.groupBy(F.col("u").alias("node")).agg(
        F.collect_list("v").alias("nbrs")
    )
    tri = (
        e.join(adj.select(F.col("node").alias("u"), F.col("nbrs").alias("na")), "u")
        .join(
            adj.select(F.col("node").alias("v"), F.col("nbrs").alias("nb")), "v"
        )
        .select(
            "u",
            "v",
            F.explode(F.array_intersect(F.col("na"), F.col("nb"))).alias("c"),
        )
    )
    node_tri = (
        tri.select(F.col("u").alias("node"))
        .unionByName(tri.select(F.col("v").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("t"))
    )
    cc = (
        deg.filter(F.col("d") >= 2)
        .join(node_tri, "node", "left")
        .select(
            "d",
            (
                F.coalesce(F.col("t"), F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - 1) / 2.0)
            ).alias("coef"),
        )
    )
    return (
        cc.groupBy(F.floor(F.log2("d")).cast("int").alias("degree_bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.round(F.avg(F.col("d").cast("double")), 4).alias("avg_degree"),
            F.round(
                F.sum(F.round("coef", 9).cast("decimal(38,9)"))
                / F.count(F.lit(1)),
                6,
            ).alias("avg_clustering"),
        )
        .orderBy("degree_bucket")
    )


# ---------------------------------------------------------------------------
# q311 — Jaccard link prediction

LINK_TOPK = 20


@query(
    "q311_link_prediction",
    oracle=f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    wedge AS (
      SELECT a.v AS u, b.v AS v, COUNT(*) AS common
      FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
      GROUP BY a.v, b.v
    ),
    nonedge AS (
      SELECT w.u, w.v, w.common FROM wedge w
      LEFT JOIN edges e ON e.u = w.u AND e.v = w.v
      WHERE e.u IS NULL
    )
    SELECT n.u, n.v, CAST(n.common AS BIGINT) AS common_neighbors,
           ROUND(CAST(n.common AS DOUBLE)
                 / (du.d + dv.d - n.common), 6) AS jaccard
    FROM nonedge n
    JOIN deg du ON du.node = n.u
    JOIN deg dv ON dv.node = n.v
    ORDER BY jaccard DESC, n.u, n.v
    LIMIT {LINK_TOPK}
    """,
)
def q311_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard link prediction: for node pairs that share at least
    one neighbor but are NOT connected, score |N(u) ∩ N(v)| /
    |N(u) ∪ N(v)| and return the top-{LINK_TOPK} predicted links —
    the common-neighbors baseline every recommender/graph-ML paper
    benchmarks against. Wedges come from the neighbor-array
    explosion (one groupBy per center node, in-array u<v pairs), so
    the wedge stream is generated map-side; an anti-join removes
    existing edges and two broadcast-size degree lookups finish the
    score. Scale: wedge volume is sum(deg^2) — the documented
    mitigation for hub skew is capping/sampling center-node
    adjacency (q31's LSH band cap pattern)."""
    e = _edges(spark, sf_dir).localCheckpoint()
    und = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    deg = und.groupBy(F.col("u").alias("node")).agg(F.count(F.lit(1)).alias("d"))
    centers = und.groupBy("u").agg(F.sort_array(F.collect_set("v")).alias("ns"))
    wedges = (
        centers.select(
            F.explode(
                F.expr(
                    "flatten(transform(ns, (a, i) -> "
                    "transform(slice(ns, i + 2, size(ns)), "
                    "b -> struct(a AS u, b AS v))))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    nonedge = wedges.join(e, ["u", "v"], "left_anti")
    return (
        nonedge.join(
            deg.select(F.col("node").alias("u"), F.col("d").alias("du")), "u"
        )
        .join(deg.select(F.col("node").alias("v"), F.col("d").alias("dv")), "v")
        .select(
            "u",
            "v",
            F.col("common").cast("bigint").alias("common_neighbors"),
            F.round(
                F.col("common").cast("double")
                / (F.col("du") + F.col("dv") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
        .limit(LINK_TOPK)
    )


# ---------------------------------------------------------------------------
# q312 — HITS hubs & authorities (3 fixed iterations)

_HITS_ROUND = 12
HITS_TOPK = 25


def _hits_oracle() -> str:
    steps = []
    ph, pa = "h0", "a0"
    for it in range(1, 4):
        steps.append(
            f"""
    araw{it} AS (
      SELECT e.s, SUM(h.score) AS raw
      FROM bip e JOIN {ph} h ON h.c = e.c GROUP BY e.s
    ),
    anorm{it} AS (SELECT SUM(raw) AS z FROM araw{it}),
    a{it} AS (
      SELECT s, CAST(ROUND(CAST(raw AS DOUBLE) / CAST(z AS DOUBLE),
                      {_HITS_ROUND}) AS DECIMAL(38,{_HITS_ROUND}))
               AS score
      FROM araw{it}, anorm{it}
    ),
    hraw{it} AS (
      SELECT e.c, SUM(a.score) AS raw
      FROM bip e JOIN a{it} a ON a.s = e.s GROUP BY e.c
    ),
    hnorm{it} AS (SELECT SUM(raw) AS z FROM hraw{it}),
    h{it} AS (
      SELECT c, CAST(ROUND(CAST(raw AS DOUBLE) / CAST(z AS DOUBLE),
                      {_HITS_ROUND}) AS DECIMAL(38,{_HITS_ROUND}))
               AS score
      FROM hraw{it}, hnorm{it}
    )"""
        )
        ph, pa = f"h{it}", f"a{it}"
    return f"""
    WITH bip AS (
      SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS s
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    ),
    h0 AS (
      SELECT c, CAST(1.0 AS DECIMAL(38,{_HITS_ROUND})) AS score
      FROM (SELECT DISTINCT c FROM bip)
    ),
    {",".join(steps)}
    SELECT s AS suppkey, ROUND(CAST(score AS DOUBLE) * 1000, 6)
             AS authority_x1000
    FROM a3
    ORDER BY score DESC, s
    LIMIT {HITS_TOPK}
    """


@query("q312_hits_authorities", oracle=_hits_oracle())
def q312_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS on the customer-supplier bipartite graph (a customer
    'endorses' every supplier they bought from): three fixed
    alternating iterations — authority(s) = sum of hub scores of its
    customers, hub(c) = sum of authority scores of its suppliers,
    L1-normalized each half-step — returning the top-{HITS_TOPK}
    authority suppliers. Kleinberg's algorithm at fixed depth stays
    closed-form for the oracle; scores are rounded to 12 dp into
    DECIMAL after each normalization so both engines accumulate
    exactly. Scale: the edge list is one distinct orderkey join
    (localCheckpoint'd so six vector joins reuse it); each iteration
    shuffles edge-size rows onto node keys — the PageRank (q86)
    cost shape."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    dec = f"decimal(38,{_HITS_ROUND})"
    bip = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_suppkey").alias("s"))
        .distinct()
        .localCheckpoint()
    )
    h = bip.select("c").distinct().select(
        "c", F.lit(1.0).cast(dec).alias("score")
    )
    a = None
    # The hub/authority vectors are node-count-size (tiny next to the
    # edge list): broadcast them into each edge join so the edge list
    # never shuffles for the join (only the per-node aggregate moves
    # data), and checkpoint per iteration so each broadcast build is a
    # one-step plan instead of the whole preceding chain. The RAW
    # aggregate is checkpointed too: the normalizer z and the
    # normalized vector both consume it, and without the checkpoint
    # each half-step ran the edge-sized join+aggregate TWICE (once for
    # the broadcast build of z, once for the vector) — guide §2.4.
    for _ in range(3):
        araw = (
            bip.join(F.broadcast(h.select(F.col("c"), F.col("score"))), "c")
            .groupBy("s")
            .agg(F.sum("score").alias("raw"))
            .localCheckpoint()
        )
        az = araw.agg(F.sum("raw").alias("z"))
        a = (
            araw.join(F.broadcast(az))
            .select(
                "s",
                F.round(
                    F.col("raw").cast("double") / F.col("z").cast("double"),
                    _HITS_ROUND,
                )
                .cast(dec)
                .alias("score"),
            )
            .localCheckpoint()
        )
        hraw = (
            bip.join(F.broadcast(a.select("s", "score")), "s")
            .groupBy("c")
            .agg(F.sum("score").alias("raw"))
            .localCheckpoint()
        )
        hz = hraw.agg(F.sum("raw").alias("z"))
        h = (
            hraw.join(F.broadcast(hz))
            .select(
                "c",
                F.round(
                    F.col("raw").cast("double") / F.col("z").cast("double"),
                    _HITS_ROUND,
                )
                .cast(dec)
                .alias("score"),
            )
            .localCheckpoint()
        )
    return (
        a.orderBy(F.col("score").desc(), "s")
        .limit(HITS_TOPK)
        .select(
            F.col("s").alias("suppkey"),
            F.round(F.col("score").cast("double") * 1000, 6).alias(
                "authority_x1000"
            ),
        )
    )
