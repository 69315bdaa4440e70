"""Graph link-prediction batch 64 (q385-q390) over the co-purchase
graph (the q93/q310 edge build: distinct u<v part pairs sharing an
order). Completes the link-prediction family started by q311 (common
neighbors / Jaccard) with the other two classic scores and the
structural audits around them:

- q385 Adamic-Adar: common neighbors weighted 1/ln(deg) — the score
  that discounts promiscuous hubs (Adamic & Adar 2003);
- q386 preferential attachment: deg(u)*deg(v) on the same wedge
  candidate set — the degree-driven baseline every LP paper reports;
- q387 label propagation communities: 3 synchronous min-label rounds,
  community-size histogram — the cheap community detector (Raghavan
  2007, made deterministic by the min-label update);
- q388 rich-club coefficient over a degree-threshold grid — do high-
  degree nodes preferentially interconnect (Colizza 2006);
- q389 triadic closure rate: the share of "late" edges (odd orderkey
  phase) that close a wedge already present in the "early" phase —
  the temporal closure test behind link prediction's premise;
- q390 two-hop reach distribution: |N2(v)| histogram — the
  neighborhood-growth profile that sizes ANY 2-hop algorithm (and the
  candidate volume q311/q385 will generate).

Determinism: all counting integer; Adamic-Adar weights round to 9 dp
and accumulate in DECIMAL (order-free); ln(deg) is the same IEEE
expression on both engines.

100 TB shapes: every pair enumeration goes through per-hub adjacency
explosion (never a corpus self-join — the q267/q310 basket shape);
wedges through a hub z cost deg(z)^2, the structural skew guard being
the degree cap a production run adds; rollups are bounded (grid rows,
log2 buckets, community sizes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import query
from .graphstats import _edges, _edges_sql

AA_TOPK = 20
LP_ROUNDS = 3
RICH_KS = [1, 2, 4, 8, 16]


def _und(e: DataFrame) -> DataFrame:
    return e.unionByName(
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )


# ---------------------------------------------------------------------------
# q385 — Adamic-Adar


def _aa_oracle() -> str:
    return f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    wedge AS (
      SELECT a.v AS u, b.v AS v, a.u AS z
      FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
    ),
    scored AS (
      SELECT w.u, w.v,
             CAST(COUNT(*) AS BIGINT) AS common_neighbors,
             SUM(CAST(ROUND(1.0 / LN(dz.d), 9) AS DECIMAL(38,9))) AS aa
      FROM wedge w JOIN deg dz ON dz.node = w.z
      GROUP BY w.u, w.v
    ),
    nonedge AS (
      SELECT s.* FROM scored s
      LEFT JOIN edges e ON e.u = s.u AND e.v = s.v
      WHERE e.u IS NULL
    )
    SELECT u, v, common_neighbors,
           ROUND(CAST(aa AS DOUBLE), 6) AS adamic_adar
    FROM nonedge
    ORDER BY adamic_adar DESC, u, v LIMIT {AA_TOPK}
    """


@query("q385_adamic_adar", oracle=_aa_oracle())
def q385_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction: for non-adjacent candidate pairs
    (wedge-connected, the only pairs with a nonzero score), AA(u,v) =
    sum over common neighbors z of 1/ln(deg(z)) — common-neighbor
    evidence discounted by hub promiscuity. Spark enumerates wedges by
    exploding each hub's sorted adjacency list (u<v pairs map-side, the
    q310 shape — never a corpus self-join); weights round to 9 dp and
    accumulate in DECIMAL so partial-agg order cannot drift the hash.
    Scale: wedge volume is sum deg(z)^2 — bounded in practice by a
    degree cap on hubs; candidate filtering is one anti-join."""
    e = _edges(spark, sf_dir).localCheckpoint()
    und = _und(e)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    adj = und.groupBy(F.col("u").alias("z")).agg(
        F.sort_array(F.collect_set("v")).alias("nbrs"),
        F.count(F.lit(1)).alias("dz"),
    )
    idx = F.sequence(F.lit(0), F.size("nbrs") - 1)
    wedges = adj.select(
        F.round(1.0 / F.log(F.col("dz").cast("double")), 9)
        .cast("decimal(38,9)")
        .alias("w"),
        F.explode(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.slice(F.col("nbrs"), i + 2, F.size("nbrs")),
                        lambda y: F.struct(
                            F.element_at(F.col("nbrs"), i + 1).alias("u"),
                            y.alias("v"),
                        ),
                    ),
                )
            )
        ).alias("p"),
    ).select(F.col("p.u").alias("u"), F.col("p.v").alias("v"), "w")
    scored = wedges.groupBy("u", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("common_neighbors"),
        F.sum("w").alias("aa"),
    )
    nonedge = scored.join(e, ["u", "v"], "left_anti")
    _ = deg  # deg folded into adj (dz); kept for plan-shape parity docs
    return (
        nonedge.select(
            "u",
            "v",
            "common_neighbors",
            F.round(F.col("aa").cast("double"), 6).alias("adamic_adar"),
        )
        .orderBy(F.desc("adamic_adar"), "u", "v")
        .limit(AA_TOPK)
    )


# ---------------------------------------------------------------------------
# q386 — preferential attachment on the wedge candidate set


def _pa_oracle() -> str:
    return f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    wedge AS (
      SELECT DISTINCT a.v AS u, b.v AS v
      FROM und a JOIN und b ON a.u = b.u AND a.v < b.v
    ),
    nonedge AS (
      SELECT w.u, w.v FROM wedge w
      LEFT JOIN edges e ON e.u = w.u AND e.v = w.v
      WHERE e.u IS NULL
    )
    SELECT n.u, n.v,
           CAST(du.d AS BIGINT) AS deg_u, CAST(dv.d AS BIGINT) AS deg_v,
           CAST(du.d * dv.d AS BIGINT) AS pa_score
    FROM nonedge n
    JOIN deg du ON du.node = n.u JOIN deg dv ON dv.node = n.v
    ORDER BY pa_score DESC, n.u, n.v LIMIT {AA_TOPK}
    """


@query("q386_preferential_attachment", oracle=_pa_oracle())
def q386_preferential_attachment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preferential-attachment link score deg(u)*deg(v) on the SAME
    wedge-connected candidate set as q385/q311 — the degree-only
    baseline a link-prediction eval reports next to AA and Jaccard
    (scoring ALL non-adjacent pairs is n² and pointless; 2-hop
    candidates are where real systems rank). Pure integer counting.
    Scale: same wedge explosion as q385; degree joins are against a
    node-count-sized table."""
    e = _edges(spark, sf_dir).localCheckpoint()
    und = _und(e)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("d")
    )
    adj = und.groupBy(F.col("u").alias("z")).agg(
        F.sort_array(F.collect_set("v")).alias("nbrs")
    )
    idx = F.sequence(F.lit(0), F.size("nbrs") - 1)
    wedge = (
        adj.select(
            F.explode(
                F.flatten(
                    F.transform(
                        idx,
                        lambda i: F.transform(
                            F.slice(F.col("nbrs"), i + 2, F.size("nbrs")),
                            lambda y: F.struct(
                                F.element_at(F.col("nbrs"), i + 1).alias("u"),
                                y.alias("v"),
                            ),
                        ),
                    )
                )
            ).alias("p")
        )
        .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
        .distinct()
    )
    nonedge = wedge.join(e, ["u", "v"], "left_anti")
    return (
        nonedge.join(deg.withColumnRenamed("node", "u").withColumnRenamed("d", "deg_u"), "u")
        .join(deg.withColumnRenamed("node", "v").withColumnRenamed("d", "deg_v"), "v")
        .select(
            "u",
            "v",
            "deg_u",
            "deg_v",
            (F.col("deg_u") * F.col("deg_v")).cast("bigint").alias("pa_score"),
        )
        .orderBy(F.desc("pa_score"), "u", "v")
        .limit(AA_TOPK)
    )


# ---------------------------------------------------------------------------
# q387 — label propagation communities (min-label, synchronous)


def _lp_oracle() -> str:
    # LP_ROUNDS unrolled synchronous min-label rounds:
    # l_{t+1}(v) = min(l_t(v), min over neighbors l_t(n)).
    rounds = []
    prev = "l0"
    for r in range(1, LP_ROUNDS + 1):
        rounds.append(
            f"""l{r} AS (
      SELECT n.node, LEAST(n.lbl, COALESCE(m.nl, n.lbl)) AS lbl
      FROM {prev} n LEFT JOIN (
        SELECT u.u AS node, MIN(p.lbl) AS nl
        FROM und u JOIN {prev} p ON p.node = u.v GROUP BY u.u
      ) m ON m.node = n.node
    )"""
        )
        prev = f"l{r}"
    return f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM und),
    {', '.join(rounds)},
    comm AS (
      SELECT lbl, COUNT(*) AS sz FROM {prev} GROUP BY lbl
    )
    SELECT CAST(sz AS BIGINT) AS community_size,
           CAST(COUNT(*) AS BIGINT) AS n_communities
    FROM comm GROUP BY sz ORDER BY sz
    """


@query("q387_label_propagation", oracle=_lp_oracle())
def q387_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous min-label propagation,
    {LP_ROUNDS} fixed rounds: every node adopts the minimum of its own
    and its neighbors' labels — the deterministic variant of Raghavan's
    LPA (frequency-vote LPA is tie-unstable across engines; min-label
    converges toward connected components but the FIXED round count
    reports community structure at radius {LP_ROUNDS}). Output is the
    community-size histogram. Scale: each round is one edge join +
    node-keyed min aggregate against a localCheckpointed label table —
    the bounded-rounds pattern (vs q51's run-to-convergence CC)."""
    e = _edges(spark, sf_dir).localCheckpoint()
    # The edge list is the only big table here; the label vector is
    # node-count-sized (the q312 hub/authority precedent). Partition
    # the symmetric edge list by the aggregate key ONCE and checkpoint
    # it, then each round: broadcast the labels onto the edges (map-side
    # lookup, no edge shuffle) and aggregate the neighbor-min WITHOUT
    # an Exchange (the checkpoint preserves the hash partitioning on
    # u). The previous loop re-shuffled edge-sized rows twice per
    # round (guide §2.1/§3.1).
    und = _und(e).repartition("u").localCheckpoint()
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    ).localCheckpoint()
    for _ in range(LP_ROUNDS):
        nbr_min = (
            und.join(
                F.broadcast(
                    labels.select(
                        F.col("node").alias("v"), F.col("lbl").alias("nl")
                    )
                ),
                "v",
            )
            .groupBy(F.col("u").alias("node"))
            .agg(F.min("nl").alias("nl"))
        )
        # inner join is exact here: every node appears as `u` in the
        # symmetric edge list, so nbr_min covers every labeled node
        # and COALESCE(nl, lbl) can never see a NULL.
        labels = (
            labels.join(nbr_min, "node")
            .select(
                "node",
                F.least(F.col("lbl"), F.col("nl")).alias("lbl"),
            )
            .localCheckpoint()
        )
    comm = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("sz"))
    return (
        comm.groupBy(F.col("sz").cast("bigint").alias("community_size"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_communities"))
        .orderBy("community_size")
    )


# ---------------------------------------------------------------------------
# q388 — rich-club coefficient


def _rich_oracle() -> str:
    ks = ", ".join(str(k) for k in RICH_KS)
    return f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    deg AS (SELECT u AS node, COUNT(*) AS d FROM und GROUP BY u),
    grid AS (SELECT unnest([{ks}]) AS k),
    club AS (
      SELECT g.k, CAST(COUNT(*) AS BIGINT) AS n_k
      FROM grid g JOIN deg ON deg.d > g.k GROUP BY g.k
    ),
    club_edges AS (
      SELECT g.k, CAST(COUNT(*) AS BIGINT) AS e_k
      FROM grid g
      JOIN edges e ON 1 = 1
      JOIN deg du ON du.node = e.u AND du.d > g.k
      JOIN deg dv ON dv.node = e.v AND dv.d > g.k
      GROUP BY g.k
    )
    SELECT c.k, c.n_k, COALESCE(ce.e_k, 0) AS e_k,
           ROUND(2.0 * COALESCE(ce.e_k, 0)
                 / NULLIF(CAST(c.n_k AS DOUBLE) * (c.n_k - 1), 0), 6)
             AS phi
    FROM club c LEFT JOIN club_edges ce ON ce.k = c.k
    ORDER BY c.k
    """


@query("q388_rich_club", oracle=_rich_oracle())
def q388_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient phi(k) = 2*E_k / (N_k (N_k - 1)) over a
    degree-threshold grid: among nodes of degree > k, what fraction of
    possible edges exist — the does-the-core-interconnect audit
    (Colizza 2006). Spark broadcasts the degree table onto the edge
    list once and aggregates all grid rows from a single conditional
    explode (one edge scan for the whole grid). Integer counts; one
    terminal division."""
    e = _edges(spark, sf_dir).localCheckpoint()
    und = _und(e)
    deg = und.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    grid = F.array(*[F.lit(k) for k in RICH_KS])
    club = (
        deg.select(
            F.explode(F.filter(grid, lambda k: F.col("d") > k)).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_k"))
    )
    ed = (
        e.join(F.broadcast(deg.selectExpr("node AS u", "d AS du")), "u")
        .join(F.broadcast(deg.selectExpr("node AS v", "d AS dv")), "v")
        .select(
            F.explode(
                F.filter(grid, lambda k: (F.col("du") > k) & (F.col("dv") > k))
            ).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_k"))
    )
    return (
        club.join(ed, "k", "left")
        .select(
            "k",
            "n_k",
            F.coalesce(F.col("e_k"), F.lit(0)).alias("e_k"),
            F.round(
                2.0
                * F.coalesce(F.col("e_k"), F.lit(0))
                / F.nullif(
                    F.col("n_k").cast("double") * (F.col("n_k") - 1), F.lit(0.0)
                ),
                6,
            ).alias("phi"),
        )
        .orderBy("k")
    )


# ---------------------------------------------------------------------------
# q389 — triadic closure rate (temporal)


def _triadic_oracle() -> str:
    return """
    WITH early AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 2 = 0) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 2 = 0) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY u, v
    ),
    late AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 2 = 1) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
            WHERE l_orderkey % 2 = 1) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY u, v
    ),
    new_edges AS (
      SELECT l.u, l.v FROM late l
      LEFT JOIN early e ON e.u = l.u AND e.v = l.v
      WHERE e.u IS NULL
    ),
    eund AS (
      SELECT u, v FROM early UNION ALL SELECT v, u FROM early
    ),
    closing AS (
      SELECT DISTINCT n.u, n.v
      FROM new_edges n
      JOIN eund a ON a.u = n.u
      JOIN eund b ON b.u = n.v AND b.v = a.v
    )
    SELECT CAST((SELECT COUNT(*) FROM new_edges) AS BIGINT) AS n_new_edges,
           CAST((SELECT COUNT(*) FROM closing) AS BIGINT) AS n_closing,
           ROUND(CAST((SELECT COUNT(*) FROM closing) AS DOUBLE)
                 / NULLIF((SELECT COUNT(*) FROM new_edges), 0), 6)
             AS closure_rate
    """


@query("q389_triadic_closure", oracle=_triadic_oracle())
def q389_triadic_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal triadic closure: split orders into an early and a late
    phase (orderkey parity — deterministic), and measure what share of
    edges NEW in the late phase close a wedge that already existed in
    the early phase — the empirical premise of every common-neighbor
    link predictor (if closure rate were ~0, q311/q385 would rank
    noise). Spark intersects the new edge's endpoints' early adjacency
    lists JVM-side (the q310 triangle shape). Integer counts; one
    division."""
    from flightdb_spark.tables import ensure_parallelism, load_table

    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))

    def phase_edges(par: int) -> DataFrame:
        baskets = (
            li.filter(F.col("l_orderkey") % 2 == par)
            .groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_set("l_partkey")).alias("items"))
        )
        idx = F.sequence(F.lit(0), F.size("items") - 1)
        return (
            baskets.select(
                F.explode(
                    F.flatten(
                        F.transform(
                            idx,
                            lambda i: F.transform(
                                F.slice(F.col("items"), i + 2, F.size("items")),
                                lambda y: F.struct(
                                    F.element_at(F.col("items"), i + 1).alias("u"),
                                    y.alias("v"),
                                ),
                            ),
                        )
                    )
                ).alias("p")
            )
            .select(F.col("p.u").alias("u"), F.col("p.v").alias("v"))
            .distinct()
        )

    early = phase_edges(0).localCheckpoint()
    late = phase_edges(1)
    new_edges = late.join(early, ["u", "v"], "left_anti").localCheckpoint()
    eund = _und(early)
    adj = eund.groupBy(F.col("u").alias("node")).agg(
        F.collect_set("v").alias("nbrs")
    )
    closing = (
        new_edges.join(adj.selectExpr("node AS u", "nbrs AS na"), "u")
        .join(adj.selectExpr("node AS v", "nbrs AS nb"), "v")
        .filter(F.size(F.array_intersect("na", "nb")) > 0)
        .select("u", "v")
        .distinct()
    )
    n_new = new_edges.agg(F.count(F.lit(1)).cast("bigint").alias("n_new_edges"))
    n_close = closing.agg(F.count(F.lit(1)).cast("bigint").alias("n_closing"))
    return (
        n_new.crossJoin(F.broadcast(n_close))
        .select(
            "n_new_edges",
            "n_closing",
            F.round(
                F.col("n_closing").cast("double")
                / F.nullif(F.col("n_new_edges"), F.lit(0)),
                6,
            ).alias("closure_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q390 — two-hop reach distribution


def _twohop_oracle() -> str:
    return f"""
    WITH {_edges_sql()},
    und AS (
      SELECT u, v FROM edges UNION ALL SELECT v AS u, u AS v FROM edges
    ),
    two AS (
      SELECT a.u, b.v AS w FROM und a JOIN und b ON b.u = a.v
      WHERE b.v <> a.u
      UNION
      SELECT u, v AS w FROM und
    ),
    reach AS (SELECT u, COUNT(*) AS r FROM two GROUP BY u)
    SELECT CAST(FLOOR(LOG2(r)) AS INT) AS reach_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(r) AS BIGINT) AS min_reach,
           CAST(MAX(r) AS BIGINT) AS max_reach
    FROM reach GROUP BY 1 ORDER BY 1
    """


@query("q390_two_hop_reach", oracle=_twohop_oracle())
def q390_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach |N<=2(v)| per node (distinct nodes within distance
    <= 2, self excluded), summarized by log2 bucket — the neighborhood
    growth profile that predicts the candidate volume of any 2-hop
    algorithm on this graph (q311/q385/q386) and flags densification.
    The UNION dedups (1-hop + 2-hop) exactly. Scale: one edge-edge
    equi-join + distinct + node-keyed count; bucket rollup bounded."""
    e = _edges(spark, sf_dir).localCheckpoint()
    und = _und(e)
    two = (
        und.select(F.col("u"), F.col("v").alias("m"))
        .join(und.select(F.col("u").alias("m"), F.col("v").alias("w")), "m")
        .filter(F.col("w") != F.col("u"))
        .select("u", "w")
        .union(und.select("u", F.col("v").alias("w")))
        .distinct()
    )
    reach = two.groupBy("u").agg(F.count(F.lit(1)).alias("r"))
    return (
        reach.groupBy(
            F.floor(F.log2("r")).cast("int").alias("reach_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.min("r").cast("bigint").alias("min_reach"),
            F.max("r").cast("bigint").alias("max_reach"),
        )
        .orderBy("reach_bucket")
    )
