"""Graph-statistics batch 27 (q286-q287): degree-distribution
power-law fit (the discrete MLE alpha-hat every network analysis
reports) and degree assortativity (do high-degree nodes attach to
each other?) — the two summary statistics that characterize a graph
before any algorithm runs, computed over the co-purchase graph that
q259/q267 walk.

Determinism: degrees are exact integers; ln terms round at 7 dp into
DECIMAL sums (DETERMINISM.md §5); the assortativity Pearson assembles
once from exact integer moments, straight-line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


def _edges_sql(alias: str = "edges") -> str:
    return f"""
    {alias} AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY u, v
    )"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct u<v co-purchase pairs via the q267 no-self-join shape:
    one orderkey shuffle to sorted item sets, map-side pair explosion,
    one distinct — the join formulation costs two fact scans plus an
    extra exchange per side."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
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


# ---------------------------------------------------------------------------
# q286 — power-law degree fit


@query(
    "q286_degree_powerlaw",
    oracle=f"""
    WITH {_edges_sql()},
    degrees AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    terms AS (
      SELECT deg,
             CAST(ROUND(ln(deg / 0.5), 7) AS DECIMAL(38,7)) AS ln_term
      FROM degrees WHERE deg >= 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(deg) AS BIGINT) AS d_min,
           CAST(MAX(deg) AS BIGINT) AS d_max,
           ROUND(1.0 + COUNT(*) / CAST(SUM(ln_term) AS DOUBLE), 6) AS alpha_hat
    FROM terms
    """,
)
def q286_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete power-law MLE for the degree distribution (Clauset,
    Shalizi & Newman 2009): alpha-hat = 1 + n / Σ ln(d_i / (d_min -
    1/2)) with d_min = 1 — the one-number heavy-tail summary every
    network study reports before trusting averages. The ln terms
    round at 7 dp into a DECIMAL sum; the output is one assembled
    double.

    Plan: the edge list builds via the q267 no-self-join shape (one
    orderkey shuffle to basket arrays, map-side pair explosion, one
    distinct); degrees are a union-of-projections aggregate on
    the node key; the fit is a single-row moment aggregate — nothing
    after the degree shuffle is bigger than the node set."""
    edges = _edges(spark, sf_dir)
    nodes = edges.select(F.col("u").alias("node")).unionByName(
        edges.select(F.col("v").alias("node"))
    )
    degrees = nodes.groupBy("node").agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
    terms = degrees.filter(F.col("deg") >= 1).select(
        "deg",
        F.round(F.log(F.col("deg") / 0.5), 7).cast("decimal(38,7)").alias("ln_term"),
    )
    return terms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.min("deg").cast("bigint").alias("d_min"),
        F.max("deg").cast("bigint").alias("d_max"),
        F.round(
            1.0 + F.count(F.lit(1)) / F.sum("ln_term").cast("double"), 6
        ).alias("alpha_hat"),
    )


# ---------------------------------------------------------------------------
# q287 — degree assortativity


@query(
    "q287_degree_assortativity",
    oracle=f"""
    WITH {_edges_sql()},
    degrees AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
      ) GROUP BY node
    ),
    endpoint_degs AS (
      SELECT du.deg AS x, dv.deg AS y
      FROM edges e
      JOIN degrees du ON du.node = e.u
      JOIN degrees dv ON dv.node = e.v
    ),
    sym AS (
      SELECT x, y FROM endpoint_degs
      UNION ALL
      SELECT y AS x, x AS y FROM endpoint_degs
    ),
    mom AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
      FROM sym
    )
    SELECT m AS n_directed_edges,
           ROUND((CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / NULLIF(sqrt(CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                          * sqrt(CAST(m AS DOUBLE) * CAST(syy AS DOUBLE)
                                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0.0),
                 6) AS assortativity
    FROM mom
    """,
)
def q287_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees over all edges, symmetrized (each undirected
    edge contributes both orientations, the standard convention) —
    positive means hubs attach to hubs (social-network-like),
    negative means hub-and-spoke (infrastructure-like). All moments
    are exact integers; the coefficient assembles once.

    Plan: edge list + degree table as in q286; the endpoint-degree
    join broadcasts the (bounded, node-sized) degree table onto the
    edge list twice; one single-row moment aggregate finishes."""
    edges = _edges(spark, sf_dir)
    nodes = edges.select(F.col("u").alias("node")).unionByName(
        edges.select(F.col("v").alias("node"))
    )
    # r10 P3 staging: the degree table (node-bounded) was re-derived —
    # and with it the whole basket-explode edge pipeline — under every
    # downstream reference (10 duplicate lineitem scans in the static
    # plan); checkpoint it once
    degrees = (
        nodes.groupBy("node")
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .localCheckpoint(eager=True)
    )
    du = degrees.select(F.col("node").alias("u"), F.col("deg").alias("x"))
    dv = degrees.select(F.col("node").alias("v"), F.col("deg").alias("y"))
    ep = edges.join(F.broadcast(du), "u").join(F.broadcast(dv), "v").select("x", "y")
    # symmetrization by moment algebra instead of a self-union (one ep
    # pass, not two): for sym = ep UNION ALL swap(ep), m = 2*cnt,
    # sx = sy = sum x + sum y, sxx = syy = sum x^2 + sum y^2,
    # sxy = 2*sum xy — all exact BIGINT identities
    em = ep.agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("x").alias("ex"),
        F.sum("y").alias("ey"),
        F.sum(F.col("x") * F.col("x")).alias("exx"),
        F.sum(F.col("y") * F.col("y")).alias("eyy"),
        F.sum(F.col("x") * F.col("y")).alias("exy"),
    )
    mom = em.select(
        (F.col("cnt") * 2).cast("bigint").alias("m"),
        (F.col("ex") + F.col("ey")).alias("sx"),
        (F.col("ex") + F.col("ey")).alias("sy"),
        (F.col("exx") + F.col("eyy")).alias("sxx"),
        (F.col("exx") + F.col("eyy")).alias("syy"),
        (F.col("exy") * 2).alias("sxy"),
    )
    md = F.col("m").cast("double")
    num = md * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    den = F.nullif(
        F.sqrt(
            md * F.col("sxx").cast("double")
            - F.col("sx").cast("double") * F.col("sx").cast("double")
        )
        * F.sqrt(
            md * F.col("syy").cast("double")
            - F.col("sy").cast("double") * F.col("sy").cast("double")
        ),
        F.lit(0.0),
    )
    return mom.select(
        F.col("m").alias("n_directed_edges"),
        F.round(num / den, 6).alias("assortativity"),
    )
