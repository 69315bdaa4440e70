"""Recursive-SQL batch 90 (q516-q520) — Spark 4's WITH RECURSIVE
surface, oracle-checked against DuckDB's (both engines run the same
recursion semantics; every recursion here is depth-bounded and
integer-deterministic). Hierarchies are synthesized from the TPC-H
keys (child -> parent = key div k), the standard trick for exercising
hierarchical SQL on flat data:

- q516 hierarchy depths: customer tree (parent = custkey div 2),
  recursive depth per node -> depth histogram + max depth;
- q517 BOM rollup: part quad-tree (parent = partkey div 4), subtree
  retail-price rollup per root — the bill-of-materials aggregate;
- q518 bounded reachability: 3-hop BFS from one part through the
  part<->supplier edge list, (min_depth, nodes) per level — the
  recursive twin of q198's iterative DataFrame BFS (parity asserted
  in tests);
- q519 calendar spine: recursively generated 1995-2001 month spine
  left-joined to monthly revenue — gap months and the longest gap
  run (the spine pattern that outer-joins away survivorship bias);
- q520 materialized paths: root-to-node path strings for the first
  customers — the adjacency-list -> path-column conversion.

Determinism: all recursion state is integers (keys, depths, cents)
or deterministic string concatenation; every recursion carries an
explicit depth guard; BFS dedups per level and collapses to
MIN(depth) post-recursion (UNION ALL recursion never needs
cross-level visited state to be deterministic — only bounded).

100 TB shapes: recursive CTEs iterate like the repo's unrolled
fits — one equi-join per level on the child key; depth caps bound
the work. The BFS fan-out note: per-level DISTINCT keeps frontier
rows, not paths (the q198 lesson); at true scale prefer the
iterative checkpointed loop (operators/, q198) — this batch is the
SQL-surface parity proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flightdb_spark.tables import ensure_parallelism, load_table

from . import query

MAX_DEPTH = 24
BFS_DEPTH = 3
SPINE_MONTHS = 80  # 1995-01 .. 2001-08


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        ensure_parallelism(load_table(spark, sf_dir, n)).createOrReplaceTempView(n)


LOOP_BCAST_ROWS = 3_000_000  # ~48 MB of (long, double) — well under the cap


def _loop_side_view(
    spark: SparkSession, sf_dir: str, table: str, cols: list[str]
) -> str:
    """Materialize the recursion's STATIC side once (narrow projection +
    localCheckpoint), registered under the table's own name so the
    recursive SQL text is unchanged. Spark's UnionLoop re-executes the
    loop body every iteration, so without this each of the <=24 rounds
    re-scans the parquet table AND re-runs ensure_parallelism's
    round-robin repartition (guide §2.4/§5: q516's before plan shows
    Repartition(32) inside the loop —
    plans/r09/q516_hierarchy_depths_before.txt). After the checkpoint
    each round joins a narrow in-memory table.

    Returns the join hint for the recursive member: when the static
    side fits (plan-shaping eager count over the checkpoint — the q93
    gate pattern), broadcasting it lets every round run a broadcast
    hash join with the exchange reused across iterations (measured 2.7
    -> 2.1 s warm / 6.0 -> 2.4 s cold on q516's shape at sf0.1);
    above the gate the rounds keep the shuffle join."""
    df = load_table(spark, sf_dir, table).select(*cols).localCheckpoint(eager=True)
    df.createOrReplaceTempView(table)
    return "/*+ BROADCAST(c) */ " if df.count() <= LOOP_BCAST_ROWS else ""


def _idiv(dialect: str, a: str, b: str) -> str:
    return f"({a} div {b})" if dialect == "spark" else f"({a} // {b})"


# ---------------------------------------------------------------------------
# q516 — hierarchy depths


def _depths_sql(dialect: str, hint: str = "") -> str:
    return f"""
    WITH RECURSIVE tree(node, depth) AS (
      SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      UNION ALL
      SELECT {hint}c.c_custkey, t.depth + 1
      FROM customer c JOIN tree t
        ON {_idiv(dialect, "c.c_custkey", "2")} = t.node
       AND c.c_custkey > 1
      WHERE t.depth < {MAX_DEPTH}
    )
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM tree GROUP BY depth
    """


@query("q516_hierarchy_depths", oracle=_depths_sql("duck"))
def q516_hierarchy_depths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE depth labeling of the synthesized customer
    binary tree (parent = custkey div 2): one row per depth with node
    counts — the org-chart / category-tree walk, on Spark 4's native
    recursive CTE, hash-checked against DuckDB's. Each level is one
    equi-join on the computed parent key; the tree depth (~log2 N)
    bounds the iterations, with an explicit depth guard."""
    hint = _loop_side_view(spark, sf_dir, "customer", ["c_custkey"])
    return spark.sql(_depths_sql("spark", hint))


# ---------------------------------------------------------------------------
# q517 — BOM rollup


def _bom_sql(dialect: str, hint: str = "") -> str:
    cents = "CAST(FLOOR(p.p_retailprice * 100 + CAST(0.5 AS DOUBLE)) AS BIGINT)"
    hint = hint.replace("BROADCAST(c)", "BROADCAST(p)")
    return f"""
    WITH RECURSIVE bom(node, root, depth) AS (
      SELECT CAST(p_partkey AS BIGINT), CAST(p_partkey AS BIGINT), 0
      FROM part WHERE p_partkey <= 3
      UNION ALL
      SELECT {hint}CAST(p.p_partkey AS BIGINT), b.root, b.depth + 1
      FROM part p JOIN bom b
        ON {_idiv(dialect, "p.p_partkey", "4")} = b.node
       AND p.p_partkey > 3
      WHERE b.depth < {MAX_DEPTH}
    )
    SELECT b.root AS root_part,
           CAST(COUNT(*) AS BIGINT) AS subtree_parts,
           CAST(MAX(b.depth) AS BIGINT) AS max_depth,
           CAST(SUM({cents}) AS BIGINT) AS subtree_price_cents
    FROM bom b JOIN part p ON p.p_partkey = b.node
    GROUP BY b.root
    """


@query("q517_bom_rollup", oracle=_bom_sql("duck"))
def q517_bom_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bill-of-materials rollup on the synthesized part quad-tree
    (parent = partkey div 4, roots 1-3): recursive subtree expansion
    carrying the root id down, then one aggregate — subtree part
    counts, depth, and total retail price in exact integer cents.
    The assembly-cost query every manufacturing schema runs, as a
    recursive CTE both engines execute identically."""
    hint = _loop_side_view(spark, sf_dir, "part", ["p_partkey", "p_retailprice"])
    return spark.sql(_bom_sql("spark", hint))


# ---------------------------------------------------------------------------
# q518 — bounded BFS reachability


_BFS_EDGES_VIEW = "rec_bfs_edges_mv"


def _bfs_sql(dialect: str) -> str:
    """`edges_src` names the edge source: the oracle keeps the full
    e0/edges CTE chain; the Spark side reads the checkpointed edge view
    (the loop body re-evaluates its static side per iteration, so the
    un-materialized form re-ran the DISTINCT lineitem aggregate every
    BFS round)."""
    if dialect == "spark":
        edges_src = _BFS_EDGES_VIEW
        pre = "WITH RECURSIVE"
    else:
        edges_src = "edges"
        pre = f"""WITH RECURSIVE
    e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    ),
    edges AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),"""
    return f"""
    {pre}
    bfs(node, depth) AS (
      SELECT CAST(2 AS BIGINT), 0
      UNION ALL
      SELECT DISTINCT e.dst, b.depth + 1
      FROM {edges_src} e JOIN bfs b ON e.src = b.node
      WHERE b.depth < {BFS_DEPTH}
    ),
    firsts AS (
      SELECT node, CAST(MIN(depth) AS BIGINT) AS min_depth
      FROM bfs GROUP BY node
    )
    SELECT min_depth, CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM firsts GROUP BY min_depth
    """


def _bfs_edges_view(spark: SparkSession, sf_dir: str) -> None:
    """ONE DISTINCT lineitem aggregate -> checkpointed symmetric edge
    list for the recursive BFS."""
    _views(spark, sf_dir, "lineitem")
    edges = spark.sql(
        """WITH e0 AS (
      SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM lineitem
    )
    SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0"""
    )
    edges.localCheckpoint(eager=True).createOrReplaceTempView(_BFS_EDGES_VIEW)


@query("q518_bounded_reachability", oracle=_bfs_sql("duck"))
def q518_bounded_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop BFS from part #1 through the part<->supplier graph as a
    recursive CTE: per-level DISTINCT frontier (rows stay nodes, not
    paths), then MIN(depth) per node post-recursion — the recursive-
    SQL twin of q198's iterative DataFrame BFS. Depth-capped by the
    WHERE guard; at true scale the checkpointed iterative loop (q198)
    is the production shape — this is the parity proof."""
    _bfs_edges_view(spark, sf_dir)
    return spark.sql(_bfs_sql("spark"))


# ---------------------------------------------------------------------------
# q519 — recursive calendar spine


def _spine_sql(dialect: str) -> str:
    m = "(year(o_orderdate) * 12 + month(o_orderdate) - 1)"
    base = 1995 * 12
    return f"""
    WITH RECURSIVE spine(m) AS (
      SELECT 0
      UNION ALL
      SELECT m + 1 FROM spine WHERE m < {SPINE_MONTHS - 1}
    ),
    monthly AS (
      SELECT {m} - {base} AS m,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY {m} - {base}
    ),
    joined AS (
      SELECT s.m, COALESCE(mo.n_orders, 0) AS n_orders
      FROM spine s LEFT JOIN monthly mo ON mo.m = s.m
    ),
    gaps AS (
      SELECT m, m - ROW_NUMBER() OVER (ORDER BY m) AS grp
      FROM joined WHERE n_orders = 0
    ),
    runs AS (SELECT CAST(COUNT(*) AS BIGINT) AS len FROM gaps GROUP BY grp)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM joined) AS n_months,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM joined WHERE n_orders = 0)
             AS n_gap_months,
           COALESCE(MAX(len), 0) AS longest_gap_run
    FROM runs
    """


@query("q519_calendar_spine", oracle=_spine_sql("duck"))
def q519_calendar_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive calendar spine: generate every month of 1995-2001
    with WITH RECURSIVE, LEFT JOIN the monthly order counts, and
    report gap months + the longest zero-order run (gaps-and-islands
    over the 80-row spine) — the outer-join-against-a-spine pattern
    that keeps empty periods visible in trend queries. Spine
    generation is pure recursion; windows run over the bounded
    spine."""
    _views(spark, sf_dir, "orders")
    return spark.sql(_spine_sql("spark"))


# ---------------------------------------------------------------------------
# q520 — materialized paths


def _paths_sql(dialect: str, hint: str = "") -> str:
    str_t = "STRING" if dialect == "spark" else "VARCHAR"
    return f"""
    WITH RECURSIVE paths(node, path, depth) AS (
      SELECT CAST(1 AS BIGINT), CAST('1' AS {str_t}), 0
      UNION ALL
      SELECT {hint}c.c_custkey,
             p.path || '/' || CAST(c.c_custkey AS {str_t}),
             p.depth + 1
      FROM customer c JOIN paths p
        ON {_idiv(dialect, "c.c_custkey", "2")} = p.node
       AND c.c_custkey > 1
      WHERE p.depth < {MAX_DEPTH}
    )
    SELECT node AS custkey, path, depth
    FROM paths WHERE node <= 20
    """


@query("q520_materialized_paths", oracle=_paths_sql("duck"))
def q520_materialized_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-path strings (root/.../node) for the first 20
    customers of the synthesized tree — the adjacency-list-to-path-
    column conversion hierarchical UIs and LIKE-prefix subtree
    filters want, built by recursive string concatenation (identical
    on both engines). The depth guard bounds recursion; the final
    filter prunes to a 20-row sample."""
    hint = _loop_side_view(spark, sf_dir, "customer", ["c_custkey"])
    return spark.sql(_paths_sql("spark", hint))
