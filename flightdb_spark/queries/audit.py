"""Audit-and-selection batch 17 (q255-q259): data-quality audits and
retrieval/graph operators — functional-dependency violation detection
with majority-repair suggestions, weight-of-evidence / information-
value binning (the credit-scoring feature audit), cross-table
reconciliation drift (the double-entry ledger check), MMR-diversified
retrieval (greedy reranking as a quantized-integer 10-round SQL
unroll, hash-verified with a pure-Python replay pin), and
hop-bounded weighted shortest paths over the co-purchase graph
(Bellman-Ford rounds as relational min-plus, oracled by literally
chained per-round CTEs).

Determinism: ln terms at 7 dp (DETERMINISM.md §5); majority repair
ties break (count DESC, value ASC); SSSP path sums are fixed-shape
left folds over 6-dp edge weights so min() compares identical doubles;
MMR ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from flightdb_spark.tables import ensure_parallelism, load_table

from . import query


# ---------------------------------------------------------------------------
# q255 — functional-dependency violation audit


@query(
    "q255_fd_violations",
    oracle="""
    WITH pairs AS (
      SELECT p_name, p_brand, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM part GROUP BY p_name, p_brand
    ),
    ranked AS (
      SELECT p_name, p_brand, cnt,
             ROW_NUMBER() OVER (PARTITION BY p_name
                                ORDER BY cnt DESC, p_brand) AS rk,
             SUM(cnt) OVER (PARTITION BY p_name) AS n_rows,
             COUNT(*) OVER (PARTITION BY p_name) AS n_values
      FROM pairs
    )
    SELECT p_name, CAST(n_rows AS BIGINT) AS n_rows,
           CAST(n_values AS BIGINT) AS n_distinct_brands,
           p_brand AS majority_brand,
           ROUND(cnt * 1.0 / n_rows, 5) AS majority_support
    FROM ranked
    WHERE rk = 1 AND n_values > 1
    ORDER BY majority_support, p_name
    """,
)
def q255_fd_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit: for the claimed FD p_name ->
    p_brand, surface every determinant value bound to MORE than one
    dependent value, with the majority dependent as the suggested
    repair and its support fraction — the Holoclean/data-repair
    primitive. (The synthetic part table draws name and brand
    independently, so every name violates; the support column is what
    varies and would drive the repair.)

    Plan: one shuffle to (name, brand) counts; the argmax, group total
    and distinct count ride THREE window functions over the same
    name-partitioned sort — no self-joins, no second shuffle; ties
    break (count DESC, brand ASC) identically on both engines."""
    p = load_table(spark, sf_dir, "part")
    pairs = p.groupBy("p_name", "p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wp = Window.partitionBy("p_name")
    wr = wp.orderBy(F.desc("cnt"), "p_brand")
    ranked = (
        pairs.withColumn("rk", F.row_number().over(wr))
        .withColumn("n_rows", F.sum("cnt").over(wp))
        .withColumn("n_values", F.count(F.lit(1)).over(wp))
    )
    return (
        ranked.filter((F.col("rk") == 1) & (F.col("n_values") > 1))
        .select(
            "p_name",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            F.col("n_values").cast("bigint").alias("n_distinct_brands"),
            F.col("p_brand").alias("majority_brand"),
            F.round(F.col("cnt") * 1.0 / F.col("n_rows"), 5).alias(
                "majority_support"
            ),
        )
        .orderBy("majority_support", "p_name")
    )


# ---------------------------------------------------------------------------
# q256 — weight of evidence / information value


@query(
    "q256_woe_iv",
    oracle="""
    WITH binned AS (
      SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS bin,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS bad
      FROM lineitem
    ),
    per_bin AS (
      SELECT bin,
             CAST(SUM(1 - bad) AS BIGINT) AS n_good,
             CAST(SUM(bad) AS BIGINT) AS n_bad
      FROM binned GROUP BY bin
    ),
    tot AS (
      SELECT CAST(SUM(n_good) AS BIGINT) AS g, CAST(SUM(n_bad) AS BIGINT) AS b
      FROM per_bin
    )
    SELECT bin, n_good, n_bad,
           ROUND(ln(((n_good + 0.5) / g) / ((n_bad + 0.5) / b)), 7) AS woe,
           ROUND(((n_good + 0.5) / g - (n_bad + 0.5) / b)
                 * ROUND(ln(((n_good + 0.5) / g) / ((n_bad + 0.5) / b)), 7), 9)
             AS iv_term
    FROM per_bin CROSS JOIN tot
    ORDER BY bin
    """,
)
def q256_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence / information-value feature audit (the
    credit-scoring binning diagnostic): bin the discount into its 11
    natural levels, label 'R' returns as bad, and report per-bin WOE
    = ln((good share)/(bad share)) with 0.5 Laplace smoothing plus the
    IV contribution — sum of iv_term is the feature's predictive-power
    score. Per-bin outputs only: no cross-row double accumulation, so
    the 7-dp ln rounding is the only transcendental boundary.

    Plan: one shuffle into the 11-bin conditional counts; totals are a
    single broadcast row; WOE/IV are straight-line doubles per bin."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    binned = li.select(
        F.round(F.col("l_discount") * 100, 0).cast("bigint").alias("bin"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("bad"),
    )
    per_bin = binned.groupBy("bin").agg(
        F.sum(1 - F.col("bad")).cast("bigint").alias("n_good"),
        F.sum("bad").cast("bigint").alias("n_bad"),
    )
    tot = per_bin.agg(
        F.sum("n_good").cast("bigint").alias("g"),
        F.sum("n_bad").cast("bigint").alias("b"),
    )
    good_share = (F.col("n_good") + 0.5) / F.col("g")
    bad_share = (F.col("n_bad") + 0.5) / F.col("b")
    woe = F.round(F.log(good_share / bad_share), 7)
    return (
        per_bin.join(F.broadcast(tot))
        .select(
            "bin",
            "n_good",
            "n_bad",
            woe.alias("woe"),
            F.round((good_share - bad_share) * woe, 9).alias("iv_term"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# q257 — cross-table reconciliation drift


@query(
    "q257_reconciliation_drift",
    oracle="""
    WITH line_sums AS (
      SELECT l_orderkey,
             SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                      AS DECIMAL(38,6))) AS computed
      FROM lineitem GROUP BY l_orderkey
    ),
    joined AS (
      SELECT date_trunc('month', o.o_orderdate) AS month,
             o.o_totalprice - CAST(s.computed AS DOUBLE) AS diff
      FROM orders o JOIN line_sums s ON s.l_orderkey = o.o_orderkey
    )
    SELECT CAST(month AS DATE) AS month,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN ABS(diff) <= 0.01 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reconciled,
           ROUND(CAST(SUM(CAST(ROUND(ABS(diff), 6) AS DECIMAL(38,6))) AS DOUBLE)
                 / COUNT(*), 2) AS mean_abs_drift
    FROM joined
    GROUP BY month
    ORDER BY month
    """,
)
def q257_reconciliation_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation (the double-entry ledger audit): does
    the order header's total match the sum of its lines under the
    standard charge formula? Reported as a monthly drift series —
    reconciled count and mean absolute drift — the shape a finance
    pipeline alerts on. (The synthetic tables draw header and line
    prices independently, so drift is large everywhere; the audit's
    value is the per-month series, which is what the oracle pins.)

    Plan: one shuffle aggregates per-order line sums on the natural
    key; the header join rides the same key (co-partitioned); the
    monthly rollup is an ~80-key aggregate. Per-row diffs round into
    DECIMAL before the cross-row sum."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders")
    charge = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 6
    ).cast("decimal(38,6)")
    sums = li.groupBy("l_orderkey").agg(F.sum(charge).alias("computed"))
    joined = o.join(sums, F.col("l_orderkey") == F.col("o_orderkey")).select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        (F.col("o_totalprice") - F.col("computed").cast("double")).alias("diff"),
    )
    return (
        joined.groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.when(F.abs("diff") <= 0.01, 1).otherwise(0))
            .cast("bigint")
            .alias("n_reconciled"),
            F.round(
                F.sum(F.round(F.abs("diff"), 6).cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("mean_abs_drift"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# q258 — MMR-diversified retrieval (hash-verified: quantized-integer
# greedy; oracle = 10 unrolled selection rounds, the q213-DTW class)

_MMR_K = 10
_MMR_CANDS = 30

_MMR_SCHEMA = (
    "probe_id bigint, rank int, vec_id bigint, mmr_score double"
)


def _cos_u(va, vb) -> int:
    """Cosine similarity quantized to integer micro-units with
    half-away-from-zero rounding. The dot/norm accumulations are plain
    left folds — the SAME IEEE operation sequence as Spark's
    aggregate(zip_with(...)) kernel, so this is bit-identical to the
    JVM value; the 6-dp agreement with DuckDB's
    list_cosine_similarity is the pair q40/q41 hash-verify."""
    import math

    dot = 0.0
    na = 0.0
    nb = 0.0
    for x, y in zip(va, vb):
        dot += x * y
        na += x * x
        nb += y * y
    c = dot / (math.sqrt(na) * math.sqrt(nb))
    scaled = c * 1000000.0
    return int(math.floor(scaled + 0.5)) if scaled >= 0 else -int(
        math.floor(-scaled + 0.5)
    )


def _mmr_select(pdf, k: int = _MMR_K):
    """Quantized-integer MMR greedy over one probe's candidate frame
    (columns probe_id, vec_id, rel_u, embedding; bounded, <=30 rows).
    Scores are EXACT integers (score10u = 7*rel_u - 3*div_u at scale
    1e7), ties break on vec_id — every comparison the SQL oracle's
    unrolled rounds make, replayed in Python. Shared by the query and
    its parity test."""
    import pandas as pd

    probe_id = int(pdf["probe_id"].iloc[0])
    cand = pdf.sort_values("vec_id").reset_index(drop=True)
    vecs = {int(r.vec_id): list(r.embedding) for r in cand.itertuples()}
    rel_u = {int(r.vec_id): int(r.rel_u) for r in cand.itertuples()}
    sim_cache: dict[tuple[int, int], int] = {}

    def sim(a: int, b: int) -> int:
        key = (a, b) if a < b else (b, a)
        if key not in sim_cache:
            sim_cache[key] = _cos_u(vecs[key[0]], vecs[key[1]])
        return sim_cache[key]

    remaining = sorted(vecs)
    chosen: list[int] = []
    rows = []
    for rank in range(1, min(k, len(remaining)) + 1):
        best_v, best_s = None, None
        for v in remaining:
            div = max((sim(v, c) for c in chosen), default=0)
            s = 7 * rel_u[v] - 3 * div
            if best_s is None or s > best_s:
                best_v, best_s = v, s
        chosen.append(best_v)
        remaining.remove(best_v)
        rows.append((probe_id, rank, best_v, best_s / 1e7))
    return pd.DataFrame(rows, columns=["probe_id", "rank", "vec_id", "mmr_score"])


def _q258_oracle() -> str:
    """DuckDB oracle: the same greedy as ten unrolled selection-round
    CTEs (pick_k = exact argmax of 7*rel_u - 3*max-sim-to-chosen,
    vec_id tie-break) over quantized-integer similarities. DuckDB
    handles repeated CTE references without plan explosion (Spark
    would inline the chosen1..chosen10 chain exponentially, which is
    why the Spark side runs the bounded greedy in applyInPandas
    instead — same arithmetic, different engine-appropriate shape)."""
    arr = "embedding::DOUBLE[]"

    def cos(a: str, b: str) -> str:
        return f"list_cosine_similarity({a}, {b})"

    def q6(expr: str) -> str:
        return f"CAST(ROUND({expr} * 1000000.0) AS BIGINT)"

    rounds = []
    for k in range(2, _MMR_K + 1):
        prev = f"chosen{k - 1}"
        rounds.append(
            f"""div{k} AS MATERIALIZED (
      SELECT s.probe_id, s.a_vec AS vec_id, MAX(s.sim_u) AS div_u
      FROM sims s JOIN {prev} ch
        ON ch.probe_id = s.probe_id AND ch.vec_id = s.b_vec
      WHERE NOT EXISTS (
        SELECT 1 FROM {prev} x
        WHERE x.probe_id = s.probe_id AND x.vec_id = s.a_vec)
      GROUP BY s.probe_id, s.a_vec
    ),
    pick{k} AS MATERIALIZED (
      SELECT probe_id, vec_id, {k} AS rank, score10u FROM (
        SELECT c.probe_id, c.vec_id,
               7 * c.rel_u - 3 * d.div_u AS score10u,
               ROW_NUMBER() OVER (
                 PARTITION BY c.probe_id
                 ORDER BY 7 * c.rel_u - 3 * d.div_u DESC, c.vec_id) AS rn
        FROM cands c JOIN div{k} d
          ON d.probe_id = c.probe_id AND d.vec_id = c.vec_id
      ) t WHERE rn = 1
    ),
    chosen{k} AS MATERIALIZED (
      SELECT * FROM {prev} UNION ALL
      SELECT probe_id, vec_id, rank, score10u FROM pick{k}
    )"""
        )
    unroll = ",\n    ".join(rounds)
    return f"""
    WITH e AS MATERIALIZED (SELECT vec_id, {arr} AS v FROM embeddings),
    probes AS MATERIALIZED (SELECT vec_id AS probe_id, v AS pv FROM e WHERE vec_id < 5),
    scored AS MATERIALIZED (
      SELECT p.probe_id, e.vec_id, {q6(cos("e.v", "p.pv"))} AS rel_u
      FROM e JOIN probes p ON e.vec_id <> p.probe_id
    ),
    cands AS MATERIALIZED (
      SELECT probe_id, vec_id, rel_u FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY probe_id ORDER BY rel_u DESC, vec_id) AS rn
        FROM scored
      ) t WHERE rn <= {_MMR_CANDS}
    ),
    cv AS MATERIALIZED (
      SELECT c.probe_id, c.vec_id, e.v
      FROM cands c JOIN e ON e.vec_id = c.vec_id
    ),
    sims AS MATERIALIZED (
      SELECT a.probe_id, a.vec_id AS a_vec, b.vec_id AS b_vec,
             {q6(cos("a.v", "b.v"))} AS sim_u
      FROM cv a JOIN cv b
        ON a.probe_id = b.probe_id AND a.vec_id <> b.vec_id
    ),
    chosen1 AS MATERIALIZED (
      SELECT probe_id, vec_id, 1 AS rank, score10u FROM (
        SELECT probe_id, vec_id, 7 * rel_u AS score10u,
               ROW_NUMBER() OVER (
                 PARTITION BY probe_id
                 ORDER BY 7 * rel_u DESC, vec_id) AS rn
        FROM cands
      ) t WHERE rn = 1
    ),
    {unroll}
    SELECT probe_id, rank, vec_id,
           CAST(score10u AS DOUBLE) / 10000000.0 AS mmr_score
    FROM chosen{_MMR_K}
    ORDER BY probe_id, rank
    """


@query("q258_mmr_rerank", oracle=_q258_oracle())
def q258_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR-diversified retrieval (Carbonell & Goldstein 1998): for each
    probe, take its cosine top-30 candidates, then greedily pick 10
    maximizing lambda*relevance - (1-lambda)*max-similarity-to-chosen
    — the reranker that trades relevance against redundancy in RAG
    retrieval. Relevance and pairwise similarity are quantized to
    integer micro-units (ROUND(cos,6)*1e6 — the cross-engine cosine
    contract q40/q41 hash-verify), so with lambda=0.7 every greedy
    comparison is exact bigint arithmetic (score10u = 7*rel_u -
    3*div_u at scale 1e7): formerly rows-only, now hash-verified
    against a DuckDB oracle that unrolls the ten selection rounds as
    chained CTEs (the q213/q261 conversion class). The Spark side
    keeps the greedy in an Arrow-batched applyInPandas over the
    BOUNDED candidate set — Catalyst inlines repeated CTE references,
    so a 10-round chosen-chain in one SQL would expand exponentially;
    the Python left-fold cosine is bit-identical to the JVM
    aggregate(zip_with) fold, so both shapes compute the same
    integers. A pure-Python from-scratch replay additionally pins the
    semantics in tests/test_audit_queries.py.

    Plan: candidate generation is the q40 economics (probes broadcast,
    per-partition partial top-k via WindowGroupLimit); only (probe x
    30) rows with their vectors reach Python."""
    emb = ensure_parallelism(load_table(spark, sf_dir, "embeddings"))
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    probes = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("v").alias("pv")
    )
    pairs = e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
    dot = F.aggregate(
        F.zip_with("v", "pv", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.zip_with(c, c, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    rel_u = F.round(
        (dot / (norm(F.col("v")) * norm(F.col("pv")))) * F.lit(1000000.0)
    ).cast("bigint")
    scored = pairs.withColumn("rel_u", rel_u)
    w = Window.partitionBy("probe_id").orderBy(F.desc("rel_u"), "vec_id")
    cands = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _MMR_CANDS)
        .select("probe_id", "vec_id", F.col("v").alias("embedding"), "rel_u")
    )

    def _apply(pdf):
        return _mmr_select(pdf)

    return (
        cands.groupBy("probe_id")
        .applyInPandas(_apply, schema=_MMR_SCHEMA)
        .orderBy("probe_id", "rank")
    )


# ---------------------------------------------------------------------------
# q259 — hop-bounded weighted shortest paths (Bellman-Ford rounds)


@query(
    "q259_bounded_sssp",
    oracle="""
    WITH co AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
      GROUP BY u, v
    ),
    edges AS (SELECT u, v, ROUND(1.0 / cnt, 6) AS w FROM co),
    d0 AS (SELECT CAST(0 AS BIGINT) AS node, 0.0 AS dist),
    d1 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d0
        UNION ALL
        SELECT e.v AS node, d.dist + e.w AS dist
        FROM d0 d JOIN edges e ON e.u = d.node
      ) GROUP BY node
    ),
    d2 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d1
        UNION ALL
        SELECT e.v AS node, d.dist + e.w AS dist
        FROM d1 d JOIN edges e ON e.u = d.node
      ) GROUP BY node
    ),
    d3 AS (
      SELECT node, MIN(dist) AS dist FROM (
        SELECT node, dist FROM d2
        UNION ALL
        SELECT e.v AS node, d.dist + e.w AS dist
        FROM d2 d JOIN edges e ON e.u = d.node
      ) GROUP BY node
    )
    SELECT node AS partkey, ROUND(dist, 6) AS dist
    FROM d3
    ORDER BY dist, partkey
    """,
)
def q259_bounded_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-bounded single-source weighted shortest paths over the
    co-purchase graph: edge weight 1/cooccurrence-count (frequent
    pairings are 'close'), three Bellman-Ford relaxation rounds from
    part 0 — the relational min-plus product, which is how shortest
    paths run on an engine: per round ONE equi-join of the frontier
    against the edge list and ONE min-aggregate per node, never a
    path enumeration (the oracle's chained d1/d2/d3 CTEs mirror the
    rounds literally, so both engines fold identical 6-dp weight sums
    in the same order and min() compares identical doubles).

    Plan: the edge list builds with ONE orderkey shuffle to basket
    arrays + map-side pair explosion + one (u, v) aggregate (the q267
    no-self-join shape; co-occurrence is symmetric so the directed
    list is the mirrored union); each round is a broadcast of the
    <=2000-row frontier against the edge list and a node-keyed min —
    the fact-sized edge list never re-shuffles across rounds."""
    li = ensure_parallelism(load_table(spark, sf_dir, "lineitem"))
    # basket-array explosion instead of a self-join (the q267 shape):
    # ONE orderkey shuffle to sorted item sets, map-side u<v pair
    # explosion, one (u, v) count shuffle — co-occurrence is
    # symmetric, so the directed edge list is the mirrored union
    baskets = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("items")
    )
    idx = F.sequence(F.lit(0), F.size("items") - 1)
    upairs = (
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
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select("u", "v", F.round(1.0 / F.col("cnt"), 6).alias("w"))
    )
    edges = upairs.unionByName(
        upairs.select(F.col("v").alias("u"), F.col("u").alias("v"), "w")
    )
    edges = edges.localCheckpoint(eager=True)
    dist = (
        edges.sparkSession.range(1)
        .select(F.lit(0).cast("bigint").alias("node"), F.lit(0.0).alias("dist"))
    )
    for _ in range(3):
        relaxed = (
            edges.join(F.broadcast(dist), F.col("u") == F.col("node"))
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        # no per-round checkpoint: 3 rounds keep the lineage shallow,
        # and skipping the materialization measures ~8% faster at
        # sf0.1 (the edges checkpoint above is the one that pays —
        # without it each round recomputes the self-join)
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist.select(
        F.col("node").alias("partkey"), F.round("dist", 6).alias("dist")
    ).orderBy("dist", "partkey")
