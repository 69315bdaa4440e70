"""Vector similarity operators (the library behind queries/vector.py
q40-q42, q48, q50) — parameterized so a user can run them against any
corpus/probe DataFrames, not just the registry's fixed configurations.

Conventions: embeddings are ``array<double>`` columns; all similarity
math is JVM-side (``aggregate(zip_with(...))`` folds — no Python in the
hot path); hyperplanes/centroids are deterministic so results reproduce
on any engine.

100 TB shapes: brute-force top-k broadcasts the probe set and takes a
partial top-k per partition before one shuffle on the probe id;
bucketed variants (hyperplane LSH, banded multi-probe, IVF cells) turn
candidate generation into an equi-join on the bucket key so cost tracks
collisions, never n².
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dot_expr(a: str, b: str) -> str:
    """dot(a, b) as a Spark SQL expression over array<double>."""
    return f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"


def with_norm(df: DataFrame, v: str = "v", out: str = "vnorm") -> DataFrame:
    """Hoist ||v|| out of any downstream pair loop (once per row)."""
    return df.withColumn(out, F.expr(f"sqrt({dot_expr(v, v)})"))


def plane_dot_expr(p: int, v: str = "v", dim: int = 64) -> str:
    """Dot with deterministic integer hyperplane p:
    w[p][d] = ((p*67 + d*13) % 19) - 9 — no RNG, engine-reproducible."""
    return (
        f"aggregate(transform(sequence(0, {dim - 1}), "
        f"d -> element_at({v}, d + 1) * ((({p} * 67 + d * 13) % 19) - 9)), "
        f"0D, (acc, x) -> acc + x)"
    )


def bucket_expr(n_planes: int, v: str = "v", dim: int = 64, first_plane: int = 0) -> str:
    """Sign-bit bucket id over ``n_planes`` hyperplanes starting at
    ``first_plane`` (banded LSH uses consecutive plane groups)."""
    return " + ".join(
        f"(CASE WHEN {plane_dot_expr(first_plane + r, v, dim)} >= 0D THEN {1 << r} ELSE 0 END)"
        for r in range(n_planes)
    )


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    probe_id: str = "query_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k of every probe against the corpus.
    ``corpus``: (id_col, v); ``probes``: (probe_id, qv). Probes are
    broadcast; WindowGroupLimit computes a per-partition partial top-k
    before the single shuffle on the probe id.

    ``exclude_self`` compares ``id_col`` to ``probe_id`` directly, so
    leave it True ONLY when both ids come from the same domain and
    type (probes drawn from the corpus); pass False for independent
    probe frames — a type-mismatched comparison would otherwise
    null out and drop every pair silently."""
    c = with_norm(corpus.select(id_col, "v"))
    p = with_norm(
        probes.select(F.col(probe_id), F.col("qv")), v="qv", out="qnorm"
    )
    self_pred = (
        F.col(f"b.{id_col}") != F.col(f"a.{probe_id}")
        if exclude_self
        else F.lit(True)
    )
    pairs = (
        c.alias("b")
        .join(F.broadcast(p).alias("a"), self_pred)
        .select(
            probe_id,
            F.col(f"b.{id_col}").alias("neighbor_id"),
            F.round(
                F.expr(f"({dot_expr('qv', 'v')})") / (F.col("qnorm") * F.col("vnorm")),
                6,
            ).alias("cos_sim"),
        )
    )
    w = W.partitionBy(probe_id).orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(probe_id, "neighbor_id", "cos_sim", "rank")
    )


def near_dup_pairs(e: DataFrame, threshold: float) -> DataFrame:
    """Exact all-pairs cosine near-dup above ``threshold`` — the O(n²)
    correctness anchor. ``e``: (vec_id, v, label). Use the LSH-gated
    variant (queries/vector.py q48) at scale."""
    en = with_norm(e, out="nrm")
    a = en.select(
        F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
        F.col("label").alias("la"), F.col("nrm").alias("na"),
    )
    b = en.select(
        F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
        F.col("label").alias("lb"), F.col("nrm").alias("nb"),
    )
    cos = F.expr(f"({dot_expr('va', 'vb')})") / (F.col("na") * F.col("nb"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(cos, 6).alias("cos_sim"),
            (F.col("la") == F.col("lb")).alias("same_label"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def kmeans(
    e: DataFrame,
    k: int,
    *,
    max_iters: int = 10,
    tol: float = 1e-6,
    id_col: str = "vec_id",
    v_col: str = "v",
) -> tuple[DataFrame, DataFrame]:
    """Distributed Lloyd's k-means over an ``array<double>`` column.
    Returns ``(assignments, centroids)``: (id, cluster, sq_dist) and
    (cluster, cv).

    Spark shape per iteration — the q50/q67 steps composed into a loop:
    the k centroids collapse into ONE broadcast row and assignment runs
    as a per-row HOF argmin (zero shuffle, the q50 trick); the update
    step is posexplode → aggregate on the (cluster, dim) composite key
    (the q67 shape, k×d output rows), rebuilt into centroid arrays with
    an ordered collect_list. One shuffle per iteration over k×d-bounded
    data; the corpus itself never shuffles. Initialization is the k
    vectors with the smallest md5(id) — deterministic and engine-
    reproducible like lowest-id picks, but hash-spread across the
    corpus (consecutive ids often share a real cluster, which strands
    every seed in one blob); orderBy+limit is a distributed partial
    top-k, no global window. Convergence = max centroid coordinate
    shift <= ``tol``, tested with an isEmpty on the tiny joined
    centroid frames. Lineage on the centroid frame is truncated per
    round with localCheckpoint (k rows; swap in a reliable checkpoint
    dir on a cluster)."""
    src = e.select(F.col(id_col).alias("_id"), F.col(v_col).alias("v"))
    pick = F.md5(F.col("_id").cast("string"))
    wk = W.orderBy(pick, "_id")
    cents = (
        src.orderBy(pick, "_id")
        .limit(k)
        .select((F.row_number().over(wk) - 1).alias("cluster"), F.col("v").alias("cv"))
        .localCheckpoint()
    )
    if max_iters < 1:
        raise ValueError(f"kmeans needs max_iters >= 1, got {max_iters}")
    assign_expr = (
        "array_min(transform(cents, c -> struct("
        "aggregate(zip_with(v, c.cv, (x, y) -> (x - y) * (x - y)), 0D, "
        "(acc, x) -> acc + x) AS d, c.cluster AS cluster)))"
    )

    def assign(centroids: DataFrame) -> DataFrame:
        cents_row = centroids.agg(
            F.collect_list(F.struct("cluster", "cv")).alias("cents")
        ).withColumn("_k", F.lit(1))
        return (
            src.withColumn("_k", F.lit(1))
            .join(F.broadcast(cents_row), "_k")
            .withColumn("_best", F.expr(assign_expr))
            .select(
                "_id",
                "v",
                F.col("_best.cluster").alias("cluster"),
                F.col("_best.d").alias("sq_dist"),
            )
        )

    for _ in range(max_iters):
        assigned = assign(cents)
        updated = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        # A cluster with zero assignments produces no update row; keep
        # its previous centroid (standard Lloyd's choice) so the model
        # always has exactly k clusters and the shift test sees them all.
        new_cents = (
            cents.alias("o")
            .join(updated.alias("u"), "cluster", "left")
            .select(
                "cluster",
                F.coalesce(F.col("u.cv"), F.col("o.cv")).alias("cv"),
            )
            .localCheckpoint()
        )
        moved = (
            new_cents.alias("n")
            .join(cents.alias("o"), "cluster")
            .withColumn(
                "shift",
                F.expr(
                    "aggregate(zip_with(n.cv, o.cv, (x, y) -> abs(x - y)), 0D, "
                    "(acc, x) -> greatest(acc, x))"
                ),
            )
            .filter(F.col("shift") > tol)
        )
        converged = moved.isEmpty()
        cents = new_cents
        if converged:
            break
    # Re-assign against the FINAL centroids so the returned pair is
    # mutually consistent even when the loop exits on max_iters.
    final = (
        assign(cents)
        .select("_id", "cluster", F.round("sq_dist", 6).alias("sq_dist"))
        .withColumnRenamed("_id", id_col)
    )
    return final, cents


# --- IVF cells + SemDeDup (the library behind q50 / q197) --------------------

_CELL_EXPR = """
slice(reverse(array_sort(transform(cents, c -> struct(
  aggregate(zip_with({v}, c.cv, (x, y) -> x * y), 0D, (acc, x) -> acc + x) / c.nrm AS s,
  -c.id AS negid)))), 1, {n})
"""


def ivf_assign(
    e: DataFrame,
    n_centroids: int,
    *,
    id_col: str = "vec_id",
    v: str = "v",
) -> DataFrame:
    """Assign every vector to its nearest coarse centroid (centroids =
    the ``n_centroids`` lowest-id vectors — deterministic, no RNG; swap
    in kmeans() output for data-adaptive cells, same downstream plan).
    Zero shuffle: one broadcast centroid row + an HOF argmax per row.
    Returns (id_col, v, vnorm, cell); ties break toward the lower
    centroid id (struct ordering on (score desc, -id desc))."""
    cents = (
        e.filter(F.col(id_col) < n_centroids)
        .select(
            F.struct(
                F.col(id_col).cast("int").alias("id"),
                F.col(v).alias("cv"),
                F.expr(f"sqrt({dot_expr(v, v)})").alias("nrm"),
            ).alias("c")
        )
        .agg(F.collect_list("c").alias("cents"))
    )
    return (
        e.join(F.broadcast(cents))
        .withColumn("cell", -F.expr(_CELL_EXPR.format(v=v, n=1))[0]["negid"])
        .withColumn("vnorm", F.expr(f"sqrt({dot_expr(v, v)})"))
        .select(id_col, v, "vnorm", "cell")
    )


def semantic_dedup_drops(
    e: DataFrame,
    *,
    n_centroids: int = 8,
    threshold: float = 0.25,
    id_col: str = "vec_id",
    v: str = "v",
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup: within each IVF cell, a vector is dropped when a
    lower-id cell-mate's cosine (6-dp rounded) meets the threshold.
    Returns (id_col, cell, canonical_id, max_sim) — one row per DROPPED
    vector. The within-cell self-join is the point: the n² is confined
    to cells (k grows ~sqrt(n), cells stay bounded).

    ``max_cell`` is the structural overflow guard (the same role as
    textdedup.lsh_candidate_pairs' max_bucket): cells whose population
    exceeds it are SKIPPED from pair generation (their members are
    never dropped) rather than going m² — the production stance when a
    fixed k meets a dup-dense shard (the sf1 scale rehearsal shows the
    unguarded join going 139x on 10x data whose every doc has 9 clones;
    the real fix is refining k, the cap is the circuit breaker). The
    default None preserves the exact SemDeDup contract that q197's
    oracle pins."""
    cells = ivf_assign(e, n_centroids, id_col=id_col, v=v)
    if max_cell is not None:
        cells = (
            cells.withColumn(
                "_m", F.count(F.lit(1)).over(W.partitionBy("cell"))
            )
            .filter(F.col("_m") <= max_cell)
            .drop("_m")
        )
    a = cells.select(
        F.col(id_col).alias("a_id"),
        F.col(v).alias("av"),
        F.col("vnorm").alias("anorm"),
        F.col("cell").alias("a_cell"),
    )
    pairs = cells.join(
        a, (F.col("cell") == F.col("a_cell")) & (F.col("a_id") < F.col(id_col))
    ).select(
        id_col,
        "cell",
        "a_id",
        F.round(
            F.expr(f"({dot_expr('av', v)})") / (F.col("anorm") * F.col("vnorm")), 6
        ).alias("sim"),
    )
    return (
        pairs.filter(F.col("sim") >= F.lit(threshold))
        .groupBy(id_col, "cell")
        .agg(F.min("a_id").alias("canonical_id"), F.max("sim").alias("max_sim"))
        .select(id_col, "cell", "canonical_id", "max_sim")
    )
