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
) -> DataFrame:
    """Exact cosine top-k of every probe against the corpus.
    ``corpus``: (id_col, v); ``probes``: (probe_id, qv). Probes are
    broadcast; WindowGroupLimit computes a per-partition partial top-k
    before the single shuffle on the probe id."""
    c = with_norm(corpus.select(id_col, "v"))
    p = with_norm(
        probes.select(F.col(probe_id), F.col("qv")), v="qv", out="qnorm"
    )
    pairs = (
        c.alias("b")
        .join(F.broadcast(p).alias("a"), F.col(f"b.{id_col}") != F.col(f"a.{probe_id}"))
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
