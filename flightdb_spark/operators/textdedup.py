"""Reusable text near-dup pipeline operators (the library behind
queries/textops.py q30/q31/q51).

Each stage is a plain DataFrame -> DataFrame function so a user can
compose their own pipeline (different shingle width, seed count,
banding, bucket cap) instead of the fixed registry queries. All hashes
are md5 so results are engine-reproducible.

100 TB shapes:
- shingles/minhash: explode -> one aggregate on the doc key.
- lsh_candidate_pairs: the self-join key is the (band, minhash) bucket,
  never the doc pair. ``max_bucket`` guards the one way this can still
  blow up: a degenerate bucket (empty strings, boilerplate) with m
  members contributes m² pairs — cap it and those docs simply skip that
  band (they usually collide again in another band if genuinely
  similar; boilerplate-only collisions are the thing being dropped).
- connected_components: min-label edge contraction — the live edge set
  shrinks geometrically, O(log diameter) rounds, checkpoint per round.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

# MinHash base hash: one md5 per shingle, folded to a 60-bit int. Each
# seed then applies a deterministic xor-mask permutation over that int —
# 1 digest + S integer ops per shingle instead of S digests, and the
# signature/shuffle columns are longs, not 32-char strings. Both
# fragments compute bit-identical values (verified against DuckDB).
MINHASH_BASE_SPARK = "cast(conv(substring(md5({sh}),1,15),16,10) as bigint)"
MINHASH_BASE_DUCK = "(('0x' || substr(md5({sh}),1,15))::BIGINT)"


def minhash_mask(seed: int) -> int:
    """Deterministic 60-bit xor mask for one seed (shared with the
    DuckDB oracles, which inline the same constant)."""
    return int(hashlib.md5(f"minhash-mask:{seed}".encode()).hexdigest()[:15], 16)


_SHINGLE_TMPL = (
    "CASE WHEN size({col}) < {n} THEN array() "
    "ELSE transform(sequence(1, size({col}) - {nm1}), "
    "i -> concat_ws(' ', slice({col}, i, {n}))) END"
)


def shingles(docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """Word n-gram shingles, one row per (doc, shingle occurrence).

    Tokenizes ONCE into an array column and shingles over that: with
    the split() inlined in the transform lambda, Spark re-evaluated it
    per element (no loop-invariant hoisting inside higher-order
    functions), re-tokenizing each doc once per shingle — O(len²)
    characters per doc (guide §4.1). The multi-referenced non-cheap
    alias is not collapsed back by CollapseProject."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("_w"),
    )
    expr = _SHINGLE_TMPL.format(col="_w", n=n, nm1=n - 1)
    return toks.select(
        "doc_id", F.explode(F.expr(expr)).alias("sh")
    )


def minhash_signatures(
    shingled: DataFrame, *, seeds: tuple[int, ...], extra_aggs: tuple = ()
) -> DataFrame:
    """MinHash signature per doc (one bigint column per seed): min over
    xor-mask permutations of the shared 60-bit md5 base hash.
    ``extra_aggs`` ride the same per-doc aggregation (e.g. q30 appends
    countDistinct("sh")) so callers never re-implement the scheme."""
    hashed = shingled.withColumn(
        "_mh", F.expr(MINHASH_BASE_SPARK.format(sh="sh"))
    )
    return hashed.groupBy("doc_id").agg(
        *[
            F.min(F.col("_mh").bitwiseXOR(F.lit(minhash_mask(s)))).alias(
                f"minhash_{s}"
            )
            for s in seeds
        ],
        *extra_aggs,
    )


def lsh_bands(sigs: DataFrame, *, seeds: tuple[int, ...]) -> DataFrame:
    """Unpivot the signature to (doc_id, band, h) rows, one per seed.

    Explode of an inline struct array, NOT a union of per-band selects:
    Catalyst does not dedupe common subplans across union branches, so
    the union form recomputes the upstream signature aggregation once
    PER BAND (measured 4x the shuffle work for 4 seeds). The explode is
    a single-pass map-side fan-out over one computation of ``sigs``."""
    arr = F.array(
        *[
            F.struct(
                F.lit(s).alias("band"), F.col(f"minhash_{s}").alias("h")
            )
            for s in seeds
        ]
    )
    return sigs.select("doc_id", F.explode(arr).alias("_x")).select(
        "doc_id", "_x.band", "_x.h"
    )


def lsh_candidate_pairs(bands: DataFrame, *, max_bucket: int | None = None) -> DataFrame:
    """Docs sharing any band bucket -> (doc_a < doc_b, n_shared_bands).
    ``max_bucket`` drops buckets with more members than the cap (the
    m² guard for boilerplate buckets) — with the bucket-array shape it
    is a simple size() filter, no window pre-pass.

    Pair generation is the no-self-join shape (q267 family): ONE
    (band, h) shuffle collects each bucket's sorted member array,
    in-bucket pairs explode map side via nested higher-order
    functions, and the band-vote aggregate keys on the pair — the
    self-join formulation re-exchanged the bands table on both sides
    and scanned it twice."""
    buckets = bands.groupBy("band", "h").agg(
        F.sort_array(F.collect_set("doc_id")).alias("members")
    )
    if max_bucket is not None:
        buckets = buckets.filter(F.size("members") <= max_bucket)
    idx = F.sequence(F.lit(0), F.size("members") - 1)
    pairs = buckets.select(
        "band",
        F.explode(
            F.flatten(
                F.transform(
                    idx,
                    lambda i: F.transform(
                        F.slice(F.col("members"), i + 2, F.size("members")),
                        lambda y: F.struct(
                            F.element_at(F.col("members"), i + 1).alias("doc_a"),
                            y.alias("doc_b"),
                        ),
                    ),
                )
            )
        ).alias("p"),
    )
    return (
        pairs.select("band", F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.countDistinct("band").alias("n_shared_bands"))
    )


def connected_components(
    pairs: DataFrame, *, src: str = "doc_a", dst: str = "doc_b", max_rounds: int = 32
) -> DataFrame:
    """(doc_id, cluster_id = min doc id in component) over an undirected
    edge list, by min-label EDGE CONTRACTION: each round every node in
    the remaining graph maps to min(itself, its neighbors), the
    composed mapping folds into the per-original-node labels, and the
    edge list is REWRITTEN through the mapping (self-loops dropped,
    duplicates merged). Contracting the edges is what makes this
    O(log diameter) in practice — the earlier jump-only variant kept
    the original edges and degraded to one-hop propagation on
    locally-flat label graphs (measured: 18 rounds vs 7 on the sf0.01
    LSH graph). The live edge set also SHRINKS geometrically, so later
    rounds get cheaper instead of rescanning the full graph.

    Per round: one bounded aggregate for the mapping, two equi-joins to
    rewrite edges, one join to fold labels; lineage truncated by
    localCheckpoint (use a reliable checkpoint dir on a cluster). The
    loop ends when no edges remain — the only driver-side signal is
    isEmpty on the checkpointed edge frame. Termination is guaranteed:
    every surviving edge strictly decreases its endpoint-id sum, and
    max_rounds backstops pathological inputs.
    """
    # Materialize the pair list once: `p` feeds the node union (two
    # references) AND the edge list, and Spark re-executes the full
    # upstream lineage (for q51: the whole shingle/minhash/LSH chain)
    # per reference (guide §2.4). After the checkpoint each consumer
    # is a bounded scan of the candidate pairs.
    p = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b")).localCheckpoint()
    # nodes come from ALL pairs — a self-loop (a, a) contributes an
    # isolated node that must still appear in the output as its own
    # singleton component (q143's grid graph encodes lone cells that
    # way); only the EDGE list drops self-loops.
    nodes = (
        p.select(F.col("a").alias("doc_id"))
        .union(p.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    edges = (
        p.filter(F.col("a") != F.col("b"))
        .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.withColumn("label", F.col("doc_id")).localCheckpoint()
    for rnd in range(max_rounds):
        if edges.isEmpty():
            break
        sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
        newmap = (
            sym.groupBy(F.col("a").alias("node"))
            .agg(F.min("b").alias("nbr_min"))
            .select("node", F.least("node", "nbr_min").alias("rep"))
        )
        labels = labels.join(newmap, labels.label == newmap.node, "left").select(
            "doc_id", F.coalesce("rep", "label").alias("label")
        )
        # label lineage grows by ONE join per round — checkpoint every
        # third round, not every round: each localCheckpoint is a full
        # materialization job, and on the post-contraction (tiny) label
        # table the job overhead dominates (measured ~20% of total CC
        # time at sf0.1). The EDGE checkpoint below stays per-round —
        # that is the lineage that compounds through the rewrite.
        if rnd % 3 == 2:
            labels = labels.localCheckpoint()
        na = newmap.select(F.col("node").alias("a"), F.col("rep").alias("ra"))
        nb = newmap.select(F.col("node").alias("b"), F.col("rep").alias("rb"))
        edges = (
            edges.join(na, "a")
            .join(nb, "b")
            .filter(F.col("ra") != F.col("rb"))
            .select(
                F.least("ra", "rb").alias("a"), F.greatest("ra", "rb").alias("b")
            )
            .distinct()
            .localCheckpoint()
        )
    return labels.select("doc_id", F.col("label").alias("cluster_id"))


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Cluster resolution: components + size + canonical flag
    (canonical = min doc_id, i.e. doc_id == cluster_id)."""
    comp = connected_components(pairs)
    w = W.partitionBy("cluster_id")
    return (
        comp.withColumn("n_members", F.count(F.lit(1)).over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id"))
    )


# Normalized word tokens, one definition for BOTH engines (the regexp
# collapse leaves runs of spaces -> filter the empty tokens). Everything
# that tokenizes this way — dup_span_fraction, q81's oracle, q82 —
# formats these, so implementation and oracle cannot drift.
NORM_TOKENS_SPARK = (
    "filter(split(trim(regexp_replace(lower({c}), '[^a-z0-9 ]', ' ')), ' '), "
    "x -> x != '')"
)
NORM_TOKENS_DUCK = (
    "list_filter(string_split(trim(regexp_replace(lower({c}), '[^a-z0-9 ]', "
    "' ', 'g')), ' '), x -> x <> '')"
)


def dup_span_fraction(
    docs: DataFrame, *, span_n: int = 5, text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_spans, n_dup, dup_frac): fraction of each doc's
    ``span_n``-token spans that occur more than once anywhere in the
    corpus (intra- or inter-document) — the hashed-n-gram approximation
    of exact-substring dedup (Lee et al. 2021). Used by registry query
    q81 and the pipeline span gate; one definition so they cannot
    drift. Two shuffles (gram hash, doc id), no n² anywhere.

    Round-9 note: a gram-partitioned window (COUNT(*) OVER (PARTITION
    BY g)) would reach one tokenize pass instead of two, but measured
    WORSE on the real compute (noop sink 5.4 s -> 10.7 s at sf0.1):
    WindowExec must SORT the full exploded gram stream by the md5 key,
    which costs more than the second tokenize+explode the hash
    aggregate + join-back form pays. Measured, rejected, kept the
    aggregate+join shape (guide §1.1 first-principles vs empirical)."""
    toks_expr = NORM_TOKENS_SPARK.format(c=text_col)
    toks = (
        docs.select(F.col(id_col).alias("doc_id"), F.expr(toks_expr).alias("w"))
        # guard: Spark's sequence(1, 0) is DESCENDING, not empty
        .filter(F.size("w") >= span_n)
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {span_n - 1}), "
                f"i -> md5(concat_ws(' ', slice(w, i, {span_n}))))"
            )
        ).alias("g"),
    )
    cnts = grams.groupBy("g").agg(F.count(F.lit(1)).alias("cnt"))
    dup = F.when(F.col("cnt") > 1, 1).otherwise(0)
    return (
        grams.join(cnts, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(dup).alias("n_dup"),
            F.round(F.sum(dup) * F.lit(1.0) / F.count(F.lit(1)), 6).alias("dup_frac"),
        )
    )


def fingerprint_col(text_col: str = "text") -> F.Column:
    """Content fingerprint: md5 of lowercase/punct-normalized text
    (the exact-dedup key of queries q28/q29)."""
    norm = f"trim(regexp_replace(lower({text_col}), '[^a-z0-9 ]', ' '))"
    return F.md5(F.expr(norm))


def dedup_stream(
    stream: DataFrame,
    *,
    ts_col: str = "ts",
    watermark: str = "1 hour",
    text_col: str = "text",
) -> DataFrame:
    """Streaming exact dedup at ingest time: fingerprint each doc and
    suppress re-deliveries within the watermark horizon. State is
    keyed by the 16-byte fingerprint and expires with the watermark, so
    memory is bounded by arrival rate × horizon, not corpus size — the
    guard that runs IN FRONT of the batch near-dup pipeline at 100 TB
    (same Spark mechanism as streaming/assembly.dedup_recent)."""
    return (
        stream.withColumn("fingerprint", fingerprint_col(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
