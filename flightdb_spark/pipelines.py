"""End-to-end training-data pipeline: the operators composed the way a
real 100 TB pre-training data build runs them.

    raw docs
      -> quality gate        (pure column predicates, scan-stage)
      -> exact dedup         (one shuffle on the content fingerprint)
      -> near-dup resolution (MinHash -> LSH pairs -> components;
                              keep each cluster's canonical doc)
      -> semantic dedup      (optional, given embeddings: IVF-cell
                              SemDeDup, q197 semantics)
      -> span gate           (repeated 5-gram span fraction, q81)
      -> fluency gate        (corpus bigram LM, drop the worst tail)
      -> source caps         (top-k per source by quality — the
                              domain-balancing cap, q108 semantics)
      -> token budget        (optional: best docs per source until the
                              token budget is spent, q196 semantics)
      -> language mix        (deterministic hash-threshold sampling)
      -> split assignment    (hash-stable train/val/test column)
      -> curriculum + packing annotations (quality decile per doc,
                              q120 semantics; per-split concat offsets,
                              q59 semantics partitioned by split — no
                              global sort)

Every stage is one of the tested operators (operators/textdedup.py,
queries/textops.py semantics); this module only sequences them. Scale
notes per stage are in the operator docstrings and PLANS.md.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from .operators import textdedup, textprep


@dataclass
class PipelineConfig:
    min_chars: int = 100
    max_top_token_frac: float = 0.5
    minhash_seeds: tuple[int, ...] = (0, 1, 2, 3)
    lsh_max_bucket: int | None = 10_000
    lang_rates: tuple[tuple[str, str], ...] = (
        ("en", "ffff"), ("fr", "8000"), ("de", "8000"),
        ("es", "4000"), ("zh", "4000"),
    )  # 4-hex-digit keep thresholds on md5(doc_id)
    min_avg_logp: float = -12.0  # bigram-LM fluency floor (q69 semantics)
    max_dup_span_frac: float = 0.5  # span-dedup gate (q81 semantics)
    source_cap: int | None = None  # top-k docs per source (None = uncapped)
    token_budget: int | None = None  # per-source token budget (None = uncapped)
    semantic_centroids: int = 8  # IVF cells for the semantic-dedup stage
    semantic_threshold: float = 0.25  # within-cell cosine drop threshold
    curriculum_bins: int = 10  # quality deciles annotated on survivors
    pack_budget: int = 512  # tokens per training sequence (annotation)
    stage_counts: dict = field(default_factory=dict)  # filled by run()


def quality_gate(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Drop short docs and docs dominated by one repeated token (the
    q52 repetition stat as a gate). The length test is a scan-stage
    predicate; the repetition test is explode -> one shuffle on doc_id,
    and only the (small) reject set crosses back as a broadcast
    anti-join."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    frac = (
        toks.groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg((F.max("count") / F.sum("count")).alias("top_frac"))
    )
    bad = frac.filter(F.col("top_frac") > cfg.max_top_token_frac).select("doc_id")
    return docs.filter(F.length("text") >= cfg.min_chars).join(
        F.broadcast(bad), "doc_id", "anti"
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Keep one doc per normalized content fingerprint (min doc_id)."""
    w_min = F.min("doc_id").over(W.partitionBy("_fp"))
    return (
        docs.withColumn("_fp", textdedup.fingerprint_col("text"))
        .withColumn("_keep", F.col("doc_id") == w_min)
        .filter("_keep")
        .drop("_fp", "_keep")
    )


def near_dedup(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Drop non-canonical members of every LSH near-dup cluster."""
    shingled = textdedup.shingles(docs)
    sigs = textdedup.minhash_signatures(shingled, seeds=cfg.minhash_seeds)
    bands = textdedup.lsh_bands(sigs, seeds=cfg.minhash_seeds)
    pairs = textdedup.lsh_candidate_pairs(bands, max_bucket=cfg.lsh_max_bucket)
    clusters = textdedup.dedup_clusters(pairs)
    losers = clusters.filter(~F.col("is_canonical")).select("doc_id")
    return docs.join(F.broadcast(losers), "doc_id", "anti")


def span_gate(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Drop docs dominated by corpus-repeated 5-token spans (the q81
    operator as a gate — catches boilerplate-heavy docs that survive
    doc-level near-dedup because no single other doc matches them).
    Only the reject set crosses back, as a broadcast anti."""
    frac = textdedup.dup_span_fraction(docs)
    bad = frac.filter(F.col("dup_frac") > cfg.max_dup_span_frac).select("doc_id")
    return docs.join(F.broadcast(bad), "doc_id", "anti")


def fluency_gate(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Drop docs whose add-one-smoothed bigram log-likelihood (trained
    on the surviving corpus itself) falls below the floor — the
    KenLM-style fluency filter. Scoring is the SAME operator as q69
    (operators/textprep.py, merge-order-deterministic decimal
    accumulation); only the reject set crosses back, as a broadcast
    anti."""
    scored = textprep.bigram_avg_logp(docs)
    bad = scored.filter(F.col("avg_logp") < cfg.min_avg_logp).select("doc_id")
    return docs.join(F.broadcast(bad), "doc_id", "anti")


def split_assignment(docs: DataFrame) -> DataFrame:
    """Attach the hash-stable train/val/test column (the q64 operator,
    shared via operators/textprep.py)."""
    return docs.withColumn("split", textprep.split_col())


def language_mix(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Deterministic per-language down-sampling (scan-stage filter)."""
    thr = F.lit(None).cast("string")
    for lang, t in reversed(cfg.lang_rates):
        thr = F.when(F.col("lang") == lang, F.lit(t)).otherwise(thr)
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return docs.withColumn("_thr", thr).filter(
        (h < F.col("_thr")) | (F.col("_thr") == "ffff")
    ).drop("_thr")


def semantic_dedup(
    docs: DataFrame, embeddings: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Drop semantic near-duplicates that survive the lexical chain
    (paraphrases, translations, templated rewrites share no shingles
    but sit together in embedding space). ``embeddings`` is
    (doc_id, v: array<double>); the drop set comes from
    operators/vectors.py::semantic_dedup_drops (q197 semantics —
    IVF-cell-scoped, keep-lowest-id) and crosses back as a broadcast
    anti. Docs without an embedding pass through untouched."""
    from .operators import vectors

    drops = vectors.semantic_dedup_drops(
        embeddings,
        n_centroids=cfg.semantic_centroids,
        threshold=cfg.semantic_threshold,
        id_col="doc_id",
    ).select("doc_id")
    return docs.join(F.broadcast(drops), "doc_id", "anti")


def token_budget_gate(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Keep each source's best documents until its token budget is
    spent (q196 semantics — descending quality with doc_id tie-break,
    per-source running token total). The 'best N tokens per domain'
    mix builder; no-op when the budget is None."""
    if cfg.token_budget is None:
        return docs
    w = (
        W.partitionBy("source")
        .orderBy(F.round(quality_score_col(), 6).desc(), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    n_tok = F.size(F.split("text", " "))
    return (
        docs.withColumn("_cum_tok", F.sum(n_tok).over(w))
        .filter(F.col("_cum_tok") <= cfg.token_budget)
        .drop("_cum_tok")
    )


def quality_score_col() -> F.Column:
    """Stopword-density quality score (q108/q110/q120's shared metric)."""
    toks = F.split(F.col("text"), " ")
    return (
        F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and"))) * 1.0
        / F.size(toks)
    )


def source_caps(docs: DataFrame, cfg: PipelineConfig) -> DataFrame:
    """Keep the top-``cfg.source_cap`` docs per source by quality score
    (q108 semantics; WindowGroupLimit partial top-k). No-op when the
    cap is None."""
    if cfg.source_cap is None:
        return docs
    w = W.partitionBy("source").orderBy(
        quality_score_col().desc(), F.col("doc_id")
    )
    return (
        docs.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= cfg.source_cap)
        .drop("_rk")
    )


def annotate_curriculum_and_packing(
    docs: DataFrame, cfg: PipelineConfig
) -> DataFrame:
    """Attach the training-order metadata: ``quality_bin`` (ntile of
    the quality score — q120 semantics) and per-split concat-then-chunk
    packing offsets (q59 semantics with the window PARTITIONED BY
    split, the documented scale form — no global sort)."""
    wq = W.orderBy(quality_score_col(), F.col("doc_id"))
    wp = W.partitionBy("split").orderBy("doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    n_tokens = F.size(F.split("text", " "))
    return (
        docs.withColumn("quality_bin", F.ntile(cfg.curriculum_bins).over(wq))
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "start_offset", F.coalesce(F.sum("n_tokens").over(wp), F.lit(0))
        )
        .withColumn(
            "pack_bin", (F.col("start_offset") / cfg.pack_budget).cast("long")
        )
    )


def run(
    docs: DataFrame,
    cfg: PipelineConfig | None = None,
    embeddings: DataFrame | None = None,
) -> DataFrame:
    """Run the full pipeline, recording per-stage survivor counts in
    cfg.stage_counts (each count is one scalar aggregate — acceptable
    job boundaries; drop them for a single-job production run). Pass
    ``embeddings`` (doc_id, v) to enable the semantic-dedup stage."""
    cfg = cfg or PipelineConfig()
    stages = [
        ("raw", docs),
        ("quality", quality_gate(docs, cfg)),
    ]
    stages.append(("exact_dedup", exact_dedup(stages[-1][1])))
    # Checkpoint after the expensive subgraphs (LSH/components; bigram
    # LM): each later stage count and the returned frame would otherwise
    # re-execute the full upstream lineage once per action.
    stages.append(("near_dedup", near_dedup(stages[-1][1], cfg).localCheckpoint()))
    if embeddings is not None:
        stages.append(
            ("semantic", semantic_dedup(stages[-1][1], embeddings, cfg))
        )
    stages.append(("spans", span_gate(stages[-1][1], cfg).localCheckpoint()))
    stages.append(("fluency", fluency_gate(stages[-1][1], cfg).localCheckpoint()))
    stages.append(("caps", source_caps(stages[-1][1], cfg)))
    stages.append(("budget", token_budget_gate(stages[-1][1], cfg)))
    stages.append(("mix", language_mix(stages[-1][1], cfg)))
    stages.append(("split", split_assignment(stages[-1][1])))
    stages.append(
        ("annotate", annotate_curriculum_and_packing(stages[-1][1], cfg))
    )
    for name, df in stages:
        cfg.stage_counts[name] = df.count()
    return stages[-1][1]
