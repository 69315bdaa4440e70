"""Multimodal batch 19 (q264-q266): the PLANNING half of a multimodal
training pipeline — ASR audio chunking (fixed windows with overlap
over sample counts), ViT-style image tile grids (patch coordinates
with edge handling), and cross-modality token-equivalent budgeting
(the mixture-capping move generalized beyond text). The decode step
itself stays behind multimodal.decode_media's documented deterministic
fake (codecs absent in this container); these queries are the real
Spark-side plumbing that surrounds it — offsets, grids and budgets are
pure integer arithmetic over the same synthesized metadata as
q37-q39, so every one is fully oracle-checked.

Media synthesis contract (multimodal.synth_media, mirrored in the
oracles): kind = doc_id % 3 (0 image / 1 audio / 2 video),
byte_len = octet_length(text), width = byte_len % 640 + 1,
height = byte_len % 480 + 1. Audio sample count is byte_len * 3000
(a synthetic stand-in for PCM length at 16 kHz).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import ensure_parallelism, load_table
from . import query

SAMPLE_RATE = 16000
CHUNK = 10 * SAMPLE_RATE  # 10-s ASR windows
STRIDE = 8 * SAMPLE_RATE  # 2-s overlap
TILE = 64


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# q264 — ASR audio chunk plan


@query(
    "q264_audio_chunk_plan",
    oracle=f"""
    WITH audio AS (
      SELECT doc_id AS media_id,
             octet_length(CAST(text AS BLOB)) * 3000 AS n_samples
      FROM documents WHERE doc_id % 3 = 1
    ),
    planned AS (
      SELECT media_id, n_samples,
             CASE WHEN n_samples <= {CHUNK} THEN 1
                  ELSE CAST(CEIL((n_samples - {CHUNK}) * 1.0 / {STRIDE}) AS BIGINT) + 1
             END AS n_chunks
      FROM audio
    ),
    chunks AS (
      SELECT media_id, n_samples, n_chunks,
             unnest(range(0, n_chunks)) AS chunk_idx
      FROM planned
    )
    SELECT media_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
           CAST(chunk_idx * {STRIDE} AS BIGINT) AS start_sample,
           CAST(LEAST(chunk_idx * {STRIDE} + {CHUNK}, n_samples) AS BIGINT)
             AS end_sample,
           chunk_idx = n_chunks - 1 AS is_last
    FROM chunks
    ORDER BY media_id, chunk_idx
    """,
)
def q264_audio_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASR chunking plan: split each audio blob into 10-second windows
    with 2-second overlap (the Whisper-style long-form recipe) —
    emitted as (chunk_idx, start_sample, end_sample) offset rows the
    decode stage consumes, with the final partial window clamped to
    the stream length and a single-window path for short clips. The
    chunk COUNT derives closed-form (no loop): 1 + ceil((n - chunk)
    / stride) windows cover every sample with the given overlap.

    Plan: map-side arithmetic + an index-range explode (the q60
    economics — offsets explode, bytes don't move); no shuffle at all
    until the output sort. At 100 TB the chunk plan joins back to the
    blob column co-partitioned on media_id for the actual decode."""
    audio = _docs(spark, sf_dir).filter(F.col("doc_id") % 3 == 1).select(
        F.col("doc_id").alias("media_id"),
        (F.octet_length(F.col("text").cast("binary")) * 3000).alias("n_samples"),
    )
    n_chunks = F.when(F.col("n_samples") <= CHUNK, F.lit(1).cast("bigint")).otherwise(
        F.ceil((F.col("n_samples") - CHUNK) * 1.0 / STRIDE).cast("bigint") + 1
    )
    planned = audio.withColumn("n_chunks", n_chunks)
    chunks = planned.select(
        "media_id",
        "n_samples",
        "n_chunks",
        F.explode(F.sequence(F.lit(0).cast("bigint"), F.col("n_chunks") - 1)).alias(
            "chunk_idx"
        ),
    )
    return chunks.select(
        "media_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (F.col("chunk_idx") * STRIDE).cast("bigint").alias("start_sample"),
        F.least(F.col("chunk_idx") * STRIDE + CHUNK, F.col("n_samples"))
        .cast("bigint")
        .alias("end_sample"),
        (F.col("chunk_idx") == F.col("n_chunks") - 1).alias("is_last"),
    ).orderBy("media_id", "chunk_idx")


# ---------------------------------------------------------------------------
# q265 — image tile grid plan


@query(
    "q265_image_tile_plan",
    oracle=f"""
    WITH images AS (
      SELECT doc_id AS media_id,
             (octet_length(CAST(text AS BLOB)) % 640 + 1) AS w,
             (octet_length(CAST(text AS BLOB)) % 480 + 1) AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    grids AS (
      SELECT media_id, w, h,
             CAST(CEIL(w * 1.0 / {TILE}) AS BIGINT) AS tiles_x,
             CAST(CEIL(h * 1.0 / {TILE}) AS BIGINT) AS tiles_y
      FROM images
    )
    SELECT media_id, CAST(w AS INTEGER) AS w, CAST(h AS INTEGER) AS h,
           tiles_x, tiles_y,
           tiles_x * tiles_y AS n_tiles,
           CAST(w - (tiles_x - 1) * {TILE} AS BIGINT) AS last_col_width,
           CAST(h - (tiles_y - 1) * {TILE} AS BIGINT) AS last_row_height,
           CAST(CASE WHEN w % {TILE} = 0 AND h % {TILE} = 0 THEN 0
                ELSE tiles_x * tiles_y
                     - (CASE WHEN w % {TILE} = 0 THEN tiles_x ELSE tiles_x - 1 END)
                       * (CASE WHEN h % {TILE} = 0 THEN tiles_y ELSE tiles_y - 1 END)
                END AS BIGINT) AS n_partial_tiles
    FROM grids
    ORDER BY media_id
    """,
)
def q265_image_tile_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style tile grid plan: per image, the 64x64 patch grid with
    explicit edge handling — ceil-divided tile counts, the ragged
    last-column/last-row extents, and how many tiles are partial (the
    ones a preprocessor pads) — the coordinate plan a patch-extraction
    mapInPandas consumes. Everything is closed-form integer
    arithmetic from the (width, height) metadata.

    Plan: pure map-side expressions; zero shuffles before the output
    sort. The per-tile EXPLODE is deliberately left to the consumer —
    shipping the 6-number grid summary instead of n_tiles rows is the
    bandwidth-respecting contract at 100 TB."""
    img = _docs(spark, sf_dir).filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("media_id"),
        (F.octet_length(F.col("text").cast("binary")) % 640 + 1).alias("w"),
        (F.octet_length(F.col("text").cast("binary")) % 480 + 1).alias("h"),
    )
    tiles_x = F.ceil(F.col("w") * 1.0 / TILE).cast("bigint")
    tiles_y = F.ceil(F.col("h") * 1.0 / TILE).cast("bigint")
    g = img.withColumn("tiles_x", tiles_x).withColumn("tiles_y", tiles_y)
    full_x = F.when(F.col("w") % TILE == 0, F.col("tiles_x")).otherwise(
        F.col("tiles_x") - 1
    )
    full_y = F.when(F.col("h") % TILE == 0, F.col("tiles_y")).otherwise(
        F.col("tiles_y") - 1
    )
    return g.select(
        "media_id",
        F.col("w").cast("int").alias("w"),
        F.col("h").cast("int").alias("h"),
        "tiles_x",
        "tiles_y",
        (F.col("tiles_x") * F.col("tiles_y")).alias("n_tiles"),
        (F.col("w") - (F.col("tiles_x") - 1) * TILE).cast("bigint").alias(
            "last_col_width"
        ),
        (F.col("h") - (F.col("tiles_y") - 1) * TILE).cast("bigint").alias(
            "last_row_height"
        ),
        F.when((F.col("w") % TILE == 0) & (F.col("h") % TILE == 0), F.lit(0))
        .otherwise(F.col("tiles_x") * F.col("tiles_y") - full_x * full_y)
        .cast("bigint")
        .alias("n_partial_tiles"),
    ).orderBy("media_id")


# ---------------------------------------------------------------------------
# q266 — cross-modality token budget


@query(
    "q266_modal_token_budget",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             (['image','audio','video'])[(doc_id % 3)::INT + 1] AS kind,
             octet_length(CAST(text AS BLOB)) AS blen,
             len(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    equiv AS (
      SELECT doc_id, kind,
             CASE kind
               WHEN 'image' THEN
                 CAST(CEIL((blen % 640 + 1) * 1.0 / {TILE}) AS BIGINT)
                 * CAST(CEIL((blen % 480 + 1) * 1.0 / {TILE}) AS BIGINT)
               WHEN 'audio' THEN
                 CAST(CEIL(blen * 3000.0 / {STRIDE}) AS BIGINT)
               ELSE (blen % 24 + 1) * 16
             END + n_words AS tok_equiv,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS pri
      FROM base
    ),
    ranked AS (
      SELECT doc_id, kind, tok_equiv,
             SUM(tok_equiv) OVER (PARTITION BY kind ORDER BY pri, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS running
      FROM equiv
    ),
    kept AS (SELECT * FROM ranked WHERE running <= 40000)
    SELECT kind,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tok_equiv) AS BIGINT) AS total_tokens,
           CAST(MAX(running) AS BIGINT) AS budget_used
    FROM kept
    GROUP BY kind
    ORDER BY kind
    """,
)
def q266_modal_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modality token budgeting: convert every document's media
    payload into TOKEN EQUIVALENTS — image tiles (the q265 grid),
    audio chunks-worth of frames (the q264 stride), video frames x a
    per-frame patch cost — plus its caption words, then admit
    documents per modality in deterministic hash-priority order until
    each modality's 40k-token budget is spent. This is q196's
    best-N-tokens move generalized to the multimodal mixture (the
    knob balancing vision/audio/text compute in a training run).

    Plan: token equivalents are map-side integer arithmetic; ONE
    shuffle partitions by kind (3 partitions) for the running-total
    window; the report is a 3-row aggregate. For a pathologically
    dominant modality, swap the per-kind window for
    operators/prefix.bucketed_cumsum keyed inside that kind — same
    values."""
    docs = _docs(spark, sf_dir)
    blen = F.octet_length(F.col("text").cast("binary"))
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    n_words = F.size(F.split("text", " "))
    tok_equiv = (
        F.when(
            kind == "image",
            F.ceil((blen % 640 + 1) * 1.0 / TILE).cast("bigint")
            * F.ceil((blen % 480 + 1) * 1.0 / TILE).cast("bigint"),
        )
        .when(kind == "audio", F.ceil(blen * 3000.0 / STRIDE).cast("bigint"))
        .otherwise(((blen % 24 + 1) * 16).cast("bigint"))
        + n_words
    )
    pri = F.expr(
        "cast(conv(substring(md5(cast(doc_id as string)),1,8),16,10) as bigint)"
    )
    equiv = docs.select(
        "doc_id",
        kind.alias("kind"),
        tok_equiv.alias("tok_equiv"),
        pri.alias("pri"),
    )
    w = (
        Window.partitionBy("kind")
        .orderBy("pri", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = equiv.withColumn("running", F.sum("tok_equiv").over(w))
    return (
        ranked.filter(F.col("running") <= 40000)
        .groupBy("kind")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("tok_equiv").cast("bigint").alias("total_tokens"),
            F.max("running").cast("bigint").alias("budget_used"),
        )
        .orderBy("kind")
    )
