"""Multimodal query surface (q37-q39) over the documents table.

Media blobs are synthesized deterministically from document text
(multimodal.synth_media) so DuckDB can recompute the byte-level
metadata as an oracle. Even the decode/feature stage (q38) and frame
sampling (q39) are fully oracle-checked: the fake decode is byte
arithmetic, and since this corpus is pure ASCII (verified: max
codepoint 121, no empty docs) DuckDB can rebuild the same byte
histogram from characters. The exact 64-dim feature vectors are pinned
in tests/test_flightdb_core.py; the oracle compares scalar summaries
(integer bin counts are exact, max_frac is a single IEEE division so
it is bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.arrays import index_sequence
from ..multimodal import decode_media, media_metadata, sample_frames, synth_media
from ..operators.prefix import bucketed_cumsum
from ..tables import ensure_parallelism, load_table
from . import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Arrow-batched decode stages are per-row expensive: spread a
    # single-file local scan across cores (no-op on a real cluster).
    return ensure_parallelism(load_table(spark, sf_dir, "documents"))


@query(
    "q37_media_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           (['image','audio','video'])[(doc_id % 3)::INT + 1] AS kind,
           octet_length(CAST(text AS BLOB)) AS byte_len,
           sha256(text) AS sha256,
           CASE (doc_id % 3)::INT
             WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav' ELSE 'video/mp4'
           END AS mime,
           (octet_length(CAST(text AS BLOB)) % 640 + 1)::INT AS width,
           (octet_length(CAST(text AS BLOB)) % 480 + 1)::INT AS height
    FROM documents
    """,
)
def q37_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level media metadata — size, content hash (the dedup key),
    MIME, dimensions — pure JVM column expressions over binary blobs."""
    return media_metadata(synth_media(_docs(spark, sf_dir)))


@query(
    "q38_media_features",
    oracle="""
    WITH chars AS (
      SELECT doc_id, ascii(unnest(regexp_extract_all(text, '.'))) % 64 AS b
      FROM documents
    ),
    counts AS (
      SELECT doc_id, b, COUNT(*)::DOUBLE AS c FROM chars GROUP BY doc_id, b
    ),
    counts2 AS (
      SELECT doc_id, b, c, MAX(c) OVER (PARTITION BY doc_id) AS maxc
      FROM counts
    ),
    agg AS (
      SELECT doc_id,
             COUNT(*) AS n_nonzero_bins,
             MAX(c) AS maxc,
             SUM(c) AS s,
             MIN(b) FILTER (WHERE c = maxc) AS am
      FROM counts2 GROUP BY doc_id
    )
    SELECT doc_id AS media_id,
           (['image','audio','video'])[(doc_id % 3)::INT + 1] AS kind,
           64 AS dim,
           n_nonzero_bins,
           am AS argmax_bin,
           maxc / s AS max_frac
    FROM agg
    """,
)
def q38_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature extraction via Arrow-batched mapInPandas
    (deterministic fake decode; see multimodal.decode_media). The full
    64-dim histogram feature comes back from Python; the query surfaces
    scalar summaries of it (nonzero bins, argmax bin, max fraction)
    that the oracle recomputes from characters — exact because bin
    counts are small integers and max_frac is one double division."""
    feats = decode_media(synth_media(_docs(spark, sf_dir)), out_dim=64)
    mx = F.array_max("feature")
    return feats.select(
        "media_id",
        "kind",
        F.size("feature").alias("dim"),
        F.size(F.filter("feature", lambda x: x > 0)).alias("n_nonzero_bins"),
        (F.array_position("feature", mx) - 1).cast("long").alias("argmax_bin"),
        mx.alias("max_frac"),
    )


@query(
    "q39_frame_sample",
    oracle="""
    WITH v AS (
      SELECT doc_id AS media_id, text,
             octet_length(CAST(text AS BLOB)) AS blen,
             (octet_length(CAST(text AS BLOB)) % 24 + 1) AS n
      FROM documents WHERE doc_id % 3 = 2
    ),
    f AS (
      SELECT media_id, text,
             GREATEST(blen // n, 1) AS flen,
             list_distinct(list_transform([0, 1, 2, 3],
               i -> LEAST((i * GREATEST(n - 1, 1)) // 3, n - 1))) AS idxs
      FROM v
    ),
    e AS (SELECT media_id, text, flen, unnest(idxs) AS fi FROM f)
    SELECT media_id,
           COUNT(*) AS n_frames_sampled,
           SUM(length(substr(text, (fi * flen + 1)::INT, flen::INT)))::BIGINT AS sampled_bytes
    FROM e GROUP BY media_id
    """,
)
def q39_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling from video blobs (k=4). Fully
    byte-deterministic, so the oracle rebuilds the same frame index
    set and substring lengths from the ASCII text."""
    frames = sample_frames(synth_media(_docs(spark, sf_dir)), k=4)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.sum(F.length("frame_bytes")).alias("sampled_bytes"),
    )


@query(
    "q58_image_resize",
    oracle="""
    WITH img AS (
      SELECT doc_id AS media_id, text,
             octet_length(CAST(text AS BLOB)) AS blen,
             (octet_length(CAST(text AS BLOB)) % 640 + 1) AS w,
             (octet_length(CAST(text AS BLOB)) % 480 + 1) AS h
      FROM documents WHERE doc_id % 3 = 0
    ),
    px AS (
      SELECT media_id, text, blen,
             ((k // 16) * h // 16) * w + ((k % 16) * w // 16) AS src
      FROM img, (SELECT unnest(range(0, 256)) AS k)
    ),
    samp AS (
      SELECT media_id,
             CASE WHEN src < blen THEN ascii(substr(text, (src + 1)::INT, 1))
                  ELSE 0 END AS b
      FROM px
    )
    SELECT media_id, 16 AS out_w, 16 AS out_h, SUM(b)::BIGINT AS checksum
    FROM samp GROUP BY media_id
    """,
)
def q58_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor resize of every image blob to 16×16 over the raw
    byte grid (multimodal.resize_raw, Arrow-batched mapInPandas). The
    oracle replays the identical index arithmetic in SQL — the grid is
    zero-padded utf-8 text bytes, so every sampled byte is recomputable
    from characters."""
    from ..multimodal import resize_raw

    resized = resize_raw(synth_media(_docs(spark, sf_dir)), 16, 16)
    return resized.select(
        "media_id",
        F.lit(16).alias("out_w"),
        F.lit(16).alias("out_h"),
        "checksum",
    )


@query(
    "q90_audio_energy",
    oracle="""
    WITH a AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 1
    ),
    chars AS (
      SELECT media_id,
             ascii(unnest(regexp_extract_all(text, '.'))) AS s,
             generate_subscripts(regexp_extract_all(text, '.'), 1) AS pos
      FROM a
    ),
    fr AS (
      SELECT media_id, (pos - 1) // 256 AS frame_idx,
             CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(s * s) AS BIGINT) AS s2
      FROM chars GROUP BY media_id, (pos - 1) // 256
    ),
    r AS (
      SELECT media_id, frame_idx, sqrt(CAST(s2 AS DOUBLE) / n) AS rms FROM fr
    ),
    r2 AS (SELECT *, MAX(rms) OVER (PARTITION BY media_id) AS maxr FROM r)
    SELECT media_id,
           CAST(COUNT(*) AS BIGINT) AS n_frames,
           ROUND(MAX(rms), 6) AS peak_rms,
           MIN(CASE WHEN rms = maxr THEN frame_idx END) AS peak_frame,
           ROUND(CAST(SUM(CAST(ROUND(rms, 9) AS DECIMAL(38,9))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_rms
    FROM r2 GROUP BY media_id
    """,
)
def q90_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction: per-frame RMS energy over 256-sample
    PCM frames (uint8 view of the payload), summarized per media as
    frame count, peak frame (min index on ties), peak and mean RMS.
    The Python stage (multimodal.audio_frame_stats) emits only exact
    integer sums, Arrow-batched, after a JVM-side kind prefilter — RMS
    math happens as deterministic JVM expressions, and the mean
    accumulates per-row-rounded in DECIMAL. One shuffle on media_id
    (window + final agg are co-partitioned). NOTE: the oracle rebuilds
    the byte stream from characters (ascii() per regexp char), which
    equals the Spark side's raw-byte framing only because this corpus
    is pure single-byte ASCII without newlines (module docstring); the
    Spark implementation itself is byte-accurate for any payload."""
    from ..multimodal import audio_frame_stats

    media = synth_media(_docs(spark, sf_dir)).filter(F.col("kind") == "audio")
    frames = audio_frame_stats(media, frame_len=256)
    rms = F.sqrt(F.col("sum_sq").cast("double") / F.col("n_samples"))
    r = frames.select("media_id", "frame_idx", rms.alias("rms"))
    from pyspark.sql import Window as W

    r2 = r.withColumn("maxr", F.max("rms").over(W.partitionBy("media_id")))
    return r2.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.round(F.max("rms"), 6).alias("peak_rms"),
        F.min(F.when(F.col("rms") == F.col("maxr"), F.col("frame_idx"))).alias(
            "peak_frame"
        ),
        F.round(
            F.sum(F.round(F.col("rms"), 9).cast("decimal(38,9)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_rms"),
    )


# --- q123: interleaved multimodal sequence packing ---------------------------------
# Every doc contributes its media placeholder tokens FIRST (the [IMG]/
# [AUD]/[VID] patch-token block a vision-language trainer inserts),
# then its text tokens; docs lie end-to-end in doc_id order and are cut
# into fixed-size training sequences (q59's concat-then-chunk rule).
# Placeholder budgets per kind (doc_id % 3 mapping shared with q37):
PACK2_BUDGET = 1024
MEDIA_TOKENS = {"image": 64, "audio": 128, "video": 256}

_MEDIA_COST_SQL = (
    "CASE (doc_id % 3) WHEN 0 THEN 64 WHEN 1 THEN 128 ELSE 256 END"
)


@query(
    "q123_interleaved_packing",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id,
             {_MEDIA_COST_SQL} AS m,
             len(string_split(text, ' ')) AS t
      FROM documents
    ),
    placed AS (
      SELECT doc_id, m, t,
             COALESCE(SUM(m + t) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
      FROM sized
    ),
    spans AS (
      SELECT doc_id, m, t, s,
             UNNEST(generate_series(CAST(s // {PACK2_BUDGET} AS BIGINT),
                     CAST((s + m + t - 1) // {PACK2_BUDGET} AS BIGINT))) AS bin_id
      FROM placed
    ),
    contrib AS (
      SELECT bin_id, doc_id,
             GREATEST(0, LEAST(s + m, (bin_id + 1) * {PACK2_BUDGET})
                         - GREATEST(s, bin_id * {PACK2_BUDGET})) AS media_tok,
             GREATEST(0, LEAST(s + m + t, (bin_id + 1) * {PACK2_BUDGET})
                         - GREATEST(s + m, bin_id * {PACK2_BUDGET})) AS text_tok,
             CASE WHEN s >= bin_id * {PACK2_BUDGET}
                   AND s < (bin_id + 1) * {PACK2_BUDGET} THEN 1 ELSE 0 END
               AS media_starts
      FROM spans
    )
    SELECT bin_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(media_tok) AS BIGINT) AS media_tokens,
           CAST(SUM(text_tok) AS BIGINT) AS text_tokens,
           CAST(SUM(media_starts) AS BIGINT) AS n_media_starts
    FROM contrib GROUP BY bin_id
    """,
)
def q123_interleaved_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interleaved multimodal packing: each doc = [media placeholder
    block][text tokens], laid end-to-end and cut into 1024-token
    training sequences; output is each sequence's composition (docs
    touched, media vs text tokens, media blocks starting here) — what a
    vision-language batch builder must know per sequence. The prefix
    sum runs on operators/prefix.py:bucketed_cumsum (two bounded
    passes, no global-order window; doc_id is a distinct order key so
    offsets are engine-stable); the bin fan-out explodes
    ceil(len/budget)+1 rows per doc; every quantity is an integer clamp
    — exact on any engine and any partitioning."""
    docs = _docs(spark, sf_dir)
    b = PACK2_BUDGET

    sized = docs.select(
        "doc_id",
        F.expr(_MEDIA_COST_SQL).cast("long").alias("m"),
        F.size(F.split("text", " ")).cast("long").alias("t"),
        (F.expr(_MEDIA_COST_SQL) + F.size(F.split("text", " "))).cast(
            "long"
        ).alias("tot"),
    )
    placed = bucketed_cumsum(sized, "doc_id", ["tot"]).select(
        "doc_id", "m", "t", (F.col("cum_tot") - F.col("tot")).alias("s")
    )
    spans = placed.select(
        "doc_id",
        "m",
        "t",
        "s",
        F.explode(
            F.sequence(
                F.expr(f"s div {b}"), F.expr(f"(s + m + t - 1) div {b}")
            )
        ).alias("bin_id"),
    )
    lo = F.col("bin_id") * b
    hi = (F.col("bin_id") + 1) * b
    media_tok = F.greatest(
        F.lit(0), F.least(F.col("s") + F.col("m"), hi) - F.greatest(F.col("s"), lo)
    )
    text_tok = F.greatest(
        F.lit(0),
        F.least(F.col("s") + F.col("m") + F.col("t"), hi)
        - F.greatest(F.col("s") + F.col("m"), lo),
    )
    starts = F.when((F.col("s") >= lo) & (F.col("s") < hi), 1).otherwise(0)
    return (
        spans.select(
            "bin_id",
            media_tok.alias("media_tok"),
            text_tok.alias("text_tok"),
            starts.alias("media_starts"),
        )
        .groupBy("bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("media_tok").alias("media_tokens"),
            F.sum("text_tok").alias("text_tokens"),
            F.sum("media_starts").cast("bigint").alias("n_media_starts"),
        )
    )


# --- q154: video frame-level dedup ---------------------------------------------------
# Frames of the synthetic video blobs are fixed-length byte slices
# (ASCII corpus: char slice == byte slice, so DuckDB replays the same
# frames from text). Within-video duplicates catch still frames /
# loops; cross-video shared frames catch copied footage — the media
# twin of the q28/q130 text dedup chain.
FRAME_CHARS = 32


@query(
    "q154_frame_dedup",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 3 = 2
    ),
    frames AS (
      SELECT media_id,
             md5(substring(text, (s.g * {FRAME_CHARS} + 1)::INT, {FRAME_CHARS})) AS fh
      FROM vids, LATERAL (
        SELECT unnest(range(CAST(floor(len(text) / {FRAME_CHARS}) AS BIGINT))) AS g
      ) s
    ),
    within AS (
      SELECT media_id, fh, COUNT(*) AS c FROM frames GROUP BY media_id, fh
    ),
    spread AS (
      SELECT fh, COUNT(DISTINCT media_id) AS nm FROM frames GROUP BY fh
    )
    SELECT w.media_id,
           CAST(SUM(w.c) AS BIGINT) AS n_frames,
           CAST(SUM(w.c) - COUNT(*) AS BIGINT) AS n_dup_within,
           CAST(SUM(CASE WHEN s.nm > 1 THEN w.c ELSE 0 END) AS BIGINT)
             AS n_shared
    FROM within w JOIN spread s ON s.fh = w.fh
    GROUP BY w.media_id
    """,
)
def q154_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level dedup over the video corpus: per video, total
    frames, internal duplicate frames (stills/loops) and frames shared
    with OTHER videos (copied footage). Frames are index-sliced
    (zero-sort), hashed JVM-side; one shuffle on (media, hash) for
    within-counts, one on hash for corpus spread, re-joined on the
    hash key — the q28 exact-dedup economics applied to media
    payloads. Sub-frame videos drop like the oracle (descending-
    sequence guard, textops.py:34)."""
    docs = _docs(spark, sf_dir)
    vids = docs.filter(F.col("doc_id") % 3 == 2).select(
        F.col("doc_id").alias("media_id"), "text"
    )
    frames = vids.select(
        "media_id",
        # empty for sub-frame videos (functions/arrays.py guard)
        F.explode(
            index_sequence(F.floor(F.length("text") / FRAME_CHARS))
        ).alias("g"),
        "text",
    ).select(
        "media_id",
        F.md5(
            F.substring(
                F.col("text"), F.col("g") * FRAME_CHARS + 1, FRAME_CHARS
            )
        ).alias("fh"),
    )
    within = frames.groupBy("media_id", "fh").agg(F.count(F.lit(1)).alias("c"))
    spread = frames.groupBy("fh").agg(
        F.count_distinct("media_id").alias("nm")
    )
    return (
        within.join(spread, "fh")
        .groupBy("media_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_frames"),
            (F.sum("c") - F.count(F.lit(1))).cast("bigint").alias("n_dup_within"),
            F.sum(F.when(F.col("nm") > 1, F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_shared"),
        )
    )
