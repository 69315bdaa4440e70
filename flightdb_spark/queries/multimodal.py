"""Multimodal query surface (q37-q39) over the documents table.

Media blobs are synthesized deterministically from document text
(multimodal.synth_media) so DuckDB can recompute the byte-level
metadata as an oracle. The decode/feature stage (q38) and frame
sampling (q39) are rows-only checks: their outputs are deterministic
but not reasonably SQL-expressible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import decode_media, media_metadata, sample_frames, synth_media
from ..tables import load_table
from . import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


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


@query("q38_media_features")  # rows-only: mapInPandas decode isn't SQL
def q38_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature extraction via Arrow-batched mapInPandas
    (deterministic fake decode; see multimodal.decode_media)."""
    feats = decode_media(synth_media(_docs(spark, sf_dir)), out_dim=64)
    return feats.select(
        "media_id",
        "kind",
        F.round(F.aggregate("feature", F.lit(0.0), lambda a, x: a + x), 6).alias("feature_sum"),
        F.size("feature").alias("dim"),
    )


@query("q39_frame_sample")  # rows-only: frame extraction isn't SQL
def q39_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evenly-spaced frame sampling from video blobs (k=4)."""
    frames = sample_frames(synth_media(_docs(spark, sf_dir)), k=4)
    return frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n_frames_sampled"),
        F.sum(F.length("frame_bytes")).alias("sampled_bytes"),
    )
