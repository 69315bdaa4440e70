"""Multimodal columns: opaque binary media + typed metadata.

Design for the LLM-data-pipeline surface (SURVEY §7 step 10): media
(image/audio/video) are **opaque `binary` columns** with a typed
metadata struct riding alongside — the lake never interprets the bytes
until a decode stage asks it to. Cheap byte-level operators (length,
hash, MIME sniff) are pure JVM column expressions; decode / feature
extraction / resize / frame-sampling are Arrow-batched `mapInPandas`
stages so the bytes cross to Python once per batch, not per row.

Codec strategy: `decode_media` tries REAL codecs first, per kind —
PIL for images, stdlib `wave` (always present) then soundfile for
audio, av for video — and falls back to a clearly-marked deterministic
fake (bytes → uint8 array) when the codec is absent or the payload
isn't a valid container. Every output row carries a `decode_path`
column naming which decoder actually ran ("pil" / "wave" /
"soundfile" / "av" / "fake"), so a pipeline can audit exactly how much
of its corpus got a real decode. The WAV path is exercised for real in
this container (stdlib `wave` + synthetic RIFF payloads in tests); the
PIL/av paths activate wherever those codecs exist, with zero plumbing
changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("blob", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("channels", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("duration_s", T.DoubleType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_KINDS = ["image", "audio", "video"]
_MIMES = {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from the documents table: blob =
    utf-8 bytes of the text (a stand-in payload with real binary
    semantics), kind round-robins by doc_id. Metadata is derived from
    the blob length so every engine can recompute it."""
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int"))
    blob = F.encode(F.col("text"), "UTF-8")
    blen = F.length(blob)
    meta = F.struct(
        F.element_at(
            F.create_map(*[F.lit(x) for kv in _MIMES.items() for x in kv]), kind
        ).alias("mime"),
        (blen % 640 + 1).cast("int").alias("width"),
        (blen % 480 + 1).cast("int").alias("height"),
        F.lit(3).alias("channels"),
        F.lit(16000).alias("sample_rate"),
        (blen / 1000.0).alias("duration_s"),
        (blen % 24 + 1).cast("int").alias("n_frames"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"), blob.alias("blob"), meta.alias("meta")
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Byte-level metadata — pure JVM expressions, no Python:
    size, content hash (dedup key), MIME sniff from the magic prefix."""
    return media.select(
        "media_id",
        "kind",
        F.length("blob").alias("byte_len"),
        F.sha2(F.col("blob"), 256).alias("sha256"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def _fake_decode(blob: bytes, kind: str) -> np.ndarray:
    """DETERMINISTIC FAKE decode (the fallback when no codec applies):
    bytes → uint8 array. Real decoders run first in `_decode_any`; the
    surrounding plumbing is identical either way."""
    return np.frombuffer(blob or b"\x00", dtype=np.uint8)


def _codec_modules() -> dict:
    """Optional codec imports, resolved once per Python worker. stdlib
    `wave` is always present; PIL / soundfile / av load where installed.
    Executor-side (called inside mapInPandas), so a heterogeneous
    cluster degrades per-worker rather than failing the job."""
    mods: dict = {"wave": __import__("wave")}
    try:  # pragma: no cover - depends on container contents
        from PIL import Image  # noqa: PLC0415

        mods["pil"] = Image
    except ImportError:
        pass
    try:  # pragma: no cover
        import soundfile  # noqa: PLC0415

        mods["soundfile"] = soundfile
    except ImportError:
        pass
    try:  # pragma: no cover
        import av  # noqa: PLC0415

        mods["av"] = av
    except ImportError:
        pass
    return mods


def _decode_any(blob: bytes, kind: str, mods: dict) -> tuple[np.ndarray, str]:
    """Real-codec-first decode: returns (uint8 samples, decode_path).
    Invalid payloads or missing codecs fall back to the deterministic
    fake — per ROW, so one corrupt blob never fails a batch."""
    import io  # noqa: PLC0415

    if blob:
        if kind == "image" and "pil" in mods:
            try:  # pragma: no cover - PIL absent in this container
                img = mods["pil"].open(io.BytesIO(blob))
                return np.asarray(img, dtype=np.uint8).ravel(), "pil"
            except Exception:  # noqa: BLE001 - not a decodable image
                pass
        if kind == "audio":
            try:
                with mods["wave"].open(io.BytesIO(blob), "rb") as wf:
                    pcm = wf.readframes(wf.getnframes())
                return np.frombuffer(pcm, dtype=np.uint8), "wave"
            except Exception:  # noqa: BLE001 - not a RIFF/WAV payload
                pass
            if "soundfile" in mods:
                try:  # pragma: no cover - soundfile absent here
                    data, _sr = mods["soundfile"].read(io.BytesIO(blob))
                    return (
                        np.clip((data + 1.0) * 127.5, 0, 255).astype(np.uint8).ravel(),
                        "soundfile",
                    )
                except Exception:  # noqa: BLE001
                    pass
        if kind == "video" and "av" in mods:
            try:  # pragma: no cover - av absent in this container
                with mods["av"].open(io.BytesIO(blob)) as container:
                    frames = [
                        np.asarray(fr.to_ndarray(format="gray"), dtype=np.uint8)
                        for fr in container.decode(video=0)
                    ]
                if frames:
                    return np.concatenate([f.ravel() for f in frames]), "av"
            except Exception:  # noqa: BLE001
                pass
    return _fake_decode(blob, kind), "fake"


def decode_media(media: DataFrame, out_dim: int = 64) -> DataFrame:
    """Decode + fixed-dim feature extraction as one mapInPandas stage
    (bytes cross to Python once, Arrow-batched). Feature = normalized
    byte histogram folded to out_dim bins over the DECODED samples —
    deterministic for the fake and the stdlib-wave paths, so tests pin
    exact values; a real embedding model slots into the same stage.
    `decode_path` names the decoder that actually ran per row."""
    fields = media.schema.fieldNames()

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        mods = _codec_modules()
        for pdf in batches:
            feats, paths = [], []
            for blob, kind in zip(pdf["blob"], pdf["kind"]):
                arr, path = _decode_any(
                    bytes(blob) if blob is not None else b"", kind, mods
                )
                hist = np.bincount(arr % out_dim, minlength=out_dim).astype("float64")
                s = hist.sum()
                feats.append((hist / s if s else hist).tolist())
                paths.append(path)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "decode_path": paths,
                }
            )

    assert {"media_id", "kind", "blob"} <= set(fields)
    return media.mapInPandas(
        _extract,
        "media_id long, kind string, feature array<double>, decode_path string",
    )


def audio_frame_stats(media: DataFrame, frame_len: int = 256) -> DataFrame:
    """Per-frame PCM stats for audio payloads as one Arrow-batched
    mapInPandas stage: the blob crosses to Python once, gets chunked
    into ``frame_len``-sample frames, and comes back as (media_id,
    frame_idx, n_samples, sum_sq). The stage emits ONLY exact integers
    (numpy int64 sums) — the RMS itself is computed JVM-side as a
    single sqrt/divide, so the result is bit-identical on any engine
    and any partitioning. A real audio pipeline swaps the uint8 view
    for a PCM decode; the batch plumbing is identical."""
    fields = media.schema.fieldNames()

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids: list[int] = []
            idxs: list[int] = []
            ns: list[int] = []
            s2s: list[int] = []
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                arr = np.frombuffer(
                    bytes(blob) if blob is not None else b"", dtype=np.uint8
                ).astype(np.int64)
                for fi in range(0, len(arr), frame_len):
                    chunk = arr[fi : fi + frame_len]
                    mids.append(int(mid))
                    idxs.append(fi // frame_len)
                    ns.append(int(chunk.size))
                    s2s.append(int((chunk * chunk).sum()))
            yield pd.DataFrame(
                {"media_id": mids, "frame_idx": idxs, "n_samples": ns, "sum_sq": s2s}
            )

    assert {"media_id", "blob"} <= set(fields)
    return media.select("media_id", "blob").mapInPandas(
        _frames, "media_id long, frame_idx long, n_samples long, sum_sq long"
    )


def sample_frames(media: DataFrame, k: int = 4) -> DataFrame:
    """Frame-sampling for video blobs: split the payload into
    meta.n_frames equal chunks, keep k evenly spaced — the Spark-side
    shape (explode to one row per kept frame, frame index + bytes) is
    exactly what a real demuxer feeds downstream."""
    n = F.col("meta.n_frames")
    frame_len = F.greatest(F.floor(F.length("blob") / n), F.lit(1)).cast("int")
    idxs = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        # clamp to n-1: for n=1 the even spacing would otherwise emit a
        # phantom frame index 1 that doesn't exist
        lambda i: F.least(
            (i * F.greatest(n - 1, F.lit(1)) / F.lit(max(k - 1, 1))).cast("int"),
            n - 1,
        ),
    )
    frames = F.transform(
        F.array_distinct(idxs),
        lambda fi: F.struct(
            fi.alias("frame_idx"),
            F.substring(F.col("blob"), (fi * frame_len + 1).cast("int"), frame_len).alias("frame_bytes"),
        ),
    )
    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", F.explode(frames).alias("fr"))
        .select("media_id", F.col("fr.frame_idx").alias("frame_idx"), F.col("fr.frame_bytes").alias("frame_bytes"))
    )


def resize_raw(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize over the RAW byte grid — a real resample,
    no codec needed: the blob is interpreted as a row-major
    (meta.height × meta.width) uint8 grid (zero-padded when the payload
    is shorter), and the output samples src[i*h//H, j*w//W]. This is
    the exact arithmetic a nearest-neighbor image downscale performs
    after decode; for codec formats (PNG/JPEG) `resize_image_stub`
    below marks where the decoder slots in front of this."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_idx = np.arange(out_h)
        cols_idx = np.arange(out_w)
        for pdf in batches:
            out_blobs, checksums = [], []
            for blob, w, h in zip(pdf["blob"], pdf["width"], pdf["height"]):
                arr = np.frombuffer(bytes(blob) if blob is not None else b"", dtype=np.uint8)
                grid = np.zeros(int(w) * int(h), dtype=np.uint8)
                grid[: min(arr.size, grid.size)] = arr[: grid.size]
                grid = grid.reshape(int(h), int(w))
                sampled = grid[np.ix_(rows_idx * int(h) // out_h, cols_idx * int(w) // out_w)]
                out_blobs.append(sampled.tobytes())
                checksums.append(int(sampled.sum()))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "resized": out_blobs,
                    "checksum": checksums,
                }
            )

    flat = media.filter(F.col("kind") == "image").select(
        "media_id", "blob", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return flat.mapInPandas(_resize, "media_id long, resized binary, checksum long")


def resize_image_stub(media: DataFrame, w: int, h: int) -> DataFrame:
    """Codec-format image resize: runs PIL when the codec is installed
    (optional import, resolved per worker); raises otherwise rather
    than silently fake a decode. The real resample arithmetic is
    implemented and tested codec-free in `resize_raw` above — this
    operator only adds the PNG/JPEG decode in front of it."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io  # noqa: PLC0415

        try:  # pragma: no cover - PIL absent in this container
            from PIL import Image  # noqa: PLC0415
        except ImportError as e:
            raise NotImplementedError(
                "image decode/resize needs PIL, which is not installed; "
                "the codec-free resample path is multimodal.resize_raw"
            ) from e
        for pdf in batches:  # pragma: no cover - PIL absent here
            out = [
                Image.open(io.BytesIO(bytes(b))).resize((w, h)).tobytes()
                for b in pdf["blob"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "blob": out})

    return media.filter(F.col("kind") == "image").mapInPandas(
        _resize, "media_id long, blob binary"
    )
