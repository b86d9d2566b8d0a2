"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is the deliverable here: typed metadata
struct alongside a ``binary`` payload, Arrow-batched ``mapInPandas``
transforms (one Python crossing per batch), and partition-size-aware
repartitioning so a 100 TB media corpus streams through executors in
bounded memory. The native codec libraries (PIL/ffmpeg/torchaudio) are
NOT in this container, but PNG, BMP, GIF, baseline JPEG, and WAV all
decode for REAL in pure numpy/stdlib (``operators/codecs.py``: zlib
inflate + row unfilter, raw BGR rows, full LZW, huffman+IDCT in
``operators/jpeg.py``, ``wave`` PCM) — ``decoder="stdlib"`` runs actual
pixel/sample feature extraction end to end. ``decoder="fake"`` is the
deterministic test stand-in; ``decoder="pil"``/``"ffmpeg"`` raise
NotImplementedError with the dependency named (inter-frame video
codecs need native libraries; baseline AND progressive JPEG decode
in pure numpy).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("feat_dim", T.IntegerType(), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic fake media corpus (payload = seeded bytes) for tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"{kind}-{i}".encode()).digest() * 8  # 256 B
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (64 + i % 4, 48, 16000, 10 + i % 5, "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real decoder: bytes → unit-norm floats."""
    h = hashlib.sha512(payload or b"").digest()
    vals = [(h[i % len(h)] / 255.0) * 2 - 1 for i in range(dim)]
    nrm = sum(v * v for v in vals) ** 0.5 or 1.0
    return [v / nrm for v in vals]


def extract_features(
    df: DataFrame, dim: int = 16, decoder: str = "fake", batch_hint: int = 1024
) -> DataFrame:
    """Binary payload → feature vector via Arrow-batched mapInPandas.

    decoder:
    - ``"stdlib"`` — REAL decode: PNG/BMP/GIF/baseline-JPEG pixels
      (zlib + row unfilter / raw / LZW / huffman+IDCT) → channel stats
      + luminance histogram; WAV PCM → RMS/ZCR/FFT bands
      (`operators/codecs.py`, `operators/jpeg.py`). Rows whose bytes
      aren't decodable (e.g. truncated files) yield a null feature
      instead of failing the task — at corpus scale a bad file must
      never kill a stage.
    - ``"fake"`` — deterministic bytes→vector stand-in (unit tests).
    - ``"pil"``/``"ffmpeg"`` — named-dependency NotImplementedError.

    At scale: the input should be repartitioned so each task holds
    ~payload_size×batch rows in memory; the transform is stateless, so
    executors scale horizontally and failures retry per-partition.
    """
    if decoder not in ("fake", "stdlib"):
        raise NotImplementedError(
            f"decoder={decoder!r} needs the real codec libraries (PIL/ffmpeg), "
            "which are not installed in this environment; use decoder='stdlib' "
            "(PNG/BMP/GIF/JPEG/WAV) or decoder='fake'"
        )

    def decode_one(payload, dim: int):
        if payload is None:
            return None
        b = bytes(payload)
        if decoder == "fake":
            return _fake_decode(b, dim)
        from .codecs import audio_features, decode_image, decode_wav, image_features

        try:
            if b[:4] == b"RIFF":
                samples, sr = decode_wav(b)
                return audio_features(samples, sr, dim)
            return image_features(decode_image(b), dim)
        except Exception:  # noqa: BLE001 — undecodable bytes → null row
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_one(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": [dim if f is not None else None for f in feats],
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        # png|gif|bmp|jpeg|wav|avi|mp4|mp3; for video: sample_rate=fps,
        # n_samples=n_frames; for mp3: n_samples=rate*duration estimate
        T.StructField("format", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("payload_bytes", T.LongType(), True),
    ]
)


def _probe_bytes(b: bytes | None) -> tuple:
    """(format, width, height, sample_rate, channels, n_samples) parsed
    from real container headers — pure stdlib byte math, no codec libs.
    Unknown/corrupt payloads probe as (None, …)."""
    if not b or len(b) < 10:
        return (None, None, None, None, None, None)
    try:
        if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
            return (
                "png",
                int.from_bytes(b[16:20], "big"),
                int.from_bytes(b[20:24], "big"),
                None,
                None,
                None,
            )
        if b[:6] in (b"GIF87a", b"GIF89a"):
            return (
                "gif",
                int.from_bytes(b[6:8], "little"),
                int.from_bytes(b[8:10], "little"),
                None,
                None,
                None,
            )
        if b[:2] == b"BM" and len(b) >= 26:
            return (
                "bmp",
                int.from_bytes(b[18:22], "little", signed=True),
                abs(int.from_bytes(b[22:26], "little", signed=True)),
                None,
                None,
                None,
            )
        if b[:2] == b"\xff\xd8":  # JPEG: walk marker segments to a SOF
            i = 2
            while i + 9 < len(b) and b[i] == 0xFF:
                marker = b[i + 1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    return (
                        "jpeg",
                        int.from_bytes(b[i + 7 : i + 9], "big"),
                        int.from_bytes(b[i + 5 : i + 7], "big"),
                        None,
                        None,
                        None,
                    )
                i += 2 + int.from_bytes(b[i + 2 : i + 4], "big")
            return ("jpeg", None, None, None, None, None)
        if b[:4] == b"RIFF" and b[8:12] == b"WAVE":  # walk RIFF chunks
            rate = ch = bits = None
            n_samples = None
            i = 12
            while i + 8 <= len(b):
                cid = b[i : i + 4]
                size = int.from_bytes(b[i + 4 : i + 8], "little")
                if cid == b"fmt " and i + 24 <= len(b):
                    ch = int.from_bytes(b[i + 10 : i + 12], "little")
                    rate = int.from_bytes(b[i + 12 : i + 16], "little")
                    bits = int.from_bytes(b[i + 22 : i + 24], "little")
                elif cid == b"data" and ch and bits:
                    n_samples = size // max(1, ch * bits // 8)
                i += 8 + size + (size & 1)  # chunks are 2-byte aligned
            return ("wav", None, None, rate, ch, n_samples)
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            from .video import probe_avi

            w, h, n_frames, fps = probe_avi(b)
            return ("avi", w, h, int(fps), None, n_frames)
        if len(b) >= 12 and b[4:8] == b"ftyp":
            from .video import probe_mp4

            w, h, dur = probe_mp4(b)
            return ("mp4", w or None, h or None, None, None, int(dur) or None)
        if b[:3] == b"ID3" or (b[0] == 0xFF and (b[1] & 0xE0) == 0xE0):
            from .video import probe_mp3

            _bitrate, rate, dur = probe_mp3(b)
            return ("mp3", None, None, rate, None, int(dur * rate))
    except Exception:
        pass
    return (None, None, None, None, None, None)


def probe_media(df: DataFrame, id_col: str = "media_id", payload_col: str = "payload") -> DataFrame:
    """Parse real container headers (PNG/GIF/BMP/JPEG SOF/WAV RIFF,
    AVI avih, MP4 moov boxes, MP3 frame sync) out of the binary payload
    — format, dimensions, audio/video geometry.

    Header probing is pure byte math: it runs for real here and at
    100 TB stays an Arrow-batched, stateless ``mapInPandas`` stage —
    one Python crossing per batch, per-partition retries, no driver
    involvement. This is the ingest step that populates
    ``MEDIA_SCHEMA.meta`` from raw crawled bytes.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probed = [_probe_bytes(bytes(p) if p is not None else None) for p in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "format": [p[0] for p in probed],
                    "width": [p[1] for p in probed],
                    "height": [p[2] for p in probed],
                    "sample_rate": [p[3] for p in probed],
                    "channels": [p[4] for p in probed],
                    "n_samples": [p[5] for p in probed],
                    "payload_bytes": [
                        len(p) if p is not None else 0 for p in pdf[payload_col]
                    ],
                }
            )

    return df.mapInPandas(run, schema=PROBE_SCHEMA)


FRAME_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_no", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def extract_frame_features(
    df: DataFrame, every_n: int = 2, dim: int = 16
) -> DataFrame:
    """REAL video decode: sample every n-th frame of MJPEG-AVI payloads
    and feature-extract the decoded pixels (`operators/video.py` +
    `operators/jpeg.py`, pure numpy — no codec libraries).

    Only the sampled frames pay the JPEG decode. Non-AVI / undecodable
    payloads yield zero rows rather than failing the task. At 100 TB
    this is the same stateless Arrow-batched mapInPandas shape as
    extract_features: partition by payload size, scale executors.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import image_features
        from .video import avi_frame_chunks, decode_avi_mjpeg

        for pdf in batches:
            ids, frame_nos, feats = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                try:
                    n = len(avi_frame_chunks(b))
                    keep = list(range(0, n, every_n))
                    frames = decode_avi_mjpeg(b, keep)
                except Exception:  # noqa: BLE001 — bad payloads drop, never kill
                    continue
                for fno, img in zip(keep, frames):
                    ids.append(mid)
                    frame_nos.append(fno)
                    feats.append(image_features(img, dim))
            if ids:  # empty frames mis-type the list<float> column for Arrow
                yield pd.DataFrame(
                    {"media_id": ids, "frame_no": frame_nos, "feature": feats}
                )

    return df.mapInPandas(run, schema=FRAME_FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling over *metadata*: explode frame indices, keep
    every n-th — pure column ops (sequence + filter), no decode. The
    byte-level path is :func:`extract_frame_features`.
    """
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
    kept = F.filter(frames, lambda i: i % every_n == 0)
    return df.select(
        "media_id",
        F.explode(kept).alias("frame_no"),
        F.col("meta.format").alias("format"),
    )


TRANSCODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("out_format", T.StringType(), True),
    ]
)


def transcode_media(
    df: DataFrame, max_side: int = 64, out_format: str = "png", quality: int = 90
) -> DataFrame:
    """REAL byte-level resize + format conversion: decode any supported
    image payload (PNG/BMP/GIF/baseline-JPEG), nearest-downscale to
    ``max_side``, re-encode as ``png`` or ``jpeg`` — all pure
    numpy/stdlib inside Arrow-batched mapInPandas.

    Undecodable payloads yield a null payload row (never fail the task).
    At 100 TB this is the thumbnail/normalization pass of a media
    pipeline: stateless, scales with executors, output column is the new
    binary payload ready for write-out or feature extraction.
    """
    if out_format not in ("png", "jpeg"):
        raise ValueError("out_format must be 'png' or 'jpeg'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import decode_image, encode_png, resize_nearest
        from .jpeg import encode_jpeg

        for pdf in batches:
            payloads, widths, heights, formats = [], [], [], []
            for p in pdf["payload"]:
                try:
                    img = resize_nearest(decode_image(bytes(p)), max_side)
                    if img.shape[2] == 4:  # drop alpha for uniform output
                        img = img[..., :3]
                    if out_format == "png":
                        if img.shape[2] == 1:
                            img = img.repeat(3, axis=2)
                        data = encode_png(img)
                    else:
                        data = encode_jpeg(img, quality=quality)
                    payloads.append(bytearray(data))
                    heights.append(img.shape[0])
                    widths.append(img.shape[1])
                    formats.append(out_format)
                except Exception:  # noqa: BLE001 — bad bytes → null row
                    payloads.append(None)
                    widths.append(None)
                    heights.append(None)
                    formats.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": widths,
                    "height": heights,
                    "out_format": formats,
                }
            )

    return df.mapInPandas(run, schema=TRANSCODE_SCHEMA)


def resize_meta(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Metadata-level resize planning: target dims preserving aspect ratio.

    Plain column math, stays JVM-side — use it to partition/plan before
    paying decode. The byte-level path is :func:`transcode_media`.
    """
    w, h = F.col("meta.width"), F.col("meta.height")
    scale = F.least(F.lit(max_side) / w, F.lit(max_side) / h, F.lit(1.0))
    return df.select(
        "media_id",
        "kind",
        w.alias("src_w"),
        h.alias("src_h"),
        F.round(w * scale).cast("int").alias("dst_w"),
        F.round(h * scale).cast("int").alias("dst_h"),
    )
