"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is the deliverable here: typed metadata
struct alongside a ``binary`` payload, Arrow-batched ``mapInPandas``
transforms (one Python crossing per batch), and partition-size-aware
repartitioning so a 100 TB media corpus streams through executors in
bounded memory. The actual codecs (PIL/ffmpeg/torchaudio) are NOT in
this container, so decode bodies are stubbed: ``decoder="fake"`` gives
a deterministic pure-Python decode for tests; ``decoder="pil"`` etc.
raise NotImplementedError at call time with the dependency named.
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

    At scale: the input should be repartitioned so each task holds
    ~payload_size×batch rows in memory; the transform is stateless, so
    executors scale horizontally and failures retry per-partition.
    """
    if decoder != "fake":
        raise NotImplementedError(
            f"decoder={decoder!r} needs the real codec libraries (PIL/ffmpeg), "
            "which are not installed in this environment; use decoder='fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "feat_dim": [dim] * len(pdf),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """Video frame sampling: explode frame indices, keep every n-th.

    Pure column ops (sequence + filter) — the real frame *decode* would
    chain extract_features on the sampled (media_id, frame_no) pairs.
    """
    frames = F.sequence(F.lit(0), F.col("meta.n_frames") - 1)
    kept = F.filter(frames, lambda i: i % every_n == 0)
    return df.select(
        "media_id",
        F.explode(kept).alias("frame_no"),
        F.col("meta.format").alias("format"),
    )


def resize_meta(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Metadata-level resize planning: target dims preserving aspect ratio.

    The byte-level resample is decoder territory (stubbed); computing the
    target geometry is plain column math and stays JVM-side.
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
