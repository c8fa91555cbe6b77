"""Multimodal column handling: opaque binary payloads + typed metadata.

Images/audio/video ride through the pipeline as `binary` columns with a
metadata struct; compute-heavy stages (decode, resize, feature-extract,
frame-sample) are Arrow-batched `mapInPandas` kernels. The actual codecs
(PIL/ffmpeg/torchaudio) are NOT installed in this environment, so the
decode core is stubbed behind an import-try with a clearly-marked
deterministic fake — the Spark-side plumbing (schemas, batch iteration,
partition sizing, UDF signatures) is real and tested, which is the part
that matters for the 100 TB plan shape.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

try:  # pragma: no cover — not installed in this sandbox
    from PIL import Image as _PIL  # noqa: N811
except ImportError:
    _PIL = None

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

IMAGE_FEATURES = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("feature", ArrayType(FloatType()), True),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode → HxWx3 uint8. Real codec when PIL exists; otherwise a
    DETERMINISTIC FAKE (byte-seeded) so downstream shapes are exercised."""
    if _PIL is not None:  # pragma: no cover
        import io

        return np.asarray(_PIL.open(io.BytesIO(payload)).convert("RGB"))
    # deterministic fake: seed from payload bytes, fixed 16x16 RGB
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)


def image_features(media: DataFrame, feat_dim: int = 8) -> DataFrame:
    """Decode + feature-extract images: mean-pooled channel histogram.

    Plan shape: filter kind='image' (pushed to scan) → mapInPandas; each
    Arrow batch decodes independently, so executor memory bounds batch
    size (spark.sql.execution.arrow.maxRecordsPerBatch), not file count.
    """
    src = media.filter(F.col("kind") == "image").select("media_id", "payload")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    rows.append((int(mid), None, None))
                    continue
                b = bytes(payload)
                img = _decode_image(b)
                hist = np.histogram(img, bins=feat_dim, range=(0, 256))[0]
                feat = (hist / max(img.size, 1)).astype(np.float32)
                rows.append((int(mid), len(b), feat.tolist()))
            yield pd.DataFrame(rows, columns=["media_id", "n_bytes", "feature"])

    return src.mapInPandas(gen, IMAGE_FEATURES)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: emits (media_id, frame_idx, ts_ms) rows.

    Decode is NotImplemented without a codec; the frame *schedule* (which
    frames to pull, from metadata alone) is real column math — the scan
    never touches payload bytes, so Parquet column pruning keeps this
    stage payload-free."""
    v = media.filter(F.col("kind") == "video").select("media_id", "duration_ms")
    return v.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), F.greatest((F.col("duration_ms") / every_ms).cast("int") - 1,
                                            F.lit(0)))
        ).alias("frame_idx", "_step"),
    ).select(
        "media_id", "frame_idx", (F.col("frame_idx") * every_ms).alias("ts_ms")
    )


def decode_video_frames(media: DataFrame):  # pragma: no cover
    """Real frame decode requires ffmpeg bindings — unavailable here."""
    raise NotImplementedError(
        "video decode needs ffmpeg/pyav; install and wire into frame_sample"
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic media fixture (binary payloads from a seeded RNG)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = bytes(rng.integers(0, 256, size=64 + (i % 5) * 32, dtype=np.uint8))
        rows.append(
            (
                i, kind, payload,
                {"image": "image/png", "audio": "audio/ogg", "video": "video/mp4"}[kind],
                16 if kind == "image" else None,
                16 if kind == "image" else None,
                3000 + 500 * (i % 7) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA)
