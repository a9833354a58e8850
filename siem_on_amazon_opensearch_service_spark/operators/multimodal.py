"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The heavy decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image``/``decode_audio`` raise NotImplementedError
unless ``fake=True``, which substitutes a deterministic arithmetic "decode"
so the Spark-side plumbing — schema, Arrow batch shape, mapInPandas
partitioning — is real and tested end-to-end.

Schema convention:
    media: (media_id long, kind string, payload binary,
            meta struct<width:int, height:int, sample_rate:int, codec:string>)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in decoder: FEATURE_DIM moments of the raw bytes."""
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    idx = np.arange(b.size)
    feats = [
        b.mean(), b.std(), b.min(), b.max(),
        *(float(((b * ((idx % p) + 1)).sum() % 997)) for p in (3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41)),
    ]
    return np.asarray(feats, dtype=np.float32)


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    if fake:
        return _fake_decode(payload)
    raise NotImplementedError(
        "real image decode needs PIL/opencv (not in this container); "
        "pass fake=True for the deterministic test decoder"
    )


def extract_features(media: DataFrame, fake: bool = True, batch_note: bool = True) -> DataFrame:
    """mapInPandas feature extraction: (media_id, kind, feature array<float>).

    The Arrow batch shape (iterator of pandas batches, one output row per
    input row, fixed-width feature vector) is exactly what a real
    PIL/librosa decode would use — only ``_fake_decode`` would be swapped.
    """

    def extract(batches):
        for pdf in batches:
            feats = [
                decode_image(p, fake=fake).tolist() for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.mapInPandas(extract, schema="media_id long, kind string, feature array<float>")


def frame_sample(media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8) -> DataFrame:
    """'Frame sampling' plumbing demo: split video payload into byte-range
    pseudo-frames (media_id, frame_idx, frame binary) — the partitioning and
    explode shape of real frame extraction."""

    def sample(batches):
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(bytes(payload[i * every_n_bytes : (i + 1) * every_n_bytes]))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.filter(F.col("kind") == "video").mapInPandas(
        sample, schema="media_id long, frame_idx int, frame binary"
    )


def synthetic_media(spark, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text table (for tests):
    payload = utf-8 bytes of the text, kind cycles image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            F.lit(16000).alias("sample_rate"),
            F.lit("fake").alias("codec"),
        ).alias("meta"),
    )
