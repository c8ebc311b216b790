"""Multimodal (image/audio/video) column plumbing.

Media rides through the engine as opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages — the Spark-native shape for
per-row Python work on large binary payloads (no per-row pickling, and
the pipeline stays partition-parallel: media bytes never concentrate on
the driver).

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED: ``decode_image``/``sample_frames`` raise
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic byte-hash feature is produced so the full Spark plumbing
(schema, batching, partitioning) is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media row schema: opaque payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

_FEATURE_DIM = 16

_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.DoubleType()), True),
    ]
)


def attach_media(df: DataFrame, id_col: str, payload_col: str, mime: str) -> DataFrame:
    """Normalize any (id, binary) pair into the engine's media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(payload_col).cast("binary").alias("payload"),
        F.lit(mime).alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def _fake_feature(payload: bytes | None) -> list[float]:
    """Deterministic 16-dim byte-histogram feature (stand-in for a real
    image embedding; keeps the distributed plumbing testable)."""
    if payload is None:
        return [0.0] * _FEATURE_DIM
    counts = [0] * _FEATURE_DIM
    for b in payload:
        counts[b % _FEATURE_DIM] += 1
    total = float(len(payload)) or 1.0
    return [c / total for c in counts]


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, feature: array<double>) via Arrow-batched mapInPandas.

    With fake=False this is where a real decoder (PIL, ffmpeg) would
    run; the container has none, so it raises — STUB, clearly marked.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio codec library "
                    "not present in this environment; pass fake=True for "
                    "the deterministic test kernel"
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": [_fake_feature(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(kernel, _FEATURES_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int, fake: bool = False) -> DataFrame:
    """Resize kernel — STUB (no codec in container). With fake=True the
    payload passes through and only metadata is rewritten, exercising
    the full distributed path."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("image resize requires PIL/opencv")
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return media.mapInPandas(kernel, MEDIA_SCHEMA)


def media_similarity_topk(
    media: DataFrame, queries: DataFrame, k: int = 10, fake: bool = False
) -> DataFrame:
    """Media near-neighbor search: decode → feature → cosine top-k,
    (qid, neighbor, rank). The feature stage is the (stubbed) decode
    kernel; ranking reuses the engine's exact ANN operator — the same
    composition a production pipeline runs with a real image encoder."""
    from .similarity import cosine_topk

    feats = extract_features(media, fake=fake)
    qfeats = extract_features(queries, fake=fake)
    return cosine_topk(feats, qfeats, id_col="media_id", vec_col="feature", k=k)


def sample_frames(media: DataFrame, every_ms: int, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads — STUB kernel. With fake=True
    emits one synthetic frame row per sampled timestamp derived from
    duration_ms, exercising the 1→N mapInPandas fan-out shape."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame", T.BinaryType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("frame sampling requires ffmpeg")
            rows = {"media_id": [], "frame_ts_ms": [], "frame": []}
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                for ts in range(0, max(dur, 1), every_ms):
                    rows["media_id"].append(r["media_id"])
                    rows["frame_ts_ms"].append(ts)
                    rows["frame"].append(r["payload"])
            yield pd.DataFrame(rows)

    return media.mapInPandas(kernel, schema)
