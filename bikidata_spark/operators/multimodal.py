"""Multimodal (image/audio/video) column plumbing.

Media rides through the engine as opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages — the Spark-native shape for
per-row Python work on large binary payloads (no per-row pickling, and
the pipeline stays partition-parallel: media bytes never concentrate on
the driver).

Image/video codecs (PIL/ffmpeg) are NOT in this container, so those
decode kernels are STUBBED: they raise ``NotImplementedError`` unless
``fake=True``, in which case a deterministic byte-hash feature is
produced so the full Spark plumbing (schema, batching, partitioning) is
real and tested.

Audio is REAL: ``decode_wav`` parses RIFF/WAVE PCM headers in pure
stdlib+numpy (no codec needed) and ``wav_features`` computes windowed
RMS + log-spectral-band features, so ``extract_features`` /
``media_similarity_topk`` run non-fake end-to-end on ``audio/wav``
payloads — one genuinely working modality through the same mapInPandas
shape the stubbed ones will use when codecs exist.
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


def decode_wav(payload: bytes) -> tuple[int, "object"]:
    """Minimal RIFF/WAVE PCM parser — pure stdlib + numpy, no codec.

    Supports PCM (format tag 1) 8- and 16-bit samples with any channel
    count (downmixed to mono float64 in [-1, 1]) by walking the RIFF
    chunk list (fmt / data; unknown chunks skipped, odd sizes padded per
    spec). Returns (sample_rate, samples). Raises ValueError on
    malformed or unsupported payloads."""
    import struct

    import numpy as np

    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or len(fmt) < 16 or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, nch, sr, _, _, bits = struct.unpack("<HHIIHH", fmt[:16])
    if audio_fmt != 1 or bits not in (8, 16) or nch < 1:
        raise ValueError(f"unsupported wav: fmt={audio_fmt} bits={bits} ch={nch}")
    if bits == 16:
        usable = len(data) - (len(data) % (2 * nch))
        x = np.frombuffer(data[:usable], dtype="<i2").astype(np.float64) / 32768.0
    else:
        usable = len(data) - (len(data) % nch)
        x = (np.frombuffer(data[:usable], dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    return int(sr), x.reshape(-1, nch).mean(axis=1)


def wav_features(payload: bytes, dim: int = _FEATURE_DIM) -> list[float]:
    """Real audio feature kernel: ``dim - 4`` log-energies over
    geometric frequency bands of the magnitude spectrum (rfft), plus
    windowed-RMS mean/std/max (20 ms windows) and zero-crossing rate.
    Deterministic pure-numpy math — same vector on every engine."""
    import numpy as np

    sr, x = decode_wav(payload)
    if len(x) == 0:
        return [0.0] * dim
    nb = dim - 4
    spec = np.abs(np.fft.rfft(x))
    freqs = np.fft.rfftfreq(len(x), 1.0 / sr)
    edges = np.geomspace(20.0, max(sr / 2.0, 40.0), nb + 1)
    bands = []
    for i in range(nb):
        m = (freqs >= edges[i]) & (freqs < edges[i + 1])
        bands.append(float(np.log1p(spec[m].sum())) if m.any() else 0.0)
    win = max(1, int(sr * 0.02))
    nwin = len(x) // win
    if nwin:
        r = np.sqrt((x[: nwin * win].reshape(nwin, win) ** 2).mean(axis=1))
        rms = [float(r.mean()), float(r.std()), float(r.max())]
    else:
        rms = [0.0, 0.0, 0.0]
    zcr = float((np.diff(np.signbit(x)) != 0).mean()) if len(x) > 1 else 0.0
    return bands + rms + [zcr]


def _real_feature(payload: bytes | None, mime: str | None) -> list[float]:
    if payload is None:
        return [0.0] * _FEATURE_DIM
    if mime in ("audio/wav", "audio/x-wav", "audio/wave"):
        return wav_features(payload)
    raise NotImplementedError(
        f"decode for mime={mime!r} requires a codec library not present "
        "in this environment (audio/wav is implemented; pass fake=True "
        "for the deterministic test kernel on other modalities)"
    )


def extract_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """(media_id, feature: array<double>) via Arrow-batched mapInPandas.

    fake=False runs the real kernel: WAV payloads decode and featurize
    (``wav_features``); other mimes raise until their codec exists —
    STUB, clearly marked."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_feature(p) for p in pdf["payload"]]
            else:
                feats = [
                    _real_feature(p, m) for p, m in zip(pdf["payload"], pdf["mime"])
                ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

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
