"""Multimodal payload plumbing: image / audio / video as opaque
``binary`` columns with typed metadata (task brief).

Decode strategy per modality (this container has no PIL/librosa/
ffmpeg — the DECODE KERNELS are stubbed where the real library is
required, clearly marked, while the Spark-side plumbing — schemas,
Arrow batching, partitioning, UDF signatures, batch shapes — is real
and tested):

- image: PNG decode is REAL (content/imagecodec.py); lossy formats use
  the deterministic FJPG stub; resize is a REAL numpy block-mean /
  nearest-neighbor kernel over decoded pixels.
- audio: payload is a deterministic PCM16-like stub ('FPCM' magic:
  header + zlib samples). Feature extraction (RMS energy, zero-cross
  rate, duration) is REAL numpy over the decoded samples; decoding
  arbitrary real formats (mp3/flac) raises NotImplementedError until
  an audio lib is present.
- video: payload is a deterministic frame-stack stub ('FVID' magic).
  Frame sampling (every k-th frame -> phash per frame) is REAL over
  the decoded stack; real containers raise NotImplementedError.

Every stage is mapInPandas over Arrow batches; outputs project the
payload away so downstream metadata queries scan no bytes.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..content.imagecodec import decode_image, encode_png, phash64

_FPCM = b"FPCM"
_FVID = b"FVID"


# --- deterministic stub codecs (encode side used by fixtures) ---

def encode_fake_audio(samples: np.ndarray, rate: int = 16000) -> bytes:
    """samples: int16 mono."""
    assert samples.dtype == np.int16
    return _FPCM + struct.pack(">II", rate, len(samples)) + zlib.compress(samples.tobytes())


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    if data.startswith(_FPCM):
        rate, n = struct.unpack(">II", data[4:12])
        return np.frombuffer(zlib.decompress(data[12:]), np.int16)[:n], rate
    raise NotImplementedError(
        "real audio decode (mp3/flac/wav) requires an audio library not "
        "present in this container; deterministic FPCM stub bytes are supported"
    )


def encode_fake_video(frames: np.ndarray) -> bytes:
    """frames: (n, h, w, 3) uint8."""
    n, h, w, _ = frames.shape
    return _FVID + struct.pack(">III", n, h, w) + zlib.compress(frames.tobytes())


def decode_video(data: bytes) -> np.ndarray:
    if data.startswith(_FVID):
        n, h, w = struct.unpack(">III", data[4:16])
        return np.frombuffer(zlib.decompress(data[16:]), np.uint8).reshape(n, h, w, 3)
    raise NotImplementedError(
        "real video decode requires ffmpeg (not in this container); "
        "deterministic FVID stub bytes are supported"
    )


def resize_pixels(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """REAL nearest-neighbor resize (numpy index sampling)."""
    h, w = px.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return px[ys][:, xs]


# --- fixtures -----------------------------------------------------------

def gen_multimodal(n: int = 24, seed: int = 42) -> list[dict]:
    rng = np.random.default_rng(seed + 11)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            px = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
            payload, meta = encode_png(px), {"w": 24, "h": 24, "fmt": "png"}
        elif kind == "audio":
            samples = (rng.standard_normal(16000) * 3000).astype(np.int16)
            payload, meta = encode_fake_audio(samples), {"rate": 16000, "fmt": "fpcm"}
        else:
            frames = rng.integers(0, 256, (12, 16, 16, 3), dtype=np.uint8)
            payload, meta = encode_fake_video(frames), {"frames": 12, "fmt": "fvid"}
        rows.append(
            {
                "media_id": f"m-{i:04d}",
                "kind": kind,
                "bytes": bytes(payload),
                "meta": {k: str(v) for k, v in meta.items()},
            }
        )
    return rows


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def media_df(spark: SparkSession, n: int = 24, seed: int = 42) -> DataFrame:
    return spark.createDataFrame(gen_multimodal(n, seed), MEDIA_SCHEMA)


# --- stages -------------------------------------------------------------

IMAGE_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
        T.StructField("resized_png", T.BinaryType()),
        T.StructField("phash", T.LongType()),
    ]
)


def image_resize_stage(media: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Decode -> resize (real numpy) -> re-encode PNG + phash."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "image":
                    continue
                px = decode_image(bytes(r.bytes), r.meta.get("fmt", "png"))
                small = resize_pixels(px, out_h, out_w)
                rows.append((r.media_id, out_w, out_h, encode_png(small), phash64(px)))
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_RESIZE_SCHEMA.fields])

    return media.mapInPandas(run, IMAGE_RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("zero_cross_rate", T.DoubleType()),
    ]
)


def audio_features_stage(media: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "audio":
                    continue
                samples, rate = decode_audio(bytes(r.bytes))
                x = samples.astype(np.float64)
                rms = float(np.sqrt(np.mean(x**2)))
                zcr = float(np.mean(np.abs(np.diff(np.sign(x))) > 0))
                rows.append((r.media_id, len(samples) / rate, round(rms, 4), round(zcr, 6)))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields])

    return media.mapInPandas(run, AUDIO_FEATURES_SCHEMA)


VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_phash", T.LongType()),
    ]
)


def video_frame_sample_stage(media: DataFrame, every_k: int = 4) -> DataFrame:
    """UDTF-shaped: one output row per sampled frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.kind != "video":
                    continue
                frames = decode_video(bytes(r.bytes))
                for idx in range(0, frames.shape[0], every_k):
                    rows.append((r.media_id, idx, phash64(frames[idx])))
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_FRAMES_SCHEMA.fields])

    return media.mapInPandas(run, VIDEO_FRAMES_SCHEMA)
