"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode / feature-extract run as Arrow-batched ``mapInPandas``
(the documented slow path — one Python hop, vectorized per batch, never
per-row). The actual codec step is STUBBED with a deterministic fake
(this container ships no image/audio libs): ``decode_stub_features``
derives reproducible pseudo-features from the bytes, so the Spark-side
plumbing — schema, batch shape, partitioning — is real and tested, and a
real decoder (PIL/torchaudio/ffmpeg) drops into ``_decode_one``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("source", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("fake_width", T.IntegerType()),
        T.StructField("fake_height", T.IntegerType()),
        T.StructField("byte_mean", T.DoubleType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, text_col: str, id_col: str, mime: str = "application/fake"
) -> DataFrame:
    """Synthesize a media table from a text column (UTF-8 payload) —
    stand-in for reading real image/audio bytes from object storage."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit("synthetic").alias("source"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _decode_one(payload: bytes) -> dict:
    """STUB decoder. Replace with a real codec (PIL, torchaudio, ffmpeg).

    Deterministic fake: dimensions derived from byte length, mean byte
    value as the 'feature' — reproducible across engines for testing.
    """
    n = len(payload)
    return {
        "fake_width": (n % 64) + 1,
        "fake_height": (n % 48) + 1,
        "byte_mean": (sum(payload) / n) if n else 0.0,
    }


def decode_stub_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: mapInPandas over (media_id, payload, meta).

    Batches stream through Python with Arrow; partitioning is preserved
    (no shuffle) — at 100 TB the decode cost is the codec, not the hop.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_one(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                    "fake_width": [f["fake_width"] for f in feats],
                    "fake_height": [f["fake_height"] for f in feats],
                    "byte_mean": [f["byte_mean"] for f in feats],
                }
            )
            yield out

    return media.mapInPandas(decode_batches, FEATURES_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: re-emit each payload truncated/zero-padded to
    width×height bytes (a real implementation decodes, resamples, and
    re-encodes — drop it into ``_resize_one``). Keeps the media schema so
    resize stages compose: attach → resize → decode. Map-only, no shuffle.
    """
    target = width * height

    def _resize_one(payload: bytes) -> bytes:
        if len(payload) >= target:
            return payload[:target]
        return payload + b"\x00" * (target - len(payload))

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [_resize_one(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": resized,
                    "meta": [
                        {
                            "mime": m["mime"],
                            "source": m["source"],
                            "n_bytes": len(r),
                        }
                        for m, r in zip(pdf["meta"], resized)
                    ],
                }
            )

    return media.mapInPandas(resize_batches, MEDIA_SCHEMA)


def sample_frames_stub(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """STUB frame sampler: treat the payload as a fake video and emit
    ``n_frames`` evenly-spaced byte slices as frame rows — the 1→N fan-out
    batch shape a real decoder (ffmpeg keyframe sampling) would produce.
    Map-only; downstream per-frame feature extraction parallelizes over
    the exploded rows."""

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(p)
                k = max(len(b) // n_frames, 1)
                for i in range(n_frames):
                    lo = min(i * k, len(b))
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(b[lo : lo + k])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "frame_idx": idxs,
                    "frame_payload": frames,
                    "n_bytes": [len(f) for f in frames],
                }
            )

    return media.mapInPandas(frame_batches, FRAME_SCHEMA)
