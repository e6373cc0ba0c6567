"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode/feature kernels run as Arrow-batched ``mapInPandas`` operators so
the Spark-side contract (schema, batch shape, partitioning) is real and
tested even though the codec libraries are absent in this container.

STUB BOUNDARY: ``decode_fn='real'`` raises ``NotImplementedError`` —
plug Pillow/torchaudio/ffmpeg there on a real cluster.  The default
``decode_fn='fake'`` is a deterministic stand-in (dimensions/duration
derived from a stable hash of the payload) so the distributed plumbing
is exercised end-to-end.
"""

from __future__ import annotations

import hashlib
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
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("mime", T.StringType(), True),
        T.StructField("source_url", T.StringType(), True),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, byte_len long, sha256 string, "
    "width int, height int, duration_ms long, n_frames int"
)


def _fake_decode(payload: bytes, kind: str) -> tuple[int, int, int, int]:
    """Deterministic fake decode: stable pseudo-dimensions from content."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] * 4
    height = 64 + h[1] * 4
    duration_ms = int.from_bytes(h[2:4], "big") if kind in ("audio", "video") else 0
    n_frames = 1 if kind == "image" else 1 + h[4]
    return width, height, duration_ms, n_frames


def decode_media(media: DataFrame, *, decode_fn: str = "fake") -> DataFrame:
    """Decode/inspect media payloads via ``mapInPandas`` (Arrow batches).

    Batch-shaped: each pandas chunk is processed with numpy/hashlib only;
    no row-at-a-time Spark serialization.
    """
    if decode_fn not in ("fake", "real"):
        raise ValueError("decode_fn must be 'fake' or 'real'")

    use_real = decode_fn == "real"

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_real:
                raise NotImplementedError(
                    "real media decoding requires codec libraries (Pillow/"
                    "ffmpeg) that are not installed; use decode_fn='fake'"
                )
            dims = [_fake_decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            arr = np.array(dims, dtype=np.int64).reshape(len(pdf), 4)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": pdf["payload"].str.len(),
                    "sha256": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "width": arr[:, 0].astype("int32"),
                    "height": arr[:, 1].astype("int32"),
                    "duration_ms": arr[:, 2],
                    "n_frames": arr[:, 3].astype("int32"),
                }
            )

    return media.mapInPandas(decode_batches, schema=DECODED_SCHEMA)


FRAME_SCHEMA = "media_id long, frame_index int, frame_ms long"


def sample_frames(decoded: DataFrame, *, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame index, native
    (sequence + explode); the actual pixel grab happens at the decode
    stub boundary on a real cluster."""
    frames = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
    return decoded.filter(F.col("n_frames") > 0).select(
        "media_id",
        F.explode(frames).alias("frame_index"),
        F.when(
            F.col("n_frames") > 1,
            (F.col("frame_index") * F.col("duration_ms") / F.col("n_frames")).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("frame_ms"),
    )


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Derive a media table from the pages table (html bytes as payload)
    — exercises binary-column plumbing against the real graft input."""
    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("html").alias("payload"),
        F.lit("text/html").alias("mime"),
        F.col("url").alias("source_url"),
    )
