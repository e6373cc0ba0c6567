"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata; the
decode/feature kernels run as Arrow-batched ``mapInPandas`` operators so
the Spark-side contract (schema, batch shape, partitioning) is real and
tested even though most codec libraries are absent in this container.

STUB BOUNDARY: ``decode_fn='real'`` genuinely decodes **PNG** (IHDR
header + zlib-inflated IDAT — :func:`_decode_png`), **BMP** (24-bit
uncompressed, padded bottom-up rows — :func:`_decode_bmp`) and
**PCM-16 WAV** (:func:`_decode_wav`) payloads with pure-stdlib parsers
and raises ``NotImplementedError`` for every other format — plug
Pillow/torchaudio/ffmpeg there on a real cluster.  The
default ``decode_fn='fake'`` is a deterministic stand-in
(dimensions/duration derived from a stable hash of the payload) so the
distributed plumbing is exercised end-to-end on arbitrary bytes.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def make_png(width: int, height: int, gray: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG (pure stdlib) — constant pixel
    value ``gray``, filter type 0 per scanline.  Used by tests and the
    synthetic media generator; any standards-compliant decoder reads it.
    """

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data))
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = (b"\x00" + bytes([gray]) * width) * height
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _decode_png(payload: bytes) -> tuple[int, int, int, int]:
    """Real pure-stdlib PNG decode: ``(width, height, inflated_len,
    idat_byte_sum)``.

    Walks the chunk stream (length + type + data + crc), reads the
    dimensions from IHDR, concatenates every IDAT chunk and zlib-
    inflates it; the inflated length and byte sum are the deterministic
    content statistics the DuckDB oracle recomputes in closed form for
    planted images.  Raises ``ValueError`` on a non-PNG payload.
    """
    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos, width, height = 8, None, None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height = struct.unpack(">II", data[:8])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + length  # length + type + data + crc32
    if width is None:
        raise ValueError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    byte_sum = int(np.frombuffer(raw, dtype=np.uint8).sum(dtype=np.int64))
    return width, height, len(raw), byte_sum


WAV_MAGIC = b"RIFF"


def make_wav(
    sample_rate: int, channels: int, n_samples: int, amplitude: int
) -> bytes:
    """Minimal valid 16-bit PCM WAV (pure stdlib) — every sample holds
    the constant ``amplitude`` (0..32767), so content statistics are
    closed-form for the oracle.  Standards-valid RIFF/WAVE layout:
    fmt chunk (PCM) + data chunk.
    """
    frame = struct.pack("<h", amplitude) * channels
    data = frame * n_samples
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate, byte_rate,
                      channels * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return WAV_MAGIC + struct.pack("<I", len(body)) + body


def _decode_wav(payload: bytes) -> tuple[int, int, int, int, int]:
    """Real pure-stdlib WAV decode: ``(sample_rate, channels,
    n_samples, duration_ms, data_lo_byte_sum)``.

    Walks the RIFF chunk stream (fmt for the format header, data for
    the sample payload); duration is derived from the data chunk size
    and the format, exactly what a standards decoder reports; the
    low-byte sum over the data chunk is the deterministic content
    statistic the oracle recomputes in closed form for planted audio.
    Raises ``ValueError`` on non-WAV bytes or non-PCM-16 content.
    """
    if payload[:4] != WAV_MAGIC or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate = channels = bits = None
    data = None
    while pos + 8 <= len(payload):
        ctype = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if ctype == b"fmt ":
            _, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", payload[pos + 8 : pos + 24]
            )
        elif ctype == b"data":
            data = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV without fmt/data chunk")
    if bits != 16:
        raise ValueError(f"only PCM-16 supported, got {bits}-bit")
    n_samples = len(data) // (channels * 2)
    lo_sum = int(np.frombuffer(data, dtype=np.uint8)[::2].sum(dtype=np.int64))
    return rate, channels, n_samples, n_samples * 1000 // rate, lo_sum


BMP_MAGIC = b"BM"


def make_bmp(width: int, height: int, bgr: tuple[int, int, int]) -> bytes:
    """Minimal valid 24-bit uncompressed BMP (pure stdlib) — constant
    pixel color ``bgr``, bottom-up rows padded to 4-byte boundaries per
    the BITMAPINFOHEADER spec.  Standards-valid: 14-byte file header +
    40-byte info header + pixel array."""
    stride = (3 * width + 3) // 4 * 4
    row = bytes(bgr) * width + b"\x00" * (stride - 3 * width)
    data = row * height
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    file_header = struct.pack(
        "<2sIHHI", BMP_MAGIC, 14 + 40 + len(data), 0, 0, 14 + 40
    )
    return file_header + info + data


def _decode_bmp(payload: bytes) -> tuple[int, int, int, int, int]:
    """Real pure-stdlib BMP decode: ``(width, height, row_stride,
    pixel_bytes, pixel_byte_sum)``.

    Reads the file header for the pixel-array offset, the info header
    for dimensions/bpp/compression, then walks the padded bottom-up
    pixel rows; the byte sum EXCLUDES row padding (reshape by stride,
    slice to 3*width), so a padding-handling bug cannot self-confirm
    against the closed-form oracle.  Raises ``ValueError`` on non-BMP
    bytes or unsupported (non-24-bit / compressed) content.
    """
    if payload[:2] != BMP_MAGIC:
        raise ValueError("not a BMP payload")
    (pixel_offset,) = struct.unpack("<I", payload[10:14])
    header_size, width, height, _, bpp, compression = struct.unpack(
        "<IiiHHI", payload[14:34]
    )
    if header_size < 40:
        raise ValueError(f"unsupported BMP header size {header_size}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported, got {bpp}-bit "
            f"compression={compression}"
        )
    if height < 0:  # top-down variant: same bytes, negated height field
        height = -height
    stride = (3 * width + 3) // 4 * 4
    data = payload[pixel_offset : pixel_offset + stride * height]
    if len(data) != stride * height:
        raise ValueError("BMP pixel array truncated")
    rows = np.frombuffer(data, dtype=np.uint8).reshape(height, stride)
    pixel_sum = int(rows[:, : 3 * width].sum(dtype=np.int64))
    return width, height, stride, stride * height, pixel_sum


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

    def _real_decode(payload: bytes, kind: str) -> tuple[int, int, int, int]:
        if payload[:8] == PNG_MAGIC:
            width, height, _, _ = _decode_png(payload)
            return width, height, 0, 1
        if payload[:4] == WAV_MAGIC and payload[8:12] == b"WAVE":
            _, _, n_samples, duration_ms, _ = _decode_wav(payload)
            return 0, 0, duration_ms, n_samples
        if payload[:2] == BMP_MAGIC:
            width, height, _, _, _ = _decode_bmp(payload)
            return width, height, 0, 1
        raise NotImplementedError(
            "real decoding is implemented in pure stdlib for PNG, BMP "
            "and PCM-16 WAV only; other formats (JPEG, compressed "
            "audio/video) require codec libraries (Pillow/ffmpeg) that "
            "are not installed — use decode_fn='fake' for those"
        )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decode = _real_decode if use_real else _fake_decode
            dims = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
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


PNG_STATS_SCHEMA = (
    "media_id long, byte_len long, width int, height int, "
    "inflated_len long, idat_byte_sum long"
)


def synthetic_png_media(spark, n: int) -> DataFrame:
    """Distributed generator of REAL (standards-valid) PNG payloads with
    planted dimensions/content — pure integer arithmetic in ``media_id``
    so an independent engine can recompute every decoded statistic in
    closed form without parsing PNG:

    * ``width  = 8 + media_id % 13``
    * ``height = 8 + media_id % 11``
    * constant gray value ``(media_id * 37) % 256``
    * hence ``inflated_len = height * (width + 1)`` (filter byte per
      scanline) and ``idat_byte_sum = height * width * gray``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads = [
                make_png(8 + int(i) % 13, 8 + int(i) % 11, (int(i) * 37) % 256)
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/png",
                    "source_url": [f"synthetic://png/{i}" for i in ids],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_png_stats(media: DataFrame) -> DataFrame:
    """Real PNG decode over a media table (Arrow-batched mapInPandas):
    header dimensions plus zlib-inflated IDAT statistics per payload.
    This is the non-stub codec path — it fails loudly on non-PNG bytes.
    """

    def batches_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [_decode_png(p) for p in pdf["payload"]]
            arr = np.array(stats, dtype=np.int64).reshape(len(pdf), 4)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].str.len().astype("int64"),
                    "width": arr[:, 0].astype("int32"),
                    "height": arr[:, 1].astype("int32"),
                    "inflated_len": arr[:, 2],
                    "idat_byte_sum": arr[:, 3],
                }
            )

    return media.mapInPandas(batches_fn, schema=PNG_STATS_SCHEMA)


WAV_STATS_SCHEMA = (
    "media_id long, byte_len long, sample_rate int, channels int, "
    "n_samples long, duration_ms long, data_byte_sum long"
)


def synthetic_wav_media(spark, n: int) -> DataFrame:
    """Distributed generator of REAL (standards-valid) PCM-16 WAV
    payloads with planted parameters — closed-form in ``media_id`` so
    the oracle recomputes every decoded statistic without a WAV parser:

    * ``sample_rate = 8000 * (1 + media_id % 3)``  (8/16/24 kHz)
    * ``channels    = 1 + media_id % 2``
    * ``n_samples   = 100 + media_id % 50``
    * constant amplitude ``media_id % 128`` (low byte = amp, high byte
      0), hence ``data_byte_sum = n_samples * channels * amp`` and
      ``duration_ms = n_samples * 1000 // sample_rate``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads = [
                make_wav(
                    8000 * (1 + int(i) % 3),
                    1 + int(i) % 2,
                    100 + int(i) % 50,
                    int(i) % 128,
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "audio",
                    "payload": payloads,
                    "mime": "audio/wav",
                    "source_url": [f"synthetic://wav/{i}" for i in ids],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_wav_stats(media: DataFrame) -> DataFrame:
    """Real WAV decode over a media table (Arrow-batched mapInPandas):
    format header plus data-chunk content statistics per payload."""

    def batches_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [_decode_wav(p) for p in pdf["payload"]]
            arr = np.array(stats, dtype=np.int64).reshape(len(pdf), 5)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].str.len().astype("int64"),
                    "sample_rate": arr[:, 0].astype("int32"),
                    "channels": arr[:, 1].astype("int32"),
                    "n_samples": arr[:, 2],
                    "duration_ms": arr[:, 3],
                    "data_byte_sum": arr[:, 4],
                }
            )

    return media.mapInPandas(batches_fn, schema=WAV_STATS_SCHEMA)


BMP_STATS_SCHEMA = (
    "media_id long, byte_len long, width int, height int, "
    "row_stride int, pixel_bytes long, pixel_byte_sum long"
)


def synthetic_bmp_media(spark, n: int) -> DataFrame:
    """Distributed generator of REAL (standards-valid) 24-bit BMP
    payloads with planted parameters — closed-form in ``media_id`` so
    the oracle recomputes every decoded statistic without a BMP parser:

    * ``width  = 4 + media_id % 9``   (row padding varies with width)
    * ``height = 3 + media_id % 7``
    * constant BGR color ``(media_id % 256, (media_id*11) % 256,
      (media_id*29) % 256)``
    * hence ``row_stride = (3*width + 3) // 4 * 4``,
      ``pixel_bytes = row_stride * height``, and (padding is zeros)
      ``pixel_byte_sum = width * height * (b + g + r)``.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads = [
                make_bmp(
                    4 + int(i) % 9,
                    3 + int(i) % 7,
                    (int(i) % 256, (int(i) * 11) % 256, (int(i) * 29) % 256),
                )
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": "image",
                    "payload": payloads,
                    "mime": "image/bmp",
                    "source_url": [f"synthetic://bmp/{i}" for i in ids],
                }
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_bmp_stats(media: DataFrame) -> DataFrame:
    """Real BMP decode over a media table (Arrow-batched mapInPandas):
    header dimensions plus padding-aware pixel-array statistics per
    payload.  Fails loudly on non-BMP bytes."""

    def batches_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [_decode_bmp(p) for p in pdf["payload"]]
            arr = np.array(stats, dtype=np.int64).reshape(len(pdf), 5)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].str.len().astype("int64"),
                    "width": arr[:, 0].astype("int32"),
                    "height": arr[:, 1].astype("int32"),
                    "row_stride": arr[:, 2].astype("int32"),
                    "pixel_bytes": arr[:, 3],
                    "pixel_byte_sum": arr[:, 4],
                }
            )

    return media.mapInPandas(batches_fn, schema=BMP_STATS_SCHEMA)


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
