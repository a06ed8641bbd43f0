"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference treats page images as opaque files with typed metadata
(JHOVE extracts width/height/checksum — JhoveParser.kt:29-156); the engine
treats media as ``binary`` columns with a typed metadata struct, processed
by Arrow-batched pandas stages over ``mapInPandas``.

Decode strategy (degrades gracefully, never hard-fails at import):

- ``decode_stub=True`` → a deterministic fake decode whose dimensions
  derive from the payload's md5 digest — stable across replays, zero
  external deps, and bit-for-bit reproducible by a SQL oracle
  (('0x' || substr(md5(payload), 1, 2))::INT is digest byte 0), so the
  whole mapInPandas pipeline gets a driver-checked CORRECTNESS row
  (catalog.q_media_features);
- ``decode_stub=False`` → real decode. Images go through PIL when it is
  installed (optional import, probed at module load); without PIL a
  built-in pure-python header decoder handles PNG (IHDR) and BMP
  (BITMAPINFOHEADER) — real bytes, real dimensions, zero dependencies.
  Audio decodes WAV headers (RIFF/fmt/data → sample-frame count) the same
  way; video: YUV4MPEG2 offset walk. Unrecognized byte layouts
  (compressed codecs) raise NotImplementedError naming what is needed
  (ffmpeg) — loud, not silent.
"""

from __future__ import annotations

import hashlib
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional dependency probe — never a hard requirement
    from PIL import Image as _PILImage  # type: ignore

    HAVE_PIL = True
except ImportError:
    _PILImage = None
    HAVE_PIL = False

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("checksum", T.StringType(), True),  # md5 hex (P4)
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _parse_png(payload: bytes):
    """Width/height from a PNG's IHDR chunk (always the first chunk per
    the PNG spec) — an 8-byte magic + 4-byte length + 'IHDR' + two
    big-endian uint32s. Pure header read; no pixel decode."""
    if len(payload) < 24 or payload[:8] != _PNG_MAGIC or payload[12:16] != b"IHDR":
        return None
    w = int.from_bytes(payload[16:20], "big")
    h = int.from_bytes(payload[20:24], "big")
    return (w, h, 1) if w > 0 and h > 0 else None


def _parse_bmp(payload: bytes):
    """Width/height from a BMP BITMAPINFOHEADER (int32 LE at offsets
    18/22; height may be negative for top-down rows)."""
    if len(payload) < 26 or payload[:2] != b"BM":
        return None
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = abs(int.from_bytes(payload[22:26], "little", signed=True))
    return (w, h, 1) if w > 0 and h > 0 else None


def _parse_wav(payload: bytes):
    """(channels as width, sample-rate/1000 as height, sample frames) from
    a RIFF/WAVE header: walk chunks for 'fmt ' (channels, rate, block
    align) and 'data' (byte size → frame count)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, channels, rate, block_align, n_frames = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        # the fmt body read below reaches payload[pos+22); require the
        # full span so a truncated fmt chunk returns None (loud), never a
        # zero block_align from silently-empty slices
        if cid == b"fmt " and pos + 22 <= len(payload):
            channels = int.from_bytes(payload[pos + 10:pos + 12], "little")
            rate = int.from_bytes(payload[pos + 12:pos + 16], "little")
            block_align = int.from_bytes(payload[pos + 20:pos + 22], "little")
        elif cid == b"data" and block_align:
            n_frames = size // block_align
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels and rate:
        return channels, rate // 1000, n_frames or 0
    return None


def _parse_y4m(payload: bytes):
    """(width, height, n_frames) from an uncompressed YUV4MPEG2 stream:
    a text stream header ('YUV4MPEG2 W.. H.. [C..] ...\\n') followed by
    'FRAME[ params]\\n' + raw planar YUV per frame. Frame byte size is
    fixed by W×H×(colorspace multiplier), so counting frames is a pure
    offset walk — no pixel decode, no codec."""
    if not payload.startswith(b"YUV4MPEG2 "):
        return None
    nl = payload.find(b"\n")
    if nl < 0:
        return None
    w = h = None
    cs = b"420"
    for tok in payload[10:nl].split(b" "):
        if tok[:1] == b"W":
            w = int(tok[1:] or 0)
        elif tok[:1] == b"H":
            h = int(tok[1:] or 0)
        elif tok[:1] == b"C":
            cs = tok[1:4]
    if not w or not h:
        return None
    # bytes per frame = W*H * {4:2:0 -> 1.5, 4:2:2 -> 2, 4:4:4 -> 3}
    mult = {b"420": 3, b"422": 4, b"444": 6}.get(cs, 3)
    fsize = w * h * mult // 2
    pos, n = nl + 1, 0
    while payload[pos:pos + 5] == b"FRAME":
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or fnl + 1 + fsize > len(payload):
            break
        pos = fnl + 1 + fsize
        n += 1
    return (w, h, n) if n > 0 else None


def _decode_real(kind: str, payload: bytes):
    """Real decode. Images: PIL when installed, else the pure-python
    PNG/BMP header decoders; audio: WAV header walk; video: YUV4MPEG2
    offset walk. Anything else (or an unrecognized byte layout) raises a
    NotImplementedError naming what is needed — loud, not silent."""
    if kind == "image":
        if HAVE_PIL:
            img = _PILImage.open(io.BytesIO(payload or b""))
            return img.width, img.height, 1
        parsed = _parse_png(payload or b"") or _parse_bmp(payload or b"")
        if parsed:
            return parsed
        raise NotImplementedError(
            "real image decode: payload is neither PNG nor BMP and PIL is "
            "not installed; run with decode_stub=True for the plumbing path"
        )
    if kind == "audio":
        parsed = _parse_wav(payload or b"")
        if parsed:
            return parsed
        raise NotImplementedError(
            "real audio decode: payload is not RIFF/WAVE (other codecs "
            "need librosa/ffmpeg, which is not installed)"
        )
    if kind == "video":
        parsed = _parse_y4m(payload or b"")
        if parsed:
            return parsed
        raise NotImplementedError(
            "real video decode: payload is not YUV4MPEG2 (compressed "
            "codecs need ffmpeg, which is not installed)"
        )
    raise NotImplementedError(
        f"real {kind} decode is not supported; "
        "run with decode_stub=True for the deterministic plumbing path"
    )


def _decode_fake(kind: str, payload: bytes):
    """Deterministic fake decode: dimensions derived from the payload's
    md5 digest — stable across replays, reproducible in SQL."""
    h = hashlib.md5(payload or b"").digest()
    w = 64 + h[0]
    ht = 64 + h[1]
    frames = 1 if kind == "image" else 1 + h[2]
    return w, ht, frames


def extract_features(df: DataFrame, decode_stub: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    mapInPandas keeps whole Arrow record batches in flight (no per-row
    Python calls into Spark); partitioning of the input is preserved, so at
    scale this runs embarrassingly parallel over the scan.
    """
    decode = _decode_fake if decode_stub else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            kinds = pdf["kind"]
            dims = [decode(k, p) for k, p in zip(kinds, payloads)]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": kinds,
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "checksum": payloads.map(
                        lambda b: hashlib.md5(b or b"").hexdigest()
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, decode_stub: bool = False) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index (expands via the decoded frame count)."""
    feats = extract_features(df.filter(F.col("kind") == "video"), decode_stub)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
