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
- ``decode_stub=False`` → real decode via optional imports, probed at
  module load: PIL for images when installed; otherwise the decode call
  raises NotImplementedError naming the missing library (audio/video
  would need librosa/ffmpeg — not present in this environment).
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


def _decode_real(kind: str, payload: bytes):
    """Real decode via optional libraries. Images decode through PIL when
    it is installed; everything else (or a missing library) raises a
    NotImplementedError naming what is needed — loud, not silent."""
    if kind == "image" and HAVE_PIL:
        img = _PILImage.open(io.BytesIO(payload or b""))
        return img.width, img.height, 1
    missing = "PIL" if kind == "image" else "librosa/ffmpeg"
    raise NotImplementedError(
        f"real {kind} decode requires {missing}, which is not installed; "
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
