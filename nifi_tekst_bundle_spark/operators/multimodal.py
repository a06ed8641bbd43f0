"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The reference treats page images as opaque files with typed metadata
(JHOVE extracts width/height/checksum — JhoveParser.kt:29-156); the engine
treats media as ``binary`` columns with a typed metadata struct, processed
by Arrow-batched pandas stages over ``mapInPandas``.

Decode libraries (PIL/librosa/ffmpeg) are not in this container, so the
actual byte→pixels/samples step is STUBBED: ``decode_stub=True`` substitutes
a deterministic fake (hash-derived dimensions) so the Spark-side plumbing —
schema, partitioning, UDF signature, Arrow batch shape — is real and tested;
``decode_stub=False`` raises NotImplementedError at the decode call site.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
        T.StructField("sha1", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
    ]
)


def _decode_real(kind: str, payload: bytes):
    raise NotImplementedError(
        "media decode requires PIL/librosa/ffmpeg — not available in this "
        "environment; run with decode_stub=True for the plumbing path"
    )


def _decode_fake(kind: str, payload: bytes):
    """Deterministic fake decode: dimensions derived from content hash —
    stable across replays, no external libs."""
    h = hashlib.sha1(payload or b"").digest()
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
                    "sha1": payloads.map(
                        lambda b: hashlib.sha1(b or b"").hexdigest()
                    ),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 2, decode_stub: bool = False) -> DataFrame:
    """Frame sampling for video rows: one output row per sampled frame
    index (expands via the fake frame count; real path stubbed)."""
    feats = extract_features(df.filter(F.col("kind") == "video"), decode_stub)
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_n))
        ).alias("frame_idx"),
    )
