"""Engine schemas.

``TRANSCRIPTS_SCHEMA`` is the target table (the reference's object-folder
tree: one item per folder, one page per zero-padded filename — see
reference ReorderFiles.kt:92 and RenameUtils.kt:12 for the key encoding).

``CHANGE_EVENT_SCHEMA`` is the CDC log — the reference's change-batch JSON
(reference test fixture reorder-files/flowfile.json, parsed at
ReorderFiles.kt:359-366) flattened to one row per (target key, ordinal) the
way addInstruction does (ReorderFiles.kt:124-189), plus an explicit ``lsn``
total order replacing implicit list order, and an ``extra`` map carrying the
opaque pass-through metadata fields (ReorderFiles.kt:396-406) that model
additive schema evolution.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Payload columns shared by the transcripts table and the event log.
# Per-column last-writer-wins applies to exactly these.
PAYLOAD_COLUMNS: tuple[str, ...] = ("role", "text", "tool", "ts")

KEY_COLUMNS: tuple[str, ...] = ("conv_id", "turn_idx")

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("lsn", T.LongType(), False),
        T.StructField("batch_id", T.StringType(), True),
        # op in {insert, update, delete, move}
        T.StructField("op", T.StringType(), False),
        # nullable: a null conv_id on insert asks the engine to synthesize a
        # key (reference: UUIDv7 fallback, ReorderFiles.kt:312-316)
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        # move source (cross-conversation allowed, ReorderFiles.kt:150-157)
        T.StructField("src_conv_id", T.StringType(), True),
        T.StructField("src_turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        # additive schema-evolution payload; promoted to real columns when
        # schema_version says so (reference: opaque pass-through fields)
        T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("schema_version", T.IntegerType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("epoch_id", T.LongType(), False),
        T.StructField("batch_id", T.StringType(), True),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("events_applied", T.LongType(), False),
        T.StructField("upserts", T.LongType(), False),
        T.StructField("deletes", T.LongType(), False),
        T.StructField("dead_lettered", T.LongType(), False),
        T.StructField("watermark_lag_ms", T.LongType(), True),
        T.StructField("committed_at", T.TimestampType(), True),
    ]
)

DEAD_LETTER_REASONS = (
    "unsafe_key",  # reference PathSafety.kt:22-32 — no '..', separators, NUL
    "missing_key",  # no target key on a non-insert op
    "bad_op",
    "missing_move_source",  # move whose source row does not exist
    "missing_lsn",  # no sequencing position (e.g. unparseable binlog pos)
)

# schema_version -> extra keys promoted to first-class string columns.
# Version 1 is the base schema; version 2 adds the batch metadata fields the
# reference passes through opaquely (flowfile.json:3-7).
SCHEMA_EVOLUTION: dict[int, tuple[str, ...]] = {
    1: (),
    2: ("language", "material_type"),
}


def promoted_columns(max_schema_version: int) -> tuple[str, ...]:
    cols: list[str] = []
    for v in sorted(SCHEMA_EVOLUTION):
        if v <= max_schema_version:
            cols.extend(SCHEMA_EVOLUTION[v])
    return tuple(cols)
