"""Cascade cleanup — the reference's derived-data invalidation, Spark-first.

O7 ``cleanupEmptiedSourceFolders`` (ReorderFiles.kt:200-240): set-difference
source−target item ids, then delete an item's tree only if no pages remain →
anti-join + NOT-EXISTS conditional delete.

O8 ``deleteOcrFiles`` (ReorderFiles.kt:242-270): invalidate all derived rows
for a changed conversation → cascade delete on the enrichment table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY = ["conv_id"]


def emptied_conversations(
    pre_conv_ids: DataFrame, post_state_visible: DataFrame
) -> DataFrame:
    """Conversations that existed before the epoch and have zero surviving
    turns after it (anti-join against the post-state)."""
    survivors = post_state_visible.select("conv_id").distinct()
    return pre_conv_ids.select("conv_id").distinct().join(
        survivors, "conv_id", "left_anti"
    )


def cascade_invalidate(
    derived: DataFrame, changed_conv_ids: DataFrame
) -> DataFrame:
    """Drop every derived row for a changed conversation (the OCR-file
    invalidation): derived data must be recomputed after upstream change."""
    return derived.join(
        changed_conv_ids.select("conv_id").distinct(), "conv_id", "left_anti"
    )


def cleanup_emptied(
    derived: DataFrame,
    pre_conv_ids: DataFrame,
    post_state_visible: DataFrame,
) -> DataFrame:
    """Full O7 pipeline: derived rows of emptied conversations are removed;
    non-empty conversations keep theirs."""
    emptied = emptied_conversations(pre_conv_ids, post_state_visible)
    return derived.join(emptied, "conv_id", "left_anti")
