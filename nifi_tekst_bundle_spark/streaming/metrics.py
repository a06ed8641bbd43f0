"""Watermarked streaming metrics over the change-event stream.

The reference emits a per-batch result summary (ReorderFiles.kt:396-406);
the engine's lineage table (table.lake) grows that into per-epoch,
per-partition rows. This module adds the *continuous* view: an event-time
windowed aggregation with a watermark bounding state — the one place the
engine needs Structured Streaming's late-data machinery (SURVEY.md §2.6:
no event-time windows exist in the reference; the watermark exists solely
to bound the metrics/lag computation, never to drop CDC events — the LWW
registers make late CDC events safe by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_metrics(
    events_stream: DataFrame,
    watermark_delay: str = "10 minutes",
    window_length: str = "5 minutes",
) -> DataFrame:
    """Event-time windowed op counts over a *streaming* event DataFrame.

    The watermark bounds aggregation state: windows older than
    (max event time − delay) finalize and evict. Late events inside the
    delay still count; later ones are dropped FROM THE METRICS ONLY —
    the CDC apply path never drops them (LWW absorbs any ordering).
    """
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(
            F.window(F.col("ts"), window_length).alias("win"),
            F.col("op"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("conv_id").alias("approx_convs"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "op",
            "n_events",
            "approx_convs",
            "max_lsn",
        )
    )
