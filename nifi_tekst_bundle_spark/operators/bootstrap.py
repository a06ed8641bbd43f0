"""Bootstrap-then-tail ingestion: initial snapshot import + CDC catch-up.

The standard way a CDC pipeline comes up against an existing source: take
one consistent snapshot at a WAL position W (the watermark), bulk-import
it, then tail the change stream strictly after W.  The reference does the
degenerate form of this every trigger — read current disk state, then
apply the change batch against it (ReorderFiles.kt:150-184); here the
snapshot is a first-class import path into the same fenced lake commits
the stream uses.

Correctness argument (why bootstrap+tail == full replay, bit-for-bit):
the import stamps every snapshot row as an ``insert`` at lsn=W.  Every
tail event has lsn > W, so per-column LWW lets any tail write or delete
beat the imported value — exactly the precedence the full replay gives
post-W events over pre-W state.  A key invisible at W (deleted pre-W)
is simply absent from the import; the full fold hides it identically
(its l_col <= ldel <= W < any reviving tail lsn).  Conversely nothing in
the import can shadow a tail event.  So the final visible states agree.
A catalog query pins this against the same DuckDB full-replay oracle as
the streaming path (plans/catalog.py q_cdc_bootstrap_tail).

Scale posture: the snapshot fold is the ordinary one-shuffle register
aggregation; the import is ONE fenced merge_batch (bucket-parallel
write, no per-row driver work); the tail is the unchanged streaming
path.  At 10^10 events this is the shape you want: the bulk of history
enters as a parallel columnar import instead of being replayed
event-by-event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import lww


def snapshot_as_import_events(
    snapshot: DataFrame,
    watermark_lsn: int,
    payload_cols: list[str],
    batch_id: str = "bootstrap",
) -> DataFrame:
    """Stamp a consistent snapshot as watermark-LSN insert events.

    One event per visible (conv_id, turn_idx) row, all at ``lsn ==
    watermark_lsn`` (each key appears once, so the shared lsn is
    tie-free inside the register aggregation).  The result matches
    CHANGE_EVENT_SCHEMA so it flows through the production
    validate → merge_batch path unchanged.
    """
    cols = [
        F.lit(int(watermark_lsn)).cast("long").alias("lsn"),
        F.lit(batch_id).alias("batch_id"),
        F.lit("insert").alias("op"),
        F.col("conv_id").cast("string").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("src_conv_id"),
        F.lit(None).cast("int").alias("src_turn_idx"),
    ]
    for c in payload_cols:
        src = F.col(c) if c in snapshot.columns else F.lit(None)
        typ = "timestamp" if c == "ts" else "string"
        cols.append(src.cast(typ).alias(c))
    if "ts" not in payload_cols:
        cols.append(F.lit(None).cast("timestamp").alias("ts"))
    cols.append(F.lit(None).cast("map<string,string>").alias("extra"))
    cols.append(F.lit(1).cast("int").alias("schema_version"))
    return snapshot.select(*cols)


def snapshot_at(
    events: DataFrame, watermark_lsn: int, payload_cols: list[str]
) -> DataFrame:
    """Visible state of a validated change log at an LSN watermark —
    the 'consistent snapshot' half of bootstrap-then-tail.  One
    register fold over events with lsn <= watermark (single shuffle).

    Precondition: ``events`` is the validated, move-free normalized log
    (lsn, op, conv_id, turn_idx, payload...).  A log with pre-watermark
    ``move`` ops needs the sequential pre-batch-state resolution —
    build that snapshot with apply.apply_derived_log instead; the tail
    (where moves replay through the streaming runner) is unaffected."""
    pre = events.filter(F.col("lsn") <= int(watermark_lsn))
    return lww.visible(
        lww.batch_registers(pre, payload_cols), payload_cols
    )


def bootstrap_table(
    spark: SparkSession,
    table,
    events: DataFrame,
    watermark_lsn: int,
    payload_cols: list[str],
) -> bool:
    """Bulk-import the snapshot at ``watermark_lsn`` into ``table`` as
    one fenced commit (fence key 'bootstrap' — re-running is the same
    exactly-once no-op as any re-delivered epoch).  Returns
    merge_batch's committed flag."""
    snap = snapshot_at(events, watermark_lsn, payload_cols)
    imp = snapshot_as_import_events(snap, watermark_lsn, payload_cols)
    return table.merge_batch(
        spark, imp, fence_key="bootstrap", batch_id="bootstrap"
    )
