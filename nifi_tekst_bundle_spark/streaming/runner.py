"""Structured Streaming runner: change-event log → fenced LakeTable commits.

The reference's NiFi scheduling model (onTrigger fires per queued FlowFile,
ReorderFiles.kt:330; framework batching via @SupportsBatching Jhove.kt:37)
becomes a Structured Streaming file source over the event log with
``foreachBatch`` applying each epoch:

- Spark checkpoints source offsets (which files belong to epoch N) —
  restart re-delivers the same epoch deterministically (NiFi's persistent
  queues, §2.6 of SURVEY.md);
- inside an epoch, events are applied one declarative producer batch
  (``batch_id``) at a time, in batch order — the reference's one change
  batch per onTrigger;
- each (run_id, epoch, batch_id) triple is a fence key recorded inside the
  LakeTable manifest swap, so a crash between sub-batches or a re-run of a
  committed epoch re-applies nothing: exactly-once end to end, replacing
  the reference's at-least-once + compensating rollback
  (ReorderFiles.kt:372-383).

Scale note: ``maxFilesPerTrigger`` bounds epoch size; producer batches stay
whole because the tailer writes one file per batch (fixtures analogue of a
binlog segment). Hot-key skew inside an epoch is defused by AQE plus the
salting helpers in operators.skew.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CHANGE_EVENT_SCHEMA
from ..table.lake import LakeTable


@dataclass
class StreamStats:
    epochs_seen: int = 0
    batches_applied: int = 0
    batches_skipped: int = 0  # fence hits (re-delivery)
    fence_keys: list[str] = field(default_factory=list)


def make_apply_fn(table: LakeTable, run_id: str, stats: StreamStats,
                  fail_after: list[int] | None = None,
                  hot_key_threshold: int | None = None):
    """foreachBatch body. ``fail_after`` injects a crash after N sub-batch
    commits (failure-injection tests — ReorderFilesTest.kt:319-345).
    ``hot_key_threshold`` enables per-batch hot-key detection + salted
    two-phase aggregation in the merge (see LakeTable.merge_batch)."""

    def apply_epoch(epoch_df: DataFrame, epoch_id: int) -> None:
        stats.epochs_seen += 1
        epoch_df = epoch_df.persist()
        try:
            batch_ids = [
                r[0]
                for r in epoch_df.select("batch_id").distinct().orderBy("batch_id").collect()
            ]
            for bid in batch_ids:
                fence = f"{run_id}/e{epoch_id}/{bid}"
                sub = epoch_df.filter(F.col("batch_id") == bid)
                applied = table.merge_batch(
                    epoch_df.sparkSession, sub, fence_key=fence,
                    batch_id=bid, epoch_id=epoch_id,
                    hot_key_threshold=hot_key_threshold,
                )
                if applied:
                    stats.batches_applied += 1
                    stats.fence_keys.append(fence)
                    if fail_after is not None and stats.batches_applied >= fail_after[0]:
                        raise RuntimeError("injected failure after commit")
                else:
                    stats.batches_skipped += 1
        finally:
            epoch_df.unpersist()

    return apply_epoch


def run_to_completion(
    spark: SparkSession,
    events_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    run_id: str = "run",
    max_files_per_trigger: int = 1,
    fail_after: list[int] | None = None,
    hot_key_threshold: int | None = None,
) -> StreamStats:
    """Consume everything currently in events_dir (Trigger.AvailableNow),
    applying fenced commits; returns stream stats. Re-invoking after a
    crash resumes from the checkpoint without dupes or gaps."""
    stats = StreamStats()
    src = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    q = (
        src.writeStream.foreachBatch(
            make_apply_fn(table, run_id, stats, fail_after, hot_key_threshold)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    except Exception:
        if fail_after is None:
            raise
        # injected crash: the query died mid-stream; caller restarts from
        # the checkpoint to prove exactly-once resume
    finally:
        if q.isActive:
            q.stop()
    return stats
