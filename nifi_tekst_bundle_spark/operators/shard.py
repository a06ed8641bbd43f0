"""Balanced output sharding — assign every row a shard id so each shard
carries ~``target_weight`` of a weight column (token counts), while
preserving a global order column. This is the "pack the cleaned corpus
into equal-token training shards" step of an LLM data pipeline, and the
positional-packing analogue of the reference's ordered page assignment
(ReorderFiles.kt:132-136: positional index -> zero-padded page number),
re-expressed as a weight-balanced prefix sum.

Scale design — why not one window?  ``sum(w) OVER (ORDER BY id)`` with no
PARTITION BY collapses the whole table into a single sorted partition:
the classic scale-killer (fine at 60k rows, dead at 10^10). Instead we
run the textbook distributed prefix sum:

  1. chunk rows by ``floor(order / ids_per_chunk)`` — chunks are
     contiguous runs of the global order, so prefix sums compose;
  2. per-chunk totals via one map-side-combinable groupBy
     (``n_chunks = id_range / ids_per_chunk`` rows);
  3. the driver folds the sorted chunk totals into EXCLUSIVE prefix
     offsets — bounded metadata, the same class as the lake layer's
     touched-bucket collects (at 10^10 ids and ids_per_chunk=10^6 this
     is 10^4 tiny rows, never event data);
  4. broadcast the offsets back and finish with a within-chunk window
     cumsum — every window partition holds at most ``ids_per_chunk``
     rows, so no executor ever sorts more than one chunk.

``shard_id = floor(exclusive_global_cumsum / target_weight)`` is a pure
function of the data, so replays and both engines of an oracle compare
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def balanced_shards(
    df: DataFrame,
    order_col: str,
    weight_col: str,
    target_weight: int,
    ids_per_chunk: int = 4096,
    out_col: str = "shard_id",
) -> DataFrame:
    """Add ``out_col``: the 0-based shard index under a running-total
    packing of ``weight_col`` in ``order_col`` order.

    ``order_col`` must be unique and non-negative (a doc id / lsn);
    ``weight_col`` must be a non-negative integral weight. A shard may
    overshoot ``target_weight`` by at most one row's weight — the same
    greedy packing a single-threaded writer would produce, which is what
    makes the result order-independent and oracle-checkable.
    """
    base = df.withColumn(
        "_chunk", F.floor(F.col(order_col) / F.lit(ids_per_chunk)).cast("long")
    )
    # bounded driver-side metadata: one row per chunk, never event data
    totals = base.groupBy("_chunk").agg(
        F.sum(F.col(weight_col).cast("long")).alias("_w")
    ).collect()
    offsets, running = [], 0
    for r in sorted(totals, key=lambda r: r["_chunk"]):
        offsets.append((int(r["_chunk"]), running))
        running += int(r["_w"])
    off_df = df.sparkSession.createDataFrame(
        offsets, schema="_chunk long, _offset long"
    )
    w = Window.partitionBy("_chunk").orderBy(order_col)
    cum_excl = F.sum(F.col(weight_col).cast("long")).over(w) - F.col(weight_col)
    return (
        base.join(F.broadcast(off_df), "_chunk")
        .withColumn(
            out_col,
            F.floor((F.col("_offset") + cum_excl) / F.lit(target_weight)).cast(
                "int"
            ),
        )
        .drop("_chunk", "_offset")
    )
