"""Sharded binlog/WAL merge: a deterministic global LWW order over change
streams arriving from MULTIPLE source shards (Debezium multi-partition
topics, MySQL GTID per shard, Postgres logical slots per database).

The engine's LWW registers need ONE totally ordered lsn. When each shard
emits its own monotone sequence, the standard interleaving

    global_lsn = shard_lsn * n_shards + shard_id

is (a) order-preserving within every shard (monotone in shard_lsn), and
(b) collision-free across shards (distinct residues mod n_shards). Under
the usual sharded-CDC deployment invariant — each KEY's events all flow
through one shard (keys are hash-routed to shards) — per-key order is
exactly per-shard order, so the merged stream folds to the same final
state the source database had. Cross-shard relative order is arbitrary
but DETERMINISTIC (replay-stable), which is all exactly-once replay
needs.

This is a PURE NARROW projection: no window, no renumbering, no shuffle —
the merge adds zero cost to the 10^10-event tail path. (A per-shard dense
renumber via row_number would funnel each shard through one partition;
the multiply-interleave needs only the shard's own positions, which
binlogs already provide.)

Reference analogue: the reference consumes one NiFi queue per source and
relies on per-item keys for ordering (SURVEY §2.6 within-batch order);
this grows that to the multi-source deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_shard_logs(
    shards: list[tuple[int, DataFrame]],
    n_shards: int,
    lsn_col: str = "lsn",
) -> DataFrame:
    """Union per-shard change streams under the interleaved global order.

    ``shards`` is [(shard_id, events_df)] where each df's ``lsn_col`` is
    that shard's own monotone position (binlog offset — need not be
    dense). Emits the union with ``lsn`` replaced by the global
    interleaving and the originating ``shard_id`` kept for lineage.

    Raises on shard ids outside [0, n_shards) — a mis-sharded stream
    would silently collide with another shard's lsn space.
    """
    out = None
    for shard_id, df in shards:
        if not (0 <= shard_id < n_shards):
            raise ValueError(
                f"shard_id {shard_id} outside [0, {n_shards})"
            )
        g = df.withColumn(
            lsn_col,
            (F.col(lsn_col) * n_shards + F.lit(shard_id)).cast("long"),
        ).withColumn("shard_id", F.lit(shard_id).cast("int"))
        out = g if out is None else out.unionByName(g)
    if out is None:
        raise ValueError("merge_shard_logs needs at least one shard")
    return out
