"""Kafka-seam offsets contract (sources/kafka_seam.py): final table
state must be invariant to cross-partition arrival order — the one
property a Kafka deployment gives (per-partition order + key routing)
and the only one the engine may rely on."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import lww
from nifi_tekst_bundle_spark.plans import catalog
from nifi_tekst_bundle_spark.sources import kafka_seam

SF = "/root/testdata/sf0.001"
PAYLOAD = catalog.CDC_PAYLOAD


def _final(events):
    regs = lww.batch_registers(
        events.select("lsn", "batch_id", "op", "conv_id", "turn_idx", *PAYLOAD),
        PAYLOAD,
    )
    cols = ["conv_id", "turn_idx", *PAYLOAD]
    rows = map(tuple, lww.visible(regs, PAYLOAD).select(*cols).collect())
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


def test_two_partition_replay_reproduces_single_log_state(spark, tmp_path):
    """Split the derived change log into two key-routed 'partitions'
    with their own dense per-partition offsets (exactly a two-partition
    Kafka topic), write them as directories, read back through the seam,
    and assert the LWW final state equals the single-log replay — under
    BOTH partition labelings (cross-partition interleaving differs, the
    answer must not)."""
    # keyed routing needs a key: rows with a NULL conv_id go through id
    # synthesis upstream of any real partitioned producer (resolve.py),
    # so the seam contract is stated over keyed events
    events = catalog.derive_change_events(spark, SF).filter(
        F.col("conv_id").isNotNull()
    )
    want = _final(events)

    # key-route: partition = hash(conv_id) % 2 (Kafka's default keyed
    # producer); per-partition offset = rank of lsn within the partition
    # (dense, monotone — preserves per-partition == per-key order)
    part = F.pmod(F.xxhash64(F.col("conv_id")), F.lit(2)).cast("int")
    w = Window.partitionBy("_part").orderBy("lsn")
    routed = (
        events.withColumn("_part", part)
        .withColumn("_offset", F.row_number().over(w).cast("long"))
    )
    dirs = {}
    for p in (0, 1):
        d = str(tmp_path / f"topic-part-{p}")
        (
            routed.filter(F.col("_part") == p)
            .drop("_part", "lsn")
            .withColumnRenamed("_offset", "lsn")
            .write.parquet(d)
        )
        dirs[p] = d

    merged = kafka_seam.read_partitioned_log(spark, dirs).drop("shard_id")
    got = _final(merged)
    assert got == want

    # a broker "rebalance": the same directories consumed with swapped
    # partition numbers — a completely different cross-partition
    # interleaving of global lsns — must produce the identical state
    swapped = kafka_seam.read_partitioned_log(
        spark, {0: dirs[1], 1: dirs[0]}
    ).drop("shard_id")
    assert _final(swapped) == want


def test_seam_rejects_out_of_range_partition(spark, tmp_path):
    import pytest

    d = str(tmp_path / "p0")
    catalog.derive_change_events(spark, SF).limit(5).write.parquet(d)
    with pytest.raises(ValueError, match="outside"):
        kafka_seam.read_partitioned_log(spark, {3: d}, n_partitions=2)
