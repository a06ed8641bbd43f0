"""Balanced-shard operator: the distributed two-phase prefix sum must
match a single-threaded greedy packing exactly (the engine-vs-oracle
rule applied to shard assignment), and its plan must contain no global
single-partition sort/window (the scale contract)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from nifi_tekst_bundle_spark.operators import shard


def _oracle(pdf: pd.DataFrame, target: int) -> dict[int, int]:
    out, run = {}, 0
    for r in pdf.sort_values("doc_id").itertuples(index=False):
        out[r.doc_id] = run // target
        run += r.w
    return out


def test_balanced_shards_matches_serial_packing(spark):
    rng = np.random.default_rng(99)
    pdf = pd.DataFrame(
        {
            # non-contiguous, shuffled ids: chunking must not assume density
            "doc_id": rng.permutation(np.arange(0, 3000, 3)),
            "w": rng.integers(1, 50, size=1000),
        }
    )
    df = spark.createDataFrame(pdf.astype({"doc_id": int, "w": int}))
    got = {
        r["doc_id"]: r["shard_id"]
        for r in shard.balanced_shards(
            df, "doc_id", "w", target_weight=400, ids_per_chunk=128
        ).collect()
    }
    assert got == _oracle(pdf, 400)


def test_balanced_shards_chunk_boundary_exact(spark):
    # weights that land a shard boundary exactly on a chunk boundary
    pdf = pd.DataFrame({"doc_id": range(8), "w": [100] * 8})
    df = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: r["shard_id"]
        for r in shard.balanced_shards(
            df, "doc_id", "w", target_weight=200, ids_per_chunk=2
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3, 7: 3}


def test_balanced_shards_no_global_sort(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    df = df.withColumn("w", (df.doc_id % 7 + 1).cast("long"))
    out = shard.balanced_shards(df, "doc_id", "w", 500, ids_per_chunk=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the cumsum window partitions by chunk; a global ORDER BY window would
    # show Exchange SinglePartition — the scale-killer this operator avoids
    assert "SinglePartition" not in plan
