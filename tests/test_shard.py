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


def _pack_oracle(pdf: pd.DataFrame, ctx: int) -> list[tuple]:
    """Single-threaded concat-and-chunk: walk docs in id order, cut the
    token stream every ctx tokens, record each (seq, doc) overlap."""
    rows, off = [], 0
    for r in pdf.sort_values("doc_id").itertuples(index=False):
        if r.w <= 0:
            continue
        start = off
        while start < off + r.w:
            seq = start // ctx
            end = min(off + r.w, (seq + 1) * ctx)
            rows.append(
                (seq, r.doc_id, start - off, end - off, start - seq * ctx,
                 end - start)
            )
            start = end
        off += r.w
    return rows


def test_pack_sequences_matches_serial_concat_chunk(spark):
    rng = np.random.default_rng(7)
    pdf = pd.DataFrame(
        {
            "doc_id": rng.permutation(np.arange(0, 900, 3)),
            # include docs longer than ctx (span >1 sequence) and zero-token
            # docs (must emit nothing)
            "w": np.concatenate(
                [rng.integers(0, 4, 100), rng.integers(1, 700, 200)]
            ),
        }
    )
    df = spark.createDataFrame(pdf.astype({"doc_id": int, "w": int}))
    got = sorted(
        (
            r["seq_id"], r["doc_id"], r["doc_tok_start"], r["doc_tok_end"],
            r["seq_pos_start"], r["n_toks"],
        )
        for r in shard.pack_sequences(
            df, "doc_id", "w", ctx_len=256, ids_per_chunk=64
        ).collect()
    )
    assert got == sorted(_pack_oracle(pdf, 256))


def test_pack_sequences_invariants(spark):
    """Every sequence except the last holds exactly ctx tokens; every
    doc's slices cover [0, w) without gap or overlap."""
    pdf = pd.DataFrame({"doc_id": range(50), "w": [37] * 50})
    df = spark.createDataFrame(pdf)
    rows = shard.pack_sequences(df, "doc_id", "w", ctx_len=128).collect()
    per_seq: dict[int, int] = {}
    per_doc: dict[int, list] = {}
    for r in rows:
        per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + r["n_toks"]
        per_doc.setdefault(r["doc_id"], []).append(
            (r["doc_tok_start"], r["doc_tok_end"])
        )
    last = max(per_seq)
    assert all(v == 128 for s, v in per_seq.items() if s != last)
    assert sum(per_seq.values()) == 50 * 37
    for spans in per_doc.values():
        spans.sort()
        assert spans[0][0] == 0 and spans[-1][1] == 37
        assert all(a[1] == b[0] for a, b in zip(spans, spans[1:]))


def test_pack_sequences_no_global_sort(spark):
    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    df = df.withColumn("w", (df.doc_id % 7 + 1).cast("long"))
    out = shard.pack_sequences(df, "doc_id", "w", ctx_len=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_mixture_sample_budgets_and_determinism(spark):
    """Each source keeps exactly the md5-ordered prefix that fits its
    budget; unknown sources are dropped; replays are bit-identical."""
    from pyspark.sql import functions as F

    from nifi_tekst_bundle_spark.operators import shard

    rows = [(i, "a" if i < 6 else ("b" if i < 12 else "zzz"), 10)
            for i in range(18)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = shard.mixture_sample(df, {"a": 35, "b": 100})
    got = sorted((r["source"], r["doc_id"], r["cum_tokens"]) for r in out.collect())
    # a: budget 35 -> 3 docs of 10 tokens fit (cum 10,20,30; 40 > 35)
    # b: budget 100 -> all 6 docs fit (cum <= 60)
    # zzz: not in the mixture -> dropped
    assert [g[0] for g in got] == ["a"] * 3 + ["b"] * 6
    assert max(c for s, _, c in got if s == "a") == 30
    assert max(c for s, _, c in got if s == "b") == 60
    # md5-prefix determinism: same input, same kept set
    again = sorted((r["source"], r["doc_id"], r["cum_tokens"])
                   for r in shard.mixture_sample(df, {"a": 35, "b": 100}).collect())
    assert got == again
    # kept 'a' docs are the md5-rank prefix, not doc_id order
    ranked = [r["doc_id"] for r in df.filter(F.col("source") == "a")
              .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").collect()]
    assert sorted(g[1] for g in got if g[0] == "a") == sorted(ranked[:3])
