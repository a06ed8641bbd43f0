"""Training-export sink tests (sinks/export.py)."""

from __future__ import annotations

import glob
import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.sinks import export


def _docs(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
    )


def test_export_roundtrip_counts_and_manifest(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="export_"), "corpus")
    m = export.export_jsonl_shards(_docs(spark), out, n_shards=4, id_col="doc_id")
    assert m["total_rows"] == 60 and m["n_shards"] == 4
    assert sum(m["shards"].values()) == 60
    disk = json.load(open(os.path.join(out, "_MANIFEST.json")))
    assert disk == m
    # gzip shard files exist under shard= dirs
    files = glob.glob(os.path.join(out, "shard=*", "*.json.gz"))
    assert files
    back = export.read_export(spark, out)
    assert back.count() == 60
    assert set(r["doc_id"] for r in back.collect()) == set(range(60))


def test_export_shard_assignment_deterministic(spark):
    base = tempfile.mkdtemp(prefix="export_det_")
    m1 = export.export_jsonl_shards(_docs(spark), os.path.join(base, "a"),
                                    n_shards=4, id_col="doc_id")
    m2 = export.export_jsonl_shards(_docs(spark), os.path.join(base, "b"),
                                    n_shards=4, id_col="doc_id")
    assert m1 == m2
    # per-shard membership identical across exports
    for s in range(4):
        a = {r["doc_id"] for r in spark.read.json(
            os.path.join(base, "a", f"shard={s}")).collect()}
        b = {r["doc_id"] for r in spark.read.json(
            os.path.join(base, "b", f"shard={s}")).collect()}
        assert a == b


def test_export_is_immutable_and_incomplete_reads_fail(spark):
    out = os.path.join(tempfile.mkdtemp(prefix="export_imm_"), "corpus")
    export.export_jsonl_shards(_docs(spark, 10), out, n_shards=2, id_col="doc_id")
    with pytest.raises(ValueError, match="immutable"):
        export.export_jsonl_shards(_docs(spark, 10), out, n_shards=2,
                                   id_col="doc_id")
    # an export dir without a manifest (crashed mid-write) refuses reads
    os.remove(os.path.join(out, "_MANIFEST.json"))
    with pytest.raises(ValueError, match="incomplete"):
        export.read_export(spark, out)
