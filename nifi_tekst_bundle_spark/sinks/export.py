"""Training-export sink: the cleaned corpus as sharded, compressed JSONL.

The last mile of the pipeline — downstream training stacks consume
line-delimited JSON shards, not a lake table.  This sink writes
``shard=NNN`` directories of gzip JSONL under ``out_dir`` plus a
``_MANIFEST.json`` recording per-shard row counts, written LAST so a
complete manifest implies a complete export (the same
commit-marker-after-data discipline as the lake layer's HEAD swap,
table/lake.py _write_manifest; reference analogue: the staged
rename-then-commit of RenameS3Utils.kt).

Scale/determinism contract:
- shard = md5(id) % n_shards (the shuffle_positions convention): the
  row→shard mapping is a pure function of the data, so re-exports land
  every row in the same shard;
- rows inside each shard are written in md5-rank order (one
  repartition-by-shard + sortWithinPartitions — no global sort);
- Spark's native JSON writer does the serialization JVM-side
  (one pass, no Python), gzip per file;
- the driver only ever holds the per-shard counts (n_shards rows).

Timestamps/maps serialize per Spark's JSON writer defaults; exports are
for TRAINING consumption, not round-trip storage — the lake table
remains the durable copy.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import hash64


def export_jsonl_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str,
    compression: str = "gzip",
) -> dict:
    """Write ``df`` as ``out_dir/shard=N/*.json.gz`` + ``_MANIFEST.json``.

    Returns the manifest dict: {"n_shards", "total_rows", "shards":
    {shard: rows}}.  Raises if out_dir already holds a manifest (exports
    are immutable artifacts — write a new directory per export, the
    lake's snapshot discipline)."""
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if os.path.exists(manifest_path):
        raise ValueError(
            f"export target {out_dir} already has a manifest; exports are "
            "immutable — write a new directory"
        )
    hkey = F.md5(F.col(id_col).cast("string").cast("binary"))
    shard = (
        hash64(F.col(id_col).cast("string")) % n_shards
    ).cast("int")
    staged = (
        df.withColumn("shard", shard)
        .withColumn("_hkey", hkey)
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "_hkey", id_col)
        .drop("_hkey")
    )
    (
        staged.write.partitionBy("shard")
        .option("compression", compression)
        .mode("error")
        .json(out_dir)
    )
    # counts come from the WRITTEN files, not a second evaluation of the
    # (possibly expensive) upstream plan: one text scan of the output,
    # partition discovery recovers the shard column, and the manifest then
    # certifies what actually landed on disk — strictly stronger than
    # re-deriving the expected counts
    spark = df.sparkSession
    counts = (
        spark.read.format("text")
        .option("basePath", out_dir)
        .load(os.path.join(out_dir, "shard=*"))
        .groupBy("shard")
        .count()
        .collect()
    )
    shards = {int(r["shard"]): int(r["count"]) for r in counts}
    manifest = {
        "n_shards": int(n_shards),
        "total_rows": int(sum(shards.values())),
        "shards": {str(k): v for k, v in sorted(shards.items())},
    }
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def read_export(spark, out_dir: str) -> DataFrame:
    """Read an export back (validation/consumers): fails loudly if the
    manifest is missing — a directory without one is an incomplete or
    crashed export, never silently readable."""
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    if not os.path.exists(manifest_path):
        raise ValueError(f"{out_dir} has no _MANIFEST.json — incomplete export")
    return spark.read.json(os.path.join(out_dir, "shard=*"))


def export_delta_jsonl(
    spark,
    table,
    base_version: int,
    out_dir: str,
    n_shards: int,
    key_col: str = "conv_id",
    compression: str = "gzip",
) -> dict:
    """Incremental training-data publish: export ONLY the conversations
    changed since ``base_version`` — the per-epoch delta a downstream
    training stack applies to its copy of the corpus, instead of
    re-downloading a full export after every ingest epoch.

    Contract (conversation-granular, replace-then-delete):
    - the export holds the CURRENT visible rows of every conversation the
      change feed touched between base_version and HEAD;
    - the manifest's ``deleted_keys`` lists touched conversations with NO
      remaining visible rows (fully deleted) — explicit tombstones,
      because a JSONL consumer cannot infer deletion from absence;
    - a consumer applies the delta by dropping ALL its rows for touched
      keys (exported ∪ deleted), then appending the exported rows.
      Applying onto a base-version export reproduces the HEAD export —
      pinned by tests/test_export_sink.py::test_delta_export_reconstructs_head.

    Scale: the diff comes from ``table.table_changes`` (bucket-pruned —
    reads only buckets whose file lists differ between the manifests), the
    visible read is semi-joined down to touched keys before anything
    shuffles, and the export itself is the standard sharded writer. Cost
    ∝ changed conversations per epoch, never corpus size.

    Returns the manifest dict (export_jsonl_shards' manifest plus
    ``delta``: {base_version, head_version, touched_keys, deleted_keys}).
    """
    head = table.manifest().version
    if base_version >= head:
        raise ValueError(
            f"base_version {base_version} is not below HEAD {head}"
        )
    diff = table.table_changes(spark, base_version, head)
    touched = diff.select(F.col(key_col)).distinct()
    vis = table.visible(spark).join(touched, key_col, "left_semi")
    manifest = export_jsonl_shards(vis, out_dir, n_shards, key_col, compression)
    surviving = {r[0] for r in vis.select(key_col).distinct().collect()}
    touched_keys = sorted(r[0] for r in touched.collect())
    deleted = sorted(set(touched_keys) - surviving)
    manifest["delta"] = {
        "base_version": int(base_version),
        "head_version": int(head),
        "touched_keys": touched_keys,
        "deleted_keys": deleted,
    }
    manifest_path = os.path.join(out_dir, "_MANIFEST.json")
    with open(manifest_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest
