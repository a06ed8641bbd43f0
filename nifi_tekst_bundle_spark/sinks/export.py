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
