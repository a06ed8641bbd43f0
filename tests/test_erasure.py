"""Right-to-be-forgotten tests (table/lake.py erase_keys)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.table.lake import LakeTable, bucket_expr

DDL = (
    "lsn long, batch_id string, op string, conv_id string, turn_idx int, "
    "role string, text string, tool string, src_conv_id string, "
    "src_turn_idx int, schema_version int, ts timestamp"
)


def _mk_table(spark, tmp_path, n_buckets=8):
    rows = [
        (i + 1, "b00", "insert", f"conv-{i % 6:04d}", i // 6, "user",
         f"secret-{i % 6:04d}-{i}", None, None, None, 1, None)
        for i in range(60)
    ]
    events = spark.createDataFrame(rows, DDL)
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"),
        payload_cols=["role", "text", "tool"], n_buckets=n_buckets,
    )
    t.merge_batch(spark, events, fence_key="f0", batch_id="b00")
    # a second commit so there is real history to purge
    upd = spark.createDataFrame(
        [(100 + i, "b01", "update", f"conv-{i % 6:04d}", i // 6, None,
          f"rev-{i}", None, None, None, 1, None) for i in range(12)],
        DDL,
    )
    t.merge_batch(spark, upd, fence_key="f1", batch_id="b01")
    return t


def test_erase_removes_only_requested_keys(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    before = {r["conv_id"] for r in t.visible(spark).select("conv_id").distinct().collect()}
    stats = t.erase_keys(spark, ["conv-0002"])
    after = t.visible(spark)
    convs = {r["conv_id"] for r in after.select("conv_id").distinct().collect()}
    assert convs == before - {"conv-0002"}
    assert stats["rows_erased"] == 10
    assert after.filter(F.col("text").contains("secret-0002")).count() == 0


def test_time_travel_below_erase_floor_refuses(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    pre = t._head_version()
    stats = t.erase_keys(spark, ["conv-0001"])
    floor = stats["version"]
    with pytest.raises(ValueError, match="erasure horizon"):
        t.manifest_at(pre)
    with pytest.raises(ValueError, match="erasure horizon"):
        t.visible_at(spark, pre)
    # the erasure snapshot itself is readable
    assert t.visible_at(spark, floor).count() == t.visible(spark).count()


def test_history_files_physically_purged_bucket_pruned(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    m_pre = t.manifest()
    n_buckets = m_pre.n_buckets
    target = "conv-0003"
    b = (
        spark.createDataFrame([(target,)], "conv_id string")
        .select(bucket_expr(n_buckets).alias("b"))
        .first()[0]
    )
    affected_paths = [f["path"] for f in m_pre.files if f["bucket"] == b]
    other_paths = [f["path"] for f in m_pre.files if f["bucket"] != b]
    assert affected_paths and other_paths
    t.erase_keys(spark, [target])
    # pre-erasure files of the affected bucket are gone from disk…
    assert all(not os.path.exists(p) for p in affected_paths)
    # …while unaffected buckets' files survive (bucket-pruned purge) and
    # the head stays fully readable
    assert all(os.path.exists(p) for p in other_paths)
    assert t.visible(spark).filter(F.col("conv_id") == target).count() == 0


def test_merge_after_erase_carries_floor_and_reinserts(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.erase_keys(spark, ["conv-0000"])
    floor = int(t.manifest().erase_floor)
    fresh = spark.createDataFrame(
        [(500, "b02", "insert", "conv-0000", 0, "user", "new life",
          None, None, None, 1, None)],
        DDL,
    )
    t.merge_batch(spark, fresh, fence_key="f2", batch_id="b02")
    assert int(t.manifest().erase_floor) == floor  # carried forward
    vis = t.visible(spark).filter(F.col("conv_id") == "conv-0000").collect()
    assert [r["text"] for r in vis] == ["new life"]
    # CDF works across post-floor versions, refuses across the floor
    assert t.table_changes(spark, floor, floor + 1).count() == 1
    with pytest.raises(ValueError, match="erasure horizon"):
        t.table_changes(spark, floor - 1, floor)


def test_redact_dead_letters_nulls_matching_details(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    att = os.path.join(t.dl_dir, "att-test")
    os.makedirs(att, exist_ok=True)
    tbl = pa.table(
        {
            "lsn": pa.array([None, None], pa.int64()),
            "batch_id": pa.array(["bx", "bx"]),
            "op": pa.array([None, None], pa.string()),
            "reason": pa.array(["parse_error", "parse_error"]),
            "detail": pa.array(
                ['{"conv_id":"conv-0004","text":"leak"}', '{"broken json']
            ),
            "fence_key": pa.array(["fx", "fx"]),
            "attempt": pa.array(["test", "test"]),
            "epoch_id": pa.array([0, 0], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(att, "part-0.parquet"))
    n = t._redact_dead_letters(["conv-0004"])
    assert n == 1
    back = pq.read_table(os.path.join(att, "part-0.parquet"))
    details = back.column("detail").to_pylist()
    assert details.count(None) == 1 and '{"broken json' in details


def test_erase_empty_ids_raises(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    with pytest.raises(ValueError, match="at least one"):
        t.erase_keys(spark, [])


def test_vacuum_after_erase(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.erase_keys(spark, ["conv-0005"])
    t.vacuum()  # must not raise; head stays readable
    assert t.visible(spark).filter(F.col("conv_id") == "conv-0005").count() == 0


def test_lookup_scans_only_the_keys_bucket(spark, tmp_path):
    """Point read touches just the one bucket's files (inputFiles pin) and
    matches the full-table read's answer."""
    t = _mk_table(spark, tmp_path)
    m = t.manifest()
    target = "conv-0003"
    got = t.lookup(spark, target)
    want = t.visible(spark).filter(F.col("conv_id") == target)
    assert sorted(r["text"] for r in got.collect()) == sorted(
        r["text"] for r in want.collect()
    )
    b = (
        spark.createDataFrame([(target,)], "conv_id string")
        .select(bucket_expr(m.n_buckets).alias("b"))
        .first()[0]
    )
    bucket_paths = {f["path"] for f in m.files if f["bucket"] == b}
    scanned = {p.removeprefix("file://") for p in got.inputFiles()}
    assert scanned and scanned <= bucket_paths
    assert len(scanned) < len(m.files)


def test_expire_snapshots_bounds_metadata_and_keeps_head(spark, tmp_path):
    """Expiry removes pre-horizon manifests (time travel to them raises
    the loud 'no longer exists' error), keeps the newest keep_last
    versions readable, and leaves the fence map intact so re-delivery
    stays exactly-once."""
    t = _mk_table(spark, tmp_path)  # two commits: v1, v2
    extra = spark.createDataFrame(
        [(600, "b02", "insert", "conv-0000", 20, "user", "third",
          None, None, None, 1, None)],
        DDL,
    )
    t.merge_batch(spark, extra, fence_key="f2", batch_id="b02")
    head = t._head_version()
    assert head >= 3
    removed = t.expire_snapshots(keep_last=2)
    assert removed == head - 2  # everything below the keep horizon
    with pytest.raises(ValueError, match="no longer exists"):
        t.manifest_at(head - 2)
    assert t.visible_at(spark, head - 1).count() > 0  # kept history reads
    # fences survive: re-delivery is still a no-op
    assert t.merge_batch(spark, extra, fence_key="f2", batch_id="b02") is False
    assert t.visible(spark).filter(F.col("text") == "third").count() == 1
    with pytest.raises(ValueError, match="keep_last"):
        t.expire_snapshots(keep_last=0)


def test_tags_pin_snapshots_through_expiry_and_fall_to_erasure(spark, tmp_path):
    """A tagged version survives expire_snapshots and reads back the
    exact pinned state; erasure drops pre-floor tags (that history is
    physically gone and a pin must not promise otherwise)."""
    t = _mk_table(spark, tmp_path)  # head: create + 2 merges
    v_pin = t._head_version()
    pinned_rows = t.visible(spark).count()
    assert t.tag("train-run-1") == v_pin  # tag commit bumps head
    extra = spark.createDataFrame(
        [(700, "b03", "insert", "conv-0001", 30, "user", "later",
          None, None, None, 1, None)],
        DDL,
    )
    t.merge_batch(spark, extra, fence_key="f3", batch_id="b03")
    t.merge_batch(
        spark,
        spark.createDataFrame(
            [(701, "b04", "insert", "conv-0002", 30, "user", "even later",
              None, None, None, 1, None)],
            DDL,
        ),
        fence_key="f4", batch_id="b04",
    )
    t.expire_snapshots(keep_last=1)
    # everything but HEAD expired — except the pinned version
    assert t.visible_at_tag(spark, "train-run-1").count() == pinned_rows
    with pytest.raises(ValueError, match="unknown tag"):
        t.visible_at_tag(spark, "nope")
    # erasure moves the floor above the pin → the tag is dropped
    t.erase_keys(spark, ["conv-0000"])
    assert "train-run-1" not in (t.manifest().tags or {})
    with pytest.raises(ValueError, match="erasure horizon"):
        t.tag("too-old", v_pin)


def test_visible_column_pruning_reaches_the_scan(spark, tmp_path):
    """visible(cols=['text']) must push the pruning into the parquet
    ReadSchema (no role/tool register bytes read) and return the same
    rows/values as the full read's text column."""
    t = _mk_table(spark, tmp_path)
    pruned = t.visible(spark, cols=["text"])
    assert set(pruned.columns) == {"conv_id", "turn_idx", "text"}
    full = t.visible(spark).select("conv_id", "turn_idx", "text")
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    read_schemas = [
        seg.split("\n")[0] for seg in plan.split("ReadSchema: ")[1:]
    ]
    assert read_schemas
    assert all("text" in rs for rs in read_schemas)
    assert all("role" not in rs and "tool" not in rs for rs in read_schemas)
    with pytest.raises(ValueError, match="unknown payload"):
        t.visible(spark, cols=["nope"])
