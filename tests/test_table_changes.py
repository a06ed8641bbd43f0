"""Time travel + change data feed (LakeTable.visible_at / table_changes).

The Delta-CDF / Iceberg-incremental-read analogue: a downstream consumer
refreshes from snapshot A to B by reading only the net keyed diff, and the
diff read is pruned to buckets whose file lists actually changed.
"""

from __future__ import annotations

import pandas as pd

from nifi_tekst_bundle_spark.table.lake import LakeTable, bucket_expr

from .conftest import normalize_frame, spark_events


def _events(spark, rows: list[dict]):
    base = {
        "batch_id": "b0",
        "op": "insert",
        "turn_idx": 1,
        "src_conv_id": None,
        "src_turn_idx": None,
        "role": "user",
        "text": None,
        "tool": None,
        "ts": None,
        "extra": None,
        "schema_version": 1,
    }
    return spark_events(spark, pd.DataFrame([{**base, **r} for r in rows]))


def _mk(spark, tmp_path, n_buckets=8):
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=n_buckets)
    table.merge_batch(
        spark,
        _events(
            spark,
            [
                {"lsn": i + 1, "conv_id": f"conv-{i:03d}", "text": f"t{i}"}
                for i in range(10)
            ],
        ),
        fence_key="r/e0/b0",
        epoch_id=0,
    )
    return table


def test_visible_at_time_travel(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v1 = table._head_version()
    snap1 = normalize_frame(table.visible(spark).toPandas())
    table.merge_batch(
        spark,
        _events(
            spark,
            [
                {"lsn": 20, "conv_id": "conv-000", "op": "delete"},
                {"lsn": 21, "conv_id": "conv-001", "op": "update", "text": "new"},
            ],
        ),
        fence_key="r/e1/b0",
        epoch_id=1,
    )
    # historical read is bit-identical to the snapshot taken at v1
    old = normalize_frame(table.visible_at(spark, v1).toPandas())
    pd.testing.assert_frame_equal(old, snap1)
    # HEAD read reflects the second commit
    now = table.visible(spark).toPandas()
    assert "conv-000" not in set(now["conv_id"])


def test_table_changes_classifies_and_same_version_is_empty(spark, tmp_path):
    table = _mk(spark, tmp_path)
    v1 = table._head_version()
    table.merge_batch(
        spark,
        _events(
            spark,
            [
                {"lsn": 20, "conv_id": "conv-000", "op": "delete"},
                {"lsn": 21, "conv_id": "conv-001", "op": "update", "text": "new"},
                {"lsn": 22, "conv_id": "conv-new", "text": "born"},
                # touched but value-identical: update that re-asserts t5;
                # role matches the seed default so no column actually moves
                {"lsn": 23, "conv_id": "conv-005", "op": "update",
                 "text": "t5", "role": "user"},
            ],
        ),
        fence_key="r/e1/b0",
        epoch_id=1,
    )
    v2 = table._head_version()

    ch = table.table_changes(spark, v1, v2).toPandas()
    by_type = {
        t: sorted(g["conv_id"]) for t, g in ch.groupby("change_type")
    }
    assert by_type["insert"] == ["conv-new"]
    assert by_type["delete"] == ["conv-000"]
    assert by_type["update_preimage"] == ["conv-001"]
    assert by_type["update_postimage"] == ["conv-001"]
    pre = ch[ch.change_type == "update_preimage"].iloc[0]
    post = ch[ch.change_type == "update_postimage"].iloc[0]
    assert pre["text"] == "t1" and post["text"] == "new"
    # value-identical rewrite emits nothing; same-version diff is empty
    assert "conv-005" not in set(ch["conv_id"])
    assert table.table_changes(spark, v2, v2).count() == 0


def test_table_changes_prunes_unchanged_buckets(spark, tmp_path):
    table = _mk(spark, tmp_path, n_buckets=16)
    v1 = table._head_version()
    table.merge_batch(
        spark,
        _events(spark, [{"lsn": 30, "conv_id": "conv-003", "op": "update",
                         "text": "changed"}]),
        fence_key="r/e1/b0",
        epoch_id=1,
    )
    v2 = table._head_version()
    m1, m2 = table.manifest_at(v1), table.manifest_at(v2)
    changed = {
        b
        for b in range(16)
        if sorted(f["path"] for f in m1.files if f["bucket"] == b)
        != sorted(f["path"] for f in m2.files if f["bucket"] == b)
    }
    # the narrow commit rewrote exactly the target key's bucket
    tgt = (
        spark.createDataFrame([("conv-003",)], "conv_id string")
        .select(bucket_expr(16))
        .first()[0]
    )
    assert changed == {tgt}
    ch = table.table_changes(spark, v1, v2).toPandas()
    assert sorted(ch["change_type"]) == ["update_postimage", "update_preimage"]
    assert set(ch["conv_id"]) == {"conv-003"}
    # and the diff's scan reads only the changed bucket's files, both sides
    plan = table.table_changes(spark, v1, v2)._jdf.queryExecution().toString()
    for f in m1.files + m2.files:
        base = f["path"].rsplit("/", 1)[-1]
        if f["bucket"] != tgt:
            assert base not in plan


def test_table_changes_survives_rebucket_between_versions(spark, tmp_path):
    table = _mk(spark, tmp_path, n_buckets=4)
    v1 = table._head_version()
    table.rebucket(spark, 16)
    table.merge_batch(
        spark,
        _events(spark, [{"lsn": 40, "conv_id": "conv-002", "op": "delete"}]),
        fence_key="r/e1/b0",
        epoch_id=1,
    )
    v2 = table._head_version()
    ch = table.table_changes(spark, v1, v2).toPandas()
    # bucket correspondence invalid -> full diff still classifies correctly
    assert sorted(ch["change_type"]) == ["delete"]
    assert set(ch["conv_id"]) == {"conv-002"}


def test_manifest_at_rejects_bad_versions(spark, tmp_path):
    table = _mk(spark, tmp_path)
    head = table._head_version()
    for bad in (0, head + 1, -3):
        try:
            table.manifest_at(bad)
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
