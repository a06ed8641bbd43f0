"""Temporal operators + Debezium source: edge semantics.

- as-of join: ≤ tie semantics, NULL before any right row, key isolation
- sessionize: exact-gap boundary, single-event sessions, 1-based indexes
- Debezium: lossless roundtrip, malformed/foreign envelopes dead-letter
  (the reference's failure relationship, ReorderFiles.kt:416-418)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import temporal, resolve
from nifi_tekst_bundle_spark.sources import debezium


def _ts(minute: int, second: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_asof_join_le_semantics_and_null_before_first(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(0)),   # before any right row -> NULL
            (2, "u1", _ts(10)),  # exactly AT right ts -> matches (<=)
            (3, "u1", _ts(15)),  # between -> 10.0
            (4, "u1", _ts(30)),  # after second -> 20.0
            (5, "u2", _ts(30)),  # other key, no right rows -> NULL
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _ts(10), 10.0), ("u1", _ts(20), 20.0)],
        "user_id string, ts timestamp, v double",
    )
    out = temporal.asof_join(left, right, on=["user_id"], value_cols=["v"])
    got = {r["event_id"]: r["v_asof"] for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: None}


def test_asof_join_preserves_left_columns_and_rowcount(spark):
    left = spark.createDataFrame(
        [(i, "u1", _ts(i), f"p{i}") for i in range(8)],
        "event_id long, user_id string, ts timestamp, payload string",
    )
    right = spark.createDataFrame(
        [("u1", _ts(3), 1.0)], "user_id string, ts timestamp, v double"
    )
    out = temporal.asof_join(left, right, on=["user_id"], value_cols=["v"])
    assert out.count() == 8
    assert set(out.columns) == {"event_id", "user_id", "ts", "payload", "v_asof"}
    rows = {r["event_id"]: (r["payload"], r["v_asof"]) for r in out.collect()}
    assert rows[0] == ("p0", None) and rows[3] == ("p3", 1.0)
    assert rows[7] == ("p7", 1.0)


def test_sessionize_gap_boundary_is_strict(spark):
    # gaps: 1800s exactly (NOT a new session under strict >), 1801s (new)
    ev = spark.createDataFrame(
        [
            ("u1", dt.datetime(2024, 1, 1, 0, 0, 0)),
            ("u1", dt.datetime(2024, 1, 1, 0, 30, 0)),   # +1800s -> same
            ("u1", dt.datetime(2024, 1, 1, 1, 0, 1)),    # +1801s -> new
            ("u2", dt.datetime(2024, 1, 1, 5, 0, 0)),    # lone event
        ],
        "user_id string, ts timestamp",
    )
    out = temporal.sessionize(ev, key="user_id", gap_minutes=30).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r)
    u1 = sorted(by_key["u1"], key=lambda r: r["session_idx"])
    assert [r["n_events"] for r in u1] == [2, 1]
    assert u1[0]["session_idx"] == 1 and u1[0]["duration_s"] == 1800.0
    assert by_key["u2"][0]["n_events"] == 1
    assert by_key["u2"][0]["duration_s"] == 0.0


def _roundtrip(spark, rows):
    ev = spark.createDataFrame(
        rows,
        "lsn long, batch_id string, op string, conv_id string, turn_idx int, "
        "src_conv_id string, src_turn_idx int, role string, text string, "
        "tool string, ts timestamp, extra map<string,string>, "
        "schema_version int",
    )
    return debezium.parse_debezium(debezium.to_debezium(ev))


def test_debezium_roundtrip_is_lossless(spark):
    rows = [
        (1, "tx1", "insert", "c1", 0, None, None, "user", "hello", None,
         dt.datetime(2024, 1, 1, 12, 0, 0, 123456), {"language": "nb"}, 2),
        (2, "tx1", "update", "c1", 0, None, None, None, "hello2", "search",
         None, None, 1),
        (3, "tx2", "delete", "c1", 0, None, None, None, None, None,
         None, None, 1),
        (4, "tx2", "insert", None, 1, None, None, "asst", "keyless", None,
         None, None, 1),
    ]
    got = {r["lsn"]: r for r in _roundtrip(spark, rows).collect()}
    assert len(got) == 4
    r1 = got[1]
    assert (r1["op"], r1["conv_id"], r1["turn_idx"]) == ("insert", "c1", 0)
    assert r1["text"] == "hello" and r1["extra"] == {"language": "nb"}
    assert r1["ts"] == dt.datetime(2024, 1, 1, 12, 0, 0, 123456)
    assert r1["schema_version"] == 2 and r1["batch_id"] == "tx1"
    assert got[2]["op"] == "update" and got[2]["tool"] == "search"
    # delete reads key from the BEFORE image
    assert got[3]["op"] == "delete" and got[3]["conv_id"] == "c1"
    # keyless insert survives as keyless (synthesis happens in validate)
    assert got[4]["conv_id"] is None and got[4]["turn_idx"] == 1


def test_debezium_malformed_and_foreign_envelopes_dead_letter(spark):
    envelopes = spark.createDataFrame(
        [
            ('{"op":"c","source":{"lsn":1,"txId":"t"},'
             '"after":{"conv_id":"c1","turn_idx":0,"text":"ok"}}',),
            ("this is not json",),
            ('{"op":"t","source":{"lsn":3,"txId":"t"}}',),  # truncate op
        ],
        "value string",
    )
    parsed = debezium.parse_debezium(envelopes)
    good, dead = resolve.validate(parsed, [])
    assert [r["conv_id"] for r in good.collect()] == ["c1"]
    reasons = sorted(r["reason"] for r in dead.collect())
    # unparseable JSON -> NULL op -> bad_op (explicit isNull in validate);
    # the foreign op 't' is likewise bad_op
    assert reasons == ["bad_op", "bad_op"]
    # the unparseable line's raw text is preserved for debugging
    raws = {
        (r["extra"] or {}).get("_raw")
        for r in dead.collect()
    }
    assert "this is not json" in raws


def test_debezium_streaming_source_end_to_end(spark, tmp_path):
    """The production wire path: Debezium JSON-lines segments → streaming
    parse → fenced LakeTable commits. Final state equals the native-path
    batch fold; corrupt lines dead-letter (never stall the stream)."""
    from nifi_tekst_bundle_spark import fixtures
    from nifi_tekst_bundle_spark.operators import lww
    from nifi_tekst_bundle_spark.streaming import runner
    from nifi_tekst_bundle_spark.table.lake import LakeTable

    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(60):
        op = "delete" if i % 10 == 9 else ("update" if i % 3 == 0 else "insert")
        rows.append(
            (i + 1, f"b{i % 3}", op, f"c{i % 7}", i % 4, None, None,
             "user", None if op == "delete" else f"t{i}", None,
             base, None, 1)
        )
    import pandas as pd

    from .conftest import spark_events

    ev = spark_events(spark, pd.DataFrame(rows, columns=[
        "lsn", "batch_id", "op", "conv_id", "turn_idx", "src_conv_id",
        "src_turn_idx", "role", "text", "tool", "ts", "extra",
        "schema_version"]))
    seg_dir = str(tmp_path / "dbz")
    fixtures.write_debezium_segments(ev, seg_dir, corrupt_lines=2)

    table = LakeTable.create(
        spark, str(tmp_path / "t"), payload_cols=["role", "text", "tool", "ts"],
        n_buckets=4,
    )
    runner.run_to_completion(
        spark, seg_dir, table, str(tmp_path / "ck"), run_id="dbz",
        max_files_per_trigger=1, source_format="debezium",
    )
    got = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in table.visible(spark).collect()
    }
    regs = lww.batch_registers(
        ev.select("lsn", "batch_id", "op", "conv_id", "turn_idx",
                  "role", "text", "tool", "ts"),
        ["role", "text", "tool", "ts"],
    )
    want = {
        (r["conv_id"], r["turn_idx"]): r["text"]
        for r in lww.visible(regs, ["role", "text", "tool", "ts"]).collect()
    }
    assert got == want
    dead = table.dead_letters(spark)
    bad = dead.filter(dead.reason == "bad_op").collect()
    # BOTH corrupt lines survive the (fence_key, lsn, detail) dedupe, each
    # carrying its raw line for debugging
    assert len(bad) == 2
    assert {r["detail"] for r in bad} == {
        "corrupt line 0 not-json",
        "corrupt line 1 not-json",
    }


# ------------------------------------------------------ sharded binlog merge


def test_multi_shard_merge_matches_single_stream(spark):
    """Under per-key shard routing, the merged sharded fold must be
    bit-identical to the single-stream fold on every NON-synthesized key
    (synthesized ids derive from the global lsn, which legitimately
    differs); the synthesized-key COUNT must still agree."""
    from nifi_tekst_bundle_spark.plans import catalog

    sf = "/root/testdata/sf0.001"
    single = catalog.q_cdc_lww_final_state(spark, sf).toPandas()
    merged = catalog.q_cdc_multi_shard_merge(spark, sf).toPandas()

    def split(df):
        auto = df[df["conv_id"].str.startswith("conv-auto-")]
        rest = df[~df["conv_id"].str.startswith("conv-auto-")]
        return auto, rest.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

    auto_s, rest_s = split(single)
    auto_m, rest_m = split(merged)
    import pandas as pd

    pd.testing.assert_frame_equal(rest_s, rest_m)
    assert len(auto_s) == len(auto_m)
    assert len(rest_s) > 0 and len(auto_s) > 0


def test_merge_shard_logs_validates_and_interleaves(spark):
    from nifi_tekst_bundle_spark.sources.shards import merge_shard_logs

    a = spark.createDataFrame([(1, "x")], "lsn long, v string")
    b = spark.createDataFrame([(1, "y")], "lsn long, v string")
    out = merge_shard_logs([(0, a), (1, b)], n_shards=2).collect()
    got = {(r["lsn"], r["v"], r["shard_id"]) for r in out}
    assert got == {(2, "x", 0), (3, "y", 1)}  # collision-free interleave

    import pytest

    with pytest.raises(ValueError, match="outside"):
        merge_shard_logs([(2, a)], n_shards=2)
    with pytest.raises(ValueError, match="at least one"):
        merge_shard_logs([], n_shards=2)
