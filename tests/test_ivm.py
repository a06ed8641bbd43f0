"""Incremental view maintenance tests (operators/ivm.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import ivm

CH_DDL = (
    "conv_id string, turn_idx int, change_type string, "
    "role string, text string, tool string"
)
VIS_DDL = "conv_id string, turn_idx int, role string, text string, tool string"


def _rollup_rows(df):
    return {
        r["conv_id"]: (r["n_turns"], r["total_chars"], r["n_tool_turns"])
        for r in df.collect()
    }


def test_maintain_equals_recompute_hand_case(spark):
    """insert + update + delete across three conversations: the maintained
    view equals a full recompute of the post-change state."""
    before = spark.createDataFrame(
        [
            ("c1", 0, "user", "hello", None),
            ("c1", 1, "assistant", "hi there", "search"),
            ("c2", 0, "user", "bye", None),
            ("c3", 0, "user", "keep", None),
        ],
        VIS_DDL,
    )
    changes = spark.createDataFrame(
        [
            # c1: turn 1 text shrinks, tool dropped
            ("c1", 1, "update_preimage", "assistant", "hi there", "search"),
            ("c1", 1, "update_postimage", "assistant", "hi", None),
            # c2: conversation emptied
            ("c2", 0, "delete", "user", "bye", None),
            # c4: new conversation arrives
            ("c4", 0, "insert", "user", "fresh", "calc"),
        ],
        CH_DDL,
    )
    after = spark.createDataFrame(
        [
            ("c1", 0, "user", "hello", None),
            ("c1", 1, "assistant", "hi", None),
            ("c3", 0, "user", "keep", None),
            ("c4", 0, "user", "fresh", "calc"),
        ],
        VIS_DDL,
    )
    got = _rollup_rows(
        ivm.maintain_rollup(ivm.conv_rollup(before), changes)
    )
    want = _rollup_rows(ivm.conv_rollup(after))
    assert got == want
    assert "c2" not in got  # emptied group left the view
    assert got["c4"] == (1, 5, 1)  # bootstrap-from-nothing group


def test_no_op_update_nets_to_zero(spark):
    """An update touching no maintained column keeps stats bit-identical."""
    before = spark.createDataFrame(
        [("c1", 0, "user", "same", None)],
        VIS_DDL,
    )
    changes = spark.createDataFrame(
        [
            ("c1", 0, "update_preimage", "user", "same", None),
            ("c1", 0, "update_postimage", "assistant", "same", None),
        ],
        CH_DDL,
    )
    got = _rollup_rows(ivm.maintain_rollup(ivm.conv_rollup(before), changes))
    assert got == {"c1": (1, 4, 0)}


def test_unknown_change_type_fails_loudly(spark):
    prev = ivm.conv_rollup(
        spark.createDataFrame(
            [("c1", 0, "user", "x", None)],
            VIS_DDL,
        )
    )
    bad = spark.createDataFrame(
        [("c1", 0, "frobnicate", "user", "x", None)], CH_DDL
    )
    with pytest.raises(Exception, match="ivm: unknown change_type"):
        ivm.maintain_rollup(prev, bad).collect()


def test_maintain_matches_recompute_through_lake_cdf(spark, tmp_path):
    """End-to-end through the real commit/CDF machinery: maintain across
    the b03→b04 change feed equals full recompute at the head version."""
    import os

    from nifi_tekst_bundle_spark.plans import catalog
    from nifi_tekst_bundle_spark.table.lake import LakeTable

    events = catalog.derive_change_events(
        spark, "/root/testdata/sf0.001"
    ).persist()
    table = LakeTable.create(
        spark,
        os.path.join(str(tmp_path), "table"),
        payload_cols=catalog.CDC_PAYLOAD,
        n_buckets=4,
    )
    for b in ["b00", "b01", "b02", "b03", "b04"]:
        table.merge_batch(
            spark,
            events.filter(F.col("batch_id") == b),
            fence_key=f"batch-{b}",
            batch_id=b,
        )
        if b == "b03":
            v_from = table._head_version()
    v_to = table._head_version()
    events.unpersist()
    maintained = ivm.maintain_rollup(
        ivm.conv_rollup(table.visible_at(spark, v_from)),
        table.table_changes(spark, v_from, v_to),
    )
    recomputed = ivm.conv_rollup(table.visible(spark))
    assert _rollup_rows(maintained) == _rollup_rows(recomputed)


def test_delta_join_is_group_keyed_single_join(spark):
    """Plan pin: the merge is ONE join on the group key — no corpus-wide
    re-aggregation of the previous view's source."""
    prev = spark.createDataFrame(
        [("c1", 1, 5, 0)], ["conv_id", "n_turns", "total_chars", "n_tool_turns"]
    )
    changes = spark.createDataFrame(
        [("c2", 0, "insert", "user", "y", None)], CH_DDL
    )
    plan = (
        ivm.maintain_rollup(prev, changes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") >= 1
    # exactly one join operator in the merged plan
    import re

    joins = re.findall(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)
    assert len(joins) == 1


def test_ivm_composes_with_streaming_commits(spark, tmp_path):
    """The serving-layer loop: bootstrap the rollup at the stream's first
    committed version, then fold table_changes version-by-version through
    maintain_rollup — the final maintained view equals a full recompute at
    HEAD. Proves IVM works over the REAL commit sequence the streaming
    runner produces (fenced epochs, not synthetic diffs)."""
    import os

    from nifi_tekst_bundle_spark.fixtures import write_binlog_segments
    from nifi_tekst_bundle_spark.plans import catalog
    from nifi_tekst_bundle_spark.streaming import runner
    from nifi_tekst_bundle_spark.table.lake import LakeTable

    events = catalog.derive_change_events(spark, "/root/testdata/sf0.001")
    flat = os.path.join(str(tmp_path), "flat")
    write_binlog_segments(events, flat)
    table = LakeTable.create(
        spark,
        os.path.join(str(tmp_path), "table"),
        payload_cols=catalog.CDC_PAYLOAD,
        n_buckets=4,
    )
    runner.run_to_completion(
        spark, flat, table, os.path.join(str(tmp_path), "ckpt"),
        run_id="ivm", max_files_per_trigger=2,
    )
    head = table._head_version()
    assert head >= 2  # several commits, so the fold is non-trivial
    view = ivm.conv_rollup(table.visible_at(spark, 1))
    for v in range(1, head):
        view = ivm.maintain_rollup(view, table.table_changes(spark, v, v + 1))
        # checkpoint the fold so the plan doesn't grow across versions
        # (same constant-plan discipline as operators/apply.py)
        view = view.localCheckpoint(eager=True)
    assert _rollup_rows(view) == _rollup_rows(
        ivm.conv_rollup(table.visible(spark))
    )


def test_materialized_rollup_refresh_crash_and_erasure(spark, tmp_path):
    """The productized view: bootstrap, incremental catch-up across new
    commits, crash-safe STATE (stale state rediffs idempotently), and
    rebootstrap when the base version falls below an erasure floor."""
    import json
    import os

    from nifi_tekst_bundle_spark.table.lake import LakeTable

    DDL = (
        "lsn long, batch_id string, op string, conv_id string, "
        "turn_idx int, role string, text string, tool string, "
        "src_conv_id string, src_turn_idx int, schema_version int, "
        "ts timestamp"
    )
    t = LakeTable.create(
        spark, os.path.join(str(tmp_path), "t"),
        payload_cols=["role", "text", "tool"], n_buckets=4,
    )
    ins = spark.createDataFrame(
        [(i + 1, "b0", "insert", f"c{i % 3}", i // 3, "user", f"x{i}",
          None, None, None, 1, None) for i in range(12)],
        DDL,
    )
    t.merge_batch(spark, ins, fence_key="f0", batch_id="b0")
    view = ivm.MaterializedRollup(os.path.join(str(tmp_path), "view"))
    v1 = view.refresh(spark, t)  # bootstrap
    assert _rollup_rows(view.read(spark)) == _rollup_rows(
        ivm.conv_rollup(t.visible(spark))
    )
    # new commit → incremental catch-up
    upd = spark.createDataFrame(
        [(100, "b1", "delete", "c0", 0, None, None, None, None, None, 1,
          None),
         (101, "b1", "insert", "c9", 0, "user", "fresh", "tool1", None,
          None, 1, None)],
        DDL,
    )
    t.merge_batch(spark, upd, fence_key="f1", batch_id="b1")
    v2 = view.refresh(spark, t)
    assert v2 == v1 + 1
    assert _rollup_rows(view.read(spark)) == _rollup_rows(
        ivm.conv_rollup(t.visible(spark))
    )
    # refresh at head is a no-op
    assert view.refresh(spark, t) == v2
    # crash simulation: a refresh died between its parquet write and the
    # STATE swap — old STATE stays authoritative, the new dir is an
    # orphan. The next refresh must converge and sweep the orphan.
    orphan = os.path.join(view.root, "rollup-999-deadbeef")
    os.makedirs(orphan, exist_ok=True)
    st_before = json.loads(open(view._state_path()).read())
    t.merge_batch(
        spark,
        spark.createDataFrame(
            [(200, "b2", "insert", "c0", 5, "user", "again", None, None,
              None, 1, None)],
            DDL,
        ),
        fence_key="f2",
        batch_id="b2",
    )
    view.refresh(spark, t)
    assert not os.path.exists(orphan)  # orphan swept on successful swap
    assert json.loads(open(view._state_path()).read())["version"] > st_before["version"]
    assert _rollup_rows(view.read(spark)) == _rollup_rows(
        ivm.conv_rollup(t.visible(spark))
    )
    # erasure: base below the floor → rebootstrap, erased conv gone
    t.erase_keys(spark, ["c1"])
    view.refresh(spark, t)
    rows = _rollup_rows(view.read(spark))
    assert "c1" not in rows
    assert rows == _rollup_rows(ivm.conv_rollup(t.visible(spark)))


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _mk_state(draw, keys):
    """Random visible state: a subset of keys with random payloads."""
    rows = []
    for k in keys:
        if draw(st.booleans()):
            text = draw(st.one_of(st.none(), st.text(max_size=6)))
            tool = draw(st.one_of(st.none(), st.just("t")))
            rows.append((k[0], k[1], "user", text, tool))
    return rows


def _diff(pre, post):
    """CDF-shaped net diff between two states (what table_changes emits)."""
    pre_m = {(r[0], r[1]): r for r in pre}
    post_m = {(r[0], r[1]): r for r in post}
    out = []
    for k in pre_m.keys() | post_m.keys():
        a, b = pre_m.get(k), post_m.get(k)
        if a is None:
            out.append((k[0], k[1], "insert", *b[2:]))
        elif b is None:
            out.append((k[0], k[1], "delete", *a[2:]))
        elif a != b:
            out.append((k[0], k[1], "update_preimage", *a[2:]))
            out.append((k[0], k[1], "update_postimage", *b[2:]))
    return out


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(data=st.data())
def test_maintain_equals_recompute_for_arbitrary_diffs(spark, data):
    """The IVM algebra property behind every example test: for ANY pair of
    states (pre, post) over a key universe, maintaining rollup(pre) with
    the CDF-shaped diff reproduces rollup(post) exactly — including fully
    emptied views and diffs that are pure no-ops."""
    keys = [(f"c{i}", j) for i in range(4) for j in range(2)]
    pre = _mk_state(data.draw, keys)
    post = _mk_state(data.draw, keys)
    changes = _diff(pre, post)
    pre_df = spark.createDataFrame(pre or [], VIS_DDL)
    post_df = spark.createDataFrame(post or [], VIS_DDL)
    ch_df = spark.createDataFrame(changes or [], CH_DDL)
    got = _rollup_rows(ivm.maintain_rollup(ivm.conv_rollup(pre_df), ch_df))
    want = _rollup_rows(ivm.conv_rollup(post_df))
    assert got == want
