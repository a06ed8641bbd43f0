"""Transaction-boundary gate (operators/txn.py).

Covers the semantics the catalog oracle can't isolate: duplicate
(at-least-once) delivery must not fake completeness, missing transaction
metadata holds events back, and complete transactions pass whole.
"""

from __future__ import annotations

import pytest

from nifi_tekst_bundle_spark.operators import txn


def _events(spark, rows):
    return spark.createDataFrame(rows, "txn_id long, lsn long, payload string")


def _meta(spark, rows):
    return spark.createDataFrame(rows, "txn_id long, expected_events long")


def test_complete_txn_passes_whole_and_torn_held(spark):
    ev = _events(
        spark,
        [
            (1, 10, "a"), (1, 11, "b"),          # txn 1: complete (2/2)
            (2, 20, "c"),                          # txn 2: torn (1/3)
        ],
    )
    meta = _meta(spark, [(1, 2), (2, 3)])
    out = txn.complete_txns(ev, meta).orderBy("lsn").collect()
    assert [(r.txn_id, r.lsn) for r in out] == [(1, 10), (1, 11)]
    held = {r.txn_id: (r.observed, r.expected_events)
            for r in txn.held_back(ev, meta).collect()}
    assert held == {2: (1, 3)}


def test_duplicate_delivery_does_not_fake_completeness(spark):
    # txn 3 expects 2 events; one event delivered twice — observed
    # distinct lsns is still 1, so the txn must stay held back
    ev = _events(spark, [(3, 30, "x"), (3, 30, "x")])
    meta = _meta(spark, [(3, 2)])
    assert txn.complete_txns(ev, meta).count() == 0
    held = txn.held_back(ev, meta).collect()
    assert [(r.txn_id, r.observed, r.expected_events) for r in held] == [(3, 1, 2)]
    # the second copy arrives: now complete — BOTH delivered rows pass
    # (downstream exactly-once dedup-by-(key,lsn) is the dedup layer)
    ev2 = _events(spark, [(3, 30, "x"), (3, 30, "x"), (3, 31, "y")])
    assert txn.complete_txns(ev2, meta).count() == 3
    assert txn.held_back(ev2, meta).count() == 0


def test_missing_metadata_and_null_txn_hold_back(spark):
    ev = _events(
        spark,
        [
            (7, 70, "m"),          # no metadata row: no END marker yet
            (None, 71, "n"),       # no transaction identity at all
            (8, 80, "o"),          # complete singleton
        ],
    )
    meta = _meta(spark, [(8, 1)])
    out = txn.complete_txns(ev, meta).collect()
    assert [(r.txn_id, r.lsn) for r in out] == [(8, 80)]
    held = {r.txn_id: (r.observed, r.expected_events)
            for r in txn.held_back(ev, meta).collect()}
    # NULL-txn events surface too (observed under the NULL group)
    assert held == {7: (1, None), None: (1, None)}


def test_gate_is_anti_join_not_event_shuffle(spark):
    """Plan pin: the pass-through path broadcasts the incomplete set —
    the event scan itself is never shuffled by the gate."""
    ev = _events(spark, [(1, 1, "a"), (2, 2, "b")])
    meta = _meta(spark, [(1, 1), (2, 2)])
    plan = txn.complete_txns(ev, meta)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


@pytest.mark.parametrize("broadcast", [True, False])
def test_broadcast_fallback_same_result(spark, broadcast):
    ev = _events(spark, [(1, 1, "a"), (2, 2, "b"), (2, 3, "c")])
    meta = _meta(spark, [(1, 1), (2, 3)])
    out = txn.complete_txns(ev, meta, broadcast_incomplete=broadcast)
    assert sorted(r.lsn for r in out.collect()) == [1]
