"""Bootstrap-then-tail ingestion tests (operators/bootstrap.py): snapshot
import at an LSN watermark + streaming catch-up must reproduce the full
replay bit-for-bit, and the import commit is exactly-once."""

from __future__ import annotations

import os
import tempfile

import pandas as pd
from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.fixtures import write_binlog_segments
from nifi_tekst_bundle_spark.operators import bootstrap, lww, resolve
from nifi_tekst_bundle_spark.plans import catalog
from nifi_tekst_bundle_spark.streaming import runner
from nifi_tekst_bundle_spark.table.lake import LakeTable

from .conftest import normalize_frame

SF = "/root/testdata/sf0.001"
PAYLOAD = list(catalog.CDC_PAYLOAD)


def _setup(spark, watermark_frac: float):
    events = catalog.derive_change_events(spark, SF).cache()
    good, _ = resolve.validate(events, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *PAYLOAD
    )
    watermark = int(events.agg(F.max("lsn")).first()[0] * watermark_frac)
    tmp = tempfile.mkdtemp(prefix="boot_test_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=PAYLOAD, n_buckets=4
    )
    return events, normalized, watermark, tmp, table


def test_bootstrap_then_tail_equals_full_replay(spark):
    events, normalized, watermark, tmp, table = _setup(spark, 0.5)
    assert bootstrap.bootstrap_table(spark, table, normalized, watermark, PAYLOAD)
    tail = events.filter(F.col("lsn") > watermark)
    flat = os.path.join(tmp, "flat")
    write_binlog_segments(tail, flat)
    runner.run_to_completion(
        spark, flat, table, os.path.join(tmp, "ckpt"), run_id="bt"
    )
    got = normalize_frame(table.visible(spark).toPandas())
    want = normalize_frame(
        catalog.q_cdc_lww_final_state(spark, SF).toPandas()
    )
    events.unpersist()
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)], check_dtype=False
    )


def test_bootstrap_import_is_exactly_once(spark):
    events, normalized, watermark, _tmp, table = _setup(spark, 0.4)
    assert bootstrap.bootstrap_table(spark, table, normalized, watermark, PAYLOAD)
    # re-delivered bootstrap: fenced no-op, state unchanged
    before = normalize_frame(table.visible(spark).toPandas())
    assert not bootstrap.bootstrap_table(
        spark, table, normalized, watermark, PAYLOAD
    )
    after = normalize_frame(table.visible(spark).toPandas())
    events.unpersist()
    pd.testing.assert_frame_equal(before, after, check_dtype=False)


def test_snapshot_at_matches_prefix_fold(spark):
    """The snapshot really is the visible state at the watermark: folding
    the same prefix through the ordinary register pipeline agrees."""
    events, normalized, watermark, _tmp, _table = _setup(spark, 0.6)
    snap = normalize_frame(
        bootstrap.snapshot_at(normalized, watermark, PAYLOAD).toPandas()
    )
    pre = normalized.filter(F.col("lsn") <= watermark)
    want = normalize_frame(
        lww.visible(lww.batch_registers(pre, PAYLOAD), PAYLOAD).toPandas()
    )
    events.unpersist()
    pd.testing.assert_frame_equal(snap, want, check_dtype=False)
    assert len(snap) > 0


def test_import_events_watermark_stamp(spark):
    df = spark.createDataFrame(
        [("c1", 1, "user", "hi", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    )
    imp = bootstrap.snapshot_as_import_events(df, 77, PAYLOAD).collect()[0]
    assert imp["lsn"] == 77 and imp["op"] == "insert"
    assert imp["batch_id"] == "bootstrap"
    assert imp["role"] == "user" and imp["text"] == "hi" and imp["tool"] is None
