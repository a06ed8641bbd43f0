"""Streaming sessionization + custom stateful operator tests.

- session_window_metrics: streaming session windows equal the batch
  session_window aggregation (AvailableNow drains everything), and equal
  the batch lag+cumsum sessionize operator on the same data.
- conversation_progress (applyInPandasWithState): running counts are
  cumulative across triggers and the LAST row per conversation equals the
  batch ground truth.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.schemas import CHANGE_EVENT_SCHEMA
from nifi_tekst_bundle_spark.operators import temporal
from nifi_tekst_bundle_spark.streaming import sessions

from .conftest import spark_events


def _log(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    lsn = 0
    for conv, bursts in [
        ("c1", [(0, 3), (120, 2)]),   # two sessions (gap 2h > 30min)
        ("c2", [(0, 5)]),             # one session
        ("c3", [(10, 1), (20, 1), (200, 2)]),  # 10/20min gaps merge
    ]:
        for start_min, n in bursts:
            for i in range(n):
                lsn += 1
                rows.append(
                    {
                        "lsn": lsn,
                        "batch_id": "b0",
                        "op": "insert",
                        "conv_id": conv,
                        "turn_idx": lsn % 7,
                        "src_conv_id": None,
                        "src_turn_idx": None,
                        "role": "user",
                        "text": f"t{lsn}",
                        "tool": None,
                        "ts": base + dt.timedelta(minutes=start_min + i),
                        "extra": None,
                        "schema_version": 1,
                    }
                )
    df = spark_events(spark, pd.DataFrame(rows))
    events_dir = str(tmp_path / "events_s")
    df.coalesce(2).write.parquet(events_dir)
    return events_dir


def test_session_window_metrics_match_batch_and_operator(spark, tmp_path):
    events_dir = _log(spark, tmp_path)
    stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(events_dir)
    out = sessions.session_window_metrics(stream, gap="30 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("sesswin")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["conv_id"], r["session_start"]): r["n_events"]
        for r in spark.table("sesswin").collect()
    }

    batch = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(events_dir)
    want = {
        (r["conv_id"], r["win"]["start"]): r["n"]
        for r in batch.groupBy(
            F.session_window("ts", "30 minutes").alias("win"), "conv_id"
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want
    # session COUNTS agree with the batch lag+cumsum operator
    op_sessions = temporal.sessionize(
        batch.select("conv_id", "ts"), key="conv_id", gap_minutes=30
    )
    per_conv_stream = {}
    for (conv, _), n in got.items():
        per_conv_stream.setdefault(conv, []).append(n)
    per_conv_op = {}
    for r in op_sessions.collect():
        per_conv_op.setdefault(r["conv_id"], []).append(r["n_events"])
    assert {k: sorted(v) for k, v in per_conv_stream.items()} == {
        k: sorted(v) for k, v in per_conv_op.items()
    }
    # expected shape: c1 has 2 sessions, c2 one, c3 two (10/20min merge)
    assert sorted(per_conv_op["c1"]) == [2, 3]
    assert per_conv_op["c2"] == [5]
    assert sorted(per_conv_op["c3"]) == [2, 2]


def test_conversation_progress_cumulative_across_triggers(spark, tmp_path):
    events_dir = _log(spark, tmp_path)
    stream = spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(events_dir)
    out = sessions.conversation_progress(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("convprog")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_p"))
        .option("maxFilesPerTrigger", "1")  # force multiple triggers
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("convprog").collect()
    # per conversation the events_seen sequence is strictly increasing
    # across triggers (cumulative state, not per-batch counts)
    seqs = {}
    for r in rows:
        seqs.setdefault(r["conv_id"], []).append(r["events_seen"])
    batch = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(events_dir)
    want = {
        r["conv_id"]: (r["n"], r["mt"], r["ml"])
        for r in batch.groupBy("conv_id")
        .agg(
            F.count("*").alias("n"),
            F.max("turn_idx").alias("mt"),
            F.max("lsn").alias("ml"),
        )
        .collect()
    }
    for conv, seq in seqs.items():
        assert seq == sorted(seq), f"{conv}: non-cumulative {seq}"
        assert seq[-1] == want[conv][0]
    finals = {r["conv_id"]: r for r in rows if r["events_seen"] == want[r["conv_id"]][0]}
    for conv, (n, mt, ml) in want.items():
        f = finals[conv]
        assert f["max_turn_idx"] == mt and f["max_lsn"] == ml
