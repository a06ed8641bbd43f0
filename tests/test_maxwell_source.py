"""Maxwell-daemon adapter tests (sources/maxwell.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import resolve
from nifi_tekst_bundle_spark.sources import maxwell


def _parse(spark, lines):
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    return maxwell.parse_maxwell(df).collect()


def test_parse_maxwell_op_mapping_and_position_lsn(spark):
    rows = _parse(spark, [
        '{"type":"insert","xid":7,"position":"mysql-bin.000006:800911",'
        '"data":{"conv_id":"c1","turn_idx":1,"role":"user","text":"hi",'
        '"ts_us":1000000,"schema_version":1}}',
        '{"type":"bootstrap-insert","xid":8,"position":"mysql-bin.000006:800920",'
        '"data":{"conv_id":"c2","turn_idx":0,"role":"user","text":"snap"}}',
        '{"type":"update","xid":9,"position":"mysql-bin.000007:12",'
        '"data":{"conv_id":"c1","turn_idx":1,"text":"edited"}}',
        '{"type":"delete","xid":10,"position":"mysql-bin.000007:44",'
        '"data":{"conv_id":"c1","turn_idx":1}}',
    ])
    by_lsn = {r["lsn"]: r for r in rows}
    assert by_lsn[6_000_000_800_911]["op"] == "insert"
    assert by_lsn[6_000_000_800_911]["text"] == "hi"
    assert by_lsn[6_000_000_800_911]["batch_id"] == "tx-7"
    assert by_lsn[6_000_000_800_920]["op"] == "insert"  # bootstrap-insert
    assert by_lsn[7_000_000_000_012]["op"] == "update"
    assert by_lsn[7_000_000_000_012]["role"] is None  # partial row image
    assert by_lsn[7_000_000_000_044]["op"] == "delete"
    # position order is lsn order across binlog rotation
    assert sorted(by_lsn) == [r["lsn"] for r in sorted(rows, key=lambda r: r["lsn"])]


def test_malformed_and_control_records_dead_letter_with_raw(spark):
    lines = [
        "{definitely not json",
        '{"type":"bootstrap-start","position":"mysql-bin.000001:4"}',
        '{"type":"table-create","position":"mysql-bin.000001:9"}',
        '{"type":"insert","xid":1,"position":"no-offset-here",'
        '"data":{"conv_id":"c1","turn_idx":0}}',
        '{"type":"insert","xid":2,"position":"mysql-bin.000001:10",'
        '"data":{"conv_id":"c9","turn_idx":0,"role":"user"}}',
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    good, dead = resolve.validate(maxwell.parse_maxwell(df), [])
    assert good.count() == 1  # only the last line is a valid event
    dead_rows = dead.collect()
    assert len(dead_rows) == 4
    reasons = sorted(r["reason"] for r in dead_rows)
    # control records + unparseable JSON -> bad_op; a valid insert whose
    # binlog position fails to parse cannot be sequenced -> missing_lsn
    assert reasons == ["bad_op", "bad_op", "bad_op", "missing_lsn"]
    # unparseable JSON and bad positions keep the raw line for debugging
    parsed = {r["extra"]["_raw"] for r in maxwell.parse_maxwell(df)
              .filter(F.col("lsn").isNull() | F.col("op").isNull())
              .collect() if r["extra"] is not None}
    assert "{definitely not json" in parsed


def test_maxwell_roundtrip_is_lossless_for_fold_columns(spark):
    from nifi_tekst_bundle_spark.plans import catalog

    events = catalog.derive_change_events(spark, "/root/testdata/sf0.001")
    back = maxwell.parse_maxwell(maxwell.to_maxwell(events))
    cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool"]
    a = sorted(map(tuple, events.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b


def test_parse_maxwell_adds_no_shuffle_no_python(spark):
    df = spark.createDataFrame([("x",)], "value string")
    plan = (
        maxwell.parse_maxwell(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
