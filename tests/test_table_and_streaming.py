"""LakeTable MERGE + fenced commits + streaming exactly-once resume.

These are the engine analogues of the reference's integration suite:
idempotent re-apply (no-temp-keys invariant RenameS3UtilsTest.kt:259,
state-restored-after-failure ReorderFilesTest.kt:319-345) and
kill-mid-stream/restart-without-dupes-or-gaps (NiFi queue persistence)."""

from __future__ import annotations

import pandas as pd
import pytest

from nifi_tekst_bundle_spark import fixtures, oracle
from nifi_tekst_bundle_spark.streaming import runner
from nifi_tekst_bundle_spark.table.lake import LakeTable

from .conftest import normalize_frame, spark_events, spark_seed


@pytest.fixture(scope="module")
def scenario():
    seed = fixtures.make_seed_transcripts(n_convs=20, max_turns=6)
    log = fixtures.make_event_log(
        seed, fixtures.EventLogConfig(n_batches=4, events_per_batch=60)
    )
    ora = oracle.replay(seed, log.batches)
    return seed, log, ora


def check_final(spark, table: LakeTable, ora) -> None:
    got = normalize_frame(table.visible(spark).toPandas())
    want = normalize_frame(ora.state)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_merge_batches_match_oracle(spark, tmp_path, scenario):
    seed, log, ora = scenario
    table = LakeTable.create(
        spark, str(tmp_path / "t"), seed_df=spark_seed(spark, seed), n_buckets=8
    )
    for i, b in enumerate(log.batches):
        applied = table.merge_batch(
            spark, spark_events(spark, b), fence_key=f"r/e{i}/b", epoch_id=i
        )
        assert applied
    check_final(spark, table, ora)
    # dead letters recorded
    assert table.dead_letters(spark).count() == len(ora.dead_letters)
    # lineage has one row set per fenced commit
    lin = table.lineage_df(spark).toPandas()
    assert set(lin["fence_key"]) == {f"r/e{i}/b" for i in range(len(log.batches))}
    # per-partition watermark lag: event-time based, non-negative, present
    # on every data partition row (north-rule lineage metric)
    data_rows = lin[lin["partition_id"] >= 0]
    assert data_rows["watermark_ts"].notna().all()
    # lag is null for partitions whose rows carry no event-time (e.g. only
    # move-expanded source deletes); where present it is non-negative
    lag = data_rows["max_lag_seconds"].astype(float)
    assert lag.notna().any()
    assert (lag.dropna() >= 0).all()


def test_fence_makes_reapply_noop(spark, tmp_path, scenario):
    seed, log, ora = scenario
    table = LakeTable.create(
        spark, str(tmp_path / "t2"), seed_df=spark_seed(spark, seed), n_buckets=8
    )
    for i, b in enumerate(log.batches):
        table.merge_batch(spark, spark_events(spark, b), fence_key=f"r/e{i}/b", epoch_id=i)
    v_before = table.manifest().version
    # re-deliver every batch (incl. move-containing ones) — all fenced out
    for i, b in enumerate(log.batches):
        applied = table.merge_batch(
            spark, spark_events(spark, b), fence_key=f"r/e{i}/b", epoch_id=i
        )
        assert not applied
    assert table.manifest().version == v_before
    check_final(spark, table, ora)


def test_streaming_end_to_end(spark, tmp_path, scenario):
    seed, log, ora = scenario
    events_dir = str(tmp_path / "events")
    fixtures.write_event_log_parquet(log, events_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "t3"), seed_df=spark_seed(spark, seed), n_buckets=8
    )
    stats = runner.run_to_completion(
        spark, events_dir, table, str(tmp_path / "ckpt3"), run_id="r1"
    )
    assert stats.batches_applied == len(log.batches)
    check_final(spark, table, ora)


def test_streaming_crash_resume_exactly_once(spark, tmp_path, scenario):
    """Kill mid-stream after 2 commits, restart from checkpoint: final state
    equals the oracle, nothing double-applied."""
    seed, log, ora = scenario
    events_dir = str(tmp_path / "events4")
    fixtures.write_event_log_parquet(log, events_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "t4"), seed_df=spark_seed(spark, seed), n_buckets=8
    )
    ckpt = str(tmp_path / "ckpt4")
    stats1 = runner.run_to_completion(
        spark, events_dir, table, ckpt, run_id="r1", fail_after=[2]
    )
    assert stats1.batches_applied == 2
    stats2 = runner.run_to_completion(spark, events_dir, table, ckpt, run_id="r1")
    # the re-delivered epoch hits the fence; the rest apply exactly once
    assert stats2.batches_skipped >= 0
    assert stats1.batches_applied + stats2.batches_applied - stats2.batches_skipped <= len(log.batches)
    check_final(spark, table, ora)
    # every producer batch committed exactly once
    committed = table.manifest().committed
    bids = sorted(k.split("/")[-1] for k in committed)
    assert bids == sorted(b["batch_id"].iloc[0] for b in log.batches)


def test_submit_entrypoint_exactly_once(spark, tmp_path, scenario):
    """The spark-submit CLI path: package --py-files zip, run the apply
    job twice; second run is a structural no-op (exactly-once at the
    deployment surface)."""
    import sys
    from pathlib import Path

    scripts_dir = str(Path(__file__).resolve().parents[1] / "scripts")
    sys.path.insert(0, scripts_dir)
    try:
        import package_pyfiles
        import submit_apply
    finally:
        sys.path.remove(scripts_dir)

    zip_path = package_pyfiles.build(str(tmp_path / "engine.zip"))
    import zipfile

    names = zipfile.ZipFile(zip_path).namelist()
    assert "nifi_tekst_bundle_spark/operators/lww.py" in names
    assert not any(n.startswith("tests/") for n in names)

    seed, log, ora = scenario
    events_dir = str(tmp_path / "events_cli")
    fixtures.write_event_log_parquet(log, events_dir)
    seed_pq = str(tmp_path / "seed.parquet")
    spark_seed(spark, seed).write.mode("overwrite").parquet(seed_pq)
    argv = [
        "--events", events_dir,
        "--table", str(tmp_path / "t_cli"),
        "--checkpoint", str(tmp_path / "ckpt_cli"),
        "--seed", seed_pq,
        "--n-buckets", "8",
    ]
    assert submit_apply.main(argv) == 0
    table = LakeTable.load(str(tmp_path / "t_cli"))
    check_final(spark, table, ora)
    v1 = table.manifest().version
    assert submit_apply.main(argv) == 0  # re-run: fenced/checkpointed no-op
    assert LakeTable.load(str(tmp_path / "t_cli")).manifest().version == v1
    check_final(spark, table, ora)


def test_concurrent_commit_cas(spark, tmp_path, scenario):
    """Optimistic concurrency: two writers committing from the same base
    manifest — exactly one wins, the loser raises, the table stays
    consistent (winner's commit fully visible, no torn state)."""
    import pytest as _pytest

    from nifi_tekst_bundle_spark.table.lake import ConcurrentCommitError

    seed, log, ora = scenario
    table = LakeTable.create(
        spark, str(tmp_path / "t_cas"), seed_df=spark_seed(spark, seed), n_buckets=4
    )
    stale = LakeTable.load(str(tmp_path / "t_cas"))  # second writer handle
    b0 = spark_events(spark, log.batches[0])
    assert table.merge_batch(spark, b0, fence_key="w1/e0", epoch_id=0)
    # the stale writer read the manifest pre-commit inside merge_batch, so
    # simulate the race at the manifest layer directly: same base version
    m = stale.manifest()
    m.version = m.version  # current HEAD version — next commit targets v+1
    from nifi_tekst_bundle_spark.table.lake import Manifest

    clash = Manifest(
        version=m.version,  # already-taken version number
        payload_cols=m.payload_cols,
        n_buckets=m.n_buckets,
        files=m.files,
        committed=m.committed,
        lineage=m.lineage,
        dead_letter_files=m.dead_letter_files,
    )
    with _pytest.raises(ConcurrentCommitError):
        stale._write_manifest(clash)
    # winner's state intact; vacuum clears any tmp orphans
    assert table.manifest().version == m.version
    table.vacuum()
    assert table.is_committed("w1/e0")


def test_windowed_metrics_with_watermark(spark, tmp_path, scenario):
    """The watermarked streaming metrics aggregation: event-time windows
    over the change stream, state bounded by the watermark; results equal
    the same aggregation run in batch mode (AvailableNow processes
    everything, so no late data is dropped here)."""
    from pyspark.sql import functions as F

    from nifi_tekst_bundle_spark.streaming import metrics

    seed, log, ora = scenario
    events_dir = str(tmp_path / "events_m")
    fixtures.write_event_log_parquet(log, events_dir)
    from nifi_tekst_bundle_spark.schemas import CHANGE_EVENT_SCHEMA

    stream = (
        spark.readStream.schema(CHANGE_EVENT_SCHEMA).parquet(events_dir)
    )
    out = metrics.windowed_event_metrics(stream, "10 minutes", "5 minutes")
    # complete mode: append would withhold windows the watermark never
    # passes (nothing arrives after the last event to advance it)
    q = (
        out.writeStream.format("memory")
        .queryName("winmetrics")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_m"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.table("winmetrics")
        .select("window_start", "op", "n_events")
        .collect()
    )
    batch = spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(events_dir)
    want = (
        batch.groupBy(F.window("ts", "5 minutes").alias("win"), "op")
        .agg(F.count("*").alias("n_events"))
        .select(F.col("win.start").alias("window_start"), "op", "n_events")
        .collect()
    )
    key = lambda r: (r["window_start"], r["op"])  # noqa: E731
    assert {key(r): r["n_events"] for r in got} == {
        key(r): r["n_events"] for r in want
    }


def test_vacuum_and_compact(spark, tmp_path, scenario):
    seed, log, ora = scenario
    table = LakeTable.create(
        spark, str(tmp_path / "t5"), seed_df=spark_seed(spark, seed), n_buckets=4
    )
    for i, b in enumerate(log.batches):
        table.merge_batch(spark, spark_events(spark, b), fence_key=f"r/e{i}/b", epoch_id=i)
    removed = table.vacuum()
    assert removed >= 0
    check_final(spark, table, ora)  # vacuum never touches referenced data
    max_lsn = int(log.all_events()["lsn"].max())
    table.compact_tombstones(spark, lsn_watermark=max_lsn + 1)
    check_final(spark, table, ora)  # compaction preserves visible state
    table.vacuum()
    check_final(spark, table, ora)
