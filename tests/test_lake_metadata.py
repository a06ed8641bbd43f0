"""Commit-metadata boundedness + crash-window recovery + run coalescing.

Round-2 hardening of the LakeTable commit path:

- manifest bytes must be O(1) in epoch count (lineage + dead letters live
  in parquet side-tables; the fence map keeps a bounded window) — over a
  10^10-event replay with ~10^5 epochs the round-1 design re-serialized
  the whole history into every manifest;
- a crash between the manifest CAS create and the HEAD swap must be
  self-healing on the next commit (single-writer orphan reclaim), not
  require a manual vacuum();
- consecutive move-free producer batches coalesce into one fenced commit
  (LWW registers are order-independent), so an epoch of K move-free
  batches pays 1 manifest commit, not K.
"""

from __future__ import annotations

import os
import time as _time_mod

import pandas as pd

from nifi_tekst_bundle_spark import fixtures, oracle
from nifi_tekst_bundle_spark.streaming import runner
from nifi_tekst_bundle_spark.table.lake import LakeTable

from .conftest import normalize_frame, spark_events, spark_seed


def _to_pdf(lsn: int, conv: str = "conv-fixed") -> pd.DataFrame:
    return pd.DataFrame(
        [
            {
                "lsn": lsn,
                "batch_id": f"b{lsn:05d}",
                "op": "insert",
                "conv_id": conv,
                "turn_idx": 1,
                "src_conv_id": None,
                "src_turn_idx": None,
                "role": "user",
                "text": f"t{lsn}",
                "tool": None,
                "ts": None,
                "extra": None,
                "schema_version": 1,
            }
        ]
    )


def _one_insert_batch(spark, lsn: int, conv: str = "conv-fixed"):
    return spark_events(spark, _to_pdf(lsn, conv))


def _manifest_bytes(table: LakeTable) -> int:
    v = table.manifest().version
    return os.path.getsize(os.path.join(table.meta_dir, f"v{v:06d}.json"))


def test_manifest_bytes_bounded_in_epoch_count(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    table.FENCE_WINDOW = 4
    sizes = []
    n = 14
    for i in range(n):
        assert table.merge_batch(
            spark,
            _one_insert_batch(spark, lsn=i + 1),
            fence_key=f"r/e{i:04d}/b",
            epoch_id=i,
        )
        sizes.append(_manifest_bytes(table))
    # once the fence window saturates (same bucket touched every time, fixed-
    # width fence keys), manifest bytes must stop growing entirely
    assert sizes[-1] <= sizes[6] + 16, sizes
    # fences behind the window are pruned, recent ones kept
    committed = table.manifest().committed
    assert f"r/e{n - 1:04d}/b" in committed
    assert f"r/e0000/b" not in committed
    # lineage survives pruning — full history in the parquet side-table
    lin = table.lineage_df(spark).toPandas()
    assert {f"r/e{i:04d}/b" for i in range(n)} <= set(lin["fence_key"])
    # visible state has every insert applied exactly once
    assert table.visible(spark).count() == 1  # same key upserted n times


def test_dead_letters_survive_commits_and_dedupe(spark, tmp_path):
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    bad = pd.DataFrame(
        [
            {
                "lsn": 1,
                "batch_id": "b0",
                "op": "frobnicate",
                "conv_id": "conv-1",
                "turn_idx": 1,
                "src_conv_id": None,
                "src_turn_idx": None,
                "role": None,
                "text": None,
                "tool": None,
                "ts": None,
                "extra": None,
                "schema_version": 1,
            },
            {
                "lsn": 2,
                "batch_id": "b0",
                "op": "insert",
                "conv_id": "conv-1",
                "turn_idx": 1,
                "src_conv_id": None,
                "src_turn_idx": None,
                "role": "user",
                "text": "ok",
                "tool": None,
                "ts": None,
                "extra": None,
                "schema_version": 1,
            },
        ]
    )
    assert table.merge_batch(spark, spark_events(spark, bad), fence_key="r/e0/b0", epoch_id=0)
    dl = table.dead_letters(spark).toPandas()
    assert len(dl) == 1 and dl["reason"].iloc[0] == "bad_op"
    assert dl["fence_key"].iloc[0] == "r/e0/b0"
    # a second commit does not disturb recorded dead letters
    assert table.merge_batch(
        spark, _one_insert_batch(spark, lsn=3), fence_key="r/e1/b1", epoch_id=1
    )
    assert table.dead_letters(spark).count() == 1


def test_orphan_manifest_reclaimed_after_crash_window(spark, tmp_path):
    """Simulate a crash between the O_EXCL manifest create and the HEAD
    swap: the orphan v{n}.json must not brick subsequent commits."""
    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    head = table.manifest().version
    orphan = os.path.join(table.meta_dir, f"v{head + 1:06d}.json")
    with open(orphan, "w") as f:
        f.write('{"torn": "crash left this behind"}')
    # age the orphan past the in-flight-writer grace period
    past = _time_mod.time() - 2 * LakeTable.ORPHAN_GRACE_SECONDS
    os.utime(orphan, (past, past))
    # HEAD still points at `head`; the next commit targets head+1 and must
    # reclaim the orphan instead of raising ConcurrentCommitError forever
    assert table.merge_batch(
        spark, _one_insert_batch(spark, lsn=1), fence_key="r/e0/b", epoch_id=0
    )
    m = table.manifest()
    assert m.version == head + 1
    assert "r/e0/b" in m.committed
    assert table.visible(spark).count() == 1


def test_runner_coalesces_move_free_batches(spark, tmp_path):
    """An epoch of 4 move-free producer batches → exactly 1 fenced commit;
    final state still equals the sequential oracle."""
    seed = fixtures.make_seed_transcripts(n_convs=10, max_turns=4)
    log = fixtures.make_event_log(
        seed,
        fixtures.EventLogConfig(n_batches=4, events_per_batch=40, include_moves=False),
    )
    ora = oracle.replay(seed, log.batches)
    events_dir = str(tmp_path / "events")
    fixtures.write_event_log_parquet(log, events_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), seed_df=spark_seed(spark, seed), n_buckets=8
    )
    stats = runner.run_to_completion(
        spark, events_dir, table, str(tmp_path / "ckpt"), run_id="r1",
        max_files_per_trigger=4,
    )
    assert stats.batches_applied == 4
    assert stats.commits == 1
    got = normalize_frame(table.visible(spark).toPandas())
    want = normalize_frame(ora.state)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_runner_move_batches_keep_boundaries(spark, tmp_path):
    """With moves in the log, commits == plan_runs() prediction and the
    final state still matches the oracle (moves see pre-batch state)."""
    seed = fixtures.make_seed_transcripts(n_convs=10, max_turns=4)
    log = fixtures.make_event_log(
        seed, fixtures.EventLogConfig(n_batches=4, events_per_batch=40)
    )
    ora = oracle.replay(seed, log.batches)
    batch_moves = [
        (b["batch_id"].iloc[0], bool((b["op"] == "move").any()))
        for b in log.batches
    ]
    expected_runs = runner.plan_runs(batch_moves)
    events_dir = str(tmp_path / "events")
    fixtures.write_event_log_parquet(log, events_dir)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), seed_df=spark_seed(spark, seed), n_buckets=8
    )
    stats = runner.run_to_completion(
        spark, events_dir, table, str(tmp_path / "ckpt"), run_id="r1",
        max_files_per_trigger=4,
    )
    assert stats.commits == len(expected_runs)
    assert stats.batches_applied == 4
    got = normalize_frame(table.visible(spark).toPandas())
    want = normalize_frame(ora.state)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_vacuum_reclaims_superseded_files_in_partially_live_dirs(spark, tmp_path):
    """A later commit rewriting bucket B must let vacuum() reclaim the
    superseded B-files inside earlier commit directories even while those
    directories still hold other live buckets — one live bucket must not
    pin dead siblings forever."""
    import pandas as pd

    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=2)
    # conv-0 hashes to bucket 0, conv-1 to bucket 1 (xxhash64 seed 42):
    # the first commit writes BOTH buckets into one commit dir...
    both = pd.concat(
        [
            _to_pdf(lsn=1, conv="conv-0"),
            _to_pdf(lsn=2, conv="conv-1"),
        ]
    )
    table.merge_batch(spark, spark_events(spark, both), fence_key="r/e0/b", epoch_id=0)
    first_commit_files = {f["path"] for f in table.manifest().files}
    # ...then only bucket 0 is rewritten, so the first commit dir stays
    # PARTIALLY live (its bucket-1 file referenced, its bucket-0 file dead)
    for i in range(1, 6):
        table.merge_batch(
            spark, _one_insert_batch(spark, lsn=i + 10, conv="conv-0"),
            fence_key=f"r/e{i}/b", epoch_id=i,
        )
    live_b1 = {f["path"] for f in table.manifest().files} & first_commit_files
    assert live_b1  # the partial-liveness setup holds
    table.vacuum()
    on_disk = []
    for dirpath, _d, files in os.walk(table.data_dir):
        on_disk += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    referenced = {f["path"] for f in table.manifest().files}
    assert set(on_disk) == referenced  # dead siblings reclaimed, live kept
    assert live_b1 <= set(on_disk)
    assert table.visible(spark).count() == 2  # state intact


def test_move_fences_survive_window_pruning(spark, tmp_path):
    """Move-batch fences are kept beyond FENCE_WINDOW (their re-apply is
    the one non-idempotent case); move-free fences prune normally."""
    import pandas as pd

    table = LakeTable.create(spark, str(tmp_path / "t"), n_buckets=4)
    table.FENCE_WINDOW = 3
    table.merge_batch(
        spark, _one_insert_batch(spark, lsn=1), fence_key="r/e0000/b", epoch_id=0
    )
    move = pd.DataFrame(
        [
            {
                "lsn": 2, "batch_id": "b1", "op": "move",
                "conv_id": "conv-x", "turn_idx": 2,
                "src_conv_id": "conv-fixed", "src_turn_idx": 1,
                "role": None, "text": None, "tool": None, "ts": None,
                "extra": None, "schema_version": 1,
            }
        ]
    )
    table.merge_batch(spark, spark_events(spark, move), fence_key="r/e0001/m", epoch_id=1)
    for i in range(2, 8):
        table.merge_batch(
            spark, _one_insert_batch(spark, lsn=i + 10),
            fence_key=f"r/e{i:04d}/b", epoch_id=i,
        )
    committed = table.manifest().committed
    assert "r/e0001/m" in committed  # move fence never pruned
    assert "r/e0000/b" not in committed  # move-free fence pruned


def test_plan_runs_grouping():
    mk = runner.plan_runs
    assert mk([("b0", False), ("b1", False), ("b2", False)]) == [["b0", "b1", "b2"]]
    assert mk([("b0", False), ("b1", True), ("b2", False), ("b3", False)]) == [
        ["b0"], ["b1"], ["b2", "b3"]
    ]
    assert mk([("b0", True), ("b1", True)]) == [["b0"], ["b1"]]
    assert mk([]) == []
