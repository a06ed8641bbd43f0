"""Replay-equality tests: the distributed engine's final table must equal the
single-threaded oracle cell-for-cell (the reference's golden-file comparison,
CreateMetsBrowsingTest.kt:368-411, transposed to table state)."""

from __future__ import annotations

import pandas as pd
import pytest

from nifi_tekst_bundle_spark import fixtures, oracle
from nifi_tekst_bundle_spark.operators import apply as apply_op

from .conftest import normalize_frame, spark_events, spark_seed


def run_both(spark, seed_pdf, log, max_sv=99):
    ora = oracle.replay(seed_pdf, log.batches, max_schema_version=max_sv)
    seed_df = spark_seed(spark, seed_pdf)
    batch_dfs = [spark_events(spark, b) for b in log.batches]
    final, dead = apply_op.apply_log(spark, seed_df, batch_dfs, max_schema_version=max_sv)
    got = normalize_frame(final.toPandas())
    want = normalize_frame(ora.state)
    return got, want, dead, ora


@pytest.mark.parametrize("rng_seed", [42, 7, 1234])
def test_full_mix_replay_equality(spark, rng_seed):
    seed = fixtures.make_seed_transcripts(n_convs=30, max_turns=8, seed=rng_seed)
    log = fixtures.make_event_log(
        seed,
        fixtures.EventLogConfig(n_batches=5, events_per_batch=80, seed=rng_seed),
    )
    got, want, dead, ora = run_both(spark, seed, log)
    assert list(got.columns) == list(want.columns)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # dead-letter counts match the oracle's routing decisions
    assert dead.count() == len(ora.dead_letters)


def test_inserts_updates_deletes_only(spark):
    seed = fixtures.make_seed_transcripts(n_convs=10, max_turns=5)
    cfg = fixtures.EventLogConfig(
        n_batches=4, events_per_batch=50, include_moves=False,
        include_malformed=False, include_schema_evolution=False,
    )
    log = fixtures.make_event_log(seed, cfg)
    got, want, _, _ = run_both(spark, seed, log)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_batching_invariance_without_moves(spark):
    """Core north-rule invariant: for insert/update/delete streams the final
    state is independent of micro-batch grouping (commutative LWW)."""
    seed = fixtures.make_seed_transcripts(n_convs=8, max_turns=4)
    cfg = fixtures.EventLogConfig(
        n_batches=6, events_per_batch=30, include_moves=False,
        include_malformed=False, include_schema_evolution=False,
    )
    log = fixtures.make_event_log(seed, cfg)
    all_events = log.all_events()

    # one giant batch vs per-event shuffled batches
    one = fixtures.GeneratedLog(batches=[all_events])
    shuffled = all_events.sample(frac=1.0, random_state=7).reset_index(drop=True)
    thirds = fixtures.GeneratedLog(
        batches=[shuffled.iloc[i::3].reset_index(drop=True) for i in range(3)]
    )
    got1, want1, _, _ = run_both(spark, seed, one)
    got3, want3, _, _ = run_both(spark, seed, thirds)
    pd.testing.assert_frame_equal(got1, want1, check_dtype=False)
    pd.testing.assert_frame_equal(got3, want3, check_dtype=False)
    pd.testing.assert_frame_equal(got1, got3, check_dtype=False)


def test_swap_within_batch(spark):
    """Two moves exchanging turns in one batch must preserve both rows —
    the RenameS3UtilsTest.kt:100 swap invariant."""
    seed = pd.DataFrame(
        [
            {"conv_id": "c1", "turn_idx": 1, "role": "user", "text": "A",
             "tool": None, "ts": fixtures.BASE_TS},
            {"conv_id": "c1", "turn_idx": 2, "role": "assistant", "text": "B",
             "tool": None, "ts": fixtures.BASE_TS},
        ]
    )
    batch = pd.DataFrame(
        [
            {"lsn": 1, "batch_id": "b0", "op": "move", "conv_id": "c1",
             "turn_idx": 2, "src_conv_id": "c1", "src_turn_idx": 1,
             "role": None, "text": None, "tool": None, "ts": None,
             "extra": None, "schema_version": 1},
            {"lsn": 2, "batch_id": "b0", "op": "move", "conv_id": "c1",
             "turn_idx": 1, "src_conv_id": "c1", "src_turn_idx": 2,
             "role": None, "text": None, "tool": None, "ts": None,
             "extra": None, "schema_version": 1},
        ],
        columns=fixtures.EVENT_COLUMNS,
    )
    log = fixtures.GeneratedLog(batches=[batch])
    got, want, _, _ = run_both(spark, seed, log)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    texts = dict(zip(got["turn_idx"], got["text"]))
    assert texts == {1: "B", 2: "A"}


def test_cross_conv_move_empties_source(spark):
    """Moving the only turn of a conversation deletes the source row
    (ReorderFilesTest.kt:348-426 analogue)."""
    seed = pd.DataFrame(
        [{"conv_id": "src", "turn_idx": 1, "role": "user", "text": "X",
          "tool": None, "ts": fixtures.BASE_TS}]
    )
    batch = pd.DataFrame(
        [{"lsn": 1, "batch_id": "b0", "op": "move", "conv_id": "dst",
          "turn_idx": 5, "src_conv_id": "src", "src_turn_idx": 1,
          "role": None, "text": None, "tool": None, "ts": None,
          "extra": None, "schema_version": 1}],
        columns=fixtures.EVENT_COLUMNS,
    )
    got, want, _, _ = run_both(spark, seed, fixtures.GeneratedLog(batches=[batch]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["conv_id"].tolist() == ["dst"]
    assert got["text"].tolist() == ["X"]


def test_keyless_insert_synthesis(spark):
    batch = pd.DataFrame(
        [{"lsn": 7, "batch_id": "b0", "op": "insert", "conv_id": None,
          "turn_idx": 1, "src_conv_id": None, "src_turn_idx": None,
          "role": "user", "text": "hello", "tool": None, "ts": None,
          "extra": None, "schema_version": 1}],
        columns=fixtures.EVENT_COLUMNS,
    )
    seed = pd.DataFrame(columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    got, want, _, _ = run_both(spark, seed, fixtures.GeneratedLog(batches=[batch]))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["conv_id"].tolist() == ["conv-auto-0000000000000007"]


def test_schema_evolution_promotes_columns(spark):
    seed = fixtures.make_seed_transcripts(n_convs=3, max_turns=3)
    cfg = fixtures.EventLogConfig(
        n_batches=4, events_per_batch=20, include_moves=False,
        include_malformed=False, include_schema_evolution=True,
    )
    log = fixtures.make_event_log(seed, cfg)
    got, want, _, _ = run_both(spark, seed, log)
    assert "language" in got.columns and "material_type" in got.columns
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (want["language"] == "nob").any()


def test_dead_letter_reasons(spark):
    seed = fixtures.make_seed_transcripts(n_convs=4, max_turns=3)
    log = fixtures.make_event_log(
        seed, fixtures.EventLogConfig(n_batches=2, events_per_batch=30)
    )
    _, _, dead, ora = run_both(spark, seed, log)
    got_reasons = sorted(
        [(r["lsn"], r["reason"]) for r in dead.select("lsn", "reason").collect()]
    )
    want_reasons = sorted(
        ora.dead_letters[["lsn", "reason"]].itertuples(index=False, name=None)
    ) if len(ora.dead_letters) else []
    assert got_reasons == [(int(a), b) for a, b in want_reasons]
