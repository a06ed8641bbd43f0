"""Guards for the cdc_moves_final_state driver query.

The round-1 blind spot was that no oracle query exercised op='move'; this
suite pins the round-2 derivation so it can never silently regress to a
vacuous dataset (e.g. every move source unresolvable — which still
hash-matches the oracle because both sides dead-letter everything).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nifi_tekst_bundle_spark.operators import lww, resolve
from nifi_tekst_bundle_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def test_moves_derivation_exercises_all_paths(spark):
    events = catalog.derive_change_events(spark, SF, include_moves=True)
    good, dead = resolve.validate(events, [])
    assert dead.count() == 0  # valid derivation: nothing malformed
    moves = good.filter(F.col("op") == "move")
    n_moves = moves.count()
    assert n_moves > 0
    # moves land only in the final batch (pre-batch state = fold of b00..b03)
    assert moves.filter(F.col("batch_id") != "b04").count() == 0
    assert moves.filter(F.col("conv_id") != F.col("src_conv_id")).count() > 0

    prelim = good.filter(F.col("batch_id") < "b04").select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *catalog.CDC_PAYLOAD
    )
    pre = lww.visible(
        lww.batch_registers(prelim, catalog.CDC_PAYLOAD), catalog.CDC_PAYLOAD
    )
    b04 = good.filter(F.col("batch_id") == "b04")
    normalized, dead_moves = resolve.expand_moves(b04, pre, catalog.CDC_PAYLOAD)

    n_dead = dead_moves.count()
    n_resolved = n_moves - n_dead
    n_orig_deletes = b04.filter(F.col("op") == "delete").count()
    n_src_deletes = (
        normalized.filter(F.col("op") == "delete").count() - n_orig_deletes
    )
    n_suppressed = n_resolved - n_src_deletes
    # every semantic path must be non-vacuously exercised:
    assert n_resolved > 0, "no move resolved against pre-batch state"
    assert n_dead > 0, "missing_move_source path not exercised"
    assert n_src_deletes > 0, "no surviving source delete"
    assert n_suppressed > 0, "swap/cycle suppression not exercised"


def test_moves_flag_off_keeps_round1_derivation(spark):
    events = catalog.derive_change_events(spark, SF)
    assert events.filter(F.col("op") == "move").count() == 0
    # round-1 turn formula (event_id % 25 == (lsn-1) % 25) intact, so the
    # existing green oracle queries are untouched by the moves flag
    assert events.filter(F.col("turn_idx") != (F.col("lsn") - 1) % 25).count() == 0
    assert events.filter(F.col("src_conv_id").isNotNull()).count() == 0


def test_moves_query_runs_and_differs_from_no_move_state(spark):
    with_moves = catalog.q_cdc_moves_final_state(spark, SF)
    base = catalog.q_cdc_lww_final_state(spark, SF)
    assert with_moves.count() > 0
    assert with_moves.columns == base.columns
