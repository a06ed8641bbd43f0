"""apply_derived_log with MANY move-containing batches.

Guards the plan-growth fix: each move run's expansion embeds the pre-state
fold of everything before it; without per-run localCheckpoint the plan
doubles per move batch (2^k nodes by batch k). This log produces 6+ move
runs and must both complete quickly and match the sequential oracle.
"""

from __future__ import annotations

import pandas as pd

from nifi_tekst_bundle_spark import fixtures, oracle
from nifi_tekst_bundle_spark.operators import apply as ap
from nifi_tekst_bundle_spark.schemas import PAYLOAD_COLUMNS

from .conftest import normalize_frame, spark_events


def test_many_move_batches_match_oracle(spark):
    seed = fixtures.make_seed_transcripts(n_convs=8, max_turns=5)
    log = fixtures.make_event_log(
        seed,
        fixtures.EventLogConfig(
            n_batches=6,
            events_per_batch=40,
            include_moves=True,
            include_schema_evolution=False,
            include_malformed=False,
        ),
    )
    assert sum((b["op"] == "move").any() for b in log.batches) >= 4
    # no seed: the oracle starts empty too (apply_derived_log is seedless)
    empty_seed = pd.DataFrame(
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    ora = oracle.replay(empty_seed, log.batches, max_schema_version=1)

    all_events = spark_events(spark, log.all_events())
    from nifi_tekst_bundle_spark.operators import resolve

    good, _dead = resolve.validate(all_events, [])
    final = ap.apply_derived_log(spark, good, list(PAYLOAD_COLUMNS))
    got = normalize_frame(final.toPandas())
    want = normalize_frame(ora.state)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
