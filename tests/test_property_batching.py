"""Property-based check of the core north-rule invariant.

For move-free change logs, the final table must be IDENTICAL under ANY
partitioning of the events into micro-batches, in any order — because the
per-key/per-column LWW registers are associative and commutative. The
reference has no property-based tests (SURVEY.md §5); this goes beyond
its example-based suite: hypothesis draws random batch assignments and
the engine must match the single-batch oracle replay every time.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nifi_tekst_bundle_spark import fixtures, oracle
from nifi_tekst_bundle_spark.operators import apply as ap

from .conftest import normalize_frame, spark_events, spark_seed


def _scenario():
    seed_df = fixtures.make_seed_transcripts(n_convs=8, max_turns=4)
    log = fixtures.make_event_log(
        seed_df,
        fixtures.EventLogConfig(
            n_batches=2, events_per_batch=60, include_moves=False
        ),
    )
    return seed_df, log.all_events()


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=list(HealthCheck),
)
@given(data=st.data())
def test_final_state_invariant_under_random_batching(spark, data):
    seed_df, all_ev = _scenario()
    n = len(all_ev)
    k = data.draw(st.integers(min_value=2, max_value=4))
    assignment = data.draw(
        st.lists(st.integers(0, k - 1), min_size=n, max_size=n)
    )
    batches = []
    for i in range(k):
        mask = [a == i for a in assignment]
        sub = all_ev[mask].copy()
        if len(sub):
            sub["batch_id"] = f"rb{i:02d}"
            batches.append(sub)
    # oracle: the whole log as ONE batch (grouping must be irrelevant)
    ora = oracle.replay(seed_df, [all_ev])
    final, _dead = ap.apply_log(
        spark,
        spark_seed(spark, seed_df),
        [spark_events(spark, b) for b in batches],
    )
    got = normalize_frame(final.toPandas())
    want = normalize_frame(ora.state)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
