"""Transaction-boundary gating for CDC ingest.

Binlog/WAL change streams carry *transaction* metadata alongside the
per-row events (Debezium's transaction metadata topic: BEGIN/END markers
with an ``event_count`` per transaction id; the row envelopes reference
``source.txId`` — see sources/debezium.py DEBEZIUM_ENVELOPE). A sink
that applies rows the moment they arrive exposes torn transactions:
readers observe half of a multi-row commit. The atomic-apply discipline
is to hold a transaction's events back until ALL of them are present,
then apply the whole group — the CDC analogue of the reference's
all-or-nothing batch staging (two-phase stage→commit,
RenameS3Utils.kt:76-118: nothing becomes visible until the whole batch
is staged).

Semantics
---------
``complete_txns(events, txn_meta)`` passes through exactly the events
whose transaction is fully present:

- observed(txn) = count of DISTINCT lsns in ``events`` for that txn —
  distinct, not raw count, because the transport is at-least-once:
  a redelivered event must not make a torn transaction look complete
  one delivery early, nor double-count toward ``expected``.
- a txn is complete iff observed == expected (from ``txn_meta``);
  events whose txn has NO metadata row are held back too — without the
  END marker there is no way to know the txn is whole (Debezium's
  metadata topic can lag the data topic).

``held_back(events, txn_meta)`` is the monitoring/backlog view: one row
per incomplete transaction with observed/expected counts (expected NULL
when the metadata row is missing). At steady state this is the set of
in-flight transactions at the stream cutoff — small by construction.

Plan shape (100 TB)
-------------------
One map-side-combinable aggregation on the txn key produces the observed
counts (the only corpus-wide shuffle); the incomplete-txn id set — the
in-flight transactions at the cutoff, bounded by writer concurrency ×
txn size, NOT by corpus size — is broadcast into a LEFT ANTI join
against the event scan, so the pass-through path never shuffles the
events themselves. If a pathological replay makes most transactions
incomplete (e.g. a truncated log), the broadcast hint is the wrong
call — pass ``broadcast_incomplete=False`` to fall back to a shuffled
anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _observed(events: DataFrame, txn_col: str) -> DataFrame:
    return (
        events.groupBy(txn_col)
        .agg(F.count_distinct(F.col("lsn")).alias("observed"))
    )


def _incomplete(
    events: DataFrame, txn_meta: DataFrame, txn_col: str, expected_col: str
) -> DataFrame:
    """(txn_id, observed, expected) for every txn present in ``events``
    that is not provably complete: count mismatch or missing metadata."""
    obs = _observed(events, txn_col)
    return (
        obs.join(txn_meta.select(txn_col, expected_col), txn_col, "left")
        .filter(
            F.col(expected_col).isNull()
            | (F.col("observed") != F.col(expected_col))
        )
    )


def complete_txns(
    events: DataFrame,
    txn_meta: DataFrame,
    txn_col: str = "txn_id",
    expected_col: str = "expected_events",
    broadcast_incomplete: bool = True,
) -> DataFrame:
    """Atomic-apply gate: only events of fully-present transactions pass.

    ``events`` must carry ``txn_col`` and an ``lsn`` column (completeness
    counts distinct lsns — duplicate deliveries don't fake completeness);
    ``txn_meta`` maps txn id → ``expected_col`` total event count (the
    transaction-metadata END marker). Events with a NULL txn id are held
    back (no transaction identity → no completeness proof).
    """
    inc = _incomplete(events, txn_meta, txn_col, expected_col).select(txn_col)
    if broadcast_incomplete:
        inc = F.broadcast(inc)
    return events.filter(F.col(txn_col).isNotNull()).join(
        inc, txn_col, "left_anti"
    )


def held_back(
    events: DataFrame,
    txn_meta: DataFrame,
    txn_col: str = "txn_id",
    expected_col: str = "expected_events",
) -> DataFrame:
    """Backlog view: one row per incomplete transaction —
    (txn_col, observed, expected_col) with expected NULL when the
    metadata row is missing. Empty ⇔ complete_txns passes everything."""
    return _incomplete(events, txn_meta, txn_col, expected_col).select(
        txn_col, "observed", F.col(expected_col)
    )
