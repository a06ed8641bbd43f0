"""Streaming sessionization: native session windows + a custom stateful
operator.

Two formulations of "group a conversation's events into activity
sessions", each the right tool at a different point in the design space:

- :func:`session_window_metrics` — Spark's built-in ``F.session_window``
  (gap-based merging windows) with a watermark. Fully JVM-side, state
  bounded by the watermark, whole-stage-codegen aggregation: the default
  choice, and the streaming analogue of ``operators.temporal.sessionize``
  (whose lag+cumsum form is the batch/oracle-checkable equivalent).

- :func:`conversation_progress` — ``applyInPandasWithState``: the escape
  hatch for stateful logic *no built-in operator expresses* (here: emit a
  running per-conversation turn count and a monotone high-water turn_idx
  on EVERY trigger, not only at window close — built-in aggregations
  can't emit per-update rows in append mode). Arrow-batched per group;
  state is a single tuple per conversation; GroupStateTimeout evicts
  idle conversations so state is bounded by active-conversation count,
  not history. The reference's analogue is the per-folder running state
  ReorderFiles keeps across onTrigger invocations (ReorderFiles.kt:330).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def session_window_metrics(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
    key: str = "conv_id",
) -> DataFrame:
    """Per-key gap sessions over a streaming event DataFrame.

    Session windows merge as events arrive; the watermark finalizes and
    evicts sessions whose end is older than (max event time − delay), so
    state is bounded by *open* sessions. Metrics-only semantics, like
    windowed_event_metrics: the CDC apply path never drops late events.
    """
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy(F.session_window(F.col("ts"), gap).alias("win"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            F.max("lsn").alias("max_lsn"),
        )
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            key,
            "n_events",
            "max_lsn",
        )
    )


PROGRESS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("events_seen", T.LongType(), False),
        T.StructField("max_turn_idx", T.IntegerType(), True),
        T.StructField("max_lsn", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("events_seen", T.LongType(), True),
        T.StructField("max_turn_idx", T.IntegerType(), True),
        T.StructField("max_lsn", T.LongType(), True),
    ]
)


def conversation_progress(
    events_stream: DataFrame, idle_timeout_ms: int | None = None
) -> DataFrame:
    """Running per-conversation progress rows, one per touched conversation
    per trigger — the applyInPandasWithState custom stateful operator.

    State per key is one (events_seen, max_turn_idx, max_lsn) tuple.
    ``idle_timeout_ms`` enables processing-time state eviction for idle
    conversations, bounding total state by *active*-conversation count —
    use it under long-running ProcessingTime triggers. Leave it None for
    AvailableNow drains: Spark's final state-cleanup trigger WAITS for
    processing-time timeouts to mature, so a drain with eviction enabled
    idles until the timeout elapses instead of terminating.
    """

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle conversation: evict state, emit nothing (the last
            # progress row already carried the final counts)
            state.remove()
            return
        seen, max_turn, max_lsn = state.get if state.exists else (0, None, 0)
        for pdf in pdfs:
            seen += len(pdf)
            t = pdf["turn_idx"].dropna()
            if len(t):
                m = int(t.max())
                max_turn = m if max_turn is None else max(max_turn, m)
            if len(pdf):
                max_lsn = max(max_lsn, int(pdf["lsn"].max()))
        state.update((seen, max_turn, max_lsn))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            {
                "conv_id": [key[0]],
                "events_seen": [seen],
                "max_turn_idx": [max_turn],
                "max_lsn": [max_lsn],
            }
        )

    return events_stream.groupBy("conv_id").applyInPandasWithState(
        fn,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms
            else GroupStateTimeout.NoTimeout
        ),
    )
