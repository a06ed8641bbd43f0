"""Temporal operators: as-of join and gap sessionization.

Spark has no native AS OF join (Iceberg/Delta readers and stream-stream
joins are equality-only), but the distributed-canonical formulation is a
union + partitioned sort, not a join at all: tag both sides, union them,
and carry the most recent right-side value forward over a window
partitioned by key and ordered by (ts, side). One shuffle on the key,
no row explosion, no range-condition theta join — the shape that survives
a 100-TB left side (the window sort is per-key within a shuffle
partition; skewed keys degrade to a sort, never a cross product).

Sessionization is the same single-shuffle shape: lag + gap flag + running
sum over a (key, ts) window, then one more partial-aggregatable groupBy.

Reference parity: the reference resolves each instruction against "state
as of the start of the batch" (ReorderFiles.kt:150-184 probing disk before
any rename) — an as-of lookup in time; these operators generalize that to
arbitrary event-time as-of semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` for the same key (NULL when none exists).

    Ties: a right row AT the left row's timestamp matches (≤, the ASOF
    convention); among right rows sharing one timestamp the last in
    (ts, value) order wins deterministically — callers wanting stronger
    guarantees should pre-aggregate the right side to one row per
    (key, ts), which is also what keeps the semantics well-defined.

    Implementation: union the tagged sides and run
    ``last(value, ignorenulls) OVER (PARTITION BY key ORDER BY ts, side,
    value ROWS UNBOUNDED PRECEDING)`` with right rows sorted before left
    rows at equal ts. Exactly one shuffle (on ``on``); both the window
    and the final filter stay in whole-stage codegen.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lcols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in on],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in lcols]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_lrow"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
    )
    u = l.unionByName(r)
    w = (
        Window.partitionBy(*on)
        .orderBy("_t", "_side", *[f"_rv_{c}" for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "_side",
        "_lrow",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *[F.col("_lrow")[c].alias(c) for c in lcols],
        *[F.col(f"{c}{suffix}") for c in value_cols],
    )


def sessionize(
    events: DataFrame,
    key: str,
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Gap-based sessions: within each key's time-ordered event stream, a
    gap > ``gap_minutes`` starts a new session.

    Returns one row per session: (key, session_idx, n_events,
    session_start, session_end, duration_s). ``session_idx`` is 1-based
    in time order per key — stable across replays since it depends only
    on the data. Two shuffles total: one for the per-key window (lag +
    running sum), one partial-aggregated groupBy on (key, session_idx);
    AQE coalesces both. This is the batch analogue of
    ``F.session_window`` (which the streaming layer uses); expressing it
    with lag/sum keeps it reproducible in the ANSI-SQL oracle.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    # TIMESTAMP_NTZ has no direct double cast in Spark 4; route through
    # timestamp_ltz (a no-op for tz-aware inputs; session tz is UTC here)
    ts_s = F.col(ts_col).cast("timestamp_ltz").cast("double")
    gap_s = ts_s - F.lag(ts_s).over(w)
    new_sess = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60.0), F.lit(1)
    ).otherwise(F.lit(0))
    tagged = events.select(
        F.col(key),
        F.col(ts_col).alias("_t"),
        new_sess.alias("_new"),
    ).withColumn(
        "session_idx",
        F.sum("_new").over(
            Window.partitionBy(key).orderBy("_t").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return tagged.groupBy(F.col(key), F.col("session_idx")).agg(
        F.count("*").alias("n_events"),
        F.min("_t").alias("session_start"),
        F.max("_t").alias("session_end"),
        F.round(
            F.max(F.col("_t").cast("timestamp_ltz").cast("double"))
            - F.min(F.col("_t").cast("timestamp_ltz").cast("double")),
            6,
        ).alias("duration_s"),
    )
