"""Stream/state audit operators — the verification half of a CDC engine.

A binlog/WAL tail is only trustworthy if you can prove, inside the engine,
that (a) no change events were lost, (b) every historical version of a key
is reconstructible, and (c) two table states (applied vs replayed, full vs
partial) can be diffed at scale. The reference does these checks manually
and out-of-band (ReorderFilesTest.kt compares directory listings after
replay; CreateMetsBrowsing.kt:292-300 validates each artifact before write);
here they are first-class distributed operators.

All three are pure built-in-expression plans (whole-stage codegen, no
Python):

- :func:`gap_audit` — missing-LSN detection over an arbitrarily large
  stream without a global sort: intra-chunk lag windows + a tiny
  chunk-summary window.
- :func:`scd2_history` — per-key version history (SCD type 2) with
  validity intervals, reconstructing the engine's per-column LWW + delete
  fencing semantics (operators/lww.py) as-of every event.
- :func:`reconcile` — full-outer distributed diff of two table states with
  per-row verdicts and differing-column lists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_audit(events: DataFrame, lsn_col: str = "lsn", chunk: int = 4096) -> DataFrame:
    """Detect missing LSNs in a change stream.

    Emits one row per maximal run of absent LSNs strictly between the
    stream's min and max: (gap_start, gap_end, gap_len).

    100-TB shape: a naive audit is one global sort. Instead LSNs are
    bucketed into fixed chunks (``floor(lsn / chunk)``); gaps *within* a
    chunk come from a lag window partitioned by chunk (shuffle on chunk id,
    each partition tiny and independent), and gaps *across* chunk
    boundaries — including runs spanning entirely-empty chunks — come from
    a lag window over the per-chunk (min, max) summary, which has one row
    per non-empty chunk (stream_size / chunk rows; at 10^10 events and
    chunk=2^20 that is ~10^4 rows). Every consecutive LSN pair is examined
    exactly once: within its chunk if both ends share one, else at the
    summary level.
    """
    lsn = F.col(lsn_col).cast("long")
    tagged = events.select(lsn.alias("_lsn"), F.floor(lsn / chunk).alias("_chunk"))

    w_intra = Window.partitionBy("_chunk").orderBy("_lsn")
    intra = (
        tagged.withColumn("_prev", F.lag("_lsn").over(w_intra))
        .where(F.col("_prev").isNotNull() & (F.col("_lsn") - F.col("_prev") > 1))
        .select(
            (F.col("_prev") + 1).alias("gap_start"),
            (F.col("_lsn") - 1).alias("gap_end"),
        )
    )

    summary = tagged.groupBy("_chunk").agg(
        F.min("_lsn").alias("_cmin"), F.max("_lsn").alias("_cmax")
    )
    w_inter = Window.orderBy("_chunk")
    inter = (
        summary.withColumn("_prev_max", F.lag("_cmax").over(w_inter))
        .where(F.col("_prev_max").isNotNull() & (F.col("_cmin") - F.col("_prev_max") > 1))
        .select(
            (F.col("_prev_max") + 1).alias("gap_start"),
            (F.col("_cmin") - 1).alias("gap_end"),
        )
    )

    return intra.unionByName(inter).select(
        "gap_start",
        "gap_end",
        (F.col("gap_end") - F.col("gap_start") + 1).alias("gap_len"),
    )


def scd2_history(
    events: DataFrame,
    payload_cols: list[str],
    key: list[str] = ("conv_id", "turn_idx"),
) -> DataFrame:
    """SCD type-2 version history: one row per change event carrying the
    key's full reconstructed state *as of that event*, with an LSN validity
    interval.

    State reconstruction uses exactly the engine's register semantics
    (operators/lww.py): per column, the latest non-null non-delete
    assignment wins, fenced by the latest delete (column visible ⟺ its
    assignment LSN > the running delete LSN; row visible ⟺ running upsert
    LSN > running delete LSN). ``valid_to_lsn`` is the next version's LSN
    minus one, NULL for the current version (``is_current``).

    One shuffle on the key; all windows share the same partitioning. The
    output is event-cardinality — inherent to SCD2 — but each partition's
    windows are streaming (running frames), so nothing is buffered beyond a
    key's own history.
    """
    key = list(key)
    is_del = F.col("op") == "delete"
    w_run = (
        Window.partitionBy(*key)
        .orderBy("lsn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_lead = Window.partitionBy(*key).orderBy("lsn")

    run_up = F.coalesce(F.max(F.when(~is_del, F.col("lsn"))).over(w_run), F.lit(-1))
    run_del = F.coalesce(F.max(F.when(is_del, F.col("lsn"))).over(w_run), F.lit(-1))

    cols = [*key, F.col("lsn").alias("valid_from_lsn")]
    out = events.select(*key, "lsn", "op", *payload_cols)
    derived = [
        (F.lead("lsn").over(w_lead) - 1).alias("valid_to_lsn"),
        F.lead("lsn").over(w_lead).isNull().alias("is_current"),
        (run_up > run_del).alias("row_visible"),
    ]
    for c in payload_cols:
        assigned = F.max(
            F.when(
                (~is_del) & F.col(c).isNotNull(),
                F.struct(F.col("lsn").alias("l"), F.col(c).alias("v")),
            )
        ).over(w_run)
        derived.append(
            F.when(F.coalesce(assigned["l"], F.lit(-1)) > run_del, assigned["v"]).alias(c)
        )
    return out.select(*cols, *derived)


def reconcile(
    left: DataFrame,
    right: DataFrame,
    key: list[str],
    payload_cols: list[str],
) -> DataFrame:
    """Distributed diff of two table states keyed by ``key``.

    Full outer join on the key; per row a verdict:

    - ``match``      — key in both, every payload column null-safe equal
    - ``mismatch``   — key in both, some column differs (``diff_cols``
      names them, comma-joined in column order)
    - ``left_only`` / ``right_only`` — key present on one side

    This is the replay-equality check of the north rule ("replaying the
    full change stream reproduces the final table state") as a single
    distributed operator instead of a driver-side assertion: one shuffle on
    the key (or none, if both sides are bucket-colocated LakeTable reads),
    verdicts computed row-local.
    """
    # presence markers travel with each side: a full-outer join leaves the
    # whole absent side null, but an all-null payload row is legitimate, so
    # absence is detected via the explicit _in_l/_in_r literals instead
    lft = left.select(
        *key,
        F.lit(True).alias("_in_l"),
        *[F.col(c).alias(f"_l_{c}") for c in payload_cols],
    )
    rgt = right.select(
        *key,
        F.lit(True).alias("_in_r"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    j = lft.join(rgt, on=key, how="full_outer")
    in_l = F.coalesce(F.col("_in_l"), F.lit(False))
    in_r = F.coalesce(F.col("_in_r"), F.lit(False))

    diffs = [
        F.when(
            ~F.col(f"_l_{c}").eqNullSafe(F.col(f"_r_{c}")), F.lit(c)
        )
        for c in payload_cols
    ]
    diff_cols = F.concat_ws(",", F.array_compact(F.array(*diffs)))
    verdict = (
        F.when(in_l & ~in_r, F.lit("left_only"))
        .when(in_r & ~in_l, F.lit("right_only"))
        .when(diff_cols == "", F.lit("match"))
        .otherwise(F.lit("mismatch"))
    )
    return j.select(
        *key,
        verdict.alias("verdict"),
        F.when(in_l & in_r, diff_cols).alias("diff_cols"),
        *[F.col(f"_l_{c}").alias(f"left_{c}") for c in payload_cols],
        *[F.col(f"_r_{c}").alias(f"right_{c}") for c in payload_cols],
    )
