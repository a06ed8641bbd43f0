"""Incremental view maintenance (IVM) over the change feed.

The reference pipeline recomputes downstream artifacts whenever inputs
change (`DeleteOcrFiles.kt` invalidates, a later full pass regenerates);
the lakehouse analogue is better: a downstream *view* (here the
per-conversation rollup a serving layer reads) is REFRESHED from the
table's change feed (`table/lake.py table_changes`, the Delta-CDF /
Iceberg-incremental-read shape) by touching only the changed groups —
classic delta-propagation IVM (self-maintainable aggregates).

Scale shape (100 TB): the delta aggregation shuffles only the change
batch (∝ rows changed between the two versions, via CDF's
changed-bucket pruning — never table-sized); the merge into the previous
rollup is one equi-join on the group key, broadcastable whenever the
delta's group set is small, and bucket-colocatable otherwise. A full
recompute would rescan 100 TB to refresh a few thousand conversations;
this touches exactly those conversations.

Only *self-maintainable* aggregates are maintained (COUNT and SUM forms
— invertible under deletes without re-reading the group). MAX/MIN-style
aggregates are NOT (a deleted max forces a group re-read); callers
needing them should recompute just the changed groups from the new
snapshot (group-pruned recompute), which `changed_groups` supports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GROUP_KEY = "conv_id"

# Delta-CDF change_type vocabulary (table/lake.py table_changes): the two
# "arrival" images add to the group, the two "departure" images subtract.
_ADD_TYPES = ("insert", "update_postimage")
_DROP_TYPES = ("delete", "update_preimage")

_STAT_COLS = ["n_turns", "total_chars", "n_tool_turns"]


def _stats(sign):
    """The maintained aggregate set, signed for delta propagation.

    n_turns / total_chars / n_tool_turns — all COUNT/SUM-shaped, hence
    exactly invertible: maintain(rollup(S), changes(S→S')) ≡ rollup(S')
    for any change set, not just the ones we test.
    """
    return [
        F.sum(sign).alias("n_turns"),
        F.sum(sign * F.coalesce(F.length("text"), F.lit(0))).alias(
            "total_chars"
        ),
        F.sum(sign * F.col("tool").isNotNull().cast("long")).alias(
            "n_tool_turns"
        ),
    ]


def conv_rollup(visible: DataFrame) -> DataFrame:
    """Full-recompute rollup — the bootstrap (version-0 view) and the
    definition `maintain_rollup` must stay equal to. One map-side-
    combinable groupBy on the conversation key."""
    return visible.groupBy(GROUP_KEY).agg(*_stats(F.lit(1).cast("long")))


def maintain_rollup(prev: DataFrame, changes: DataFrame) -> DataFrame:
    """Refresh ``prev = conv_rollup(visible@v_from)`` to the rollup of
    ``visible@v_to`` given ``changes = table_changes(v_from, v_to)``.

    Delta aggregation (+1 for arriving images, −1 for departing) shuffles
    only the change batch; the merge is a single full-outer equi-join on
    the group key. Groups whose turn count reaches 0 leave the view.
    An update that doesn't touch a maintained column nets to exactly 0
    (pre −x, post +x), so unchanged groups that merely appear in the
    feed keep bit-identical stats.
    """
    sign = (
        F.when(F.col("change_type").isin(*_ADD_TYPES), F.lit(1))
        .when(F.col("change_type").isin(*_DROP_TYPES), F.lit(-1))
        .otherwise(
            # unknown vocabulary = a corrupt feed; fail the job loudly
            # rather than silently skewing the view
            F.assert_true(
                F.lit(False), F.lit("ivm: unknown change_type")
            ).cast("int")
        )
        .cast("long")
    )
    delta = changes.groupBy(GROUP_KEY).agg(*_stats(sign))
    p = prev.select(
        GROUP_KEY, *[F.col(c).alias(f"_p_{c}") for c in _STAT_COLS]
    )
    d = delta.select(
        GROUP_KEY, *[F.col(c).alias(f"_d_{c}") for c in _STAT_COLS]
    )
    merged = p.join(d, GROUP_KEY, "full_outer").select(
        GROUP_KEY,
        *[
            (
                F.coalesce(F.col(f"_p_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in _STAT_COLS
        ],
    )
    return merged.filter(F.col("n_turns") > 0)


def changed_groups(changes: DataFrame) -> DataFrame:
    """Distinct group keys touched by a change batch — the pruning set for
    group-pruned recompute of non-self-maintainable aggregates."""
    return changes.select(GROUP_KEY).distinct()


class MaterializedRollup:
    """Crash-safe materialized view of `conv_rollup` kept current against
    a LakeTable via its change feed — the serving-layer loop productized.

    `refresh()` reads the view's recorded base version and applies ONE
    `table_changes(base, head)` diff through `maintain_rollup` (CDF
    computes net changes between ANY two versions, so catching up N
    commits costs one diff, not N folds). State lives as
    ``rollup-<version>/`` parquet plus a STATE json written LAST: a crash
    between the parquet write and the STATE swap leaves the old state
    authoritative and the next refresh simply rediffs from the old base —
    idempotent, no torn view. If the base version became unreadable
    (vacuumed history, or an `erase_keys` floor — the view could be
    serving erased text), the view REBOOTSTRAPS with a full recompute at
    HEAD, which is also how erasure propagates to the view.

    Scale shape: refresh cost ∝ rows changed since the base version (CDF
    bucket pruning) + one group-keyed merge join; the bootstrap is the
    only table-sized pass.
    """

    def __init__(self, root: str):
        import os

        self.root = root
        os.makedirs(root, exist_ok=True)

    def _state_path(self) -> str:
        import os

        return os.path.join(self.root, "STATE.json")

    def _load_state(self) -> dict | None:
        import json

        try:
            with open(self._state_path()) as f:
                return json.loads(f.read())
        except (FileNotFoundError, ValueError):
            return None

    def read(self, spark) -> DataFrame:
        """Current view contents (the last refreshed state)."""
        import os

        st = self._load_state()
        if st is None:
            raise ValueError(
                "materialized rollup has never been refreshed"
            )
        return spark.read.parquet(os.path.join(self.root, st["dir"]))

    def refresh(self, spark, table) -> int:
        """Catch the view up to the table's HEAD. Returns the version the
        view now reflects."""
        import json
        import os
        import shutil
        import uuid

        head = table._head_version()
        st = self._load_state()
        if st is not None and st["version"] == head:
            return head
        if st is None:
            new = conv_rollup(table.visible(spark))
        else:
            try:
                changes = table.table_changes(spark, st["version"], head)
                new = maintain_rollup(self.read(spark), changes)
            except ValueError:
                # base version purged (vacuum / erase floor): rebootstrap —
                # for erasure this is exactly how the view forgets too
                new = conv_rollup(table.visible(spark))
        tag = f"rollup-{head}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self.root, tag)
        new.write.parquet(out)
        tmp = self._state_path() + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            f.write(json.dumps({"version": head, "dir": tag}))
        os.replace(tmp, self._state_path())
        for entry in os.listdir(self.root):
            if entry.startswith("rollup-") and entry != tag:
                shutil.rmtree(
                    os.path.join(self.root, entry), ignore_errors=True
                )
        return head
