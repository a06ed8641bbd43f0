"""Single-threaded oracle replay — the engine's formal semantics, executable.

This is the transposition of the reference's golden-file comparison
(CreateMetsBrowsingTest.kt:368-411): apply the full change log with a trivial
sequential interpreter, and require the distributed engine's final table to
equal it cell-for-cell under stable (conv_id, turn_idx) ordering.

Semantics (shared by engine and oracle — documented once, here):

Batches apply in ascending ``batch_id`` order; one batch is the declarative
unit, exactly like the reference's change-batch FlowFile (one batch per
onTrigger, ReorderFiles.kt:329-420).

Within and across batches, insert/update/delete resolution is a commutative
per-key, per-column last-writer-wins register keyed by ``lsn``:

- per key we track ``D`` = max lsn of any delete, ``U`` = max lsn of any
  upsert, and per payload column ``(l_c, v_c)`` = the highest-lsn non-null
  assignment;
- the row is visible iff ``U > D``; a column is visible iff ``l_c > D``.

Because (max, argmax) merges are associative and commutative, the final
state of insert/update/delete streams is independent of how events are
grouped into micro-batches and of arrival order — the core invariant from
the north rule. Seed rows enter with lsn 0 (event lsns start at 1).

``move`` events are the one batch-scoped construct (they are the reference's
rename instructions, RenameInstruction.kt:3-6): a move resolves its source
payload against the *visible state at the start of its batch* — exactly as
the reference probes current disk state before applying any rename
(ReorderFiles.kt:150-184) — and expands into an upsert at the target
(payload = event fields, falling back to source-row fields per the new-wins
merge rule of GenerateJsonFromProps.kt:302-322) plus a source delete at the
move's lsn, *suppressed when the source key is also an upsert target in the
same batch* (swap preservation, RenameS3Utils.kt:120-133).

Validation (dead-letter instead of apply; reference PathSafety.kt:22-32 and
the failure relationship):
- op must be one of insert/update/delete/move;
- conv_id may be null only for op=insert (then a deterministic id is
  synthesized from the lsn — the UUIDv7 analogue, ReorderFiles.kt:312-316);
- turn_idx must be non-null; keys must match SAFE_KEY_RE;
- move needs a resolvable source row, else dead-letter
  (missing JHOVE file is a hard error in the reference,
  CreateMetsBrowsing.kt:326-338).

Schema evolution: events with schema_version ≥ 2 may carry promoted keys in
``extra``; promoted keys become first-class LWW columns.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

import pandas as pd

from .schemas import PAYLOAD_COLUMNS, promoted_columns

SAFE_KEY_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")

VALID_OPS = {"insert", "update", "delete", "move"}


def synthesize_conv_id(lsn: int) -> str:
    """Deterministic key synthesis for keyless inserts.

    The reference uses UUIDv7 (time-ordered, UUIDv7Generator.kt:25-43); we
    keep the time-ordered property via the monotone lsn but stay
    deterministic/replayable: conv-auto-<16-hex-digit lsn>.
    """
    return f"conv-auto-{lsn:016X}"


def _is_safe(key) -> bool:
    return isinstance(key, str) and bool(SAFE_KEY_RE.match(key))


@dataclass
class _Reg:
    """Per-key LWW register state."""

    d: int = -1  # max delete lsn
    u: int = -1  # max upsert lsn
    cols: dict = dc_field(default_factory=dict)  # col -> (lsn, value)


@dataclass
class OracleResult:
    state: pd.DataFrame
    dead_letters: pd.DataFrame
    payload_cols: list


def replay(
    seed_df: pd.DataFrame,
    batches: list[pd.DataFrame],
    max_schema_version: int = 99,
) -> OracleResult:
    promoted = list(promoted_columns(max_schema_version))
    payload = list(PAYLOAD_COLUMNS) + promoted

    regs: dict[tuple, _Reg] = {}
    for row in seed_df.itertuples(index=False):
        key = (row.conv_id, int(row.turn_idx))
        reg = _Reg(d=-1, u=0)
        for c in PAYLOAD_COLUMNS:
            v = getattr(row, c, None)
            if v is not None and not (isinstance(v, float) and pd.isna(v)):
                reg.cols[c] = (0, v)
        regs[key] = reg

    dead: list[dict] = []

    def visible_value(reg: _Reg, c: str):
        l, v = reg.cols.get(c, (-1, None))
        return v if l > reg.d else None

    def visible(reg: _Reg) -> bool:
        return reg.u > reg.d

    for bdf in batches:
        bdf = bdf.sort_values("lsn")
        upsert_targets: set[tuple] = set()
        resolved: list[dict] = []  # normalized events: upserts + deletes
        # snapshot of pre-batch visible state for move resolution
        pre = {
            k: {c: visible_value(r, c) for c in payload}
            for k, r in regs.items()
            if visible(r)
        }

        for row in bdf.itertuples(index=False):
            e = row._asdict()
            op = e["op"]
            lsn = int(e["lsn"])
            if op not in VALID_OPS:
                dead.append({**e, "reason": "bad_op"})
                continue
            conv = e["conv_id"]
            if conv is None or (isinstance(conv, float) and pd.isna(conv)):
                if op == "insert":
                    conv = synthesize_conv_id(lsn)
                else:
                    dead.append({**e, "reason": "missing_key"})
                    continue
            if not _is_safe(conv):
                dead.append({**e, "reason": "unsafe_key"})
                continue
            if e["turn_idx"] is None or pd.isna(e["turn_idx"]):
                dead.append({**e, "reason": "missing_key"})
                continue
            tgt = (conv, int(e["turn_idx"]))

            ext = e.get("extra") or {}
            if not isinstance(ext, dict):
                ext = dict(ext)
            pay = {c: e.get(c) for c in PAYLOAD_COLUMNS}
            for c in promoted:
                pay[c] = ext.get(c)

            if op == "move":
                src_c, src_t = e["src_conv_id"], e["src_turn_idx"]
                if (
                    src_c is None
                    or (isinstance(src_c, float) and pd.isna(src_c))
                    or src_t is None
                    or pd.isna(src_t)
                    or not _is_safe(src_c)
                ):
                    dead.append({**e, "reason": "missing_key"})
                    continue
                src = (src_c, int(src_t))
                if src not in pre:
                    dead.append({**e, "reason": "missing_move_source"})
                    continue
                src_pay = pre[src]
                merged = {
                    c: pay[c] if pay[c] is not None
                    and not (isinstance(pay[c], float) and pd.isna(pay[c]))
                    else src_pay[c]
                    for c in payload
                }
                resolved.append(
                    {"kind": "upsert", "key": tgt, "lsn": lsn, "pay": merged}
                )
                upsert_targets.add(tgt)
                resolved.append(
                    {"kind": "src_delete", "key": src, "lsn": lsn}
                )
            elif op == "delete":
                resolved.append({"kind": "delete", "key": tgt, "lsn": lsn})
            else:  # insert / update
                clean = {
                    c: (None if isinstance(v, float) and pd.isna(v) else v)
                    for c, v in pay.items()
                }
                resolved.append(
                    {"kind": "upsert", "key": tgt, "lsn": lsn, "pay": clean}
                )
                upsert_targets.add(tgt)

        # fold into registers (order within batch is irrelevant by design,
        # except src_delete suppression which is already decided)
        for r in resolved:
            if r["kind"] == "src_delete" and r["key"] in upsert_targets:
                continue  # swap preservation
            reg = regs.setdefault(r["key"], _Reg())
            if r["kind"] == "upsert":
                reg.u = max(reg.u, r["lsn"])
                for c, v in r["pay"].items():
                    if v is not None:
                        l_old, _ = reg.cols.get(c, (-1, None))
                        if r["lsn"] > l_old:
                            reg.cols[c] = (r["lsn"], v)
            else:
                reg.d = max(reg.d, r["lsn"])

    rows = []
    for (conv, turn), reg in regs.items():
        if not visible(reg):
            continue
        out = {"conv_id": conv, "turn_idx": turn}
        for c in payload:
            out[c] = visible_value(reg, c)
        rows.append(out)
    state = (
        pd.DataFrame(rows, columns=["conv_id", "turn_idx"] + payload)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    dead_df = pd.DataFrame(dead)
    return OracleResult(state=state, dead_letters=dead_df, payload_cols=payload)
