"""Deterministic synthetic fixtures: seed transcripts + CDC event log.

Models the reference's change-batch JSON contract (test fixture
reorder-files/flowfile.json; parser ReorderFiles.kt:359-366) flattened to one
row per (target key, ordinal) with an explicit ``lsn`` total order. The
generated event mix covers every behavior the reference tests:

- duplicate keys with different lsn → last-writer-wins
  (dedup analogue RenameS3Utils.kt:52)
- swap/cycle moves within one batch (RenameS3UtilsTest.kt:100-121)
- cross-conversation moves, including ones that empty the source
  (ReorderFilesTest.kt:348-426) and partial moves (ReorderFilesTest.kt:429-492)
- keyless inserts → deterministic id synthesis
  (UUIDv7 fallback, ReorderFiles.kt:312-316, ReorderFilesTest.kt:298-316)
- out-of-order lsn delivery across micro-batches (engine-only hardening)
- additive schema evolution via ``extra`` + ``schema_version`` bump
  (opaque pass-through fields, ReorderFiles.kt:396-406)
- malformed keys → dead-letter route (PathSafety.kt:22-32 /
  failure relationship ReorderFiles.kt:416-418)

Everything is seeded (default 42) — no wall clock, no nondeterminism —
so replays are bit-for-bit reproducible (the golden-file test pattern of
CreateMetsBrowsingTest.kt:368-411 transposed to table state).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = [None, "search", "calculator", "browser", None, None]
WORDS = (
    "spark stream merge upsert turn batch lsn shuffle salt bucket "
    "snapshot commit epoch replay transcript agent tool kafka iceberg"
).split()
# NFC-normalizable sequences: 'e' + COMBINING ACUTE, 'a' + COMBINING RING
UNICODE_BITS = ["café", "åring", "plain"]

BASE_TS = dt.datetime(2024, 1, 1, 0, 0, 0)

EVENT_COLUMNS = [
    "lsn",
    "batch_id",
    "op",
    "conv_id",
    "turn_idx",
    "src_conv_id",
    "src_turn_idx",
    "role",
    "text",
    "tool",
    "ts",
    "extra",
    "schema_version",
]


def _text(rng: np.random.Generator, i: int) -> str:
    n = int(rng.integers(3, 12))
    ws = [WORDS[int(rng.integers(0, len(WORDS)))] for _ in range(n)]
    ws.append(UNICODE_BITS[i % len(UNICODE_BITS)])
    return " ".join(ws)


def make_seed_transcripts(
    n_convs: int = 40, max_turns: int = 12, seed: int = 42
) -> pd.DataFrame:
    """Seed state of the transcripts table (pre-existing conversations)."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_convs):
        conv = f"conv-{c:04d}"
        n_turns = int(rng.integers(1, max_turns + 1))
        for t in range(1, n_turns + 1):
            rows.append(
                {
                    "conv_id": conv,
                    "turn_idx": t,
                    "role": ROLES[t % len(ROLES)],
                    "text": _text(rng, c * 100 + t),
                    "tool": TOOLS[int(rng.integers(0, len(TOOLS)))],
                    "ts": BASE_TS + dt.timedelta(minutes=c * 60 + t),
                }
            )
    return pd.DataFrame(rows)


@dataclass
class EventLogConfig:
    n_batches: int = 8
    events_per_batch: int = 120
    seed: int = 42
    # fraction of events aimed at a small set of hot conversations (skew)
    hot_fraction: float = 0.3
    n_hot: int = 2
    include_moves: bool = True
    include_malformed: bool = True
    include_schema_evolution: bool = True
    # shuffle some lsns between adjacent batches (out-of-order delivery)
    out_of_order: bool = True
    extra_convs: int = 20  # new conversations inserted by the log


@dataclass
class GeneratedLog:
    batches: list[pd.DataFrame] = field(default_factory=list)

    def all_events(self) -> pd.DataFrame:
        return pd.concat(self.batches, ignore_index=True)


def make_event_log(
    seed_df: pd.DataFrame, cfg: EventLogConfig | None = None
) -> GeneratedLog:
    cfg = cfg or EventLogConfig()
    rng = np.random.default_rng(cfg.seed + 1)
    convs = sorted(seed_df["conv_id"].unique().tolist())
    hot = convs[: cfg.n_hot]
    # live turn tracking so moves reference plausible sources
    turns: dict[str, set[int]] = {
        c: set(g["turn_idx"].tolist()) for c, g in seed_df.groupby("conv_id")
    }
    new_convs = [f"conv-{len(convs) + i:04d}" for i in range(cfg.extra_convs)]
    all_convs = convs + new_convs
    for c in new_convs:
        turns[c] = set()

    lsn = 0
    batches: list[pd.DataFrame] = []
    for b in range(cfg.n_batches):
        batch_id = f"b{b:05d}"
        rows: list[dict] = []

        def ev(**kw) -> dict:
            nonlocal lsn
            lsn += 1
            base = {k: None for k in EVENT_COLUMNS}
            base.update(
                lsn=lsn,
                batch_id=batch_id,
                ts=BASE_TS + dt.timedelta(seconds=lsn),
                schema_version=1,
            )
            base.update(kw)
            return base

        def pick_conv() -> str:
            if rng.random() < cfg.hot_fraction:
                return hot[int(rng.integers(0, len(hot)))]
            return all_convs[int(rng.integers(0, len(all_convs)))]

        for i in range(cfg.events_per_batch):
            r = rng.random()
            conv = pick_conv()
            live = sorted(turns[conv])
            if r < 0.45 or not live:
                # insert (sometimes a duplicate-key pair for LWW coverage)
                t = int(rng.integers(1, 40))
                rows.append(
                    ev(
                        op="insert",
                        conv_id=conv,
                        turn_idx=t,
                        role=ROLES[int(rng.integers(0, 4))],
                        text=_text(rng, lsn),
                        tool=TOOLS[int(rng.integers(0, len(TOOLS)))],
                    )
                )
                turns[conv].add(t)
                if rng.random() < 0.15:  # LWW duplicate, later lsn wins
                    rows.append(
                        ev(op="insert", conv_id=conv, turn_idx=t,
                           role="assistant", text=_text(rng, lsn))
                    )
            elif r < 0.70:
                # partial update: only a subset of payload columns set
                t = live[int(rng.integers(0, len(live)))]
                which = rng.random()
                rows.append(
                    ev(
                        op="update",
                        conv_id=conv,
                        turn_idx=t,
                        text=_text(rng, lsn) if which < 0.6 else None,
                        tool="patched" if 0.3 < which < 0.8 else None,
                        role="tool" if which >= 0.8 else None,
                    )
                )
            elif r < 0.80:
                t = live[int(rng.integers(0, len(live)))]
                rows.append(ev(op="delete", conv_id=conv, turn_idx=t))
                turns[conv].discard(t)
            elif r < 0.92 and cfg.include_moves:
                # move: within- or cross-conversation
                src = conv
                dst = pick_conv() if rng.random() < 0.5 else conv
                t_src = live[int(rng.integers(0, len(live)))]
                t_dst = int(rng.integers(1, 40))
                rows.append(
                    ev(
                        op="move",
                        conv_id=dst,
                        turn_idx=t_dst,
                        src_conv_id=src,
                        src_turn_idx=t_src,
                    )
                )
                turns[src].discard(t_src)
                turns[dst].add(t_dst)
            else:
                # keyless insert → engine synthesizes the conversation id
                rows.append(
                    ev(
                        op="insert",
                        conv_id=None,
                        turn_idx=1,
                        role="user",
                        text=_text(rng, lsn),
                    )
                )

        # scripted coverage events, once per batch kind
        if cfg.include_moves and len(turns[hot[0]]) >= 2:
            a, bb = sorted(turns[hot[0]])[:2]
            # swap within one batch (RenameS3UtilsTest.kt:100 analogue)
            rows.append(
                ev(op="move", conv_id=hot[0], turn_idx=bb,
                   src_conv_id=hot[0], src_turn_idx=a)
            )
            rows.append(
                ev(op="move", conv_id=hot[0], turn_idx=a,
                   src_conv_id=hot[0], src_turn_idx=bb)
            )
        if cfg.include_malformed and b % 2 == 0:
            rows.append(
                ev(op="insert", conv_id="../evil", turn_idx=1, text="bad")
            )
            rows.append(ev(op="frobnicate", conv_id="conv-0001", turn_idx=1))
            rows.append(ev(op="update", conv_id=None, turn_idx=2, text="nokey"))
        if cfg.include_schema_evolution and b >= cfg.n_batches // 2:
            conv = pick_conv()
            rows.append(
                ev(
                    op="insert",
                    conv_id=conv,
                    turn_idx=int(rng.integers(40, 60)),
                    text=_text(rng, lsn),
                    extra={"language": "nob", "material_type": "avis"},
                    schema_version=2,
                )
            )
            turns[conv].add(rows[-1]["turn_idx"])

        df = pd.DataFrame(rows, columns=EVENT_COLUMNS)
        batches.append(df)

    if cfg.out_of_order and len(batches) >= 2:
        # swap a few lsns between adjacent batches: later batches carry
        # earlier lsns (delivery out of order w.r.t. the log sequence)
        rng2 = np.random.default_rng(cfg.seed + 2)
        for i in range(len(batches) - 1):
            a, b_ = batches[i], batches[i + 1]
            ia = int(rng2.integers(0, len(a)))
            ib = int(rng2.integers(0, len(b_)))
            la, lb = a.at[ia, "lsn"], b_.at[ib, "lsn"]
            a.at[ia, "lsn"], b_.at[ib, "lsn"] = lb, la

    return GeneratedLog(batches=batches)


def write_binlog_segments(events_df, out_dir: str) -> list[str]:
    """Lay a change-event DataFrame out as binlog segments: one parquet
    file per producer batch, lexicographic filenames in batch order, so a
    streaming file source consumes whole batches in sequence. Fixture
    construction (driver-side copy of a handful of small files) — kept out
    of catalog query bodies so those stay plan-only."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    stage_root = tempfile.mkdtemp(prefix="binlog_stage_")
    bids = [r[0] for r in events_df.select("batch_id").distinct().collect()]
    paths = []
    for bid in sorted(bids):
        stage = os.path.join(stage_root, f"stage-{bid}")
        events_df.filter(F.col("batch_id") == bid).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        src = glob.glob(os.path.join(stage, "*.parquet"))[0]
        dst = os.path.join(out_dir, f"{bid}.parquet")
        shutil.copy(src, dst)
        paths.append(dst)
    shutil.rmtree(stage_root, ignore_errors=True)
    return paths


def write_debezium_segments(
    events_df, out_dir: str, corrupt_lines: int = 0
) -> list[str]:
    """Lay a change-event DataFrame out as Debezium JSON-lines segments —
    one text file per producer batch — the wire shape a Kafka-connect
    file sink or a WAL-tailing sidecar would hand the engine.
    ``corrupt_lines`` appends that many non-JSON lines to the FIRST
    segment (a torn tail write) to prove corrupt input dead-letters
    instead of stalling the stream."""
    import glob
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from .sources import debezium

    os.makedirs(out_dir, exist_ok=True)
    stage_root = tempfile.mkdtemp(prefix="dbz_stage_")
    bids = [r[0] for r in events_df.select("batch_id").distinct().collect()]
    paths = []
    for i, bid in enumerate(sorted(bids)):
        stage = os.path.join(stage_root, f"stage-{bid}")
        debezium.to_debezium(
            events_df.filter(F.col("batch_id") == bid)
        ).coalesce(1).write.mode("overwrite").text(stage)
        src = glob.glob(os.path.join(stage, "*.txt"))[0]
        dst = os.path.join(out_dir, f"{bid}.jsonl")
        shutil.copy(src, dst)
        if i == 0 and corrupt_lines:
            with open(dst, "a") as f:
                for j in range(corrupt_lines):
                    f.write(f"corrupt line {j} not-json\n")
        paths.append(dst)
    shutil.rmtree(stage_root, ignore_errors=True)
    return paths


def atomic_append_segment(src: str, live_dir: str) -> str:
    """Append a binlog segment to a directory a stream is LIVE-listing:
    copy to a dot-prefixed name (invisible to Spark's file listing) and
    rename into place, so a trigger can never observe a torn, footer-less
    parquet file. The single shared implementation of this idiom — the
    continuous catalog query and the ProcessingTime tests must exercise
    the same append mechanics."""
    import os
    import shutil

    dst = os.path.join(live_dir, os.path.basename(src))
    tmp_name = os.path.join(live_dir, "." + os.path.basename(src) + ".tmp")
    shutil.copy(src, tmp_name)
    os.rename(tmp_name, dst)
    return dst


def wait_until(pred, what: str, timeout: float = 180.0, poll: float = 0.25) -> None:
    """Poll ``pred`` until true or raise — for waiting on a live stream's
    progress counters."""
    import time as _t

    deadline = _t.time() + timeout
    while _t.time() < deadline:
        if pred():
            return
        _t.sleep(poll)
    raise AssertionError(f"timed out waiting for {what}")


def write_event_log_parquet(log: GeneratedLog, out_dir: str) -> list[str]:
    """One parquet file per batch, lexicographically ordered filenames —
    the streaming file source consumes them in batch order."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    arrow_schema = pa.schema(
        [
            pa.field("lsn", pa.int64()),
            pa.field("batch_id", pa.string()),
            pa.field("op", pa.string()),
            pa.field("conv_id", pa.string()),
            pa.field("turn_idx", pa.int32()),
            pa.field("src_conv_id", pa.string()),
            pa.field("src_turn_idx", pa.int32()),
            pa.field("role", pa.string()),
            pa.field("text", pa.string()),
            pa.field("tool", pa.string()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("extra", pa.map_(pa.string(), pa.string())),
            pa.field("schema_version", pa.int32()),
        ]
    )
    for i, df in enumerate(log.batches):
        pdf = df.copy()
        pdf["extra"] = pdf["extra"].map(
            lambda m: list(m.items()) if isinstance(m, dict) else None
        )
        table = pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False)
        path = os.path.join(out_dir, f"batch-{i:05d}.parquet")
        pq.write_table(table, path)
        paths.append(path)
    return paths
