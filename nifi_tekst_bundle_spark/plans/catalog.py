"""Query catalog — the driver contract surface.

Each entry pairs a Spark implementation (built on the engine's operators)
with an equivalent ANSI SQL string DuckDB can run on the same parquet
tables; the driver compares row counts + schemas + order-insensitive value
hashes. Every computed column is aliased identically on both sides, and all
floating-point reductions use the same left-fold order on both engines so
values match bit-for-bit before rounding.

The CDC queries derive a deterministic change log from the ``events`` table
(pure column expressions, no RNG) and run it through the engine's
resolve → LWW register → visibility pipeline; the oracle replays the same
semantics as windowed/FILTERed SQL aggregation.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import html as hf
from ..functions import keys as kf
from ..functions import text as tf
from ..operators import dedup, lm, lww, resolve, similarity, transcript

CDC_PAYLOAD = ["role", "text", "tool"]


def _read(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# change-event derivation from the `events` table (same logic, both engines)
# --------------------------------------------------------------------------


def derive_change_events(
    spark: SparkSession, sf_dir: str, include_invalid: bool = False,
    include_moves: bool = False,
) -> DataFrame:
    """Deterministic change log derived from the ``events`` table.

    ``include_moves`` adds op='move' events (the reference's rename
    instructions, RenameInstruction.kt:3-6), all landing in the LAST batch
    (b04) so the pre-batch state they resolve against is the LWW fold of
    batches b00..b03. The moves variant decouples turn_idx from the batch
    number (turn = (event_id // 5) % 25 instead of event_id % 25 — the
    latter pins each batch to a fixed turn-residue class, which would make
    every move source unresolvable). Even movers move within their own
    conversation with src_turn = (turn+10) % 25 — a permutation whose
    5-cycles (t → t+10 → t+20 → t+5 → t+15 → t) generate swap/cycle
    chains whose source deletes must be suppressed
    (RenameS3Utils.kt:120-133); odd movers move cross-conversation from
    their neighbor's conversation (ReorderFilesTest.kt:348-426). Moves
    whose source is not visible pre-batch dead-letter
    (missing_move_source), like the reference's missing-file hard error.
    """
    ev = _read(spark, sf_dir, "events")
    turn = (
        (F.floor(F.col("event_id") / 5) % 25)
        if include_moves
        else (F.col("event_id") % 25)
    )
    is_move = (
        (F.col("event_type") == "click")
        & (F.col("user_id") % 3 == 0)
        & (F.col("user_id") % 7 != 0)
        & (F.col("event_id") % 5 == 4)
    ) if include_moves else F.lit(False)
    op = (
        F.when(is_move, F.lit("move"))
        .when(F.col("event_type") == "error", F.lit("delete"))
        .when(F.col("event_type") == "purchase", F.lit("update"))
        .otherwise(F.lit("insert"))
    )
    if include_invalid:
        op = F.when(
            (F.col("event_type") == "signup") & (F.col("value") < 20),
            F.lit("frobnicate"),
        ).otherwise(op)
    conv = F.when(
        (F.col("user_id") % 7 == 0)
        & (~F.col("event_type").isin("error", "purchase") if not include_invalid else F.lit(True)),
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0"))
    )
    src_conv = F.when(
        is_move,
        F.when(
            F.col("user_id") % 2 == 0,
            F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0")),
        ).otherwise(
            F.concat(
                F.lit("conv-"),
                F.lpad((F.col("user_id") - 1).cast("string"), 6, "0"),
            )
        ),
    )
    src_turn = F.when(
        is_move,
        F.when(
            F.col("user_id") % 2 == 0,
            ((turn + 10) % 25).cast("int"),
        ).otherwise(turn.cast("int")),
    )
    dec_text = F.concat(
        F.lit("v"),
        F.round(F.col("value"), 2).cast("decimal(18,2)").cast("string"),
    )
    return ev.select(
        (F.col("event_id") + 1).alias("lsn"),
        F.concat(F.lit("b"), F.lpad((F.col("event_id") % 5).cast("string"), 2, "0")).alias(
            "batch_id"
        ),
        op.alias("op"),
        conv.alias("conv_id"),
        turn.cast("int").alias("turn_idx"),
        src_conv.cast("string").alias("src_conv_id"),
        src_turn.cast("int").alias("src_turn_idx"),
        F.when(F.col("event_type") != "error", F.col("event_type")).alias("role"),
        F.when((F.col("event_type") != "error") & (F.col("value") > 50), dec_text).alias(
            "text"
        ),
        F.when(
            (F.col("event_type") != "error") & (F.col("value") > 100), F.lit("hot")
        ).alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(1).alias("schema_version"),
    )


_EV_SQL_VALID = """
  SELECT event_id + 1 AS lsn,
         'b' || lpad(CAST(event_id % 5 AS VARCHAR), 2, '0') AS batch_id,
         CASE WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'update'
              ELSE 'insert' END AS op,
         CASE WHEN user_id % 7 = 0 AND event_type NOT IN ('error','purchase')
              THEN NULL
              ELSE 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') END AS conv_id,
         CAST(event_id % 25 AS INT) AS turn_idx,
         CASE WHEN event_type <> 'error' THEN event_type END AS role,
         CASE WHEN event_type <> 'error' AND value > 50
              THEN 'v' || CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS VARCHAR) END AS text,
         CASE WHEN event_type <> 'error' AND value > 100 THEN 'hot' END AS tool
  FROM events
"""

_EV_SQL_INVALID = """
  SELECT event_id + 1 AS lsn,
         CASE WHEN event_type = 'signup' AND value < 20 THEN 'frobnicate'
              WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'update'
              ELSE 'insert' END AS op,
         CASE WHEN user_id % 7 = 0 THEN NULL
              ELSE 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') END AS conv_id
  FROM events
"""


def _lww_agg_sql(payload: list[str]) -> str:
    cols = []
    for c in payload:
        cols.append(
            f"coalesce(max(lsn) FILTER (WHERE op <> 'delete' AND {c} IS NOT NULL), -1) AS l_{c},\n"
            f"    arg_max({c}, lsn) FILTER (WHERE op <> 'delete' AND {c} IS NOT NULL) AS v_{c}"
        )
    agg = ",\n    ".join(cols)
    vis = ",\n  ".join(
        f"CASE WHEN l_{c} > ldel THEN v_{c} END AS {c}" for c in payload
    )
    return agg, vis


_AGG, _VIS = _lww_agg_sql(CDC_PAYLOAD)

CDC_FINAL_STATE_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool
  FROM ev
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM ev2 GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  {_VIS}
FROM agg WHERE lup > ldel
"""


def q_cdc_lww_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = derive_change_events(spark, sf_dir)
    good, _dead = resolve.validate(events, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    regs = lww.batch_registers(normalized, CDC_PAYLOAD)
    return lww.visible(regs, CDC_PAYLOAD)


def q_cdc_streaming_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as q_cdc_lww_final_state but through the full streaming
    path: event files → checkpointed stream → fenced LakeTable commits →
    visible table read. Proves the streaming engine against a SQL oracle."""
    from ..fixtures import write_binlog_segments
    from ..streaming import runner
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir).cache()
    tmp = tempfile.mkdtemp(prefix="cdc_stream_")
    flat = os.path.join(tmp, "flat")
    write_binlog_segments(events, flat)

    table = LakeTable.create(spark, os.path.join(tmp, "table"),
                             payload_cols=CDC_PAYLOAD, n_buckets=8)
    runner.run_to_completion(
        spark, flat, table, os.path.join(tmp, "ckpt"), run_id="catalog",
        max_files_per_trigger=2,
    )
    events.unpersist()
    return table.visible(spark)


_EV_SQL_MOVES = """
  SELECT event_id + 1 AS lsn,
         'b' || lpad(CAST(event_id % 5 AS VARCHAR), 2, '0') AS batch_id,
         CASE WHEN event_type = 'click' AND user_id % 3 = 0
                   AND user_id % 7 <> 0 AND event_id % 5 = 4 THEN 'move'
              WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'update'
              ELSE 'insert' END AS op,
         CASE WHEN user_id % 7 = 0 AND event_type NOT IN ('error','purchase')
              THEN NULL
              ELSE 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') END AS conv_id,
         CAST((event_id // 5) % 25 AS INT) AS turn_idx,
         CASE WHEN event_type = 'click' AND user_id % 3 = 0
                   AND user_id % 7 <> 0 AND event_id % 5 = 4 THEN
           CASE WHEN user_id % 2 = 0
                THEN 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0')
                ELSE 'conv-' || lpad(CAST(user_id - 1 AS VARCHAR), 6, '0') END
         END AS src_conv_id,
         CASE WHEN event_type = 'click' AND user_id % 3 = 0
                   AND user_id % 7 <> 0 AND event_id % 5 = 4 THEN
           CASE WHEN user_id % 2 = 0
                THEN CAST(((event_id // 5) % 25 + 10) % 25 AS INT)
                ELSE CAST((event_id // 5) % 25 AS INT) END
         END AS src_turn_idx,
         CASE WHEN event_type <> 'error' THEN event_type END AS role,
         CASE WHEN event_type <> 'error' AND value > 50
              THEN 'v' || CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS VARCHAR) END AS text,
         CASE WHEN event_type <> 'error' AND value > 100 THEN 'hot' END AS tool
  FROM events
"""

# The move-batch replay in SQL: pre-batch visible state = LWW fold of the
# move-free batches (b00..b03); moves resolve source payloads against it
# (inner join — unresolvable moves dead-letter out, ReorderFiles.kt:150-184),
# expand into target upserts (new-wins column merge) plus source deletes
# suppressed when the source key is also an upsert target of the same batch
# (swap/cycle preservation, RenameS3Utils.kt:120-133), then everything folds
# through the same per-key, per-column LWW registers as the engine.
_MOVES_CTES = f"""ev AS ({_EV_SQL_MOVES}),
ev2 AS (
  SELECT lsn, batch_id, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, src_conv_id, src_turn_idx, role, text, tool
  FROM ev
),
pre_agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM ev2 WHERE batch_id < 'b04' GROUP BY conv_id, turn_idx
),
pre AS (
  SELECT conv_id, turn_idx, {_VIS}
  FROM pre_agg WHERE lup > ldel
),
mres AS (
  SELECT m.lsn, m.conv_id, m.turn_idx,
         coalesce(m.role, p.role) AS role,
         coalesce(m.text, p.text) AS text,
         coalesce(m.tool, p.tool) AS tool,
         m.src_conv_id, m.src_turn_idx
  FROM ev2 m JOIN pre p
    ON p.conv_id = m.src_conv_id AND p.turn_idx = m.src_turn_idx
  WHERE m.batch_id = 'b04' AND m.op = 'move'
),
targets AS (
  SELECT conv_id, turn_idx FROM ev2
  WHERE batch_id = 'b04' AND op IN ('insert', 'update')
  UNION
  SELECT conv_id, turn_idx FROM mres
),
src_del AS (
  SELECT s.lsn, s.src_conv_id AS conv_id, s.src_turn_idx AS turn_idx
  FROM mres s
  WHERE NOT EXISTS (
    SELECT 1 FROM targets t
    WHERE t.conv_id = s.src_conv_id AND t.turn_idx = s.src_turn_idx)
),
norm AS (
  SELECT lsn, op, conv_id, turn_idx, role, text, tool
  FROM ev2 WHERE op <> 'move'
  UNION ALL
  SELECT lsn, 'update' AS op, conv_id, turn_idx, role, text, tool FROM mres
  UNION ALL
  SELECT lsn, 'delete' AS op, conv_id, turn_idx,
         NULL AS role, NULL AS text, NULL AS tool
  FROM src_del
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM norm GROUP BY conv_id, turn_idx
)"""

CDC_MOVES_SQL = f"""
WITH {_MOVES_CTES}
SELECT conv_id, turn_idx, {_VIS} FROM agg WHERE lup > ldel
"""


def q_cdc_moves_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hardest-tested semantics under the DuckDB oracle:
    swap/cycle moves (RenameS3UtilsTest.kt:100-274), cross-conversation
    moves (ReorderFilesTest.kt:348-426), pre-batch-state resolution
    (ReorderFiles.kt:150-184) and source-delete suppression."""
    from ..operators.apply import apply_derived_log

    # spread the single-row-group test parquet before the multi-pass apply
    # (the per-batch loop reads the derivation several times; without this
    # every pass scans on ONE task — same rationale as q_docs_minhash_sig)
    events = derive_change_events(spark, sf_dir, include_moves=True).repartition(
        spark.sparkContext.defaultParallelism
    )
    good, _dead = resolve.validate(events, [])
    return apply_derived_log(spark, good, CDC_PAYLOAD)


def q_cdc_moves_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The move semantics through the FULL production stack: binlog
    segments → checkpointed stream → per-batch fenced LakeTable commits
    (move batches keep their boundary; the table supplies the pre-batch
    visible state via bucket-pruned reads) → visible table. Same oracle as
    cdc_moves_final_state, so the streaming+table move path gets its own
    hard correctness row instead of pytest-only coverage."""
    from ..fixtures import write_binlog_segments
    from ..streaming import runner
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir, include_moves=True).cache()
    tmp = tempfile.mkdtemp(prefix="cdc_moves_stream_")
    flat = os.path.join(tmp, "flat")
    write_binlog_segments(events, flat)
    table = LakeTable.create(spark, os.path.join(tmp, "table"),
                             payload_cols=CDC_PAYLOAD, n_buckets=8)
    runner.run_to_completion(
        spark, flat, table, os.path.join(tmp, "ckpt"), run_id="catalog-moves",
        max_files_per_trigger=1,
    )
    events.unpersist()
    return table.visible(spark)


CDC_DEAD_LETTER_SQL = f"""
WITH ev AS ({_EV_SQL_INVALID}),
classified AS (
  SELECT CASE
    WHEN op NOT IN ('insert','update','delete','move') THEN 'bad_op'
    WHEN conv_id IS NULL AND op <> 'insert' THEN 'missing_key'
    ELSE NULL END AS reason
  FROM ev
)
SELECT reason, count(*) AS n FROM classified WHERE reason IS NOT NULL GROUP BY reason
"""


def q_cdc_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = derive_change_events(spark, sf_dir, include_invalid=True)
    _good, dead = resolve.validate(events, [])
    return dead.groupBy("reason").agg(F.count("*").alias("n"))


# Dead-letter replay after an upstream fix: the 'frobnicate' op (a producer
# renaming bug by construction) is aliased back to 'update', repaired rows
# re-enter through the FULL validator (rows still missing their key stay
# dead), and recovered events fold into the final state at their original
# lsns. The oracle replays the same repair + filter + LWW fold.
_EV_SQL_INVALID_FULL = """
  SELECT event_id + 1 AS lsn,
         CASE WHEN event_type = 'signup' AND value < 20 THEN 'frobnicate'
              WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'update'
              ELSE 'insert' END AS op,
         CASE WHEN user_id % 7 = 0 THEN NULL
              ELSE 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') END AS conv_id,
         CAST(event_id % 25 AS INT) AS turn_idx,
         CASE WHEN event_type <> 'error' THEN event_type END AS role,
         CASE WHEN event_type <> 'error' AND value > 50
              THEN 'v' || CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS VARCHAR) END AS text,
         CASE WHEN event_type <> 'error' AND value > 100 THEN 'hot' END AS tool
  FROM events
"""

CDC_DEAD_LETTER_REPLAY_SQL = f"""
WITH raw AS ({_EV_SQL_INVALID_FULL}),
rep AS (
  SELECT lsn, CASE WHEN op = 'frobnicate' THEN 'update' ELSE op END AS op,
         conv_id, turn_idx, role, text, tool
  FROM raw
),
ok AS (
  SELECT * FROM rep
  WHERE op IN ('insert','update','delete')
    AND (conv_id IS NOT NULL OR op = 'insert')
    AND turn_idx IS NOT NULL
),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool
  FROM ok
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM ev2 GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  {_VIS}
FROM agg WHERE lup > ldel
"""


def q_cdc_dead_letter_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final state after draining the dead-letter store through a declared
    repair (resolve.repair_dead_letters): op alias frobnicate→update, full
    re-validation, recovered events joining the fold at their ORIGINAL
    lsns — so the result differs from cdc_lww_final_state exactly by the
    events the producer bug had poisoned, and rows whose key is still
    missing stay dead through the replay."""
    events = derive_change_events(spark, sf_dir, include_invalid=True)
    good, dead = resolve.validate(events, [])
    recovered, _still_dead = resolve.repair_dead_letters(
        dead, op_aliases={"frobnicate": "update"}
    )
    allg = good.unionByName(recovered).select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    return lww.visible(lww.batch_registers(allg, CDC_PAYLOAD), CDC_PAYLOAD)


# Sharded-binlog deployment: the SAME change log arriving as three
# hash-routed source shards, merged under the interleaved global order
# (sources/shards.py). Keys are routed by conv_id (NULL-key inserts by
# their own lsn — each is a singleton key), so per-key order is per-shard
# order and the merged fold reproduces the source state; synthesized ids
# derive from the GLOBAL lsn, which the oracle replicates.
CDC_MULTI_SHARD_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
sh AS (
  SELECT *,
    CAST(('0x' || substr(md5(coalesce(conv_id, CAST(lsn AS VARCHAR))), 1, 15))::INT64 % 3 AS INT) AS shard
  FROM ev
),
g AS (
  SELECT lsn * 3 + shard AS lsn, op, conv_id, turn_idx, role, text, tool
  FROM sh
),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool
  FROM g
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM ev2 GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  {_VIS}
FROM agg WHERE lup > ldel
"""


def q_cdc_multi_shard_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source CDC: the change log split into three hash-routed
    shards (each keeping only its own monotone positions), re-merged by
    sources.shards.merge_shard_logs — a pure narrow interleave, no
    window/renumber/shuffle — then the standard validate → LWW fold.
    Proves the sharded deployment reproduces the single-stream state
    under per-key shard routing (non-synthesized keys bit-identical —
    pinned by test_multi_shard_merge_matches_single_stream)."""
    from ..sources.shards import merge_shard_logs

    events = derive_change_events(spark, sf_dir)
    route = F.pmod(
        dedup.hash64(
            F.coalesce(F.col("conv_id"), F.col("lsn").cast("string")),
            "oracle",
        ),
        F.lit(3),
    ).cast("int")
    tagged = events.withColumn("_shard", route)
    shard_dfs = [
        (i, tagged.filter(F.col("_shard") == i).drop("_shard"))
        for i in range(3)
    ]
    merged = merge_shard_logs(shard_dfs, n_shards=3)
    good, _dead = resolve.validate(merged, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    return lww.visible(lww.batch_registers(normalized, CDC_PAYLOAD), CDC_PAYLOAD)


CDC_ID_SYNTHESIS_SQL = f"""
WITH ev AS ({_EV_SQL_VALID})
SELECT lsn, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0') AS conv_id
FROM ev WHERE conv_id IS NULL AND op = 'insert'
"""


def q_cdc_id_synthesis(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = derive_change_events(spark, sf_dir)
    good, _ = resolve.validate(events, [])
    return good.filter(F.col("conv_id").rlike("^conv-auto-")).select(
        "lsn", "conv_id"
    )


# P12 / additive schema evolution under the oracle: version-2 events carry
# promoted keys in the ``extra`` map (the reference's opaque pass-through
# fields, ReorderFiles.kt:396-406 / flowfile.json:3-7); the engine promotes
# them to first-class LWW columns via the same validate() path merge_batch
# uses, and the oracle folds them through the identical register machinery.
_EVOLVED_PAYLOAD = ["role", "text", "tool", "language", "material_type"]
_AGG_EVO, _VIS_EVO = _lww_agg_sql(_EVOLVED_PAYLOAD)

CDC_EVOLUTION_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool,
         CASE WHEN op <> 'delete' AND lsn % 3 = 0
              THEN 'lang-' || CAST(lsn % 4 AS VARCHAR) END AS language,
         CASE WHEN op <> 'delete' AND lsn % 3 = 0
              THEN CASE WHEN lsn % 6 = 0 THEN 'avis' ELSE 'bok' END
         END AS material_type
  FROM ev
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG_EVO}
  FROM ev2 GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx, {_VIS_EVO} FROM agg WHERE lup > ldel
"""


def q_cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..schemas import promoted_columns

    base = derive_change_events(spark, sf_dir)
    has_extra = (F.col("op") != "delete") & (F.col("lsn") % 3 == 0)
    events = base.withColumn(
        "extra",
        F.when(
            has_extra,
            F.create_map(
                F.lit("language"),
                F.concat(F.lit("lang-"), (F.col("lsn") % 4).cast("string")),
                F.lit("material_type"),
                F.when(F.col("lsn") % 6 == 0, F.lit("avis")).otherwise(F.lit("bok")),
            ),
        ),
    ).withColumn(
        "schema_version", F.when(has_extra, F.lit(2)).otherwise(F.lit(1))
    )
    promoted = list(promoted_columns(2))
    good, _dead = resolve.validate(events, promoted)
    pay = CDC_PAYLOAD + promoted
    normalized = good.select("lsn", "batch_id", "op", "conv_id", "turn_idx", *pay)
    return lww.visible(lww.batch_registers(normalized, pay), pay)


# Event-time windowed aggregation (the streaming metrics shape in batch
# form): Spark's window() and DuckDB's time_bucket agree because both
# align 5-minute buckets on epoch-multiple boundaries.
EVENTS_TIME_WINDOWS_SQL = """
SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start, event_type,
       count(*) AS n_events
FROM events GROUP BY 1, 2
"""


def q_events_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n_events"
        )
    )


# Ingest-rate anomaly detection (pipeline health monitoring): hourly
# per-type event counts z-scored against that type's own window
# distribution. All statistics fold EXACT integer sums (count, sum(c),
# sum(c*c) are bigints — no float-accumulation order sensitivity), so
# mean/variance/z are deterministic scalar double ops both engines
# reproduce bit-for-bit. One windowed count + one type-keyed stats agg
# broadcast back — output is window-cardinality, never event-sized.
EVENTS_RATE_ANOMALY_SQL = """
WITH w AS (
  SELECT event_type, date_trunc('hour', ts) AS window_start,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(n_events) AS BIGINT) AS s,
         CAST(sum(n_events * n_events) AS BIGINT) AS ss
  FROM w GROUP BY event_type
)
SELECT event_type, window_start, n_events,
  round(z, 6) AS z, abs(z) >= 2.0 AS is_anomaly
FROM (
  SELECT w.event_type, w.window_start, w.n_events,
    CASE WHEN ss - CAST(s AS DOUBLE) * s / n_windows > 0
         THEN (w.n_events - CAST(s AS DOUBLE) / n_windows)
              / sqrt((ss - CAST(s AS DOUBLE) * s / n_windows)
                     / (n_windows - 1))
         ELSE 0.0 END AS z
  FROM w JOIN stats USING (event_type)
  WHERE n_windows >= 3
)
"""


def q_events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly ingest-rate z-scores per event type (the consumer-side
    "did the producer stall or flood" monitor). Exact-integer moment
    sums make the float math deterministic; the stats table is
    type-cardinality (broadcast), the output window-cardinality."""
    ev = _read(spark, sf_dir, "events")
    w = (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("window_start")
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
    )
    stats = w.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_windows"),
        F.sum("n_events").cast("bigint").alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("bigint").alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_windows")
    var_num = (
        F.col("ss") - F.col("s").cast("double") * F.col("s") / F.col("n_windows")
    )
    # zero-variance types (perfectly steady rate) get z = 0, never a
    # divide-by-zero (ANSI mode errors on double x/0 too)
    z = F.when(
        var_num > 0,
        (F.col("n_events") - mean)
        / F.sqrt(var_num / (F.col("n_windows") - 1)),
    ).otherwise(F.lit(0.0))
    return (
        w.join(F.broadcast(stats), "event_type")
        .filter(F.col("n_windows") >= 3)
        .select(
            "event_type",
            "window_start",
            "n_events",
            F.round(z, 6).alias("z"),
            (F.abs(z) >= 2.0).alias("is_anomaly"),
        )
    )


CDC_LINEAGE_SQL = f"""
WITH ev AS ({_EV_SQL_VALID})
SELECT batch_id,
       count(*) AS n_events,
       count(*) FILTER (WHERE op <> 'delete') AS upserts,
       count(*) FILTER (WHERE op = 'delete') AS deletes
FROM ev GROUP BY batch_id
"""


def q_cdc_lineage_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = derive_change_events(spark, sf_dir)
    return events.groupBy("batch_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("op") != "delete", 1).otherwise(0)).alias("upserts"),
        F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("deletes"),
    )


# --------------------------------------------------------------------------
# relational operators (A1-A7 shapes) over the TPC-H-ish tables
# --------------------------------------------------------------------------

Q1_SQL = """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


TOP_PARTS_SQL = """
WITH rev AS (
  SELECT l_partkey,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT p.p_partkey, p.p_name, rev.revenue,
         CAST(row_number() OVER (ORDER BY rev.revenue DESC, p.p_partkey ASC) AS INT) AS rank
  FROM rev JOIN part p ON p.p_partkey = rev.l_partkey
)
SELECT p_partkey, p_name, revenue, rank FROM ranked WHERE rank <= 10
"""


def q_top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _read(spark, sf_dir, "lineitem")
    part = _read(spark, sf_dir, "part")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    rev = li.groupBy("l_partkey").agg(
        F.sum(price * (F.lit(1) - disc)).cast("double").alias("revenue")
    )
    j = rev.join(F.broadcast(part), rev.l_partkey == part.p_partkey)
    w = Window.orderBy(F.col("revenue").desc(), F.col("p_partkey").asc())
    return (
        j.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("p_partkey", "p_name", "revenue", "rank")
    )


VALIDATION_AGG_SQL = """
SELECT user_id,
  count(*) AS n_events,
  count(*) FILTER (WHERE event_type = 'error') AS n_errors,
  CAST(min(CASE WHEN event_type = 'error' THEN 0 ELSE 1 END) AS INT) AS all_valid,
  coalesce(string_agg('e' || CAST(event_id AS VARCHAR), '; ' ORDER BY event_id)
           FILTER (WHERE event_type = 'error'), '') AS error_log
FROM events GROUP BY user_id
"""


def q_validation_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 (Jhove.kt:490-516): fold per-row statuses into a batch verdict —
    bool_and as min(int), error concatenation in deterministic order."""
    ev = _read(spark, sf_dir, "events")
    err_struct = F.when(
        F.col("event_type") == "error",
        F.struct(
            F.col("event_id").alias("k"),
            F.concat(F.lit("e"), F.col("event_id").cast("string")).alias("m"),
        ),
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("n_errors"),
        F.min(F.when(F.col("event_type") == "error", 0).otherwise(1))
        .cast("int")
        .alias("all_valid"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list(err_struct)), lambda x: x["m"]),
            "; ",
        ).alias("error_log"),
    )


ANTI_JOIN_SQL = """
SELECT DISTINCT user_id FROM events e
WHERE NOT EXISTS (
  SELECT 1 FROM events p WHERE p.user_id = e.user_id AND p.event_type = 'purchase')
"""


def q_anti_join_cleanup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O7 (ReorderFiles.kt:200-240): anti-join set difference — users with
    activity but no surviving 'purchase' (the emptied-source shape)."""
    ev = _read(spark, sf_dir, "events")
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return ev.select("user_id").distinct().join(buyers, "user_id", "left_anti")


UNION_DISTINCT_SQL = """
SELECT user_id FROM events WHERE event_type = 'error'
UNION
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 (ReorderFiles.kt:385-388): (targets + sources).toSet()."""
    ev = _read(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "error").select("user_id")
    b = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return a.union(b).distinct()


CONV_FOLD_SQL = """
SELECT user_id, count(*) AS n_events,
  string_agg(event_type, '|' ORDER BY event_id) AS chain,
  md5(string_agg(event_type, '|' ORDER BY event_id)) AS chain_md5
FROM events GROUP BY user_id
"""


def q_conv_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 (CreateMetsBrowsing.kt:161-312): per-item ordered fold into one
    deterministic document + checksum — the METS render as groupBy +
    sort_array(collect_list(struct)) + md5."""
    ev = _read(spark, sf_dir, "events")
    chain = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("event_id").alias("k"),
                                        F.col("event_type").alias("v")))
            ),
            lambda x: x["v"],
        ),
        "|",
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        chain.alias("chain"),
        F.md5(chain.cast("binary")).alias("chain_md5"),
    )


WINDOW_LWW_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, event_id,
         CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS DOUBLE) AS v,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_type, event_id AS last_event_id, v AS last_value
FROM ranked WHERE rn = 1
"""


def q_window_lww(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: the explicit last-writer-wins window (row_number by lsn desc)."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("last_event_id"),
            F.round(F.col("value"), 2).cast("decimal(18,2)").cast("double").alias("last_value"),
        )
    )


FIRST_MATCH_SQL = """
SELECT user_id, min(event_id) AS first_event_id,
       arg_min(event_type, event_id) AS first_event_type
FROM events GROUP BY user_id
"""


def q_first_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 (JhoveParser.kt:130): take-first-hit per group."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.min("event_id").alias("first_event_id"),
        F.min_by("event_type", "event_id").alias("first_event_type"),
    )


ROUTING_SQL = """
SELECT CASE WHEN event_type = 'error' THEN 'failure'
            WHEN value >= 100 THEN 'success'
            ELSE 'well-formed' END AS route,
       count(*) AS n,
       CAST(SUM(CAST(round(value, 2) AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1
"""


def q_events_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: multi-way relationship routing as a route column + per-route agg."""
    ev = _read(spark, sf_dir, "events")
    route = (
        F.when(F.col("event_type") == "error", "failure")
        .when(F.col("value") >= 100, "success")
        .otherwise("well-formed")
    )
    return ev.groupBy(route.alias("route")).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value"), 2).cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
    )


RATIONAL_SQL = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice / l_quantity AS unit_price
FROM lineitem WHERE l_quantity > 0
"""


def q_rational_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 shape (JhoveParser.kt:55-67): numerator/denominator projection."""
    li = _read(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 0).select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )


RATIONAL_DECIMAL_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(27,10))
                       / CAST(l_quantity AS DECIMAL(10,0)), 10)
            AS DECIMAL(38,10)) AS VARCHAR) AS unit_price_dec
FROM lineitem WHERE l_quantity > 0
"""


def q_rational_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 exact semantics (JhoveParser.kt:55-67): rational → decimal at
    scale 10, HALF_UP. Compared as the decimal's full-scale string
    rendering so every digit of the HALF_UP quotient is oracle-checked
    bit-for-bit (a double compare would hide scale/rounding divergence;
    pandas degrades DECIMAL columns inconsistently across engines)."""
    li = _read(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_quantity") > 0).select(
        "l_orderkey",
        "l_linenumber",
        kf.rational_decimal(F.col("l_extendedprice"), F.col("l_quantity"))
        .cast("string")
        .alias("unit_price_dec"),
    )


# A1 at full depth (CreateMetsBrowsing.kt:161-312 + serializer
# MetsBrowsingSerializer.kt:280-412): per-conversation ordered fold of the
# CDC final state into ONE deterministically rendered document + checksum —
# the transcripts analogue of the METS render with its golden-file equality
# test (CreateMetsBrowsingTest.kt:368-411).
CONV_DOCUMENT_SQL = f"""
SELECT conv_id, count(*) AS n_turns,
  string_agg('[' || lpad(CAST(turn_idx AS VARCHAR), 5, '0') || '] ' ||
             coalesce(role, '') || '|' || coalesce(text, '') || '|' ||
             coalesce(tool, ''), chr(10) ORDER BY turn_idx) AS doc,
  md5(string_agg('[' || lpad(CAST(turn_idx AS VARCHAR), 5, '0') || '] ' ||
             coalesce(role, '') || '|' || coalesce(text, '') || '|' ||
             coalesce(tool, ''), chr(10) ORDER BY turn_idx)) AS doc_md5
FROM ({CDC_FINAL_STATE_SQL}) final
GROUP BY conv_id
"""


def _render_documents(final: DataFrame) -> DataFrame:
    st = F.struct(
        F.col("turn_idx").alias("t"),
        F.col("role").alias("r"),
        F.col("text").alias("x"),
        F.col("tool").alias("o"),
    )
    # sort_array on structs orders by the leading field (turn_idx — unique
    # per conversation), giving the reference's sorted-listing determinism
    # (CreateMetsBrowsing.kt:222-228); the render is a pure JVM-side
    # transform, zero-padded like the page labels (ReorderFiles.kt:136)
    doc = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(st)),
            lambda s: F.concat(
                F.lit("["),
                F.lpad(s["t"].cast("string"), 5, "0"),
                F.lit("] "),
                F.coalesce(s["r"], F.lit("")),
                F.lit("|"),
                F.coalesce(s["x"], F.lit("")),
                F.lit("|"),
                F.coalesce(s["o"], F.lit("")),
            ),
        ),
        "\n",
    )
    return final.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        doc.alias("doc"),
        F.md5(doc.cast("binary")).alias("doc_md5"),
    )


def q_conv_document(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _render_documents(q_cdc_lww_final_state(spark, sf_dir))


def q_conv_document_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental re-render under CDC — the reference's operational shape
    (CreateMetsBrowsing regenerates an item's METS when that item's files
    change, never the whole corpus): renders built over the pre-b04 state
    pass through a conv_id anti-join untouched; only conversations batch
    b04 touches are re-folded and re-rendered from the new state. The
    oracle is the FULL re-render of the final state, so the green row
    proves incremental ≡ rebuild. At 10^10 events per-epoch render cost is
    ∝ changed conversations (epoch-sized, broadcast-eligible id joins)."""
    events = derive_change_events(spark, sf_dir)
    good, _dead = resolve.validate(events, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    old_state = lww.visible(
        lww.batch_registers(
            normalized.filter(F.col("batch_id") != "b04"), CDC_PAYLOAD
        ),
        CDC_PAYLOAD,
    )
    new_state = lww.visible(
        lww.batch_registers(normalized, CDC_PAYLOAD), CDC_PAYLOAD
    )
    changed = (
        normalized.filter(F.col("batch_id") == "b04")
        .select("conv_id")
        .distinct()
    )
    kept = _render_documents(old_state).join(changed, "conv_id", "left_anti")
    fresh = _render_documents(
        new_state.join(changed, "conv_id", "left_semi")
    )
    return kept.unionByName(fresh)


KEY_PROJECTION_SQL = r"""
WITH named AS (
  SELECT doc_id,
    'tekst_' || CAST(doc_id AS VARCHAR) || '_' ||
      lpad(CAST(doc_id % 40 + 1 AS VARCHAR), 5, '0') || '.jp2' AS fname
  FROM documents
)
SELECT doc_id, fname,
  regexp_extract(fname, '^(.+)_\d+\.(jp2|tif|tiff)$', 1) AS item_id,
  CAST(regexp_extract(fname, '_(\d+)\.(jp2|tif|tiff)$', 1) AS INT) AS page_no,
  regexp_replace(fname, '\.(jp2|tiff)$', '.tif') AS norm_name,
  'URN:NBN:no-nb_' || regexp_extract(fname, '^(.+)_\d+\.(jp2|tif|tiff)$', 1) AS urn
FROM named
"""


def q_key_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10/O6/P5/P7/P8: the filename-key round trip."""
    docs = _read(spark, sf_dir, "documents")
    fname = F.concat(
        F.lit("tekst_"),
        F.col("doc_id").cast("string"),
        F.lit("_"),
        F.lpad((F.col("doc_id") % 40 + 1).cast("string"), 5, "0"),
        F.lit(".jp2"),
    )
    out = docs.select(F.col("doc_id"), fname.alias("fname"))
    return out.select(
        "doc_id",
        "fname",
        kf.extract_id_from_filename(F.col("fname")).alias("item_id"),
        kf.extract_page_no(F.col("fname")).alias("page_no"),
        kf.normalize_extension(F.col("fname")).alias("norm_name"),
        kf.urn(kf.extract_id_from_filename(F.col("fname"))).alias("urn"),
    )


# P1/P2/P3 under the oracle (GenerateJsonFromProps.kt): dotted-path nested
# construction with array indexing, then the recursive new-wins merge —
# which is RFC-7386 json_merge_patch when the new side omits its nulls
# (Spark's to_json drops null fields, so the engine's merge_structs
# coalesce overlay and DuckDB's json_merge_patch agree). Fields are
# extracted back out so the comparison is key-order independent.
JSON_PROPS_SQL = """
WITH built AS (
  SELECT event_id,
    json_object('meta', json_object('user', CAST(user_id AS VARCHAR),
                                    'type', event_type),
                'vals', json_array(CAST(event_id AS VARCHAR), 'x')) AS old_json,
    CASE WHEN value > 50
      THEN json_object('meta', json_object('type', upper(event_type),
                                           'flag', 'hot'),
                       'vals', json_array(event_type))
      ELSE json_object('meta', json_object('type', upper(event_type)),
                       'vals', json_array(event_type)) END AS new_json
  FROM events
),
merged AS (SELECT event_id, json_merge_patch(old_json, new_json) AS m FROM built)
SELECT event_id,
  json_extract_string(m, '$.meta.user') AS m_user,
  json_extract_string(m, '$.meta.type') AS m_type,
  json_extract_string(m, '$.meta.flag') AS m_flag,
  json_extract_string(m, '$.vals[0]') AS v0,
  json_extract_string(m, '$.vals[1]') AS v1
FROM merged
"""


def q_json_props_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build two JSON documents from dotted property paths (P1/P2), merge
    them under the new-wins recursive rule (P3: objects recurse, scalars
    and arrays overwritten when new is non-null, old survives where new is
    silent), extract the merged fields. m_user proves old-side survival,
    m_type new-wins, m_flag the conditional-null path, v0/v1 whole-array
    overwrite (GenerateJsonFromPropsTest.kt:180+)."""
    from pyspark.sql import types as T

    from ..functions import json_props as jp

    ev = _read(spark, sf_dir, "events").repartition(
        spark.sparkContext.defaultParallelism
    )
    old_json = jp.build_nested_json(
        {
            "meta.user": F.col("user_id").cast("string"),
            "meta.type": F.col("event_type"),
            "vals[0]": F.col("event_id").cast("string"),
            "vals[1]": F.lit("x"),
        }
    )
    new_json = jp.build_nested_json(
        {
            "meta.type": F.upper(F.col("event_type")),
            "meta.flag": F.when(F.col("value") > 50, F.lit("hot")),
            "vals[0]": F.col("event_type"),
        }
    )
    schema = T.StructType(
        [
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("user", T.StringType()),
                        T.StructField("type", T.StringType()),
                        T.StructField("flag", T.StringType()),
                    ]
                ),
            ),
            T.StructField("vals", T.ArrayType(T.StringType())),
        ]
    )
    df = ev.select(
        "event_id", old_json.alias("old_json"), new_json.alias("new_json")
    )
    df = jp.merge_json_columns(df, "old_json", "new_json", schema, "m")
    # one from_json in its own projection, then struct-field extraction —
    # five get_json_object calls each re-parsed the merged document per
    # row (measured 3.7 s vs 0.8 s at sf0.1); the named struct is
    # multi-referenced and non-cheap, so CollapseProject keeps the parse
    # single-evaluation
    p = df.select("event_id", F.from_json("m", schema).alias("_m"))
    x = F.col("_m")
    return p.select(
        "event_id",
        x["meta"]["user"].alias("m_user"),
        x["meta"]["type"].alias("m_type"),
        x["meta"]["flag"].alias("m_flag"),
        F.try_element_at(x["vals"], F.lit(1)).alias("v0"),
        F.try_element_at(x["vals"], F.lit(2)).alias("v1"),
    )


# --------------------------------------------------------------------------
# training-data pipeline: documents (dedup / text analysis)
# --------------------------------------------------------------------------

DOCS_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, min(doc_id) AS doc_id, count(*) AS dup_count
FROM documents GROUP BY md5(text)
"""


def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "doc_id", "text")


TOKEN_PATTERN_SQL = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

DOCS_TOKEN_STATS_SQL = rf"""
SELECT doc_id,
  len(regexp_extract_all(text, '{TOKEN_PATTERN_SQL}')) AS n_tokens,
  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
  length(text) AS n_chars
FROM documents
"""


def q_docs_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        tf.token_count(F.col("text")).alias("n_tokens"),
        tf.whitespace_token_count(F.col("text")).alias("n_ws_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


DOCS_NFC_SQL = r"""
SELECT doc_id,
  regexp_replace(nfc_normalize(text),
                 '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g') AS text_norm,
  length(regexp_replace(nfc_normalize(text),
                 '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g')) AS n_chars_norm
FROM documents
"""


def q_docs_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Arrow-batched pandas-UDF enrichment path (input_hint:
    'vectorized pandas/Arrow UDFs (no per-row Python) throughout'),
    oracle-checked: Unicode NFC + Cc-strip (keeps tab/newline) equals
    DuckDB's nfc_normalize + an explicit Cc regex class."""
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    norm = tf.nfc_normalize(F.col("text"))
    return docs.select(
        "doc_id",
        norm.alias("text_norm"),
        F.length(norm).cast("long").alias("n_chars_norm"),
    )


def _sw_list_sql() -> str:
    return "[" + ", ".join(f"'{w}'" for w in tf.STOPWORDS_EN) + "]"


DOCS_QUALITY_SQL = rf"""
WITH base AS (
  SELECT doc_id, text,
    regexp_split_to_array(trim(lower(text)), '\s+') AS words,
    length(text) AS n,
    (length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) AS n_punct
  FROM documents
),
scored AS (
  SELECT doc_id,
    CASE WHEN n >= 20 AND n <= 5000 THEN 0.4 ELSE 0.0 END
    + CASE WHEN n_punct / greatest(n, 1) < 0.2 THEN 0.3 ELSE 0.0 END
    + CASE WHEN len(list_intersect(words, {_sw_list_sql()})) / greatest(len(words), 1) > 0.02
           THEN 0.3 ELSE 0.0 END AS q,
    text
  FROM base
)
SELECT doc_id, round(q, 2) AS quality,
  CASE WHEN text IS NULL OR length(trim(text)) = 0 THEN 'empty'
       WHEN round(q, 2) >= 0.7 THEN 'success'
       WHEN round(q, 2) >= 0.4 THEN 'well-formed'
       ELSE 'failure' END AS route
FROM scored
"""


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        tf.quality_score(c).alias("quality"),
        F.when(c.isNull() | (F.length(F.trim(c)) == 0), F.lit("empty"))
        .when(tf.quality_score(c) >= 0.7, F.lit("success"))
        .when(tf.quality_score(c) >= 0.4, F.lit("well-formed"))
        .otherwise(F.lit("failure"))
        .alias("route"),
    )


def _lang_sql() -> str:
    score_cols = []
    for code in sorted(tf.LANG_MARKERS):
        lst = "[" + ", ".join(f"'{w}'" for w in tf.LANG_MARKERS[code]) + "]"
        score_cols.append(f"len(list_intersect(words, {lst})) AS s_{code}")
    codes_desc = sorted(tf.LANG_MARKERS, reverse=True)  # ties → greatest code
    case_lines = []
    for code in codes_desc:
        others = [c for c in sorted(tf.LANG_MARKERS) if c != code]
        conds = " AND ".join(f"s_{code} >= s_{o}" for o in others)
        case_lines.append(f"WHEN {conds} AND s_{code} > 0 THEN '{code}'")
    cases = "\n       ".join(case_lines)
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM documents
),
scores AS (
  SELECT doc_id, {', '.join(score_cols)} FROM base
)
SELECT doc_id,
  CASE {cases}
       ELSE 'und' END AS lang_pred
FROM scores
"""


DOCS_LANG_SQL = _lang_sql()


def q_docs_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", tf.lang_id(F.col("text")).alias("lang_pred"))


DOCS_FINGERPRINT_SQL = f"""
SELECT doc_id,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT), list_transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT))),
    (a, b) -> (a * 31 + b) % {tf.FP_MOD}
  ) AS fp
FROM documents
"""


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.select("doc_id", tf.fingerprint(F.col("text")).alias("fp"))


def _shingle_concat_sql(k: int) -> str:
    """k-word shingle join — generated from k, never hardcoded, so a
    non-default k cannot silently diverge from word_shingles(k)."""
    return " || ' ' || ".join(f"words[i+{j + 1}]" for j in range(k))


def _minhash_sql(n_hashes: int = 4, k: int = 3,
                 source: str = "SELECT doc_id, text FROM documents") -> str:
    # Mirrors dedup.minhash_signature: md5 base hash once per shingle
    # (reduced mod P), then per-index Carter-Wegman mixes (a_i*x + b_i) % P
    # with the exact constants from dedup.mh_consts. ``source`` is any
    # (doc_id, text) relation (cf. _minhash_pairs_sql).
    mh = ",\n  ".join(
        "list_min(list_transform(hs, x -> (x * {a} + {b}) % {p})) AS minhash_{i}".format(
            a=dedup.mh_consts(i)[0], b=dedup.mh_consts(i)[1], p=dedup.MH_P, i=i
        )
        for i in range(n_hashes)
    )
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM ({source})
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= {k}
         THEN list_transform(range(len(words) - {k - 1}),
                             i -> {_shingle_concat_sql(k)})
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM base
),
hb AS (
  SELECT doc_id,
    list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 15))::INT64 % {dedup.MH_P}) AS hs
  FROM sh
)
SELECT doc_id, {mh} FROM hb
"""


DOCS_MINHASH_SQL = _minhash_sql()


def q_docs_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    # minhash_signature is a pure narrow projection (no shuffle); the test
    # tables are single-row-group parquet files, so spread the scan first —
    # one cheap round-robin shuffle of raw rows, then embarrassingly
    # parallel hashing (a real corpus scan already has many partitions)
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dedup.minhash_signature(
        docs, "doc_id", "text", n_hashes=4, k=3, hash_mode="oracle"
    )


NGRAM_JACCARD_SQL = rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM documents WHERE doc_id < 60
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= 3
         THEN list_transform(range(len(words) - 2),
                             i -> words[i+1] || ' ' || words[i+2] || ' ' || words[i+3])
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM base
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  len(list_intersect(a.shingles, b.shingles))
        / greatest(len(list_distinct(list_concat(a.shingles, b.shingles))), 1) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles))
      / greatest(len(list_distinct(list_concat(a.shingles, b.shingles))), 1) > 0
"""


def q_docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = docs.select(
        "doc_id", dedup.word_shingles(F.col("text"), 3).alias("shingles")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.greatest(
        F.size(F.array_union("sh_a", "sh_b")), F.lit(1)
    )
    return pairs.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") > 0
    )


def _minhash_pairs_sql(n_hashes: int = 4, n_bands: int = 2, k: int = 3,
                       threshold: float = 0.5,
                       source: str = "SELECT doc_id, text FROM documents") -> str:
    """``source`` is any (doc_id, text) relation — the documents table by
    default; conv_near_dups passes the folded-conversation relation so the
    SAME LSH pipeline is oracle-checked at conversation granularity."""
    mh = ",\n    ".join(
        "list_min(list_transform(hs, x -> (x * {a} + {b}) % {p})) AS m{i}".format(
            a=dedup.mh_consts(i)[0], b=dedup.mh_consts(i)[1], p=dedup.MH_P, i=i
        )
        for i in range(n_hashes)
    )
    rows = n_hashes // n_bands
    band_selects = []
    for b in range(n_bands):
        cols = " || '|' || ".join(
            f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig"
        )
    bands = "\n  UNION ALL\n  ".join(band_selects)
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM ({source})
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= {k}
         THEN list_transform(range(len(words) - {k - 1}),
                             i -> {_shingle_concat_sql(k)})
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM base
),
hb AS (
  SELECT doc_id, shingles,
    list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 15))::INT64 % {dedup.MH_P}) AS hs
  FROM sh
),
sig AS (SELECT doc_id, shingles, {mh} FROM hb),
bands AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
   AND a.doc_id < b.doc_id
),
j AS (
  SELECT c.id_a, c.id_b,
    round(len(list_intersect(sa.shingles, sb.shingles))
          / greatest(len(list_distinct(list_concat(sa.shingles, sb.shingles))), 1), 6) AS jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.id_a
  JOIN sig sb ON sb.doc_id = c.id_b
)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= {threshold}
"""


DOCS_MINHASH_PAIRS_SQL = _minhash_pairs_sql()


def q_docs_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MinHash→LSH-band→bucket-join→Jaccard-verify pipeline under
    the oracle — the SCALE dedup path (candidates only ever meet inside a
    band bucket, so the verify join is ~linear in corpus size, never the
    all-pairs join the fenced docs_ngram_jaccard query uses)."""
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dedup.minhash_near_dups(
        docs, "doc_id", "text", n_hashes=4, n_bands=2,
        jaccard_threshold=0.5, k=3, hash_mode="oracle", materialize=True,
    )


# Near-dup pairs → clusters → representatives: the step a training-data
# dedup pipeline actually acts on (drop everything whose doc_id != its
# cluster's min id). Engine: iterative min-label propagation
# (dedup.dedup_clusters); oracle: DuckDB recursive CTE computing min
# reachable id per node over the same pair graph.
DOCS_DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE
pairs AS ({DOCS_MINHASH_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst
)
SELECT node AS doc_id, min(label) AS cluster_id,
       node = min(label) AS is_rep
FROM walk GROUP BY node
"""


def q_docs_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = q_docs_minhash_pairs(spark, sf_dir).select("id_a", "id_b")
    labels = dedup.dedup_clusters(pairs)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_rep"),
    )


DOCS_DEDUP_BEST_REP_SQL = f"""
WITH clusters AS ({DOCS_DEDUP_CLUSTERS_SQL}),
q AS ({DOCS_QUALITY_SQL})
SELECT c.doc_id, c.cluster_id, q.quality,
  row_number() OVER (PARTITION BY c.cluster_id
                     ORDER BY q.quality DESC, c.doc_id ASC) = 1 AS keep
FROM clusters c JOIN q ON c.doc_id = q.doc_id
"""


def q_docs_dedup_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware duplicate-cluster representative selection: instead
    of the min-id canonical (`docs_dedup_clusters.is_rep` — the arbitrary
    choice), keep the HIGHEST-quality member of each near-dup cluster
    (ties to lowest id) — the refinement a production corpus actually
    wants, since duplicates often differ in truncation/boilerplate and
    the best copy should survive. One cluster-keyed window over the
    cluster-member table (duplicate-involved docs only — never the whole
    corpus), quality joined on the doc key."""
    clusters = q_docs_dedup_clusters(spark, sf_dir).select(
        "doc_id", "cluster_id"
    )
    quality = q_docs_quality(spark, sf_dir).select("doc_id", "quality")
    j = clusters.join(quality, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    return j.select(
        "doc_id",
        "cluster_id",
        "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def _simhash_sql() -> str:
    sums = ",\n    ".join(
        f"SUM(CASE WHEN (hv >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(60)
    )
    bits = " + ".join(
        f"CASE WHEN s{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE 0 END"
        for b in range(60)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
),
h AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 15))::INT64 AS hv FROM toks
),
agg AS (
  SELECT doc_id,
    {sums}
  FROM h GROUP BY doc_id
)
SELECT doc_id, ({bits}) AS simhash FROM agg
"""


DOCS_SIMHASH_SQL = _simhash_sql()


def q_docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    # narrow projection — spread the single-row-group test file first
    # (same rationale as q_docs_minhash_sig)
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dedup.simhash64(docs, "doc_id", "text", hash_mode="oracle")


# Multimodal plumbing under the oracle: documents' text bytes stand in for
# media payloads (no media libs in this environment), the deterministic
# stub decode derives dimensions from the payload md5 — so the REAL part
# (binary columns through Arrow mapInPandas batches, schema, partitioning)
# is driver-verified while the decode seam stays swappable
# (operators.multimodal, JhoveParser.kt:29-156 analogue).
MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
  md5(text) AS checksum,
  CAST(64 + ('0x' || substr(md5(text), 1, 2))::INT AS INT) AS width,
  CAST(64 + ('0x' || substr(md5(text), 3, 2))::INT AS INT) AS height,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 1
            ELSE 1 + ('0x' || substr(md5(text), 5, 2))::INT END AS INT) AS n_frames
FROM documents
"""


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import multimodal

    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    return multimodal.extract_features(media, decode_stub=True)


def q_media_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate pairs by perceptual dHash (VERDICT r4 #7):
    the image rows of the media table hash to 64 gradient-sign bits
    (multimodal.image_phash — the image analogue of simhash), then
    banded 16-bit equi-joins generate candidates and exact Hamming ≤ 8
    verifies them (multimodal.phash_near_dups) — never an all-pairs
    comparison. Runs the stub decode (md5 grid) so the ENTIRE
    mapInPandas → banding → verify pipeline is driver-checked against
    DuckDB bit-for-bit; the real pixel path (PIL / pure-python PNG+BMP
    decode → 8×9 average pool) is pinned on real image bytes in
    tests/test_round5_features.py. Duplicate texts ⇒ identical payload
    ⇒ Hamming 0, so the fixture's planted dup groups surface here."""
    from ..operators import multimodal

    docs = (
        _read(spark, sf_dir, "documents")
        .filter(
            F.col("text").isNotNull()
            & (F.length("text") > 0)
            & (F.col("doc_id") % 3 == 0)
        )
        .repartition(spark.sparkContext.defaultParallelism)
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit(None).cast("map<string,string>").alias("meta"),
    )
    # materialize the decode+hash ONCE: the signature table feeds both
    # sides of the banded self-join, and at scale the pixel decode is the
    # expensive stage (the contamination/winnowing shared-scan pattern)
    sig = multimodal.image_phash(media, decode_stub=True).localCheckpoint(
        eager=True
    )
    return multimodal.phash_near_dups(sig, n_bands=4, max_hamming=8)


# stub grid cell (r, c) = payload byte (r*9+c) mod len — see
# multimodal._gray_grid_stub; byte i of the utf-8 payload is hex chars
# 2i+1..2i+2 of to_hex(encode(text))
_PHASH_BYTE = "('0x' || substr(hexp, 2 * (({i}) % n) + 1, 2))::INT"

MEDIA_PHASH_PAIRS_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id, to_hex(encode(text)) AS hexp,
         octet_length(encode(text)) AS n
  FROM documents
  WHERE text IS NOT NULL AND length(text) > 0 AND doc_id % 3 = 0
),
sig AS (
  SELECT media_id,
    array_to_string(list_transform(range(8), r ->
      array_to_string(list_transform(range(8), c ->
        CASE WHEN {_PHASH_BYTE.format(i='r * 9 + c')}
                 < {_PHASH_BYTE.format(i='r * 9 + c + 1')}
             THEN '1' ELSE '0' END), '')), '') AS bits
  FROM m
),
bands AS (
  SELECT media_id, bits, b AS band_idx, substr(bits, b * 16 + 1, 16) AS band_bits
  FROM sig, unnest([0, 1, 2, 3]) AS t(b)
),
cand AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         a.bits AS ba, b.bits AS bb
  FROM bands a
  JOIN bands b ON a.band_idx = b.band_idx AND a.band_bits = b.band_bits
   AND a.media_id < b.media_id
),
h AS (
  SELECT id_a, id_b,
    CAST(len(list_filter(range(64),
             i -> substr(ba, i + 1, 1) <> substr(bb, i + 1, 1))) AS INT)
      AS hamming
  FROM cand
)
SELECT DISTINCT id_a, id_b, hamming FROM h WHERE hamming <= 8
"""


# The end-to-end training-data shape: quality gate → language gate →
# near-dup removal keeping one representative per cluster. Composes the
# oracle-checked pieces (docs_quality, docs_lang_id, docs_dedup_clusters)
# into the materialization a pipeline would actually write out.
CLEAN_CORPUS_SQL = f"""
WITH RECURSIVE
pairs AS ({DOCS_MINHASH_PAIRS_SQL}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.src, w.label FROM edges e JOIN walk w ON w.node = e.dst
),
drop_docs AS (
  SELECT node AS doc_id FROM walk GROUP BY node HAVING node <> min(label)
),
quality AS ({DOCS_QUALITY_SQL}),
lang AS ({DOCS_LANG_SQL})
SELECT q.doc_id, q.quality, l.lang_pred
FROM quality q
JOIN lang l ON l.doc_id = q.doc_id
WHERE q.route IN ('success', 'well-formed')
  AND l.lang_pred <> 'und'
  AND q.doc_id NOT IN (SELECT doc_id FROM drop_docs)
"""


def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = q_docs_quality(spark, sf_dir)
    lang = q_docs_lang_id(spark, sf_dir)
    drop = (
        q_docs_dedup_clusters(spark, sf_dir)
        .filter(~F.col("is_rep"))
        .select("doc_id")
    )
    return (
        q.filter(F.col("route").isin("success", "well-formed"))
        .join(lang, "doc_id")
        .filter(F.col("lang_pred") != "und")
        .join(drop, "doc_id", "left_anti")
        .select("doc_id", "quality", "lang_pred")
    )


# --------------------------------------------------------------------------
# similarity search over embeddings
# --------------------------------------------------------------------------

_DOT = "list_reduce(list_prepend(0.0, list_transform(range(len({a})), i -> {a}[i+1] * {b}[i+1])), (x, y) -> x + y)"
_NRM = "sqrt(list_reduce(list_prepend(0.0, list_transform({a}, x -> x * x)), (x, y) -> x + y))"

ANN_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
pairs AS (
  SELECT q.query_id, e.vec_id,
    {_DOT.format(a='e.v', b='q.qv')}
          / ({_NRM.format(a='e.v')} * {_NRM.format(a='q.qv')}) AS cos
  FROM e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
  FROM pairs
)
SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= 5
"""


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.brute_force_topk(emb, queries, k=5)


IVF_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
c AS (SELECT vec_id AS cid, v AS cvec FROM e WHERE vec_id % 100 = 7),
asg AS (
  SELECT vec_id, v, cid,
    row_number() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cid ASC) AS rn
  FROM (
    SELECT e.vec_id, e.v, c.cid,
      {_DOT.format(a='e.v', b='c.cvec')}
        / ({_NRM.format(a='e.v')} * {_NRM.format(a='c.cvec')}) AS ccos
    FROM e CROSS JOIN c)
),
cells AS (SELECT vec_id, v, cid FROM asg WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
qasg AS (
  SELECT query_id, qv, cid,
    row_number() OVER (PARTITION BY query_id ORDER BY ccos DESC, cid ASC) AS rn
  FROM (
    SELECT q.query_id, q.qv, c.cid,
      {_DOT.format(a='q.qv', b='c.cvec')}
        / ({_NRM.format(a='q.qv')} * {_NRM.format(a='c.cvec')}) AS ccos
    FROM q CROSS JOIN c)
),
probes AS (SELECT query_id, qv, cid FROM qasg WHERE rn <= 2),
cand AS (
  SELECT p.query_id, s.vec_id,
    round({_DOT.format(a='s.v', b='p.qv')}
          / ({_NRM.format(a='s.v')} * {_NRM.format(a='p.qv')}), 6) AS cos
  FROM cells s JOIN probes p ON p.cid = s.cid
),
ranked AS (
  SELECT query_id, vec_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
  FROM cand
)
SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= 5
"""


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (deterministic pivots → cells → probed exact search)
    — the second scale path named alongside LSH in the brief."""
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.ivf_topk(
        emb, queries, k=5, centroid_stride=100, centroid_offset=7, n_probe=2
    )


def _kmeans_cells_sql(
    n_centroids: int = 8, n_iter: int = 2, quant: int = 1_000_000,
) -> str:
    """Shared DuckDB replica of the deterministic Lloyd loop
    (similarity.kmeans_centroids) unrolled into a CTE chain ending in
    ``cells`` — per-vector (vec_id, v, cid) final assignments. Used by
    both the IVF top-k and cluster-assignment oracles."""
    score = _DOT.format(a="{v}", b="{c}") + " / " + _NRM.format(a="{c}")
    parts = [f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
c0 AS (
  SELECT cid, cvec FROM (
    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
           v AS cvec
    FROM e
  ) WHERE cid < {n_centroids}
)"""]
    for t in range(1, n_iter + 1):
        acos = score.format(v="e.v", c="c.cvec")
        parts.append(f""",
a{t} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {acos} DESC, c.cid ASC) AS rn
    FROM e CROSS JOIN c{t - 1} c
  ) WHERE rn = 1
),
s{t} AS (
  SELECT cid, i, sum(CAST(floor(x * {quant} + 0.5) AS BIGINT)) AS sx,
         count(*) AS n
  FROM (SELECT cid, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM a{t})
  GROUP BY cid, i
),
c{t} AS (
  SELECT cid, list(sx / (n * {quant}.0) ORDER BY i) AS cvec
  FROM s{t} GROUP BY cid
)""")
    fcos = score.format(v="e.v", c="c.cvec")
    parts.append(f""",
cells AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {fcos} DESC, c.cid ASC) AS rn
    FROM e CROSS JOIN c{n_iter} c
  ) WHERE rn = 1
)""")
    return "".join(parts)


def _kmeans_ivf_sql(
    n_centroids: int = 8, n_iter: int = 2, n_probe: int = 2, k: int = 5,
    quant: int = 1_000_000,
) -> str:
    """DuckDB replica of similarity.kmeans_ivf_topk — the fixed-iteration
    Lloyd loop UNROLLED into a generated CTE chain (c0 → a1/s1/c1 → …).
    Bit-for-bit reproducible because the engine was designed for it:
    hash-seeded init (md5 order), centroid means from exact integer sums
    (floor(x*q + 0.5) longs — associative, partition-order-independent),
    and score folds evaluated in the same sequential order on both
    engines, so every assignment comparison sees identical doubles.

    Assignment/probe ordering uses dot/||centroid|| (NOT full cosine):
    the row norm is a shared positive factor that cannot change the
    argmax, and the engine skips it (similarity._cent_score) — the oracle
    must order by the IDENTICAL expression or near-ties could round
    differently. The final top-k output still reports full cosine."""
    score = _DOT.format(a="{v}", b="{c}") + " / " + _NRM.format(a="{c}")
    fullcos = (
        _DOT.format(a="{v}", b="{c}")
        + " / (" + _NRM.format(a="{v}") + " * " + _NRM.format(a="{c}") + ")"
    )
    parts = [_kmeans_cells_sql(n_centroids, n_iter, quant)]
    qcos = score.format(v="q.qv", c="c.cvec")
    scos = fullcos.format(v="s.v", c="p.qv")
    parts.append(f""",
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.query_id, q.qv, c.cid,
      row_number() OVER (PARTITION BY q.query_id
                         ORDER BY {qcos} DESC, c.cid ASC) AS rn
    FROM q CROSS JOIN c{n_iter} c
  ) WHERE rn <= {n_probe}
),
cand AS (
  SELECT p.query_id, s.vec_id, round({scos}, 6) AS cos
  FROM cells s JOIN probes p ON p.cid = s.cid
),
ranked AS (
  SELECT query_id, vec_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
  FROM cand
)
SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= {k}
""")
    return "".join(parts)


IVF_KMEANS_TOPK_SQL = _kmeans_ivf_sql()


def _pq_sql(
    n_subspaces: int = 4, n_codes: int = 8, n_iter: int = 2, k: int = 5,
    quant: int = 1_000_000, rerank: int = 0,
) -> str:
    """DuckDB replica of similarity.pq_topk — one unrolled deterministic
    Lloyd chain PER SUBSPACE over the sliced vectors (same hash-seeded
    init ids in every subspace, exact integer-sum means), then ADC
    scoring: sum of per-subspace dot(q_s, assigned-centroid) divided by
    ||q|| times the reconstruction norm, every fold in the engine's
    order. ``rerank > 0`` adds the exact-cosine re-rank of the ADC
    shortlist (the engine's two-stage path). Subspace boundaries derive
    from len(v) (no hardcoded dims)."""
    score = _DOT.format(a="{v}", b="{c}") + " / " + _NRM.format(a="{c}")

    def _slice(expr: str, s: int) -> str:
        sub = f"(len({expr}) // {n_subspaces})"
        return f"list_slice({expr}, {s} * {sub} + 1, ({s} + 1) * {sub})"

    parts = [f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
)"""]
    for s in range(n_subspaces):
        parts.append(f""",
es{s} AS (SELECT vec_id, {_slice('v', s)} AS v FROM e),
s{s}c0 AS (
  SELECT cid, cvec FROM (
    SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid,
           v AS cvec
    FROM es{s}
  ) WHERE cid < {n_codes}
)""")
        for t in range(1, n_iter + 1):
            acos = score.format(v="e.v", c="c.cvec")
            parts.append(f""",
s{s}a{t} AS (
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {acos} DESC, c.cid ASC) AS rn
    FROM es{s} e CROSS JOIN s{s}c{t - 1} c
  ) WHERE rn = 1
),
s{s}s{t} AS (
  SELECT cid, i, sum(CAST(floor(x * {quant} + 0.5) AS BIGINT)) AS sx,
         count(*) AS n
  FROM (SELECT cid, generate_subscripts(v, 1) AS i, unnest(v) AS x FROM s{s}a{t})
  GROUP BY cid, i
),
s{s}c{t} AS (
  SELECT cid, list(sx / (n * {quant}.0) ORDER BY i) AS cvec
  FROM s{s}s{t} GROUP BY cid
)""")
        fcos = score.format(v="e.v", c="c.cvec")
        parts.append(f""",
s{s}cells AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {fcos} DESC, c.cid ASC) AS rn
    FROM es{s} e CROSS JOIN s{s}c{n_iter} c
  ) WHERE rn = 1
)""")
    d_terms = " + ".join(
        _DOT.format(a=_slice("q.qv", s), b=f"b{s}.cvec")
        for s in range(n_subspaces)
    )
    n2 = (
        "list_reduce(list_prepend(0.0, list_transform({c}, x -> x * x)),"
        " (x, y) -> x + y)"
    )
    n_terms = " + ".join(n2.format(c=f"b{s}.cvec") for s in range(n_subspaces))
    joins = "\n  ".join(
        [f"JOIN s0c{n_iter} b0 ON b0.cid = x0.cid"]
        + [
            f"JOIN s{s}cells x{s} ON x{s}.vec_id = x0.vec_id\n  "
            f"JOIN s{s}c{n_iter} b{s} ON b{s}.cid = x{s}.cid"
            for s in range(1, n_subspaces)
        ]
    )
    parts.append(f""",
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, x0.vec_id,
    round(({d_terms}) / ({_NRM.format(a='q.qv')} * sqrt({n_terms})), 6)
      AS adc_cos
  FROM s0cells x0
  {joins}
  CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, adc_cos,
    CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY adc_cos DESC, vec_id ASC) AS INT) AS rank
  FROM scored
)""")
    if rerank <= 0:
        parts.append(
            f"\nSELECT query_id, vec_id, adc_cos, rank "
            f"FROM ranked WHERE rank <= {k}\n"
        )
        return "".join(parts)
    fullcos = (
        _DOT.format(a="e.v", b="q.qv")
        + " / (" + _NRM.format(a="e.v") + " * " + _NRM.format(a="q.qv") + ")"
    )
    parts.append(f""",
short AS (SELECT query_id, vec_id FROM ranked WHERE rank <= {rerank}),
rr AS (
  SELECT s.query_id, s.vec_id, round({fullcos}, 6) AS cos
  FROM short s
  JOIN e ON e.vec_id = s.vec_id
  JOIN q ON q.query_id = s.query_id
),
rranked AS (
  SELECT query_id, vec_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
  FROM rr
)
SELECT query_id, vec_id, cos, rank FROM rranked WHERE rank <= {k}
""")
    return "".join(parts)


PQ_TOPK_SQL = _pq_sql(n_subspaces=16, n_codes=8, n_iter=1, k=5, rerank=80)

EMB_KMEANS_CLUSTERS_SQL = _kmeans_cells_sql() + """,
sizes AS (SELECT cid, count(*) AS cluster_size FROM cells GROUP BY cid)
SELECT s.vec_id, CAST(s.cid AS INT) AS cluster_id,
       CAST(z.cluster_size AS BIGINT) AS cluster_size
FROM cells s JOIN sizes z USING (cid)
"""


def _semantic_dedup_sql(threshold: float = 0.35) -> str:
    cos = (
        _DOT.format(a="a.v", b="b.v")
        + " / (" + _NRM.format(a="a.v") + " * " + _NRM.format(a="b.v") + ")"
    )
    return _kmeans_cells_sql() + f""",
dup AS (
  SELECT DISTINCT b.vec_id
  FROM cells a JOIN cells b ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round({cos}, 6) >= {threshold!r}
)
SELECT c.vec_id, CAST(c.cid AS INT) AS cluster_id,
  CASE WHEN d.vec_id IS NOT NULL THEN 'drop' ELSE 'keep' END AS verdict
FROM cells c LEFT JOIN dup d ON c.vec_id = d.vec_id
"""


EMB_SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (similarity.semantic_dedup): deterministic-Lloyd cells
    fence the pairwise cosine to within-cell comparisons; every vector
    with a lower-id cell-mate at cosine ≥ τ is dropped, the min-id
    representative kept. τ = 0.15 on the synthetic embeddings (64-dim random
    vectors have cosine std ≈ 1/8, so 0.35 ≈ a 3σ near-dup tail; real
    near-dup corpora use ~0.9+ —
    the decision machinery is identical). The oracle replays the same
    unrolled Lloyd chain plus a naive within-cell self-join."""
    from ..operators import similarity

    emb = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )
    return similarity.semantic_dedup(emb, threshold=0.35)


EMB_CLUSTER_SAMPLE_SQL = _kmeans_cells_sql() + """,
ranked AS (
  SELECT vec_id, cid,
    row_number() OVER (PARTITION BY cid
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM cells
)
SELECT vec_id, CAST(cid AS INT) AS cluster_id, CAST(rn AS INT) AS draw_rank
FROM ranked WHERE rn <= 20
"""


def q_emb_cluster_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced diversity sampling: up to s replay-stable draws
    per deterministic Lloyd cell (md5-ordered, the repo's stratified-
    sample convention) — the "sample evenly across semantic clusters"
    subset-selection step (D4 / eval-set construction) that plain random
    sampling gets wrong on skewed corpora (it reproduces the skew).
    Assignment is the zero-shuffle literal argmax; the draw is one
    cell-keyed window whose per-partition work is cell-sized. Output is
    ≤ s × n_centroids rows."""
    from ..operators import similarity

    emb = (
        _read(spark, sf_dir, "embeddings")
        .filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )
    cents = similarity.kmeans_centroids(emb, "vec_id", "embedding", 8, 2)
    asg = emb.select(
        "vec_id",
        similarity._argmax_centroid(F.col("embedding"), cents).alias("cid"),
    )
    w = Window.partitionBy("cid").orderBy(
        F.md5(F.col("vec_id").cast("string").cast("binary")), F.col("vec_id")
    )
    return (
        asg.withColumn("draw_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("draw_rank") <= 20)
        .select(
            "vec_id", F.col("cid").cast("int").alias("cluster_id"), "draw_rank"
        )
    )


def q_emb_kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus clustering table (similarity.kmeans_assign): per-vector
    deterministic-Lloyd cell + exact cluster size — the starting table
    for cluster-balanced sampling / semantic sharding. Assignment is a
    zero-shuffle literal argmax; sizes collapse map-side to n_centroids
    rows and broadcast back (never a low-cardinality count window)."""
    emb = _read(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return similarity.kmeans_assign(emb, n_centroids=8, n_iter=2)


def q_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (similarity.pq_topk, VERDICT r4 #6): 16
    subspaces × 8 deterministic-Lloyd codes (48 bits/vector), ADC
    shortlist of 80, exact-cosine re-rank to top-5 — the standard
    two-stage PQ pipeline. The candidate side carries only 16 small ints
    per vector (the memory story at 10^10 vectors), ADC scoring is 16
    LUT lookups per candidate against the broadcast query side's
    per-codebook dot tables, and the exact pass touches only
    queries × 80 rows. The oracle replays all 16 sliced Lloyd chains,
    the ADC fold, and the re-rank; recall ≥ the stride-IVF variant is
    pinned by tests/test_lsh_recall.py."""
    emb = _read(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.pq_topk(
        emb, queries, k=5, n_subspaces=16, n_codes=8, n_iter=1, rerank=80
    )


def q_ivf_kmeans_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over learned (deterministic Lloyd) cells — the production
    pivot variant: balanced cells on clustered embeddings, assignment and
    probing as narrow literal folds, the per-query window as the only
    shuffle. See similarity.kmeans_ivf_topk."""
    emb = _read(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    ).select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.kmeans_ivf_topk(
        emb, queries, k=5, n_centroids=8, n_iter=2, n_probe=2
    )


EMBEDDING_NORMS_SQL = f"""
SELECT vec_id,
  len(embedding) AS dims,
  {_NRM.format(a='list_transform(embedding, x -> CAST(x AS DOUBLE))')} AS l2_norm
FROM embeddings
"""


def _hyperplane_sig_sql(vec: str, n_planes: int, offset: int = 0) -> str:
    """DuckDB replica of similarity.hyperplane_signature: sign bits of
    hash-derived hyperplane projections (weights from md5, so both engines
    compute bit-identical buckets). ``offset`` mirrors plane_offset (the
    banded multi-table variant)."""
    bits = []
    for p in range(offset, offset + n_planes):
        w = (
            f"((('0x' || substr(md5('plane{p}|' || CAST(i AS VARCHAR)), 1, 8))::INT64"
            f" % 2000 - 1000) / 1000.0)"
        )
        proj = (
            f"list_reduce(list_prepend(0.0, list_transform(range(len({vec})),"
            f" i -> {vec}[i+1] * {w})), (x, y) -> x + y)"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


LSH_TOPK_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (SELECT vec_id, v, {_hyperplane_sig_sql('v', 4)} AS sig FROM e),
q AS (SELECT vec_id AS query_id, v AS qv, sig FROM s WHERE vec_id < 5),
pairs AS (
  SELECT q.query_id, s.vec_id,
    round({_DOT.format(a='s.v', b='q.qv')}
          / ({_NRM.format(a='s.v')} * {_NRM.format(a='q.qv')}), 6) AS cos
  FROM s JOIN q ON s.sig = q.sig
),
ranked AS (
  SELECT query_id, vec_id, cos,
    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS INT) AS rank
  FROM pairs
)
SELECT query_id, vec_id, cos, rank FROM ranked WHERE rank <= 5
"""


def _embedding_dims(df: DataFrame) -> int | None:
    """Probe the (fixed) embedding width once, driver-side, so the LSH
    weight arrays are sized exactly to the data — a one-row action that
    buys a 3.6×-faster signature scan (no per-row slice of a max-width
    literal; see similarity.hyperplane_signature)."""
    row = df.select(F.size("embedding").alias("d")).first()
    return int(row["d"]) if row and row["d"] is not None else None


def q_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-k via hyperplane-LSH buckets (the scale path: the
    bucket equi-join replaces ann_topk's cross join at 1000x data)."""
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return similarity.lsh_topk(
        emb, queries, k=5, n_planes=4, dims=_embedding_dims(emb)
    ).withColumn("rank", F.col("rank").cast("int"))


EMB_NEARDUP_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (SELECT vec_id, v, {_hyperplane_sig_sql('v', 8)} AS sig FROM e),
pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    round({_DOT.format(a='a.v', b='b.v')}
          / ({_NRM.format(a='a.v')} * {_NRM.format(a='b.v')}), 6) AS cos
  FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.2
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicates, LSH-bucketed (never O(n²))."""
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # 8 planes = 256 buckets: at 50k vectors the intra-bucket pairwise
    # cosine drops 16x vs 4 planes; precision rises, and the oracle computes
    # the identical buckets so the match is unaffected
    return dedup.embedding_near_dups(
        emb, "vec_id", "embedding", threshold=0.2, n_planes=8,
        dims=_embedding_dims(emb),
    )


def _emb_neardup_banded_sql(n_tables: int = 4, planes_per_table: int = 6,
                            bucket_cap: int = 12, threshold: float = 0.2) -> str:
    sels = ",\n       ".join(
        f"{_hyperplane_sig_sql('v', planes_per_table, t * planes_per_table)} AS sig_{t}"
        for t in range(n_tables)
    )
    stack = "\n  UNION ALL\n  ".join(
        f"SELECT vec_id, {t} AS table_id, sig_{t} AS sig FROM s"
        for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (SELECT vec_id, v, {sels} FROM e),
stacked AS (
  {stack}
),
counted AS (
  SELECT vec_id, table_id, sig,
         count(*) OVER (PARTITION BY table_id, sig) AS bc
  FROM stacked
),
kept AS (SELECT vec_id, table_id, sig FROM counted WHERE bc <= {bucket_cap}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM kept a JOIN kept b
    ON a.table_id = b.table_id AND a.sig = b.sig AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.id_a, c.id_b,
    round({_DOT.format(a='ea.v', b='eb.v')}
          / ({_NRM.format(a='ea.v')} * {_NRM.format(a='eb.v')}), 6) AS cos
  FROM cand c JOIN e ea ON ea.vec_id = c.id_a JOIN e eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= {threshold}
"""


EMB_NEARDUP_BANDED_SQL = _emb_neardup_banded_sql()


def q_embedding_neardup_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-amplified multi-table hyperplane LSH with a hard per-bucket cap —
    the shape that survives billions of vectors: recall from 4 independent
    tables, worst-case intra-bucket cost bounded by the cap, capped buckets
    dropped identically on both engines (dedup.embedding_near_dups_banded)."""
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    return dedup.embedding_near_dups_banded(
        emb, "vec_id", "embedding", threshold=0.2,
        n_tables=4, planes_per_table=6, bucket_cap=12,
        dims=_embedding_dims(emb), materialize=True,
    )


def q_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dims"),
        similarity.norm(v).alias("l2_norm"),
    )


# Matryoshka truncation (Kusupati et al. 2022): keep the first k dims of
# an MRL-trained embedding and L2-renormalize — the standard cheap-ANN /
# storage-tier trick (a 16-dim prefix is 4x less cosine work and 4x less
# shuffle than 64). Narrow projection, zero shuffle; output exploded to
# (vec_id, dim_idx, val) scalars. The fold order of the norm sum matches
# _NRM exactly (0.0-seeded left fold), so values hash bit-identically.
_MRL_K = 16

EMB_TRUNCATE_RENORM_SQL = f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding[1:{_MRL_K}], x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE embedding IS NOT NULL
),
n AS (
  SELECT vec_id, v, {_NRM.format(a='v')} AS nrm FROM e
)
SELECT vec_id, CAST(i AS INT) AS dim_idx, round(v[CAST(i AS INT) + 1] / nrm, 6) AS val
FROM (SELECT vec_id, v, nrm, unnest(range(len(v))) AS i FROM n)
WHERE nrm > 0
"""


def q_emb_truncate_renorm(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    v16 = F.slice(F.col("embedding").cast("array<double>"), 1, _MRL_K)
    d = emb.select("vec_id", v16.alias("_v"), similarity.norm(v16).alias("_n"))
    return (
        d.filter(F.col("_n") > 0)
        .select(
            "vec_id",
            F.posexplode(
                F.transform(F.col("_v"), lambda x: F.round(x / F.col("_n"), 6))
            ).alias("dim_idx", "val"),
        )
        .select("vec_id", F.col("dim_idx").cast("int").alias("dim_idx"), "val")
    )


# P11 true form (util/XmlHelper.kt:54-127, jhove/JhoveParser.kt:110-121):
# build an XML document per row, then extract fields back with XPath —
# attributes, namespace-agnostic element steps (the local-name() rewrite
# standing in for XmlHelper's NamespaceContext), repeated-element counts and
# first-match text. The oracle checks the round trip against the source
# columns directly, which is stronger than re-parsing: extraction must
# invert construction exactly.
# The oracle checks the round trip against the SOURCE columns — the XML
# parser unescapes what construction escaped, so every extracted value must
# equal the raw input (xml_escape is applied to every text node during
# construction, and the expected values below are the raw columns; this
# holds for text containing &, <, >, or quotes). Excluded on both sides,
# because no escaping can make the round trip hold for them:
#   - rows where any used column is NULL (no document to build — concat
#     would null-propagate while the oracle would still emit a row);
#   - rows where text/lang/source contain control whitespace (\t \n \r):
#     the XML spec normalizes line ends in content and whitespace in
#     attribute values, so the parsed string-value differs from the raw
#     column by design.
# Empty string-values parse back as NULL (xpath_first_null), so the oracle
# NULLIFs the columns that can legitimately be '' (empty first token from a
# leading/double space, empty lang/source).
XML_EXTRACT_SQL = """
WITH built AS (
  SELECT doc_id, lang, source, text,
    string_split(text, ' ') AS toks
  FROM documents
  WHERE text IS NOT NULL AND lang IS NOT NULL AND source IS NOT NULL
    AND NOT regexp_matches(text || lang || source,
                           '[' || chr(9) || chr(10) || chr(13) || ']')
)
SELECT doc_id,
  CAST(doc_id AS VARCHAR) AS xml_id,
  nullif(lang, '') AS xml_lang,
  nullif(source, '') AS xml_src,
  CAST(least(5, len(toks)) AS BIGINT) AS n_w,
  nullif(toks[1], '') AS first_w,
  CAST(length(text) AS INT) AS body_len
FROM built
"""


def q_xml_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions import xml as xf

    docs = _read(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
        & F.col("lang").isNotNull()
        & F.col("source").isNotNull()
        & ~F.concat(F.col("text"), F.col("lang"), F.col("source")).rlike(
            "[\t\n\r]"
        )
    ).repartition(spark.sparkContext.defaultParallelism)
    # ^ spread the single-file test scan: 6 XPath evaluations per row would
    # otherwise run on ONE core (a real corpus scan has many partitions)
    toks = F.slice(F.split(F.col("text"), " "), 1, 5)
    ws = F.array_join(
        F.transform(
            toks, lambda t: F.concat(F.lit("<w>"), xf.xml_escape(t), F.lit("</w>"))
        ),
        "",
    )
    xml = F.concat(
        F.lit('<doc id="'), F.col("doc_id").cast("string"),
        F.lit('" lang="'), xf.xml_escape_attr(F.col("lang")), F.lit('">'),
        F.lit("<src>"), xf.xml_escape(F.col("source")), F.lit("</src>"),
        F.lit("<body>"), xf.xml_escape(F.col("text")), F.lit("</body>"),
        ws, F.lit("</doc>"),
    )
    d = docs.select("doc_id", xml.alias("_xml"))
    x = F.col("_xml")
    return d.select(
        "doc_id",
        xf.xpath_first(x, "/doc/@id").alias("xml_id"),
        xf.xpath_first_null(x, "/doc/@lang").alias("xml_lang"),
        # namespace-prefixed path — exercises the local-name() rewrite the
        # way the reference's mets:/mix: paths exercise its NamespaceContext
        xf.xpath_first_null(x, "/m:doc/m:src").alias("xml_src"),
        xf.xpath_count(x, "/doc/w").alias("n_w"),
        xf.xpath_first_null(x, "/doc/w").alias("first_w"),
        # the parser's string-value is the UNESCAPED text, so its length is
        # the raw text length — matching the oracle's length(text)
        F.length(xf.xpath_first(x, "/doc/body")).alias("body_len"),
    )


# A1 at full METS depth with P12 version dispatch
# (MetsBrowsingModel.kt:23-218 nested tree; MetsBrowsingGenerator.kt:60-63
# picks the serializer version; MetsBrowsingSerializer.kt:280-412 vs
# Mets2BrowsingSerializer.kt:12-52 render DIFFERENT deterministic formats):
# build a nested document struct (header + ordered per-turn structs +
# rollup stats), dispatch on a data-derived version, render each version
# with its own exact format, oracle-check the md5 of the rendered string —
# the golden-file equality test (CreateMetsBrowsingTest.kt:368-411) as a
# value-hash row.
CONV_DOCUMENT_V2_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
agg AS (
  SELECT conv_id, count(*) AS n_turns,
    sum(length(coalesce(text, ''))) AS chars,
    sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS tool_turns,
    string_agg('[' || lpad(CAST(turn_idx AS VARCHAR), 5, '0') || '] ' ||
               coalesce(role, '') || '|' || coalesce(text, '') || '|' ||
               coalesce(tool, ''), chr(10) ORDER BY turn_idx) AS body1,
    string_agg('<t i="' || CAST(turn_idx AS VARCHAR) || '" r="' ||
               coalesce(role, '') || '">' || coalesce(text, '') || '</t>',
               '' ORDER BY turn_idx) AS body2
  FROM final GROUP BY conv_id
)
SELECT conv_id,
  CAST(CASE WHEN n_turns % 2 = 0 THEN 2 ELSE 1 END AS INT) AS version,
  n_turns,
  md5(CASE WHEN n_turns % 2 = 0
      THEN '<conv id="' || conv_id || '" v="2" turns="' ||
           CAST(n_turns AS VARCHAR) || '">' || body2 ||
           '<stats tool_turns="' || CAST(tool_turns AS VARCHAR) ||
           '" chars="' || CAST(chars AS VARCHAR) || '"/></conv>'
      ELSE 'DOC v1 ' || conv_id || ' turns=' || CAST(n_turns AS VARCHAR) ||
           chr(10) || body1 || chr(10) || 'chars=' || CAST(chars AS VARCHAR)
      END) AS doc_md5
FROM agg
"""


def q_conv_document_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    final = q_cdc_lww_final_state(spark, sf_dir)
    st = F.struct(
        F.col("turn_idx").alias("t"),
        F.col("role").alias("r"),
        F.col("text").alias("x"),
        F.col("tool").alias("o"),
    )
    # the nested document: header + ordered turn structs + rollup stats —
    # one StructType value per conversation, like the reference's in-memory
    # METS tree before serialization
    agg = final.groupBy("conv_id").agg(
        F.struct(
            F.struct(
                F.count("*").alias("n_turns"),
            ).alias("header"),
            F.array_sort(F.collect_list(st)).alias("turns"),
            F.struct(
                F.sum(F.col("tool").isNotNull().cast("int")).alias("tool_turns"),
                F.sum(F.length(F.coalesce(F.col("text"), F.lit("")))).alias("chars"),
            ).alias("stats"),
        ).alias("doc")
    )
    n_turns = F.col("doc.header.n_turns")
    chars = F.col("doc.stats.chars")
    tool_turns = F.col("doc.stats.tool_turns")
    version = F.when(n_turns % 2 == 0, F.lit(2)).otherwise(F.lit(1))
    render_v1 = F.concat(
        F.lit("DOC v1 "), F.col("conv_id"),
        F.lit(" turns="), n_turns.cast("string"), F.lit("\n"),
        F.array_join(
            F.transform(
                F.col("doc.turns"),
                lambda s: F.concat(
                    F.lit("["), F.lpad(s["t"].cast("string"), 5, "0"),
                    F.lit("] "), F.coalesce(s["r"], F.lit("")),
                    F.lit("|"), F.coalesce(s["x"], F.lit("")),
                    F.lit("|"), F.coalesce(s["o"], F.lit("")),
                ),
            ),
            "\n",
        ),
        F.lit("\nchars="), chars.cast("string"),
    )
    render_v2 = F.concat(
        F.lit('<conv id="'), F.col("conv_id"),
        F.lit('" v="2" turns="'), n_turns.cast("string"), F.lit('">'),
        F.array_join(
            F.transform(
                F.col("doc.turns"),
                lambda s: F.concat(
                    F.lit('<t i="'), s["t"].cast("string"),
                    F.lit('" r="'), F.coalesce(s["r"], F.lit("")),
                    F.lit('">'), F.coalesce(s["x"], F.lit("")), F.lit("</t>"),
                ),
            ),
            "",
        ),
        F.lit('<stats tool_turns="'), tool_turns.cast("string"),
        F.lit('" chars="'), chars.cast("string"), F.lit('"/></conv>'),
    )
    doc = F.when(version == 2, render_v2).otherwise(render_v1)
    rendered = agg.select(
        "conv_id",
        version.alias("version"),
        n_turns.alias("n_turns"),
        doc.alias("doc"),
    )
    # render-validation gate between render and emit (U5 completion — the
    # reference XSD-validates every generated METS before write,
    # CreateMetsBrowsing.kt:292-300): contract violations dead-letter
    # instead of reaching the sink. On well-formed fixture data the gate
    # passes everything, so the oracle row is unchanged; the routing path
    # is proven by tests/test_round4_features.py with injected corruption.
    from ..functions import xml as xf

    valid, _dead = xf.validate_rendered(rendered)
    return valid.select(
        "conv_id",
        "version",
        "n_turns",
        F.md5(F.col("doc").cast("binary")).alias("doc_md5"),
    )


# A4/O1 under deliberate skew (the north-star's "salted-key repartitioning
# to defuse hot-conversation skew"): ~half of all change events target ONE
# (conv_id, turn_idx) key, and the merge runs through the production table
# path with hot-key detection enabled, so the salted two-phase register
# aggregation (operators.lww.salted_batch_registers) is exercised
# end-to-end under the oracle — previously pytest-only.
CDC_HOT_KEY_SQL = f"""
WITH ev AS (
  SELECT event_id + 1 AS lsn,
         CASE WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'update'
              ELSE 'insert' END AS op,
         CASE WHEN user_id % 2 = 0 THEN 'conv-hot'
              WHEN user_id % 7 = 0 AND event_type NOT IN ('error','purchase')
              THEN NULL
              ELSE 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') END AS conv_id,
         CAST(CASE WHEN user_id % 2 = 0 THEN 0 ELSE event_id % 25 END AS INT)
           AS turn_idx,
         CASE WHEN event_type <> 'error' THEN event_type END AS role,
         CASE WHEN event_type <> 'error' AND value > 50
              THEN 'v' || CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS VARCHAR) END AS text,
         CASE WHEN event_type <> 'error' AND value > 100 THEN 'hot' END AS tool
  FROM events
),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool
  FROM ev
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM ev2 GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  {_VIS}
FROM agg WHERE lup > ldel
"""


def derive_hot_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic change log with ~50%% of events on one key."""
    ev = _read(spark, sf_dir, "events")
    hot = F.col("user_id") % 2 == 0
    op = (
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .when(F.col("event_type") == "purchase", F.lit("update"))
        .otherwise(F.lit("insert"))
    )
    conv = (
        F.when(hot, F.lit("conv-hot"))
        .when(
            (F.col("user_id") % 7 == 0)
            & ~F.col("event_type").isin("error", "purchase"),
            F.lit(None).cast("string"),
        )
        .otherwise(
            F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0"))
        )
    )
    dec_text = F.concat(
        F.lit("v"),
        F.round(F.col("value"), 2).cast("decimal(18,2)").cast("string"),
    )
    return ev.select(
        (F.col("event_id") + 1).alias("lsn"),
        F.lit("b00").alias("batch_id"),
        op.alias("op"),
        conv.alias("conv_id"),
        F.when(hot, F.lit(0)).otherwise(F.col("event_id") % 25).cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("src_conv_id"),
        F.lit(None).cast("int").alias("src_turn_idx"),
        F.when(F.col("event_type") != "error", F.col("event_type")).alias("role"),
        F.when((F.col("event_type") != "error") & (F.col("value") > 50), dec_text).alias("text"),
        F.when((F.col("event_type") != "error") & (F.col("value") > 100), F.lit("hot")).alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit(None).cast("map<string,string>").alias("extra"),
        F.lit(1).alias("schema_version"),
    )


def q_cdc_hot_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key skew through the PRODUCTION path: merge_batch with hot-key
    detection on, so the per-key count probe fires and the salted
    two-phase register aggregation handles the ~50%%-on-one-key batch
    (exact by the register algebra's associativity — same oracle shape as
    cdc_lww_final_state over the skewed derivation)."""
    from ..table.lake import LakeTable

    events = derive_hot_key_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc_hot_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=8
    )
    applied = table.merge_batch(
        spark, events, fence_key="hot/e0/b00", epoch_id=0, hot_key_threshold=100
    )
    assert applied, "hot-key merge must commit"
    return table.visible(spark)


def q_cdc_maintenance_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table maintenance under the driver oracle: the derived log applied in
    three lsn-ordered fenced commits with REBUCKET (4→16 buckets),
    TOMBSTONE COMPACTION (watermark between chunks) and VACUUM interleaved
    — the final visible state must be EXACTLY the plain LWW fold
    (maintenance must be invisible to readers). Promotes the previously
    pytest-only maintenance surfaces (rebucket: prefix-scoped relayout,
    DeleteAllS3ObjectsByPrefix.kt:115-117; compaction+vacuum:
    deleteOcrWorkFiles, ReorderFiles.kt:276-298) to a driver-checked row.

    Chunks are lsn ranges so the compaction watermark is always ≤ every
    later event's lsn (compaction narrows the safe-replay contract: events
    below the watermark dead-letter rather than resurrect compacted
    deletes — none exist here by construction)."""
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir).persist()
    max_lsn = int(events.agg(F.max("lsn")).first()[0])
    l1, l2 = max_lsn // 3, (2 * max_lsn) // 3
    tmp = tempfile.mkdtemp(prefix="cdc_maint_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=4
    )
    assert table.merge_batch(
        spark, events.filter(F.col("lsn") <= l1),
        fence_key="maint/e0/b00", epoch_id=0,
    )
    table.rebucket(spark, 16)
    assert table.merge_batch(
        spark, events.filter((F.col("lsn") > l1) & (F.col("lsn") <= l2)),
        fence_key="maint/e1/b00", epoch_id=1,
    )
    table.compact_tombstones(spark, lsn_watermark=l2 + 1)
    table.vacuum()
    assert table.merge_batch(
        spark, events.filter(F.col("lsn") > l2),
        fence_key="maint/e2/b00", epoch_id=2,
    )
    # sorted within-bucket rewrite (Iceberg OPTIMIZE/sort-order analogue) —
    # the final read goes through the optimized layout, so the green row
    # proves the rewrite is invisible to readers too
    table.optimize_layout(spark)
    events.unpersist()
    return table.visible(spark)


def q_cdc_continuous_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same oracle as cdc_lww_final_state through the PRODUCTION deployment
    shape: a long-running ProcessingTime stream over a binlog directory
    that GROWS while the stream runs (segments appended live), then a
    graceful stop — the reference's continuously scheduled processor
    (ReorderFiles.kt:330 onTrigger + the NiFi timer driving it).
    Complements cdc_streaming_final_state, which proves the AvailableNow
    drain-and-stop mode over a static directory."""
    from ..fixtures import atomic_append_segment, wait_until, write_binlog_segments
    from ..streaming import runner
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir).persist()
    tmp = tempfile.mkdtemp(prefix="cdc_cont_")
    stage = os.path.join(tmp, "stage")
    seg_paths = write_binlog_segments(events, stage)
    events.unpersist()
    live = os.path.join(tmp, "events")
    os.makedirs(live)

    half = max(1, len(seg_paths) // 2)
    for p in seg_paths[:half]:
        atomic_append_segment(p, live)

    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=8
    )
    q, stats = runner.start_continuous(
        spark, live, table, os.path.join(tmp, "ckpt"), run_id="cont",
        processing_time="200 milliseconds", max_files_per_trigger=2,
    )

    try:
        wait_until(lambda: stats.batches_applied >= half, "initial segments")
        # live append: the stream must pick these up on later triggers
        for p in seg_paths[half:]:
            atomic_append_segment(p, live)
        wait_until(
            lambda: stats.batches_applied >= len(seg_paths),
            "live-appended segments",
        )
    finally:
        runner.stop_gracefully(q, timeout_sec=60.0)
    return table.visible(spark)


# PII scrubbing: a corpus-cleaning pass every training pipeline needs. The
# fixture text has no PII, so both sides SEED deterministic addresses from
# doc_id first — the op under test is that redaction (global regex replace,
# count extraction) agrees exactly between Spark's Java regex and DuckDB's
# RE2 on the same patterns.
_PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_PII_PHONE = "\\+47 [0-9]{4,6}"

DOCS_PII_SCRUB_SQL = f"""
WITH seeded AS (
  SELECT doc_id,
    text || ' contact user' || CAST(doc_id AS VARCHAR)
         || '@mail.example.com tel +47 5550' || CAST(doc_id % 10 AS VARCHAR)
      AS seeded
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  CAST(len(regexp_extract_all(seeded, '{_PII_EMAIL}')) AS INT) AS n_emails,
  CAST(len(regexp_extract_all(seeded, '{_PII_PHONE}')) AS INT) AS n_phones,
  regexp_replace(regexp_replace(seeded, '{_PII_EMAIL}', '<EMAIL>', 'g'),
                 '{_PII_PHONE}', '<PHONE>', 'g') AS scrubbed
FROM seeded
"""


def q_docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com tel +47 5550"),
        (F.col("doc_id") % 10).cast("string"),
    )
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(seeded, F.lit(_PII_EMAIL), F.lit(0)))
        .cast("int").alias("n_emails"),
        F.size(F.regexp_extract_all(seeded, F.lit(_PII_PHONE), F.lit(0)))
        .cast("int").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(seeded, _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE, "<PHONE>",
        ).alias("scrubbed"),
    )


# Repetition signal (the Gopher/C4-style "most frequent word share" filter):
# explode to words, two map-side-combinable aggs. Scales: the shuffle key is
# (doc_id, word) — high cardinality, no skew; per-doc state is O(1).
DOCS_TOP_WORD_SQL = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents WHERE text IS NOT NULL
),
wf AS (
  SELECT doc_id, word, count(*) AS c
  FROM w WHERE word <> '' GROUP BY doc_id, word
)
SELECT doc_id,
  CAST(max(c) AS BIGINT) AS top_word_count,
  CAST(sum(c) AS BIGINT) AS n_words,
  CAST(count(*) AS BIGINT) AS n_unique_words,
  round(max(c) * 1.0 / sum(c), 6) AS top_word_ratio
FROM wf GROUP BY doc_id
"""


def q_docs_top_word_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    wf = words.groupBy("doc_id", "word").count()
    return wf.groupBy("doc_id").agg(
        F.max("count").cast("bigint").alias("top_word_count"),
        F.sum("count").cast("bigint").alias("n_words"),
        F.count("*").cast("bigint").alias("n_unique_words"),
        F.round(F.max("count") * F.lit(1.0) / F.sum("count"), 6)
        .alias("top_word_ratio"),
    )


# --------------------------------------------------------------------------
# round-3 additions: CDC wire format, temporal operators, corpus sampling
# --------------------------------------------------------------------------


def q_cdc_debezium_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-envelope ingest: the derived change log is serialized to
    Debezium JSON envelopes (op c/u/d, before/after row images,
    source.lsn — the binlog/WAL wire format real CDC connectors emit),
    parsed back through ``sources.debezium.parse_debezium`` (one JVM-side
    ``from_json``, no Python, no shuffle added), then folded through the
    same validate → LWW register pipeline as the native path. The oracle
    is CDC_FINAL_STATE_SQL verbatim — proving the envelope adapter is
    lossless end-to-end, the reference's FlowFile-JSON parse seam
    (ReorderFiles.kt:359-366) re-expressed for the Debezium ecosystem."""
    from ..sources import debezium

    events = derive_change_events(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    # Materialize the envelope table before parsing — envelopes are a
    # SOURCE in production (Kafka/file scan; the streaming runner persists
    # each epoch before validate), never a same-plan derivation. Composing
    # serialize→parse→validate lazily is also a plan hazard: predicate
    # pushdown substitutes validate's reason column through the parse
    # projection, cloning the from_json(to_json(...)) tree once per column
    # reference (measured 28 copies in the pushed filter, 9.1 s vs 1.2 s
    # at sf0.1).
    env = debezium.to_debezium(events).localCheckpoint(eager=True)
    parsed = debezium.parse_debezium(env)
    good, _dead = resolve.validate(parsed, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    regs = lww.batch_registers(normalized, CDC_PAYLOAD)
    return lww.visible(regs, CDC_PAYLOAD)


def q_cdc_maxwell_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maxwell-daemon ingest: the derived change log serialized to
    Maxwell JSON lines (type insert/update/delete, full row in ``data``,
    binlog ``position`` — the OTHER de-facto MySQL binlog wire format),
    parsed back through ``sources.maxwell.parse_maxwell`` (one JVM
    from_json + two regexp position extracts, no Python, no shuffle
    added), folded through the shared validate → LWW pipeline. Oracle is
    CDC_FINAL_STATE_SQL verbatim — the adapter is lossless for
    everything the fold reads (lsn via the monotone position embedding,
    op, key, payload; batch_id intentionally renormalizes to Maxwell's
    numeric xid, which the fold never reads). Same materialize-the-
    envelope discipline as the Debezium roundtrip (envelopes are a
    SOURCE in production; lazy serialize→parse→validate also clones the
    from_json tree into pushed filters)."""
    from ..sources import maxwell

    events = derive_change_events(spark, sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    env = maxwell.to_maxwell(events).localCheckpoint(eager=True)
    parsed = maxwell.parse_maxwell(env)
    good, _dead = resolve.validate(parsed, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    regs = lww.batch_registers(normalized, CDC_PAYLOAD)
    return lww.visible(regs, CDC_PAYLOAD)


# Gap sessionization over the raw events stream. Both engines compute the
# boundary flag from the SAME double subtraction (epoch seconds), so the
# strict > comparison agrees even at an exact-1800s gap.
SESSIONIZE_SQL = """
WITH t AS (
  SELECT user_id, ts,
    CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) / 1000000.0
                 - epoch_us(lag(ts) OVER w) / 1000000.0 > 1800.0
         THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      AS session_idx
  FROM t
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
  CAST(count(*) AS BIGINT) AS n_events,
  round(min(epoch_us(ts) / 1000000.0), 6) AS session_start_s,
  round(max(epoch_us(ts) / 1000000.0), 6) AS session_end_s,
  round(max(epoch_us(ts) / 1000000.0) - min(epoch_us(ts) / 1000000.0), 6)
    AS duration_s
FROM s GROUP BY user_id, session_idx
"""


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import temporal

    ev = _read(spark, sf_dir, "events")
    sess = temporal.sessionize(ev, key="user_id", ts_col="ts", gap_minutes=30)
    return sess.select(
        "user_id",
        F.col("session_idx").cast("bigint").alias("session_idx"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.round(
            F.col("session_start").cast("timestamp_ltz").cast("double"), 6
        ).alias("session_start_s"),
        F.round(
            F.col("session_end").cast("timestamp_ltz").cast("double"), 6
        ).alias("session_end_s"),
        "duration_s",
    )


# Native session windows (streaming/sessions.session_window_metrics run in
# batch mode — identical operator, identical semantics) under the oracle.
# Spark's session window is [first_event, last_event + gap): an event at
# EXACTLY last+gap starts a new session, so the oracle's island break is
# `diff >= gap`, not `>`. Complements events_sessionize, which oracle-checks
# the lag+cumsum formulation; this row checks F.session_window itself —
# previously the streaming session operators were pytest-only (VERDICT r3).
SESSION_WINDOWS_SQL = """
WITH e AS (SELECT user_id, ts FROM events WHERE ts IS NOT NULL),
i AS (
  SELECT user_id, ts,
    CASE WHEN epoch(ts) - epoch(lag(ts) OVER (
           PARTITION BY user_id ORDER BY ts)) >= 1800
         THEN 1 ELSE 0 END AS brk
  FROM e
),
isl AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS island
  FROM i
)
SELECT user_id,
  round(epoch(min(ts)), 6) AS session_start_s,
  round(epoch(max(ts)) + 1800.0, 6) AS session_end_s,
  CAST(count(*) AS BIGINT) AS n_events
FROM isl GROUP BY user_id, island
"""


def q_events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F.session_window gap sessions over the batch events table — the
    batch-mode run of the streaming operator (streaming/sessions.py:36),
    which makes the native session-window semantics oracle-checkable.
    One shuffle on the group key; merging happens inside the aggregation."""
    ev = _read(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(
            "user_id", F.session_window(F.col("ts"), "30 minutes").alias("win")
        )
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "user_id",
            F.round(
                F.col("win.start").cast("timestamp_ltz").cast("double"), 6
            ).alias("session_start_s"),
            F.round(
                F.col("win.end").cast("timestamp_ltz").cast("double"), 6
            ).alias("session_end_s"),
            "n_events",
        )
    )


# As-of join: each click event picks up the most recent signup "profile
# value" for its user at or before the click. The oracle mirrors the
# engine's union+window formulation in ANSI SQL (DuckDB's native ASOF JOIN
# would also work; the union form keeps tie semantics explicit).
ASOF_SQL = """
WITH r AS (
  SELECT user_id, ts, round(max(value), 2) AS pv
  FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
),
l AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
),
u AS (
  SELECT event_id, user_id, ts, 1 AS side, NULL::DOUBLE AS pv FROM l
  UNION ALL
  SELECT NULL::BIGINT, user_id, ts, 0, pv FROM r
),
c AS (
  SELECT event_id, side,
    last_value(pv IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS profile_value_asof
  FROM u
)
SELECT l.event_id, l.user_id, c.profile_value_asof
FROM c JOIN l USING (event_id) WHERE c.side = 1
"""


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import temporal

    ev = _read(spark, sf_dir, "events")
    right = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("profile_value"))
    )
    left = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    joined = temporal.asof_join(
        left, right, on=["user_id"], value_cols=["profile_value"]
    )
    return joined.select(
        "event_id", "user_id",
        F.col("profile_value_asof").alias("profile_value_asof"),
    )


def _contamination_sql(k: int = 3) -> str:
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= {k}
         THEN list_transform(range(len(words) - {k - 1}),
                             i -> {_shingle_concat_sql(k)})
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM base
),
bench AS (
  SELECT DISTINCT s AS shingle
  FROM sh, unnest(shingles) AS t(s) WHERE doc_id % 97 = 0
),
corpus AS (
  SELECT doc_id, list_distinct(shingles) AS ds FROM sh WHERE doc_id % 97 <> 0
),
ex AS (
  SELECT doc_id, len(ds) AS n_shingles, s AS shingle
  FROM corpus, unnest(ds) AS t(s)
),
hits AS (
  SELECT doc_id, n_shingles, count(*) AS n_contaminated
  FROM ex JOIN bench USING (shingle) GROUP BY doc_id, n_shingles
)
SELECT doc_id, CAST(n_shingles AS INT) AS n_shingles,
  CAST(n_contaminated AS BIGINT) AS n_contaminated,
  round(n_contaminated / n_shingles, 6) AS contamination_ratio
FROM hits
"""


CONTAMINATION_SQL = _contamination_sql()


def q_docs_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check (the eval-leakage scan every training
    corpus needs): docs sharing word k-grams with a held-out benchmark set
    (here: every 97th doc). Plan shape for 100 TB: the benchmark shingle
    set is small → broadcast hash join against the exploded corpus
    shingles; the groupBy has map-side combine on (doc_id, n_shingles).
    The corpus side is never self-joined and never collected."""
    # spread the single-file test scan before the per-doc shingling (a real
    # corpus scan already has many partitions); measured 10x on the
    # shingle stage at sf0.1 (7.2 s -> 0.7 s, local[32])
    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    # materialize the shingle projection ONCE: it feeds both the
    # benchmark branch and the corpus branch — without this the shingle
    # regex pipeline runs twice per pass (the q_docs_winnowing_pairs
    # localCheckpoint pattern; VERDICT r4 "What's wrong #2")
    sh = docs.select(
        "doc_id", dedup.word_shingles(F.col("text"), 3).alias("shingles")
    ).localCheckpoint(eager=True)
    bench_sh = (
        sh.filter(F.col("doc_id") % 97 == 0)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    corpus = (
        sh.filter(F.col("doc_id") % 97 != 0)
        .select(
            "doc_id",
            F.size(F.array_distinct("shingles")).alias("n_shingles"),
            F.explode(F.array_distinct("shingles")).alias("shingle"),
        )
    )
    hits = (
        corpus.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "n_shingles")
        .agg(F.count("*").alias("n_contaminated"))
    )
    return hits.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_shingles"), 6).alias(
            "contamination_ratio"
        ),
    )


# Deterministic stratified sampling: per (lang, source) stratum keep the 5
# docs ranked by md5(doc_id) — a replay-stable pseudo-random order both
# engines compute identically. The window sorts within strata only (the
# shuffle key is the stratum), so at corpus scale no global sort exists.
STRATIFIED_SAMPLE_SQL = """
WITH ranked AS (
  SELECT doc_id, lang, source,
    row_number() OVER (PARTITION BY lang, source
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
      AS sample_rank
  FROM documents
)
SELECT doc_id, lang, source, CAST(sample_rank AS INT) AS sample_rank
FROM ranked WHERE sample_rank <= 5
"""


def q_docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.select(
            "doc_id", "lang", "source",
            F.row_number().over(w).cast("int").alias("sample_rank"),
        )
        .filter(F.col("sample_rank") <= 5)
    )


# Token-budget data mixing: even-indexed sources get an 800-token budget,
# odd-indexed 300 (a realistic asymmetric mixture; every source ends
# partially sampled at sf>=0.01 since each holds ~1.3k tokens).
_MIX_BUDGETS = {f"src{i}": (800 if i % 2 == 0 else 300) for i in range(20)}

DOCS_TOKEN_MIXTURE_SQL = r"""
WITH t AS (
  SELECT doc_id, source,
    CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                         w -> w <> '')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
r AS (
  SELECT doc_id, source, n_tokens,
    CAST(SUM(n_tokens) OVER (PARTITION BY source
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS cum_tokens
  FROM t
)
SELECT doc_id, source, n_tokens, cum_tokens FROM r
WHERE cum_tokens <= CASE
  WHEN CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % 2 = 0 THEN 800
  ELSE 300 END
"""


def q_docs_token_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing step (shard.mixture_sample): per-source md5-ordered
    prefix under an asymmetric token budget (even sources 800, odd 300).
    The oracle expresses the same budgets arithmetically; the engine
    takes them as the dict a real mixture spec would be."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    t = docs.select(
        "doc_id", "source", F.size(words).cast("long").alias("n_tokens")
    )
    from ..operators import shard

    return shard.mixture_sample(t, _MIX_BUDGETS)


# Global vocabulary top-k: the classic two-phase pattern — partial counts
# map-side, one shuffle on the word, then TakeOrderedAndProject for the
# top slice (no global sort materialization). (count DESC, word ASC) is a
# total order because word is the group key, so LIMIT is deterministic.
VOCAB_TOPK_SQL = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT word, CAST(count(*) AS BIGINT) AS n_occurrences
  FROM w WHERE word <> '' GROUP BY word
)
SELECT word, n_occurrences FROM c
ORDER BY n_occurrences DESC, word LIMIT 50
"""


def q_docs_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = docs.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    counts = words.groupBy("word").agg(
        F.count("*").cast("bigint").alias("n_occurrences")
    )
    return counts.orderBy(F.desc("n_occurrences"), F.asc("word")).limit(50)


# Change data feed: net row-level diff between two committed snapshots
# (Delta CDF / Iceberg incremental read analogue). The oracle folds the
# event prefix (batches b00..b03 — lsn % 5 <> 0) and the full log, then
# classifies the keyed diff into insert/delete/update_preimage/
# update_postimage exactly like LakeTable.table_changes.
def _cdc_state_ctes(name: str, where: str) -> str:
    return f"""
{name}_agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM ev2 {where} GROUP BY conv_id, turn_idx
),
{name} AS (
  SELECT conv_id, turn_idx,
  {_VIS}
  FROM {name}_agg WHERE lup > ldel
)"""


_TC_DIFF = (
    "(o_role IS DISTINCT FROM n_role OR o_text IS DISTINCT FROM n_text "
    "OR o_tool IS DISTINCT FROM n_tool)"
)

CDC_TABLE_CHANGES_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool
  FROM ev
),
{_cdc_state_ctes("s_old", "WHERE lsn % 5 <> 0")},
{_cdc_state_ctes("s_new", "")},
j AS (
  SELECT coalesce(s_old.conv_id, s_new.conv_id) AS conv_id,
         coalesce(s_old.turn_idx, s_new.turn_idx) AS turn_idx,
         s_old.conv_id IS NOT NULL AS in_old,
         s_new.conv_id IS NOT NULL AS in_new,
         s_old.role AS o_role, s_old.text AS o_text, s_old.tool AS o_tool,
         s_new.role AS n_role, s_new.text AS n_text, s_new.tool AS n_tool
  FROM s_old FULL OUTER JOIN s_new
    ON s_old.conv_id = s_new.conv_id AND s_old.turn_idx = s_new.turn_idx
)
SELECT conv_id, turn_idx, 'insert' AS change_type,
       n_role AS role, n_text AS text, n_tool AS tool
FROM j WHERE NOT in_old AND in_new
UNION ALL
SELECT conv_id, turn_idx, 'delete', o_role, o_text, o_tool
FROM j WHERE in_old AND NOT in_new
UNION ALL
SELECT conv_id, turn_idx, 'update_preimage', o_role, o_text, o_tool
FROM j WHERE in_old AND in_new AND {_TC_DIFF}
UNION ALL
SELECT conv_id, turn_idx, 'update_postimage', n_role, n_text, n_tool
FROM j WHERE in_old AND in_new AND {_TC_DIFF}
"""


def q_cdc_table_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five fenced commits (one per producer batch) onto a LakeTable, then
    ``table_changes`` between the snapshot after b03 and the snapshot
    after b04 — the incremental-read contract a downstream consumer uses
    to refresh from version A to B without a full rescan. Bucket-level
    copy-on-write means only buckets whose file lists differ between the
    two manifests are read (here b04 touches most buckets; a narrow
    commit would prune almost everything)."""
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir).persist()
    tmp = tempfile.mkdtemp(prefix="cdc_tc_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=8
    )
    for b in ["b00", "b01", "b02", "b03", "b04"]:
        table.merge_batch(
            spark,
            events.filter(F.col("batch_id") == b),
            fence_key=f"batch-{b}",
            batch_id=b,
        )
        if b == "b03":
            v_from = table._head_version()
    v_to = table._head_version()
    events.unpersist()
    return table.table_changes(spark, v_from, v_to)


def q_cdc_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (operators/ivm.py): bootstrap the
    per-conversation rollup from the snapshot after b03, then refresh it
    to the post-b04 view using ONLY the b03→b04 change feed — never
    re-reading the table. The DuckDB oracle full-recomputes the rollup
    over the complete replay, so a green row proves
    maintain(rollup(v_from), changes) ≡ rollup(v_to) end-to-end through
    the real commit/CDF machinery."""
    from ..operators import ivm
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir).persist()
    tmp = tempfile.mkdtemp(prefix="cdc_ivm_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=8
    )
    for b in ["b00", "b01", "b02", "b03", "b04"]:
        table.merge_batch(
            spark,
            events.filter(F.col("batch_id") == b),
            fence_key=f"batch-{b}",
            batch_id=b,
        )
        if b == "b03":
            v_from = table._head_version()
    v_to = table._head_version()
    events.unpersist()
    prev = ivm.conv_rollup(table.visible_at(spark, v_from))
    changes = table.table_changes(spark, v_from, v_to)
    return ivm.maintain_rollup(prev, changes)


def q_cdc_forget_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GDPR right-to-be-forgotten (table/lake.py erase_keys): build the
    transcripts table through five fenced commits, then physically erase
    every conversation whose hash64 lands in a deterministic residue
    class (standing in for the data subject's conversations) — a
    bucket-pruned rewrite plus a history purge that makes pre-erasure
    snapshots unreadable by design. The oracle replays the full log and
    merely filters, so a green row proves erasure removed exactly the
    requested keys and nothing else. The driver-side key list is the real
    contract (an erasure request is per-data-subject, a handful of keys,
    never data-sized)."""
    from ..operators.dedup import hash64
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir).persist()
    tmp = tempfile.mkdtemp(prefix="cdc_forget_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=8
    )
    for b in ["b00", "b01", "b02", "b03", "b04"]:
        table.merge_batch(
            spark,
            events.filter(F.col("batch_id") == b),
            fence_key=f"batch-{b}",
            batch_id=b,
        )
    events.unpersist()
    forget = [
        r[0]
        for r in table.visible(spark)
        .select("conv_id")
        .distinct()
        .filter(hash64(F.col("conv_id")) % 13 == 5)
        .collect()
    ]
    table.erase_keys(spark, forget)
    return table.visible(spark)


CDC_FORGET_KEYS_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL})
SELECT * FROM final
WHERE ('0x' || substr(md5(conv_id), 1, 15))::INT64 % 13 <> 5
"""


CDC_INCREMENTAL_ROLLUP_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL})
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(sum(coalesce(length(text), 0)) AS BIGINT) AS total_chars,
  CAST(sum(CASE WHEN tool IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_tool_turns
FROM final GROUP BY conv_id
"""


# --------------------------------------------------------------------------
# corpus operators (round-3 batch 2): boilerplate detection, repetition
# signals, balanced token shards
# --------------------------------------------------------------------------


def _boilerplate_sql(k: int = 4, min_docs: int = 3) -> str:
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= {k}
         THEN list_transform(range(len(words) - {k - 1}),
                             i -> {_shingle_concat_sql(k)})
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM base
),
ex AS (
  SELECT doc_id, s AS shingle
  FROM sh, unnest(list_distinct(shingles)) AS t(s)
),
bp AS (
  SELECT shingle FROM ex GROUP BY shingle
  HAVING count(DISTINCT doc_id) >= {min_docs}
),
per_doc AS (
  SELECT doc_id, count(*) AS n_shingles FROM ex GROUP BY doc_id
),
hits AS (
  SELECT e.doc_id, count(*) AS n_boilerplate
  FROM ex e JOIN bp USING (shingle) GROUP BY e.doc_id
)
SELECT p.doc_id,
  CAST(p.n_shingles AS BIGINT) AS n_shingles,
  CAST(coalesce(h.n_boilerplate, 0) AS BIGINT) AS n_boilerplate,
  round(coalesce(h.n_boilerplate, 0) * 1.0 / p.n_shingles, 6)
    AS boilerplate_ratio
FROM per_doc p LEFT JOIN hits h ON p.doc_id = h.doc_id
"""


BOILERPLATE_SQL = _boilerplate_sql()


def q_docs_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate detection (the CCNet/RefinedWeb step that
    strips navigation chrome and license footers): a word 4-gram occurring
    in >= 3 distinct documents is boilerplate; each doc reports what
    fraction of its distinct shingles are boilerplate. 100-TB plan shape:
    one shuffle keyed on the shingle (high cardinality, no skew) finds the
    boilerplate set, which is SMALL by construction (only shingles shared
    across docs) -> broadcast back against the exploded corpus; both
    per-doc groupBys map-side combine. The corpus is never self-joined.
    Reference analogue: the shared-key dedup before expensive sink ops
    (RenameS3Utils.kt:52), lifted from instruction pairs to shingles."""
    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        # spread the single-file test scan before per-doc shingling
        .repartition(spark.sparkContext.defaultParallelism)
    )
    ex = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(dedup.word_shingles(F.col("text"), 4))
        ).alias("shingle"),
    )
    # Single scan, two shuffles: a count window keyed on the shingle marks
    # each (doc, shingle) row as boilerplate-or-not in place (each pair is
    # distinct, so count(*) over the shingle == count(distinct doc)), then
    # one map-side-combinable groupBy on doc_id folds both tallies. The
    # alternative (groupBy shingle -> broadcast join back) re-derives the
    # exploded corpus per consumer — 3 scans and a driver-collected
    # broadcast of a computed aggregate; measured 6x slower at sf0.01.
    nd = F.count("*").over(Window.partitionBy("shingle"))
    marked = ex.select("doc_id", (nd >= 3).cast("int").alias("is_bp"))
    agg = marked.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.sum("is_bp").alias("n_boilerplate"),
    )
    return agg.select(
        "doc_id",
        F.col("n_shingles").cast("bigint").alias("n_shingles"),
        F.col("n_boilerplate").cast("bigint").alias("n_boilerplate"),
        F.round(
            F.col("n_boilerplate") * F.lit(1.0) / F.col("n_shingles"), 6
        ).alias("boilerplate_ratio"),
    )


def _rep_gram_sql(k: int) -> str:
    join = " || ' ' || ".join(f"words[i+{j + 1}]" for j in range(k))
    return (
        f"CASE WHEN len(words) >= {k} "
        f"THEN list_transform(range(len(words) - {k - 1}), i -> {join}) "
        f"ELSE [] END"
    )


REPETITION_SQL = rf"""
WITH base AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                w -> w <> '') AS words
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id, words,
    {_rep_gram_sql(2)} AS g2,
    {_rep_gram_sql(3)} AS g3
  FROM base
)
SELECT doc_id,
  CAST(len(words) AS BIGINT) AS n_words,
  round(CASE WHEN len(words) > 0
        THEN 1.0 - len(list_distinct(words)) * 1.0 / len(words)
        ELSE 0.0 END, 6) AS dup_word_ratio,
  round(CASE WHEN len(g2) > 0
        THEN 1.0 - len(list_distinct(g2)) * 1.0 / len(g2)
        ELSE 0.0 END, 6) AS dup_2gram_ratio,
  round(CASE WHEN len(g3) > 0
        THEN 1.0 - len(list_distinct(g3)) * 1.0 / len(g3)
        ELSE 0.0 END, 6) AS dup_3gram_ratio
FROM g
"""


def _word_grams(words, k: int):
    n = F.size(words)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(
                " ",
                *[F.element_at(words, (i + j + 1).cast("int")) for j in range(k)],
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _dup_ratio(grams):
    n = F.size(grams)
    return F.round(
        F.when(
            n > 0,
            F.lit(1.0) - F.size(F.array_distinct(grams)) * F.lit(1.0) / n,
        ).otherwise(F.lit(0.0)),
        6,
    )


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (the Gopher repetition filters:
    duplicate word / 2-gram / 3-gram fractions). Pure narrow projection —
    every ratio is computed inside one whole-stage-codegen'd expression
    over the row's own token array, NO explode, NO shuffle, so at 100 TB
    this is a single scan at IO speed. Reference analogue: the per-file
    enrichment shape of Jhove.onTrigger (Jhove.kt:449-516), columnar."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    d = docs.select("doc_id", words.alias("words"))
    return d.select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        _dup_ratio(F.col("words")).alias("dup_word_ratio"),
        _dup_ratio(_word_grams(F.col("words"), 2)).alias("dup_2gram_ratio"),
        _dup_ratio(_word_grams(F.col("words"), 3)).alias("dup_3gram_ratio"),
    )


TOKEN_SHARDS_SQL = r"""
WITH t AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                    w -> w <> '')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens AS cum_before
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(floor(cum_before / 2000.0) AS INT) AS shard_id
FROM c
"""


def q_docs_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training-shard assignment: greedy-pack docs (in doc_id
    order) into ~2000-token shards. The oracle's single global window is
    exactly what the engine must NOT do at scale — operators/shard.py runs
    the distributed two-phase prefix sum instead (per-chunk totals ->
    bounded driver fold -> broadcast offsets -> within-chunk window), and
    this oracle row proves the two formulations agree bit-for-bit."""
    from ..operators import shard

    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    t = docs.select(
        "doc_id", F.size(words).cast("bigint").alias("n_tokens")
    )
    out = shard.balanced_shards(
        t, "doc_id", "n_tokens", target_weight=2000, ids_per_chunk=64
    )
    return out.select("doc_id", "n_tokens", "shard_id")


def _incremental_dedup_sql(n_hashes: int = 4, n_bands: int = 2, k: int = 3,
                           threshold: float = 0.5) -> str:
    # Mirrors dedup.incremental_near_dups: split documents into an existing
    # corpus (doc_id % 5 <> 0) and an incoming epoch (doc_id % 5 = 0);
    # classify each incoming doc exact/near/novel against the corpus only.
    mh = ",\n    ".join(
        "list_min(list_transform(hs, x -> (x * {a} + {b}) % {p})) AS m{i}".format(
            a=dedup.mh_consts(i)[0], b=dedup.mh_consts(i)[1], p=dedup.MH_P, i=i
        )
        for i in range(n_hashes)
    )
    rows = n_hashes // n_bands
    band_selects = []
    for b in range(n_bands):
        cols = " || '|' || ".join(
            f"CAST(m{b * rows + r} AS VARCHAR)" for r in range(rows)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash FROM sig"
        )
    bands = "\n  UNION ALL\n  ".join(band_selects)
    return rf"""
WITH d AS (SELECT doc_id, text FROM documents WHERE text IS NOT NULL),
eh AS (SELECT doc_id, md5(text) AS h FROM d),
exact AS (
  SELECT i.doc_id AS doc_id, min(c.doc_id) AS exact_match_id
  FROM eh i JOIN eh c ON i.h = c.h AND c.doc_id % 5 <> 0
  WHERE i.doc_id % 5 = 0
  GROUP BY i.doc_id
),
base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM d
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(words) >= {k}
         THEN list_transform(range(len(words) - {k - 1}),
                             i -> {_shingle_concat_sql(k)})
         ELSE [array_to_string(words, ' ')] END AS shingles
  FROM base
),
hb AS (
  SELECT doc_id, shingles,
    list_transform(shingles,
                   s -> ('0x' || substr(md5(s), 1, 15))::INT64 % {dedup.MH_P}) AS hs
  FROM sh
),
sig AS (SELECT doc_id, shingles, {mh} FROM hb),
bands AS (
  {bands}
),
cand AS (
  SELECT DISTINCT a.doc_id AS in_id, b.doc_id AS co_id
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_hash = b.band_hash
  WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
),
j AS (
  SELECT c.in_id, c.co_id,
    round(len(list_intersect(sa.shingles, sb.shingles))
          / greatest(len(list_distinct(list_concat(sa.shingles, sb.shingles))), 1), 6) AS jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.in_id
  JOIN sig sb ON sb.doc_id = c.co_id
),
near AS (
  SELECT in_id, co_id AS near_match_id, jaccard AS near_jaccard
  FROM (
    SELECT *, row_number() OVER (PARTITION BY in_id
                                 ORDER BY jaccard DESC, co_id) AS rn
    FROM j WHERE jaccard >= {threshold}
  ) WHERE rn = 1
)
SELECT i.doc_id,
  CASE WHEN i.text IS NULL THEN 'invalid'
       WHEN e.exact_match_id IS NOT NULL THEN 'exact'
       WHEN n.near_match_id IS NOT NULL THEN 'near'
       ELSE 'novel' END AS verdict,
  CASE WHEN i.text IS NULL THEN NULL
       WHEN e.exact_match_id IS NOT NULL THEN e.exact_match_id
       ELSE n.near_match_id END AS match_id,
  CASE WHEN i.text IS NULL THEN NULL
       WHEN e.exact_match_id IS NULL THEN n.near_jaccard END AS jaccard
FROM (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0) i
LEFT JOIN exact e ON e.doc_id = i.doc_id
LEFT JOIN near n ON n.in_id = i.doc_id
"""


DOCS_INCREMENTAL_DEDUP_SQL = _incremental_dedup_sql()


def q_docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Novelty filter for continuous ingest (the per-epoch dedup shape of a
    crawling pipeline): classify an incoming batch (doc_id % 5 = 0) against
    the already-ingested corpus as exact / near / novel. The corpus is only
    touched through two equi-joins (exact hash, LSH band table) — at 100 TB
    those are precomputed signature tables and the incoming epoch is the
    broadcast-eligible small side. Null-text incoming rows get
    verdict='invalid' (dead-letter route) rather than leaking out as
    'novel' — ADVICE r3. See dedup.incremental_near_dups."""
    docs = (
        _read(spark, sf_dir, "documents")
        # spread the single-file test scan before per-doc hashing/shingling
        .repartition(spark.sparkContext.defaultParallelism)
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    return dedup.incremental_near_dups(
        corpus, incoming, "doc_id", "text",
        n_hashes=4, n_bands=2, jaccard_threshold=0.5, k=3,
        hash_mode="oracle", materialize=True,
    )


# Int8 scalar quantization of the embedding column — the vector-compression
# pass an embedding-heavy pipeline runs before shipping vectors to an ANN
# index (4x smaller, cache-resident distance kernels). Two-phase plan: one
# global per-dimension min/range aggregate (a single reduce of 2*dims
# doubles), broadcast to a narrow zip_with projection — no shuffle of the
# vector table itself, and the stats row is the only thing that moves.
EMBEDDING_QUANTIZE_SQL = """
WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE embedding IS NOT NULL),
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM e
),
mm AS (SELECT i, min(x) AS mn, max(x) - min(x) AS r FROM u GROUP BY i),
q AS (
  SELECT u.vec_id, u.i,
    CASE WHEN r > 0
         THEN CAST(floor((x - mn) / r * 255 + 0.5) AS INT) - 128
         ELSE 0 END AS qi
  FROM u JOIN mm USING (i)
)
SELECT vec_id, string_agg(CAST(qi AS VARCHAR), '|' ORDER BY i) AS qvec
FROM q GROUP BY vec_id
"""

def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _read(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    # dims probed from the data (one-row action), not hardcoded — a fixture
    # with a different width would otherwise silently drop dims beyond the
    # constant (or error under ANSI element_at on shorter vectors) and
    # diverge from the oracle's unnest, which handles any width (ADVICE r3).
    # Ragged widths still fail loudly: ANSI element_at errors on a vector
    # shorter than the probed width instead of quantizing a truncation.
    dims = _embedding_dims(emb)
    if dims is None:
        raise ValueError("embedding_quantize: no non-null embeddings to probe dims")
    e = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("x"),
    )
    # global per-dim stats: one reduce producing a single 2-array row; the
    # oracle's unnest+groupBy formulation is exactly what this avoids at
    # scale (it shuffles |rows|*dims cells — here nothing shuffles but the
    # 1-row stats)
    mm = e.agg(
        F.array(
            *[F.min(F.element_at("x", i + 1)) for i in range(dims)]
        ).alias("mns"),
        F.array(
            *[
                F.max(F.element_at("x", i + 1))
                - F.min(F.element_at("x", i + 1))
                for i in range(dims)
            ]
        ).alias("rngs"),
    )
    q = e.crossJoin(F.broadcast(mm))
    centered = F.zip_with("x", "mns", lambda x, mn: x - mn)
    qi = F.zip_with(
        centered,
        F.col("rngs"),
        lambda t, r: F.when(
            r > 0, F.floor(t / r * 255 + 0.5).cast("int") - 128
        ).otherwise(F.lit(0)),
    )
    return q.select(
        "vec_id",
        F.concat_ws(
            "|", F.transform(qi, lambda v: v.cast("string"))
        ).alias("qvec"),
    )


# Corpus length-distribution calibration: per-language exact percentiles of
# document length — the stats pass that sets quality-filter thresholds.
# Exact (not approx) so the oracle matches bit-for-bit; at 100 TB swap
# F.percentile for F.percentile_approx with a pinned accuracy and drop the
# oracle row to rows-only (documented trade, same plan shape: one shuffle
# on the group key with partial aggregation).
DOCS_LENGTH_PERCENTILES_SQL = """
SELECT lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  round(quantile_cont(n_chars, 0.5), 6) AS p50,
  round(quantile_cont(n_chars, 0.9), 6) AS p90,
  round(quantile_cont(n_chars, 0.99), 6) AS p99
FROM documents
GROUP BY lang
"""


def q_docs_length_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.round(F.percentile("n_chars", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("n_chars", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("n_chars", F.lit(0.99)), 6).alias("p99"),
    )


def _span_dedup_sql(k: int = 3, min_docs: int = 2) -> str:
    # Mirrors dedup.span_dedup: hash every word k-gram (md5-prefix hash,
    # bit-identical to hash_mode='oracle'), grams in >= min_docs distinct
    # docs are duplicated, then gap-and-island merges overlapping gram
    # intervals [p, p+k-1] per doc (break when the gap exceeds k).
    return rf"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM documents WHERE text IS NOT NULL
),
sh AS (
  SELECT doc_id,
    list_transform(range(len(words) - {k - 1}), i -> {_shingle_concat_sql(k)}) AS grams
  FROM base WHERE len(words) >= {k}
),
g AS (
  SELECT doc_id, generate_subscripts(grams, 1) - 1 AS pos,
    ('0x' || substr(md5(unnest(grams)), 1, 15))::INT64 AS gh
  FROM sh
),
rep AS (
  SELECT gh FROM (SELECT DISTINCT gh, doc_id FROM g)
  GROUP BY gh HAVING count(*) >= {min_docs}
),
d AS (SELECT g.doc_id, g.pos FROM g JOIN rep USING (gh)),
i AS (
  SELECT doc_id, pos,
    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > {k}
         THEN 1 ELSE 0 END AS brk
  FROM d
),
isl AS (
  SELECT doc_id, pos,
    sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                   ROWS UNBOUNDED PRECEDING) AS island
  FROM i
)
SELECT doc_id, CAST(min(pos) AS INT) AS span_start,
       CAST(max(pos) + {k - 1} AS INT) AS span_end,
       CAST(count(*) AS BIGINT) AS n_grams
FROM isl GROUP BY doc_id, island
"""


DOCS_SPAN_DEDUP_SQL = _span_dedup_sql()


# span application: cut the detected spans out of each doc. clean_text is
# whitespace-normalized lowercase (the space span indices live in); DuckDB
# list lambdas are 1-indexed, hence the i - 1. Spans embed as a WITH-in-CTE
# subquery (the DOCS_DEDUP_CLUSTERS_SQL pattern).
DOCS_SPAN_CLEAN_SQL = f"""
WITH spans AS ({DOCS_SPAN_DEDUP_SQL}),
sp AS (
  SELECT doc_id, list({{'s': span_start, 'e': span_end}}) AS ss
  FROM spans GROUP BY doc_id
),
base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS words
  FROM documents WHERE text IS NOT NULL
),
j AS (
  SELECT b.doc_id, b.words, sp.ss,
    CASE WHEN sp.ss IS NULL THEN b.words
         ELSE list_filter(b.words, (w, i) ->
           NOT len(list_filter(sp.ss, s -> s.s <= i - 1 AND i - 1 <= s.e)) > 0)
    END AS kept
  FROM base b LEFT JOIN sp ON sp.doc_id = b.doc_id
)
SELECT doc_id, coalesce(array_to_string(kept, ' '), '') AS clean_text,
       CAST(len(words) - len(kept) AS BIGINT) AS n_removed
FROM j
"""
# ^ coalesce: DuckDB's array_to_string([]) is NULL, Spark's array_join([])
#   is '' — a fully-removed doc must agree as the empty string


def q_docs_span_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """span_dedup detection APPLIED: documents with their cross-doc
    duplicated spans cut out — the end product of paragraph-level dedup.
    See dedup.strip_spans."""
    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    spans = dedup.span_dedup(
        docs, "doc_id", "text", k=3, min_docs=2, hash_mode="oracle"
    )
    return dedup.strip_spans(docs, spans, "doc_id", "text")


def q_docs_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated-SPAN detection (paragraph/substring-level
    dedup) — doc-level dedup can't see a boilerplate paragraph shared by
    otherwise-distinct documents; this emits the exact word spans to cut.
    Two shuffles total (gram-hash agg, per-doc window); the gram table is
    linear in corpus tokens and nothing self-joins. See dedup.span_dedup."""
    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return dedup.span_dedup(
        docs, "doc_id", "text", k=3, min_docs=2, hash_mode="oracle"
    )


PACK_SEQUENCES_SQL = r"""
WITH t AS (
  SELECT doc_id,
    len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                    w -> w <> '')) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n,
    CAST(sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
         - n_tokens AS BIGINT) AS o
  FROM t WHERE n_tokens > 0
),
s AS (
  SELECT doc_id, n, o,
    unnest(generate_series(o // 256, (o + n - 1) // 256)) AS seq_id
  FROM c
)
SELECT CAST(seq_id AS INT) AS seq_id, doc_id,
  CAST(greatest(0, seq_id * 256 - o) AS BIGINT) AS doc_tok_start,
  CAST(least(n, (seq_id + 1) * 256 - o) AS BIGINT) AS doc_tok_end,
  CAST(greatest(0, o - seq_id * 256) AS BIGINT) AS seq_pos_start,
  CAST(least(n, (seq_id + 1) * 256 - o)
       - greatest(0, seq_id * 256 - o) AS BIGINT) AS n_toks
FROM s
"""


def q_docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-context training-sequence packing (concat-and-chunk): docs
    are concatenated in doc_id order and the token stream is cut every
    256 tokens — one row per (sequence, doc) overlap with exact token
    spans on both sides. The oracle's single global window is exactly
    what the engine must NOT do at 10^10 tokens; operators/shard.py's
    pack_sequences runs the distributed two-phase prefix sum instead
    (same machinery as docs_token_shards) and this row proves the two
    formulations agree bit-for-bit, explode fan-out included."""
    from ..operators import shard

    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    t = docs.select(
        "doc_id", F.size(words).cast("bigint").alias("n_tokens")
    )
    out = shard.pack_sequences(
        t, "doc_id", "n_tokens", ctx_len=256, ids_per_chunk=64
    )
    return out.select(
        "seq_id", "doc_id", "doc_tok_start", "doc_tok_end",
        "seq_pos_start", "n_toks",
    )


CHUNK_OVERLAP_SQL = r"""
WITH t AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                w -> w <> '') AS words
  FROM documents WHERE text IS NOT NULL
),
n AS (
  SELECT doc_id, words, CAST(len(words) AS BIGINT) AS n
  FROM t WHERE len(words) > 0
),
s AS (
  SELECT doc_id, words, n,
    unnest(generate_series(0, n - 1, 48)) AS tok_start
  FROM n
)
SELECT doc_id,
  CAST(tok_start // 48 AS INT) AS chunk_idx,
  CAST(tok_start AS BIGINT) AS tok_start,
  CAST(least(64, n - tok_start) AS BIGINT) AS n_toks,
  array_to_string(words[tok_start + 1 : tok_start + 64], ' ') AS chunk_text
FROM s
"""


def q_docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (the RAG / retrieval-index
    prep step): every doc is cut into 64-token chunks at stride 48 (25%
    overlap), emitting chunk index, token span, and the chunk text
    itself. Pure narrow projection — tokenize once, one explode whose
    fan-out is ceil(n/stride) (proportional to output), slice+join per
    chunk, zero shuffle, so at 100 TB this runs at scan speed. Reference
    analogue: the per-file page segmentation of ReorderFiles.kt:125-140,
    re-expressed as in-row token windows."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    width, stride = 64, 48
    d = (
        docs.select("doc_id", words.alias("words"))
        .withColumn("n", F.size("words").cast("long"))
        .filter(F.col("n") > 0)
    )
    starts = F.sequence(
        F.lit(0).cast("long"), F.col("n") - 1, F.lit(stride).cast("long")
    )
    e = d.select(
        "doc_id", "words", "n", F.explode(starts).alias("tok_start")
    )
    return e.select(
        "doc_id",
        F.expr(f"CAST(tok_start DIV {stride} AS INT)").alias("chunk_idx"),
        F.col("tok_start"),
        F.least(F.lit(width).cast("long"), F.col("n") - F.col("tok_start"))
        .alias("n_toks"),
        F.array_join(
            F.slice(
                F.col("words"),
                (F.col("tok_start") + 1).cast("int"),
                width,
            ),
            " ",
        ).alias("chunk_text"),
    )


CONV_TRAINING_EXAMPLES_SQL_TMPL = r"""
SELECT conv_id, turn_idx, context, target FROM (
  SELECT conv_id, turn_idx, role, text AS target,
    coalesce(
      string_agg(coalesce(role, '') || '|' || coalesce(text, ''), chr(10))
        OVER (PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING),
      '') AS context
  FROM ( {final_state} )
)
WHERE role = 'purchase'
"""


def q_conv_training_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fine-tuning example extraction over the applied transcripts
    table: for every completion-role turn, emit (context, target) where
    context is the previous up-to-4 turns rendered 'role|text' — the
    standard "conversation → SFT pairs" step of an LLM training
    pipeline (the fixture's role vocabulary stands in for
    user/assistant; 'purchase' is the completion role). One window
    partitioned by conversation (bounded frames — conversations are
    bounded, never corpus-sized), order inside the frame fixed by
    turn_idx, so the plan is the single-shuffle per-conversation shape
    that survives 10^10 turns. Empty context (a conversation-opening
    completion) renders as '' on both engines."""
    final = q_cdc_lww_final_state(spark, sf_dir)
    fmt = F.concat(
        F.coalesce(F.col("role"), F.lit("")),
        F.lit("|"),
        F.coalesce(F.col("text"), F.lit("")),
    )
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-4, -1)
    )
    return (
        final.select(
            "conv_id",
            "turn_idx",
            "role",
            F.col("text").alias("target"),
            F.array_join(F.collect_list(fmt).over(w), "\n").alias("context"),
        )
        .filter(F.col("role") == "purchase")
        .select("conv_id", "turn_idx", "context", "target")
    )


DOCS_SHUFFLE_SQL = r"""
WITH h AS (
  SELECT doc_id,
    md5('shuffle|' || CAST(doc_id AS VARCHAR)) AS hkey,
    ('0x' || substr(md5('shuffle|' || CAST(doc_id AS VARCHAR)), 1, 15))::INT64
      % 16 AS shard_id
  FROM documents
)
SELECT doc_id, CAST(shard_id AS INT) AS shard_id,
  CAST(row_number() OVER (PARTITION BY shard_id ORDER BY hkey, doc_id) - 1
       AS BIGINT) AS pos
FROM h
"""


def q_docs_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle (the pre-training "shuffle then
    shard" step) — see operators/shard.py shuffle_positions for the
    scale contract (windows partitioned by shard, never global)."""
    from ..operators import shard

    return shard.shuffle_positions(
        _read(spark, sf_dir, "documents"), "doc_id", n_shards=16
    )


DOCS_OOV_RATE_SQL = r"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       w -> w <> '')) AS w
  FROM documents WHERE text IS NOT NULL
),
vocab AS (
  SELECT w FROM toks GROUP BY w ORDER BY count(*) DESC, w LIMIT 50
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
  round(CAST(count(*) FILTER (WHERE w NOT IN (SELECT w FROM vocab))
             AS DOUBLE) / count(*), 6) AS oov_rate
FROM toks GROUP BY doc_id
"""


def q_docs_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary coverage: per-doc out-of-vocabulary token
    rate against the corpus's own top-50 vocabulary — the "will this
    tokenizer shred the corpus" health metric of a training pipeline.
    Two passes, both the 100-TB shape: (1) vocab = one map-side-
    combinable word count + TakeOrderedAndProject, collected as BOUNDED
    driver metadata (|vocab| rows — same class as k-means centroids);
    (2) scoring = a pure narrow projection testing each token against
    the vocab LITERAL (zero shuffle beyond the vocab agg, no explode in
    the scoring pass). Ties in vocab rank break by word, so the vocab
    set is replay-stable."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    words = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda w: w != ""
    )
    d = docs.select("doc_id", words.alias("words")).filter(
        F.size("words") > 0
    )
    vocab_rows = (
        d.select(F.explode("words").alias("w"))
        .groupBy("w")
        .count()
        .orderBy(F.col("count").desc(), F.col("w").asc())
        .limit(50)
        .collect()
    )
    vocab = F.array(*[F.lit(r["w"]) for r in vocab_rows])
    oov = F.size(
        F.filter("words", lambda w: ~F.array_contains(vocab, w))
    ).cast("double")
    n = F.size("words").cast("long")
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(oov / F.size("words"), 6).alias("oov_rate"),
    )


# --------------------------------------------------------------------------
# round-4 batch 2: bigram-LM quality score, TF-IDF keywords, Bloom-filter
# cross-corpus novelty, embedding hard-negative mining
# --------------------------------------------------------------------------


DOCS_LM_SCORE_SQL = r"""
WITH base AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                w -> w <> '') AS words
  FROM documents WHERE text IS NOT NULL
),
v AS (
  SELECT count(DISTINCT w) AS vs
  FROM (SELECT unnest(words) AS w FROM base)
),
pairs AS (
  SELECT doc_id, u.pos AS pos, u.w1 AS w1, u.w2 AS w2
  FROM (
    SELECT doc_id,
      unnest(list_transform(range(len(words) - 1),
             i -> {'pos': i, 'w1': words[i + 1], 'w2': words[i + 2]})) AS u
    FROM base WHERE len(words) >= 2)
),
bg AS (SELECT w1, w2, count(*) AS c2 FROM pairs GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c2) AS c1 FROM bg GROUP BY w1),
scored AS (
  SELECT pairs.doc_id, pairs.pos,
    CAST(bg.c2 + 1 AS DOUBLE) / CAST(ctx.c1 + v.vs AS DOUBLE) AS p
  FROM pairs JOIN bg USING (w1, w2) JOIN ctx USING (w1) CROSS JOIN v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
  round(list_reduce(list_prepend(0.0, list(p ORDER BY pos)),
                    (x, y) -> x + y) / count(*), 6) AS avg_bigram_prob
FROM scored GROUP BY doc_id
"""


def q_docs_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality filter: score every document under a bigram LM
    trained on the corpus itself (lm.bigram_lm_score — see that docstring
    for the log-free determinism argument and the 100-TB plan shape)."""
    return lm.bigram_lm_score(
        _read(spark, sf_dir, "documents"), "doc_id", "text"
    )


DOCS_TFIDF_SQL = r"""
WITH toks AS (
  SELECT doc_id,
    unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       w -> w <> '')) AS word
  FROM documents WHERE text IS NOT NULL
),
n AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd
  FROM documents WHERE text IS NOT NULL
),
tf AS (
  SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, word
),
dfq AS (SELECT word, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY word),
scored AS (
  SELECT tf.doc_id, tf.word, tf.tf, dfq.df,
    round(CAST(tf.tf AS DOUBLE) * (n.nd - dfq.df + 0.5) / (dfq.df + 0.5),
          6) AS score
  FROM tf JOIN dfq USING (word) CROSS JOIN n
)
SELECT doc_id, word, tf, df, score,
  CAST(row_number() OVER (PARTITION BY doc_id
                          ORDER BY score DESC, word ASC) AS INT) AS rank
FROM scored QUALIFY rank <= 3
"""


def q_docs_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by log-free TF-IDF (lm.tfidf_topk)."""
    return lm.tfidf_topk(_read(spark, sf_dir, "documents"), "doc_id", "text", k=3)


# Corpus data card: the one-row summary a dataset release ships with
# (counts, token/char volume, exact-dup rate, field cardinalities). One
# full-scan aggregation, every term map-side combinable; the dup count
# reuses the exact-dedup hash. At 100 TB this is a single pass.
DOCS_CORPUS_REPORT_SQL = r"""
WITH t AS (
  SELECT doc_id, text, lang, source,
    CASE WHEN text IS NOT NULL THEN md5(text) END AS h,
    CASE WHEN text IS NOT NULL THEN
      len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                      w -> w <> ''))
    ELSE 0 END AS toks,
    coalesce(length(text), 0) AS chars
  FROM documents
)
SELECT
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
  CAST(sum(toks) AS BIGINT) AS total_tokens,
  CAST(sum(chars) AS BIGINT) AS total_chars,
  CAST(count(h) - count(DISTINCT h) AS BIGINT) AS n_exact_dup_docs,
  CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM t
"""


def q_docs_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card summary row for a corpus release: volume, null rate,
    exact-duplicate count (rows beyond their hash's first), and field
    cardinalities — one map-side-combinable aggregation pass."""
    d = _read(spark, sf_dir, "documents")
    toks = F.when(
        F.col("text").isNotNull(),
        F.size(
            F.filter(
                F.split(F.lower(F.trim("text")), r"\s+"), lambda w: w != ""
            )
        ),
    ).otherwise(F.lit(0))
    h = F.when(F.col("text").isNotNull(), F.md5(F.col("text").cast("binary")))
    t = d.select(
        "text", "lang", "source", h.alias("h"), toks.alias("toks"),
        F.coalesce(F.length("text"), F.lit(0)).alias("chars"),
    )
    return t.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.col("text").isNull().cast("int")).cast("bigint").alias("n_null_text"),
        F.sum("toks").cast("bigint").alias("total_tokens"),
        F.sum("chars").cast("bigint").alias("total_chars"),
        (F.count("h") - F.countDistinct("h")).cast("bigint").alias("n_exact_dup_docs"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )


# Winnowing fingerprint selection (Schleimer et al. 2003, the MOSS
# algorithm): per-window minimum of the word-3-gram hash sequence, w=4 —
# any shared 6-word run between two documents shares a fingerprint while
# only ~2/(w+1) of grams are stored. Narrow fold, zero shuffle; the
# oracle replays the same lexicographic-(value,pos) window argmin.
DOCS_WINNOWING_SQL = r"""
WITH base AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS words
  FROM documents WHERE text IS NOT NULL
),
g AS (
  SELECT doc_id,
    list_transform(range(len(words) - 2),
      i -> ('0x' || substr(md5(words[i+1] || ' ' || words[i+2] || ' ' || words[i+3]), 1, 15))::INT64) AS h
  FROM base WHERE len(words) >= 3
),
sel AS (
  SELECT doc_id,
    list_transform(
      range(greatest(len(h) - 4, 0) + 1),
      j -> list_reduce(
        list_transform(range(j, least(j + 4, len(h))), i -> {'v': h[i+1], 'p': i}),
        (acc, x) -> CASE WHEN x.v < acc.v THEN x ELSE acc END
      )
    ) AS fps
  FROM g
)
SELECT DISTINCT doc_id, CAST(s.p AS INT) AS pos, s.v AS fp
FROM (SELECT doc_id, unnest(fps) AS s FROM sel)
"""


def q_docs_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS winnowing fingerprints (dedup.winnow_fingerprints, oracle hash
    mode): the robust document-fingerprint primitive for plagiarism-style
    overlap detection — selection density ~2/(w+1) with a shared-run
    guarantee, extracted at scan speed (no shuffle)."""
    return dedup.winnow_fingerprints(
        _read(spark, sf_dir, "documents"), "doc_id", "text",
        k=3, w=4, hash_mode="oracle",
    )


# MOSS matching step: docs sharing >= 2 (distinct) selected fingerprints,
# after dropping fingerprints present in > max_df docs (boilerplate grams
# would otherwise form quadratic hot buckets — the same cap discipline as
# the banded-LSH bucket_cap, applied at the join key). The join fans out
# only within per-fingerprint doc lists, all bounded by max_df.
_WINNOW_MAX_DF = 20

DOCS_WINNOWING_PAIRS_SQL = f"""
WITH fp_pos AS ({DOCS_WINNOWING_SQL}),
fp AS (SELECT DISTINCT doc_id, fp FROM fp_pos),
rare AS (
  SELECT fp FROM fp GROUP BY fp HAVING count(*) <= {_WINNOW_MAX_DF}
),
kept AS (SELECT f.doc_id, f.fp FROM fp f JOIN rare USING (fp))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= 2
"""


def q_docs_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-overlap candidate pairs: the MOSS matching join over
    the winnowed (doc, fp) table — distinct per doc, hot fingerprints
    (df > {max_df}) dropped like LSH bucket caps, then one fp-keyed
    self-join whose fan-out is bounded by max_df per key."""
    # materialize once: the fingerprint scan feeds the df-cap agg, the
    # semi-join prune, and BOTH self-join sides — without this the
    # gram-hash + window pipeline runs four times (same localCheckpoint
    # rationale as dedup._maybe_ckpt's materialize=True mode)
    fp = (
        dedup.winnow_fingerprints(
            _read(spark, sf_dir, "documents"), "doc_id", "text",
            k=3, w=4, hash_mode="oracle",
        )
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint(eager=True)
    )
    rare = (
        fp.groupBy("fp")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= _WINNOW_MAX_DF)
        .select("fp")
    )
    kept = fp.join(rare, "fp", "left_semi")
    a = kept.select(F.col("doc_id").alias("id_a"), "fp")
    b = kept.select(F.col("doc_id").alias("id_b"), "fp")
    return (
        a.join(b, ["fp"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


# BPE tokenizer-training round: adjacent-symbol pair counts over the
# distinct-word table weighted by word frequency — pair expansion cost is
# vocabulary-sized, never corpus-sized (the scale property real BPE
# trainers rely on). Top-50 cut is a total order (count DESC, pair ASC).
DOCS_BPE_PAIRS_SQL = r"""
WITH w AS (
  SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS word
  FROM documents WHERE text IS NOT NULL
),
v AS (
  SELECT word, CAST(count(*) AS BIGINT) AS wf
  FROM w WHERE word <> '' GROUP BY word
),
p AS (
  SELECT substr(word, CAST(i AS INT), 1) AS left_sym,
         substr(word, CAST(i AS INT) + 1, 1) AS right_sym, wf
  FROM (SELECT word, wf, unnest(range(1, length(word))) AS i
        FROM v WHERE length(word) >= 2)
)
SELECT left_sym, right_sym, CAST(sum(wf) AS BIGINT) AS pair_count
FROM p GROUP BY left_sym, right_sym
ORDER BY pair_count DESC, left_sym, right_sym LIMIT 50
"""


def q_docs_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE training round's merge-candidate counts (lm.bpe_pair_counts):
    corpus → word-frequency table (one shuffle) → per-distinct-word char
    pairs → weighted pair counts → TakeOrderedAndProject top-50."""
    return lm.bpe_pair_counts(_read(spark, sf_dir, "documents"), "text", top_k=50)


# Frozen merge list for the encode row: learned ONCE by lm.bpe_learn
# (n_merges=8) over the sf0.001 documents fixture, then fixed so the
# DuckDB oracle is a static string and the query is sf-independent (the
# fixed-hyperplane LSH precedent). Note merge 8 consumes merge 1's output
# symbol ('p'+'ar') — the chain exercises multi-char symbol merging. The
# live learn→encode loop is property-tested against a serial reference in
# tests/test_analytics_ops.py.
BPE_FIXED_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
    ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
]


def q_docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization of the corpus with a fixed learned merge list
    (lm.bpe_encode — trainer→TOKENIZER→packer now closed, VERDICT r4 #3).
    Per document: token count, merged-token count, and the md5 of the
    space-joined token stream in document order — a bit-exact transcript
    of the tokenization that the oracle reproduces via delimiter-wrapped
    string rewriting (unit-replace ≡ the engine's array fold; see
    lm._merge_fold). Scale shape: the merge chain runs on the
    distinct-word vocabulary, the corpus is scanned once and joins the
    encoded vocabulary on the word key."""
    enc = lm.bpe_encode(
        _read(spark, sf_dir, "documents"), BPE_FIXED_MERGES
    )
    return enc.select(
        "doc_id",
        "n_tokens",
        "n_merged",
        F.md5(F.array_join("tokens", " ").cast("binary")).alias("tok_hash"),
    )


def _bpe_encode_sql(merges: list[tuple[str, str]]) -> str:
    unit = lambda s: "||".join(  # noqa: E731
        ["chr(30)", "'" + s.replace("'", "''") + "'", "chr(31)"]
    )
    seq = (
        "array_to_string(list_transform(regexp_split_to_array(word, ''),"
        " c -> chr(30) || c || chr(31)), '')"
    )
    for left, right in merges:
        seq = (
            f"replace({seq}, {unit(left)} || {unit(right)}, "
            f"{unit(left + right)})"
        )
    return rf"""
WITH base AS (
  SELECT doc_id,
    list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                w -> w <> '') AS words
  FROM documents WHERE text IS NOT NULL
),
w AS (
  SELECT doc_id, generate_subscripts(words, 1) AS pos, unnest(words) AS word
  FROM base WHERE len(words) >= 1
),
v AS (SELECT DISTINCT word FROM w),
encv AS (SELECT word, {seq} AS seq FROM v),
tokv AS (
  SELECT word,
    ltrim(rtrim(replace(seq, chr(31) || chr(30), ' '), chr(31)), chr(30))
      AS tok_str
  FROM encv
),
doc AS (
  SELECT w.doc_id,
    string_agg(t.tok_str, ' ' ORDER BY w.pos) AS stream
  FROM w JOIN tokv t USING (word)
  GROUP BY w.doc_id
)
SELECT doc_id,
  CAST(len(string_split(stream, ' ')) AS BIGINT) AS n_tokens,
  CAST(len(list_filter(string_split(stream, ' '), t -> len(t) > 1))
       AS BIGINT) AS n_merged,
  md5(stream) AS tok_hash
FROM doc
"""


DOCS_BPE_ENCODE_SQL = _bpe_encode_sql(BPE_FIXED_MERGES)


def q_docs_bpe_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced training shards measured in REAL BPE tokens (the
    trainer→tokenizer→PACKER closure, VERDICT r4 #3's second half):
    docs_token_shards' greedy ~2000-token packing re-based from
    whitespace counts onto lm.bpe_encode's token counts, through the
    same distributed two-phase prefix sum (operators/shard.py — no
    global window). The oracle recomputes the BPE counts via the
    unit-replace chain and packs with a single global window, proving
    the two formulations agree bit-for-bit on real tokenizer output."""
    from ..operators import shard

    enc = lm.bpe_encode(_read(spark, sf_dir, "documents"), BPE_FIXED_MERGES)
    t = enc.select("doc_id", "n_tokens")
    out = shard.balanced_shards(
        t, "doc_id", "n_tokens", target_weight=2000, ids_per_chunk=64
    )
    return out.select("doc_id", "n_tokens", "shard_id")


def q_docs_bpe_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-context sequence packing measured in REAL BPE tokens — the
    docs_pack_sequences variant the tokenizer closure makes possible:
    lm.bpe_encode's per-doc token counts feed shard.pack_sequences'
    distributed two-phase prefix sum (ctx 256), so the (sequence, doc)
    overlap spans now index into the actual BPE token stream a trainer
    would pack. The oracle recomputes the counts via the unit-replace
    chain and packs with a single global window."""
    from ..operators import shard

    enc = lm.bpe_encode(_read(spark, sf_dir, "documents"), BPE_FIXED_MERGES)
    t = enc.select("doc_id", "n_tokens")
    out = shard.pack_sequences(
        t, "doc_id", "n_tokens", ctx_len=256, ids_per_chunk=64
    )
    return out.select(
        "seq_id", "doc_id", "doc_tok_start", "doc_tok_end",
        "seq_pos_start", "n_toks",
    )


def q_docs_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-evaluation report: per-language chars-per-token of the
    learned BPE tokenizer (the compression-ratio metric a tokenizer
    release is judged by — higher chars/token = fewer tokens per byte of
    training data). Composes bpe_encode's counts with the documents'
    n_chars; one language-keyed map-side-combinable aggregation; the
    ratio is one IEEE division of exact integer sums, so the oracle
    matches bit-for-bit."""
    docs = _read(spark, sf_dir, "documents")
    enc = lm.bpe_encode(docs, BPE_FIXED_MERGES)
    j = enc.join(docs.select("doc_id", "lang", "n_chars"), "doc_id")
    return j.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("n_tokens"), 6
        ).alias("chars_per_token"),
    )


_BPE_COUNTS_SQL = _bpe_encode_sql(BPE_FIXED_MERGES)

DOCS_BPE_COMPRESSION_SQL = f"""
WITH enc AS ({_BPE_COUNTS_SQL})
SELECT d.lang,
  CAST(count(*) AS BIGINT) AS n_docs,
  CAST(sum(e.n_tokens) AS BIGINT) AS total_tokens,
  CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
  round(CAST(sum(d.n_chars) AS DOUBLE) / sum(e.n_tokens), 6)
    AS chars_per_token
FROM enc e JOIN documents d USING (doc_id)
GROUP BY d.lang
"""

DOCS_BPE_PACK_SQL = f"""
WITH enc AS ({_BPE_COUNTS_SQL}),
c AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n,
    CAST(sum(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW)
         - n_tokens AS BIGINT) AS o
  FROM enc WHERE n_tokens > 0
),
s AS (
  SELECT doc_id, n, o,
    unnest(generate_series(o // 256, (o + n - 1) // 256)) AS seq_id
  FROM c
)
SELECT CAST(seq_id AS INT) AS seq_id, doc_id,
  CAST(greatest(0, seq_id * 256 - o) AS BIGINT) AS doc_tok_start,
  CAST(least(n, (seq_id + 1) * 256 - o) AS BIGINT) AS doc_tok_end,
  CAST(greatest(0, o - seq_id * 256) AS BIGINT) AS seq_pos_start,
  CAST(least(n, (seq_id + 1) * 256 - o)
       - greatest(0, seq_id * 256 - o) AS BIGINT) AS n_toks
FROM s
"""

DOCS_BPE_TOKEN_SHARDS_SQL = f"""
WITH enc AS ({_BPE_COUNTS_SQL}),
c AS (
  SELECT doc_id, n_tokens,
    sum(n_tokens) OVER (ORDER BY doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      - n_tokens AS cum_before
  FROM enc
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(floor(cum_before / 2000.0) AS INT) AS shard_id
FROM c
"""


def _bloom_bits_sql(text_expr: str, m: int) -> str:
    return ", ".join(
        f"('0x' || substr(md5({text_expr}), {1 + 8 * j}, 8))::INT64 % {m}"
        for j in range(3)
    )


DOCS_BLOOM_DEDUP_SQL = f"""
WITH ref_bits AS (
  SELECT DISTINCT bit FROM (
    SELECT unnest([{_bloom_bits_sql('text', 4096)}]) AS bit
    FROM documents WHERE doc_id % 5 <> 0 AND text IS NOT NULL)
),
probes AS (
  SELECT doc_id, is_null, unnest(bits) AS bit FROM (
    SELECT doc_id, text IS NULL AS is_null,
      [{_bloom_bits_sql("coalesce(text, '')", 4096)}] AS bits
    FROM documents WHERE doc_id % 5 = 0)
),
hits AS (
  SELECT p.doc_id, max(p.is_null) AS is_null,
    CAST(count(r.bit) AS INT) AS n_hits
  FROM probes p LEFT JOIN ref_bits r ON p.bit = r.bit
  GROUP BY p.doc_id
)
SELECT doc_id, n_hits,
  CASE WHEN is_null THEN 'invalid'
       WHEN n_hits = 3 THEN 'seen'
       ELSE 'novel' END AS verdict
FROM hits
"""


def q_docs_bloom_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter novelty of every 5th document probed against the rest
    of the corpus (dedup.bloom_novelty; same ref/incoming split as
    docs_incremental_dedup). The reference side collapses to a ≤ m-row
    distinct-position table, so the probe is a broadcast join however
    large the reference corpus grows."""
    docs = _read(spark, sf_dir, "documents")
    return dedup.bloom_novelty(
        docs.filter(F.col("doc_id") % 5 != 0),
        docs.filter(F.col("doc_id") % 5 == 0),
        "doc_id", "text", m=4096, k=3, hash_mode="oracle",
    )


def _simhash_pairs_sql(n_bands: int = 4, max_hamming: int = 8) -> str:
    width = 60 // n_bands
    mask = (1 << width) - 1
    return f"""
WITH sim AS (SELECT * FROM ({_simhash_sql()})),
bands AS (
  SELECT doc_id, simhash, b.band_id,
    (simhash >> (b.band_id * {width})) & {mask} AS band_val
  FROM sim CROSS JOIN
    (SELECT unnest(range({n_bands})) AS band_id) b
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
    a.simhash AS sa, b.simhash AS sb
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.band_val = b.band_val
   AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS INT) AS hamming
FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
"""


DOCS_SIMHASH_PAIRS_SQL = _simhash_pairs_sql()


def q_docs_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simhash near-dup pairs, band-bucketed then Hamming-verified
    (dedup.simhash_near_dups with max_hamming — completes the simhash
    path under the oracle the way docs_minhash_pairs does for minhash)."""
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dedup.simhash_near_dups(
        docs, "doc_id", "text", n_bands=4, hash_mode="oracle", max_hamming=8
    )


EMB_HARD_NEGATIVES_SQL = f"""
WITH e AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
a AS (
  SELECT vec_id AS anchor_id, label AS anchor_label, v AS av
  FROM e WHERE vec_id % 100 = 3
),
pairs AS (
  SELECT a.anchor_id, e.vec_id AS negative_id, e.label AS negative_label,
    {_DOT.format(a='e.v', b='a.av')}
      / ({_NRM.format(a='e.v')} * {_NRM.format(a='a.av')}) AS cos
  FROM e CROSS JOIN a WHERE e.label <> a.anchor_label
)
SELECT anchor_id, negative_id, negative_label, cos,
  CAST(row_number() OVER (PARTITION BY anchor_id
                          ORDER BY cos DESC, negative_id ASC) AS INT) AS rank
FROM pairs QUALIFY rank <= 3
"""


def q_emb_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: for each anchor (every 100th
    vector) the 3 most-cosine-similar vectors with a DIFFERENT label
    (similarity.hard_negatives — anchors broadcast, corpus unshuffled)."""
    emb = _read(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    anchors = emb.filter(F.col("vec_id") % 100 == 3).select(
        F.col("vec_id").alias("anchor_id"),
        F.col("label").alias("anchor_label"),
        F.col("embedding").alias("anchor_vec"),
    )
    return similarity.hard_negatives(emb, anchors, k=3)


# --------------------------------------------------------------------------
# production-hash variants: the same signature pipelines with the xxhash64
# backend — the mode a 100-TB run uses (md5 exists only for DuckDB bit
# parity; it was the dominant constant factor of every signature scan).
# Registered WITHOUT oracle SQL: DuckDB has no xxhash64, so the driver
# records the weaker rows-only check; value-level correctness of the
# identical plans is covered by the md5-mode rows above, and mode-agreement
# on near-dup DECISIONS is pinned by
# tests/test_dedup_similarity.py::test_hash_modes_agree_on_decisions.
# --------------------------------------------------------------------------


def q_docs_minhash_sig_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dedup.minhash_signature(
        docs, "doc_id", "text", n_hashes=4, k=3, hash_mode="production"
    )


def q_docs_minhash_pairs_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dedup.minhash_near_dups(
        docs, "doc_id", "text", n_hashes=4, n_bands=2,
        jaccard_threshold=0.5, k=3, hash_mode="production", materialize=True,
    )


def q_docs_simhash_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    return dedup.simhash64(docs, "doc_id", "text", hash_mode="production")


def q_docs_span_dedup_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = (
        _read(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .repartition(spark.sparkContext.defaultParallelism)
    )
    return dedup.span_dedup(
        docs, "doc_id", "text", k=3, min_docs=2, hash_mode="production"
    )


def q_docs_incremental_dedup_prod(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    return dedup.incremental_near_dups(
        corpus, incoming, "doc_id", "text",
        n_hashes=4, n_bands=2, jaccard_threshold=0.5, k=3,
        hash_mode="production", materialize=True,
    )


# --------------------------------------------------------------------------
# transcript-native post-processing (operators/transcript.py) — the
# per-conversation steps a training pipeline runs AFTER the CDC apply; all
# over the same final-state table / CDC_FINAL_STATE_SQL oracle
# --------------------------------------------------------------------------

# tokens est: ceil(chars/4) min 1, NULL -> 0 (transcript.estimated_tokens)
_EST_TOKENS_SQL = (
    "CASE WHEN text IS NULL THEN 0 "
    "ELSE greatest(1, CAST(ceil(length(text)/4.0) AS BIGINT)) END"
)

CONV_ROLE_ALTERNATION_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
seq AS (
  SELECT conv_id, turn_idx, coalesce(role, chr(1)) AS r,
         lag(coalesce(role, chr(1))) OVER
           (PARTITION BY conv_id ORDER BY turn_idx) AS prev,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM final
)
SELECT conv_id,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(count(DISTINCT r) AS BIGINT) AS n_roles,
  CAST(count(*) FILTER (WHERE rn > 1 AND prev = r) AS BIGINT) AS n_role_repeats,
  arg_min(CASE WHEN r = chr(1) THEN '' ELSE r END, turn_idx) AS first_role,
  arg_max(CASE WHEN r = chr(1) THEN '' ELSE r END, turn_idx) AS last_role,
  count(*) FILTER (WHERE rn > 1 AND prev = r) = 0 AS alternates
FROM seq GROUP BY conv_id
"""


def q_conv_role_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dialogue-structure validation over the applied transcripts table
    (per-document validate-and-route, Jhove.kt:55-112, at conversation
    granularity). Single conv_id shuffle — see operators/transcript.py."""
    return transcript.role_alternation(q_cdc_lww_final_state(spark, sf_dir))


CONV_LOSS_MASK_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
t AS (
  SELECT conv_id, turn_idx, role, text, {_EST_TOKENS_SQL} AS n_tokens
  FROM final
)
SELECT conv_id, turn_idx,
  (coalesce(role, '') = 'purchase'
   AND length(coalesce(text, '')) > 0) AS train,
  CAST(n_tokens AS BIGINT) AS n_tokens,
  CAST(coalesce(SUM(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx
       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
    AS token_start
FROM t
"""


def q_conv_loss_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask construction: completion-role turns are trained on;
    token_start is the turn's cumulative offset in its conversation."""
    return transcript.loss_mask(
        q_cdc_lww_final_state(spark, sf_dir), completion_role="purchase"
    )


CONV_TRUNCATE_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
t AS (
  SELECT conv_id, turn_idx, role, text, tool, {_EST_TOKENS_SQL} AS n_tokens
  FROM final
),
r AS (
  SELECT conv_id, turn_idx, role, text, tool, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_cum_tokens
  FROM t
)
SELECT conv_id, turn_idx, role, text, tool,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(rev_cum_tokens AS BIGINT) AS rev_cum_tokens
FROM r WHERE rev_cum_tokens <= 12
"""


def q_conv_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation: the longest whole-turn SUFFIX of each
    conversation that fits a 12-token budget (recency-preserving)."""
    return transcript.truncate_to_budget(
        q_cdc_lww_final_state(spark, sf_dir), budget=12
    )


CONV_STRUCTURE_DEDUP_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
f AS (
  SELECT conv_id,
    md5(string_agg(coalesce(role, '') || '~' || coalesce(tool, ''), '|'
        ORDER BY turn_idx)) AS sig_md5
  FROM final GROUP BY conv_id
)
SELECT conv_id, sig_md5,
  min(conv_id) OVER (PARTITION BY sig_md5) AS canonical_conv_id,
  conv_id <> min(conv_id) OVER (PARTITION BY sig_md5) AS is_dup
FROM f
"""


def q_conv_structure_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level dedup by interaction structure (ordered
    role~tool signature) — the template/boilerplate-conversation
    detector; canonical = min conv_id (keep-first dedup,
    RenameS3Utils.kt:52)."""
    return transcript.structure_dedup(q_cdc_lww_final_state(spark, sf_dir))


CONV_TURN_LOOPS_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
g AS (
  SELECT conv_id,
         coalesce(role, '') || '~' || coalesce(text, '') AS p,
         count(*) AS c
  FROM final GROUP BY 1, 2
)
SELECT conv_id, CAST(SUM(c - 1) AS BIGINT) AS n_loop_turns,
       CAST(max(c) AS BIGINT) AS max_repeat
FROM g GROUP BY conv_id
"""


def q_conv_turn_loops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agent-loop detection: identical (role, payload) turns repeating
    within one conversation (empty payloads count — the commonest
    stuck-loop signature)."""
    return transcript.turn_loops(q_cdc_lww_final_state(spark, sf_dir))


CONV_TOOL_STATS_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL})
SELECT coalesce(tool, 'none') AS tool,
  CAST(count(*) AS BIGINT) AS n_turns,
  CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
  round(avg({_EST_TOKENS_SQL}), 6) AS avg_tokens
FROM final GROUP BY 1
"""


def q_conv_tool_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tool usage rollup over the transcripts table (tiny key
    domain — map-side combine collapses it pre-shuffle)."""
    return transcript.tool_usage(q_cdc_lww_final_state(spark, sf_dir))


CONV_BOILERPLATE_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL})
SELECT text, CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
       CAST(count(*) AS BIGINT) AS n_turns
FROM final WHERE text IS NOT NULL
GROUP BY text HAVING count(DISTINCT conv_id) >= 3
"""


def q_conv_boilerplate_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canned-response scan over the transcripts table: turn texts
    recurring in >= 3 distinct conversations (transcript.boilerplate_turns
    — one map-side-combinable text-keyed agg, no self-join)."""
    return transcript.boilerplate_turns(
        q_cdc_lww_final_state(spark, sf_dir), min_convs=3
    )


CLEAN_TRANSCRIPTS_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
seq AS (
  SELECT conv_id, coalesce(role, chr(1)) AS r,
         lag(coalesce(role, chr(1))) OVER
           (PARTITION BY conv_id ORDER BY turn_idx) AS prev,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM final
),
alt AS (
  SELECT conv_id FROM seq GROUP BY conv_id
  HAVING count(*) FILTER (WHERE rn > 1 AND prev = r) <= count(*) * 0.25
),
sig AS (
  SELECT conv_id,
    md5(string_agg(coalesce(role, '') || '~' || coalesce(tool, ''), '|'
        ORDER BY turn_idx)) AS sig_md5
  FROM final GROUP BY conv_id
),
nodup AS (
  SELECT conv_id FROM (
    SELECT conv_id,
           conv_id = min(conv_id) OVER (PARTITION BY sig_md5) AS is_rep
    FROM sig
  ) WHERE is_rep
),
loops AS (
  SELECT conv_id FROM (
    SELECT conv_id, coalesce(role, '') || '~' || coalesce(text, '') AS p,
           count(*) AS c
    FROM final GROUP BY 1, 2
  ) GROUP BY conv_id HAVING max(c) <= 3
),
keep AS (
  SELECT conv_id FROM alt
  INTERSECT SELECT conv_id FROM nodup
  INTERSECT SELECT conv_id FROM loops
),
t AS (
  SELECT f.conv_id, f.turn_idx, f.role, f.text, f.tool,
         {_EST_TOKENS_SQL} AS n_tokens
  FROM final f JOIN keep USING (conv_id)
),
r AS (
  SELECT conv_id, turn_idx, role, text, tool, n_tokens,
    SUM(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rev_cum_tokens
  FROM t
)
SELECT conv_id, turn_idx, role, text, tool,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(rev_cum_tokens AS BIGINT) AS rev_cum_tokens
FROM r WHERE rev_cum_tokens <= 12
"""


def q_clean_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end transcript prep: structure gate (repeat rate <= 25%) →
    structure-dedup canonical only → loop filter (max identical turn
    run <= 3) → 12-token whole-turn suffix truncation. The transcripts
    counterpart of clean_corpus — one composed plan, every stage keyed
    by conv_id."""
    return transcript.clean_transcripts(
        q_cdc_lww_final_state(spark, sf_dir), budget=12, materialize=True
    )


def q_cdc_bootstrap_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap-then-tail ingestion (operators/bootstrap.py): consistent
    snapshot at an LSN watermark (60% of the log) bulk-imported as ONE
    fenced commit, then the change stream strictly after the watermark
    tailed through the checkpointed streaming runner. Final visible state
    must equal the full replay bit-for-bit — same DuckDB oracle as every
    other final-state path. The production 'existing source database'
    onboarding shape: history enters as a parallel columnar import, only
    the delta replays event-by-event."""
    from ..fixtures import write_binlog_segments
    from ..operators import bootstrap
    from ..streaming import runner
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir).cache()
    good, _dead = resolve.validate(events, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    watermark = int(events.agg(F.max("lsn")).first()[0] * 0.6)

    tmp = tempfile.mkdtemp(prefix="cdc_bootstrap_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=8
    )
    bootstrap.bootstrap_table(spark, table, normalized, watermark, CDC_PAYLOAD)

    tail = events.filter(F.col("lsn") > watermark)
    flat = os.path.join(tmp, "flat")
    write_binlog_segments(tail, flat)
    runner.run_to_completion(
        spark, flat, table, os.path.join(tmp, "ckpt"), run_id="bootstrap-tail",
        max_files_per_trigger=2,
    )
    events.unpersist()
    return table.visible(spark)


# --------------------------------------------------------------------------
# HTML → text extraction (functions/html.py) — the web-scrape-to-training-
# text step; construct→extract roundtrip on both engines (xml_extract's
# pattern), patterns in the Java∩RE2 dialect like docs_pii_scrub
# --------------------------------------------------------------------------

_HTML_PARTS_SQL = (
    "'<html><head><title>Doc &amp; ' || CAST(doc_id AS VARCHAR) || "
    "'</title><style>body .m 1</style></head>"
    "<body><script type=\"text/javascript\">var x = 1 < 2;</script>"
    "<h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' || text || "
    "'</p><div>lang: ' || lang || '</div></body></html>'"
)


def _html_doc_expr() -> F.Column:
    return F.concat(
        F.lit("<html><head><title>Doc &amp; "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>body .m 1</style></head>"
              '<body><script type="text/javascript">var x = 1 < 2;</script>'
              "<h1>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><div>lang: "),
        F.col("lang"),
        F.lit("</div></body></html>"),
    )


DOCS_HTML_EXTRACT_SQL = f"""
WITH h AS (
  SELECT doc_id, {_HTML_PARTS_SQL} AS html
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
  {hf.html_title_sql('html')} AS title,
  {hf.html_to_text_sql('html')} AS clean_text,
  CAST(length({hf.html_to_text_sql('html')}) AS BIGINT) AS n_chars,
  md5({hf.html_to_text_sql('html')}) AS text_md5
FROM h
"""


def q_docs_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text extraction roundtrip: deterministically wrap each
    document in HTML (title with an entity, script with a bare '<',
    style subtree, break tags), then extract title + readable text.
    Every stage is a JVM regexp in the Java∩RE2 dialect — zero shuffle,
    one whole-stage-codegen projection; md5 pins the full cleaned text
    byte-for-byte against the oracle."""
    docs = _read(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    h = docs.select("doc_id", _html_doc_expr().alias("html"))
    clean = hf.html_to_text(F.col("html"))
    return h.select(
        "doc_id",
        hf.html_title(F.col("html")).alias("title"),
        clean.alias("clean_text"),
        F.length(clean).cast("long").alias("n_chars"),
        F.md5(clean.cast("binary")).alias("text_md5"),
    )


# --------------------------------------------------------------------------
# stream/state audits (operators/audit.py) — gap detection, SCD2 history,
# replay reconciliation
# --------------------------------------------------------------------------

CDC_GAP_AUDIT_SQL = f"""
WITH ev AS ({_EV_SQL_INVALID}),
good AS (SELECT lsn FROM ev WHERE op IN ('insert', 'update', 'delete')),
s AS (SELECT lsn, lag(lsn) OVER (ORDER BY lsn) AS prev FROM good)
SELECT prev + 1 AS gap_start,
       lsn - 1 AS gap_end,
       lsn - prev - 1 AS gap_len
FROM s WHERE prev IS NOT NULL AND lsn - prev > 1
"""


def q_cdc_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-LSN audit over the validated change stream: invalid-op
    events dead-letter out (resolve.validate), and gap_audit proves the
    surviving stream's LSN sequence has exactly the dead-lettered holes —
    the WAL-tail completeness check a 10^10-event replay needs. The oracle
    is a single global lag; the engine plan is chunked (intra-chunk lag
    windows + a per-chunk summary window) so no global sort ever happens.
    See operators/audit.py:gap_audit."""
    from ..operators import audit

    events = derive_change_events(spark, sf_dir, include_invalid=True)
    good = events.where(F.col("op").isin("insert", "update", "delete"))
    return audit.gap_audit(good, chunk=4096)


CDC_SOURCE_ORDER_SQL = """
WITH l AS (
  SELECT user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
  FROM events
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(coalesce(sum(CASE WHEN ts < prev THEN 1 ELSE 0 END), 0) AS BIGINT)
    AS n_inversions,
  round(coalesce(sum(CASE WHEN ts < prev THEN 1 ELSE 0 END), 0) * 1.0
        / count(*), 6) AS inversion_ratio
FROM l GROUP BY user_id
"""


def q_cdc_source_order_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-health audit: per stream key, how often event TIME runs
    backwards relative to binlog ORDER (lag over (key, position)). A
    nonzero inversion rate means the source's clocks skew or transactions
    commit out of event-time order — exactly what decides whether
    downstream event-time watermarks (events_time_windows,
    cdc_watermark_lag) can be trusted, and the complement of gap_audit
    (which checks the position sequence itself). ONE shuffle on the key:
    the running-lag window and the groupBy share the same partitioning,
    so the aggregate adds no second exchange; output is key-cardinality,
    never event-cardinality."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    lagged = ev.select(
        "user_id", "ts", F.lag("ts").over(w).alias("_prev")
    )
    inv = (F.col("ts") < F.col("_prev")).cast("long")
    return lagged.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.coalesce(F.sum(inv), F.lit(0)).alias("n_inversions"),
        F.round(
            F.coalesce(F.sum(inv), F.lit(0)) * 1.0 / F.count("*"), 6
        ).alias("inversion_ratio"),
    )


CDC_TEXT_CHURN_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
ev2 AS (
  SELECT coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0'))
           AS conv_id,
         turn_idx, lsn, text
  FROM ev WHERE op <> 'delete' AND text IS NOT NULL
),
l AS (
  SELECT conv_id, text,
         lag(text) OVER (PARTITION BY conv_id, turn_idx ORDER BY lsn) AS prev
  FROM ev2
)
SELECT conv_id,
  CAST(count(prev) AS BIGINT) AS n_rewrites,
  CAST(coalesce(sum(levenshtein(text, prev)), 0) AS BIGINT) AS total_edit,
  CAST(coalesce(max(levenshtein(text, prev)), 0) AS BIGINT) AS max_edit
FROM l GROUP BY conv_id
HAVING count(prev) > 0
"""


def q_cdc_text_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Update-churn metric over the change stream: per conversation, how
    many times a turn's text was REWRITTEN (a later non-delete version of
    the same key) and how large the rewrites were (Levenshtein edit
    distance to the previous version) — the "are agents thrashing /
    editing history" signal a transcript-CDC operator watches, and the
    cost driver for copy-on-write amplification (churned conversations
    rewrite their bucket every epoch). One shuffle on the key for the
    lag window; the per-key groupBy reuses sub-partitioning of the same
    exchange; levenshtein is JVM-side on both engines and integer-exact,
    so the oracle matches bit-for-bit."""
    events = derive_change_events(spark, sf_dir)
    good, _dead = resolve.validate(events, [])
    base = good.filter(
        (F.col("op") != "delete") & F.col("text").isNotNull()
    ).select("conv_id", "turn_idx", "lsn", "text")
    w = Window.partitionBy("conv_id", "turn_idx").orderBy("lsn")
    lagged = base.select(
        "conv_id", "text", F.lag("text").over(w).alias("_prev")
    )
    lev = F.levenshtein(F.col("text"), F.col("_prev"))
    return (
        lagged.groupBy("conv_id")
        .agg(
            F.count("_prev").alias("n_rewrites"),
            F.coalesce(F.sum(lev), F.lit(0)).alias("total_edit"),
            F.coalesce(F.max(lev), F.lit(0)).alias("max_edit"),
        )
        .filter(F.col("n_rewrites") > 0)
    )


def _scd2_col_sql(c: str) -> str:
    return (
        f"CASE WHEN coalesce(last_value(CASE WHEN op <> 'delete' AND {c} IS NOT NULL"
        f" THEN lsn END IGNORE NULLS) OVER wr, -1)"
        f" > coalesce(max(CASE WHEN op = 'delete' THEN lsn END) OVER wr, -1)"
        f" THEN last_value(CASE WHEN op <> 'delete' AND {c} IS NOT NULL"
        f" THEN {c} END IGNORE NULLS) OVER wr END AS {c}"
    )


CDC_SCD2_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool
  FROM ev
)
SELECT conv_id, turn_idx, lsn AS valid_from_lsn,
  lead(lsn) OVER wk - 1 AS valid_to_lsn,
  lead(lsn) OVER wk IS NULL AS is_current,
  coalesce(max(CASE WHEN op <> 'delete' THEN lsn END) OVER wr, -1)
    > coalesce(max(CASE WHEN op = 'delete' THEN lsn END) OVER wr, -1) AS row_visible,
  {_scd2_col_sql('role')},
  {_scd2_col_sql('text')},
  {_scd2_col_sql('tool')}
FROM ev2
WINDOW wk AS (PARTITION BY conv_id, turn_idx ORDER BY lsn),
       wr AS (PARTITION BY conv_id, turn_idx ORDER BY lsn
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 per-key version history: every change event becomes a
    version row carrying the key's reconstructed LWW state as of that LSN
    plus a validity interval — the per-key time-travel surface the lake's
    snapshot time travel (table/lake.py) can't give (it is per-commit, not
    per-event). Register semantics identical to operators/lww.py.
    See operators/audit.py:scd2_history."""
    from ..operators import audit

    events = derive_change_events(spark, sf_dir)
    good, _dead = resolve.validate(events, [])
    normalized = good.select("lsn", "op", "conv_id", "turn_idx", *CDC_PAYLOAD)
    return audit.scd2_history(normalized, CDC_PAYLOAD)


def q_cdc_scd2_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time enrichment against the SCD2 history — the standard
    CDC-consumer pattern (enrich a fact row with the dimension version
    that was valid at its timestamp). Probes are derived deterministically
    from the event stream at three LSN offsets (exact version boundary,
    mid-interval, before-first-version → NULL enrichment), then each probe
    attaches the version with the greatest valid_from_lsn ≤ probe_lsn via
    the union+window as-of form (operators/temporal.py asof_join) — ONE
    shuffle on the key, never a range theta-join (at 100 TB a BETWEEN
    join on validity intervals is a broadcast-nested-loop disaster; the
    as-of form shuffles each side once and streams)."""
    from ..operators import audit, temporal

    events = derive_change_events(spark, sf_dir)
    good, _dead = resolve.validate(events, [])
    normalized = good.select("lsn", "op", "conv_id", "turn_idx", *CDC_PAYLOAD)
    scd = audit.scd2_history(normalized, CDC_PAYLOAD)
    # the version travels as ONE struct so every enrichment field comes
    # from the SAME matched version row — per-column ignorenulls carry
    # would resurrect an older non-null text across a delete-fenced
    # (NULL-text) version
    dim = scd.select(
        "conv_id",
        "turn_idx",
        "valid_from_lsn",
        F.struct(
            F.col("valid_from_lsn").alias("version_lsn"),
            F.col("row_visible").alias("visible_at"),
            F.col("text").alias("text_at"),
        ).alias("_ver"),
    )
    probes = normalized.filter((F.col("lsn") % 7).isin(0, 1, 2)).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("lsn") % 7 == 0, F.col("lsn"))
        .when(F.col("lsn") % 7 == 1, F.col("lsn") + 3)
        .otherwise(F.col("lsn") - 1)
        .alias("probe_lsn"),
    )
    joined = temporal.asof_join(
        probes,
        dim,
        on=["conv_id", "turn_idx"],
        left_ts="probe_lsn",
        right_ts="valid_from_lsn",
        value_cols=["_ver"],
        suffix="",
    )
    return joined.select(
        "conv_id",
        "turn_idx",
        "probe_lsn",
        F.col("_ver.version_lsn").alias("version_lsn"),
        F.col("_ver.visible_at").alias("visible_at"),
        F.col("_ver.text_at").alias("text_at"),
    )


CDC_SCD2_PIT_SQL = f"""
WITH scd AS ({CDC_SCD2_SQL}),
ev AS ({_EV_SQL_VALID}),
ev2 AS (
  SELECT lsn,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx
  FROM ev
),
probes AS (
  SELECT conv_id, turn_idx,
    CASE WHEN lsn % 7 = 0 THEN lsn
         WHEN lsn % 7 = 1 THEN lsn + 3
         ELSE lsn - 1 END AS probe_lsn
  FROM ev2 WHERE lsn % 7 IN (0, 1, 2)
),
j AS (
  SELECT p.conv_id, p.turn_idx, p.probe_lsn,
         s.valid_from_lsn AS version_lsn,
         s.row_visible AS visible_at,
         s.text AS text_at,
         row_number() OVER (
           PARTITION BY p.conv_id, p.turn_idx, p.probe_lsn
           ORDER BY s.valid_from_lsn DESC) AS rn
  FROM probes p
  LEFT JOIN scd s
    ON s.conv_id = p.conv_id AND s.turn_idx = p.turn_idx
   AND s.valid_from_lsn <= p.probe_lsn
)
SELECT conv_id, turn_idx, probe_lsn, version_lsn, visible_at, text_at
FROM j WHERE rn = 1
"""


_RECON_DIFF = ", ".join(
    f"CASE WHEN l.{c} IS DISTINCT FROM r.{c} THEN '{c}' END" for c in CDC_PAYLOAD
)

# left = the full moves replay's final state (the CTE chain of
# CDC_MOVES_SQL); right = the pre-b04 visible state (its `pre` CTE). The
# moves derivation decouples turn_idx from the batch residue, so the b04
# move/upsert/delete batch touches keys that already existed — all four
# verdicts are non-vacuous (the plain derivation pins every key to a single
# batch, which would leave mismatch/right_only empty).
CDC_RECONCILE_SQL = f"""
WITH {_MOVES_CTES},
l AS (SELECT conv_id, turn_idx, {_VIS} FROM agg WHERE lup > ldel),
r AS (SELECT * FROM pre)
SELECT
  coalesce(l.conv_id, r.conv_id) AS conv_id,
  coalesce(l.turn_idx, r.turn_idx) AS turn_idx,
  CASE WHEN r.conv_id IS NULL THEN 'left_only'
       WHEN l.conv_id IS NULL THEN 'right_only'
       WHEN concat_ws(',', {_RECON_DIFF}) = '' THEN 'match'
       ELSE 'mismatch' END AS verdict,
  CASE WHEN l.conv_id IS NOT NULL AND r.conv_id IS NOT NULL
       THEN concat_ws(',', {_RECON_DIFF}) END AS diff_cols,
  l.role AS left_role, l.text AS left_text, l.tool AS left_tool,
  r.role AS right_role, r.text AS right_text, r.tool AS right_tool
FROM l FULL OUTER JOIN r
  ON l.conv_id = r.conv_id AND l.turn_idx = r.turn_idx
"""


def q_cdc_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-equality diff as a distributed operator: the full moves
    replay's final state vs the pre-b04 state it grew from, full-outer
    joined with per-key verdicts (match / mismatch+diff_cols / left_only /
    right_only — all four non-vacuous: b04's moves update existing keys,
    its source deletes remove them, its inserts create new ones). At 10^10
    events this is how "replaying the change stream reproduces the table"
    is *proven* — a keyed diff, not a driver-side collect-and-compare.
    See operators/audit.py:reconcile."""
    from ..operators import audit

    events = derive_change_events(spark, sf_dir, include_moves=True)
    good, _dead = resolve.validate(events, [])
    pre_events = good.where(F.col("batch_id") < "b04").select(
        "lsn", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    right = lww.visible(lww.batch_registers(pre_events, CDC_PAYLOAD), CDC_PAYLOAD)
    left = q_cdc_moves_final_state(spark, sf_dir)
    return audit.reconcile(left, right, list(lww.KEY), CDC_PAYLOAD)


# --------------------------------------------------------------------------
# conversation-level split / scrub / near-dup (round 4 additions)
# --------------------------------------------------------------------------

CONV_TRAIN_EVAL_SPLIT_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
agg AS (
  SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(sum({_EST_TOKENS_SQL}) AS BIGINT) AS n_tokens
  FROM final GROUP BY conv_id
)
SELECT conv_id, n_turns, n_tokens,
  CASE WHEN ('0x' || substr(md5(conv_id), 1, 15))::INT64 % 100 < 5
       THEN 'eval' ELSE 'train' END AS split
FROM agg
"""


def q_conv_train_eval_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-stable conversation-level hold-out assignment over the
    applied table (transcript.train_eval_split): hash the KEY so a
    re-ingest never migrates a conversation across the split."""
    final = q_cdc_lww_final_state(spark, sf_dir)
    return transcript.train_eval_split(final, eval_pct=5)


CONV_PII_SCRUB_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL}),
seeded AS (
  SELECT conv_id, turn_idx, role,
    CASE WHEN text IS NULL THEN NULL
         ELSE text || ' contact ' || conv_id || '@mail.example.com tel'
                   || ' +47 5550' || CAST(turn_idx % 10 AS VARCHAR) END
      AS text
  FROM final
)
SELECT conv_id, turn_idx, role,
  CASE WHEN role IN ('signup', 'purchase') AND text IS NOT NULL
       THEN regexp_replace(
              regexp_replace(text, '{_PII_EMAIL}', '<EMAIL>', 'g'),
              '{_PII_PHONE}', '<PHONE>', 'g')
       ELSE text END AS text,
  CAST(CASE WHEN role IN ('signup', 'purchase') AND text IS NOT NULL
       THEN len(regexp_extract_all(text, '{_PII_EMAIL}'))
            + len(regexp_extract_all(text, '{_PII_PHONE}'))
       ELSE 0 END AS INT) AS n_redactions
FROM seeded
"""


def q_conv_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Role-aware transcript PII scrub (transcript.scrub_turns): the
    fixture carries no PII, so both engines seed deterministic addresses
    into every non-null turn first; the operator under test then redacts
    ONLY the user-originated roles — the other roles keep their seeded
    text bit-identical, proving the gate."""
    final = q_cdc_lww_final_state(spark, sf_dir)
    seeded = final.select(
        "conv_id",
        "turn_idx",
        "role",
        F.when(
            F.col("text").isNotNull(),
            F.concat(
                F.col("text"),
                F.lit(" contact "),
                F.col("conv_id"),
                F.lit("@mail.example.com tel +47 5550"),
                (F.col("turn_idx") % 10).cast("string"),
            ),
        ).alias("text"),
    )
    return transcript.scrub_turns(
        seeded,
        scrub_roles=("signup", "purchase"),
        patterns={"<EMAIL>": _PII_EMAIL, "<PHONE>": _PII_PHONE},
    )


# the folded-conversation relation: one text per conversation, turns in
# order — the (doc_id, text) shape the doc-level LSH pipeline expects.
# Empty folds are excluded (a conversation whose every turn has NULL text
# folds to whitespace; at corpus scale those would all co-bucket into one
# quadratic LSH bucket while carrying zero dedup signal).
_CONV_FOLDED_SRC = f"""WITH final AS ({CDC_FINAL_STATE_SQL})
SELECT conv_id AS doc_id,
       string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx) AS text
FROM final GROUP BY conv_id
HAVING length(trim(string_agg(coalesce(text, ''), ' ' ORDER BY turn_idx))) > 0"""

CONV_NEAR_DUPS_SQL = _minhash_pairs_sql(source=_CONV_FOLDED_SRC)

_LEAK_SPLIT = "CASE WHEN ('0x' || substr(md5({c}), 1, 15))::INT64 % 100 < 30 THEN 'eval' ELSE 'train' END"

CONV_SPLIT_LEAKAGE_SQL = f"""
WITH pairs AS ({CONV_NEAR_DUPS_SQL})
SELECT id_a, id_b, jaccard,
  {_LEAK_SPLIT.format(c='id_a')} AS split_a,
  {_LEAK_SPLIT.format(c='id_b')} AS split_b
FROM pairs
WHERE {_LEAK_SPLIT.format(c='id_a')} <> {_LEAK_SPLIT.format(c='id_b')}
"""


def _fold_conversations(final: DataFrame) -> DataFrame:
    """Fold a visible transcript state to the (doc_id, text) relation the
    doc-level LSH pipeline expects: turn texts in turn order, one row per
    conversation, empty folds excluded (see _CONV_FOLDED_SRC)."""
    fold = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("turn_idx").alias("k"),
                        F.coalesce(F.col("text"), F.lit("")).alias("v"),
                    )
                )
            ),
            lambda x: x["v"],
        ),
        " ",
    )
    return (
        final.groupBy("conv_id")
        .agg(fold.alias("text"))
        .filter(F.length(F.trim(F.col("text"))) > 0)
        .select(F.col("conv_id").alias("doc_id"), "text")
    )


def q_conv_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level near-duplicate pairs: ordered turn-text fold per
    conversation (the A1 render shape), then the SAME MinHash→LSH-band→
    Jaccard-verify pipeline as docs_minhash_pairs at conversation
    granularity — how a transcript pipeline drops re-run/retried agent
    sessions that differ in a turn or two."""
    folded = _fold_conversations(q_cdc_lww_final_state(spark, sf_dir))
    return dedup.minhash_near_dups(
        folded, "doc_id", "text", n_hashes=4, n_bands=2,
        jaccard_threshold=0.5, k=3, hash_mode="oracle", materialize=True,
    )


def q_conv_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split leakage scan: near-duplicate conversation pairs
    that STRADDLE the hold-out boundary — each one is an eval example the
    model effectively saw in training (the contamination mode a
    conversation-level split is supposed to prevent, defeated by
    near-dup retries landing on opposite sides). Composes the
    conversation near-dup pipeline with the replay-stable hash split
    (30% eval here so the fixture exercises both straddle directions);
    output is pair-scale, the near-dup machinery bounds all cost."""
    from ..operators.dedup import hash64

    pairs = q_conv_near_dups(spark, sf_dir)

    def split(c: str) -> F.Column:
        return F.when(
            hash64(F.col(c).cast("string")) % 100 < 30, F.lit("eval")
        ).otherwise(F.lit("train"))

    return (
        pairs.select(
            "id_a",
            "id_b",
            "jaccard",
            split("id_a").alias("split_a"),
            split("id_b").alias("split_b"),
        )
        .filter(F.col("split_a") != F.col("split_b"))
    )


# Incrementally maintained conversation signature index: the oracle is the
# FULL-REBUILD definition (signatures over the final folded state) — the
# query must produce it via old-index + CDC-delta maintenance, so a green
# row proves maintenance ≡ rebuild under the driver's value hash.
CONV_SIG_MAINTAIN_SQL = _minhash_sql(source=_CONV_FOLDED_SRC)


def q_conv_sig_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-maintained near-dup signature index (dedup.maintain_minhash_index):
    build the MinHash index over the PRE-b04 conversation state, then apply
    batch b04 as a delta — only conversations b04 touches are re-folded and
    re-hashed; everything else passes through an id anti-join untouched.
    Output equals the index a full rebuild of the final state would produce
    (the oracle IS that rebuild). At 100 TB this is the difference between
    per-epoch signature cost ∝ changed conversations and re-hashing the
    corpus every epoch."""
    events = derive_change_events(spark, sf_dir)
    good, _dead = resolve.validate(events, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    old_events = normalized.filter(F.col("batch_id") != "b04")
    old_state = lww.visible(
        lww.batch_registers(old_events, CDC_PAYLOAD), CDC_PAYLOAD
    )
    new_state = lww.visible(
        lww.batch_registers(normalized, CDC_PAYLOAD), CDC_PAYLOAD
    )
    old_index = dedup.minhash_signature(
        _fold_conversations(old_state), "doc_id", "text",
        n_hashes=4, k=3, hash_mode="oracle",
    )
    changed = normalized.filter(F.col("batch_id") == "b04").select(
        F.col("conv_id").alias("doc_id")
    )
    return dedup.maintain_minhash_index(
        old_index, changed, _fold_conversations(new_state),
        "doc_id", "text", n_hashes=4, k=3, hash_mode="oracle",
    )


# --------------------------------------------------------------------------
# freshness / sampling / funnel analytics (round 4 additions)
# --------------------------------------------------------------------------

# Per-key-bucket stream freshness: the dashboard behind the north rule's
# "per-partition watermark lag" metric, expressed over the DETERMINISTIC
# key-hash bucket (the logical partition — physical spark_partition_id is
# not replay-stable, see apply.batch_lineage which covers that side). Lag
# is event-time only (never wall clock) so replays report identical
# numbers. One map-side-combinable groupBy on a 16-value key, then the
# 16-row rollup joins the 1-row global watermark — nothing corpus-sized
# moves.
CDC_WATERMARK_LAG_SQL = """
WITH b AS (
  SELECT ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::INT64 % 16
           AS bucket,
         ts
  FROM events
),
r AS (
  SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n_events,
         max(ts) AS bucket_watermark
  FROM b GROUP BY bucket
)
SELECT bucket, n_events, bucket_watermark,
  CAST(epoch_us((SELECT max(bucket_watermark) FROM r))
       - epoch_us(bucket_watermark) AS BIGINT) AS lag_micros
FROM r
"""


def q_cdc_watermark_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    bucket = (
        dedup.hash64(F.col("user_id").cast("string")) % 16
    ).cast("int")
    roll = ev.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n_events"),
        F.max("ts").alias("bucket_watermark"),
    )
    wm = roll.agg(F.max("bucket_watermark").alias("global_watermark"))
    return roll.join(F.broadcast(wm)).select(
        "bucket",
        "n_events",
        "bucket_watermark",
        (
            F.unix_micros(F.col("global_watermark").cast("timestamp"))
            - F.unix_micros(F.col("bucket_watermark").cast("timestamp"))
        ).alias("lag_micros"),
    )


# Priority sampling (see operators/shard.py:priority_sample): weight =
# n_chars, k = 50. The doubles are cast-then-divide only, so the oracle
# reproduces them bit-for-bit.
DOCS_PRIORITY_SAMPLE_SQL = """
SELECT doc_id, n_chars,
  CAST(n_chars AS DOUBLE)
    / ((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::INT64 + 1)
       / 1152921504606846976e0) AS priority
FROM documents
ORDER BY priority DESC, doc_id
LIMIT 50
"""


def q_docs_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus downsampling (Duffield–Lund–Thorup priority
    sampling) by document length: global top-k by w/u runs as
    TakeOrderedAndProject — no full sort, no shuffle of the corpus."""
    from ..operators import shard

    docs = _read(spark, sf_dir, "documents")
    return shard.priority_sample(docs, "n_chars", 50)


# CCNet-style quality bucketing: per-language terciles of the quality
# score (head = best). ntile(3) over a TOTAL order (quality DESC, doc_id)
# is identical standard-SQL semantics in both engines; the window sorts
# within languages only — the same per-stratum shuffle shape as
# docs_stratified_sample, no global sort.
DOCS_QUALITY_BUCKETS_SQL = f"""
WITH q AS ({DOCS_QUALITY_SQL}),
j AS (
  SELECT d.doc_id, d.lang, q.quality
  FROM documents d JOIN q ON d.doc_id = q.doc_id
),
n AS (
  SELECT doc_id, lang, quality,
    ntile(3) OVER (PARTITION BY lang ORDER BY quality DESC, doc_id) AS t
  FROM j
)
SELECT doc_id, lang, quality,
  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
    AS ccnet_bucket
FROM n
"""


def q_docs_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _read(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("quality"), "doc_id")
    scored = docs.select(
        "doc_id", "lang", tf.quality_score(F.col("text")).alias("quality")
    )
    t = F.ntile(3).over(w)
    return scored.select(
        "doc_id",
        "lang",
        "quality",
        F.when(t == 1, F.lit("head"))
        .when(t == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ccnet_bucket"),
    )


# Ordered funnel: view -> click -> purchase per user, each step strictly
# after the previous one (sequence mining, not co-occurrence: a click
# BEFORE the first view does not count). Three user-keyed equi-joins with
# post-join time filters — never a range theta-join, never a window over
# the whole stream; every shuffle keys on user_id.
EVENTS_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
  CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
         + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS INT) AS stage
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return v.join(c, "user_id", "left").join(p, "user_id", "left").select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        (
            F.lit(1)
            + F.when(F.col("t_click").isNotNull(), 1).otherwise(0)
            + F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0)
        )
        .cast("int")
        .alias("stage"),
    )


# Cohort retention: users grouped by the Monday of their first-activity
# week, distinct-active-day offsets 0..13. Two user-keyed aggregations
# plus one user-keyed join; the output is cohorts x offsets (bounded),
# never user-sized.
EVENTS_RETENTION_SQL = """
WITH f AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
),
a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
j AS (
  SELECT a.user_id, date_trunc('week', f.d0) AS cohort_week,
         a.d - f.d0 AS offset_days
  FROM a JOIN f ON a.user_id = f.user_id
)
SELECT CAST(CAST(cohort_week AS DATE) AS VARCHAR) AS cohort_week,
       CAST(offset_days AS INT) AS offset_days,
       count(DISTINCT user_id) AS n_users
FROM j WHERE offset_days BETWEEN 0 AND 13
GROUP BY cohort_week, offset_days
"""


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _read(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("d0")
    )
    a = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    j = a.join(f, "user_id").select(
        "user_id",
        # emitted as an ISO string: a cohort label, and pandas renders
        # DATE differently across the two engines (date vs midnight ts)
        F.date_trunc("week", F.col("d0")).cast("date").cast("string").alias(
            "cohort_week"
        ),
        F.datediff(F.col("d"), F.col("d0")).alias("offset_days"),
    )
    return (
        j.filter(F.col("offset_days").between(0, 13))
        .groupBy("cohort_week", F.col("offset_days").cast("int").alias("offset_days"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


# --------------------------------------------------------------------------
# transaction-boundary atomic apply (operators/txn.py)
# --------------------------------------------------------------------------

# Deterministic transaction synthesis over the derived change log: every
# TXN_EVENTS consecutive lsns form one transaction (the metadata "END
# marker" expected count comes from the FULL log — the metadata topic);
# the observed stream drops every 97th lsn, simulating in-flight events
# at the cutoff, so their transactions must be held back whole.
TXN_EVENTS = 4
TXN_HOLE_MOD = 97


def _txn_stream(spark: SparkSession, sf_dir: str):
    full = derive_change_events(spark, sf_dir).withColumn(
        "txn_id", F.expr(f"(lsn - 1) DIV {TXN_EVENTS}")
    )
    meta = full.groupBy("txn_id").agg(
        F.count("*").alias("expected_events")
    )
    stream = full.filter(F.col("lsn") % TXN_HOLE_MOD != 0)
    return stream, meta


_TXN_GATED_SQL = f"""
evt AS (SELECT *, (lsn - 1) // {TXN_EVENTS} AS txn_id FROM ev),
meta AS (SELECT txn_id, count(*) AS expected_events FROM evt GROUP BY txn_id),
stream AS (SELECT * FROM evt WHERE lsn % {TXN_HOLE_MOD} <> 0),
obs AS (
  SELECT txn_id, count(DISTINCT lsn) AS observed
  FROM stream GROUP BY txn_id
)"""


def q_cdc_txn_atomic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic transaction apply: gate the stream on txn completeness
    (operators/txn.complete_txns — distinct-lsn counts vs the metadata
    expected counts, broadcast anti-join of the in-flight set), then the
    standard validate → LWW register → visible-state pipeline. Final
    state contains NO effect of any torn transaction."""
    from ..operators import txn as txn_ops

    stream, meta = _txn_stream(spark, sf_dir)
    gated = txn_ops.complete_txns(stream, meta).drop("txn_id")
    good, _dead = resolve.validate(gated, [])
    normalized = good.select(
        "lsn", "batch_id", "op", "conv_id", "turn_idx", *CDC_PAYLOAD
    )
    regs = lww.batch_registers(normalized, CDC_PAYLOAD)
    return lww.visible(regs, CDC_PAYLOAD)


CDC_TXN_ATOMIC_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
{_TXN_GATED_SQL},
complete AS (
  SELECT obs.txn_id FROM obs JOIN meta USING (txn_id)
  WHERE observed = expected_events
),
gated AS (
  SELECT * FROM stream WHERE txn_id IN (SELECT txn_id FROM complete)
),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool
  FROM gated
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG}
  FROM ev2 GROUP BY conv_id, turn_idx
)
SELECT conv_id, turn_idx,
  {_VIS}
FROM agg WHERE lup > ldel
"""


def q_cdc_txn_heldback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backlog view of the same gate: the in-flight (incomplete)
    transactions at the stream cutoff with observed vs expected counts
    (operators/txn.held_back). Non-empty here by construction — the
    stream's synthetic holes tear ~1/{mod} of transactions."""
    from ..operators import txn as txn_ops

    stream, meta = _txn_stream(spark, sf_dir)
    return txn_ops.held_back(stream, meta)


CDC_TXN_HELDBACK_SQL = f"""
WITH ev AS ({_EV_SQL_VALID}),
{_TXN_GATED_SQL}
SELECT obs.txn_id, observed, expected_events
FROM obs JOIN meta USING (txn_id)
WHERE observed <> expected_events
"""


# --------------------------------------------------------------------------
# keyword-relevance search (operators/relevance.py)
# --------------------------------------------------------------------------

_SEARCH_TERMS = ["vector", "merge", "scan"]


def q_docs_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexical retrieval: top-25 documents by BM25-shaped term relevance
    (rational idf — the no-transcendentals oracle-parity variant; see
    operators/relevance.py). One narrow tf projection + a broadcast 1-row
    stats reduce + TakeOrderedAndProject — the corpus never shuffles."""
    from ..operators import relevance

    docs = _read(spark, sf_dir, "documents")
    return relevance.keyword_topk(docs, "doc_id", "text", _SEARCH_TERMS, k=25)


def _docs_keyword_search_sql() -> str:
    from ..operators import relevance

    return relevance.keyword_topk_sql(
        "documents", "doc_id", "text", _SEARCH_TERMS, k=25
    )


# --------------------------------------------------------------------------
# round-5: file-stats data skipping
# --------------------------------------------------------------------------


def q_cdc_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level data skipping (VERDICT r4 #1, the biggest remaining
    100-TB scan lever): build the transcripts table through five fenced
    commits, ``optimize_layout`` it into 4 range-split files per bucket
    sorted by ``turn_idx`` (each file's manifest min/max then covers a
    disjoint turn slice), and range-scan the opening turns with
    ``visible(prune={"turn_idx": (0, 5)})`` — the "prompt prefixes of
    every conversation" read. The scan opens ~2 of 4 files per bucket
    instead of the whole bucket (asserted here: a zero-skip scan fails
    the row loudly rather than silently reporting an unpruned read as
    pruned); the oracle replays the full log and filters, so the green
    row proves skipping changes WHAT IS READ, never the answer. This is
    the reference's prefix-scoped listing
    (DeleteAllS3ObjectsByPrefix.kt:115-117) completed at file
    granularity; the same ``prune=`` path serves lsn-range CDC catch-ups
    (``_lsn_up``) and event-time scans (``ts``). The table is built in
    ONE fenced commit — multi-epoch commit mechanics are covered by the
    cdc_* rows; this row isolates the layout/skipping feature (five
    commits measured 3× the time for zero extra evidence)."""
    from ..table.lake import LakeTable

    events = derive_change_events(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="cdc_prune_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "table"), payload_cols=CDC_PAYLOAD, n_buckets=8
    )
    table.merge_batch(spark, events, fence_key="bootstrap", batch_id="all")
    table.optimize_layout(spark, sort_cols=("turn_idx",), files_per_bucket=4)
    vis = table.visible(spark, prune={"turn_idx": (0, 5)})
    scan = table.last_scan
    if not scan or scan["files_skipped"] == 0:
        raise AssertionError(
            f"cdc_pruned_scan: expected file skipping to engage, scan={scan}"
        )
    return vis


CDC_PRUNED_SCAN_SQL = f"""
WITH final AS ({CDC_FINAL_STATE_SQL})
SELECT * FROM final WHERE turn_idx BETWEEN 0 AND 5
"""


def q_cdc_pruned_time_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-TIME file skipping — the time-range scan named in VERDICT r4
    #1: the change events carry the source event time as the ``ts``
    payload column (full PAYLOAD_COLUMNS schema), the table is
    optimized into 4 ts-sorted range-split files per bucket, and a
    one-week window scan (`visible(prune={"ts": ...})`) opens only the
    files whose recorded [ts_min, ts_max] intersects the window —
    asserted (zero skips fails the row loudly). Register writes use
    TIMESTAMP_MICROS precisely so ts columns carry parquet stats (INT96
    has none). The oracle replays the 4-column LWW fold and filters by
    the same literals, so the green row proves event-time skipping never
    changes the answer."""
    import datetime as _dt

    from ..table.lake import LakeTable

    base = derive_change_events(spark, sf_dir)
    src_ts = _read(spark, sf_dir, "events").select(
        (F.col("event_id") + 1).alias("lsn"), F.col("ts").alias("_src_ts")
    )
    events = (
        base.drop("ts")
        .join(src_ts, "lsn")
        .withColumn(
            "ts", F.when(F.col("op") != "delete", F.col("_src_ts"))
        )
        .drop("_src_ts")
    )
    tmp = tempfile.mkdtemp(prefix="cdc_prune_ts_")
    table = LakeTable.create(spark, os.path.join(tmp, "table"), n_buckets=8)
    table.merge_batch(spark, events, fence_key="bootstrap", batch_id="all")
    table.optimize_layout(spark, sort_cols=("ts",), files_per_bucket=4)
    lo = _dt.datetime(2024, 1, 5)
    hi = _dt.datetime(2024, 1, 12)
    vis = table.visible(spark, prune={"ts": (lo, hi)})
    scan = table.last_scan
    if not scan or scan["files_skipped"] == 0:
        raise AssertionError(
            f"cdc_pruned_time_scan: expected file skipping, scan={scan}"
        )
    return vis


_EV_SQL_VALID_TS = """
  SELECT event_id + 1 AS lsn,
         CASE WHEN event_type = 'error' THEN 'delete'
              WHEN event_type = 'purchase' THEN 'update'
              ELSE 'insert' END AS op,
         CASE WHEN user_id % 7 = 0 AND event_type NOT IN ('error','purchase')
              THEN NULL
              ELSE 'conv-' || lpad(CAST(user_id AS VARCHAR), 6, '0') END AS conv_id,
         CAST(event_id % 25 AS INT) AS turn_idx,
         CASE WHEN event_type <> 'error' THEN event_type END AS role,
         CASE WHEN event_type <> 'error' AND value > 50
              THEN 'v' || CAST(CAST(round(value, 2) AS DECIMAL(18,2)) AS VARCHAR) END AS text,
         CASE WHEN event_type <> 'error' AND value > 100 THEN 'hot' END AS tool,
         CASE WHEN event_type <> 'error' THEN ts END AS ts
  FROM events
"""

_AGG_TS, _VIS_TS = _lww_agg_sql(["role", "text", "tool", "ts"])

CDC_PRUNED_TIME_SCAN_SQL = f"""
WITH ev AS ({_EV_SQL_VALID_TS}),
ev2 AS (
  SELECT lsn, op,
         coalesce(conv_id, 'conv-auto-' || lpad(upper(to_hex(lsn)), 16, '0')) AS conv_id,
         turn_idx, role, text, tool, ts
  FROM ev
),
agg AS (
  SELECT conv_id, turn_idx,
    coalesce(max(lsn) FILTER (WHERE op <> 'delete'), -1) AS lup,
    coalesce(max(lsn) FILTER (WHERE op = 'delete'), -1) AS ldel,
    {_AGG_TS}
  FROM ev2 GROUP BY conv_id, turn_idx
),
final AS (
  SELECT conv_id, turn_idx,
  {_VIS_TS}
  FROM agg WHERE lup > ldel
)
SELECT * FROM final
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <= TIMESTAMP '2024-01-12 00:00:00'
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "cdc_lww_final_state": q_cdc_lww_final_state,
    "cdc_streaming_final_state": q_cdc_streaming_final_state,
    "cdc_moves_final_state": q_cdc_moves_final_state,
    "cdc_moves_streaming": q_cdc_moves_streaming,
    "cdc_dead_letter": q_cdc_dead_letter,
    "cdc_dead_letter_replay": q_cdc_dead_letter_replay,
    "cdc_multi_shard_merge": q_cdc_multi_shard_merge,
    "cdc_id_synthesis": q_cdc_id_synthesis,
    "cdc_lineage_rollup": q_cdc_lineage_rollup,
    "cdc_schema_evolution": q_cdc_schema_evolution,
    "events_time_windows": q_events_time_windows,
    "events_rate_anomaly": q_events_rate_anomaly,
    "q1_pricing_summary": q_pricing_summary,
    "top_parts_by_revenue": q_top_parts_by_revenue,
    "validation_aggregate": q_validation_aggregate,
    "anti_join_cleanup": q_anti_join_cleanup,
    "union_distinct": q_union_distinct,
    "conv_fold": q_conv_fold,
    "window_lww": q_window_lww,
    "first_match": q_first_match,
    "events_routing": q_events_routing,
    "rational_projection": q_rational_projection,
    "rational_decimal": q_rational_decimal,
    "conv_document": q_conv_document,
    "conv_document_maintain": q_conv_document_maintain,
    "key_projection": q_key_projection,
    "json_props_roundtrip": q_json_props_roundtrip,
    "docs_exact_dedup": q_docs_exact_dedup,
    "docs_token_stats": q_docs_token_stats,
    "docs_nfc": q_docs_nfc,
    "docs_quality": q_docs_quality,
    "docs_lang_id": q_docs_lang_id,
    "docs_fingerprint": q_docs_fingerprint,
    "docs_minhash_sig": q_docs_minhash_sig,
    "docs_minhash_pairs": q_docs_minhash_pairs,
    "docs_dedup_clusters": q_docs_dedup_clusters,
    "clean_corpus": q_clean_corpus,
    "docs_ngram_jaccard": q_docs_ngram_jaccard,
    "docs_simhash": q_docs_simhash,
    "media_features": q_media_features,
    "ann_topk": q_ann_topk,
    "lsh_topk": q_lsh_topk,
    "ivf_topk": q_ivf_topk,
    "ivf_kmeans_topk": q_ivf_kmeans_topk,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_banded": q_embedding_neardup_banded,
    "embedding_norms": q_embedding_norms,
    "emb_truncate_renorm": q_emb_truncate_renorm,
    "xml_extract": q_xml_extract,
    "conv_document_v2": q_conv_document_v2,
    "cdc_hot_key": q_cdc_hot_key,
    "cdc_maintenance_cycle": q_cdc_maintenance_cycle,
    "cdc_continuous_final_state": q_cdc_continuous_final_state,
    "docs_pii_scrub": q_docs_pii_scrub,
    "docs_top_word_ratio": q_docs_top_word_ratio,
    "cdc_debezium_roundtrip": q_cdc_debezium_roundtrip,
    "events_sessionize": q_events_sessionize,
    "events_session_windows": q_events_session_windows,
    "events_asof_join": q_events_asof_join,
    "docs_contamination": q_docs_contamination,
    "docs_stratified_sample": q_docs_stratified_sample,
    "docs_vocab_topk": q_docs_vocab_topk,
    "cdc_table_changes": q_cdc_table_changes,
    "docs_boilerplate": q_docs_boilerplate,
    "docs_repetition": q_docs_repetition,
    "docs_token_shards": q_docs_token_shards,
    "docs_incremental_dedup": q_docs_incremental_dedup,
    "embedding_quantize": q_embedding_quantize,
    "docs_length_percentiles": q_docs_length_percentiles,
    "docs_span_dedup": q_docs_span_dedup,
    "docs_span_clean": q_docs_span_clean,
    "docs_pack_sequences": q_docs_pack_sequences,
    "docs_chunk_overlap": q_docs_chunk_overlap,
    "docs_shuffle": q_docs_shuffle,
    "docs_oov_rate": q_docs_oov_rate,
    "conv_training_examples": q_conv_training_examples,
    "conv_role_alternation": q_conv_role_alternation,
    "conv_loss_mask": q_conv_loss_mask,
    "conv_truncate": q_conv_truncate,
    "conv_structure_dedup": q_conv_structure_dedup,
    "conv_turn_loops": q_conv_turn_loops,
    "conv_tool_stats": q_conv_tool_stats,
    "docs_html_extract": q_docs_html_extract,
    "cdc_bootstrap_tail": q_cdc_bootstrap_tail,
    "clean_transcripts": q_clean_transcripts,
    "emb_kmeans_clusters": q_emb_kmeans_clusters,
    "conv_boilerplate_turns": q_conv_boilerplate_turns,
    "cdc_maxwell_roundtrip": q_cdc_maxwell_roundtrip,
    "cdc_txn_atomic": q_cdc_txn_atomic,
    "cdc_txn_heldback": q_cdc_txn_heldback,
    "docs_token_mixture": q_docs_token_mixture,
    "docs_lm_score": q_docs_lm_score,
    "docs_tfidf": q_docs_tfidf,
    "docs_bpe_pairs": q_docs_bpe_pairs,
    "docs_corpus_report": q_docs_corpus_report,
    "docs_winnowing": q_docs_winnowing,
    "docs_winnowing_pairs": q_docs_winnowing_pairs,
    "docs_bloom_dedup": q_docs_bloom_dedup,
    "emb_hard_negatives": q_emb_hard_negatives,
    "docs_simhash_pairs": q_docs_simhash_pairs,
    "cdc_gap_audit": q_cdc_gap_audit,
    "cdc_scd2_history": q_cdc_scd2_history,
    "cdc_reconcile": q_cdc_reconcile,
    "conv_train_eval_split": q_conv_train_eval_split,
    "conv_pii_scrub": q_conv_pii_scrub,
    "conv_near_dups": q_conv_near_dups,
    "cdc_watermark_lag": q_cdc_watermark_lag,
    "docs_priority_sample": q_docs_priority_sample,
    "docs_quality_buckets": q_docs_quality_buckets,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "docs_keyword_search": q_docs_keyword_search,
    "cdc_incremental_rollup": q_cdc_incremental_rollup,
    "cdc_scd2_pit_join": q_cdc_scd2_pit_join,
    "cdc_forget_keys": q_cdc_forget_keys,
    "cdc_source_order_audit": q_cdc_source_order_audit,
    "emb_semantic_dedup": q_emb_semantic_dedup,
    "docs_dedup_best_rep": q_docs_dedup_best_rep,
    "emb_cluster_sample": q_emb_cluster_sample,
    "conv_split_leakage": q_conv_split_leakage,
    "conv_sig_maintain": q_conv_sig_maintain,
    "cdc_text_churn": q_cdc_text_churn,
    # round-5 additions (newest → first in the driver window after the
    # reversal below)
    "cdc_pruned_scan": q_cdc_pruned_scan,
    "cdc_pruned_time_scan": q_cdc_pruned_time_scan,
    "docs_bpe_encode": q_docs_bpe_encode,
    "pq_topk": q_pq_topk,
    "media_phash_pairs": q_media_phash_pairs,
    "docs_bpe_token_shards": q_docs_bpe_token_shards,
    "docs_bpe_pack": q_docs_bpe_pack,
    "docs_bpe_compression": q_docs_bpe_compression,
    # production-hash variants (xxhash64 backend; rows-only driver check —
    # DuckDB cannot reproduce xxhash64, see the section comment above)
    "docs_minhash_sig_prod": q_docs_minhash_sig_prod,
    "docs_minhash_pairs_prod": q_docs_minhash_pairs_prod,
    "docs_simhash_prod": q_docs_simhash_prod,
    "docs_incremental_dedup_prod": q_docs_incremental_dedup_prod,
    "docs_span_dedup_prod": q_docs_span_dedup_prod,
}

# Driver-coverage hygiene (VERDICT r4 #9): the driver's CORRECTNESS sample
# checks a prefix window of queries(), so surface the LEAST-validated
# entries first — the literal above is ordered oldest→newest, and newer
# rounds' queries have the fewest driver-checked rounds behind them.
# Reversing puts them in the driver's window; the full sweep
# (scripts/check_driver_contract.py) still covers every entry.
QUERIES = dict(reversed(list(QUERIES.items())))
# ...except the *_prod rows-only variants (no oracle, weakest driver check
# value) — keep those at the back of the window
_prod_keys = [k for k in QUERIES if k.endswith("_prod")]
QUERIES = {
    **{k: v for k, v in QUERIES.items() if k not in _prod_keys},
    **{k: QUERIES[k] for k in _prod_keys},
}

ORACLES: dict[str, str] = {
    "cdc_lww_final_state": CDC_FINAL_STATE_SQL,
    "cdc_streaming_final_state": CDC_FINAL_STATE_SQL,
    "cdc_moves_final_state": CDC_MOVES_SQL,
    "cdc_moves_streaming": CDC_MOVES_SQL,
    "cdc_dead_letter": CDC_DEAD_LETTER_SQL,
    "cdc_dead_letter_replay": CDC_DEAD_LETTER_REPLAY_SQL,
    "cdc_multi_shard_merge": CDC_MULTI_SHARD_SQL,
    "cdc_id_synthesis": CDC_ID_SYNTHESIS_SQL,
    "cdc_lineage_rollup": CDC_LINEAGE_SQL,
    "cdc_schema_evolution": CDC_EVOLUTION_SQL,
    "events_time_windows": EVENTS_TIME_WINDOWS_SQL,
    "events_rate_anomaly": EVENTS_RATE_ANOMALY_SQL,
    "q1_pricing_summary": Q1_SQL,
    "top_parts_by_revenue": TOP_PARTS_SQL,
    "validation_aggregate": VALIDATION_AGG_SQL,
    "anti_join_cleanup": ANTI_JOIN_SQL,
    "union_distinct": UNION_DISTINCT_SQL,
    "conv_fold": CONV_FOLD_SQL,
    "window_lww": WINDOW_LWW_SQL,
    "first_match": FIRST_MATCH_SQL,
    "events_routing": ROUTING_SQL,
    "rational_projection": RATIONAL_SQL,
    "rational_decimal": RATIONAL_DECIMAL_SQL,
    "conv_document": CONV_DOCUMENT_SQL,
    "conv_document_maintain": CONV_DOCUMENT_SQL,
    "key_projection": KEY_PROJECTION_SQL,
    "json_props_roundtrip": JSON_PROPS_SQL,
    "docs_exact_dedup": DOCS_EXACT_DEDUP_SQL,
    "docs_token_stats": DOCS_TOKEN_STATS_SQL,
    "docs_nfc": DOCS_NFC_SQL,
    "docs_quality": DOCS_QUALITY_SQL,
    "docs_lang_id": DOCS_LANG_SQL,
    "docs_fingerprint": DOCS_FINGERPRINT_SQL,
    "docs_minhash_sig": DOCS_MINHASH_SQL,
    "docs_minhash_pairs": DOCS_MINHASH_PAIRS_SQL,
    "docs_dedup_clusters": DOCS_DEDUP_CLUSTERS_SQL,
    "clean_corpus": CLEAN_CORPUS_SQL,
    "docs_ngram_jaccard": NGRAM_JACCARD_SQL,
    "docs_simhash": DOCS_SIMHASH_SQL,
    "media_features": MEDIA_FEATURES_SQL,
    "ann_topk": ANN_TOPK_SQL,
    "lsh_topk": LSH_TOPK_SQL,
    "ivf_topk": IVF_TOPK_SQL,
    "ivf_kmeans_topk": IVF_KMEANS_TOPK_SQL,
    "embedding_neardup": EMB_NEARDUP_SQL,
    "embedding_neardup_banded": EMB_NEARDUP_BANDED_SQL,
    "embedding_norms": EMBEDDING_NORMS_SQL,
    "emb_truncate_renorm": EMB_TRUNCATE_RENORM_SQL,
    "xml_extract": XML_EXTRACT_SQL,
    "conv_document_v2": CONV_DOCUMENT_V2_SQL,
    "cdc_hot_key": CDC_HOT_KEY_SQL,
    "cdc_maintenance_cycle": CDC_FINAL_STATE_SQL,
    "cdc_continuous_final_state": CDC_FINAL_STATE_SQL,
    "docs_pii_scrub": DOCS_PII_SCRUB_SQL,
    "docs_top_word_ratio": DOCS_TOP_WORD_SQL,
    "cdc_debezium_roundtrip": CDC_FINAL_STATE_SQL,
    "events_sessionize": SESSIONIZE_SQL,
    "events_session_windows": SESSION_WINDOWS_SQL,
    "events_asof_join": ASOF_SQL,
    "docs_contamination": CONTAMINATION_SQL,
    "docs_stratified_sample": STRATIFIED_SAMPLE_SQL,
    "docs_vocab_topk": VOCAB_TOPK_SQL,
    "cdc_table_changes": CDC_TABLE_CHANGES_SQL,
    "docs_boilerplate": BOILERPLATE_SQL,
    "docs_repetition": REPETITION_SQL,
    "docs_token_shards": TOKEN_SHARDS_SQL,
    "docs_incremental_dedup": DOCS_INCREMENTAL_DEDUP_SQL,
    "embedding_quantize": EMBEDDING_QUANTIZE_SQL,
    "docs_length_percentiles": DOCS_LENGTH_PERCENTILES_SQL,
    "docs_span_dedup": DOCS_SPAN_DEDUP_SQL,
    "docs_span_clean": DOCS_SPAN_CLEAN_SQL,
    "docs_pack_sequences": PACK_SEQUENCES_SQL,
    "docs_chunk_overlap": CHUNK_OVERLAP_SQL,
    "docs_shuffle": DOCS_SHUFFLE_SQL,
    "docs_oov_rate": DOCS_OOV_RATE_SQL,
    "conv_training_examples": CONV_TRAINING_EXAMPLES_SQL_TMPL.format(
        final_state=CDC_FINAL_STATE_SQL
    ),
    "conv_role_alternation": CONV_ROLE_ALTERNATION_SQL,
    "conv_loss_mask": CONV_LOSS_MASK_SQL,
    "conv_truncate": CONV_TRUNCATE_SQL,
    "conv_structure_dedup": CONV_STRUCTURE_DEDUP_SQL,
    "conv_turn_loops": CONV_TURN_LOOPS_SQL,
    "conv_tool_stats": CONV_TOOL_STATS_SQL,
    "docs_html_extract": DOCS_HTML_EXTRACT_SQL,
    "cdc_bootstrap_tail": CDC_FINAL_STATE_SQL,
    "clean_transcripts": CLEAN_TRANSCRIPTS_SQL,
    "emb_kmeans_clusters": EMB_KMEANS_CLUSTERS_SQL,
    "conv_boilerplate_turns": CONV_BOILERPLATE_SQL,
    "cdc_maxwell_roundtrip": CDC_FINAL_STATE_SQL,
    "cdc_txn_atomic": CDC_TXN_ATOMIC_SQL,
    "cdc_txn_heldback": CDC_TXN_HELDBACK_SQL,
    "docs_token_mixture": DOCS_TOKEN_MIXTURE_SQL,
    "docs_lm_score": DOCS_LM_SCORE_SQL,
    "docs_tfidf": DOCS_TFIDF_SQL,
    "docs_bpe_pairs": DOCS_BPE_PAIRS_SQL,
    "docs_corpus_report": DOCS_CORPUS_REPORT_SQL,
    "docs_winnowing": DOCS_WINNOWING_SQL,
    "docs_winnowing_pairs": DOCS_WINNOWING_PAIRS_SQL,
    "docs_bloom_dedup": DOCS_BLOOM_DEDUP_SQL,
    "emb_hard_negatives": EMB_HARD_NEGATIVES_SQL,
    "docs_simhash_pairs": DOCS_SIMHASH_PAIRS_SQL,
    "cdc_gap_audit": CDC_GAP_AUDIT_SQL,
    "cdc_scd2_history": CDC_SCD2_SQL,
    "cdc_reconcile": CDC_RECONCILE_SQL,
    "conv_train_eval_split": CONV_TRAIN_EVAL_SPLIT_SQL,
    "conv_pii_scrub": CONV_PII_SCRUB_SQL,
    "conv_near_dups": CONV_NEAR_DUPS_SQL,
    "cdc_watermark_lag": CDC_WATERMARK_LAG_SQL,
    "docs_priority_sample": DOCS_PRIORITY_SAMPLE_SQL,
    "docs_quality_buckets": DOCS_QUALITY_BUCKETS_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "events_retention": EVENTS_RETENTION_SQL,
    "docs_keyword_search": _docs_keyword_search_sql(),
    "cdc_incremental_rollup": CDC_INCREMENTAL_ROLLUP_SQL,
    "cdc_scd2_pit_join": CDC_SCD2_PIT_SQL,
    "cdc_forget_keys": CDC_FORGET_KEYS_SQL,
    "cdc_source_order_audit": CDC_SOURCE_ORDER_SQL,
    "emb_semantic_dedup": EMB_SEMANTIC_DEDUP_SQL,
    "docs_dedup_best_rep": DOCS_DEDUP_BEST_REP_SQL,
    "emb_cluster_sample": EMB_CLUSTER_SAMPLE_SQL,
    "conv_split_leakage": CONV_SPLIT_LEAKAGE_SQL,
    "conv_sig_maintain": CONV_SIG_MAINTAIN_SQL,
    "cdc_text_churn": CDC_TEXT_CHURN_SQL,
    "cdc_pruned_scan": CDC_PRUNED_SCAN_SQL,
    "cdc_pruned_time_scan": CDC_PRUNED_TIME_SCAN_SQL,
    "docs_bpe_encode": DOCS_BPE_ENCODE_SQL,
    "pq_topk": PQ_TOPK_SQL,
    "media_phash_pairs": MEDIA_PHASH_PAIRS_SQL,
    "docs_bpe_token_shards": DOCS_BPE_TOKEN_SHARDS_SQL,
    "docs_bpe_pack": DOCS_BPE_PACK_SQL,
    "docs_bpe_compression": DOCS_BPE_COMPRESSION_SQL,
}
