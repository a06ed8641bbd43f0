"""Maxwell-daemon CDC source.

Maxwell is the other widely deployed MySQL binlog-to-JSON tailer (next to
Debezium): one flat JSON object per change with ``type`` ∈
{insert, update, delete, bootstrap-insert}, the full row image in
``data``, previous values of changed columns in ``old``, and the binlog
position as ``position`` = "<file>:<offset>".  This adapter turns a
DataFrame of Maxwell lines (Kafka ``value`` column / file tail) into the
engine's normalized CHANGE_EVENT_SCHEMA rows so validation, LWW registers
and fenced lake commits are shared with the native and Debezium paths.

Same seam as sources/debezium.py (the reference's change-batch JSON parse,
ReorderFiles.kt:359-366): ONE JVM-side ``from_json`` with an explicit
schema — no Python, no schema-inference job, zero added shuffles.

Position → lsn: binlog positions are totally ordered by
(file sequence, byte offset); the adapter maps
``mysql-bin.NNNNNN:OFFSET`` to ``NNNNNN * 10^12 + OFFSET`` — a strictly
monotone embedding (binlog files cap at 1 GB << 10^12), computed with two
JVM regexp extracts.  Lines whose position does not parse keep a NULL lsn
and dead-letter through resolve.validate, raw line preserved in
extra['_raw'].

Op mapping: insert and bootstrap-insert → insert (Maxwell's bootstrap
emits full-row inserts — the same snapshot-import semantics as
operators/bootstrap.py), update → update, delete → delete (Maxwell puts
the deleted row image in ``data``).  Control records
(bootstrap-start/complete, DDL events) and unparseable lines keep their
foreign/NULL op and are dead-lettered with the raw line — visible, never
silently dropped; a deployment that wants them routed elsewhere filters
the dead-letter table by reason.

Maxwell has no move/rename op (row identity is the primary key), so
``src_conv_id``/``src_turn_idx`` are always NULL — as with Debezium,
moves exist only on the engine's native log format.

Full-row images apply as upserts of their non-NULL columns: under the
engine's partial-update rule a SQL ``SET col = NULL`` is
indistinguishable from "column unchanged" (true of the Debezium adapter
too) — a source schema that needs explicit NULL assignment should model
it as a sentinel or a delete+insert, as the reference does with
tombstones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Row image: transcripts key + payload. Temporal columns travel as epoch
# micros (ts_us) for bit-exact round trips, like the Debezium adapter.
MAXWELL_ROW = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts_us", T.LongType(), True),
        T.StructField("extra", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("schema_version", T.IntegerType(), True),
    ]
)

MAXWELL_ENVELOPE = T.StructType(
    [
        T.StructField("database", T.StringType(), True),
        T.StructField("table", T.StringType(), True),
        T.StructField("type", T.StringType(), True),
        T.StructField("ts", T.LongType(), True),
        T.StructField("xid", T.LongType(), True),
        T.StructField("position", T.StringType(), True),
        T.StructField("data", MAXWELL_ROW, True),
        T.StructField("old", MAXWELL_ROW, True),
    ]
)

# mysql-bin.000006:800911 → (6, 800911). The file-sequence weight keeps
# the embedding monotone across binlog rotation; offsets are < 2^30.
_POS_FILE = r"^[^:]*\.(\d+):\d+$"
_POS_OFF = r"^[^:]*\.\d+:(\d+)$"
LSN_FILE_WEIGHT = 1_000_000_000_000


def position_to_lsn(pos: F.Column) -> F.Column:
    """Binlog 'file:offset' position → monotone integer lsn (NULL when
    the position does not parse — validate() dead-letters it)."""
    f = F.regexp_extract(pos, _POS_FILE, 1)
    o = F.regexp_extract(pos, _POS_OFF, 1)
    return F.when(
        (f != "") & (o != ""),
        f.cast("long") * F.lit(LSN_FILE_WEIGHT) + o.cast("long"),
    )


def parse_maxwell(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Maxwell lines → normalized CHANGE_EVENT_SCHEMA rows.

    Same single-parse discipline as parse_debezium: the from_json runs in
    its own projection so the multiply-referenced struct is parsed ONCE
    per row (CollapseProject leaves non-cheap multi-referenced
    expressions un-inlined)."""
    parsed = df.select(
        F.from_json(F.col(value_col), MAXWELL_ENVELOPE).alias("_env"),
        F.col(value_col),
    )
    p = F.col("_env")
    row = p["data"]  # Maxwell: deletes carry the deleted row in data too
    op = (
        F.when(p["type"].isin("insert", "bootstrap-insert"), F.lit("insert"))
        .when(p["type"] == "update", F.lit("update"))
        .when(p["type"] == "delete", F.lit("delete"))
        .otherwise(p["type"])  # control/DDL/NULL → validate() → dead letter
    )
    return parsed.select(
        position_to_lsn(p["position"]).alias("lsn"),
        F.concat(F.lit("tx-"), F.coalesce(p["xid"].cast("string"),
                                          F.lit("unknown"))).alias("batch_id"),
        op.alias("op"),
        row["conv_id"].alias("conv_id"),
        row["turn_idx"].alias("turn_idx"),
        F.lit(None).cast("string").alias("src_conv_id"),
        F.lit(None).cast("int").alias("src_turn_idx"),
        row["role"].alias("role"),
        row["text"].alias("text"),
        row["tool"].alias("tool"),
        F.timestamp_micros(row["ts_us"]).alias("ts"),
        # every dead-letter-bound record keeps its raw line: missing/
        # unmapped type (control/DDL), and unparseable positions alike
        F.when(
            p["type"].isNull()
            | ~p["type"].isin("insert", "bootstrap-insert", "update", "delete")
            | position_to_lsn(p["position"]).isNull(),
            F.create_map(F.lit("_raw"), F.col(value_col)),
        )
        .otherwise(row["extra"])
        .alias("extra"),
        F.coalesce(row["schema_version"], F.lit(1)).alias("schema_version"),
    )


def to_maxwell(events: DataFrame) -> DataFrame:
    """Normalized change events → one Maxwell line per event (column
    ``value``) — the exact inverse of :func:`parse_maxwell` for the
    insert/update/delete subset; test/roundtrip-oracle helper (real
    deployments read Maxwell from Kafka, not from this function)."""
    row = F.struct(
        F.col("conv_id"),
        F.col("turn_idx"),
        F.col("role"),
        F.col("text"),
        F.col("tool"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.col("extra"),
        F.col("schema_version"),
    )
    mx_type = (
        F.when(F.col("op") == "insert", F.lit("insert"))
        .when(F.col("op") == "update", F.lit("update"))
        .when(F.col("op") == "delete", F.lit("delete"))
        .otherwise(F.col("op"))
    )
    position = F.concat(
        F.lit("mysql-bin."),
        # integer DIV, not `/`: double division rounds for lsn > 2^53 and
        # can name the wrong binlog file (same rule as pack_sequences)
        F.lpad(F.expr(f"lsn DIV {LSN_FILE_WEIGHT}").cast("string"), 6, "0"),
        F.lit(":"),
        (F.col("lsn") % LSN_FILE_WEIGHT).cast("string"),
    )
    xid = F.regexp_extract(F.col("batch_id"), r"(\d+)$", 1)
    env = F.struct(
        F.lit("engine").alias("database"),
        F.lit("transcripts").alias("table"),
        mx_type.alias("type"),
        F.lit(None).cast("long").alias("ts"),
        F.when(xid != "", xid.cast("long")).alias("xid"),
        position.alias("position"),
        row.alias("data"),
        F.lit(None).cast(MAXWELL_ROW).alias("old"),
    )
    return events.select(F.to_json(env).alias("value"))
