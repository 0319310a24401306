"""Data model: event envelope, transcript payload, ordering semantics.

Mirrors the reference's event abstractions (cdc/model/sink.go:250-283
RowChangedEvent, cdc/model/kv.go:28-33 OpType incl. in-band Resolved) with an
explicit ``op`` column instead of the structural pre/post-columns encoding,
per SURVEY.md §1.1 and FIXTURES.md F2.

Ordering contract (cdc/sorter/memory/entry_sorter.go:162-173 `eventLess`,
cdc/sorter/encoding/key.go:79-80): events apply in
``(commit_ts, ddl_rank, op_rank, start_ts, seq)`` order where

- deletes sort before puts at equal commit_ts (op_rank: D=0, I/U=1), so at an
  equal timestamp the put wins last-writer-wins;
- a DML with commit_ts == a DDL's commit_ts decodes against the pre-DDL schema
  (cdc/entry/mounter.go:201-203: snapshot at ``CRTs - 1``) and is applied
  before the DDL barrier (cdc/processor/pipeline/sink.go:143-151 flushes rows
  <= barrier before the DDL executes) — hence ddl_rank: DML=0, DDL=1;
- ``seq`` (global append order) is the final tiebreak.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# --- ops (cdc/model/kv.go:28-33; R == OpTypeResolved, in-band watermark) ---
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"
OP_DDL = "DDL"
OP_RESOLVED = "R"

DML_OPS = (OP_INSERT, OP_UPDATE, OP_DELETE)

# --- changefeed event envelope (FIXTURES.md F2) ---
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("commit_ts", T.LongType(), False),
        T.StructField("start_ts", T.LongType(), True),
        T.StructField("schema_version", T.IntegerType(), True),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("payload", T.StringType(), True),
        T.StructField("pre_payload", T.StringType(), True),
        T.StructField("ddl", T.StringType(), True),
        T.StructField("partition_hint", T.IntegerType(), True),
        # source table of the event (cdc/model/sink.go:255 Table field; DM
        # route-rule input). Null → the changefeed's default table, so
        # single-table logs written before this column existed read fine
        # (parquet schema projection fills missing columns with null).
        T.StructField("tbl", T.StringType(), True),
    ]
)

# the implicit source-table name for events with tbl == null
DEFAULT_TABLE = "transcripts"

# --- target table key (BASELINE.json input_hint) ---
KEY_COLS = ("conv_id", "turn_idx")

# --- transcript payload v1 (BASELINE.json input_hint) ---
# (field_id, name, spark type ddl string, default)
TRANSCRIPT_V1_FIELDS = [
    (1, "role", "string", None),
    (2, "text", "string", None),
    (3, "tool", "string", None),
    (4, "ts", "timestamp", None),
]


def op_rank(col: Column | str = "op") -> Column:
    """Delete-before-put rank at equal commit_ts (encoding/key.go:79-80)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == OP_DELETE, F.lit(0)).otherwise(F.lit(1))


def ddl_rank(col: Column | str = "op") -> Column:
    """DML applies before a DDL sharing its commit_ts (see module docstring)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c == OP_DDL, F.lit(1)).otherwise(F.lit(0))


def event_order_cols(df_prefix: str = "") -> list[Column]:
    """The canonical apply-order sort key for changefeed events."""
    p = f"{df_prefix}." if df_prefix else ""
    return [
        F.col(f"{p}commit_ts"),
        ddl_rank(f"{p}op"),
        op_rank(f"{p}op"),
        F.col(f"{p}start_ts"),
        F.col(f"{p}seq"),
    ]


_INTEGRAL_TYPES = ("int", "integer", "bigint", "long", "smallint", "tinyint")


def evolve_cast(col: Column, typ: str) -> Column:
    """Schema-evolution cast (modify_column / type-recycled decode): null on
    malformed input (ANSI cast would abort the job), and integral targets
    fall back through double so a fractional lexeme truncates
    (``'1.5' -> 1``) instead of nulling — matching the sequential oracle's
    ``_coerce`` (``int(float(v))``). The direct try_cast is preferred so
    integer lexemes wider than double's 53-bit mantissa stay exact."""
    if typ.lower() in _INTEGRAL_TYPES:
        return F.coalesce(
            col.try_cast(typ), col.try_cast("double").try_cast(typ)
        )
    return col.try_cast(typ)


def transcript_struct(fields: list[tuple[int, str, str, object]]) -> T.StructType:
    """StructType for a payload JSON at a given registry version's fields.

    Built via fromDDL so every Spark DDL type alias works ("int" as well as
    "integer" — StructType.add only accepts the JSON type names)."""
    return T.StructType.fromDDL(
        ", ".join(f"`{name}` {ddl}" for _fid, name, ddl, _default in fields)
    )
