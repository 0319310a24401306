"""Per-key compaction: last-writer-wins fold + I..D chain elimination.

The core correctness operator (SURVEY.md §2.6 A1). Reference:
dm/syncer/compactor.go:152-219 (opType fold matrix: I+U→I, U+U→U, I+D→drop,
D+I→replace, *+D→D) and pkg/sqlmodel/reduce.go:104-122.

Spark-first design choice: the fold is a ``groupBy(key).agg(max(struct))``
over the canonical ordering prefix rather than a window ``row_number() == 1``.
``max`` is an algebraic aggregate, so Spark performs **map-side partial
aggregation** — every input partition pre-folds its local events before the
shuffle. That makes a hot key (one conv/turn receiving 30% of the stream)
shuffle at most one row per input partition instead of its entire history:
the skew handling TiCDC lacks (SURVEY.md §4 "hot-key skew absent in
reference") falls out of the operator shape, with no explicit salting needed
for the fold itself. It is also partition-count-invariant by construction
(a pure function of each key group), which the N vs 4N determinism rule
requires.

The I..D elimination (a key inserted and deleted within one epoch emits
nothing) is pure write-amplification reduction: the MERGE treats a delete of
an absent key as a no-op either way, but not emitting the row avoids touching
its bucket at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tiflow_spark.model import OP_DELETE, OP_INSERT, op_rank


def _order_struct(value_cols: list[str]):
    """Lexicographically-comparable ordering prefix + carried values.

    Ordering = (commit_ts, op_rank, start_ts, seq): delete-before-put at
    equal commit_ts (cdc/sorter/encoding/key.go:79-80), so under ``max`` a
    put at the same commit_ts beats the delete — matching sequential apply.
    """
    return F.struct(
        F.col("commit_ts").alias("_o1"),
        op_rank("op").alias("_o2"),
        F.coalesce(F.col("start_ts"), F.lit(-1)).alias("_o3"),
        F.col("seq").alias("_o4"),
        F.col("op").alias("op"),
        *[F.col(c).alias(c) for c in value_cols],
    )


def lww_fold(dml: DataFrame, key_cols, value_cols, stats: bool = False) -> DataFrame:
    """One row per key: the last event in canonical order.

    Output columns: key_cols + op + value_cols; with ``stats=True`` also
    ``_n_events`` (chain length) and ``_max_commit_ts`` per key, computed in
    the SAME aggregate pass — lineage comes for free with the fold, no second
    scan of the epoch slice (A6 without A6's extra pass).
    """
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    aggs = [F.max(_order_struct(value_cols)).alias("_last")]
    if stats:
        aggs += [
            F.count("*").alias("_n_events"),
            F.max("commit_ts").alias("_max_commit_ts"),
        ]
    folded = dml.groupBy(*key_cols).agg(*aggs)
    out_cols = [
        *key_cols,
        F.col("_last.op").alias("op"),
        *[F.col(f"_last.{c}").alias(c) for c in value_cols],
    ]
    if stats:
        out_cols += [F.col("_n_events"), F.col("_max_commit_ts")]
    return folded.select(*out_cols)


def compact_changes(
    dml: DataFrame,
    key_cols,
    value_cols,
    strict_inserts: bool = False,
    stats: bool = False,
) -> DataFrame:
    """LWW fold implementing the compactor matrix
    (dm/syncer/compactor.go:152-161): the emitted op is the last op of the
    chain; D…I ("replace") and every other combination reduce to an
    idempotent upsert or delete under MERGE semantics.

    ``strict_inserts=True`` additionally drops keys whose chain starts with I
    and ends with D (compactor.go:189) — sound ONLY when an I is a guaranteed
    true insert (the key cannot pre-exist in the target), as in the
    reference. Under blind-upsert streams (safe-mode REPLACE semantics, where
    an I may overwrite an existing key) the delete must still be emitted,
    so the default keeps it; the delete-of-absent is a MERGE no-op anyway.
    """
    key_cols = list(key_cols)
    value_cols = list(value_cols)
    if not strict_inserts:
        return lww_fold(dml, key_cols, value_cols, stats=stats)
    first_op_struct = F.struct(
        F.col("commit_ts").alias("_o1"),
        op_rank("op").alias("_o2"),
        F.coalesce(F.col("start_ts"), F.lit(-1)).alias("_o3"),
        F.col("seq").alias("_o4"),
        F.col("op").alias("op"),
    )
    folded = dml.groupBy(*key_cols).agg(
        F.max(_order_struct(value_cols)).alias("_last"),
        F.min(first_op_struct).alias("_first"),
    )
    return (
        folded.filter(
            ~(
                (F.col("_first.op") == OP_INSERT)
                & (F.col("_last.op") == OP_DELETE)
            )
        ).select(
            *key_cols,
            F.col("_last.op").alias("op"),
            *[F.col(f"_last.{c}").alias(c) for c in value_cols],
        )
    )


def split_updates(
    events: DataFrame, key_cols, pre_key_cols, value_cols, pre_value_cols
) -> DataFrame:
    """Update-split (SURVEY.md §2.3 M2): an update whose key changed becomes
    a delete of the old key followed by an insert of the new key, delete
    ordered first (cdc/processor/pipeline/sink.go:226-284;
    pkg/sqlmodel/reduce.go:126-155).

    Expressed as an ``explode`` of a two-element struct array — fully
    JVM-side, no Python in the hot path.
    """
    key_cols = list(key_cols)
    pre_key_cols = list(pre_key_cols)
    value_cols = list(value_cols)
    pre_value_cols = list(pre_value_cols)

    key_changed = None
    for k, pk in zip(key_cols, pre_key_cols):
        c = F.col(k) != F.col(pk)
        key_changed = c if key_changed is None else (key_changed | c)
    is_split = (F.col("op") == "U") & key_changed

    def _variant(op, keys, values):
        return F.struct(
            F.lit(op).alias("op"),
            *[F.col(src).alias(dst) for src, dst in zip(keys, key_cols)],
            *[F.col(src).alias(dst) for src, dst in zip(values, value_cols)],
        )

    passthrough = F.array(_variant(None, key_cols, value_cols))
    pair = F.array(
        _variant(OP_DELETE, pre_key_cols, pre_value_cols),
        _variant(OP_INSERT, key_cols, value_cols),
    )
    consumed = (
        set(key_cols)
        | set(value_cols)
        | set(pre_key_cols)
        | set(pre_value_cols)
        | {"op"}
    )
    other_cols = [c for c in events.columns if c not in consumed]
    exploded = events.select(
        *other_cols,
        F.col("op").alias("_orig_op"),
        F.posexplode(F.when(is_split, pair).otherwise(passthrough)).alias(
            "_pos", "_v"
        ),
    )
    return exploded.select(
        *other_cols,
        F.coalesce(F.col("_v.op"), F.col("_orig_op")).alias("op"),
        F.col("_pos").alias("split_pos"),
        *[F.col(f"_v.{c}").alias(c) for c in key_cols + value_cols],
    )
