"""Compaction matrix — the reference's 9-case opType fold table
(dm/syncer/compactor.go:152-161) plus ordering edge cases
(cdc/sorter/memory/entry_sorter.go:162-173: delete before put at equal ts).
"""

import pytest
from pyspark.sql import functions as F

from tiflow_spark.operators.compactor import compact_changes, lww_fold, split_updates

SCHEMA = (
    "seq long, op string, commit_ts long, start_ts long, "
    "conv_id string, turn_idx int, text string"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


K = ("c1", 1)


def _chain(spark, *ops):
    rows = [
        (i, op, 100 + i, 99 + i, K[0], K[1], None if op == "D" else f"v{i}")
        for i, op in enumerate(ops)
    ]
    return _df(spark, rows)


@pytest.mark.parametrize(
    "ops,expect_op,expect_text",
    [
        (["I"], "I", "v0"),
        (["U"], "U", "v0"),
        (["D"], "D", None),
        (["I", "U"], "U", "v1"),  # ref emits I+U→I; upsert-equivalent
        (["U", "U"], "U", "v1"),
        (["U", "D"], "D", None),
        (["D", "I"], "I", "v1"),  # replace/safe-mode case
        (["I", "U", "U"], "U", "v2"),
        (["U", "D", "I", "U"], "U", "v3"),
    ],
)
def test_fold_matrix(spark, ops, expect_op, expect_text):
    out = compact_changes(
        _chain(spark, *ops), ["conv_id", "turn_idx"], ["text"]
    )
    r = _one(out)
    assert r["op"] == expect_op
    assert r["text"] == expect_text


def test_insert_then_delete_vanishes_under_strict_inserts(spark):
    """I…D within one epoch emits nothing (compactor.go:189 drop case) —
    only under the reference's true-insert assumption."""
    out = compact_changes(
        _chain(spark, "I", "U", "D"), ["conv_id", "turn_idx"], ["text"],
        strict_inserts=True,
    )
    assert out.count() == 0
    out2 = compact_changes(
        _chain(spark, "I", "D"), ["conv_id", "turn_idx"], ["text"],
        strict_inserts=True,
    )
    assert out2.count() == 0


def test_insert_then_delete_emits_delete_by_default(spark):
    """Under blind-upsert semantics the I may overwrite a pre-existing key,
    so the trailing D must survive compaction."""
    out = compact_changes(_chain(spark, "I", "D"), ["conv_id", "turn_idx"], ["text"])
    r = _one(out)
    assert r["op"] == "D"


def test_delete_before_put_at_equal_commit_ts(spark):
    """At equal commit_ts the D sorts first, so the I wins LWW
    (encoding/key.go:79-80, FIXTURES.md same_ts_delete_put)."""
    rows = [
        (0, "D", 100, 99, "c1", 1, None),
        (1, "I", 100, 99, "c1", 1, "new"),
    ]
    r = _one(lww_fold(_df(spark, rows), ["conv_id", "turn_idx"], ["text"]))
    assert r["op"] == "I" and r["text"] == "new"
    # and regardless of physical input order
    r2 = _one(lww_fold(_df(spark, rows[::-1]), ["conv_id", "turn_idx"], ["text"]))
    assert r2["op"] == "I" and r2["text"] == "new"


def test_seq_tiebreak(spark):
    rows = [
        (5, "U", 100, 99, "c1", 1, "later-seq"),
        (3, "U", 100, 99, "c1", 1, "earlier-seq"),
    ]
    r = _one(lww_fold(_df(spark, rows), ["conv_id", "turn_idx"], ["text"]))
    assert r["text"] == "later-seq"


def test_fold_is_partition_count_invariant(spark):
    """Same result at 1 and 8 input partitions (N vs 4N determinism rule)."""
    import random

    rng = random.Random(7)
    rows = []
    for i in range(500):
        key = rng.randrange(20)
        rows.append(
            (i, rng.choice(["I", "U", "D"]), 100 + i // 3, 99 + i // 3,
             f"c{key}", key % 5, f"t{i}")
        )
    df1 = _df(spark, rows).coalesce(1)
    df8 = _df(spark, rows).repartition(8)
    a = sorted(map(tuple, compact_changes(df1, ["conv_id", "turn_idx"], ["text"]).collect()))
    b = sorted(map(tuple, compact_changes(df8, ["conv_id", "turn_idx"], ["text"]).collect()))
    assert a == b


def test_split_updates(spark):
    """Key-changed update → delete(old key) + insert(new key), delete first
    (cdc/processor/pipeline/sink.go:226-284)."""
    schema = (
        "seq long, op string, commit_ts long, start_ts long, "
        "conv_id string, turn_idx int, text string, "
        "pre_conv_id string, pre_turn_idx int, pre_text string"
    )
    rows = [
        (0, "U", 100, 99, "c1", 2, "moved", "c1", 1, "old"),  # key changed
        (1, "U", 101, 100, "c2", 1, "plain", "c2", 1, "old2"),  # same key
        (2, "I", 102, 101, "c3", 1, "ins", None, None, None),
    ]
    df = spark.createDataFrame(rows, schema)
    out = split_updates(
        df,
        ["conv_id", "turn_idx"],
        ["pre_conv_id", "pre_turn_idx"],
        ["text"],
        ["pre_text"],
    ).orderBy("seq", "split_pos")
    got = [(r["op"], r["conv_id"], r["turn_idx"], r["text"], r["split_pos"]) for r in out.collect()]
    assert got == [
        ("D", "c1", 1, "old", 0),
        ("I", "c1", 2, "moved", 1),
        ("U", "c2", 1, "plain", 0),
        ("I", "c3", 1, "ins", 0),
    ]


def test_fold_uses_mapside_partial_agg(spark):
    """The fold must compile to partial+final HashAggregate (map-side
    combine), not a window sort — the scale/skew guarantee."""
    df = _chain(spark, "I", "U")
    plan = lww_fold(df, ["conv_id", "turn_idx"], ["text"])._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan
    assert "Window" not in plan
