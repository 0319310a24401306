"""modify_column + truncate_table DDL replay (SURVEY.md §2.14 widening).

Reference: cdc/entry/schema_storage.go:637-652 (modify column = default DDL
branch, metadata-only), 619-631 (truncate tombstones the table id). Mirrors
the ALTER-mid-stream shape of dm/tests/all_mode/data/db1.increment.sql.
"""

from __future__ import annotations

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.lake import LakeTable
from tiflow_spark.oracle import sequential_apply

from tests.helpers import assert_tables_equal, ev, pl, write_feed

BASE = [("c1", 0, "user", "v0", None, "2024-01-01T00:00:00"),
        ("c2", 0, "user", "other", None, "2024-01-01T00:00:01")]


def test_modify_column_type_two_epochs(spark, tmp_path):
    """int column written to data files in epoch 1, type modified to string
    in epoch 2: stored files CAST at read time, old-version payloads CAST at
    decode time (the multipass decode path — same name at two types)."""
    events = [
        ev(0, "DDL", 101, ddl={"action": "add_column", "name": "score",
                               "type": "int", "default": None}),
        ev(1, "U", 102, "c1", 0,
           {"role": "user", "text": "scored", "tool": None,
            "ts": "2024-01-01T00:01:00", "score": 7}, ver=None),
        ev(2, "R", 103),  # epoch 1 commits: score=7 stored as int
        ev(3, "DDL", 104, ddl={"action": "modify_column", "name": "score",
                               "type": "string"}),
        ev(4, "U", 105, "c2", 0,
           {"role": "user", "text": "string scored", "tool": None,
            "ts": "2024-01-01T00:02:00", "score": "high"}, ver=None),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, BASE)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    stats = eng.run(spark, barrier_stride=1)
    assert len(stats.epochs) == 2
    got = eng.final_state(spark).toPandas()
    assert_tables_equal(got, sequential_apply(base_fp, log_dir))
    by_key = {r.conv_id: r.score for r in got.itertuples()}
    assert by_key["c1"] == "7"  # int stored in epoch-1 file, cast on read
    assert by_key["c2"] == "high"


def test_modify_column_same_epoch_payload_cast(spark, tmp_path):
    """add int + modify to string + both payload generations in ONE epoch:
    the multipass decoder parses each payload under its own version's type
    and casts onto the barrier version."""
    events = [
        ev(0, "DDL", 101, ddl={"action": "add_column", "name": "score",
                               "type": "int", "default": None}),
        ev(1, "U", 102, "c1", 0,
           {"role": "user", "text": "int gen", "tool": None,
            "ts": "2024-01-01T00:01:00", "score": 42}, ver=None),
        ev(2, "DDL", 103, ddl={"action": "modify_column", "name": "score",
                               "type": "string"}),
        ev(3, "U", 104, "c2", 0,
           {"role": "user", "text": "str gen", "tool": None,
            "ts": "2024-01-01T00:02:00", "score": "why"}, ver=None),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, BASE)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)
    got = eng.final_state(spark).toPandas()
    assert_tables_equal(got, sequential_apply(base_fp, log_dir))
    by_key = {r.conv_id: r.score for r in got.itertuples()}
    assert by_key["c1"] == "42" and by_key["c2"] == "why"


def test_truncate_mid_stream(spark, tmp_path):
    """Events → TRUNCATE → events: pre-truncate rows (base included) wiped,
    post-truncate rows land; DML sharing the truncate's commit_ts applies
    before it (ordering contract) and is wiped with the rest."""
    events = [
        ev(0, "U", 101, "c1", 0, pl("pre")),
        ev(1, "I", 102, "c3", 0, pl("also pre")),
        # same commit_ts as the truncate: applied first, then wiped
        ev(2, "U", 103, "c2", 0, pl("wiped at truncate ts")),
        ev(3, "DDL", 103, ddl={"action": "truncate_table"}),
        ev(4, "I", 104, "c9", 0, pl("post-truncate survivor")),
        ev(5, "U", 105, "c1", 0, pl("c1 reborn")),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, BASE)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)
    got = eng.final_state(spark).toPandas()
    assert_tables_equal(got, sequential_apply(base_fp, log_dir))
    assert set(got["conv_id"]) == {"c9", "c1"}
    assert got.set_index("conv_id").loc["c1", "text"] == "c1 reborn"


def test_truncate_with_empty_tail_then_resume(spark, tmp_path):
    """TRUNCATE as the last event: table ends empty (schema kept) and a
    later run resumes cleanly, applying new events onto the empty table."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.helpers import EVENT_COLS

    events = [
        ev(0, "U", 101, "c1", 0, pl("doomed")),
        ev(1, "DDL", 102, ddl={"action": "truncate_table"}),
    ]
    # raw segments appended below → no sidecar (exercises the fallback scan)
    base_fp, log_dir = write_feed(tmp_path, events, BASE, control_sidecar=False)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)
    got = eng.final_state(spark).toPandas()
    assert len(got) == 0
    assert list(got.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

    # feed grows after the empty commit: resume applies onto the empty table
    tail = [ev(2, "I", 110, "cA", 0, pl("fresh start")), ev(3, "R", 110)]
    pq.write_table(
        pa.Table.from_pylist(tail, schema=pa.schema(EVENT_COLS)),
        os.path.join(log_dir, "changefeed-00001.parquet"),
    )
    eng2 = ChangefeedEngine(log_dir, table)
    eng2.run(spark)
    got2 = eng2.final_state(spark).toPandas()
    assert_tables_equal(got2, sequential_apply(base_fp, log_dir))
    assert set(got2["conv_id"]) == {"cA"}


PART_BASE = [("b1", 0, "user", "low turn", None, "2024-01-01T00:00:00"),
             ("b2", 7, "user", "high turn", None, "2024-01-01T00:00:01")]


def test_truncate_partition_mid_stream(spark, tmp_path):
    """DROP/TRUNCATE PARTITION (cdc/entry/schema_storage.go:632-636): rows
    whose key falls in the partition predicate are wiped at the DDL's
    commit_ts — including rows already committed to the lake in an earlier
    epoch (the full-CoW delete path) — while out-of-partition rows and
    post-cut inserts into the range survive."""
    events = [
        # epoch 1: one row lands in the doomed range, one outside it
        ev(0, "I", 101, "c3", 7, pl("pre in range")),
        ev(1, "I", 102, "c4", 1, pl("pre out of range")),
        ev(2, "R", 103),
        # epoch 2: same-ts DML applies first (ordering contract), then wiped
        ev(3, "U", 104, "c3", 7, pl("wiped at cut ts")),
        ev(4, "DDL", 104, ddl={"action": "truncate_partition",
                               "where": "turn_idx >= 5"}),
        ev(5, "I", 105, "c5", 9, pl("post-cut in range survivor")),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, PART_BASE)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    stats = eng.run(spark, barrier_stride=1)
    assert len(stats.epochs) == 2
    got = eng.final_state(spark).toPandas()
    assert_tables_equal(got, sequential_apply(base_fp, log_dir))
    keys = set(zip(got["conv_id"], got["turn_idx"]))
    # b2 (base, turn 7) and c3 (epoch-1 commit + cut-ts update) wiped;
    # b1/c4 out of range; c5 inserted after the cut into the range survives
    assert keys == {("b1", 0), ("c4", 1), ("c5", 9)}


def test_drop_partition_then_resume(spark, tmp_path):
    """The cut is durable: a fresh engine resuming from the committed
    checkpoint does not resurrect dropped-partition rows, and later events
    re-populate the range normally."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.helpers import EVENT_COLS

    events = [
        ev(0, "I", 101, "c3", 8, pl("doomed")),
        ev(1, "DDL", 102, ddl={"action": "drop_partition",
                               "where": "turn_idx >= 5"}),
        ev(2, "R", 103),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, PART_BASE,
                                  control_sidecar=False)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)
    got = eng.final_state(spark).toPandas()
    assert set(zip(got["conv_id"], got["turn_idx"])) == {("b1", 0)}

    tail = [ev(3, "I", 110, "cA", 6, pl("range reborn")), ev(4, "R", 110)]
    pq.write_table(
        pa.Table.from_pylist(tail, schema=pa.schema(EVENT_COLS)),
        os.path.join(log_dir, "changefeed-00001.parquet"),
    )
    eng2 = ChangefeedEngine(log_dir, table)
    eng2.run(spark)
    got2 = eng2.final_state(spark).toPandas()
    assert_tables_equal(got2, sequential_apply(base_fp, log_dir))
    assert set(zip(got2["conv_id"], got2["turn_idx"])) == {("b1", 0), ("cA", 6)}


def test_add_partition_metadata_only(spark, tmp_path):
    """ADD PARTITION is metadata-only: a registry version bump (complete DDL
    history) with zero data effect."""
    events = [
        ev(0, "I", 101, "c3", 3, pl("kept")),
        ev(1, "DDL", 102, ddl={"action": "add_partition",
                               "name": "p2024h2"}),
        ev(2, "I", 103, "c4", 8, pl("lands in the new range")),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, PART_BASE)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)
    got = eng.final_state(spark).toPandas()
    assert_tables_equal(got, sequential_apply(base_fp, log_dir))
    assert len(got) == 4  # b1, b2, c3, c4 — nothing wiped


def test_partition_cut_requires_where():
    """drop/truncate_partition without a predicate is a malformed DDL."""
    import pytest

    from tiflow_spark.registry import SchemaRegistry

    reg = SchemaRegistry.initial()
    with pytest.raises(ValueError, match="where"):
        reg.apply_ddl({"action": "drop_partition"}, 100)
    with pytest.raises(ValueError, match="where"):
        reg.apply_ddl({"action": "truncate_partition", "where": ""}, 100)


def test_modify_column_numeric_truncation(spark, tmp_path):
    """numeric→int modify_column: stored double files truncate at read time
    and a fractional payload lexeme truncates at decode time ('1.5' → 1,
    not NULL) — evolve_cast's double fallback, pinned against the oracle's
    int(float(v)) rule; a non-numeric lexeme still nulls out."""
    events = [
        ev(0, "DDL", 101, ddl={"action": "add_column", "name": "score",
                               "type": "double", "default": None}),
        ev(1, "U", 102, "c1", 0,
           {"role": "user", "text": "frac stored", "tool": None,
            "ts": "2024-01-01T00:01:00", "score": 7.9}, ver=None),
        ev(2, "R", 103),  # epoch 1 commits: score=7.9 stored as double
        ev(3, "DDL", 104, ddl={"action": "modify_column", "name": "score",
                               "type": "int"}),
        ev(4, "U", 105, "c2", 0,
           {"role": "user", "text": "frac decoded", "tool": None,
            "ts": "2024-01-01T00:02:00", "score": 1.5}, ver=None),
        ev(5, "U", 106, "c3", 0,
           {"role": "user", "text": "malformed", "tool": None,
            "ts": "2024-01-01T00:03:00", "score": "not a number"}, ver=None),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, BASE)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    stats = eng.run(spark, barrier_stride=1)
    assert len(stats.epochs) == 2
    got = eng.final_state(spark).toPandas()
    assert_tables_equal(got, sequential_apply(base_fp, log_dir))
    by_key = {r.conv_id: r.score for r in got.itertuples()}
    assert by_key["c1"] == 7     # stored 7.9 double → int file cast
    assert by_key["c2"] == 1     # payload lexeme "1.5" → 1, not NULL
    import pandas as pd

    assert pd.isna(by_key["c3"])  # malformed still nulls


def test_partition_cut_null_predicate_keeps_key(spark, tmp_path):
    """A cut predicate that evaluates to NULL for some key KEEPS that key
    (the oracle's _keys_matching rule: a NULL predicate did not match) —
    exercised on both paths: in-flight events (engine cut filter) and
    already-committed lake rows (merge delete_where)."""
    events = [
        # epoch 1 commits one row where the predicate is NULL and one where
        # it is true — both already in the lake when the cut arrives
        ev(0, "I", 101, "c3", 0, pl("null-predicate key, committed")),
        ev(1, "I", 102, "c4", 6, pl("true-predicate key, committed")),
        ev(2, "R", 103),
        # epoch 2: in-flight twins of both cases, then the cut
        ev(3, "I", 104, "c5", 0, pl("null-predicate key, in-flight")),
        ev(4, "I", 105, "c6", 8, pl("true-predicate key, in-flight")),
        ev(5, "DDL", 106, ddl={"action": "drop_partition",
                               "where": "nullif(turn_idx, 0) >= 5"}),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, PART_BASE)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark, barrier_stride=1)
    got = eng.final_state(spark).toPandas()
    assert_tables_equal(got, sequential_apply(base_fp, log_dir))
    keys = set(zip(got["conv_id"], got["turn_idx"]))
    # NULL-predicate keys (turn 0) survive on both paths; turn>=5 wiped
    assert keys == {("b1", 0), ("c3", 0), ("c5", 0)}
