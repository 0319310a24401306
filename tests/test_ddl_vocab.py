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
