"""Schema evolution e2e — mirrors dm/tests/all_mode/data/db1.increment.sql
(ALTERs mid-replication) and the commit_ts-1 decode rule
(cdc/entry/mounter.go:201-203).
"""

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.generator import generate_changefeed
from tiflow_spark.lake import LakeTable
from tiflow_spark.oracle import sequential_apply

from tests.helpers import assert_tables_equal, ev, pl, write_feed

DDL_PLAN = [
    (0.3, {"action": "add_column", "name": "note", "type": "string", "default": ""}),
    (0.6, {"action": "rename_column", "name": "tool", "new_name": "tool_name"}),
    (0.8, {"action": "drop_column", "name": "role"}),
]


def _run(spark, tmp_path, base_fp, log_dir, **kw):
    table = LakeTable(str(tmp_path / "target"), num_buckets=4)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp, start_ts=0)
    stats = eng.run(spark, **kw)
    return eng, stats


def test_add_rename_drop_matches_oracle(spark, tmp_path):
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=30, turns_per_conv=4, n_changes=2000,
        seed=21, resolved_every=400, ddl_plan=DDL_PLAN,
    )
    eng, stats = _run(spark, tmp_path, feed.base_path, feed.log_path)
    expected = sequential_apply(feed.base_path, feed.log_path)
    got = eng.final_state(spark).toPandas()
    assert "note" in got.columns and "tool_name" in got.columns
    assert "role" not in got.columns and "tool" not in got.columns
    assert_tables_equal(got, expected)


def test_ddl_inside_multi_epoch_run(spark, tmp_path):
    """Epoch-per-barrier replay across DDLs == all-at-once replay == oracle."""
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=20, turns_per_conv=4, n_changes=1500,
        seed=22, resolved_every=250, ddl_plan=DDL_PLAN,
    )
    eng1, _ = _run(spark, tmp_path / "a", feed.base_path, feed.log_path)
    eng2, st2 = _run(
        spark, tmp_path / "b", feed.base_path, feed.log_path, barrier_stride=1
    )
    assert len(st2.epochs) >= 4
    expected = sequential_apply(feed.base_path, feed.log_path)
    assert_tables_equal(eng1.final_state(spark).toPandas(), expected)
    assert_tables_equal(eng2.final_state(spark).toPandas(), expected)


def test_dml_at_exact_ddl_commit_ts_uses_pre_ddl_schema(spark, tmp_path):
    """A DML sharing the DDL's commit_ts decodes with the PRE-DDL schema and
    the added column falls back to the default (mounter.go:201-203 +
    515-551). SURVEY.md §7 hard part 3."""
    base = [("c1", 0, "user", "orig", None, "2024-01-01T00:00:00")]
    events = [
        # v1 payload written at exactly the DDL's commit_ts (no "note" key)
        ev(0, "U", 200, "c1", 0, pl("at-ddl-ts"), ver=None),
        ev(1, "DDL", 200, ddl={"action": "add_column", "name": "note",
                               "type": "string", "default": "dflt"}),
        # post-DDL update on another key carries the new column
        ev(2, "I", 201, "c1", 1, {**pl("post-ddl"), "note": "n1"}, ver=None),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base)
    eng, _ = _run(spark, tmp_path, base_fp, log_dir)
    got = eng.final_state(spark).toPandas().sort_values("turn_idx")
    expected = sequential_apply(base_fp, log_dir)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)
    # the row updated AT the DDL ts gets the default, not null
    assert got[got.turn_idx == 0]["note"].iloc[0] == "dflt"
    assert got[got.turn_idx == 1]["note"].iloc[0] == "n1"


def test_untouched_rows_gain_added_column_default(spark, tmp_path):
    """Rows never touched after an ADD COLUMN read back with the default —
    the metadata-only evolution path (no rewrite of their bucket)."""
    base = [
        ("c1", 0, "user", "keep-me", None, "2024-01-01T00:00:00"),
        ("c2", 0, "user", "touch-me", None, "2024-01-01T00:00:01"),
    ]
    events = [
        ev(0, "DDL", 100, ddl={"action": "add_column", "name": "note",
                               "type": "string", "default": "D0"}),
        ev(1, "U", 101, "c2", 0, {**pl("touched"), "note": "set"}, ver=None),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base)
    eng, _ = _run(spark, tmp_path, base_fp, log_dir)
    got = eng.final_state(spark).toPandas().set_index("conv_id")
    assert got.loc["c1", "note"] == "D0"
    assert got.loc["c2", "note"] == "set"
    expected = sequential_apply(base_fp, log_dir)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)


def test_type_recycled_field_decodes_raw_then_casts(spark, tmp_path):
    """modify_column int -> string with DML sharing the DDL's commit_ts
    (hypothesis-found): decode must treat the recycled field as a raw JSON
    lexeme and CAST once to the final type — an int payload renders its
    digits, a post-modify string survives verbatim, and a string under a
    later int type nulls out instead of aborting (try_cast semantics).
    Byte-matches the sequential oracle."""
    base = [("c0", 0, "user", "b0", None, "2024-01-01T00:00:00")]
    events = [
        ev(0, "DDL", 100, ddl={"action": "add_column", "name": "m1",
                               "type": "int", "default": None}),
        ev(1, "I", 101, "c0", 0,
           {"role": "r", "text": "t1", "tool": None,
            "ts": "2024-01-01T00:00:00", "m1": 8}, ver=None),
        ev(2, "DDL", 101, ddl={"action": "modify_column", "name": "m1",
                               "type": "string"}),
        # same commit_ts as the modify DDL, later seq, string payload
        ev(3, "I", 101, "c0", 1,
           {"role": "r", "text": "t2", "tool": None,
            "ts": "2024-01-01T00:00:00", "m1": "v14"}, ver=None),
        ev(4, "R", 102),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base, final_resolved=False)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)
    got = eng.final_state(spark).toPandas()
    exp = sequential_apply(base_fp, log_dir)
    assert_tables_equal(got, exp)
    by_key = {(r.conv_id, r.turn_idx): r.m1 for r in got.itertuples()}
    assert by_key[("c0", 0)] == "8"     # int payload under final string type
    assert by_key[("c0", 1)] == "v14"   # post-modify string at the tied ts
