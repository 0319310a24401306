"""Structured Streaming front-end: micro-batch epochs must reach the same
final state as the batch replay loop and as the sequential oracle, including
mid-stream DDL and restart-with-new-segments."""

from __future__ import annotations

import os

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.generator import generate_changefeed
from tiflow_spark.lake import LakeTable
from tiflow_spark.oracle import sequential_apply
from tiflow_spark.streaming import StreamingChangefeed

from tests.helpers import assert_tables_equal


def _setup(spark, tmp_path, **gen_kw):
    feed = generate_changefeed(str(tmp_path / "gen"), seed=21, **gen_kw)
    table = LakeTable(str(tmp_path / "target"), num_buckets=4)
    eng = ChangefeedEngine(feed.log_path, table)
    eng.bootstrap(spark, feed.base_path)
    return feed, eng


def test_stream_matches_oracle_with_ddl(spark, tmp_path):
    feed, eng = _setup(
        spark, tmp_path, n_convs=30, turns_per_conv=4, n_changes=2000,
        resolved_every=500, n_files=6,
        ddl_plan=[(0.5, {"action": "add_column", "name": "note",
                         "type": "string", "default": "d"})],
    )
    sc = StreamingChangefeed(eng, str(tmp_path / "chk"), max_files_per_trigger=2)
    epochs = sc.run_available(spark)
    assert len(epochs) >= 2  # several micro-batch epochs
    assert all(e.committed for e in epochs)
    expected = sequential_apply(feed.base_path, feed.log_path)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)


def test_stream_resumes_on_new_segments(spark, tmp_path):
    """Segments appended after the first drain are picked up by a second
    drain from the same streaming checkpoint (continuous-tail semantics)."""
    feed, eng = _setup(
        spark, tmp_path, n_convs=20, turns_per_conv=4, n_changes=1000,
        resolved_every=500, n_files=4,
    )
    # hold back half the segments
    held = []
    log_files = sorted(
        f for f in os.listdir(feed.log_path) if f.startswith("changefeed-")
    )
    for fn in log_files[2:]:
        src = os.path.join(feed.log_path, fn)
        dst = os.path.join(str(tmp_path), "held_" + fn)
        os.rename(src, dst)
        held.append((dst, src))

    sc = StreamingChangefeed(eng, str(tmp_path / "chk"))
    sc.run_available(spark)
    partial_chk = eng.table.current_manifest()["checkpoint_ts"]

    for dst, src in held:  # upstream appends more segments
        os.rename(dst, src)
    sc2 = StreamingChangefeed(eng, str(tmp_path / "chk"))
    sc2.run_available(spark)

    m = eng.table.current_manifest()
    assert m["checkpoint_ts"] >= partial_chk
    expected = sequential_apply(feed.base_path, feed.log_path)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)


def test_stream_equals_batch_replay(spark, tmp_path):
    feed, eng_s = _setup(
        spark, tmp_path, n_convs=25, turns_per_conv=3, n_changes=1500,
        resolved_every=300, n_files=5,
    )
    sc = StreamingChangefeed(eng_s, str(tmp_path / "chk"), max_files_per_trigger=1)
    sc.run_available(spark)

    table_b = LakeTable(str(tmp_path / "target_batch"), num_buckets=4)
    eng_b = ChangefeedEngine(feed.log_path, table_b)
    eng_b.bootstrap(spark, feed.base_path)
    eng_b.run(spark)

    assert_tables_equal(
        eng_s.final_state(spark).toPandas(), eng_b.final_state(spark).toPandas()
    )


def test_stream_rejects_resolved_regression(spark, tmp_path):
    """Front-end validation parity (batch run() twin): a feed that violates
    its resolved-ts promise — a late event below the committed checkpoint —
    is REFUSED by the streaming tick, not silently applied; opting out with
    validate_resolved=False still drains it (operator override)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from tests.helpers import EVENT_COLS, ev, pl, write_feed

    base = [("c1", 0, "user", "v0", None, "2024-01-01T00:00:00")]
    events = [ev(0, "U", 120, "c1", 0, pl("ok")), ev(1, "R", 150)]
    base_fp, log_dir = write_feed(
        tmp_path, events, base, final_resolved=False, control_sidecar=False
    )
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    sc = StreamingChangefeed(eng, str(tmp_path / "chk"))
    sc.run_available(spark)
    assert table.current_manifest()["checkpoint_ts"] == 150

    # corrupt tail: commit_ts 130 < the committed checkpoint promise at 150
    late = [ev(2, "U", 130, "c1", 0, pl("lost forever?")), ev(3, "R", 200)]
    pq.write_table(
        pa.Table.from_pylist(late, schema=pa.schema(EVENT_COLS)),
        os.path.join(log_dir, "changefeed-00001.parquet"),
    )
    sc2 = StreamingChangefeed(eng, str(tmp_path / "chk"))
    with pytest.raises(Exception, match="[Rr]esolved"):
        sc2.run_available(spark)
    # nothing was applied past the committed checkpoint
    assert table.current_manifest()["checkpoint_ts"] == 150
    # explicit opt-out (forcing past a known-bad feed) still drains
    sc3 = StreamingChangefeed(
        eng, str(tmp_path / "chk"), validate_resolved=False
    )
    sc3.run_available(spark)
    assert table.current_manifest()["checkpoint_ts"] == 200
