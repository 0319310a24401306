"""Txn-atomicity + resolved-ts contract + target-ts finish barrier.

Reference invariants pinned here:
- a transaction (rows sharing start_ts/commit_ts) lands whole in one epoch —
  epoch cuts are by commit_ts, so a barrier can never split a txn
  (cdc/model/sink.go:512-536 SingleTableTxn; cdc/sink/common/common.go:104-153
  splits only at txn granularity);
- a feed where an event arrives AFTER a resolved-ts promise covering it is
  rejected (the reference panics: cdc/model/sink.go:527-536) — including
  across restarts via the checkpoint_seq recorded in the manifest;
- target_ts stops replay at the finish barrier
  (cdc/owner/changefeed.go:456-501): nothing beyond target is applied.
"""

from __future__ import annotations

import pytest

from tiflow_spark.engine import ChangefeedEngine, ResolvedTsRegression
from tiflow_spark.lake import LakeTable
from tiflow_spark.oracle import sequential_apply

from tests.helpers import assert_tables_equal, ev, pl, write_feed


def test_txn_never_split_by_barrier(spark, tmp_path):
    """A 3-row txn at commit_ts=200 with an R row interleaved in the log at
    a lower ts: the txn is NOT in epoch 1 (ts 150) and lands whole in epoch
    2 — dml_events proves no partial apply."""
    base = [("c1", 0, "user", "v0", None, "2024-01-01T00:00:00")]
    events = [
        ev(0, "U", 120, "c1", 0, pl("pre-txn")),
        # R at 150: everything <= 150 is complete
        ev(1, "R", 150),
        # one txn: three rows, same start_ts/commit_ts
        ev(2, "I", 200, "t1", 0, pl("txn row 1"), start_ts=199),
        ev(3, "I", 200, "t1", 1, pl("txn row 2"), start_ts=199),
        ev(4, "I", 200, "t1", 2, pl("txn row 3"), start_ts=199),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    stats = eng.run(spark, barrier_stride=1)
    per_epoch = [(e.barrier_ts, e.dml_events) for e in stats.epochs]
    assert per_epoch == [(150, 1), (200, 3)]  # txn whole in its epoch
    assert_tables_equal(
        eng.final_state(spark).toPandas(), sequential_apply(base_fp, log_dir)
    )


def test_resolved_regression_rejected(spark, tmp_path):
    """An event with commit_ts <= an earlier R row's ts is a contract
    violation — run() must refuse rather than silently lose it."""
    base = [("c1", 0, "user", "v0", None, "2024-01-01T00:00:00")]
    events = [
        ev(0, "U", 120, "c1", 0, pl("ok")),
        ev(1, "R", 150),
        ev(2, "U", 140, "c1", 0, pl("late — violates R@150")),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    with pytest.raises(ResolvedTsRegression):
        eng.run(spark)
    # explicit opt-out still works (operator forcing past a known-bad feed)
    stats = eng.run(spark, validate_resolved=False)
    assert stats.epochs


def test_resolved_regression_detected_across_restart(spark, tmp_path):
    """checkpoint_seq persists the promise: a clean first run commits, then
    a corrupt tail (late event below the committed checkpoint) appears —
    the NEXT run detects it even though the R row itself is now below the
    checkpoint filter."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from tests.helpers import EVENT_COLS

    base = [("c1", 0, "user", "v0", None, "2024-01-01T00:00:00")]
    events = [ev(0, "U", 120, "c1", 0, pl("ok")), ev(1, "R", 150)]
    # raw segments appended below → no sidecar (exercises the fallback scan)
    base_fp, log_dir = write_feed(
        tmp_path, events, base, final_resolved=False, control_sidecar=False
    )
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    st = eng.run(spark)
    assert [e.barrier_ts for e in st.epochs] == [150]
    assert table.current_manifest()["checkpoint_seq"] == 1

    # corrupt tail: commit_ts 130 < committed checkpoint 150
    late = [ev(2, "U", 130, "c1", 0, pl("lost forever?")), ev(3, "R", 200)]
    pq.write_table(
        pa.Table.from_pylist(late, schema=pa.schema(EVENT_COLS)),
        os.path.join(log_dir, "changefeed-00001.parquet"),
    )
    eng2 = ChangefeedEngine(log_dir, table)
    with pytest.raises(ResolvedTsRegression):
        eng2.run(spark)


def test_target_ts_finish_barrier(spark, tmp_path):
    """run(target_ts=...) applies exactly the events at/below target and
    stops; a later run with the same target is a no-op."""
    base = [("c1", 0, "user", "v0", None, "2024-01-01T00:00:00")]
    events = [
        ev(0, "U", 120, "c1", 0, pl("v1")),
        ev(1, "R", 150),
        ev(2, "U", 160, "c1", 0, pl("v2")),
        ev(3, "I", 170, "c2", 0, pl("new")),
        ev(4, "R", 180),
        ev(5, "U", 190, "c1", 0, pl("beyond target")),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    stats = eng.run(spark, target_ts=165)
    assert [e.barrier_ts for e in stats.epochs] == [165]
    assert table.current_manifest()["checkpoint_ts"] == 165
    assert_tables_equal(
        eng.final_state(spark).toPandas(),
        sequential_apply(base_fp, log_dir, barrier_ts=165),
    )
    # finished: same target again → nothing to do
    assert eng.run(spark, target_ts=165).epochs == []
    # and the feed can still be drained past the target afterwards
    stats2 = eng.run(spark)
    assert stats2.epochs and table.current_manifest()["checkpoint_ts"] == 190
    assert_tables_equal(
        eng.final_state(spark).toPandas(), sequential_apply(base_fp, log_dir)
    )
