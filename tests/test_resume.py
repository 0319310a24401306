"""Checkpoint/resume + exactly-once fencing (SURVEY.md §2.13 C1/C2).

Mirrors tests/integration_tests/changefeed_reconstruct and DM's
checkpoint-transaction semantics (dm/syncer/checkpoint.go:653-751):
kill mid-replay, resume from the committed checkpoint, final state must
byte-match an uninterrupted replay; re-running a committed epoch is a no-op.
"""

import pytest

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.generator import generate_changefeed
from tiflow_spark.lake import CommitConflict, LakeTable
from tiflow_spark.oracle import sequential_apply

from tests.helpers import assert_tables_equal


@pytest.fixture(scope="module")
def feed(tmp_path_factory):
    d = tmp_path_factory.mktemp("feed")
    return generate_changefeed(
        str(d), n_convs=25, turns_per_conv=4, n_changes=1800, seed=33,
        resolved_every=300,
        ddl_plan=[(0.5, {"action": "add_column", "name": "note",
                         "type": "string", "default": ""})],
    )


def test_kill_and_resume_matches_full_replay(spark, tmp_path, feed):
    # uninterrupted replay
    t_full = LakeTable(str(tmp_path / "full"), num_buckets=4)
    e_full = ChangefeedEngine(feed.log_path, t_full)
    e_full.bootstrap(spark, feed.base_path)
    e_full.run(spark)

    # interrupted: 2 epochs, then a brand-new engine resumes from checkpoint
    t_part = LakeTable(str(tmp_path / "part"), num_buckets=4)
    e_part = ChangefeedEngine(feed.log_path, t_part)
    e_part.bootstrap(spark, feed.base_path)
    st1 = e_part.run(spark, max_epochs=2, barrier_stride=1)
    assert len(st1.epochs) == 2
    chk_after_kill = t_part.current_manifest()["checkpoint_ts"]

    e_resumed = ChangefeedEngine(feed.log_path, LakeTable(str(tmp_path / "part"), num_buckets=4))
    st2 = e_resumed.run(spark)
    assert st2.epochs[0].barrier_ts > chk_after_kill

    assert_tables_equal(
        e_resumed.final_state(spark).toPandas(),
        e_full.final_state(spark).toPandas(),
    )
    expected = sequential_apply(feed.base_path, feed.log_path)
    assert_tables_equal(e_resumed.final_state(spark).toPandas(), expected)


def test_replayed_epoch_is_noop(spark, tmp_path, feed):
    """Epoch fence: merging an epoch <= current manifest epoch does nothing
    and returns False (idempotent at-least-once replay, C2)."""
    table = LakeTable(str(tmp_path / "t"), num_buckets=4)
    eng = ChangefeedEngine(feed.log_path, table)
    eng.bootstrap(spark, feed.base_path)
    eng.run(spark, max_epochs=1, barrier_stride=1)
    m = table.current_manifest()
    assert m["epoch"] == 1

    log = eng.read_log(spark)
    before = eng.final_state(spark).toPandas()
    # re-run epoch 1 against the original manifest (a crashed worker retry)
    m0 = {**m, "epoch": 0, "checkpoint_ts": 0}
    st = eng.run_epoch(spark, log, m0, barrier_ts=m["checkpoint_ts"])
    assert st.committed is False
    after = eng.final_state(spark).toPandas()
    assert_tables_equal(after, before)
    assert table.current_manifest()["epoch"] == 1


def test_epoch_gap_rejected(spark, tmp_path, feed):
    table = LakeTable(str(tmp_path / "t2"), num_buckets=4)
    eng = ChangefeedEngine(feed.log_path, table)
    eng.bootstrap(spark, feed.base_path)
    log = eng.read_log(spark)
    m = table.current_manifest()
    with pytest.raises(CommitConflict):
        eng.run_epoch(spark, log, {**m, "epoch": 5}, barrier_ts=feed.max_commit_ts)


def test_dedupe_below_checkpoint_on_resume(spark, tmp_path, feed):
    """Events at/below the checkpoint are filtered out on resume
    (IsOlderThanTablePoint, dm/syncer/checkpoint.go:611-631): running twice
    over the same log applies nothing the second time."""
    table = LakeTable(str(tmp_path / "t3"), num_buckets=4)
    eng = ChangefeedEngine(feed.log_path, table)
    eng.bootstrap(spark, feed.base_path)
    st1 = eng.run(spark)
    assert st1.total_events > 0
    st2 = eng.run(spark)
    assert st2.total_events == 0 and len(st2.epochs) == 0


def test_resumable_bootstrap_crash_resume(spark, tmp_path, feed, monkeypatch):
    """Chunked bootstrap (DM loader checkpoints, dm/loader/checkpoint.go):
    kill the dump restore mid-chunk; the resume rewrites ONLY the failed
    and remaining chunks (completed ones are checkpointed in _BOOTSTRAP),
    cleans up the crashed chunk's orphan fragment, and the final replayed
    state byte-matches the sequential oracle."""
    import os
    import shutil

    from tests.helpers import assert_tables_equal

    # multi-file base dump: split the generated base into 4 parquet files
    import pyarrow.parquet as pq

    base_tbl = pq.read_table(feed.base_path)
    dump_dir = str(tmp_path / "dump")
    os.makedirs(dump_dir)
    step = (base_tbl.num_rows + 3) // 4
    for i in range(4):
        chunk = base_tbl.slice(i * step, step)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(dump_dir, f"part-{i:04d}.parquet"))

    table = LakeTable(str(tmp_path / "tgt"), num_buckets=4)
    eng = ChangefeedEngine(feed.log_path, table)

    calls = {"n": 0}
    real = LakeTable._write_data

    def crashing(self, df, version, pre_partitioned=False, commit_id=None):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated crash during chunk 3")
        return real(self, df, version, pre_partitioned=pre_partitioned,
                    commit_id=commit_id)

    monkeypatch.setattr(LakeTable, "_write_data", crashing)
    with pytest.raises(RuntimeError, match="simulated crash"):
        eng.bootstrap(spark, dump_dir, chunk_files=1)
    assert not table.exists()  # no manifest until every chunk lands
    state_fp = os.path.join(table.path, "_BOOTSTRAP")
    assert os.path.exists(state_fp)
    import json

    st = json.load(open(state_fp))
    assert len(st["done"]) == 2 and st["inflight"]  # 2 chunks checkpointed
    orphan = os.path.join(table.path, "data", st["inflight"])
    os.makedirs(orphan, exist_ok=True)  # half-written fragment stand-in

    monkeypatch.setattr(LakeTable, "_write_data", real)

    # a resume with a DIFFERENT chunking must be refused: the done-chunk
    # checkpoints are positional, so reusing them under another plan would
    # silently skip the wrong input files
    with pytest.raises(ValueError, match="chunk plan changed"):
        ChangefeedEngine(
            feed.log_path, LakeTable(str(tmp_path / "tgt"), num_buckets=4)
        ).bootstrap(spark, dump_dir, chunk_files=2)

    calls_resume = {"n": 0}

    def counting(self, df, version, pre_partitioned=False, commit_id=None):
        calls_resume["n"] += 1
        return real(self, df, version, pre_partitioned=pre_partitioned,
                    commit_id=commit_id)

    monkeypatch.setattr(LakeTable, "_write_data", counting)
    eng2 = ChangefeedEngine(
        feed.log_path, LakeTable(str(tmp_path / "tgt"), num_buckets=4)
    )
    eng2.bootstrap(spark, dump_dir, chunk_files=1)
    assert calls_resume["n"] == 2  # only the crashed + remaining chunk
    assert not os.path.exists(orphan)  # crashed fragment cleaned up
    assert not os.path.exists(state_fp)  # sidecar removed after commit
    assert eng2.table.exists()

    # replay on top of the resumed bootstrap matches the oracle
    eng2.run(spark)
    assert_tables_equal(
        eng2.final_state(spark).toPandas(),
        sequential_apply(feed.base_path, feed.log_path),
    )

    # idempotent: bootstrapping again is a no-op (table exists)
    eng2.bootstrap(spark, dump_dir, chunk_files=1)
