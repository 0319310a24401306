"""End-to-end replay: engine (distributed) vs sequential-apply oracle.

The sync-diff-inspector analogue (FIXTURES.md F6): final table must equal the
pure-Python sequential apply, byte-for-byte, at any parallelism.
"""

import pytest

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.generator import generate_changefeed
from tiflow_spark.lake import LakeTable
from tiflow_spark.oracle import sequential_apply
from tiflow_spark.registry import SchemaRegistry

from tests.helpers import assert_tables_equal, ev, pl, write_feed


def _run_engine(spark, tmp_path, base_fp, log_dir, num_buckets=4, **run_kw):
    table = LakeTable(str(tmp_path / "target"), num_buckets=num_buckets)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp, start_ts=0)
    stats = eng.run(spark, **run_kw)
    return eng, stats


def test_basic_iud_matches_oracle(spark, tmp_path):
    base = [
        ("c1", 0, "user", "hello", None, "2024-01-01T00:00:00"),
        ("c1", 1, "assistant", "hi", "search", "2024-01-01T00:00:01"),
        ("c2", 0, "user", "q", None, "2024-01-01T00:00:02"),
    ]
    events = [
        ev(0, "U", 101, "c1", 1, pl("hi v2", role="assistant")),
        ev(1, "I", 102, "c2", 1, pl("a", role="assistant", tool="python")),
        ev(2, "D", 103, "c1", 0),
        ev(3, "I", 104, "c3", 0, pl("new conv")),
        ev(4, "U", 105, "c3", 0, pl("new conv v2")),
        ev(5, "D", 106, "c9", 9),  # delete of absent key → no-op
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base)
    eng, stats = _run_engine(spark, tmp_path, base_fp, log_dir)
    expected = sequential_apply(base_fp, log_dir)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)
    assert stats.epochs[-1].committed


def test_same_ts_delete_put(spark, tmp_path):
    base = [("c1", 0, "user", "orig", None, "2024-01-01T00:00:00")]
    events = [
        ev(0, "D", 100, "c1", 0, start_ts=99),
        ev(1, "I", 100, "c1", 0, pl("reborn"), start_ts=99),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base)
    eng, _ = _run_engine(spark, tmp_path, base_fp, log_dir)
    got = eng.final_state(spark).toPandas()
    expected = sequential_apply(base_fp, log_dir)
    assert_tables_equal(got, expected)
    assert got["text"].tolist() == ["reborn"]


def test_generated_feed_matches_oracle(spark, tmp_path):
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=40, turns_per_conv=6, n_changes=3000,
        seed=42, resolved_every=400,
    )
    eng, stats = _run_engine(
        spark, tmp_path, feed.base_path, feed.log_path, num_buckets=8
    )
    expected = sequential_apply(feed.base_path, feed.log_path)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)
    assert stats.total_events > 0


def test_multi_epoch_equals_single_epoch(spark, tmp_path):
    """Replay epoch-per-barrier vs all-at-once → identical final state."""
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=20, turns_per_conv=4, n_changes=1200,
        seed=7, resolved_every=200,
    )
    eng1, st1 = _run_engine(spark, tmp_path / "a", feed.base_path, feed.log_path)
    eng2, st2 = _run_engine(
        spark, tmp_path / "b", feed.base_path, feed.log_path, barrier_stride=1
    )
    assert len(st1.epochs) == 1
    assert len(st2.epochs) >= 5
    assert_tables_equal(
        eng2.final_state(spark).toPandas(), eng1.final_state(spark).toPandas()
    )
    # checkpoints advanced monotonically
    barriers = [e.barrier_ts for e in st2.epochs]
    assert barriers == sorted(barriers)


def test_parallelism_invariance(spark, tmp_path):
    """Same input, 1 vs 8 shuffle partitions → identical final state
    (the sandbox stand-in for the N vs 4N executor rule)."""
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=25, turns_per_conv=4, n_changes=1500,
        seed=11, resolved_every=500,
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        eng1, _ = _run_engine(spark, tmp_path / "p1", feed.base_path, feed.log_path)
        out1 = eng1.final_state(spark).toPandas()
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        eng8, _ = _run_engine(spark, tmp_path / "p8", feed.base_path, feed.log_path)
        out8 = eng8.final_state(spark).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert_tables_equal(out8, out1)


def test_hot_key_skew_correctness(spark, tmp_path):
    """hot_key_skew preset: 30% of events on conv 0 — still byte-correct."""
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=30, turns_per_conv=4, n_changes=2000,
        seed=13, hot_key_frac=0.3, resolved_every=1000,
    )
    eng, _ = _run_engine(spark, tmp_path, feed.base_path, feed.log_path)
    expected = sequential_apply(feed.base_path, feed.log_path)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)


def test_lineage_emitted(spark, tmp_path):
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=10, turns_per_conv=3, n_changes=500,
        seed=5, resolved_every=250,
    )
    eng, stats = _run_engine(spark, tmp_path, feed.base_path, feed.log_path)
    lin = eng.table.lineage(spark).toPandas()
    assert len(lin) > 0
    assert lin["applied_events"].sum() == sum(e.dml_events for e in stats.epochs)
    assert set(lin.columns) == {"epoch", "partition_id", "applied_events", "max_resolved_ts"}
    assert lin["max_resolved_ts"].max() <= stats.epochs[-1].barrier_ts


def test_tso_scale_timestamps(spark, tmp_path):
    """Real TiDB TSOs are physical_ms << 18 (~2^59 today): the whole path —
    epoch slice, fold, watermark barriers, checkpoint persistence, MQ
    publish + relay — must be exact at that magnitude, not just at the
    small synthetic ts the fixtures use (the wire varints were silently
    35-bit until the property suite caught it)."""
    TSO = (1_700_000_000_000 << 18)  # a real-world-scale base TSO
    base = [("c1", 0, "user", "hello", None, "2024-01-01T00:00:00")]
    events = [
        ev(0, "I", TSO + 1, "c1", 1, pl("a")),
        ev(1, "U", TSO + 2, "c1", 1, pl("b")),
        ev(2, "R", TSO + 2),
        ev(3, "D", TSO + 3, "c1", 0),
        ev(4, "I", TSO + 4, "c2", 0, pl("c")),
        ev(5, "R", TSO + 4),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base, final_resolved=False)
    eng, stats = _run_engine(spark, tmp_path, base_fp, log_dir,
                             barrier_stride=1)
    assert len(stats.epochs) == 2
    assert eng.table.current_manifest()["checkpoint_ts"] == TSO + 4
    assert_tables_equal(
        eng.final_state(spark).toPandas(), sequential_apply(base_fp, log_dir)
    )

    # the binary wires carry the full TSO exactly
    from tiflow_spark.sinks.mq import (
        FileMQSink, MQChangefeed, topic_to_log,
    )
    for protocol in ("avro", "canal-pb", "craft"):
        sink = FileMQSink(str(tmp_path / f"tso_topic_{protocol}"), n_partitions=2)
        MQChangefeed(log_dir, sink, protocol=protocol).run(spark)
        log2 = topic_to_log(spark, sink, str(tmp_path / f"tso_log_{protocol}"))
        t2 = LakeTable(str(tmp_path / f"tso_t_{protocol}"), num_buckets=2)
        e2 = ChangefeedEngine(log2, t2)
        e2.bootstrap(spark, base_fp, start_ts=0)
        e2.run(spark)
        assert_tables_equal(
            e2.final_state(spark).toPandas(), sequential_apply(base_fp, log_dir)
        )
