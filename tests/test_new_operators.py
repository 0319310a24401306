"""Unit tests for the round-1 coverage additions: cyclic-replication filter
(F6), data-validator checksums, quality scoring, batch reduction."""

from __future__ import annotations

from pyspark.sql import functions as F

from tiflow_spark.functions import text
from tiflow_spark.operators.filters import cyclic_mark_filter
from tiflow_spark.operators.validator import table_checksums


def _feed(spark):
    rows = [
        # (op, commit_ts, start_ts, seq, user_id, value)
        ("I", 10, 10, 0, 1, "a"),
        ("U", 20, 20, 1, 1, "b"),
        ("I", 30, 30, 2, 2, "c"),
        ("D", 40, 40, 3, 2, "d"),
        ("U", 50, 50, 4, 3, "e"),
    ]
    return spark.createDataFrame(
        rows, "op string, commit_ts long, start_ts long, seq long, user_id long, value string"
    )


def test_cyclic_filter_drops_marked_replica_keeps_unmarked(spark):
    feed = _feed(spark)
    marks = spark.createDataFrame(
        [(10, 1), (30, 2)], "start_ts long, replica_id int"
    )
    kept = cyclic_mark_filter(feed, marks, filter_replica_ids=[2])
    got = {r.start_ts for r in kept.collect()}
    # txn 30 originated from replica 2 → dropped; txn 10 (replica 1) and all
    # unmarked local txns pass
    assert got == {10, 20, 40, 50}


def test_cyclic_filter_no_marks_is_identity(spark):
    feed = _feed(spark)
    marks = spark.createDataFrame([], "start_ts long, replica_id int")
    assert cyclic_mark_filter(feed, marks, [1, 2]).count() == feed.count()


def test_checksum_detects_single_cell_drift(spark):
    feed = _feed(spark)
    drifted = feed.withColumn(
        "value", F.when(F.col("commit_ts") == 30, "CORRUPT").otherwise(F.col("value"))
    )
    a = table_checksums(feed, "user_id", ["op", "value"], n_buckets=4)
    b = table_checksums(drifted, "user_id", ["op", "value"], n_buckets=4)
    diff = a.alias("a").join(b.alias("b"), "bucket").filter(
        (F.col("a.n_rows") != F.col("b.n_rows"))
        | (F.col("a.checksum") != F.col("b.checksum"))
    )
    assert diff.count() == 1  # exactly the drifted row's bucket flags


def test_checksum_partition_invariant(spark):
    feed = _feed(spark)
    a = table_checksums(feed.repartition(1), "user_id", ["op", "value"], 4)
    b = table_checksums(feed.repartition(7), "user_id", ["op", "value"], 4)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_quality_scores_gate(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog today, really."),
            (1, "ok"),  # too short → dropped
            (2, ""),    # empty → no division error, dropped
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in text.quality_scores(docs).collect()}
    assert rows[0].keep and not rows[1].keep and not rows[2].keep
    assert rows[0].stop_permille > 0 and rows[0].punct_permille > 0
    assert rows[2].punct_permille == 0
