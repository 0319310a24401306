"""Bank-style conserved-quantity oracle (the reference's strongest
correctness-under-concurrency workload, tests/integration_tests/bank/
case.go:34-50): balanced transfer transactions — each txn debits one account
and credits another by the same amount at a shared commit_ts — so
SUM(balance) is invariant at EVERY sync-point snapshot and the final state.
Pinned through epoch replay, crash/resume, and two shuffle-parallelism
levels (the sandbox's two-cluster-size analogue)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N_ACCOUNTS = 40
INITIAL = 1_000
TOTAL = N_ACCOUNTS * INITIAL


@pytest.fixture(scope="module")
def bank(tmp_path_factory):
    from tiflow_spark.generator import generate_bank_feed

    d = tmp_path_factory.mktemp("bank")
    return generate_bank_feed(
        str(d), n_accounts=N_ACCOUNTS, n_transfers=1_500, seed=11,
        resolved_every=150, initial_balance=INITIAL,
    )


def _total(df) -> int:
    row = df.agg(
        F.sum("balance").alias("s"), F.count("*").alias("n")
    ).collect()[0]
    assert row["n"] == N_ACCOUNTS  # full-row upserts never create/drop keys
    return int(row["s"])


def test_bank_invariant_at_every_syncpoint_and_final(bank, tmp_path, spark):
    from tiflow_spark.engine import ChangefeedEngine
    from tiflow_spark.lake import LakeTable
    from tiflow_spark.oracle import sequential_apply
    from tests.helpers import assert_tables_equal

    eng = ChangefeedEngine(
        bank.log_path, LakeTable(str(tmp_path / "t"), num_buckets=8)
    )
    eng.bootstrap(spark, bank.base_path, registry=bank.registry)
    stats = eng.run(spark, barrier_stride=1, syncpoint_every=200)
    assert len(stats.epochs) >= 5  # one epoch per resolved mark

    # conservation at every recorded sync point (snapshot time travel)
    sps = eng.table.current_manifest().get("syncpoints", [])
    assert len(sps) >= 3
    for sp in sps:
        snap = eng.table.read_at_syncpoint(spark, sp["primary_ts"])
        assert _total(snap) == TOTAL, f"sync point {sp} broke conservation"

    # final state: conserved AND byte-matches the sequential oracle
    final = eng.final_state(spark)
    assert _total(final) == TOTAL
    assert_tables_equal(
        final.toPandas(),
        sequential_apply(bank.base_path, bank.log_path,
                         registry=bank.registry),
    )


def test_bank_invariant_through_crash_resume(bank, tmp_path, spark):
    """A crash mid-replay (run cut after one epoch, fresh engine resumes)
    must conserve the total at the interrupted checkpoint, at every sync
    point, and in the final state."""
    from tiflow_spark.engine import ChangefeedEngine
    from tiflow_spark.lake import LakeTable

    table = LakeTable(str(tmp_path / "t_crash"), num_buckets=8)
    eng = ChangefeedEngine(bank.log_path, table)
    eng.bootstrap(spark, bank.base_path, registry=bank.registry)
    part1 = eng.run(spark, barrier_stride=1, syncpoint_every=200, max_epochs=2)
    assert len(part1.epochs) == 2
    assert _total(eng.final_state(spark)) == TOTAL  # mid-stream checkpoint

    # fresh engine instance = restart; resumes from the committed checkpoint
    eng2 = ChangefeedEngine(bank.log_path, table)
    part2 = eng2.run(spark, barrier_stride=1, syncpoint_every=200)
    assert part2.epochs  # the tail replays
    for sp in eng2.table.current_manifest().get("syncpoints", []):
        assert _total(eng2.table.read_at_syncpoint(spark, sp["primary_ts"])) == TOTAL
    assert _total(eng2.final_state(spark)) == TOTAL


def test_bank_invariant_at_two_parallelism_levels(bank, tmp_path, spark):
    """Same feed replayed under 2 and 16 shuffle partitions (the sandbox's
    two-cluster-size lever): both conserve the total at every sync point and
    land the identical final table — partitioning never reorders per-key
    apply (P1: key-hash shuffle IS causality)."""
    from tiflow_spark.engine import ChangefeedEngine
    from tiflow_spark.lake import LakeTable
    from tests.helpers import assert_tables_equal

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    finals = {}
    try:
        for par in (2, 16):
            spark.conf.set("spark.sql.shuffle.partitions", str(par))
            eng = ChangefeedEngine(
                bank.log_path,
                LakeTable(str(tmp_path / f"t_par{par}"), num_buckets=4),
            )
            eng.bootstrap(spark, bank.base_path, registry=bank.registry)
            eng.run(spark, barrier_stride=2, syncpoint_every=300)
            for sp in eng.table.current_manifest().get("syncpoints", []):
                assert _total(
                    eng.table.read_at_syncpoint(spark, sp["primary_ts"])
                ) == TOTAL
            final = eng.final_state(spark)
            assert _total(final) == TOTAL
            finals[par] = final.toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert_tables_equal(finals[2], finals[16])
