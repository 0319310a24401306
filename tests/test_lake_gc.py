"""Snapshot expiry (C4): old manifests + unreferenced data files are removed;
the current snapshot and resume path survive."""

from __future__ import annotations

import os

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.generator import generate_changefeed
from tiflow_spark.lake import LakeTable
from tiflow_spark.oracle import sequential_apply

from tests.helpers import assert_tables_equal


def test_expire_snapshots_keeps_current_state(spark, tmp_path):
    feed = generate_changefeed(
        str(tmp_path / "gen"), n_convs=15, turns_per_conv=3, n_changes=900,
        seed=3, resolved_every=150,
    )
    table = LakeTable(str(tmp_path / "target"), num_buckets=4)
    eng = ChangefeedEngine(feed.log_path, table)
    eng.bootstrap(spark, feed.base_path)
    st = eng.run(spark, barrier_stride=1)
    assert len(st.epochs) >= 4

    manifests_before = len(os.listdir(table._manifest_dir))
    res = table.expire_snapshots(keep_last=2)
    assert res["removed_manifests"] == manifests_before - 2
    assert res["removed_files"] > 0
    assert len(os.listdir(table._manifest_dir)) == 2

    # current snapshot still byte-matches the oracle after GC
    expected = sequential_apply(feed.base_path, feed.log_path)
    assert_tables_equal(eng.final_state(spark).toPandas(), expected)

    # re-run after GC: nothing to do, no errors
    assert len(eng.run(spark).epochs) == 0

    # idempotent second expiry
    res2 = table.expire_snapshots(keep_last=2)
    assert res2["removed_manifests"] == 0
