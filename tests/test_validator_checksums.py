"""Continuous downstream validation (dm/syncer/data_validator.go:62-196
analogue): per-bucket content checksums committed with every snapshot,
re-verified on the buckets each MERGE touches, plus the point-in-time
``verify_snapshot`` audit. Drift injected mid-replay (a corrupted target
data file) must be detected at the next epoch that touches the bucket,
before it folds into new state."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.lake import ChecksumDrift, LakeTable
from tiflow_spark.oracle import sequential_apply

from tests.helpers import assert_tables_equal, ev, pl, write_feed


def _feed(tmp_path, two_epochs_same_key=True):
    base = [
        ("c1", 0, "user", "v0", None, "2024-01-01T00:00:00"),
        ("c2", 0, "user", "w0", None, "2024-01-01T00:00:00"),
    ]
    events = [
        ev(0, "U", 120, "c1", 0, pl("e1")),
        ev(1, "I", 130, "c2", 1, pl("n1")),
        ev(2, "R", 150),
        # second epoch touches c1 again so its bucket is re-verified
        ev(3, "U", 160, "c1", 0, pl("e2")),
        ev(4, "R", 200),
    ]
    return write_feed(tmp_path, events, base, final_resolved=False)


def _corrupt_one_row(table_path: str) -> str:
    """Rewrite one LIVE data file (a current-manifest entry — CoW leaves
    dead files on disk until GC) with a flipped payload value — same schema,
    same row count, different content (out-of-band edit)."""
    import json

    with open(os.path.join(table_path, "_CURRENT")) as f:
        cur = f.read().strip()
    with open(os.path.join(table_path, "_manifests", cur)) as f:
        entries = json.load(f)["files"]
    files = sorted(os.path.join(table_path, e["path"]) for e in entries)
    for fp in files:
        t = pq.read_table(fp)
        if t.num_rows == 0 or "text" not in t.column_names:
            continue
        df = t.to_pandas()
        df.loc[df.index[0], "text"] = "TAMPERED"
        pq.write_table(
            __import__("pyarrow").Table.from_pandas(
                df, schema=t.schema, preserve_index=False
            ),
            fp,
            coerce_timestamps="us",  # Spark cannot read TIMESTAMP(NANOS)
            allow_truncated_timestamps=True,
        )
        # drop Hadoop's local-FS byte-level .crc sidecar: a real out-of-band
        # writer produces a self-consistent file; only the CONTENT digest in
        # the manifest can catch the edit
        crc = os.path.join(os.path.dirname(fp), f".{os.path.basename(fp)}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        return fp
    raise AssertionError("no data file to corrupt")


def test_checksums_recorded_and_replay_still_oracle_exact(spark, tmp_path):
    base_fp, log_dir = _feed(tmp_path)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table, validate_after_apply=True)
    eng.bootstrap(spark, base_fp)
    m0 = table.current_manifest()
    assert m0.get("checksums"), "bootstrap must record bucket digests"
    eng.run(spark, barrier_stride=1)
    m = table.current_manifest()
    assert set(m["checksums"]) >= {str(e["bucket"]) for e in m["files"]}
    rep = table.verify_snapshot(spark)
    assert rep["ok"] and rep["buckets_uncovered"] == 0
    assert_tables_equal(
        eng.final_state(spark).toPandas(), sequential_apply(base_fp, log_dir)
    )


def test_drift_detected_at_next_epoch(spark, tmp_path):
    """Corrupt a target file between epoch 1 and epoch 2: the epoch-2 merge
    re-verifies the buckets it is about to touch and must refuse."""
    base_fp, log_dir = _feed(tmp_path)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=1)  # one bucket:
    # every epoch touches it, so the drift is verifiably in the read set
    eng = ChangefeedEngine(log_dir, table, validate_after_apply=True)
    eng.bootstrap(spark, base_fp)
    st = eng.run(spark, max_epochs=1, barrier_stride=1)
    assert len(st.epochs) == 1 and st.epochs[0].committed
    _corrupt_one_row(table.path)
    with pytest.raises(ChecksumDrift, match="diverged"):
        ChangefeedEngine(log_dir, table, validate_after_apply=True).run(
            spark, barrier_stride=1
        )
    # and the corrupted epoch was refused, not committed
    assert table.current_manifest()["epoch"] == st.epochs[0].epoch


def test_verify_snapshot_point_in_time_audit(spark, tmp_path):
    base_fp, log_dir = _feed(tmp_path)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2, checksums=True)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)
    assert table.verify_snapshot(spark)["ok"]
    _corrupt_one_row(table.path)
    with pytest.raises(ChecksumDrift, match="verify_snapshot"):
        table.verify_snapshot(spark)


def test_checksums_survive_ddl_version_split(spark, tmp_path):
    """After an add_column DDL the snapshot holds files at two schema
    versions; digests are recomputed per version at verification time."""
    base = [(f"c{i}", 0, "user", f"v{i}", None, "2024-01-01T00:00:00")
            for i in range(1, 12)]  # enough keys that some bucket holds
    # only bootstrap-version files after c1's post-DDL rewrite
    events = [
        ev(0, "U", 120, "c1", 0, pl("e1")),
        ev(1, "R", 150),
        ev(2, "DDL", 160,
           ddl={"action": "add_column", "name": "note", "type": "string",
                "default": ""}),
        ev(3, "U", 170, "c1", 0, pl("e2", note="x")),
        ev(4, "R", 200),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base, final_resolved=False)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=4, checksums=True)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark, barrier_stride=1)
    m = table.current_manifest()
    assert len({e["schema_version"] for e in m["files"]}) == 2
    assert table.verify_snapshot(spark)["ok"]
    assert_tables_equal(
        eng.final_state(spark).toPandas(), sequential_apply(base_fp, log_dir)
    )


def test_coverage_grows_when_enabled_mid_life(spark, tmp_path):
    """A table created WITHOUT the knob can turn it on later: buckets gain
    digests as they are touched; untouched ones are reported uncovered and
    skipped (no false drift on upgrade)."""
    base_fp, log_dir = _feed(tmp_path)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=4)
    eng = ChangefeedEngine(log_dir, table)
    eng.bootstrap(spark, base_fp)
    eng.run(spark, max_epochs=1, barrier_stride=1)
    assert "checksums" not in table.current_manifest()
    eng2 = ChangefeedEngine(log_dir, table, validate_after_apply=True)
    eng2.run(spark, barrier_stride=1)
    m = table.current_manifest()
    assert m.get("checksums")  # the touched buckets gained digests
    rep = table.verify_snapshot(spark)
    assert rep["ok"]
    assert rep["buckets_checked"] == len(m["checksums"])


def test_row_image_validation_green_on_real_replay(spark, tmp_path):
    """validate_rows=True: every epoch's applied keys re-read and compared
    against the fold's post-images — a clean replay passes and still
    matches the sequential oracle; deletes are verified absent."""
    base = [("c1", 0, "user", "v0", None, "2024-01-01T00:00:00"),
            ("c2", 0, "user", "w0", None, "2024-01-01T00:00:00")]
    events = [
        ev(0, "U", 120, "c1", 0, pl("e1")),
        ev(1, "D", 130, "c2", 0),
        ev(2, "R", 150),
        ev(3, "I", 160, "c3", 0, pl("n1")),
        ev(4, "R", 200),
    ]
    base_fp, log_dir = write_feed(tmp_path, events, base, final_resolved=False)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table, validate_rows=True)
    eng.bootstrap(spark, base_fp)
    st = eng.run(spark, barrier_stride=1)
    assert len(st.epochs) == 2
    assert_tables_equal(
        eng.final_state(spark).toPandas(), sequential_apply(base_fp, log_dir)
    )


def test_row_image_validation_detects_apply_divergence(spark, tmp_path):
    """Direct contract: validate_applied_rows raises RowImageMismatch when
    the committed rows differ from the expected post-images (simulating an
    apply/write-path corruption the checksum validator's pre-merge check
    would only catch an epoch later)."""
    from tiflow_spark.engine import RowImageMismatch

    base_fp, log_dir = _feed(tmp_path)
    table = LakeTable(str(tmp_path / "tgt"), num_buckets=2)
    eng = ChangefeedEngine(log_dir, table, validate_rows=True)
    eng.bootstrap(spark, base_fp)
    eng.run(spark)

    m = table.current_manifest()
    buckets = sorted({e["bucket"] for e in m["files"]})
    good = table.read(spark)
    # expected images that DISAGREE with what was committed
    from pyspark.sql import functions as F

    wrong_upsert = good.withColumn("op", F.lit("U")).withColumn(
        "text", F.lit("NEVER-WRITTEN")
    )
    with pytest.raises(RowImageMismatch):
        eng.validate_applied_rows(spark, wrong_upsert, buckets)
    phantom_delete = good.withColumn("op", F.lit("D"))  # keys still present
    with pytest.raises(RowImageMismatch):
        eng.validate_applied_rows(spark, phantom_delete, buckets)
    # and the true post-images pass
    checked = eng.validate_applied_rows(
        spark, good.withColumn("op", F.lit("U")), buckets
    )
    assert checked == good.count()
