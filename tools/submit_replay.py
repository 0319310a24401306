"""Run the changefeed replay through the real ``spark-submit --py-files``
deployment path — the north-rule contract ("runs via spark-submit
--py-files at N and 4N executors").

Two modes in one file:

- **Launcher** (plain ``python tools/submit_replay.py [--cores N]
  [--events M]``): packs ``tiflow_spark/`` into ``tiflow_spark.zip`` in a
  temp build dir, then execs ``spark-submit --master local[N] --py-files
  tiflow_spark.zip <this file> --worker ...`` with the repo scrubbed from
  ``PYTHONPATH`` and the working directory moved off the repo, so the job
  can import the package ONLY from the shipped zip — exactly what a
  cluster executor would see.
- **Worker** (``--worker``, running under spark-submit): builds its
  session with ``SparkSession.builder.getOrCreate()`` (no ``master()``
  override — the submit args win, as on a real cluster), asserts the
  package really was imported from the zip, generates a seed-fixed
  changefeed, bootstraps, replays, byte-checks the final state against the
  sequential-apply oracle, and prints ONE JSON line.

Local parallelism stands in for executor count per BENCH.md's sandbox
protocol; on a real cluster the same command line takes
``--master yarn --num-executors N`` etc. and nothing in the job changes.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------- launcher


def _build_zip(build_dir: str) -> str:
    zip_path = os.path.join(build_dir, "tiflow_spark.zip")
    pkg = os.path.join(REPO, "tiflow_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            for fn in sorted(files):
                if fn.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))
    return zip_path


def _spark_submit_bin() -> str:
    found = shutil.which("spark-submit")
    if found:
        return found
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _submit_once(cores: int, events: int, trials: int = 1) -> dict | None:
    """One spark-submit run in a fresh JVM; returns the worker's JSON line."""
    build_dir = tempfile.mkdtemp(prefix="tiflow_submit_")
    zip_path = _build_zip(build_dir)
    env = dict(os.environ)
    # scrub any repo path so only --py-files can satisfy the import
    env["PYTHONPATH"] = ""
    env.pop("SPARK_GRAFT_CPUS", None)
    cmd = [
        _spark_submit_bin(),
        "--master", f"local[{cores}]",
        # parity with tiflow_spark.session defaults: spark-submit's 1g
        # driver default cannot hold the worker's full-table oracle
        # collect at >=20M-event feeds (a cluster submit sets this too)
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "10g"),
        "--conf", "spark.driver.maxResultSize=4g",
        "--conf", f"spark.sql.shuffle.partitions={max(cores, 8)}",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--py-files", zip_path,
        os.path.abspath(__file__),
        "--worker", "--workdir", build_dir, "--events", str(events),
        "--cores", str(cores), "--trials", str(trials),
    ]
    # run from OUTSIDE the repo: cwd must not make `tiflow_spark` importable
    proc = subprocess.run(cmd, cwd=build_dir, env=env,
                          capture_output=True, text=True)
    shutil.rmtree(build_dir, ignore_errors=True)
    sys.stderr.write(proc.stderr[-2000:] if proc.returncode else "")
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("{"):
            print(line)
            if proc.returncode != 0:
                # the worker prints its JSON before failing (e.g. oracle
                # mismatch exits 1) — propagate the failure, don't let the
                # parsed line mask it
                return None
            return json.loads(line)
    return None


def launch(cores: int, events: int, trials: int = 1) -> int:
    return 0 if _submit_once(cores, events, trials) else 1


def launch_scale(levels: list[int], events: int) -> int:
    """The north rule's two-cluster-size criterion through the REAL submit
    path: the same seed-fixed job at local[N] and local[4N] (the sandbox's
    executor-count stand-in, BENCH.md protocol), identical input content
    (same seed), separate JVM per level; prints throughput at each level
    plus the scaling efficiency between the extremes."""
    results = []
    for n in levels:
        r = _submit_once(n, events, trials=3)
        if r is None:
            return 1
        results.append((n, r))
    (n0, r0), (n1, r1) = results[0], results[-1]
    eff = (r1["events_per_sec"] / r0["events_per_sec"]) / (n1 / n0)
    print(json.dumps({
        "mode": "spark-submit --py-files scaling",
        "levels": {f"local[{n}]": r["events_per_sec"] for n, r in results},
        "events": r0["events"],
        "oracle_match_all": all(r["oracle_match"] for _, r in results),
        "scale_from": f"local[{n0}]", "scale_to": f"local[{n1}]",
        "scaling_efficiency": round(eff, 3),
    }))
    return 0


# ----------------------------------------------------------------- worker


def worker(workdir: str, events: int, cores: int, trials: int = 1) -> None:
    import tiflow_spark

    pkg_path = os.path.abspath(tiflow_spark.__file__)
    from_zip = ".zip" in pkg_path
    if not from_zip:  # the whole point of the exercise
        raise SystemExit(f"package imported from {pkg_path}, not the zip")

    from pyspark.sql import SparkSession

    from tiflow_spark.engine import ChangefeedEngine
    from tiflow_spark.generator import generate_changefeed
    from tiflow_spark.lake import LakeTable
    from tiflow_spark.oracle import sequential_apply

    spark = SparkSession.builder.getOrCreate()  # submit args choose master
    # seed-fixed feeds are identical across runs, so cache them per
    # (events, n_files, generator-version): the 2-vs-8 scaling pair reuses
    # ONE feed instead of regenerating ~15 driver-minutes per level (on a
    # real cluster both submissions would read the same upstream anyway)
    from tiflow_spark.generator import FEED_VERSION

    n_files = max(cores, 8)
    feed_dir = os.path.join(
        tempfile.gettempdir(),
        f"tiflow_submit_feed_{events}_{n_files}_v{FEED_VERSION}",
    )
    meta_fp = os.path.join(feed_dir, "_FEED_META.json")
    if os.path.exists(meta_fp):
        meta = json.load(open(meta_fp))
        feed = type("CachedFeed", (), meta)()
    else:
        shutil.rmtree(feed_dir, ignore_errors=True)
        feed = generate_changefeed(
            feed_dir,
            n_convs=max(events // 25, 10),
            turns_per_conv=5,
            n_changes=events,
            seed=7,
            hot_key_frac=0.05,
            resolved_every=max(events // 4, 100),
            n_files=n_files,  # scan parallelism, as a cluster ingest has
            ddl_plan=[
                (0.5, {"action": "add_column", "name": "note",
                       "type": "string", "default": ""}),
            ],
        )
        with open(meta_fp, "w") as fh:  # written LAST = completion marker
            json.dump({"base_path": feed.base_path,
                       "log_path": feed.log_path,
                       "n_events": feed.n_events,
                       "max_commit_ts": feed.max_commit_ts}, fh)
    target = os.path.join(workdir, "target")
    # bench.py protocol: warm the page cache (executor-local I/O scales on a
    # cluster, one box's cold disk does not), then min-of-N trials so
    # one-time codegen/JIT compilation doesn't masquerade as replay cost
    engine = ChangefeedEngine(
        feed.log_path, LakeTable(target, num_buckets=max(cores, 16)))
    engine.read_log(spark).count()
    spark.read.parquet(feed.base_path).count()
    reps = []
    for _ in range(trials):
        shutil.rmtree(target, ignore_errors=True)
        table = LakeTable(target, num_buckets=max(cores, 16))
        engine = ChangefeedEngine(feed.log_path, table)
        engine.bootstrap(spark, feed.base_path)
        t0 = time.time()
        engine.run(spark)
        reps.append(time.time() - t0)
    replay_sec = min(reps)

    got = engine.final_state(spark).toPandas()
    # the oracle is a pure function of the (cached) feed — cache it too
    oracle_fp = os.path.join(feed_dir, "_ORACLE.parquet")
    if os.path.exists(oracle_fp):
        import pandas as pd

        want = pd.read_parquet(oracle_fp)
    else:
        want = sequential_apply(feed.base_path, feed.log_path)
        want.to_parquet(oracle_fp + ".tmp")
        os.rename(oracle_fp + ".tmp", oracle_fp)
    keys = ["conv_id", "turn_idx"]
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    # every oracle column must be present: comparing only the intersection
    # would let an engine regression that drops a column still "match"
    missing = [c for c in want.columns if c not in set(got.columns)]
    cols = list(want.columns)
    match = not missing and len(got) == len(want) and all(
        [None if (v != v) else str(v) for v in got[c]]
        == [None if (v != v) else str(v) for v in want[c]]
        for c in cols
    )
    spark.stop()
    print(json.dumps({
        "mode": "spark-submit --py-files",
        "master": f"local[{cores}]",
        "package_from_zip": from_zip,
        "events": feed.n_events,
        "replay_sec": round(replay_sec, 3),
        "replay_trials": [round(x, 3) for x in reps],
        "events_per_sec": round(feed.n_events / replay_sec, 1),
        "final_rows": len(got),
        "oracle_match": bool(match),
        "compared_cols": cols,
        "missing_cols": missing,
    }))
    if not match:
        raise SystemExit("final state does not match the sequential oracle")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--worker", action="store_true")
    p.add_argument("--workdir", default=None)
    p.add_argument("--cores", type=int, default=8)
    p.add_argument("--events", type=int, default=200_000)
    p.add_argument("--scale", default=None,
                   help="comma-separated parallelism levels, e.g. 2,8")
    p.add_argument("--trials", type=int, default=1)
    a = p.parse_args()
    if a.worker:
        worker(a.workdir, a.events, a.cores, a.trials)
        return 0
    if a.scale:
        return launch_scale([int(x) for x in a.scale.split(",")], a.events)
    return launch(a.cores, a.events, a.trials)


if __name__ == "__main__":
    sys.exit(main())
