"""Scaling-efficiency evidence (BASELINE.json north_rule): the same changefeed
replay at N and 4N cores (local[8] vs local[32] — the sandbox stand-in for N
vs 4N executors), reporting sustained events/sec at both and the efficiency
ratio. Each parallelism level runs in its OWN subprocess/JVM so nothing leaks
between runs. Writes BENCH.md.

Usage: PYTHONPATH=. python tools/scaling_bench.py [n_events] [cpus_small] [cpus_big]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
from tiflow_spark.session import get_spark
from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.lake import LakeTable

feed_dir, target, cpus = {feed!r}, {target!r}, {cpus}
shutil.rmtree(target, ignore_errors=True)
spark = get_spark(app=f"scale{{cpus}}", cpus=cpus, shuffle_partitions=cpus)
table = LakeTable(target, num_buckets=32)
eng = ChangefeedEngine(os.path.join(feed_dir, "log"), table)
t0 = time.time()
eng.bootstrap(spark, os.path.join(feed_dir, "base", "transcripts.parquet"))
boot = time.time() - t0
t0 = time.time()
st = eng.run(spark)
replay = time.time() - t0
n = st.total_events
state_rows = eng.final_state(spark).count()
spark.stop()
print(json.dumps({{"cpus": cpus, "bootstrap_sec": round(boot, 2),
                   "replay_sec": round(replay, 2), "events": n,
                   "events_per_sec": round(n / replay, 1),
                   "state_rows": state_rows}}))
"""


def run_at(cpus: int, feed_dir: str, target: str) -> dict:
    code = RUNNER.format(repo=REPO, feed=feed_dir, target=target, cpus=cpus)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0:
        print(out.stderr[-3000:], file=sys.stderr)
        raise RuntimeError(f"run at cpus={cpus} failed")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    cpus_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus_big = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    sys.path.insert(0, REPO)
    from tiflow_spark.generator import generate_changefeed

    feed_dir = f"/tmp/tiflow_scale_{n_events}"
    if not os.path.exists(os.path.join(feed_dir, "log")):
        os.makedirs(feed_dir, exist_ok=True)
        t0 = time.time()
        generate_changefeed(
            feed_dir,
            n_convs=max(n_events // 50, 100),
            turns_per_conv=10,
            n_changes=n_events,
            seed=42,
            resolved_every=max(n_events // 10, 1000),
            hot_key_frac=0.05,
            n_files=64,
            ddl_plan=[(0.5, {"action": "add_column", "name": "note",
                             "type": "string", "default": ""})],
        )
        print(f"# generated {n_events} events in {time.time()-t0:.0f}s")

    results = {}
    for cpus in (cpus_small, cpus_big):
        r = run_at(cpus, feed_dir, f"/tmp/tiflow_scale_target_{cpus}")
        results[cpus] = r
        print(f"# local[{cpus}]: {r}")

    a, b = results[cpus_small], results[cpus_big]
    assert a["state_rows"] == b["state_rows"], "final state must be size-identical"
    factor = cpus_big / cpus_small
    speedup = a["replay_sec"] / b["replay_sec"]
    eff = speedup / factor
    summary = {
        "n_events": n_events,
        "cpus": [cpus_small, cpus_big],
        "replay_sec": [a["replay_sec"], b["replay_sec"]],
        "events_per_sec": [a["events_per_sec"], b["events_per_sec"]],
        "speedup": round(speedup, 2),
        "scaling_efficiency": round(eff, 3),
    }
    print(json.dumps(summary))

    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(f"""# BENCH — measured scaling evidence

Protocol (BASELINE.md "Sandbox evidence protocol"): identical seed-fixed
synthetic changefeed replay (bootstrap CTAS excluded; sustained replay phase
timed) at local[{cpus_small}] and local[{cpus_big}] — the N vs 4N stand-in.
Separate JVMs per level; shuffle partitions sized to cores; final-state row
counts asserted identical.

| run | cores | replay sec | events/sec | bootstrap sec |
|---|---|---|---|---|
| bench-N | {cpus_small} | {a['replay_sec']} | {a['events_per_sec']} | {a['bootstrap_sec']} |
| bench-4N | {cpus_big} | {b['replay_sec']} | {b['events_per_sec']} | {b['bootstrap_sec']} |

- input: {n_events:,} change events over {max(n_events // 50, 100):,} conversations,
  5% hot-key skew on conv 0, one mid-stream ADD COLUMN DDL, 10 resolved-ts marks.
- speedup {cpus_small}→{cpus_big} cores: **{speedup:.2f}×**
- scaling efficiency (speedup / {factor:.0f}): **{eff:.3f}** (target ≥ 0.8)

Regenerate: `PYTHONPATH=. python tools/scaling_bench.py {n_events} {cpus_small} {cpus_big}`
""")
    print(f"# wrote BENCH.md (efficiency={eff:.3f})")


if __name__ == "__main__":
    main()
