"""The spark-submit --py-files deployment contract (north rule: "runs via
spark-submit --py-files"): the package must work when imported ONLY from a
zip shipped with --py-files, in a fresh JVM, with the repo absent from
PYTHONPATH — i.e. exactly what a cluster executor sees.

Runs the whole generate → bootstrap → replay → oracle-match drive through
``tools/submit_replay.py``'s launcher in a subprocess (its own Spark
session, independent of the test session)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_submit_py_files_replay_matches_oracle():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_replay.py"),
         "--cores", "4", "--events", "20000"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["package_from_zip"] is True
    assert res["oracle_match"] is True
    assert res["master"] == "local[4]"
    assert res["events"] >= 20000
    assert "text" in res["compared_cols"]  # the per-turn text invariant
