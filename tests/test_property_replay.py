"""Property-based e2e: ANY valid changefeed replays to the oracle state.

Hypothesis generates random feeds — commit-ts ties, multi-row txns, the full
DDL vocabulary (add/drop/rename/modify/truncate) interleaved mid-stream,
resolved marks at contract-valid positions, random barrier stride — and the
engine's final table must byte-match the sequential-apply oracle every time.
This is the generative twin of the hand-picked e2e fixtures (SURVEY.md §5:
the reference leans on randomized integration workloads the same way).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tiflow_spark.engine import ChangefeedEngine
from tiflow_spark.lake import LakeTable
from tiflow_spark.oracle import sequential_apply

from tests.helpers import assert_tables_equal, ev, write_feed

CONVS = ["c0", "c1", "c2"]
TURNS = [0, 1]
NAME_POOL = ["m1", "m2"]


@st.composite
def changefeed(draw):
    """A valid feed: events list + which DDLs stay legal, R marks only where
    the resolved contract allows them (strictly before the next commit_ts)."""
    n = draw(st.integers(min_value=4, max_value=18))
    fields = {"role": "string", "text": "string", "tool": "string", "ts": "timestamp"}
    events = []
    ts = 100
    seq = 0
    must_advance = False  # an R was just emitted at ts → next event needs ts+1

    for _ in range(n):
        gap = draw(st.integers(min_value=0, max_value=2))
        if must_advance and gap == 0:
            gap = 1
        ts += gap
        must_advance = False
        kind = draw(
            st.sampled_from(["I", "U", "U", "D", "ddl"])  # DML-heavy mix
        )
        if kind == "ddl":
            choices = ["truncate_table"]
            absent = [m for m in NAME_POOL if m not in fields]
            extra_present = [m for m in NAME_POOL if m in fields]
            if absent:
                choices.append("add_column")
            if extra_present:
                choices += ["drop_column", "rename_column", "modify_column"]
            action = draw(st.sampled_from(choices))
            if action == "add_column":
                name = draw(st.sampled_from(absent))
                typ = draw(st.sampled_from(["string", "int"]))
                ddl = {"action": "add_column", "name": name, "type": typ,
                       "default": None}
                fields[name] = typ
            elif action == "drop_column":
                name = draw(st.sampled_from(extra_present))
                ddl = {"action": "drop_column", "name": name}
                del fields[name]
            elif action == "rename_column":
                name = draw(st.sampled_from(extra_present))
                target = [m for m in NAME_POOL if m not in fields]
                if not target:
                    continue
                ddl = {"action": "rename_column", "name": name,
                       "new_name": target[0]}
                fields[target[0]] = fields.pop(name)
            elif action == "modify_column":
                name = draw(st.sampled_from(extra_present))
                new_t = "int" if fields[name] == "string" else "string"
                ddl = {"action": "modify_column", "name": name, "type": new_t}
                fields[name] = new_t
            else:
                ddl = {"action": "truncate_table"}
            events.append(ev(seq, "DDL", ts, ddl=ddl))
            seq += 1
        else:
            conv = draw(st.sampled_from(CONVS))
            turn = draw(st.sampled_from(TURNS))
            if kind == "D":
                events.append(ev(seq, "D", ts, conv, turn))
            else:
                payload = {}
                for name, typ in fields.items():
                    if typ == "timestamp":
                        payload[name] = "2024-01-01T00:00:00"
                    elif typ == "int":
                        payload[name] = seq
                    else:
                        payload[name] = f"v{seq}"
                events.append(ev(seq, kind, ts, conv, turn, payload, ver=None))
            seq += 1
        # contract-valid mid-stream resolved mark
        if draw(st.booleans()) and draw(st.booleans()):
            events.append(ev(seq, "R", ts))
            seq += 1
            must_advance = True
    stride = draw(st.sampled_from([0, 1, 2]))
    return events, stride


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(feed=changefeed())
def test_random_feed_matches_oracle(spark, feed):
    events, stride = feed
    base = [
        ("c0", 0, "user", "base00", None, "2024-01-01T00:00:00"),
        ("c1", 1, "assistant", "base11", "search", "2024-01-01T00:00:01"),
    ]
    tmp = tempfile.mkdtemp(prefix="prop_feed_")
    try:
        base_fp, log_dir = write_feed(tmp, events, base)
        table = LakeTable(os.path.join(tmp, "tgt"), num_buckets=2)
        eng = ChangefeedEngine(log_dir, table)
        eng.bootstrap(spark, base_fp)
        stats = eng.run(spark, barrier_stride=stride)
        assert all(e.committed for e in stats.epochs)
        got = eng.final_state(spark).toPandas()
        exp = sequential_apply(base_fp, log_dir)
        assert_tables_equal(got, exp)
        # replay idempotence: a second run is a no-op with identical state
        assert eng.run(spark).epochs == []
        assert_tables_equal(eng.final_state(spark).toPandas(), exp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
