"""Deterministic synthetic changefeed generator (seed-fixed, vectorized).

Produces the two inputs of the engine, per FIXTURES.md F1/F2:

- ``base/transcripts.parquet`` — the initial snapshot (full-dump loader
  analogue, dm/loader/loader.go:710 → here a plain CTAS input);
- ``log/changefeed.parquet`` — the append-only changefeed log of
  I/U/D/DDL/R events (the binlog + redo log + replay source in one,
  SURVEY.md §7 design stance).

Semantics notes:
- I and U are both upserts at apply time (DM safe-mode REPLACE,
  dm/syncer/safe-mode/mode.go:29-80, is permanent under MERGE), and a D of an
  absent key is a no-op — so the generator needs no liveness state machine
  and is fully vectorized (numpy PCG64(seed): stable across platforms).
- commit_ts is monotone non-decreasing with deliberate ties; events sharing a
  commit_ts share a start_ts (multi-row txn, cdc/model/sink.go:512-536).
- R rows are in-band resolved-ts watermarks (cdc/model/kv.go:32); one every
  ``resolved_every`` data events and one final R covering the tail.
- DDLs are placed at stream fractions; payloads of later events are written
  under the new schema version (as-of rule exercised by the engine).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from tiflow_spark.registry import SchemaRegistry

# bump when generated-feed SEMANTICS change (benchmark caches key on this so
# a stale /tmp feed from an older generator is never replayed)
FEED_VERSION = 2

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["", "search", "python", "browser"])  # "" -> null

BASE_TS = pd.Timestamp("2024-01-01T00:00:00")


@dataclass
class GeneratedFeed:
    base_path: str
    log_path: str
    registry: SchemaRegistry
    n_base_rows: int
    n_events: int
    max_commit_ts: int


def _payload_json(role, text, tool, ts_iso, extra: dict[str, np.ndarray] | None = None):
    """Vectorized JSON payload assembly (pandas object-dtype concat)."""
    role = pd.Series(role, dtype=object)
    text = pd.Series(text, dtype=object)
    tool = pd.Series(tool, dtype=object)
    ts_iso = pd.Series(ts_iso, dtype=object)
    tool_part = ('"tool": "' + tool + '"').where(tool != "", '"tool": null')
    s = (
        '{"role": "' + role + '", "text": "' + text + '", '
        + tool_part
        + ', "ts": "' + ts_iso + '"'
    )
    if extra:
        for k, v in extra.items():
            s = s + ', "' + k + '": "' + pd.Series(v, dtype=object) + '"'
    return (s + "}").to_numpy()


def generate_base(
    out_dir: str, n_convs: int, turns_per_conv: int, seed: int = 42
) -> tuple[str, int]:
    """Initial transcripts snapshot: n_convs × turns_per_conv rows."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    n = n_convs * turns_per_conv
    conv = np.repeat(np.arange(n_convs), turns_per_conv)
    turn = np.tile(np.arange(turns_per_conv), n_convs)
    conv_id = pd.array([f"conv{c:06d}" for c in conv], dtype="str")
    role = ROLES[(turn % 2) + 2 * (rng.random(n) < 0.02)]
    text = pd.Series(conv_id).str.cat(
        ["-t" + str(t) + "-v0" for t in turn]
    ).to_numpy()
    tool = TOOLS[rng.integers(0, 4, n) * (role == "assistant")]
    ts = BASE_TS + pd.to_timedelta(conv * 60 + turn, unit="s")
    pdf = pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn.astype("int32"),
            "role": role,
            "text": text,
            "tool": pd.Series(tool).replace("", None),
            "ts": ts,
        }
    )
    path = os.path.join(out_dir, "base")
    os.makedirs(path, exist_ok=True)
    fp = os.path.join(path, "transcripts.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        fp,
        coerce_timestamps="us",  # Spark cannot read TIMESTAMP(NANOS)
        allow_truncated_timestamps=True,
    )
    return fp, n


# bank workload schema: one account row per key, a single integral balance
BANK_FIELDS = [(1, "balance", "bigint", None)]


def generate_bank_feed(
    out_dir: str,
    n_accounts: int = 50,
    n_transfers: int = 2_000,
    seed: int = 7,
    resolved_every: int = 200,
    initial_balance: int = 1_000,
) -> GeneratedFeed:
    """Bank-style conserved-quantity workload (the reference's strongest
    correctness-under-concurrency oracle, tests/integration_tests/bank/
    case.go:34-50): every transaction debits one account and credits another
    by the same amount at a SHARED commit_ts/start_ts, so SUM(balance) over
    the table is invariant — n_accounts × initial_balance — at every
    resolved-ts snapshot, every sync point, and the final state. Events are
    full-row images (new balance), like TiDB row changes. Deterministic for
    a seed; vectorized (running balances via a grouped cumulative sum)."""
    rng = np.random.default_rng(np.random.PCG64(seed))
    n = n_transfers

    # base snapshot: every account at the initial balance
    acct_ids = pd.array(
        [f"acct{i:06d}" for i in range(n_accounts)], dtype="str"
    )
    base_pdf = pd.DataFrame(
        {
            "conv_id": acct_ids,
            "turn_idx": np.zeros(n_accounts, dtype="int32"),
            "balance": np.full(n_accounts, initial_balance, dtype="int64"),
        }
    )
    base_dir = os.path.join(out_dir, "base")
    os.makedirs(base_dir, exist_ok=True)
    base_fp = os.path.join(base_dir, "accounts.parquet")
    pq.write_table(pa.Table.from_pandas(base_pdf, preserve_index=False), base_fp)

    # transfers: src != dst, positive amounts; balances may go negative
    # (no sufficiency constraint — conservation is the invariant, as in the
    # reference's bank case)
    src = rng.integers(0, n_accounts, n)
    dst = (src + rng.integers(1, n_accounts, n)) % n_accounts
    amount = rng.integers(1, 50, n)
    commit_ts = 1000 + np.arange(1, n + 1, dtype=np.int64)  # one txn per ts

    # two change rows per transfer, sharing the txn's commit/start ts
    acct = np.concatenate([src, dst])
    delta = np.concatenate([-amount, amount])
    ts2 = np.concatenate([commit_ts, commit_ts])
    order = np.argsort(ts2, kind="stable")  # interleave debit/credit by txn
    acct, delta, ts2 = acct[order], delta[order], ts2[order]
    run = pd.DataFrame({"acct": acct, "delta": delta})
    new_balance = (
        initial_balance + run.groupby("acct")["delta"].cumsum()
    ).to_numpy()
    old_balance = new_balance - delta

    dml = pd.DataFrame(
        {
            "op": "U",
            "commit_ts": ts2,
            "start_ts": ts2 - 1,
            "schema_version": np.ones(2 * n, dtype="int32"),
            "conv_id": pd.Series(acct).map(lambda i: f"acct{i:06d}"),
            "turn_idx": np.zeros(2 * n, dtype="int32"),
            "payload": '{"balance": ' + pd.Series(new_balance).astype(str) + "}",
            "pre_payload": '{"balance": ' + pd.Series(old_balance).astype(str) + "}",
            "ddl": None,
            "partition_hint": (acct % 32).astype("int32"),
        }
    )

    # R watermarks on transfer boundaries: both rows of a txn precede its R
    frames = [dml]
    pos_all = [np.arange(2 * n, dtype=np.float64)]
    order_hint = [np.full(2 * n, 1, dtype="int8")]
    r_positions = list(range(resolved_every - 1, n, resolved_every))
    if not r_positions or r_positions[-1] != n - 1:
        r_positions.append(n - 1)
    for tpos in r_positions:
        r_ts = int(commit_ts[tpos])
        frames.append(
            pd.DataFrame(
                {
                    "op": ["R"], "commit_ts": [r_ts], "start_ts": [None],
                    "schema_version": [None], "conv_id": [None],
                    "turn_idx": [None], "payload": [None],
                    "pre_payload": [None], "ddl": [None],
                    "partition_hint": [None],
                }
            )
        )
        pos_all.append(np.array([float(2 * tpos + 1)]))
        order_hint.append(np.array([3], dtype="int8"))

    out = pd.concat(frames, ignore_index=True)
    out["_pos"] = np.concatenate(pos_all)
    out["_oh"] = np.concatenate(order_hint)
    out = out.sort_values(["_pos", "_oh"], kind="stable").drop(
        columns=["_pos", "_oh"]
    )
    out.insert(0, "seq", np.arange(len(out), dtype=np.int64))
    out = out.reset_index(drop=True)

    schema = pa.schema(
        [
            ("seq", pa.int64()), ("op", pa.string()),
            ("commit_ts", pa.int64()), ("start_ts", pa.int64()),
            ("schema_version", pa.int32()), ("conv_id", pa.string()),
            ("turn_idx", pa.int32()), ("payload", pa.string()),
            ("pre_payload", pa.string()), ("ddl", pa.string()),
            ("partition_hint", pa.int32()),
        ]
    )
    log_dir = os.path.join(out_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(out, schema=schema, preserve_index=False),
        os.path.join(log_dir, "changefeed-00000.parquet"),
    )
    ctl_mask = out["op"] == "R"
    ctl_dir = os.path.join(log_dir, "_control")
    os.makedirs(ctl_dir, exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(out[ctl_mask], schema=schema, preserve_index=False),
        os.path.join(ctl_dir, "control-00000.parquet"),
    )
    from tiflow_spark.engine import write_control_coverage

    write_control_coverage(log_dir)
    return GeneratedFeed(
        base_path=base_fp,
        log_path=log_dir,
        registry=SchemaRegistry.initial(fields=BANK_FIELDS),
        n_base_rows=n_accounts,
        n_events=len(out),
        max_commit_ts=int(commit_ts[-1]),
    )


def generate_changefeed(
    out_dir: str,
    n_convs: int = 100,
    turns_per_conv: int = 10,
    n_changes: int = 5_000,
    seed: int = 42,
    hot_key_frac: float = 0.0,
    resolved_every: int = 500,
    ddl_plan: list[tuple[float, dict]] | None = None,
    n_files: int = 1,
    ts_tie_prob: float = 0.10,
) -> GeneratedFeed:
    """Generate base snapshot + changefeed log. Deterministic for a seed.

    hot_key_frac: fraction of events funneled to conv 0 (hot_key_skew preset).
    ddl_plan: [(fraction_of_stream, ddl_dict), ...] — e.g.
        (0.4, {"action": "add_column", "name": "note", "type": "string",
               "default": ""}).
    """
    base_fp, n_base = generate_base(out_dir, n_convs, turns_per_conv, seed)
    rng = np.random.default_rng(np.random.PCG64(seed + 1))
    n = n_changes

    # --- keys (Zipf-ish skew + optional hot key) ---
    zipf_w = 1.0 / np.arange(1, n_convs + 1) ** 0.8
    zipf_w /= zipf_w.sum()
    conv = rng.choice(n_convs, size=n, p=zipf_w)
    if hot_key_frac > 0:
        conv[rng.random(n) < hot_key_frac] = 0
    max_turn = max(turns_per_conv * 2, 4)
    turn = rng.integers(0, max_turn, n).astype("int32")

    # --- ops: 55% U, 30% I, 15% D ---
    r = rng.random(n)
    op = np.where(r < 0.55, "U", np.where(r < 0.85, "I", "D"))

    # --- commit_ts: monotone with ties → multi-row txns ---
    gaps = (rng.random(n) >= ts_tie_prob).astype(np.int64)
    gaps[0] = 1
    commit_ts = 1000 + np.cumsum(gaps)
    start_ts = commit_ts - 1
    max_ts = int(commit_ts[-1])

    # --- DDLs: registry evolution at stream fractions ---
    registry = SchemaRegistry.initial()
    ddl_rows = []  # (position, ddl_json, commit_ts, version_after)
    ddl_plan = sorted(ddl_plan or [], key=lambda x: x[0])
    for frac, ddl in ddl_plan:
        pos = min(n - 1, int(frac * n))
        ts_at = int(commit_ts[pos])
        registry.apply_ddl(ddl, ts_at)
        ddl_rows.append((pos, json.dumps(ddl, sort_keys=True), ts_at))

    # --- schema_version per event (as-of commit_ts - 1) ---
    version = np.ones(n, dtype="int32")
    bounds = [(v.active_from_ts, v.version) for v in registry.versions]
    for active_from, ver in bounds[1:]:
        version[commit_ts - 1 >= active_from] = ver

    # --- payloads (only I/U need one) ---
    conv_id = pd.Series([f"conv{c:06d}" for c in conv], dtype="object").to_numpy()
    seq0 = np.arange(n)
    role = ROLES[rng.integers(0, 2, n)]
    text = (
        conv_id
        + pd.Series(turn).astype(str).radd("-t").to_numpy()
        + pd.Series(seq0).astype(str).radd("-s").to_numpy()
    )
    tool = TOOLS[rng.integers(0, 4, n)]
    # numpy datetime64[s] renders ISO-8601 directly — ~10x cheaper than
    # pandas strftime at 10^7+ rows
    ts_iso = (
        np.datetime64("2024-01-01T00:00:00")
        + (commit_ts - 1000).astype("timedelta64[s]")
    ).astype("datetime64[s]").astype(str)

    # extra columns written under evolved schema versions
    payload = np.empty(n, dtype=object)
    for v in registry.versions:
        mask = version == v.version
        if not mask.any():
            continue
        extra = {}
        for f in v.fields:
            if f.fid > 4 and f.name:  # columns added after v1
                extra[f.name] = "x" + pd.Series(seq0[mask]).astype(str).to_numpy()
        # honor renames: field names come from this version's view
        name_map = {f.fid: f.name for f in v.fields}
        has_tool = any(f.fid == 3 for f in v.fields)
        tool_v = tool[mask] if has_tool else np.full(mask.sum(), "")
        p = _payload_json(role[mask], text[mask], tool_v, ts_iso[mask], extra)
        if has_tool and name_map.get(3) != "tool":
            p = pd.Series(p).str.replace('"tool":', f'"{name_map[3]}":', regex=False).to_numpy()
        payload[mask] = p
    payload = np.where(op == "D", None, payload)
    pre_payload = np.where(op == "I", None, payload)  # stand-in pre-image

    df = pd.DataFrame(
        {
            "op": op,
            "commit_ts": commit_ts,
            "start_ts": start_ts,
            "schema_version": version,
            "conv_id": conv_id,
            "turn_idx": turn,
            "payload": payload,
            "pre_payload": pre_payload,
            "ddl": None,
            "partition_hint": (conv % 32).astype("int32"),
        }
    )

    # --- splice in DDL rows and R watermark rows ---
    frames = [df]
    order_hint = [np.full(n, 1, dtype="int8")]  # within equal pos: DML first
    pos_all = [seq0.astype(np.float64)]
    for pos, ddl_json, ts_at in ddl_rows:
        frames.append(
            pd.DataFrame(
                {
                    "op": ["DDL"],
                    "commit_ts": [ts_at],
                    "start_ts": [ts_at - 1],
                    "schema_version": [None],
                    "conv_id": [None],
                    "turn_idx": [None],
                    "payload": [None],
                    "pre_payload": [None],
                    "ddl": [ddl_json],
                    "partition_hint": [None],
                }
            )
        )
        order_hint.append(np.array([2], dtype="int8"))
        pos_all.append(np.array([float(pos)]))
    r_positions = list(range(resolved_every - 1, n, resolved_every))
    if not r_positions or r_positions[-1] != n - 1:
        r_positions.append(n - 1)
    for pos in r_positions:
        # strict resolved-ts contract (cdc/model/kv.go:32): an R at ts B
        # promises NO later event carries commit_ts <= B. commit_ts is
        # monotone, so the largest valid B at stream position p is
        # commit_ts[p+1] - 1 — one less when the next event ties.
        r_ts = int(commit_ts[pos + 1]) - 1 if pos + 1 < n else int(commit_ts[pos])
        frames.append(
            pd.DataFrame(
                {
                    "op": ["R"],
                    "commit_ts": [r_ts],
                    "start_ts": [None],
                    "schema_version": [None],
                    "conv_id": [None],
                    "turn_idx": [None],
                    "payload": [None],
                    "pre_payload": [None],
                    "ddl": [None],
                    "partition_hint": [None],
                }
            )
        )
        order_hint.append(np.array([3], dtype="int8"))  # R after data it covers
        pos_all.append(np.array([float(pos)]))

    out = pd.concat(frames, ignore_index=True)
    out["_pos"] = np.concatenate(pos_all)
    out["_oh"] = np.concatenate(order_hint)
    out = out.sort_values(["_pos", "_oh"], kind="stable").drop(columns=["_pos", "_oh"])
    out.insert(0, "seq", np.arange(len(out), dtype=np.int64))
    out = out.reset_index(drop=True)

    schema = pa.schema(
        [
            ("seq", pa.int64()),
            ("op", pa.string()),
            ("commit_ts", pa.int64()),
            ("start_ts", pa.int64()),
            ("schema_version", pa.int32()),
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("payload", pa.string()),
            ("pre_payload", pa.string()),
            ("ddl", pa.string()),
            ("partition_hint", pa.int32()),
        ]
    )
    table = pa.Table.from_pandas(out, schema=schema, preserve_index=False)
    log_dir = os.path.join(out_dir, "log")
    os.makedirs(log_dir, exist_ok=True)
    if n_files <= 1:
        pq.write_table(table, os.path.join(log_dir, "changefeed-00000.parquet"))
    else:
        step = (len(out) + n_files - 1) // n_files
        for i in range(n_files):
            chunk = table.slice(i * step, step)
            if chunk.num_rows:
                pq.write_table(
                    chunk, os.path.join(log_dir, f"changefeed-{i:05d}.parquet")
                )
    # control sidecar: the R/DDL rows again, under log/_control/ — the
    # underscore prefix keeps it out of the main data scan (Hadoop hides it),
    # and the engine's control-plane reads touch only this tiny file instead
    # of scanning the whole log for a handful of rows (at 10^10 events the
    # full-scan control read would dominate the epoch loop)
    ctl_mask = (out["op"] == "R") | (out["op"] == "DDL")
    ctl = pa.Table.from_pandas(out[ctl_mask], schema=schema, preserve_index=False)
    ctl_dir = os.path.join(log_dir, "_control")
    os.makedirs(ctl_dir, exist_ok=True)
    pq.write_table(ctl, os.path.join(ctl_dir, "control-00000.parquet"))
    # high-watermark for the consumer's staleness check (one listing, no
    # per-file stats; a raw segment appended later makes the count exceed
    # it and read_control falls back to the full scan)
    from tiflow_spark.engine import write_control_coverage

    write_control_coverage(log_dir)
    return GeneratedFeed(
        base_path=base_fp,
        log_path=log_dir,
        registry=registry,
        n_base_rows=n_base,
        n_events=len(out),
        max_commit_ts=max_ts,
    )
