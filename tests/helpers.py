"""Hand-crafted fixture builders + engine↔oracle comparison."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

EVENT_COLS = [
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


def ev(seq, op, cts, conv=None, turn=None, payload=None, ddl=None, start_ts=None, ver=1):
    return {
        "seq": seq,
        "op": op,
        "commit_ts": cts,
        "start_ts": start_ts if start_ts is not None else cts - 1,
        "schema_version": ver if op in ("I", "U") else None,
        "conv_id": conv,
        "turn_idx": turn,
        "payload": json.dumps(payload) if isinstance(payload, dict) else payload,
        "pre_payload": None,
        "ddl": json.dumps(ddl) if isinstance(ddl, dict) else ddl,
        "partition_hint": None,
    }


def pl(text, role="user", tool=None, ts="2024-01-01T00:00:00", **extra):
    d = {"role": role, "text": text, "tool": tool, "ts": ts}
    d.update(extra)
    return d


def write_feed(tmp_path, events, base_rows=None, final_resolved=True):
    """Write base/transcripts.parquet + log/changefeed parquet; returns paths."""
    base_rows = base_rows or []
    base_dir = os.path.join(str(tmp_path), "base")
    log_dir = os.path.join(str(tmp_path), "log")
    os.makedirs(base_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)
    bdf = pd.DataFrame(
        base_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    bdf["turn_idx"] = bdf["turn_idx"].astype("int32") if len(bdf) else bdf["turn_idx"]
    bdf["ts"] = pd.to_datetime(bdf["ts"])
    base_fp = os.path.join(base_dir, "transcripts.parquet")
    pq.write_table(
        pa.Table.from_pandas(bdf, preserve_index=False),
        base_fp,
        coerce_timestamps="us",  # Spark cannot read TIMESTAMP(NANOS)
        allow_truncated_timestamps=True,
    )

    events = list(events)
    if final_resolved:
        max_ts = max(e["commit_ts"] for e in events)
        events.append(ev(10_000_000 + len(events), "R", max_ts))
    schema = pa.schema(EVENT_COLS)
    table = pa.Table.from_pylist(events, schema=schema)
    pq.write_table(table, os.path.join(log_dir, "changefeed-00000.parquet"))
    return base_fp, log_dir


def normalize_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Canonical form for comparison: sorted by key, None-normalized nulls,
    second-resolution timestamps as ISO strings."""
    out = pdf.copy()
    for c in out.columns:
        if pd.api.types.is_datetime64_any_dtype(out[c]):
            out[c] = out[c].dt.strftime("%Y-%m-%dT%H:%M:%S")
    out = out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return out.astype(object).where(pd.notnull(out), None)


def assert_tables_equal(actual: pd.DataFrame, expected: pd.DataFrame):
    a, e = normalize_pdf(actual), normalize_pdf(expected)
    assert list(a.columns) == list(e.columns), f"{list(a.columns)} != {list(e.columns)}"
    assert len(a) == len(e), f"row count {len(a)} != {len(e)}"
    pd.testing.assert_frame_equal(a, e, check_dtype=False)
