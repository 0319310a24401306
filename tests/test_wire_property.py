"""Property-based round-trips for the binary MQ wire codecs: arbitrary
unicode payloads and boundary integers through JVM-expression encode →
Python decode must survive byte-exactly. Catches the class of bug the
octet-length fix closed (char-vs-byte framing) for inputs no fixture
enumerates."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# printable-ish unicode incl. multi-byte planes; no surrogates (invalid UTF-8)
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=1),
    min_size=0, max_size=80,
)
_event = st.tuples(
    st.integers(min_value=0, max_value=2**40),          # seq
    st.sampled_from(["I", "U", "D"]),                   # op
    st.integers(min_value=0, max_value=2**42),          # commit_ts
    st.one_of(st.none(), st.integers(min_value=0, max_value=2**42)),  # start_ts
    st.one_of(st.none(), st.integers(min_value=0, max_value=1000)),   # schema_v
    _text.filter(lambda s: len(s) > 0),                 # conv_id (non-null)
    st.integers(min_value=0, max_value=2**31 - 1),      # turn_idx
    st.one_of(st.none(), _text),                        # payload
    st.one_of(st.none(), _text),                        # pre_payload
    st.one_of(st.none(), _text.filter(lambda s: len(s) > 0)),  # tbl
)

_SCHEMA = (
    "seq long, op string, commit_ts long, start_ts long, schema_version int, "
    "conv_id string, turn_idx int, payload string, pre_payload string, "
    "ddl string, partition_hint int, tbl string"
)


def _df(spark, events):
    rows = [(s, op, cts, sts, sv, cid, ti, p, pp, None, None, tbl)
            for (s, op, cts, sts, sv, cid, ti, p, pp, tbl) in events]
    return spark.createDataFrame(rows, _SCHEMA)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(_event, min_size=1, max_size=12))
def test_avro_wire_property(spark, events):
    from tiflow_spark.sinks.mq import _avro_parse_row, avro_envelope

    out = _df(spark, events).withColumn("w", avro_envelope()).collect()
    for r, want in zip(out, events):
        got = _avro_parse_row(r["w"])
        assert got[:9] == want[:9]          # full envelope on the avro wire
        assert got[11] == want[9]           # tbl


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(_event, min_size=1, max_size=8))
def test_canal_pb_wire_property(spark, events):
    from tiflow_spark.sinks.mq import _canal_pb_parse_row, canal_pb_envelope

    # model invariant: a DELETE has no post-image — the canal wire routes a
    # delete's image into beforeColumns ONLY (canal.go buildRowData), so a
    # degenerate D-with-payload has no slot on the wire by design
    events = [e[:7] + (None if e[1] == "D" else e[7],) + e[8:] for e in events]
    out = canal_pb_envelope()(_df(spark, events)).collect()
    for r, want in zip(out, events):
        (seq, op, cts, sts, sv, cid, ti, p, pp, _d, _h, tbl) = \
            _canal_pb_parse_row(r["envelope"])
        assert (op, cts, cid, ti, p, pp) == (
            want[1], want[2], want[5], want[6], want[7], want[8])
        assert tbl == (want[9] or "transcripts")


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=st.lists(_event, min_size=1, max_size=8))
def test_craft_wire_property(spark, events):
    from tiflow_spark.sinks.mq import _craft_parse_row, craft_envelope

    out = craft_envelope()(_df(spark, events)).collect()
    for r, want in zip(out, events):
        (seq, op, cts, sts, sv, cid, ti, p, pp, _d, _h, tbl) = \
            _craft_parse_row(r["envelope"])
        assert (op, cts, cid, ti, p, pp) == (
            want[1], want[2], want[5], want[6], want[7], want[8])
        assert tbl == (want[9] or "transcripts")
