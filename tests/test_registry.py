"""Schema registry: DDL replay, as-of lookup, field-id projection.

Mirrors cdc/entry/schema_storage_test.go behaviors (snapshot list, binary
search at ts, DDL mutation) and the commit_ts-1 decode rule
(cdc/entry/mounter.go:201-203).
"""

import pytest

from tiflow_spark.registry import SchemaRegistry


def _evolved():
    r = SchemaRegistry.initial()
    r.apply_ddl({"action": "add_column", "name": "note", "type": "string", "default": ""}, 100)
    r.apply_ddl({"action": "rename_column", "name": "tool", "new_name": "tool_name"}, 200)
    r.apply_ddl({"action": "drop_column", "name": "role"}, 300)
    return r


def test_initial_fields():
    r = SchemaRegistry.initial()
    assert r.current.names() == ["role", "text", "tool", "ts"]
    assert r.current.version == 1


def test_ddl_replay_versions():
    r = _evolved()
    assert [v.version for v in r.versions] == [1, 2, 3, 4]
    assert r.get(2).names() == ["role", "text", "tool", "ts", "note"]
    assert r.get(3).names() == ["role", "text", "tool_name", "ts", "note"]
    assert r.get(4).names() == ["text", "tool_name", "ts", "note"]


def test_asof_uses_ts_minus_one():
    """A DML sharing the DDL's commit_ts decodes with the PRE-DDL schema."""
    r = _evolved()
    assert r.version_asof(100).version == 1  # at DDL ts → pre-DDL
    assert r.version_asof(101).version == 2  # one past → post-DDL
    assert r.version_asof(99).version == 1
    assert r.version_asof(10_000).version == 4


def test_version_at_barrier():
    r = _evolved()
    assert r.version_at_barrier(100).version == 2  # DDL at barrier included
    assert r.version_at_barrier(99).version == 1


def test_projection_rename_keeps_field_id():
    r = _evolved()
    proj = dict((d, (s, df)) for d, s, df in r.projection(1, 4))
    assert proj["tool_name"] == ("tool", None)  # rename resolved by field id
    assert proj["note"] == (None, "")  # added later → default
    assert proj["text"] == ("text", None)


def test_roundtrip_json():
    r = _evolved()
    r2 = SchemaRegistry.from_json(r.to_json())
    assert r2.to_json() == r.to_json()
    assert r2.current.names() == r.current.names()


def test_ddl_errors():
    r = SchemaRegistry.initial()
    with pytest.raises(ValueError):
        r.apply_ddl({"action": "drop_column", "name": "nope"}, 10)
    with pytest.raises(ValueError):
        r.apply_ddl({"action": "add_column", "name": "text"}, 10)
    with pytest.raises(ValueError):
        r.apply_ddl({"action": "rename_column", "name": "nope", "new_name": "x"}, 10)
