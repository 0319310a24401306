"""Versioned schema registry with field-id-based evolution.

The reference keeps a sorted list of immutable schema snapshots and resolves
each event against the snapshot at ``commit_ts - 1``
(cdc/entry/schema_storage.go:754-798 ``GetSnapshot``;
cdc/entry/mounter.go:201-203). DM persists a ``table_info JSON`` per
checkpoint (dm/syncer/checkpoint.go:971-981) and replays DDL through a schema
tracker (dm/pkg/schema/tracker.go:85-201).

Here each payload field carries a stable ``field_id`` (the Iceberg idea),
so RENAME COLUMN keeps identity and old rows can be projected onto any later
version with defaults filled for columns added since
(cdc/entry/mounter.go:515-551 fillDefault analogue).

The registry is tiny (one row per DDL); it is always broadcast.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from tiflow_spark.model import CHANGE_EVENT_SCHEMA, KEY_COLS, TRANSCRIPT_V1_FIELDS

# Eligibility guard (F7, cdc/entry/schema_storage.go:346-350 +
# cdc/model/schema_storage.go:307-321): the reference skips tables whose
# key/index structure cannot be replicated safely. Here the key columns are
# an envelope-level contract, so the equivalent hazard is a DDL introducing a
# payload field that shadows a key or envelope column — decode would then
# emit duplicate column names and the MERGE key would be ambiguous.
RESERVED_COLS = frozenset(KEY_COLS) | {f.name for f in CHANGE_EVENT_SCHEMA.fields}


@dataclass(frozen=True)
class Field:
    fid: int
    name: str
    type: str  # spark DDL type string, e.g. "string", "timestamp", "int"
    default: object = None


@dataclass(frozen=True)
class SchemaVersion:
    version: int
    active_from_ts: int  # the DDL's commit_ts; 0 for the initial version
    fields: tuple[Field, ...]
    ddl: str | None = None  # JSON of the DDL that produced this version

    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def struct_ddl(self) -> str:
        return ", ".join(f"`{f.name}` {f.type}" for f in self.fields)


@dataclass
class SchemaRegistry:
    """Sorted list of schema versions; supports as-of lookup and DDL apply.

    As-of rule (cdc/entry/mounter.go:203): an event with commit_ts T decodes
    with the max version whose ``active_from_ts <= T - 1`` — i.e. a DML
    sharing a DDL's commit_ts still uses the pre-DDL schema.
    """

    versions: list[SchemaVersion] = field(default_factory=list)

    # ---- construction ----
    @classmethod
    def initial(cls, fields=None) -> "SchemaRegistry":
        fields = fields or TRANSCRIPT_V1_FIELDS
        v1 = SchemaVersion(
            version=1,
            active_from_ts=0,
            fields=tuple(Field(fid, n, t, d) for fid, n, t, d in fields),
        )
        return cls(versions=[v1])

    # ---- lookup ----
    @property
    def current(self) -> SchemaVersion:
        return self.versions[-1]

    def get(self, version: int) -> SchemaVersion:
        for v in self.versions:
            if v.version == version:
                return v
        raise KeyError(f"schema version {version} not in registry")

    def version_asof(self, commit_ts: int) -> SchemaVersion:
        """Binary-search analogue of schema_storage.go:767-774 at ts-1."""
        best = self.versions[0]
        for v in self.versions:
            if v.active_from_ts <= commit_ts - 1:
                best = v
            else:
                break
        return best

    def version_at_barrier(self, barrier_ts: int) -> SchemaVersion:
        """Latest version whose DDL committed at or before the barrier."""
        best = self.versions[0]
        for v in self.versions:
            if v.active_from_ts <= barrier_ts:
                best = v
        return best

    # ---- DDL replay (schema_storage.go:812-837 HandleDDLJob analogue) ----
    def apply_ddl(self, ddl: dict, commit_ts: int) -> SchemaVersion:
        """Apply one DDL dict {action, name, type?, default?, new_name?}.

        Replicable subset per FIXTURES.md F2 / pkg/filter/filter.go:152-180:
        add_column, drop_column, rename_column.
        """
        cur = self.current
        if commit_ts < cur.active_from_ts:
            raise ValueError(
                f"DDL at ts {commit_ts} older than current version "
                f"({cur.active_from_ts}) — DDL stream must be ordered"
            )
        action = ddl["action"]
        fields = list(cur.fields)
        new_name = ddl.get("new_name") if action == "rename_column" else (
            ddl.get("name") if action == "add_column" else None
        )
        if new_name is not None and new_name in RESERVED_COLS:
            raise ValueError(
                f"{action}: '{new_name}' shadows a key/envelope column — "
                "table would become ineligible for replication (F7)"
            )
        if action == "add_column":
            if any(f.name == ddl["name"] for f in fields):
                raise ValueError(f"add_column: {ddl['name']} already exists")
            next_fid = max(f.fid for f in fields) + 1
            fields.append(
                Field(next_fid, ddl["name"], ddl.get("type", "string"), ddl.get("default"))
            )
        elif action == "drop_column":
            before = len(fields)
            fields = [f for f in fields if f.name != ddl["name"]]
            if len(fields) == before:
                raise ValueError(f"drop_column: {ddl['name']} not found")
        elif action == "rename_column":
            out = []
            found = False
            for f in fields:
                if f.name == ddl["name"]:
                    out.append(Field(f.fid, ddl["new_name"], f.type, f.default))
                    found = True
                else:
                    out.append(f)
            if not found:
                raise ValueError(f"rename_column: {ddl['name']} not found")
            fields = out
        elif action == "modify_column":
            # type change, identity (fid/name) kept — the default branch of
            # the reference's DDL switch (cdc/entry/schema_storage.go:637-652).
            # Old data files / old-version payloads are CAST to the new type
            # at read/decode time (metadata-only, like every other ALTER).
            out = []
            found = False
            for f in fields:
                if f.name == ddl["name"]:
                    out.append(
                        Field(f.fid, f.name, ddl["type"], ddl.get("default", f.default))
                    )
                    found = True
                else:
                    out.append(f)
            if not found:
                raise ValueError(f"modify_column: {ddl['name']} not found")
            fields = out
        elif action == "truncate_table":
            # tombstone: rows wiped at the truncate's commit_ts, schema kept
            # (cdc/entry/schema_storage.go:619-631 drops the old table id and
            # re-creates it empty). Recorded as a version bump with unchanged
            # fields so the DDL history / as-of timeline stays complete; the
            # engine wipes data when it sees the action.
            pass
        elif action == "add_partition":
            # metadata-only (cdc/entry/schema_storage.go:632-636 swaps
            # physical partition ids under the logical table; downstream the
            # new range simply starts accepting rows). Version bump keeps the
            # DDL history complete; no data effect.
            pass
        elif action in ("drop_partition", "truncate_partition"):
            # partial tombstone: rows in the partition are wiped at the DDL's
            # commit_ts, schema kept. The partition is identified by a SQL
            # predicate over the KEY columns ({"where": "turn_idx >= 8"}) —
            # faithful to the source system's rule that partitioning columns
            # must be part of every unique key, and evaluable on the log
            # envelope without decoding payloads. The engine applies the cut.
            if not ddl.get("where") or not isinstance(ddl["where"], str):
                raise ValueError(
                    f"{action}: requires a non-empty 'where' predicate over "
                    "the key columns identifying the partition"
                )
        else:
            raise ValueError(f"unsupported DDL action: {action}")
        nv = SchemaVersion(
            version=cur.version + 1,
            active_from_ts=commit_ts,
            fields=tuple(fields),
            ddl=json.dumps(ddl, sort_keys=True),
        )
        self.versions.append(nv)
        return nv

    # ---- projection maps ----
    def projection(self, src_version: int, dst_version: int) -> list[tuple[str, str | None, object]]:
        """For each dst field: (dst_name, src_name or None, default).

        src_name is the field's name in src_version if the field existed
        there (matched by field_id — survives renames); None means the field
        was added after src_version and the default applies.
        """
        src = self.get(src_version)
        dst = self.get(dst_version)
        src_by_fid = {f.fid: f for f in src.fields}
        out = []
        for f in dst.fields:
            s = src_by_fid.get(f.fid)
            out.append((f.name, s.name if s else None, f.default))
        return out

    # ---- (de)serialization ----
    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "version": v.version,
                    "active_from_ts": v.active_from_ts,
                    "ddl": v.ddl,
                    "fields": [
                        {"fid": f.fid, "name": f.name, "type": f.type, "default": f.default}
                        for f in v.fields
                    ],
                }
                for v in self.versions
            ]
        )

    @classmethod
    def from_json(cls, s: str) -> "SchemaRegistry":
        raw = json.loads(s)
        versions = [
            SchemaVersion(
                version=v["version"],
                active_from_ts=v["active_from_ts"],
                ddl=v.get("ddl"),
                fields=tuple(
                    Field(f["fid"], f["name"], f["type"], f.get("default"))
                    for f in v["fields"]
                ),
            )
            for v in raw
        ]
        return cls(versions=versions)


class ShardDDLConflict(Exception):
    """Incompatible shard DDLs against the joint schema (DM optimist's
    conflict state, dm/master/shardddl/optimist.go — two upstream shards
    asked for schemas that cannot coexist). Raised loudly instead of
    applying either; resolution is operator-driven, as in the reference."""


def reconcile_shard_ddl(registry: SchemaRegistry, ddl: dict) -> str:
    """Optimist-mode shard-DDL coordination (D3/D4 sliver;
    dm/master/shardddl/optimist.go + dm/pkg/shardddl/optimism): in a
    shard-merge task every upstream shard replays ITS copy of each DDL, so
    the same logical statement arrives once per shard. Against the joint
    (downstream) schema each arrival resolves to one of:

    - ``"apply"`` — first arrival, evolves the joint schema;
    - ``"noop"``  — an already-absorbed DDL (add of an identical existing
      column, drop of an already-dropped column, rename whose target name
      already exists, modify to the already-current type) — the lagging
      shard catches up without touching the schema, exactly optimist's
      no-op lock resolution;
    - ``ShardDDLConflict`` — schemas that cannot coexist (same column name
      added with different types, rename colliding with a live column,
      modify of a column no shard still has).

    Identical-DDL matching is structural (name/type/default), not textual —
    shards may render the same statement differently. A later modify to a
    NEW type is applied (ordered single-log evolution), only the identical
    re-arrival dedupes; table-wide ops (truncate, partition cuts) stay
    global per the D6 shard-merge contract. Divergent-window decode — a
    lagging shard's pre-DDL events under the evolved joint schema — needs
    no coordination here: events resolve as-of their commit_ts and missing
    fields take the column default (engine.decode_events)."""
    cur = registry.current
    a = ddl.get("action")
    names = {f.name: f for f in cur.fields}
    if a == "add_column":
        f = names.get(ddl["name"])
        if f is None:
            return "apply"
        want_type = ddl.get("type", "string")
        want_default = ddl.get("default")
        if f.type == want_type and (want_default is None
                                    or f.default == want_default):
            return "noop"
        raise ShardDDLConflict(
            f"add_column {ddl['name']}: joint schema already has "
            f"({f.type}, default {f.default!r}) but a shard asked for "
            f"({want_type}, default {want_default!r})"
        )
    if a == "drop_column":
        return "apply" if ddl["name"] in names else "noop"
    if a == "rename_column":
        old, new = ddl["name"], ddl.get("new_name")
        if old in names:
            if new in names:
                raise ShardDDLConflict(
                    f"rename_column {old}->{new}: target name is a live "
                    "column in the joint schema"
                )
            return "apply"
        if new in names:
            return "noop"  # another shard already renamed it
        raise ShardDDLConflict(
            f"rename_column {old}->{new}: neither name exists in the "
            "joint schema"
        )
    if a == "modify_column":
        f = names.get(ddl["name"])
        if f is None:
            raise ShardDDLConflict(
                f"modify_column {ddl['name']}: column not in joint schema"
            )
        if (f.type == ddl.get("type")
                and ddl.get("default", f.default) == f.default):
            return "noop"
        return "apply"
    return "apply"
