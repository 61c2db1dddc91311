"""Core data model: change operations and the audit (change-log) schema.

The reference's central structure is the per-table ``{table}_cdc`` audit
table (reference: cdc_system.py:103, DDL at cdc_system.py:115-126):

    cdc_id INTEGER PK AUTOINCREMENT, operation TEXT, record_id INTEGER,
    old_data TEXT(json), new_data TEXT(json),
    changed_at TIMESTAMP DEFAULT now, synced INTEGER 0/1,
    sync_timestamp TIMESTAMP

Here the same log is a DataFrame with this exact schema; ``old_data`` /
``new_data`` stay JSON strings at the ingest boundary and are decoded to
typed structs with ``from_json`` against a caller-declared StructType
(never schemaless maps — keeps Catalyst column pruning effective,
SURVEY.md §1.3).
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class ChangeOp(str, Enum):
    """Change operation (reference: cdc_system.py:25-29)."""

    INSERT = "INSERT"
    UPDATE = "UPDATE"
    DELETE = "DELETE"


#: Audit-log schema — mirrors the reference DDL (cdc_system.py:115-126).
#: ``synced`` is Boolean-as-int there; a real boolean here (SURVEY §1.2).
AUDIT_SCHEMA = T.StructType(
    [
        T.StructField("cdc_id", T.LongType(), False),
        T.StructField("operation", T.StringType(), False),
        T.StructField("record_id", T.LongType(), True),
        T.StructField("old_data", T.StringType(), True),
        T.StructField("new_data", T.StringType(), True),
        T.StructField("changed_at", T.TimestampType(), True),
        T.StructField("synced", T.BooleanType(), False),
        T.StructField("sync_timestamp", T.TimestampType(), True),
    ]
)

AUDIT_COLUMNS = [f.name for f in AUDIT_SCHEMA.fields]


class SchemaRegistry:
    """Caller-declared tracked-table schemas (SURVEY §1.3).

    The reference takes an explicit column list in
    ``setup_trigger_based_cdc(columns)`` (cdc_system.py:105-141) and
    assumes ``columns[0]`` is the key while the apply side hardcodes
    ``id`` (cdc_system.py:334-350). Here the key is an explicit,
    consistent parameter with default ``"id"``.
    """

    def __init__(self) -> None:
        self._schemas: dict[str, T.StructType] = {}
        self._keys: dict[str, str] = {}

    def register(self, table: str, schema: T.StructType, key: str | None = None) -> None:
        self._schemas[table] = schema
        self._keys[table] = key or schema.fields[0].name

    def schema(self, table: str) -> T.StructType:
        return self._schemas[table]

    def evolve(self, table: str, new_schema: T.StructType) -> None:
        """Additive-only schema evolution (the lake-format contract:
        Delta/Iceberg ``mergeSchema`` allows new nullable columns,
        never drops or type changes — those need a rewrite).

        Old change-log entries carry JSON row images, so they decode
        under the evolved schema with nulls for the new columns; no log
        rewrite, no backfill. Raises on drops or type changes, which
        would silently corrupt history.
        """
        old = self._schemas[table]
        new_fields = {f.name: f for f in new_schema.fields}
        for f in old.fields:
            nf = new_fields.get(f.name)
            if nf is None:
                raise ValueError(
                    f"schema evolution cannot drop column {f.name!r}"
                )
            if nf.dataType != f.dataType:
                raise ValueError(
                    f"schema evolution cannot change {f.name!r}: "
                    f"{f.dataType.simpleString()} -> {nf.dataType.simpleString()}"
                )
        for name in set(new_fields) - {f.name for f in old.fields}:
            if not new_fields[name].nullable:
                raise ValueError(
                    f"new column {name!r} must be nullable (existing rows "
                    "have no value for it)"
                )
        self._schemas[table] = new_schema

    def key(self, table: str) -> str:
        return self._keys[table]

    def __contains__(self, table: str) -> bool:
        return table in self._schemas
