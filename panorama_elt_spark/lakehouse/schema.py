"""Field-id based table schema with catalog-diff evolution.

Reimagines the reference's externally-declared YAML schema registry
(``panorama_openedx_settings_example.yaml:66-446``, loaded at
``mysql_datasource.py:92-106``) as a versioned, field-id-addressed
schema: columns are identified by a stable integer id, so *rename* is a
metadata-only operation (like Iceberg), *add* backfills a constant
(the reference's ``value:`` constant-column mechanism,
``mysql_datasource.py:194-202``), and *widen* is a safe type promotion.

``diff_schemas`` is the catalog-diff step of SURVEY.md §7.2(6): given
the table's current schema and the incoming batch's declared schema, it
emits the exact ALTER operations to apply before the batch.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

from pyspark.sql import types as T

_SPARK_TYPES: dict[str, T.DataType] = {
    "int": T.IntegerType(),
    "bigint": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "binary": T.BinaryType(),
}

# legal widening promotions (Iceberg-compatible set)
_WIDENS: set[tuple[str, str]] = {
    ("int", "bigint"),
    ("float", "double"),
    ("int", "double"),
}


def spark_type(name: str) -> T.DataType:
    if name.startswith("array<") and name.endswith(">"):
        return T.ArrayType(spark_type(name[6:-1]))
    if name.startswith("decimal"):
        return T._parse_datatype_string(name)
    return _SPARK_TYPES[name]


@dataclass(frozen=True)
class Field:
    id: int
    name: str
    type: str  # lowercase DDL type name
    nullable: bool = True
    default: object = None  # backfill literal for rows predating the column

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "name": self.name,
            "type": self.type,
            "nullable": self.nullable,
            "default": self.default,
        }

    @staticmethod
    def from_dict(d: dict) -> "Field":
        return Field(d["id"], d["name"], d["type"], d.get("nullable", True), d.get("default"))


@dataclass
class TableSchema:
    fields: list[Field]
    schema_version: int = 1

    def to_struct(self) -> T.StructType:
        return T.StructType(
            [T.StructField(f.name, spark_type(f.type), f.nullable) for f in self.fields]
        )

    @property
    def names(self) -> list[str]:
        return [f.name for f in self.fields]

    def field_by_id(self, fid: int) -> Field | None:
        return next((f for f in self.fields if f.id == fid), None)

    def field_by_name(self, name: str) -> Field | None:
        return next((f for f in self.fields if f.name == name), None)

    def to_dict(self) -> dict:
        return {
            "schema_version": self.schema_version,
            "fields": [f.to_dict() for f in self.fields],
        }

    @staticmethod
    def from_dict(d: dict) -> "TableSchema":
        return TableSchema(
            [Field.from_dict(f) for f in d["fields"]], d.get("schema_version", 1)
        )


@dataclass(frozen=True)
class AddColumn:
    field: Field

    def describe(self) -> str:
        return f"ALTER TABLE ADD COLUMN {self.field.name} {self.field.type} DEFAULT {self.field.default!r}"


@dataclass(frozen=True)
class WidenColumn:
    field_id: int
    old_type: str
    new_type: str

    def describe(self) -> str:
        return f"ALTER TABLE ALTER COLUMN id={self.field_id} TYPE {self.old_type} -> {self.new_type}"


@dataclass(frozen=True)
class RenameColumn:
    field_id: int
    old_name: str
    new_name: str

    def describe(self) -> str:
        return f"ALTER TABLE RENAME COLUMN {self.old_name} -> {self.new_name}"


AlterOp = AddColumn | WidenColumn | RenameColumn


class SchemaEvolutionError(ValueError):
    pass


def diff_schemas(current: TableSchema, target: TableSchema) -> list[AlterOp]:
    """Catalog diff: ALTER ops turning ``current`` into ``target``.

    Matching is by field id (rename-safe). Only add / widen / rename are
    legal; drops or narrowings raise (mirroring the reference, which only
    ever grows its YAML-declared column list — CHANGELOG.md "0.1.5").
    """
    ops: list[AlterOp] = []
    cur_by_id = {f.id: f for f in current.fields}
    for tgt in target.fields:
        cur = cur_by_id.pop(tgt.id, None)
        if cur is None:
            ops.append(AddColumn(tgt))
            continue
        if cur.name != tgt.name:
            ops.append(RenameColumn(tgt.id, cur.name, tgt.name))
        if cur.type != tgt.type:
            if (cur.type, tgt.type) in _WIDENS:
                ops.append(WidenColumn(tgt.id, cur.type, tgt.type))
            else:
                raise SchemaEvolutionError(
                    f"illegal type change for field id={tgt.id}: {cur.type} -> {tgt.type}"
                )
    if cur_by_id:
        raise SchemaEvolutionError(
            f"dropping columns is not supported: {sorted(f.name for f in cur_by_id.values())}"
        )
    return ops


def apply_alters(schema: TableSchema, ops: list[AlterOp], new_version: int) -> TableSchema:
    fields = list(schema.fields)
    for op in ops:
        if isinstance(op, AddColumn):
            fields.append(op.field)
        elif isinstance(op, RenameColumn):
            fields = [
                Field(f.id, op.new_name, f.type, f.nullable, f.default) if f.id == op.field_id else f
                for f in fields
            ]
        elif isinstance(op, WidenColumn):
            fields = [
                Field(f.id, f.name, op.new_type, f.nullable, f.default) if f.id == op.field_id else f
                for f in fields
            ]
    return TableSchema(fields, new_version)
