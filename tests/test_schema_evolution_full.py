"""FIXTURES.md §4: add / widen / rename variants through the engine,
with mixed-version batches and old-file readability after each ALTER."""

from pyspark.sql import functions as F

from panorama_elt_spark.cdc import CdcEngine
from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema

V1 = TableSchema(
    [
        Field(1, "repo", "string", False),
        Field(2, "path", "string", False),
        Field(3, "commit", "string"),
        Field(4, "lang", "string"),
        Field(5, "content", "string"),
    ],
    schema_version=1,
)
# add: stars int default 0
V2 = TableSchema(V1.fields + [Field(6, "stars", "int", default=0)], schema_version=2)
# widen stars → bigint AND rename lang → language (field id 4 stable)
V3 = TableSchema(
    [
        Field(1, "repo", "string", False),
        Field(2, "path", "string", False),
        Field(3, "commit", "string"),
        Field(4, "language", "string"),
        Field(5, "content", "string"),
        Field(6, "stars", "bigint", default=0),
    ],
    schema_version=3,
)

REGISTRY = {1: V1, 2: V2, 3: V3}

LOG_SCHEMA = (
    "lsn bigint, op string, repo string, path string, commit string, "
    "lang string, language string, content string, stars bigint, schema_version int"
)


def _log(spark, rows):
    return spark.createDataFrame(rows, LOG_SCHEMA)


def test_add_widen_rename_through_replay(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), V1, ["repo", "path"], n_buckets=4)
    engine = CdcEngine(t, schema_registry=REGISTRY)

    # batch 0: v1 events (no stars, column named lang)
    engine.apply_batch(
        _log(spark, [
            (0, "I", "o/r", "a.py", "c0", "py", None, "A0", None, 1),
            (1, "I", "o/r", "b.py", "c1", "md", None, "B0", None, 1),
        ]),
        "b0",
    )
    assert t.snapshot.schema.schema_version == 1

    # batch 1: v2 arrives (stars int) → ALTER ADD lands first
    engine.apply_batch(
        _log(spark, [
            (2, "U", "o/r", "a.py", "c2", "py", None, "A1", 7, 2),
        ]),
        "b1",
    )
    assert t.snapshot.schema.schema_version == 2
    rows = {r["path"]: r.asDict() for r in t.read().collect()}
    assert rows["a.py"]["stars"] == 7
    assert rows["b.py"]["stars"] == 0  # backfilled default on v1-written file

    # batch 2: v3 (rename lang→language, widen stars→bigint), mixed with a
    # late v1 event for a new key — conform maps it through old names
    engine.apply_batch(
        _log(spark, [
            (3, "I", "o/r", "c.py", "c3", None, "sql", "C0", 2**40, 3),
            (4, "I", "o/r", "d.py", "c4", "yaml", None, "D0", None, 1),
        ]),
        "b2",
    )
    snap = t.snapshot
    assert snap.schema.schema_version == 3
    assert snap.schema.field_by_name("language").id == 4
    assert snap.schema.field_by_name("stars").type == "bigint"
    rows = {r["path"]: r.asDict() for r in t.read().collect()}
    assert set(t.read().columns) == {"repo", "path", "commit", "language", "content", "stars"}
    # v1-written rows surface under the renamed column
    assert rows["b.py"]["language"] == "md"
    assert rows["d.py"]["language"] == "yaml"
    # widened value survives
    assert rows["c.py"]["stars"] == 2**40
    # all four keys present
    assert len(rows) == 4


def test_alter_is_metadata_only(spark, tmp_path):
    """No data files are rewritten by an ALTER."""
    t = LakeTable.create(spark, str(tmp_path / "t"), V1, ["repo", "path"], n_buckets=4)
    engine = CdcEngine(t, schema_registry=REGISTRY)
    engine.apply_batch(
        _log(spark, [(0, "I", "o/r", "a.py", "c0", "py", None, "A0", None, 1)]), "b0"
    )
    files_before = {f.path for f in t.snapshot.files}
    t.alter_schema(V2)
    assert {f.path for f in t.snapshot.files} == files_before
