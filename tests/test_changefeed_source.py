"""Change feed through the ``panorama`` data source.

Contract: the batch feed (``.option("changes_from", v)``) is row-equal
to ``LakeTable.changes`` on every path it has — merge-on-read fast
path, full state diff, range-to-current, across a schema epoch — and
the streaming feed (``readStream`` + ``change_feed=true``) emits each
version range exactly once across checkpointed restarts.
"""

import os

import pytest

from panorama_elt_spark.cdc.merge import merge_batch
from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema
from panorama_elt_spark.lakehouse.schema import apply_alters, diff_schemas
from panorama_elt_spark.sources.panorama_datasource import PanoramaDataSource

SCHEMA = TableSchema(
    [Field(1, "repo", "string"), Field(2, "path", "string"), Field(3, "content", "string")],
    schema_version=1,
)


def _cdc(spark, rows):
    return spark.createDataFrame(
        rows, "lsn long, op string, repo string, path string, content string"
    )


def _sorted(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(PanoramaDataSource)
    return spark


@pytest.fixture()
def table(registered, spark, tmp_path):
    """Seed (CoW) then a two-batch MOR delta train covering every feed
    case: update chain, no-op update, delete, ghost delete, insert."""
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4)
    merge_batch(
        t,
        _cdc(spark, [(i, "I", "r", f"k{i}", f"v{i}") for i in range(6)]),
        batch_id="seed",
    )
    merge_batch(
        t,
        _cdc(
            spark,
            [
                (10, "U", "r", "k1", "v1b"),
                (11, "U", "r", "k2", "v2"),  # no-op update -> no row
                (12, "D", "r", "k3", None),
                (13, "D", "r", "ghost", None),  # never existed -> no row
            ],
        ),
        batch_id="d1",
        strategy="append_delta",
    )
    merge_batch(
        t,
        _cdc(spark, [(20, "U", "r", "k1", "v1c"), (21, "I", "r", "k9", "v9")]),
        batch_id="d2",
        strategy="append_delta",
    )
    return t


def _feed(spark, root, v_from, v_to=None):
    r = spark.read.format("panorama").option("changes_from", v_from)
    if v_to is not None:
        r = r.option("changes_to", v_to)
    return r.load(root)


def test_batch_feed_mor_parity(registered, spark, table):
    v0, v1 = 1, table.snapshot.version
    assert table.snapshot.delta_buckets()  # range really is MOR
    feed = _feed(spark, table.root, v0, v1)
    exp = table.changes(v0, v1)
    assert feed.columns == exp.columns
    assert _sorted(feed) == _sorted(exp)


def test_batch_feed_diff_parity_and_to_current(registered, spark, table):
    v1 = table.snapshot.version
    table.compact()  # rewrite => the next range takes the diff path
    merge_batch(
        table,
        _cdc(spark, [(30, "U", "r", "k1", "v1d"), (31, "D", "r", "k9", None)]),
        batch_id="d3",
    )
    v2 = table.snapshot.version
    assert _sorted(_feed(spark, table.root, v1, v2)) == _sorted(table.changes(v1, v2))
    # default changes_to = current snapshot
    assert _sorted(_feed(spark, table.root, 1)) == _sorted(table.changes(1))


def test_batch_feed_empty_range(registered, spark, table):
    v = table.snapshot.version
    assert _feed(spark, table.root, v, v).count() == 0


def test_batch_feed_across_schema_epoch(registered, spark, table):
    v1 = table.snapshot.version
    v2_schema = TableSchema(
        [
            Field(1, "repo", "string"),
            Field(2, "path", "string"),
            Field(3, "content", "string"),
            Field(4, "stars", "bigint", True, 0),
        ],
        schema_version=2,
    )
    table.alter_schema(apply_alters(SCHEMA, diff_schemas(SCHEMA, v2_schema), 2))
    merge_batch(
        table,
        spark.createDataFrame(
            [(40, "U", "r", "k1", "v1e", 5)],
            "lsn long, op string, repo string, path string, content string, stars long",
        ),
        batch_id="d4",
    )
    v3 = table.snapshot.version
    feed = _feed(spark, table.root, v1, v3)
    exp = table.changes(v1, v3)
    assert feed.columns == exp.columns  # projected onto the newer schema
    assert _sorted(feed) == _sorted(exp)


def test_stream_feed_exactly_once_across_restarts(registered, spark, table, tmp_path):
    v0 = 1
    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")

    def drain():
        q = (
            spark.readStream.format("panorama")
            .option("change_feed", "true")
            .option("starting_version", v0)
            .load(table.root)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    drain()
    r1 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert _sorted(table.changes(v0)) == r1
    # new commit -> the next drain emits ONLY the new range
    merge_batch(
        table,
        _cdc(spark, [(50, "U", "r", "k9", "v9b"), (51, "I", "r", "k10", "v10")]),
        batch_id="d5",
    )
    v_mid = table.snapshot.version
    drain()
    r2 = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert len(r2) == len(r1) + 2
    # nothing new -> idempotent drain
    drain()
    assert sorted(map(tuple, spark.read.parquet(out).collect())) == r2
    assert v_mid == table.snapshot.version


def test_stream_requires_change_feed_option(registered, spark, table, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    q = (
        spark.readStream.format("panorama")
        .load(table.root)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="change_feed"):
        q.awaitTermination(120)
