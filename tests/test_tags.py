"""Named snapshot tags (the Iceberg tag shape): a stable name for a
version, protection against expire_snapshots + vacuum, and the read
surface — library ``read(ref=)``, data source ``.option("ref", ...)``,
CLI ``tag``/``refs``."""

import json
import subprocess
import sys

import pytest

from panorama_elt_spark.cdc import CdcEngine, ChangeLogSpec, generate_change_log
from panorama_elt_spark.lakehouse import LakeTable
from tests.test_cdc_core import REPO_SCHEMA_V1 as SCHEMA


def _state(df):
    return sorted((r["repo"], r["path"], r["commit"]) for r in df.collect())


def _make(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=4
    )
    log = generate_change_log(spark, ChangeLogSpec(n_events=4000, n_keys=400))
    CdcEngine(t).replay(log, batch_size=1000)  # 4 merge commits
    return t


def test_tag_read_and_move(spark, tmp_path):
    t = _make(spark, tmp_path)
    cur = t.snapshot.version
    t.tag("audit", cur - 2)
    t.tag("release")  # defaults to current
    assert t.refs() == {"audit": cur - 2, "release": cur}
    assert _state(t.read(ref="audit")) == _state(t.read(version=cur - 2))
    assert _state(t.read(ref="release")) == _state(t.read())
    t.tag("audit", cur - 1)  # move
    assert t.refs()["audit"] == cur - 1
    with pytest.raises(KeyError):
        t.read(ref="nope")
    with pytest.raises(ValueError):
        t.read(ref="audit", version=1)
    with pytest.raises(ValueError):
        t.tag("bad/name")
    with pytest.raises(FileNotFoundError):
        t.tag("ghost", version=cur + 99)


def test_tag_protects_from_expire_and_vacuum(spark, tmp_path):
    t = _make(spark, tmp_path)
    cur = t.snapshot.version
    pinned = cur - 3
    want = _state(t.read(version=pinned))
    t.tag("keep", pinned)
    t.expire_snapshots(keep_last=1)
    t.vacuum()
    # every untagged old version is gone, the tagged one still reads
    assert _state(t.read(ref="keep")) == want
    with pytest.raises(FileNotFoundError):
        t.read(version=pinned + 1)
    # drop the tag: the next expire+vacuum reaps it
    t.drop_tag("keep")
    t.expire_snapshots(keep_last=1)
    t.vacuum()
    with pytest.raises(FileNotFoundError):
        t.read(version=pinned)
    assert t.read().count() > 0  # current state intact throughout


def test_tag_through_datasource(spark, tmp_path):
    from panorama_elt_spark.catalog import register_data_source

    t = _make(spark, tmp_path)
    cur = t.snapshot.version
    t.tag("audit", cur - 2)
    register_data_source(spark)
    via_ref = spark.read.format("panorama").option("ref", "audit").load(t.root)
    assert _state(via_ref) == _state(t.read(version=cur - 2))


def test_tag_cli(spark, tmp_path):
    t = _make(spark, tmp_path)

    def run(*argv):
        out = subprocess.run(
            [sys.executable, "-m", "panorama_elt_spark.cli", *argv],
            capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return out.stdout

    run("tag", "--root", t.root, "--name", "release")
    refs = json.loads(run("refs", "--root", t.root))
    assert refs == {"release": t.snapshot.version}
    run("tag", "--root", t.root, "--name", "release", "--drop")
    assert json.loads(run("refs", "--root", t.root)) == {}


def test_read_where_by_ref(spark, tmp_path):
    t = _make(spark, tmp_path)
    cur = t.snapshot.version
    t.tag("audit", cur - 2)
    row = t.read(version=cur - 2).limit(1).collect()[0]
    got = t.read_where(
        [("repo", "eq", row["repo"]), ("path", "eq", row["path"])], ref="audit"
    ).collect()
    assert len(got) == 1 and got[0]["commit"] == row["commit"]
    with pytest.raises(ValueError):
        t.read_where([], version=cur, ref="audit")
