"""FileIO seam: the snapshot-log commit protocol against object-store
semantics (the reference's sink is S3-native, panorama_datalake.py:215-258;
here the same metadata protocol runs over an in-memory fake store with
conditional-PUT CAS, plus byte-level checks that the POSIX impl kept its
pre-seam behavior)."""

import os
import threading

import pytest

from panorama_elt_spark.cdc.merge import commit_or_skip
from panorama_elt_spark.lakehouse import (
    CommitConflict,
    Field,
    InMemoryFileIO,
    LakeTable,
    LocalFileIO,
    TableSchema,
)
from panorama_elt_spark.lakehouse.snapshot import DataFile
from panorama_elt_spark.lakehouse.table import list_tables

SCHEMA = TableSchema(
    [Field(1, "repo", "string"), Field(2, "path", "string"), Field(3, "content", "string")],
    schema_version=1,
)


def _fake_files(io, root, version, buckets, rows=5):
    """Fabricate data files as store blobs (commits are pure metadata —
    no Spark needed to drive the protocol against the fake store)."""
    out = []
    for b in buckets:
        rel = f"data/s{version}/bucket={b}/part-0.parquet"
        io.write_bytes(os.path.join(root, rel), b"parquet-bytes")
        out.append(DataFile(path=rel, bucket=b, rows=rows, schema_version=1))
    return out


def test_fake_store_commit_cas_and_recovery(spark):
    io = InMemoryFileIO()
    root = "mem://lake/t1"
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], n_buckets=4, io=io)
    snap0 = t.snapshot
    assert snap0.version == 0

    # ordinary commit chain
    s1 = t.commit_replace_buckets(snap0, set(), _fake_files(io, root, 1, [0, 1]),
                                  last_lsn=9, batch_id="b0@10")
    assert s1.version == 1 and "b0@10" in s1.committed_batches

    # CAS: two writers racing the same parent — the second loses
    f_a = _fake_files(io, root, 2, [2])
    f_b = _fake_files(io, root, 2, [3])
    t.commit_replace_buckets(s1, set(), f_a, batch_id="bA")
    with pytest.raises(CommitConflict):
        t.commit_replace_buckets(s1, set(), f_b, batch_id="bB")

    # same-batch retry race resolves to the exactly-once skip
    cur = t.snapshot
    snap, skipped = commit_or_skip(t, s1, set(), f_b, batch_id=cur.committed_batches[-1])
    assert skipped and snap.version == cur.version

    # hint recovery: lose the pointer, the version-file scan still resolves
    io.delete(t.log.hint_path)
    assert t.log.current_version() == cur.version

    # time travel reads any retained version
    assert t.log.read_version(1).committed_batches == ["b0@10"]


def test_fake_store_concurrent_cas_single_winner(spark):
    """N threads race the same parent version through the conditional
    PUT — exactly one lands, everyone else sees CommitConflict."""
    io = InMemoryFileIO()
    root = "mem://lake/race"
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], n_buckets=4, io=io)
    parent = t.snapshot
    outcomes = []

    def attempt(i):
        try:
            t.commit_replace_buckets(
                parent, set(), _fake_files(io, root, 1, [i]), batch_id=f"w{i}"
            )
            outcomes.append("won")
        except CommitConflict:
            outcomes.append("conflict")

    threads = [threading.Thread(target=attempt, args=(i,)) for i in range(8)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert outcomes.count("won") == 1 and len(outcomes) == 8
    assert t.snapshot.version == 1


def test_fake_store_expire_and_vacuum(spark):
    """expire + vacuum over the fake store: orphaned data blobs of
    expired snapshots are deleted, everything reachable from retained
    versions survives."""
    io = InMemoryFileIO()
    root = "mem://lake/vac"
    t = LakeTable.create(spark, root, SCHEMA, ["repo", "path"], n_buckets=4, io=io)
    snap = t.snapshot
    for v in range(1, 5):
        snap = t.commit_replace_buckets(
            snap, {0}, _fake_files(io, root, v, [0]), batch_id=f"b{v}"
        )
    all_data = set(io.list(os.path.join(root, "data")))
    assert len(all_data) == 4
    removed_meta = t.expire_snapshots(keep_last=2)
    assert removed_meta == 3  # v0..v2 gone, v3/v4 retained
    removed = t.vacuum()
    # bucket 0 was rewritten each commit: v1/v2's data files die, plus the
    # expired versions' manifest lists (v0..v2) and manifests (v1, v2)
    assert removed == 7
    left = set(io.list(os.path.join(root, "data")))
    assert {p for p in left} == {
        os.path.join(root, f.path) for f in t.log.read_version(3).files
    } | {os.path.join(root, f.path) for f in t.snapshot.files}
    # reads of retained versions still resolve their manifests
    assert t.log.read_version(3).files and t.snapshot.files


def test_fake_store_drop_and_discovery(spark):
    io = InMemoryFileIO()
    base = "mem://lake"
    t1 = LakeTable.create(spark, base + "/alpha", SCHEMA, ["repo", "path"], io=io)
    LakeTable.create(spark, base + "/beta", SCHEMA, ["repo", "path"], io=io)
    io.write_bytes(base + "/not_a_table/blob.bin", b"x")
    assert list_tables(base, io) == [base + "/alpha", base + "/beta"]
    t1.drop()
    assert list_tables(base, io) == [base + "/beta"]
    assert not io.list(base + "/alpha")


def test_local_fileio_preserves_posix_semantics(tmp_path):
    """The POSIX impl keeps the pre-seam contract: O_EXCL create raises
    on the second writer, the publish is atomic-rename (no temp file
    left), and listings recurse."""
    io = LocalFileIO()
    p = str(tmp_path / "_meta" / "v1.json")
    io.write_text_if_absent(p, "one")
    with pytest.raises(FileExistsError):
        io.write_text_if_absent(p, "two")
    assert io.read_text(p) == "one"
    hint = str(tmp_path / "_meta" / "version-hint.txt")
    io.write_text(hint, "1")
    io.write_text(hint, "2")
    assert io.read_text(hint) == "2"
    assert not [n for n in os.listdir(tmp_path / "_meta") if ".tmp." in n]
    io.write_bytes(str(tmp_path / "data" / "x" / "f.parquet"), b"\x00")
    assert set(io.list(str(tmp_path))) == {
        p, hint, str(tmp_path / "data" / "x" / "f.parquet")
    }
    assert io.list_dir(str(tmp_path)) == ["_meta", "data"]
