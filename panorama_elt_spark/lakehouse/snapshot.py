"""Versioned snapshot metadata with atomic, conflict-detecting commits.

Reimagines the reference's idempotent sink primitives — whole-partition
S3 object overwrite (``panorama_datalake.py:215-258``) and the Athena
``ClientRequestToken`` idempotency token (``panorama_datalake.py:117``)
— as an Iceberg-style snapshot log:

* A table's state is one immutable JSON document ``_meta/v{N}.json``
  listing every live data file per bucket, the field-id schema (plus all
  historical schema versions for reading old files), the last applied
  LSN, the set of committed batch ids, and lineage rows.
* Commit = exclusive-create of ``v{N+1}.json`` (``open(..., 'x')`` —
  two racing committers cannot both win) followed by an atomic
  ``os.replace`` of the version-hint pointer. Readers resolve the hint,
  falling back to a scan of ``v*.json`` if the hint write was lost.
* Exactly-once: the batch id is recorded *inside the same snapshot
  document* as the data-file change and the checkpoint LSN, so data,
  checkpoint and lineage commit atomically (SURVEY.md §7.4(1)); a
  replayed batch is detected by id and skipped.

On object stores without atomic rename the same protocol maps to a
conditional PUT (If-None-Match) or a catalog CAS — the storage
primitives live behind the ``FileIO`` seam (fileio.py): POSIX and the
in-memory fake object store implement the identical contract, and the
commit/CAS/recovery tests run against both.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field as dc_field

from .fileio import FileIO, LocalFileIO
from .schema import TableSchema


class CommitConflict(RuntimeError):
    """Another writer committed the same version first."""


@dataclass
class DataFile:
    path: str  # relative to table root
    bucket: int
    rows: int
    schema_version: int
    # "base" = compacted row state; "delta" = merge-on-read change file
    # (schema columns + __op/__lsn, folded into reads until compaction)
    kind: str = "base"

    def to_dict(self) -> dict:
        return {
            "path": self.path,
            "bucket": self.bucket,
            "rows": self.rows,
            "schema_version": self.schema_version,
            "kind": self.kind,
        }

    @staticmethod
    def from_dict(d: dict) -> "DataFile":
        return DataFile(
            d["path"], d["bucket"], d["rows"], d["schema_version"], d.get("kind", "base")
        )


@dataclass
class Snapshot:
    version: int
    schema: TableSchema
    n_buckets: int
    key_cols: list[str]
    files: list[DataFile] = dc_field(default_factory=list)
    last_lsn: int = -1
    committed_batches: list[str] = dc_field(default_factory=list)
    lineage: list[dict] = dc_field(default_factory=list)
    # every schema version ever active, for reading old data files
    schema_history: dict[int, TableSchema] = dc_field(default_factory=dict)
    properties: dict = dc_field(default_factory=dict)
    # lineage rows spilled out of the document (oldest-first parquet
    # files under _meta/lineage/, listed here so readers never pick up
    # orphans from failed commits); the in-doc `lineage` list holds only
    # the most recent rows — the snapshot document stays O(retention),
    # not O(table lifetime)
    lineage_files: list[str] = dc_field(default_factory=list)

    def __post_init__(self) -> None:
        self.schema_history.setdefault(self.schema.schema_version, self.schema)

    def files_in_buckets(self, buckets: set[int]) -> list[DataFile]:
        return [f for f in self.files if f.bucket in buckets]

    def to_json(self) -> str:
        return json.dumps(
            {
                "format_version": 1,
                "version": self.version,
                "schema": self.schema.to_dict(),
                "n_buckets": self.n_buckets,
                "key_cols": self.key_cols,
                "files": [f.to_dict() for f in self.files],
                "last_lsn": self.last_lsn,
                "committed_batches": self.committed_batches,
                "lineage": self.lineage,
                "schema_history": {str(v): s.to_dict() for v, s in self.schema_history.items()},
                "properties": self.properties,
                "lineage_files": self.lineage_files,
                "committed_at_unix": time.time(),
            },
            indent=1,
        )

    @staticmethod
    def from_json(text: str) -> "Snapshot":
        d = json.loads(text)
        return Snapshot(
            version=d["version"],
            schema=TableSchema.from_dict(d["schema"]),
            n_buckets=d["n_buckets"],
            key_cols=d["key_cols"],
            files=[DataFile.from_dict(f) for f in d["files"]],
            last_lsn=d["last_lsn"],
            committed_batches=d["committed_batches"],
            lineage=d["lineage"],
            schema_history={
                int(v): TableSchema.from_dict(s) for v, s in d.get("schema_history", {}).items()
            },
            properties=d.get("properties", {}),
            lineage_files=d.get("lineage_files", []),
        )


class SnapshotLog:
    """The ``_meta/`` namespace: version files + atomic current pointer.
    All storage ops go through the ``FileIO`` seam — POSIX by default,
    object-store semantics via any other implementation."""

    def __init__(self, table_root: str, io: FileIO | None = None):
        self.io = io or LocalFileIO()
        self.meta_dir = os.path.join(table_root, "_meta")
        self.hint_path = os.path.join(self.meta_dir, "version-hint.txt")

    def _version_path(self, version: int) -> str:
        return os.path.join(self.meta_dir, f"v{version}.json")

    def exists(self) -> bool:
        return self.current_version() is not None

    def current_version(self) -> int | None:
        try:
            hinted = int(self.io.read_text(self.hint_path).strip())
        except (FileNotFoundError, ValueError):
            hinted = -1
        # the hint is advisory: a crash between publish steps can leave it
        # stale, so trust the highest committed version file.
        best = hinted
        for name in self.io.list_dir(self.meta_dir):
            if name.startswith("v") and name.endswith(".json"):
                try:
                    best = max(best, int(name[1:-5]))
                except ValueError:
                    pass
        return best if best >= 0 else None

    def read_current(self) -> Snapshot | None:
        v = self.current_version()
        if v is None:
            return None
        return Snapshot.from_json(self.io.read_text(self._version_path(v)))

    def read_version(self, version: int) -> Snapshot:
        return Snapshot.from_json(self.io.read_text(self._version_path(version)))

    def commit(self, snapshot: Snapshot, expected_parent: int | None) -> None:
        """Exclusive-create v{N}; conflict if it already exists."""
        cur = self.current_version()
        if cur != expected_parent:
            raise CommitConflict(
                f"expected parent version {expected_parent}, found {cur}"
            )
        path = self._version_path(snapshot.version)
        try:
            # the CAS: O_EXCL on POSIX, conditional PUT on object stores
            self.io.write_text_if_absent(path, snapshot.to_json())
        except FileExistsError as exc:
            raise CommitConflict(f"version {snapshot.version} already committed") from exc
        self._publish(snapshot.version)

    def _publish(self, version: int) -> None:
        self.io.write_text(self.hint_path, str(version))
