"""``spark.read.format("panorama")`` — the lake table as a Spark data source.

Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) over the
lakehouse format, resolving the snapshot *at read time*: a DataFrame or
SQL query built over this source always sees the table's current
committed state — files are listed from the manifest log when the scan
plans, merge-on-read deltas fold partition-locally, and every file is
projected onto the current schema by field id. That read-time resolution
is what makes *persisted* catalog entries (``CREATE TABLE ... USING
panorama``, see ``panorama_elt_spark.catalog``) correct across sessions
and commits — a view pinned to a data directory would go stale on the
next commit and would bypass MOR/evolution semantics entirely.

This is the reference's Athena-side read path re-expressed
(``panorama_datalake.py:169-213`` registers partitions so Athena's
catalog resolves files at query time; here the snapshot log is the
catalog and the source resolves it).

Scale design:

* one input partition per live bucket — the scan parallelism is the
  table's bucket count, the same unit the merge writes, so a
  1000-executor cluster fans out without any repartition;
* the LWW delta fold runs inside each bucket partition (bucketing
  co-locates every key's rows), so merge-on-read reads need **zero
  shuffle** — Spark sees a plain scan;
* key-equality filters prune buckets before any file IO via the
  driver-side Murmur3 (``functions/murmur.py``) — a point lookup reads
  one bucket's files only (Spark still re-applies the predicate, the
  pushdown is pruning-only so it can never change results);
* file bytes move as Arrow record batches (pyarrow parquet reader →
  Spark's Arrow ingest), never per-row Python.

The in-session hot path stays ``LakeTable.read()`` (JVM parquet scan +
codegen); this source is the *catalog/interop* path. Time travel:
``.option("version", N)``.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field
from itertools import product as _product
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..functions.murmur import SUPPORTED_TYPES, bucket_of
from ..lakehouse.snapshot import SnapshotLog

FORMAT_NAME = "panorama"

# refuse to enumerate unbounded key-combination products during pruning
_MAX_PRUNE_COMBOS = 1024


def _arrow_type(type_name: str):
    """Table-schema DDL name → the arrow type Spark expects back."""
    from pyspark.sql.pandas.types import to_arrow_type

    from ..lakehouse.schema import spark_type

    return to_arrow_type(spark_type(type_name))


@dataclass
class BucketPartition(InputPartition):
    """One live bucket's files plus everything needed to project them
    onto the current schema executor-side (plain picklable data)."""

    bucket: int
    # (root-relative path, schema_version, kind)
    files: list[tuple[str, int, str]]
    root: str
    # current schema: (field_id, name, type_name, default)
    target_fields: list[tuple[int, str, str, object]]
    # schema_version -> [(field_id, name, type_name)]
    histories: dict[int, list[tuple[int, str, str]]]
    key_cols: list[str] = dc_field(default_factory=list)


class PanoramaReader(DataSourceReader):
    def __init__(self, root: str, options):
        self.root = root
        io_err = FileNotFoundError(f"no lake table at {root}")
        log = SnapshotLog(root)
        if not log.exists():
            raise io_err
        version = options.get("version")
        self.snap = (
            log.read_current() if version is None else log.read_version(int(version))
        )
        assert self.snap is not None
        self.snap.bind(log.io, root)
        self.with_deltas = str(options.get("with_deltas", "true")).lower() != "false"
        self._allowed_buckets: set[int] | None = None

    # ------------------------------------------------------------ pruning

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Bucket pruning from key-equality predicates.

        When every key column is pinned to a finite value set
        (``EqualTo`` / ``In``), the Murmur3 bucket of each combination
        is computed driver-side and the scan keeps only those buckets'
        partitions — a point lookup touches one bucket's files. Every
        filter is returned as *unhandled* so Spark still applies the
        full predicate: pruning can drop no row that matches, because a
        key's rows live only in its hash bucket (the merge writes with
        the identical hash — ``table.bucket_expr``).
        """
        snap = self.snap
        types_by_col = {f.name: f.type for f in snap.schema.fields}
        if all(types_by_col.get(c) in SUPPORTED_TYPES for c in snap.key_cols):
            value_sets: dict[str, set] = {}
            for f in filters:
                col = f.attribute[0] if len(f.attribute) == 1 else None
                if col not in snap.key_cols:
                    continue
                if isinstance(f, EqualTo):
                    vals = {f.value}
                elif isinstance(f, In):
                    vals = set(f.value)
                else:
                    continue
                # intersect with any earlier constraint on the same col
                value_sets[col] = (
                    vals if col not in value_sets else value_sets[col] & vals
                )
            if set(value_sets) == set(snap.key_cols):
                combos = 1
                for vs in value_sets.values():
                    combos *= len(vs)
                if combos <= _MAX_PRUNE_COMBOS:
                    types = [types_by_col[c] for c in snap.key_cols]
                    self._allowed_buckets = {
                        bucket_of(list(combo), types, snap.n_buckets)
                        for combo in _product(
                            *[sorted(value_sets[c]) for c in snap.key_cols]
                        )
                    }
        return iter(filters)  # pruning-only: Spark re-applies everything

    # --------------------------------------------------------- planning

    def partitions(self) -> list[InputPartition]:
        snap = self.snap
        files = (
            snap.files
            if self._allowed_buckets is None
            else snap.files_in_buckets(self._allowed_buckets)
        )
        by_bucket: dict[int, list[tuple[str, int, str]]] = {}
        for f in files:
            if f.kind == "delta" and not self.with_deltas:
                continue  # raw base state, like read(with_deltas=False)
            by_bucket.setdefault(f.bucket, []).append(
                (f.path, f.schema_version, f.kind)
            )
        target = [(f.id, f.name, f.type, f.default) for f in snap.schema.fields]
        histories = {
            sv: [(f.id, f.name, f.type) for f in s.fields]
            for sv, s in snap.schema_history.items()
        }
        parts: list[InputPartition] = [
            BucketPartition(
                bucket=b,
                files=fs,
                root=self.root,
                target_fields=target,
                histories=histories,
                key_cols=list(snap.key_cols),
            )
            for b, fs in sorted(by_bucket.items())
        ]
        if not parts:  # empty table still needs one (empty) partition
            parts = [
                BucketPartition(
                    bucket=-1,
                    files=[],
                    root=self.root,
                    target_fields=target,
                    histories=histories,
                    key_cols=list(snap.key_cols),
                )
            ]
        return parts

    def __getstate__(self):
        # the reader is pickled to every task; read() consumes only the
        # partition payload, so don't ship the snapshot/manifest cache
        state = dict(self.__dict__)
        state["snap"] = None
        return state

    # ------------------------------------------------------------- read

    def read(self, partition: BucketPartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        tf = partition.target_fields
        out_schema = pa.schema([(name, _arrow_type(t)) for _, name, t, _ in tf])
        if not partition.files:
            return iter(())
        delta_cols = [("__op", pa.string()), ("__lsn", pa.int64())]
        have_deltas = any(kind == "delta" for _, _, kind in partition.files)

        def load(relpath: str, schema_version: int, kind: str) -> pa.Table:
            tbl = pq.read_table(os.path.join(partition.root, relpath))
            old_by_id = {
                fid: (name, t)
                for fid, name, t in partition.histories[schema_version]
            }
            cols, names = [], []
            for fid, name, tname, default in tf:
                at = _arrow_type(tname)
                old = old_by_id.get(fid)
                if old is None:  # column postdates this file: backfill
                    col = (
                        pa.nulls(len(tbl), type=at)
                        if default is None
                        else pa.array([default] * len(tbl)).cast(at)
                    )
                else:
                    col = tbl.column(old[0])
                    if col.type != at:
                        col = pc.cast(col, at)
                cols.append(col)
                names.append(name)
            if have_deltas:
                if kind == "delta":
                    cols += [
                        pc.cast(tbl.column("__op"), pa.string()),
                        pc.cast(tbl.column("__lsn"), pa.int64()),
                    ]
                else:  # base rows: op E at LSN -1, losers to any delta
                    cols += [
                        pa.array(["E"] * len(tbl), pa.string()),
                        pa.array([-1] * len(tbl), pa.int64()),
                    ]
                names += [n for n, _ in delta_cols]
            return pa.table(cols, names=names)

        tables = [load(p, sv, k) for p, sv, k in partition.files]
        tbl = tables[0] if len(tables) == 1 else pa.concat_tables(tables)

        if have_deltas:
            tbl = _lww_fold(tbl, partition.key_cols, out_schema)
        return iter(tbl.cast(out_schema).to_batches(max_chunksize=1 << 16))


def _lww_fold(tbl, key_cols: list[str], out_schema):
    """Partition-local last-writer-wins fold of base + delta rows.

    Mirrors ``LakeTable._read_state``'s ``max_by(struct(...), __lsn)``
    aggregate, but entirely inside one bucket (bucketing co-locates
    keys, so no exchange is needed): the max ``__lsn`` per key selects
    the winner row, delete markers drop. LSNs are unique per key (the
    merge dedupes each batch and the log orders batches), so the
    equality join below matches exactly one row per key; a duplicated
    (key, lsn) would mirror ``max_by``'s arbitrary-tie behavior — the
    guard keeps the first.
    """
    import pyarrow.compute as pc

    agg = tbl.group_by(key_cols).aggregate([("__lsn", "max")])
    joined = tbl.join(agg, keys=key_cols, join_type="inner")
    winners = joined.filter(pc.equal(joined["__lsn"], joined["__lsn_max"]))
    if len(winners) > len(agg):  # (key, lsn) tie — keep one row per key
        import pandas as pd

        df = winners.to_pandas(types_mapper=pd.ArrowDtype)
        winners = _pa_from_pandas(df.drop_duplicates(subset=key_cols))
    winners = winners.filter(pc.not_equal(winners["__op"], "D"))
    return winners.select(out_schema.names)


def _pa_from_pandas(df):
    import pyarrow as pa

    return pa.Table.from_pandas(df, preserve_index=False)


class PanoramaDataSource(DataSource):
    """``format("panorama")``: read a lake table root as a DataFrame.

    Register once per session (``spark.dataSource.register``, or
    ``catalog.register_data_source``); persisted catalog entries created
    with ``USING panorama`` then resolve in any later session that has
    registered the source.
    """

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _root(self) -> str:
        path = self.options.get("path")
        if not path:
            raise ValueError(
                "format('panorama') needs a table root: .load('/path/to/table')"
            )
        return path

    def schema(self) -> StructType:
        log = SnapshotLog(self._root())
        version = self.options.get("version")
        snap = (
            log.read_current() if version is None else log.read_version(int(version))
        )
        if snap is None:
            raise FileNotFoundError(f"no lake table at {self._root()}")
        return snap.schema.to_struct()

    def reader(self, schema: StructType) -> DataSourceReader:
        return PanoramaReader(self._root(), self.options)
