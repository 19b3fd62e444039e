"""``spark.read.format("panorama")`` — the lake table as a Spark data source.

Python Data Source (Spark 4 ``pyspark.sql.datasource`` API) over the
lakehouse format, resolving the snapshot *at read time*: a DataFrame or
SQL query built over this source always sees the table's current
committed state — files are listed from the manifest log when the scan
plans, merge-on-read deltas fold partition-locally, and every file is
projected onto the current schema by field id. That read-time resolution
is what makes *persisted* catalog entries (``attach_catalog``, see
``panorama_elt_spark.catalog``) correct across sessions and commits — a
view pinned to a data directory would go stale on the next commit and
would bypass MOR/evolution semantics entirely.

This is the reference's Athena-side read path re-expressed
(``panorama_datalake.py:169-213`` registers partitions so Athena's
catalog resolves files at query time; here the snapshot log is the
catalog and the source resolves it).

Three read surfaces share one bucket-local Arrow kernel:

* **state read** — ``spark.read.format("panorama").load(root)``
  (+ ``.option("version", N)`` time travel,
  ``.option("with_deltas", "false")`` raw base state);
* **batch change feed** — ``.option("changes_from", v)`` (+ optional
  ``changes_to``): the I/U/D rows between two snapshots, byte-equal to
  ``LakeTable.changes`` (parity-tested), including its merge-on-read
  fast path and newer-schema projection rule;
* **streaming change feed** — ``spark.readStream.format("panorama")
  .option("change_feed", "true").load(root)``: offsets are snapshot
  versions, each micro-batch emits ``changes(start, end)``; resumes
  from the checkpoint like any Spark source. The Delta CDF-stream
  analogue. The stream's column set is pinned at start — after an
  ALTER that adds columns, restart the stream to widen the surface
  (standard streaming-schema semantics).

And two write surfaces over the same bucket layout (``PanoramaWriter``
/ ``PanoramaStreamSink`` below):

* **batch write** — ``df.write.format("panorama").mode("append" |
  "overwrite").save(root)``: atomic snapshot append / all-bucket swap;
* **streaming upsert sink** — ``writeStream.format("panorama")`` over
  change events (table columns + ``op``/``lsn``): each epoch lands as
  merge-on-read delta files in one exactly-once commit, so
  lake → readStream → transform → writeStream → lake is end-to-end
  exactly-once in pure Spark API.

Scale design:

* state-read partition grain: one input partition per FILE for
  delta-free buckets (a compacted bucket's files are independent row
  sets — scan parallelism is the live file count, not the bucket
  count), and one per bucket only where merge-on-read deltas force the
  LWW fold to co-locate a key's rows; change feeds stay bucket-grain
  (the diff is a per-bucket join);
* LWW folds and change diffs run inside each bucket partition
  (bucketing co-locates every key's rows), so MOR reads and change
  feeds need **zero shuffle** — Spark sees a plain scan;
* key-equality filters prune buckets before any file IO via the
  driver-side Murmur3 (``functions/murmur.py``) — a point lookup reads
  one bucket's files only (Spark still re-applies the predicate, the
  pushdown is pruning-only so it can never change results);
* change-feed planning prunes at two metadata levels before touching
  data: manifest-list compare → changed-bucket file-set diff
  (``snapshot.py`` ``diff_candidate_buckets``/``snapshot_changed_buckets``);
* file bytes move as Arrow record batches (pyarrow parquet reader →
  Spark's Arrow ingest), never per-row Python.

The in-session hot path stays ``LakeTable.read()`` (JVM parquet scan +
codegen); this source is the catalog/interop/streaming-out path. A
change-feed consumer's lag must stay inside ``expire_snapshots``
retention — expired start versions raise cleanly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field as dc_field
from itertools import product as _product
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..functions.murmur import SUPPORTED_TYPES, bucket_of, murmur3_hash
from ..lakehouse.snapshot import (
    Snapshot,
    SnapshotLog,
    snapshot_changed_buckets,
    snapshot_file_delta,
)

FORMAT_NAME = "panorama"

# refuse to enumerate unbounded key-combination products during pruning
_MAX_PRUNE_COMBOS = 1024

CHANGE_OP_COL = "change_op"
CHANGE_VERSION_COL = "change_version"


def _arrow_type(type_name: str):
    """Table-schema DDL name → the arrow type Spark expects back."""
    from pyspark.sql.pandas.types import to_arrow_type

    from ..lakehouse.schema import spark_type

    return to_arrow_type(spark_type(type_name))


# ---------------------------------------------------------------------------
# partition payloads (plain picklable data)
# ---------------------------------------------------------------------------


@dataclass
class BucketPartition(InputPartition):
    """One live bucket's files plus everything needed to project them
    onto the current schema executor-side."""

    bucket: int
    # (root-relative path, schema_version, kind)
    files: list[tuple[str, int, str]]
    root: str
    # current schema: (field_id, name, type_name, default)
    target_fields: list[tuple[int, str, str, object]]
    # schema_version -> [(field_id, name, type_name)]
    histories: dict[int, list[tuple[int, str, str]]]
    key_cols: list[str] = dc_field(default_factory=list)


@dataclass
class ChangesPartition(InputPartition):
    """One changed bucket's inputs for a change-feed scan. ``mor`` picks
    the kernel: delta-classify (pure delta-append range) or full-outer
    state diff."""

    bucket: int
    old_files: list[tuple[str, int, str]]
    # diff path: the bucket's files in the TO snapshot; MOR path: the
    # range's delta files only
    new_files: list[tuple[str, int, str]]
    mor: bool
    root: str
    target_fields: list[tuple[int, str, str, object]]
    histories: dict[int, list[tuple[int, str, str]]]
    key_cols: list[str] = dc_field(default_factory=list)
    # when set, every emitted row carries this snapshot version in a
    # ``change_version`` column (Delta CDF's _commit_version analogue);
    # for a range spanning several commits it is the range's TO version
    # — the state the row set is exact as-of
    version: int | None = None


# ---------------------------------------------------------------------------
# executor-side Arrow kernel (shared by all three read surfaces)
# ---------------------------------------------------------------------------


def _load_projected(
    root: str,
    files: list[tuple[str, int, str]],
    histories: dict[int, list[tuple[int, str, str]]],
    target_fields: list[tuple[int, str, str, object]],
    with_delta_cols: bool,
):
    """Read a file set and project every file onto the target schema by
    field id (cast widened types, backfill added columns with their
    declared default). ``with_delta_cols`` carries ``__op``/``__lsn``
    through — base files get the E/-1 tagging the JVM read path uses."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tables = []
    for relpath, schema_version, kind in files:
        tbl = pq.read_table(os.path.join(root, relpath))
        old_by_id = {fid: (name, t) for fid, name, t in histories[schema_version]}
        cols, names = [], []
        for fid, name, tname, default in target_fields:
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
        if with_delta_cols:
            if kind == "delta":
                cols += [
                    pc.cast(tbl.column("__op"), pa.string()),
                    pc.cast(tbl.column("__lsn"), pa.int64()),
                ]
            else:
                # base rows at their STORED system columns (written by
                # the merge since the out-of-order fix: winner op —
                # delete winners persist as hidden tombstone rows — and
                # winner LSN); files that predate them fold in at the
                # legacy 'E'/-1 tags, losing every tie
                if "__op" in tbl.column_names:
                    op_col = pc.fill_null(
                        pc.cast(tbl.column("__op"), pa.string()), "E"
                    )
                else:
                    op_col = pa.array(["E"] * len(tbl), pa.string())
                if "__lsn" in tbl.column_names:
                    lsn_col = pc.fill_null(
                        pc.cast(tbl.column("__lsn"), pa.int64()), -1
                    )
                else:
                    lsn_col = pa.array([-1] * len(tbl), pa.int64())
                cols += [op_col, lsn_col]
            names += ["__op", "__lsn"]
        tables.append(pa.table(cols, names=names))
    if not tables:
        import pyarrow as pa

        fields = [(name, _arrow_type(t)) for _, name, t, _ in target_fields]
        if with_delta_cols:
            fields += [("__op", pa.string()), ("__lsn", pa.int64())]
        return pa.table(
            {n: pa.nulls(0, type=t) for n, t in fields},
        )
    return tables[0] if len(tables) == 1 else pa.concat_tables(tables)


def _lww_winners(tbl, key_cols: list[str]):
    """One winner row per key by max ``__lsn`` (keeps ``__op``).

    Mirrors ``LakeTable._read_state``'s ``max_by(struct(...), __lsn)``
    aggregate, but entirely inside one bucket (bucketing co-locates
    keys, so no exchange is needed). LSNs are unique per key (the merge
    dedupes each batch and the log orders batches), so the equality
    join matches exactly one row per key; a duplicated (key, lsn) would
    mirror ``max_by``'s arbitrary-tie behavior — the guard keeps one.

    NULL keys: Arrow joins never match null keys, so rows with a NULL
    key column would silently vanish from this fold while the JVM path
    (groupBy + max_by) groups nulls and keeps them. Null-keyed rows are
    split off and folded group-wise in pandas (sort by ``__lsn`` desc +
    ``drop_duplicates``, which treats nulls as equal — Spark's groupBy
    semantics), then concatenated back — read-surface parity at zero
    cost on the no-null hot path.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    null_mask = None
    for k in key_cols:
        m = pc.is_null(tbl[k])
        null_mask = m if null_mask is None else pc.or_(null_mask, m)
    null_part = None
    if null_mask is not None and pc.any(null_mask).as_py():
        import pandas as pd

        df = tbl.filter(null_mask).to_pandas(types_mapper=pd.ArrowDtype)
        df = df.sort_values("__lsn", ascending=False, kind="stable").drop_duplicates(
            subset=key_cols
        )
        null_part = pa.Table.from_pandas(df, preserve_index=False).select(
            tbl.column_names
        ).cast(tbl.schema)
        tbl = tbl.filter(pc.invert(null_mask))
    agg = tbl.group_by(key_cols).aggregate([("__lsn", "max")])
    joined = tbl.join(agg, keys=key_cols, join_type="inner")
    winners = joined.filter(pc.equal(joined["__lsn"], joined["__lsn_max"]))
    if len(winners) > len(agg):  # (key, lsn) tie — keep one row per key
        import pandas as pd

        df = winners.to_pandas(types_mapper=pd.ArrowDtype)
        winners = pa.Table.from_pandas(
            df.drop_duplicates(subset=key_cols), preserve_index=False
        )
    if null_part is not None and len(null_part):
        winners = pa.concat_tables(
            [winners.select(tbl.column_names).cast(tbl.schema), null_part]
        )
    return winners


def _load_state(
    root, files, histories, target_fields, key_cols, out_schema, with_lsn=False
):
    """One bucket's row state: projected files (system columns always
    read — merge-written base files hold hidden tombstone rows),
    LWW-folded if the set holds merge-on-read deltas, tombstones and
    delete markers dropped. ``with_lsn`` keeps tombstones and appends
    each row's winner op/LSN as ``__op``/``__lsn`` — the change-feed
    kernel's out-of-order arbitration input."""
    import pyarrow as pa
    import pyarrow.compute as pc

    have_deltas = any(kind == "delta" for _, _, kind in files)
    tbl = _load_projected(root, files, histories, target_fields, True)
    names = list(out_schema.names)
    schema = out_schema
    if with_lsn:
        names += ["__op", "__lsn"]
        schema = pa.schema(
            list(out_schema)
            + [pa.field("__op", pa.string()), pa.field("__lsn", pa.int64())]
        )
    if have_deltas:
        tbl = _lww_winners(tbl, key_cols)
    if not with_lsn:
        tbl = tbl.filter(pc.not_equal(tbl["__op"], "D"))
    return tbl.select(names).cast(schema)


def _null_safe_any_diff(tbl, cols: list[str]):
    """True where any payload column differs from its ``__old_`` twin,
    with null == null (Spark's struct-comparison semantics, which
    ``LakeTable.changes`` relies on)."""
    import pyarrow.compute as pc

    any_diff = None
    for c in cols:
        a, b = tbl[c], tbl[f"__old_{c}"]
        eq = pc.fill_null(
            pc.or_kleene(pc.equal(a, b), pc.and_(pc.is_null(a), pc.is_null(b))),
            False,
        )
        d = pc.invert(eq)
        any_diff = d if any_diff is None else pc.or_(any_diff, d)
    return any_diff


def _feed_schema_arrow(target_fields, key_cols, with_version: bool = False):
    import pyarrow as pa

    by_name = {name: tname for _, name, tname, _ in target_fields}
    payload = [n for _, n, _, _ in target_fields if n not in key_cols]
    return pa.schema(
        [(k, _arrow_type(by_name[k])) for k in key_cols]
        + [(CHANGE_OP_COL, pa.string())]
        + ([(CHANGE_VERSION_COL, pa.int64())] if with_version else [])
        + [(c, _arrow_type(by_name[c])) for c in payload]
    )


def _read_changes_partition(partition: ChangesPartition):
    """The change rows of one bucket — both kernels emit exactly the
    rows ``LakeTable.changes`` would (parity-tested): I for new keys,
    D (payload nulls) for removed keys, U for payload changes; no-op
    updates and deletes of never-existing keys emit nothing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tf, keys = partition.target_fields, partition.key_cols
    payload = [n for _, n, _, _ in tf if n not in keys]
    out_schema = _feed_schema_arrow(tf, keys, partition.version is not None)
    state_schema = pa.schema([(name, _arrow_type(t)) for _, name, t, _ in tf])
    old = _load_state(
        partition.root,
        partition.old_files,
        partition.histories,
        tf,
        keys,
        state_schema,
        with_lsn=partition.mor,
    )
    # rename old payload out of the way of the join
    old = old.rename_columns(
        keys
        + [f"__old_{c}" for c in payload]
        + (["__old_op", "__old_lsn"] if partition.mor else [])
    )
    old = old.append_column("__in_old", pa.array([True] * len(old), type=pa.bool_()))

    if partition.mor:
        deltas = _load_projected(
            partition.root, partition.new_files, partition.histories, tf, True
        ).cast(
            pa.schema(
                list(state_schema) + [pa.field("__op", pa.string()), pa.field("__lsn", pa.int64())]
            )
        )
        w = _lww_winners(deltas, keys)
        j = w.join(old, keys=keys, join_type="left outer")
        # a range winner older than the old row's stored LSN never
        # applies (the read fold keeps the old row) — emit nothing,
        # exactly like the state-diff path (old state == new state)
        applies = pc.fill_null(
            pc.or_kleene(
                pc.is_null(j["__old_lsn"]),
                pc.greater_equal(j["__lsn"], j["__old_lsn"]),
            ),
            True,
        )
        j = j.filter(applies)
        # visible old row = present and not a tombstone
        in_old = pc.and_(
            pc.fill_null(j["__in_old"], False),
            pc.invert(pc.fill_null(pc.equal(j["__old_op"], "D"), False)),
        )
        is_del = pc.equal(j["__op"], "D")
        differs = (
            _null_safe_any_diff(j, payload)
            if payload
            else pa.array([False] * len(j), type=pa.bool_())
        )
        op = pc.if_else(
            pc.and_(pc.invert(in_old), pc.invert(is_del)),
            pa.scalar("I"),
            pc.if_else(
                pc.and_(in_old, is_del),
                pa.scalar("D"),
                pc.if_else(pc.and_(in_old, differs), pa.scalar("U"), pa.scalar(None, pa.string())),
            ),
        )
    else:
        new = _load_state(
            partition.root, partition.new_files, partition.histories, tf, keys, state_schema
        )
        new = new.append_column("__in_new", pa.array([True] * len(new), type=pa.bool_()))
        j = new.join(old, keys=keys, join_type="full outer")
        in_old = pc.fill_null(j["__in_old"], False)
        in_new = pc.fill_null(j["__in_new"], False)
        differs = (
            _null_safe_any_diff(j, payload)
            if payload
            else pa.array([False] * len(j), type=pa.bool_())
        )
        is_del = pc.invert(in_new)
        op = pc.if_else(
            pc.invert(in_old),
            pa.scalar("I"),
            pc.if_else(
                is_del,
                pa.scalar("D"),
                pc.if_else(pc.and_(in_new, differs), pa.scalar("U"), pa.scalar(None, pa.string())),
            ),
        )

    j = j.append_column(CHANGE_OP_COL, op)
    j = j.filter(pc.is_valid(j[CHANGE_OP_COL]))
    # D rows surface null payload (the new side has no row / is a marker)
    is_d = pc.equal(j[CHANGE_OP_COL], "D")
    cols = []
    for name in out_schema.names:
        if name == CHANGE_OP_COL:
            cols.append(j[CHANGE_OP_COL])
        elif name == CHANGE_VERSION_COL:
            cols.append(pa.array([partition.version] * len(j), type=pa.int64()))
        elif name in keys:
            cols.append(j[name])
        else:
            at = out_schema.field(name).type
            cols.append(pc.if_else(is_d, pa.scalar(None, at), pc.cast(j[name], at)))
    return pa.table(cols, names=out_schema.names).cast(out_schema)


# ---------------------------------------------------------------------------
# driver-side planning shared by batch + stream change feeds
# ---------------------------------------------------------------------------


def _pack_files(files):
    return [(f.path, f.schema_version, f.kind) for f in files]


def _plan_changes(
    root: str,
    snap_from: Snapshot,
    snap_to: Snapshot,
    include_version: bool = False,
) -> list[ChangesPartition]:
    """Metadata-only plan of a change-feed scan: manifest-list compare →
    changed buckets → per-bucket (old, new-or-delta) file groups.
    Mirrors ``LakeTable.changes``'s pruning and its merge-on-read fast
    path (pure delta-append range ⇒ classify range winners against the
    old state; anything rewritten ⇒ full state diff)."""
    proj = (
        snap_to
        if snap_to.schema.schema_version >= snap_from.schema.schema_version
        else snap_from
    )
    target = [(f.id, f.name, f.type, f.default) for f in proj.schema.fields]
    # histories accumulate monotonically: the LATER snapshot covers all
    # schema versions either side's files can carry
    hist_src = (
        snap_to if snap_to.version >= snap_from.version else snap_from
    )
    histories = {
        sv: [(f.id, f.name, f.type) for f in s.fields]
        for sv, s in hist_src.schema_history.items()
    }
    keys = list(proj.key_cols)
    removed, added = snapshot_file_delta(snap_from, snap_to)
    mor = (
        not removed
        and bool(added)
        and all(f.kind == "delta" for f in added)
        and os.environ.get("PANORAMA_CHANGES_MOR_FAST", "1") != "0"
    )
    parts: list[ChangesPartition] = []
    if mor:
        by_bucket: dict[int, list] = {}
        for f in added:
            by_bucket.setdefault(f.bucket, []).append(f)
        for b, dfs in sorted(by_bucket.items()):
            parts.append(
                ChangesPartition(
                    bucket=b,
                    old_files=_pack_files(snap_from.files_in_buckets({b})),
                    new_files=_pack_files(dfs),
                    mor=True,
                    root=root,
                    target_fields=target,
                    histories=histories,
                    key_cols=keys,
                    version=snap_to.version if include_version else None,
                )
            )
    else:
        for b in sorted(snapshot_changed_buckets(snap_from, snap_to)):
            parts.append(
                ChangesPartition(
                    bucket=b,
                    old_files=_pack_files(snap_from.files_in_buckets({b})),
                    new_files=_pack_files(snap_to.files_in_buckets({b})),
                    mor=False,
                    root=root,
                    target_fields=target,
                    histories=histories,
                    key_cols=keys,
                    version=snap_to.version if include_version else None,
                )
            )
    return parts


def _empty_changes_partition(root: str, snap: Snapshot) -> ChangesPartition:
    return ChangesPartition(
        bucket=-1,
        old_files=[],
        new_files=[],
        mor=False,
        root=root,
        target_fields=[(f.id, f.name, f.type, f.default) for f in snap.schema.fields],
        histories={
            sv: [(f.id, f.name, f.type) for f in s.fields]
            for sv, s in snap.schema_history.items()
        },
        key_cols=list(snap.key_cols),
    )


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------


def _resolve_version_option(log: SnapshotLog, root: str, options) -> int | None:
    """``version`` (numeric) or ``ref`` (a tag name in ``_meta/refs.json``,
    ``LakeTable.tag``) → snapshot version; None = current."""
    version = options.get("version")
    ref = options.get("ref")
    if ref is not None:
        if version is not None:
            raise ValueError("pass version or ref, not both")
        import json
        import os as _os

        refs = json.loads(log.io.read_text(_os.path.join(root, "_meta", "refs.json")))
        if ref not in refs:
            raise KeyError(f"unknown ref {ref!r}; known: {sorted(refs)}")
        return int(refs[ref])
    return None if version is None else int(version)


class PanoramaReader(DataSourceReader):
    """State read: the table's committed rows at a snapshot."""

    def __init__(self, root: str, options):
        self.root = root
        log = SnapshotLog(root)
        if not log.exists():
            raise FileNotFoundError(f"no lake table at {root}")
        self._io = log.io  # planning-time metadata IO (bloom sidecars)
        version = _resolve_version_option(log, root, options)
        self.snap = (
            log.read_current() if version is None else log.read_version(int(version))
        )
        assert self.snap is not None
        self.with_deltas = str(options.get("with_deltas", "true")).lower() != "false"
        self._allowed_buckets: set[int] | None = None
        self._key_fingerprints: list[int] | None = None
        self._preds: list[tuple[str, str, object]] = []
        try:  # session tz for naive-datetime predicate coercion
            from pyspark.sql import SparkSession

            s = SparkSession.getActiveSession()
            self._session_tz = (
                s.conf.get("spark.sql.session.timeZone") if s else None
            )
        except Exception:
            self._session_tz = None

    # ------------------------------------------------------------ pruning

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Two metadata-level prunes from pushed predicates, both
        planning-only (every filter returns *unhandled*, Spark re-applies
        the full predicate, so pruning can never change results):

        * **bucket pruning** — when every key column is pinned to a
          finite value set (``EqualTo`` / ``In``), the Murmur3 bucket of
          each combination is computed driver-side and the scan keeps
          only those buckets' partitions — a point lookup touches one
          bucket's files (a key's rows live only in its hash bucket,
          the merge writes with the identical hash,
          ``table.bucket_expr``);
        * **zone-map file skipping** — comparison/null predicates
          translate to ``lakehouse/filestats`` containment checks
          against each file's manifest-stored [min,max,nulls] stats
          (``_prune_files_for_state`` carries the merge-on-read safety
          rule: payload predicates prune base files only).
        """
        snap = self.snap
        for f in filters:
            if len(f.attribute) != 1:
                continue
            col = f.attribute[0]
            if isinstance(f, EqualTo):
                self._preds.append((col, "eq", f.value))
            elif isinstance(f, GreaterThan):
                self._preds.append((col, "gt", f.value))
            elif isinstance(f, GreaterThanOrEqual):
                self._preds.append((col, "ge", f.value))
            elif isinstance(f, LessThan):
                self._preds.append((col, "lt", f.value))
            elif isinstance(f, LessThanOrEqual):
                self._preds.append((col, "le", f.value))
            elif isinstance(f, In):
                self._preds.append((col, "in", list(f.value)))
            elif isinstance(f, IsNull):
                self._preds.append((col, "isnull", None))
            elif isinstance(f, IsNotNull):
                self._preds.append((col, "notnull", None))
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
            # timestamp hygiene: Spark 4.1's pushdown delivers aware-UTC
            # datetimes (hash correctly as instants), but a NAIVE value
            # (other builds / direct reader use) would be hashed as UTC
            # wall time — normalize with the session tz when known
            # (LakeTable.read_where parity) and otherwise DISABLE
            # key-hash pruning rather than plan the wrong bucket
            from ..lakehouse.table import normalize_key_value_sets

            value_sets = normalize_key_value_sets(
                value_sets, types_by_col, self._session_tz
            )
            if value_sets is not None and set(value_sets) == set(snap.key_cols):
                combos = 1
                for vs in value_sets.values():
                    combos *= len(vs)
                if combos <= _MAX_PRUNE_COMBOS:
                    types = [types_by_col[c] for c in snap.key_cols]
                    combo_list = [
                        list(combo)
                        for combo in _product(
                            *[sorted(value_sets[c]) for c in snap.key_cols]
                        )
                    ]
                    self._allowed_buckets = {
                        bucket_of(c, types, snap.n_buckets) for c in combo_list
                    }
                    # third level: per-file key bloom sidecars
                    # (lakehouse/bloom.py) probed at plan time
                    self._key_fingerprints = [
                        murmur3_hash(c, types) for c in combo_list
                    ]
        return iter(filters)  # pruning-only: Spark re-applies everything

    # --------------------------------------------------------- planning

    def partitions(self) -> list[InputPartition]:
        snap = self.snap
        files = (
            snap.files
            if self._allowed_buckets is None
            else snap.files_in_buckets(self._allowed_buckets)
        )
        if self._preds:
            from ..lakehouse.table import _prune_files_for_state, normalize_pred_tz

            files = _prune_files_for_state(
                snap, files, normalize_pred_tz(self._preds, self._session_tz)
            )
        if self._key_fingerprints:
            # bloom sidecar probe: plan only files that can hold one of
            # the pinned keys (the SAME probe implementation
            # LakeTable.read_where uses, routed through the FileIO seam —
            # a bare open() would silently lose bloom pruning on any
            # non-POSIX backend; no false negatives, a missing/unreadable
            # sidecar keeps its file)
            from ..lakehouse.bloom import sidecar_file_filter

            keep = sidecar_file_filter(self._io, self.root, self._key_fingerprints)
            files = [f for f in files if keep(f)]
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
        # Partition grain (the 100 TB read-path scale rule): a bucket
        # needs to stay ONE partition only while it holds merge-on-read
        # deltas — the LWW fold requires every row of a key in one task.
        # A delta-free (compacted) bucket's files are independent row
        # sets, so each file becomes its own input partition: scan
        # parallelism is the table's live FILE count, not its bucket
        # count, and a ~6 GB bucket no longer serializes through a
        # single Python task.
        parts: list[InputPartition] = []
        for b, fs in sorted(by_bucket.items()):
            if any(kind == "delta" for _path, _sv, kind in fs):
                parts.append(
                    BucketPartition(
                        bucket=b,
                        files=fs,
                        root=self.root,
                        target_fields=target,
                        histories=histories,
                        key_cols=list(snap.key_cols),
                    )
                )
            else:
                parts.extend(
                    BucketPartition(
                        bucket=b,
                        files=[f],
                        root=self.root,
                        target_fields=target,
                        histories=histories,
                        key_cols=list(snap.key_cols),
                    )
                    for f in fs
                )
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
        state["_io"] = None
        return state

    # ------------------------------------------------------------- read

    def read(self, partition: BucketPartition):
        import pyarrow as pa

        tf = partition.target_fields
        out_schema = pa.schema([(name, _arrow_type(t)) for _, name, t, _ in tf])
        if not partition.files:
            return iter(())
        tbl = _load_state(
            partition.root,
            partition.files,
            partition.histories,
            tf,
            partition.key_cols,
            out_schema,
        )
        return iter(tbl.to_batches(max_chunksize=1 << 16))


class PanoramaChangesReader(DataSourceReader):
    """Batch change feed: ``.option("changes_from", v)`` — the I/U/D
    rows between two snapshots, ``LakeTable.changes`` parity."""

    def __init__(self, root: str, options):
        self.root = root
        log = SnapshotLog(root)
        if not log.exists():
            raise FileNotFoundError(f"no lake table at {root}")
        self.snap_from = log.read_version(int(options.get("changes_from")))
        to_v = options.get("changes_to")
        self.snap_to = (
            log.read_current() if to_v is None else log.read_version(int(to_v))
        )
        self.include_version = (
            str(options.get("include_version", "false")).lower() == "true"
        )

    def partitions(self) -> list[InputPartition]:
        parts = _plan_changes(
            self.root, self.snap_from, self.snap_to, self.include_version
        )
        return parts or [_empty_changes_partition(self.root, self.snap_to)]

    def __getstate__(self):
        state = dict(self.__dict__)
        state["snap_from"] = state["snap_to"] = None
        return state

    def read(self, partition: ChangesPartition):
        if not partition.old_files and not partition.new_files:
            return iter(())
        return iter(
            _read_changes_partition(partition).to_batches(max_chunksize=1 << 16)
        )


class PanoramaStreamReader(DataSourceStreamReader):
    """Streaming change feed: offsets are snapshot versions; each
    micro-batch emits ``changes(start, end)`` with the same bucket-local
    kernel as the batch feed. Exactly-once downstream comes from Spark's
    offset checkpointing; this source is deterministic per (start, end)
    because snapshots and data files are immutable."""

    def __init__(self, root: str, options):
        self.root = root
        self.log = SnapshotLog(root)
        if not self.log.exists():
            raise FileNotFoundError(f"no lake table at {root}")
        self.starting_version = options.get("starting_version")
        self.include_version = (
            str(options.get("include_version", "false")).lower() == "true"
        )

    def initialOffset(self) -> dict:
        if self.starting_version is not None:
            return {"version": int(self.starting_version)}
        v = self.log.current_version()
        assert v is not None
        return {"version": v}  # forward-only by default (Delta CDF model)

    def latestOffset(self) -> dict:
        v = self.log.current_version()
        assert v is not None
        return {"version": v}

    def partitions(self, start: dict, end: dict):
        v0, v1 = int(start["version"]), int(end["version"])
        if v0 >= v1:
            return [_empty_changes_partition(self.root, self.log.read_version(v1))]
        parts = _plan_changes(
            self.root,
            self.log.read_version(v0),
            self.log.read_version(v1),
            self.include_version,
        )
        return parts or [_empty_changes_partition(self.root, self.log.read_version(v1))]

    def read(self, partition: ChangesPartition):
        if not partition.old_files and not partition.new_files:
            return iter(())
        return iter(
            _read_changes_partition(partition).to_batches(max_chunksize=1 << 16)
        )

    def commit(self, end: dict) -> None:
        pass  # snapshots are immutable; retention is expire_snapshots'

    def __getstate__(self):
        state = dict(self.__dict__)
        state["log"] = None  # read() uses only the partition payload
        return state


# ---------------------------------------------------------------------------
# writers — the lake table as a Spark sink
# ---------------------------------------------------------------------------


@dataclass
class PanoramaWriteResult(WriterCommitMessage):
    """One task's written files: (rel_path, bucket, rows, stats_json)."""

    files: list
    max_lsn: int | None = None


def _write_partition_files(
    root: str,
    rel_dir: str,
    batches,
    target_fields: list[tuple[int, str, str, object]],
    key_cols: list[str],
    key_types: list[str],
    n_buckets: int,
    delta_in: tuple[str, str] | None,
) -> tuple[list, int | None]:
    """Executor kernel: stream one task's Arrow batches into per-bucket
    parquet files under ``rel_dir``, harvesting zone-map stats from each
    file's footer at close (``footer_zone_map`` — no second data scan).
    Buckets come from the pure-Python
    Murmur3 (``functions/murmur.py``, bit-for-bit with ``F.hash``), so
    the files this interop path writes are indistinguishable from the
    library writer's. With ``delta_in = (op_col, lsn_col)`` the input's
    change columns land as ``__op``/``__lsn`` and files are
    merge-on-read deltas.

    This is the *interop* write path (Spark cannot hand a Python data
    source a pre-bucketed distribution, so each task hashes rows in
    Python and may write one file per bucket it sees); the hot path
    remains ``LakeTable.append``/``merge_batch``, which bucket with the
    JVM hash and shuffle once. Same layout, same stats, same commit."""
    import json as _json
    import os as _os
    import uuid as _uuid

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..functions.murmur import bucket_of
    from ..lakehouse.filestats import ORDERABLE_TYPES
    from ..lakehouse.table import footer_zone_map

    out_fields = [(name, _arrow_type(t)) for _, name, t, _ in target_fields]
    stat_cols = [
        (name, t, str(fid))
        for fid, name, t, _ in target_fields
        if t in ORDERABLE_TYPES
    ]
    if delta_in:
        out_fields += [("__op", pa.string()), ("__lsn", pa.int64())]
        stat_cols.append(("__lsn", "bigint", "__lsn"))
    arrow_schema = pa.schema(out_fields)
    part = _uuid.uuid4().hex[:16]
    abs_dir = _os.path.join(root, rel_dir)
    writers: dict[int, dict] = {}
    max_lsn: int | None = None

    for rb in batches:
        if rb.num_rows == 0:
            continue
        tbl = pa.Table.from_batches([rb])
        cols = []
        for name, at in out_fields:
            if delta_in and name == "__op":
                col = tbl.column(delta_in[0])
            elif delta_in and name == "__lsn":
                col = tbl.column(delta_in[1])
            else:
                col = tbl.column(name)
            if col.type != at:
                col = pc.cast(col, at)
            cols.append(col)
        tbl = pa.table(cols, schema=arrow_schema)
        if delta_in:
            m = pc.max(tbl.column("__lsn")).as_py()
            if m is not None:
                max_lsn = m if max_lsn is None else max(max_lsn, m)
        key_vals = [tbl.column(k).to_pylist() for k in key_cols]
        buckets = pa.array(
            [bucket_of(list(row), key_types, n_buckets) for row in zip(*key_vals)],
            type=pa.int32(),
        )
        for b in pc.unique(buckets).to_pylist():
            b = int(b)
            sub = tbl.filter(pc.equal(buckets, b))
            st = writers.get(b)
            if st is None:
                bucket_dir = _os.path.join(abs_dir, f"bucket={b}")
                _os.makedirs(bucket_dir, exist_ok=True)
                name = f"part-{part}.parquet"
                st = writers[b] = {
                    "writer": pq.ParquetWriter(
                        _os.path.join(bucket_dir, name),
                        arrow_schema,
                        compression="snappy",
                    ),
                    "abs_path": _os.path.join(bucket_dir, name),
                    "rel_path": f"{rel_dir}/bucket={b}/{name}",
                    "total": 0,
                }
            st["writer"].write_table(sub)
            st["total"] += sub.num_rows
    out = []
    for b, st in writers.items():
        st["writer"].close()
        # stats from the just-written footer: the encoder already
        # tracked them, one metadata read, no second data scan
        stats = footer_zone_map(pq.ParquetFile(st["abs_path"]).metadata, stat_cols)
        out.append(
            (st["rel_path"], b, st["total"], _json.dumps(stats) if stats else None)
        )
    return out, max_lsn


def _writer_plan(root: str, input_names: list[str], *, delta: bool, options):
    """Driver-side prep shared by both writers: resolve the snapshot,
    validate the incoming column set, pick the attempt dir."""
    import uuid

    log = SnapshotLog(root)
    snap = log.read_current()
    if snap is None:
        raise FileNotFoundError(
            f"no lake table at {root} — create it first (LakeTable.create)"
        )
    expected = list(snap.schema.names)
    op_col = options.get("op_col", "op")
    lsn_col = options.get("lsn_col", "lsn")
    if delta:
        expected = expected + [op_col, lsn_col]
    if sorted(input_names) != sorted(expected):
        raise ValueError(
            f"write schema mismatch: table {root} expects columns "
            f"{sorted(expected)}, got {sorted(input_names)}"
        )
    plan = {
        "root": root,
        "rel_dir": f"data/w-{uuid.uuid4().hex[:16]}",
        "target_fields": [
            (f.id, f.name, f.type, f.default) for f in snap.schema.fields
        ],
        "key_cols": list(snap.key_cols),
        "key_types": [snap.schema.field_by_name(k).type for k in snap.key_cols],
        "n_buckets": snap.n_buckets,
        "delta_in": (op_col, lsn_col) if delta else None,
        "schema_version": snap.schema.schema_version,
    }
    return plan


def _data_files_from_messages(messages, schema_version: int, kind: str):
    import json

    from ..lakehouse.snapshot import DataFile

    files = []
    for m in messages:
        if m is None:
            continue
        for rel_path, bucket, rows, stats_json in m.files:
            files.append(
                DataFile(
                    path=rel_path,
                    bucket=int(bucket),
                    rows=int(rows),
                    schema_version=schema_version,
                    kind=kind,
                    stats=json.loads(stats_json) if stats_json else None,
                )
            )
    return files


def _commit_with_retry(
    root: str,
    files,
    *,
    overwrite: bool,
    batch_id: str | None = None,
    last_lsn: int | None = None,
    retries: int = 5,
):
    """Driver-side snapshot commit. Appends commute, so a CAS loss to a
    concurrent writer just re-reads the parent and retries; the batch-id
    guard keeps a replayed streaming epoch exactly-once (same skip the
    merge path uses, ``cdc/merge.py`` ``commit_or_skip``)."""
    from pyspark.sql import SparkSession

    from ..lakehouse.snapshot import CommitConflict
    from ..lakehouse.table import LakeTable

    spark = SparkSession.getActiveSession()
    table = LakeTable(spark, root)
    last_err = None
    for _ in range(retries):
        snap = table.snapshot
        if batch_id is not None and table.is_batch_committed(batch_id, snap):
            return None  # replayed epoch: already applied, files orphan→vacuum
        replaced = {f.bucket for f in snap.files} if overwrite else set()
        try:
            return table.commit_replace_buckets(
                snap, replaced, files, batch_id=batch_id, last_lsn=last_lsn
            )
        except CommitConflict as exc:
            last_err = exc
    raise last_err


def _abort_cleanup(root: str, rel_dir: str) -> None:
    import shutil

    shutil.rmtree(os.path.join(root, rel_dir), ignore_errors=True)


class PanoramaWriter(DataSourceArrowWriter):
    """Batch write: ``df.write.format("panorama").mode("append"|
    "overwrite").save(root)``. Tasks write bucket-hashed parquet with
    zone-map stats into a per-attempt unique dir; the driver commits
    one atomic snapshot (append adds files; overwrite swaps every live
    bucket — the reference's wholesale re-upload landing,
    ``panorama_datalake.py:215-258``, at snapshot grain). A failed job
    aborts without a visible change; leftover files are vacuum's."""

    def __init__(self, root: str, options, overwrite: bool, input_names: list[str]):
        self.overwrite = overwrite
        self.plan = _writer_plan(root, input_names, delta=False, options=options)

    def write(self, iterator):
        p = self.plan
        files, _ = _write_partition_files(
            p["root"],
            p["rel_dir"],
            iterator,
            p["target_fields"],
            p["key_cols"],
            p["key_types"],
            p["n_buckets"],
            None,
        )
        return PanoramaWriteResult(files=files)

    def commit(self, messages):
        files = _data_files_from_messages(messages, self.plan["schema_version"], "base")
        if not files and not self.overwrite:
            return
        _commit_with_retry(self.plan["root"], files, overwrite=self.overwrite)

    def abort(self, messages):
        _abort_cleanup(self.plan["root"], self.plan["rel_dir"])


class PanoramaStreamSink(DataSourceStreamArrowWriter):
    """Streaming upsert sink: ``writeStream.format("panorama")`` over a
    change-event stream (table columns + ``op``/``lsn``; rename via
    ``.option("op_col"/"lsn_col", ...)``).

    Each epoch's rows land as merge-on-read *delta* files — no shuffle,
    no read of the resident table, per-epoch cost O(epoch) — and one
    atomic snapshot commit publishes them; readers LWW-fold winners per
    key and drop delete markers exactly as ``append_delta`` merges
    (``cdc/merge.py``), and ``compact()`` folds deltas down on any
    schedule. Exactly-once: the commit registers a deterministic batch
    id ``pansink:{sink_id}:{epoch}``, so a replayed epoch after a crash
    resolves to the idempotent skip; a distinct ``sink_id`` option
    namespaces multiple streams into one table. Combined with the
    streaming change feed this closes the loop: lake → readStream →
    transform → writeStream → lake is end-to-end exactly-once in pure
    ``spark.readStream/writeStream`` API."""

    def __init__(self, root: str, options, overwrite: bool, input_names: list[str]):
        if overwrite:
            raise ValueError(
                "the panorama streaming sink is append/upsert-only "
                "(outputMode('append')); complete mode is not supported"
            )
        self.sink_id = options.get("sink_id", "default")
        self.plan = _writer_plan(root, input_names, delta=True, options=options)

    def write(self, iterator):
        p = self.plan
        files, max_lsn = _write_partition_files(
            p["root"],
            p["rel_dir"],
            iterator,
            p["target_fields"],
            p["key_cols"],
            p["key_types"],
            p["n_buckets"],
            p["delta_in"],
        )
        return PanoramaWriteResult(files=files, max_lsn=max_lsn)

    def commit(self, messages, batchId: int) -> None:
        files = _data_files_from_messages(messages, self.plan["schema_version"], "delta")
        lsns = [m.max_lsn for m in messages if m is not None and m.max_lsn is not None]
        if not files:
            return
        _commit_with_retry(
            self.plan["root"],
            files,
            overwrite=False,
            batch_id=f"pansink:{self.sink_id}:{batchId}",
            last_lsn=max(lsns) if lsns else None,
        )

    def abort(self, messages, batchId: int) -> None:
        _abort_cleanup(self.plan["root"], self.plan["rel_dir"])


# ---------------------------------------------------------------------------
# the data source
# ---------------------------------------------------------------------------


class PanoramaDataSource(DataSource):
    """``format("panorama")``: read a lake table root as a DataFrame.

    Register once per session (``spark.dataSource.register``, or
    ``catalog.register_data_source``). Options select the surface:
    none/``version`` → state read; ``changes_from``/``changes_to`` →
    batch change feed; ``change_feed=true`` (readStream) → streaming
    change feed.
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
        # SQL DDL (CREATE TABLE ... USING panorama) hands the location
        # back as a file: URI; the FileIO layer works on plain paths
        if path.startswith("file:"):
            from urllib.parse import unquote, urlparse

            parsed = urlparse(path)
            path = unquote(parsed.path)
        return path

    def _is_feed(self) -> bool:
        return (
            self.options.get("changes_from") is not None
            or str(self.options.get("change_feed", "false")).lower() == "true"
        )

    def schema(self) -> StructType:
        log = SnapshotLog(self._root())
        version = _resolve_version_option(log, self._root(), self.options)
        snap = (
            log.read_current() if version is None else log.read_version(int(version))
        )
        if snap is None:
            raise FileNotFoundError(f"no lake table at {self._root()}")
        if self._is_feed():
            from_v = self.options.get("changes_from")
            proj = snap
            if from_v is not None:
                snap_from = log.read_version(int(from_v))
                if snap_from.schema.schema_version > snap.schema.schema_version:
                    proj = snap_from
            keys = list(proj.key_cols)
            struct = proj.schema.to_struct()
            version_field = (
                [StructField(CHANGE_VERSION_COL, LongType())]
                if str(self.options.get("include_version", "false")).lower() == "true"
                else []
            )
            return StructType(
                [f for f in struct.fields if f.name in keys]
                + [StructField(CHANGE_OP_COL, StringType())]
                + version_field
                + [f for f in struct.fields if f.name not in keys]
            )
        return snap.schema.to_struct()

    def reader(self, schema: StructType) -> DataSourceReader:
        if self.options.get("changes_from") is not None:
            return PanoramaChangesReader(self._root(), self.options)
        return PanoramaReader(self._root(), self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if not self._is_feed():
            raise ValueError(
                "streaming a panorama table means streaming its change feed: "
                "add .option('change_feed', 'true') so the stream's schema "
                "is the feed schema (keys, change_op, payload)"
            )
        return PanoramaStreamReader(self._root(), self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return PanoramaWriter(
            self._root(), self.options, overwrite, list(schema.fieldNames())
        )

    def streamWriter(self, schema: StructType, overwrite: bool):
        return PanoramaStreamSink(
            self._root(), self.options, overwrite, list(schema.fieldNames())
        )
