"""MERGE INTO for the bucketed lake table (copy-on-write, exactly-once).

Semantics (the reference's upsert primitive generalized to row grain,
``panorama_datalake.py:215-258``):

    WHEN MATCHED AND op='D' THEN DELETE
    WHEN MATCHED            THEN UPDATE *
    WHEN NOT MATCHED AND op<>'D' THEN INSERT *

Physical plan — ONE shuffle per batch, tuned for 10^10-event scale:

1. **Fused dedup+merge aggregate.** Existing target rows (only the
   affected buckets, tagged ``lsn = -1``) are unioned with the raw batch
   events, then a single ``groupBy(keys).agg(max_by(payload, lsn))``
   resolves duplicates, update chains, AND the merge match in one
   operator: the max-LSN row per key wins; if it is a delete the key is
   dropped; if it is the tag row the target row survives unchanged.
   The hash aggregate gets *map-side partial aggregation*, so a hot key
   collapses to ≤ one row per map partition before the exchange — the
   built-in answer to key skew (no join ever sees the raw event stream).
0. **Winner prefilter (late materialization).** When the batch shows
   significant key duplication (update chains), the LWW winner LSN per
   key is resolved first on a *slim* (keys, lsn) aggregate — ~1% of the
   bytes — and broadcast back as a filter, so only winning rows' wide
   payloads enter the exchange of step 1. Measured: ~8× shuffle-byte
   reduction; with the fused stats aggregate (one cached per-key pass
   serving pruning, lineage and the winner set) replay throughput rose
   398k → 764k ev/s on the round-1 bench config.
   Skipped automatically when the winner set exceeds the broadcast
   budget: the broadcast carries fixed 64-bit key *fingerprints*, so
   the budget is n_keys × ~32 B regardless of key width
   (``PANORAMA_PREFILTER_MAX_BYTES``, default 256 MiB;
   ``PANORAMA_PREFILTER_MAX_KEYS`` as a secondary row guard) — or when
   duplication is < 2×. The prefilter join is null-safe (NULL is a
   valid key value), so every strategy sees the same event set.
0b. **Stats off the critical path.** The slim per-key aggregate ends in
   a driver ``collect`` barrier — a *fixed cost per batch* that does
   not shrink with executors (measured: under ``local-cluster[1→4]``
   the engine captured 1.68× of the ceiling's 2.51× speedup; the
   residual was exactly these per-batch constants). Batch stats depend
   only on the batch's own events, never on table state, so
   ``CdcEngine.replay`` computes batch k+1's stats concurrently with
   batch k's merge+write (``compute_batch_stats`` + the ``stats=``
   parameter below): the serial path per batch is one merge job + one
   commit; the stats job overlaps the previous write.
2. **Exchange = bucket layout.** The aggregate's exchange is forced to
   ``n_buckets`` partitions with AQE coalescing off, so shuffle
   partition id == ``pmod(hash(keys), n_buckets)`` == storage bucket id
   (``bucket_expr`` uses the same Murmur3 family as HashPartitioning).
   The write then emits exactly one file per touched bucket with **no
   further shuffle**.
3. **Bucket pruning**: only buckets named by the batch's keys are read
   and rewritten; a batch touching k of n buckets costs O(k/n) of the
   table.
4. Commit is one atomic snapshot swap carrying data files + checkpoint
   LSN + batch id + per-bucket lineage (exactly-once: a replayed
   ``batch_id`` is detected in the snapshot and skipped).

Second physical strategy — **bucket-local merge** (``strategy=
"bucket_local"``, auto-selected when the resident side outweighs the
batch): only the *events* go through the dedup exchange; resident rows
never enter a shuffle. Because the dedup exchange is pinned to the
bucket layout, task i holds exactly the deduped events of bucket i, so
a vectorized ``mapInArrow`` stage reads bucket i's parquet file(s)
directly inside the task and applies the merge with Arrow/pandas
kernels (anti-join on keys + concat — zero per-row Python). At steady
state a CDC table is orders of magnitude larger than a batch, so not
shuffling the resident side is the dominant saving; with 1000
executors it also removes the all-to-all resident exchange entirely.
Falls back to the fused-aggregate strategy when affected buckets hold
files written under older schema versions (the JVM path maps them by
field id on read).

Third strategy — **merge-on-read** (``strategy="append_delta"``): the
deduped batch is appended as *delta* files (schema + ``__op``/``__lsn``)
through the same pinned bucket exchange; the resident table is neither
read nor rewritten, so a batch costs O(batch) regardless of how many
buckets it touches — the write-optimized mode for high-frequency small
batches. Readers fold deltas with one LWW aggregate
(``LakeTable.read``); ``LakeTable.compact()`` folds them into base
files. Copy-on-write (fused/bucket_local) stays the read-optimized
default.

Ordering note: every strategy resolves cross-batch collisions by TRUE
global LSN order. The state files persist each row's winner LSN
(``__lsn``); resident rows enter the CoW fold at that stored LSN (-1
for files written before it existed — those keep the legacy
arrival-order semantics until rewritten), and merge-on-read keeps real
LSNs in the delta files and folds base rows in at their stored LSN at
read time. Batches may therefore arrive with overlapping LSN ranges —
the streaming tail's multi-epoch file splits do — and the final state
is the same LWW answer the aligned ``CdcEngine.replay`` contract
produces.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..lakehouse.snapshot import CommitConflict
from ..lakehouse.table import LakeTable, bucket_expr, root_is_shared_posix

_DEBUG_TIMING = os.environ.get("PANORAMA_DEBUG_TIMING", "") == "1"


class _Timer:
    def __init__(self) -> None:
        self.t = time.monotonic()

    def lap(self, label: str) -> None:
        if _DEBUG_TIMING:
            now = time.monotonic()
            print(f"[merge-timing] {label}: {now - self.t:.2f}s", flush=True)
            self.t = now


@dataclass
class MergeStats:
    batch_id: str
    skipped: bool
    rows_in: int = 0
    keys_in_batch: int = 0
    rows_upserted: int = 0
    rows_deleted: int = 0
    buckets_touched: int = 0
    snapshot_version: int = -1
    strategy: str = ""  # resolved strategy (fused/bucket_local/append_delta)


_STRATEGIES = {"auto", "fused", "bucket_local", "append_delta"}


@dataclass
class BatchStats:
    """Slim per-key/per-bucket statistics of one batch (the three-consumer
    aggregate: pruning, lineage, winner-prefilter set). ``per_key`` is a
    cached DataFrame; whoever consumes the stats must unpersist it
    (``merge_batch`` always does, including on the skipped path).
    ``schema_version`` records the table schema the events were conformed
    to when the stats ran ahead of time (None = no registry in play);
    ``CdcEngine.apply_batch`` discards stats whose version does not match
    the schema actually current at apply time."""

    per_key: DataFrame
    per_bucket: dict
    schema_version: int | None = None


def batch_events(batch_df: DataFrame, snap, op_col: str = "op", lsn_col: str = "lsn") -> DataFrame:
    """The merge's canonical event projection for a batch — shared by
    ``merge_batch`` and the stats prefetch so both sides aggregate the
    exact same rows."""
    keys = snap.key_cols
    payload_cols = [c for c in snap.schema.names if c not in keys]
    return batch_df.select(
        *keys, *payload_cols, F.col(op_col), F.col(lsn_col).cast("long")
    )


def compute_batch_stats(
    events: DataFrame,
    snap,
    op_col: str = "op",
    lsn_col: str = "lsn",
    size_hint_rows: int | None = None,
) -> BatchStats:
    """ONE slim aggregate over (keys, op, lsn) serving three consumers:
    affected-bucket discovery (pruning), per-bucket lineage stats
    (collected: <= n_buckets rows), and — cached — the winner set for
    the prefilter, so the merge job never re-scans the raw batch for
    it. Exact key counts come free (the groupBy is per key anyway).
    ``__winop`` is the *outcome* op per key (the max-LSN event's op), so
    lineage counts outcomes, not raw delete events: a D→U chain is one
    upsert, a multi-D chain is one delete.

    ``size_hint_rows`` (the engine passes its batch size): when the
    batch is below the prefilter's minimum-rows gate, per_key is left
    UNPERSISTED — nothing will re-read it, and materializing an AQE
    aggregate into the memory store measured ~0.4 s of pure overhead
    per small batch (round-6 guide §1 isolation). Bulk batches keep the
    cache: the prefilter's winner broadcast reads it instead of
    re-scanning the raw batch.

    Depends only on the batch's events — never on table state — so it
    is safe to run ahead of time, overlapped with the previous batch's
    merge job (see ``CdcEngine.replay``).
    """
    keys = snap.key_cols
    cache = size_hint_rows is None or size_hint_rows >= int(
        os.environ.get("PANORAMA_PREFILTER_MIN_ROWS", "100000")
    )
    per_key = events.groupBy(*keys).agg(
        F.max(lsn_col).alias("__maxlsn"),
        F.min(lsn_col).alias("__lsnlo"),
        F.count("*").alias("__cnt"),
        F.max_by(F.col(op_col), F.col(lsn_col)).alias("__winop"),
    )
    if cache:
        per_key = per_key.persist()
    per_bucket = {
        r["__b"]: r
        for r in per_key.groupBy(bucket_expr(keys, snap.n_buckets).alias("__b"))
        .agg(
            F.sum("__cnt").alias("rows_in"),
            F.count("*").alias("keys"),
            F.sum((F.col("__winop") == "D").cast("long")).alias("deletes"),
            F.min("__lsnlo").alias("lsn_lo"),
            F.max("__maxlsn").alias("lsn_hi"),
        )
        .collect()
    }
    return BatchStats(per_key=per_key, per_bucket=per_bucket)


def _resolve_requested_strategy(arg: str) -> str:
    """Explicit argument wins; PANORAMA_MERGE_STRATEGY only fills in when
    the caller left the default ("auto"). Unknown values raise instead of
    silently degrading to the fused path."""
    env = os.environ.get("PANORAMA_MERGE_STRATEGY")
    requested = arg if arg and arg != "auto" else (env or "auto")
    if requested not in _STRATEGIES:
        raise ValueError(
            f"unknown merge strategy {requested!r} (from "
            f"{'PANORAMA_MERGE_STRATEGY' if requested == env else 'argument'}); "
            f"expected one of {sorted(_STRATEGIES)}"
        )
    return requested


@contextmanager
def _pinned_shuffle(spark, n_partitions: int):
    """Pin the aggregate exchange to the bucket count (and stop AQE from
    coalescing it) so shuffle partition id == bucket id for the write.

    Guarded by the per-session conf lock (``table._session_conf_lock``,
    reentrant — the write's own arrow-batch pinning nests inside): two
    threads on one session interleaving their set/restore windows would
    otherwise leave the pinned values stuck session-wide. Cross-session
    work (the async-compaction thread runs on a cloned session) never
    contends."""
    from ..lakehouse.table import _session_conf_lock

    with _session_conf_lock(spark):
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        old_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
            spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_coalesce)


def _bucket_local_map_fn(
    bucket_paths: dict[int, list[str]],
    key_cols: list[str],
    out_names: list[str],
    op_col: str,
    arrow_schema,
    max_batch_rows: int = 1 << 16,
):
    """Build the mapInArrow kernel for the bucket-local merge.

    Each input partition carries the LWW-deduped events of exactly one
    bucket (the dedup exchange is pinned to the bucket layout). The
    kernel reads that bucket's resident parquet file(s) locally, drops
    resident rows *genuinely overwritten* by the batch — the event's
    LSN must be ≥ the resident row's stored winner LSN (``__lsn``,
    -1 for files predating it), so out-of-order batches resolve by true
    LSN, matching the fused path — appends the applied events (delete
    winners become tombstone rows, ``__op='D'``), and streams Arrow
    batches back out. ``out_names`` includes ``__op``/``__lsn``;
    resident rows keep their stored values, applied events carry their
    own. Everything is Arrow/pandas kernels — no per-row Python.
    """

    def fn(batches):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        # ArrowDtype end-to-end: exact types, null-safe (an int32 column
        # with nulls never decays to float64 on the pandas hop)
        dfs = [b.to_pandas(types_mapper=pd.ArrowDtype) for b in batches]
        if not dfs:
            return
        ev = pd.concat(dfs, ignore_index=True) if len(dfs) > 1 else dfs[0]
        if ev.empty:
            return
        bucket = int(ev["__b"].iloc[0])
        # partition-layout invariant: one bucket per task (violated only
        # if an exchange re-planned under us — fail loudly, not silently)
        if not (ev["__b"] == bucket).all():
            raise RuntimeError("bucket-local merge: mixed buckets in one partition")
        parts = []
        paths = bucket_paths.get(bucket, [])
        ev_keep = pd.Series(True, index=ev.index)
        if paths:
            res_parts = []
            for p in paths:
                pf = pq.ParquetFile(p)
                have = set(pf.schema_arrow.names)
                cols = [c for c in out_names if c in have]
                t = pf.read(columns=cols)
                if "__op" not in t.column_names:
                    # file predates stored system columns: legacy tags
                    t = t.append_column("__op", pa.array(["E"] * len(t), pa.string()))
                if "__lsn" not in t.column_names:
                    t = t.append_column("__lsn", pa.array([-1] * len(t), pa.int64()))
                res_parts.append(t.select(out_names))
            res_tbl = pa.concat_tables(res_parts)
            res = res_tbl.to_pandas(types_mapper=pd.ArrowDtype)
            res["__op"] = res["__op"].fillna("E")
            res["__lsn"] = res["__lsn"].fillna(-1)
            # pandas merges (not MultiIndex.isin) so NULL keys match
            # like Spark's groupBy; per-key LSN comparison both ways:
            # the resident (incl. tombstones) survives iff strictly
            # newer than the batch's winner for its key, the event
            # applies iff ≥ the resident.
            evk = ev[key_cols + ["__evl"]].drop_duplicates(subset=key_cols)
            m = res[key_cols].merge(evk, on=key_cols, how="left")
            m_evl = m["__evl"].astype("float64").to_numpy()  # NaN = no event
            res_lsn = res["__lsn"].astype("float64").to_numpy()
            import numpy as np

            res_keep = np.isnan(m_evl) | (res_lsn > m_evl)
            parts.append(res[res_keep])
            resk = res[key_cols + ["__lsn"]].rename(columns={"__lsn": "__rl"})
            m2 = ev[key_cols].merge(resk, on=key_cols, how="left")
            m2_rl = m2["__rl"].astype("float64").to_numpy()
            ev_lsn = ev["__evl"].astype("float64").to_numpy()
            ev_keep = pd.Series(
                np.isnan(m2_rl) | (ev_lsn >= m2_rl), index=ev.index
            )
        # applied delete winners become tombstone rows (kept, hidden
        # from user reads) so a later out-of-order update cannot
        # resurrect them
        live = ev[ev_keep.to_numpy()]
        if not live.empty:
            live = live.rename(columns={op_col: "__op", "__evl": "__lsn"})
            parts.append(live[out_names])
        parts = [p for p in parts if not p.empty]
        if not parts:
            return
        out = pd.concat(parts, ignore_index=True)[out_names] if len(parts) > 1 else parts[0][out_names]
        tbl = pa.Table.from_pandas(out, schema=arrow_schema, preserve_index=False)
        for rb in tbl.to_batches(max_chunksize=max_batch_rows):
            yield rb

    return fn


def commit_or_skip(table: LakeTable, parent, *commit_args, batch_id: str, **commit_kwargs):
    """Commit; on a CAS conflict, resolve the exactly-once race.

    Two writers submitting the *same deterministic batch id* (a retried
    job, a failed-over driver) race on version N; the loser's
    ``CommitConflict`` here means the batch may already be in. If the
    winning snapshot carries ``batch_id``, the loser's work is redundant
    by construction (same id ⇒ same LSN range ⇒ same resolved state) —
    return (current snapshot, skipped=True) and let ``vacuum`` reap the
    loser's unreferenced files. A *different* batch that invalidated
    this merge's inputs (moved the LSN checkpoint, or touched the
    replaced buckets with anything but fold-forward deltas) is a real
    lost update and re-raises; a provably-disjoint concurrent commit —
    a compaction landing mid-merge, a delta append racing a compaction
    — rebases onto the fresh snapshot instead
    (``LakeTable._rebase``), so maintenance never blocks ingestion.
    """
    try:
        snap = table.commit_replace_buckets(
            parent, *commit_args, batch_id=batch_id, retry_on_conflict=True,
            **commit_kwargs
        )
        return snap, False
    except CommitConflict:
        cur = table.snapshot
        if table.is_batch_committed(batch_id, cur):
            return cur, True
        raise


def merge_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: str,
    *,
    op_col: str = "op",
    lsn_col: str = "lsn",
    pre_dedupe=None,
    strategy: str = "auto",
    stats: BatchStats | None = None,
) -> MergeStats:
    timer = _Timer()
    snap = table.snapshot
    if table.is_batch_committed(batch_id, snap):
        # exactly-once guard: deterministic batch id already applied
        if stats is not None:
            stats.per_key.unpersist()
        return MergeStats(batch_id=batch_id, skipped=True, snapshot_version=snap.version)
    if stats is not None and pre_dedupe is not None:
        # invalid call, but the caller handed us a cached aggregate —
        # release it before raising (every exit path must unpersist)
        stats.per_key.unpersist()
        raise ValueError("precomputed stats cannot be combined with pre_dedupe")

    keys = snap.key_cols
    data_cols = snap.schema.names
    payload_cols = [c for c in data_cols if c not in keys]

    events = batch_events(batch_df, snap, op_col, lsn_col)
    if pre_dedupe is not None:
        # compat/bench path: explicit standalone dedupe before the merge
        events = pre_dedupe(events, keys, lsn_col)

    if stats is None:
        stats = compute_batch_stats(events, snap, op_col, lsn_col)
    per_key, per_bucket = stats.per_key, stats.per_bucket
    timer.lap("stats_agg")
    affected = set(per_bucket)
    if not affected:
        per_key.unpersist()
        new_snap, lost_race = commit_or_skip(
            table, snap, set(), [], batch_id=batch_id, lineage_rows=[]
        )
        return MergeStats(
            batch_id=batch_id, skipped=lost_race, snapshot_version=new_snap.version
        )

    # everything below may raise (bad strategy, failed write/commit);
    # the finally guarantees the cached per-key stats never leak
    try:
        # strategy resolution: the bucket-local path needs every affected
        # bucket's files at the current schema version (it reads them with
        # pyarrow, bypassing the JVM field-id mapping) and only pays off
        # when the resident side outweighs the batch.
        strategy = _resolve_requested_strategy(strategy)
        # O(touched) metadata: loads only the manifests covering the
        # affected buckets, never the whole table's file inventory
        affected_files = snap.files_in_buckets(affected)
        if strategy == "auto":
            uniform_schema = all(
                f.schema_version == snap.schema.schema_version and f.kind == "base"
                for f in affected_files
            )
            resident_rows = sum(f.rows for f in affected_files)
            rows_in_total = sum(int(r["rows_in"]) for r in per_bucket.values())
            # bucket_local removes the resident-side exchange — a win only
            # where the exchange crosses executor JVMs. Under plain local[N]
            # the shuffle is an in-memory copy and the Arrow hop costs more
            # (measured 2x slower at 6M resident / 1M batch), so auto picks
            # it only with real executors (incl. local-cluster), a
            # resident-dominated merge, and a root every executor can read
            # as a POSIX path (see table.root_is_shared_posix).
            master = table.spark.sparkContext.master
            single_jvm = master == "local" or master.startswith("local[")
            strategy = (
                "bucket_local"
                if uniform_schema
                and not single_jvm
                and resident_rows > rows_in_total
                and root_is_shared_posix(table.root)
                else "fused"
            )
        elif strategy == "bucket_local" and any(
            f.schema_version != snap.schema.schema_version or f.kind != "base"
            for f in affected_files
        ):
            # correctness guard: old-version files need JVM field-id mapping,
            # and delta files need the read path's LWW fold
            strategy = "fused"

        # Late materialization (all strategies): when the batch has
        # significant key duplication (CDC update chains — the common case),
        # resolve the LWW winner on a *slim* (keys, lsn) aggregate first,
        # broadcast the winner set, and let only winning rows' wide payloads
        # into the downstream exchange. Shuffle bytes shrink by the dup
        # ratio (~8x measured at the bench's Zipf spec); the slim pre-agg
        # shuffles ~1% of the bytes. Skipped when the winner set is too big
        # to broadcast or there is nothing to collapse. The broadcast
        # budget is *bytes*: the winner set carries fixed 64-bit key
        # fingerprints (xxhash64), so its size is n_keys × ~32 B
        # regardless of key width; PANORAMA_PREFILTER_MAX_KEYS stays as
        # a secondary row guard.
        rows_in_total = sum(int(r["rows_in"]) for r in per_bucket.values())
        n_keys = int(sum(int(r["keys"]) for r in per_bucket.values()))
        # size hint for the write path choice: small outputs skip the
        # Arrow task-writer (worker-spawn overhead dominates there)
        resident_rows_total = sum(f.rows for f in affected_files)
        prefilter_max = int(os.environ.get("PANORAMA_PREFILTER_MAX_KEYS", "4000000"))
        prefilter_max_bytes = int(
            os.environ.get("PANORAMA_PREFILTER_MAX_BYTES", str(256 << 20))
        )
        # the prefilter's fixed cost is one broadcast build + probe per
        # batch (~0.2 s locally); its saving scales with the batch's
        # shuffle bytes, so below ~10^5 rows it is pure overhead —
        # measured round 6: gating it cut ~0.3-0.5 s off every small
        # fixture batch while the 4M-row bench batches keep it (guide
        # §1.2: config thresholds after the algorithm is right)
        prefilter_min_rows = int(
            os.environ.get("PANORAMA_PREFILTER_MIN_ROWS", "100000")
        )
        # the broadcast carries 64-bit key *fingerprints*, so its size is
        # exactly n_keys × ~32 B regardless of key width — a wide
        # composite string key can no longer blow the driver past the
        # byte budget
        if (
            0 < n_keys <= prefilter_max
            and n_keys * 32 <= prefilter_max_bytes
            and rows_in_total >= 2 * n_keys
            and rows_in_total >= prefilter_min_rows
        ):
            # Fingerprint semi-filter: events keep a row iff
            # (xxhash64(keys), lsn) appears in the winner set. Safe by
            # construction — the downstream max_by re-resolves exactly,
            # so a hash collision only lets a harmless extra row through
            # (and can never drop a winner: its own fingerprint is
            # present). Null-safe: xxhash64 hashes NULL deterministically
            # on both sides, so NULL-keyed events — valid groupBy keys —
            # survive, and the lsn comparison is <=> (a key whose every
            # lsn is NULL keeps its rows and defers to max_by). ~32 B per
            # key beats broadcasting the key columns themselves by the
            # key width, and the probe compares one long, not a composite
            # string tuple.
            kh = F.xxhash64(*[F.col(c) for c in keys])
            winners = per_key.select(  # already cached above
                F.xxhash64(*[F.col(c) for c in keys]).alias("__kh"), "__maxlsn"
            )
            events = (
                events.join(F.broadcast(winners), on=kh == F.col("__kh"))
                .filter(F.col(lsn_col).eqNullSafe(F.col("__maxlsn")))
                .drop("__kh", "__maxlsn")
            )
            timer.lap("winner_prefilter_plan")

        winner = F.max_by(
            F.struct(*[F.col(c) for c in payload_cols], F.col(op_col)), F.col(lsn_col)
        ).alias("__w")
        new_version = snap.version + 1
        replaced_buckets = affected
        if strategy == "append_delta":
            # Merge-on-read write path: dedupe the batch (same pinned
            # exchange = bucket layout) and append the winners as *delta*
            # files carrying (__op, __lsn) — the resident table is neither
            # read nor rewritten, so per-batch cost is O(batch), not
            # O(touched buckets). Readers fold deltas (LakeTable.read);
            # LakeTable.compact() folds them into base files.
            with _pinned_shuffle(table.spark, snap.n_buckets):
                deduped = (
                    events.groupBy(*keys)
                    .agg(winner, F.max(lsn_col).alias("__lsn"))
                    .select(
                        *keys,
                        *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
                        F.col(f"__w.{op_col}").alias("__op"),
                        F.col("__lsn"),
                    )
                )
                new_files = table.write_bucket_files(
                    deduped,
                    new_version,
                    pre_partitioned=True,
                    kind="delta",
                    size_hint_rows=n_keys,
                )
            replaced_buckets = set()  # pure append: nothing replaced
        elif strategy == "bucket_local":
            from pyspark.sql import types as T
            from pyspark.sql.pandas.types import to_arrow_schema

            bucket_paths: dict[int, list[str]] = {}
            for f in affected_files:
                bucket_paths.setdefault(int(f.bucket), []).append(
                    os.path.join(table.root, f.path)
                )
            out_struct = T.StructType(
                list(snap.schema.to_struct().fields)
                + [
                    T.StructField("__op", T.StringType()),
                    T.StructField("__lsn", T.LongType()),
                ]
            )
            out_names = list(data_cols) + ["__op", "__lsn"]
            with _pinned_shuffle(table.spark, snap.n_buckets):
                deduped = (
                    events.groupBy(*keys)
                    .agg(winner, F.max(lsn_col).alias("__evl"))
                    .select(
                        *keys,
                        *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
                        F.col(f"__w.{op_col}").alias(op_col),
                        F.col("__evl"),
                    )
                    .withColumn("__b", bucket_expr(keys, snap.n_buckets))
                )
                merged = deduped.mapInArrow(
                    _bucket_local_map_fn(
                        bucket_paths,
                        list(keys),
                        out_names,
                        op_col,
                        to_arrow_schema(out_struct),
                    ),
                    out_struct,
                )
                new_files = table.write_bucket_files(
                    merged,
                    new_version,
                    pre_partitioned=True,
                    size_hint_rows=resident_rows_total + n_keys,
                )
        else:
            # existing rows of the affected buckets at their *stored*
            # system columns (op 'E'/-1 for rows written before they
            # were persisted): a batch event beats the resident row only
            # when genuinely newer, so out-of-order batches — the
            # streaming tail's multi-epoch file splits — resolve by true
            # LSN instead of arrival order. Delete winners are KEPT as
            # hidden tombstone rows (user reads drop them) so a late
            # update cannot resurrect a newer delete; the winner's
            # (__op, __lsn) are written back for the next merge/read.
            resident = table.read(buckets=affected, with_lsn=True).select(
                *keys,
                *payload_cols,
                F.col("__op").alias(op_col),
                F.col("__lsn").alias(lsn_col),
            )
            unioned = resident.unionByName(events)
            with _pinned_shuffle(table.spark, snap.n_buckets):
                merged = (
                    unioned.groupBy(*keys)
                    .agg(winner, F.max(lsn_col).alias("__lsn"))
                    .select(
                        *keys,
                        *[F.col(f"__w.{c}").alias(c) for c in payload_cols],
                        F.col(f"__w.{op_col}").alias("__op"),
                        F.col("__lsn"),
                    )
                )
                new_files = table.write_bucket_files(
                    merged,
                    new_version,
                    pre_partitioned=True,
                    size_hint_rows=resident_rows_total + n_keys,
                )
        timer.lap(f"merge_write[{strategy}]")

        upserted = int(sum(max(r["keys"] - r["deletes"], 0) for r in per_bucket.values()))
        deleted = int(sum(r["deletes"] for r in per_bucket.values()))
        lineage_rows = [
            {
                "batch_id": batch_id,
                "bucket": int(b),
                "lsn_lo": int(per_bucket[b]["lsn_lo"]),
                "lsn_hi": int(per_bucket[b]["lsn_hi"]),
                "rows_in": int(per_bucket[b]["rows_in"]),
                "rows_upserted": int(max(per_bucket[b]["keys"] - per_bucket[b]["deletes"], 0)),
                "rows_deleted": int(per_bucket[b]["deletes"]),
                "snapshot_version": new_version,
            }
            for b in sorted(affected)
        ]
        batch_max_lsn = max(int(per_bucket[b]["lsn_hi"]) for b in affected)
        new_snap, lost_race = commit_or_skip(
            table,
            snap,
            replaced_buckets,
            new_files,
            last_lsn=max(snap.last_lsn, batch_max_lsn),
            batch_id=batch_id,
            lineage_rows=lineage_rows,
        )
        timer.lap("commit")
        if lost_race:
            # an identical concurrent retry won the CAS: its state is the
            # one this merge would have produced; our files stay
            # unreferenced (vacuum reaps them)
            return MergeStats(
                batch_id=batch_id, skipped=True, snapshot_version=new_snap.version
            )
        return MergeStats(
            batch_id=batch_id,
            skipped=False,
            rows_in=int(sum(r["rows_in"] for r in per_bucket.values())),
            keys_in_batch=int(sum(r["keys"] for r in per_bucket.values())),
            rows_upserted=upserted,
            rows_deleted=deleted,
            buckets_touched=len(affected),
            snapshot_version=new_snap.version,
            strategy=strategy,
        )
    finally:
        per_key.unpersist()
