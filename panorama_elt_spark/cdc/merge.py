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
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..lakehouse.table import LakeTable, bucket_expr

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


@contextmanager
def _pinned_shuffle(spark, n_partitions: int):
    """Pin the aggregate exchange to the bucket count (and stop AQE from
    coalescing it) so shuffle partition id == bucket id for the write."""
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    old_coalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_partitions))
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", old_coalesce)


def merge_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: str,
    *,
    op_col: str = "op",
    lsn_col: str = "lsn",
    pre_dedupe=None,
) -> MergeStats:
    timer = _Timer()
    snap = table.snapshot
    if batch_id in snap.committed_batches:
        # exactly-once guard: deterministic batch id already applied
        return MergeStats(batch_id=batch_id, skipped=True, snapshot_version=snap.version)

    keys = snap.key_cols
    data_cols = snap.schema.names
    payload_cols = [c for c in data_cols if c not in keys]

    events = batch_df.select(*keys, *payload_cols, F.col(op_col), F.col(lsn_col).cast("long"))
    if pre_dedupe is not None:
        # compat/bench path: explicit standalone dedupe before the merge
        events = pre_dedupe(events, keys, lsn_col)

    # per-bucket batch stats (tiny agg: ≤ n_buckets rows collected);
    # doubles as affected-bucket discovery for pruning.
    per_bucket = {
        r["__b"]: r
        for r in events.groupBy(bucket_expr(keys, snap.n_buckets).alias("__b"))
        .agg(
            F.count("*").alias("rows_in"),
            # metrics-only: HLL sketch is one-pass partial-aggregated,
            # unlike exact count_distinct's two-stage expand
            F.approx_count_distinct(F.concat_ws("\u0001", *keys)).alias("keys"),
            F.sum((F.col(op_col) == "D").cast("long")).alias("deletes"),
            F.min(lsn_col).alias("lsn_lo"),
            F.max(lsn_col).alias("lsn_hi"),
        )
        .collect()
    }
    timer.lap("stats_agg")
    affected = set(per_bucket)
    if not affected:
        new_snap = table.commit_replace_buckets(
            snap, set(), [], batch_id=batch_id, lineage_rows=[]
        )
        return MergeStats(batch_id=batch_id, skipped=False, snapshot_version=new_snap.version)

    # existing rows of the affected buckets, tagged to lose every tie:
    # any batch event (lsn ≥ 0) beats the resident row (lsn = -1).
    resident = table.read(buckets=affected).select(
        *keys,
        *payload_cols,
        F.lit("E").alias(op_col),
        F.lit(-1).cast("long").alias(lsn_col),
    )
    unioned = resident.unionByName(events)

    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols], F.col(op_col)), F.col(lsn_col)
    ).alias("__w")
    with _pinned_shuffle(table.spark, snap.n_buckets):
        merged = (
            unioned.groupBy(*keys)
            .agg(winner)
            .filter(F.col(f"__w.{op_col}") != "D")
            .select(*keys, *[F.col(f"__w.{c}").alias(c) for c in payload_cols])
        )
        new_version = snap.version + 1
        new_files = table.write_bucket_files(merged, new_version, pre_partitioned=True)
    timer.lap("merge_write")

    upserted = int(sum(max(r["keys"] - r["deletes"], 0) for r in per_bucket.values()))
    deleted = int(sum(r["deletes"] for r in per_bucket.values()))
    lineage_rows = [
        {
            "batch_id": batch_id,
            "bucket": int(b),
            "lsn_lo": int(per_bucket[b]["lsn_lo"]),
            "lsn_hi": int(per_bucket[b]["lsn_hi"]),
            "rows_in": int(per_bucket[b]["rows_in"]),
            # keys is an HLL estimate → upserted is approximate (metrics)
            "rows_upserted": int(max(per_bucket[b]["keys"] - per_bucket[b]["deletes"], 0)),
            "rows_deleted": int(per_bucket[b]["deletes"]),
            "snapshot_version": new_version,
        }
        for b in sorted(affected)
    ]
    batch_max_lsn = max(int(per_bucket[b]["lsn_hi"]) for b in affected)
    new_snap = table.commit_replace_buckets(
        snap,
        affected,
        new_files,
        last_lsn=max(snap.last_lsn, batch_max_lsn),
        batch_id=batch_id,
        lineage_rows=lineage_rows,
    )
    timer.lap("commit")
    return MergeStats(
        batch_id=batch_id,
        skipped=False,
        rows_in=int(sum(r["rows_in"] for r in per_bucket.values())),
        keys_in_batch=int(sum(r["keys"] for r in per_bucket.values())),
        rows_upserted=upserted,
        rows_deleted=deleted,
        buckets_touched=len(affected),
        snapshot_version=new_snap.version,
    )
