"""MERGE INTO for the bucketed lake table (copy-on-write, exactly-once).

Semantics (the reference's upsert primitive generalized to row grain,
``panorama_datalake.py:215-258``):

    WHEN MATCHED AND op='D' THEN DELETE
    WHEN MATCHED            THEN UPDATE *
    WHEN NOT MATCHED AND op<>'D' THEN INSERT *

Physical plan, tuned for 10^10-event scale:

1. **Dedup first, then merge** (SURVEY.md §7.4(2)): the batch collapses
   to ≤ #distinct-keys rows *before* touching the table, so the merge
   join's streamed side is bounded by keyspace, not event count, and key
   skew never reaches the join.
2. **Bucket pruning**: only buckets hit by the batch's keys are read and
   rewritten. A batch touching k of n buckets costs O(k/n) of the table.
3. The anti-join that drops overwritten target rows co-partitions on the
   same key columns the table is bucketed by; AQE picks broadcast when
   the deduped batch is small (the common case), else a shuffled hash
   join with skew splitting.
4. Commit is one atomic snapshot swap carrying data files + checkpoint
   LSN + batch id + lineage (exactly-once: a replayed ``batch_id`` is
   detected in the snapshot and skipped).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..lakehouse.table import LakeTable, bucket_expr
from .dedupe import lww_dedupe_agg


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


def merge_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: str,
    *,
    op_col: str = "op",
    lsn_col: str = "lsn",
    dedupe=lww_dedupe_agg,
) -> MergeStats:
    snap = table.snapshot
    if batch_id in snap.committed_batches:
        # exactly-once guard: deterministic batch id already applied
        return MergeStats(batch_id=batch_id, skipped=True, snapshot_version=snap.version)

    keys = snap.key_cols
    data_cols = snap.schema.names
    payload_cols = [c for c in data_cols if c not in keys]

    deduped = dedupe(
        batch_df.select(*keys, op_col, lsn_col, *payload_cols), keys, lsn_col
    ).withColumn("__b", bucket_expr(keys, snap.n_buckets))
    deduped = deduped.localCheckpoint(eager=True)  # cut lineage; reused 3x below

    # per-bucket batch stats (tiny: deduped is ≤ #keys rows)
    per_bucket = {
        r["__b"]: r
        for r in deduped.groupBy("__b")
        .agg(
            F.count("*").alias("keys"),
            F.sum((F.col(op_col) == "D").cast("long")).alias("deletes"),
            F.min(lsn_col).alias("lsn_lo"),
            F.max(lsn_col).alias("lsn_hi"),
        )
        .collect()
    }
    affected = set(per_bucket)
    if not affected:
        new_snap = table.commit_replace_buckets(
            snap, set(), [], batch_id=batch_id, lineage_rows=[]
        )
        return MergeStats(batch_id=batch_id, skipped=False, snapshot_version=new_snap.version)

    target = table.read(buckets=affected)
    survivors = target.join(deduped.select(*keys), on=keys, how="left_anti")
    upserts = deduped.filter(F.col(op_col) != "D").select(*data_cols)
    merged = survivors.unionByName(upserts)

    new_version = snap.version + 1
    new_files = table.write_bucket_files(merged, new_version)

    upserted = int(sum(per_bucket[b]["keys"] - per_bucket[b]["deletes"] for b in affected))
    deleted = int(sum(per_bucket[b]["deletes"] for b in affected))
    lineage_rows = [
        {
            "batch_id": batch_id,
            "bucket": int(b),
            "lsn_lo": int(per_bucket[b]["lsn_lo"]),
            "lsn_hi": int(per_bucket[b]["lsn_hi"]),
            "rows_in": int(per_bucket[b]["keys"]),
            "rows_upserted": int(per_bucket[b]["keys"] - per_bucket[b]["deletes"]),
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
    return MergeStats(
        batch_id=batch_id,
        skipped=False,
        keys_in_batch=int(sum(r["keys"] for r in per_bucket.values())),
        rows_upserted=upserted,
        rows_deleted=deleted,
        buckets_touched=len(affected),
        snapshot_version=new_snap.version,
    )
