"""Structured Streaming variant of the CDC tail.

The batch engine (cdc/engine.py) replays aligned LSN ranges; this module
tails a *growing* change-log directory with Structured Streaming and
applies each micro-batch through the same exactly-once MERGE:

    readStream(parquet dir) → foreachBatch(merge_batch)

Exactly-once composition: Structured Streaming guarantees a failed
epoch is re-delivered with the same ``epoch_id``; our sink's
``committed_batches`` guard makes re-applying that epoch a no-op, so
the pair gives end-to-end exactly-once without any sink-side
transaction coordination — the streaming analogue of the reference's
idempotent whole-partition S3 re-upload (``panorama_datalake.py:215-258``).

No watermark is needed: LSN ordering makes late data well-defined
(the merge aggregate picks max-LSN regardless of arrival epoch — a
late event older than the applied row loses the ``max_by``; SURVEY.md
§2.8 late/out-of-order row).
"""

from __future__ import annotations

import hashlib
import os
import uuid

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..cdc.merge import merge_batch
from ..lakehouse.table import LakeTable


def _stream_identity(checkpoint_dir: str) -> str:
    """Stable namespace for one checkpoint *incarnation*, stored inside
    the checkpoint dir itself. Bare ``epoch-{n}`` batch ids collide
    across checkpoint resets: delete the checkpoint (or point a second
    stream at the same table) and epoch 0 recurs — the sink's
    exactly-once guard would then silently *skip* a real batch. With the
    id tied to the checkpoint's lifetime:

    * failure/retry of an epoch — checkpoint survives → same id → the
      re-delivered epoch dedupes (exactly-once preserved);
    * checkpoint reset / second stream — fresh id → epoch 0 re-applies,
      and LWW-by-LSN makes the re-application convergent.

    Non-POSIX checkpoint URIs (hdfs://, s3a://) fall back to a
    deterministic digest of the URI — per-location, not per-incarnation,
    which still separates concurrent streams (deploys there should
    rotate checkpoint paths on reset, the standard practice anyway).
    """
    if "://" in checkpoint_dir and not checkpoint_dir.startswith("file://"):
        return hashlib.md5(checkpoint_dir.encode()).hexdigest()[:12]
    local = checkpoint_dir.removeprefix("file://")
    os.makedirs(local, exist_ok=True)
    marker = os.path.join(local, "panorama-stream-id")
    if os.path.exists(marker):
        with open(marker) as fh:
            return fh.read().strip()
    sid = uuid.uuid4().hex[:12]
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(sid)
    os.replace(tmp, marker)
    return sid


def stream_changelog_to_table(
    spark: SparkSession,
    log_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
    event_schema=None,
) -> StreamingQuery:
    """Tail ``log_dir`` (parquet change-event files) into ``table``.

    With ``trigger_available_now`` the query drains everything currently
    in the directory and stops — the incremental-cron shape of the
    reference (README.md:190-194) without wall-clock coupling; without
    it, the query runs continuously picking up new files.

    ``event_schema`` (a StructType) lets the tail start before the
    first log file lands — e.g. a continuous stream deployed ahead of
    the producer. When omitted, the schema is probed from existing log
    files if any, else derived from the table contract (table columns +
    ``op`` string + ``lsn`` long — exactly what the merge consumes;
    parquet files carrying extra columns still read fine under an
    explicit schema)."""
    from pyspark.sql import types as T

    if event_schema is None:
        try:
            event_schema = spark.read.parquet(log_dir).schema
        except Exception:  # empty or not-yet-existing directory
            event_schema = T.StructType(
                list(table.snapshot.schema.to_struct().fields)
                + [T.StructField("op", T.StringType()), T.StructField("lsn", T.LongType())]
            )
            if "://" not in log_dir or log_dir.startswith("file://"):
                # the file-source needs the directory to exist; object
                # stores have no directories to create
                os.makedirs(log_dir.removeprefix("file://"), exist_ok=True)
    reader = spark.readStream.schema(event_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(log_dir)

    stream_id = _stream_identity(checkpoint_dir)

    def apply(batch_df, epoch_id: int) -> None:
        merge_batch(table, batch_df, batch_id=f"{stream_id}-epoch-{epoch_id}")

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
