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

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from ..cdc.merge import merge_batch
from ..lakehouse.table import LakeTable


def stream_changelog_to_table(
    spark: SparkSession,
    log_dir: str,
    table: LakeTable,
    checkpoint_dir: str,
    *,
    trigger_available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Tail ``log_dir`` (parquet change-event files) into ``table``.

    With ``trigger_available_now`` the query drains everything currently
    in the directory and stops — the incremental-cron shape of the
    reference (README.md:190-194) without wall-clock coupling; without
    it, the query runs continuously picking up new files.
    """
    reader = spark.readStream.schema(
        spark.read.parquet(log_dir).schema
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(log_dir)

    def apply(batch_df, epoch_id: int) -> None:
        merge_batch(table, batch_df, batch_id=f"epoch-{epoch_id}")

    writer = stream.writeStream.foreachBatch(apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
