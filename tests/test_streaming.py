"""Structured Streaming tail: availableNow drain, growth pickup, and
exactly-once across stream restarts."""

import os

from pyspark.sql import functions as F

from panorama_elt_spark.cdc import ChangeLogSpec, expected_final_state, generate_change_log
from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema
from panorama_elt_spark.streaming import stream_changelog_to_table

SCHEMA = TableSchema(
    [
        Field(1, "repo", "string", False),
        Field(2, "path", "string", False),
        Field(3, "commit", "string"),
        Field(4, "lang", "string"),
        Field(5, "content", "string"),
    ],
    schema_version=1,
)


def _rows(df):
    return sorted(
        tuple(r) for r in df.select("repo", "path", "commit", "lang", "content").collect()
    )


def test_stream_drain_and_growth(spark, tmp_path):
    spec = ChangeLogSpec(n_events=3000, n_keys=200)
    log = generate_change_log(spark, spec)
    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    # first half of the log arrives
    log.filter(F.col("lsn") < 1500).write.parquet(log_dir)

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=8)
    q = stream_changelog_to_table(spark, log_dir, t, ckpt)
    q.awaitTermination(120)
    half_rows = t.read().count()
    assert half_rows > 0

    # the log grows; a new availableNow run drains only the new files
    log.filter(F.col("lsn") >= 1500).write.mode("append").parquet(log_dir)
    q2 = stream_changelog_to_table(spark, log_dir, t, ckpt)
    q2.awaitTermination(120)

    assert _rows(t.read()) == _rows(expected_final_state(spark, spec))


def test_stream_restart_is_exactly_once(spark, tmp_path):
    spec = ChangeLogSpec(n_events=2000, n_keys=150)
    log = generate_change_log(spark, spec)
    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    log.write.parquet(log_dir)

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=8)
    q = stream_changelog_to_table(spark, log_dir, t, ckpt)
    q.awaitTermination(120)
    state = _rows(t.read())
    version = t.snapshot.version

    # restart the stream over the same checkpoint: nothing new to do
    q2 = stream_changelog_to_table(spark, log_dir, t, ckpt)
    q2.awaitTermination(120)
    assert t.snapshot.version == version
    assert _rows(t.read()) == state

    # fresh checkpoint (simulates a re-delivered epoch with a fresh id
    # stream): state must still converge, merge stays idempotent at the
    # row level because replayed events lose the max_by to equal rows
    ckpt2 = str(tmp_path / "ckpt2")
    q3 = stream_changelog_to_table(spark, log_dir, t, ckpt2)
    q3.awaitTermination(120)
    assert _rows(t.read()) == state


def test_checkpoint_reset_does_not_skip_epoch_zero(spark, tmp_path):
    """Batch ids are namespaced per checkpoint incarnation: wiping the
    checkpoint restarts epoch numbering at 0, and an un-namespaced
    ``epoch-0`` id would be silently skipped by the exactly-once guard —
    leaving the table stuck at the first drain's state."""
    import shutil

    spec = ChangeLogSpec(n_events=2000, n_keys=150)
    log = generate_change_log(spark, spec)
    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    log.filter(F.col("lsn") < 1000).write.parquet(log_dir)

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=8)
    q = stream_changelog_to_table(spark, log_dir, t, ckpt)
    q.awaitTermination(120)
    assert t.read().count() > 0

    # checkpoint lost; the log has grown; a fresh stream re-drains the
    # whole directory as its epoch 0 — it must apply, not dedupe-skip
    shutil.rmtree(ckpt)
    log.filter(F.col("lsn") >= 1000).write.mode("append").parquet(log_dir)
    q2 = stream_changelog_to_table(spark, log_dir, t, ckpt)
    q2.awaitTermination(120)
    assert _rows(t.read()) == _rows(expected_final_state(spark, spec))


def test_stream_bounded_epochs_max_files_per_trigger(spark, tmp_path):
    """maxFilesPerTrigger bounds each micro-batch: a multi-file log
    drains across several epochs (each its own exactly-once merge), and
    the final state still matches the full-log LWW oracle."""
    spec = ChangeLogSpec(n_events=2400, n_keys=150)
    log = generate_change_log(spark, spec)
    log_dir = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    # several files so the trigger cap actually splits epochs
    for lo in range(0, 2400, 600):
        log.filter((F.col("lsn") >= lo) & (F.col("lsn") < lo + 600)).coalesce(1) \
           .write.mode("append").parquet(log_dir)

    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=8)
    q = stream_changelog_to_table(
        spark, log_dir, t, ckpt, max_files_per_trigger=1
    )
    q.awaitTermination(180)
    # one merge commit per epoch (plus v0): > 2 epochs proves the cap bit
    applied = [b for b in t.snapshot.committed_batches]
    assert len(applied) >= 3
    assert _rows(t.read()) == _rows(expected_final_state(spark, spec))


def test_stream_starts_on_empty_dir(spark, tmp_path):
    """A continuous tail can be deployed before the producer: the stream
    starts on a not-yet-existing log dir (schema derived from the table
    contract), then picks up files dropped in afterwards."""
    spec = ChangeLogSpec(n_events=1500, n_keys=150)
    log = generate_change_log(spark, spec)
    log_dir = str(tmp_path / "log-not-yet")
    ckpt = str(tmp_path / "ckpt")
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["repo", "path"], n_buckets=8)
    assert not os.path.exists(log_dir)
    q = stream_changelog_to_table(
        spark, log_dir, t, ckpt, trigger_available_now=False
    )
    try:
        # producer arrives after the stream is already running; the
        # derived schema drops the generator's extra columns (schema_
        # version, stars) exactly like an explicit projection would
        log.write.mode("append").parquet(log_dir)
        # deterministic barrier: blocks until every available file has
        # been processed through foreachBatch (no wall-clock polling)
        q.processAllAvailable()
    finally:
        q.stop()
    assert t.snapshot.last_lsn == spec.n_events - 1
    got = _rows(t.read())
    exp = _rows(expected_final_state(spark, spec))
    assert got == exp and len(got) > 0
