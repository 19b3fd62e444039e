"""SparkSession factory with scale-appropriate defaults.

Defaults are chosen for the 100 TB design point and verified locally:
AQE on (runtime coalesce + skew-join splitting), adaptive broadcast,
Arrow for any pandas exchange. ``shuffle_partitions`` should be sized
~2-3x total cores locally; on a real cluster AQE coalesces the excess.

Cluster sizing knobs (pass via ``extra_conf`` on a real deployment):
* ``spark.sql.shuffle.partitions`` ≈ 2-3× total executor cores; the
  merge pins its own exchange to ``n_buckets`` regardless.
* ``spark.sql.files.maxPartitionBytes`` (default 128m): raise to 256m+
  for the change-log scan so a 10^9-event batch doesn't fan into
  hundreds of thousands of tasks.
* table ``n_buckets``: size so one bucket's rewrite fits an executor
  comfortably (~16k buckets ⇒ ~6 GB/bucket at 100 TB).
* ``PANORAMA_PREFILTER_MAX_BYTES`` (default 256 MiB): winner-broadcast
  budget; the broadcast carries fixed 64-bit key fingerprints, so it
  budgets n_keys × ~32 B regardless of key width.
  ``PANORAMA_PREFILTER_MAX_KEYS`` is a secondary row guard. Keep the
  bytes budget well under driver memory.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "panorama-elt-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[*]")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # joins (guide §3.1/§9): allow shuffled-hash where a build side
        # fits per partition instead of always sort-merge, and let AQE
        # rewrite SMJ→SHJ at runtime when every post-shuffle partition
        # is under 64 MB (bounded build memory — scale-safe: oversized
        # partitions keep sort-merge)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "64m"
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the panorama python data source prunes buckets via pushFilters
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (the legacy default) writes no parquet column statistics
        # for timestamps — MICROS keeps footer min/max alive, which the
        # zone-map fallback (lakehouse/filestats.py) reads, and is the
        # modern interop encoding (Iceberg/Delta write it too)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
