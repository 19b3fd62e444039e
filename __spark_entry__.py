"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline on sf0.001; ``queries()`` /
``oracle_sql()`` expose the SURVEY.md §2 operator inventory, each Spark
implementation paired with a DuckDB-runnable ANSI SQL oracle (column
names/types aligned pair-wise). See panorama_elt_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from panorama_elt_spark import queries as _Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC-style last-writer-wins dedup over the events stream
    (the engine's core operator), rolled up per user — the Spark-first
    reimagination of the reference's incremental change-capture +
    partition-overwrite loop (mysql_datasource.py:258-301)."""
    sf_dir = "/root/testdata/sf0.001"
    latest = _Q.w1_lww_latest_window(spark, sf_dir)
    return latest.groupBy("user_id").agg(
        F.count("*").alias("n_active_keys"),
        F.max("ts").alias("latest_ts"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("decimal(18,2)").alias("latest_value_total"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _Q.queries()


def oracle_sql() -> dict[str, str]:
    return _Q.oracle_sql()
