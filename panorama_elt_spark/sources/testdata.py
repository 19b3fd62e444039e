"""Parquet source for the driver-generated test tables (TESTDATA.md).

The production analogues are the engine's Source protocol implementors
(the descendants of the reference's 4-method datasource duck type,
``panorama_elt.py:77-98``): a scan here is ``spark.read.parquet`` with
Catalyst pushing projection and predicates into the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
