"""CSV source/sink with the reference's serialization invariants.

The reference writes escaped CSV (backslash escape char, doubled
backslashes, literal \\r/\\n, 6-digit-microsecond datetimes, header
row — ``mysql_datasource.py:17-56``) and reads it back through the
Athena OpenCSVSerde with the matching options
(``panorama_datalake.py:313-343``: escapeChar='\\\\',
skip.header.line.count=1). Spark's CSV reader/writer expresses the
same contract declaratively — no per-row Python.

CSV-as-datasource (``csv_datasource.py:57-94``): header row = schema,
every column string (inference degrades to all-string, §1.3); the
typed view layer (functions/typed_view.py) reconstructs types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"

_OPTS = {
    "header": "true",
    "escape": "\\",
    "quote": '"',
    "timestampFormat": _TS_FMT,
}


def read_csv_table(
    spark: SparkSession, path: str, all_string: bool = True
) -> DataFrame:
    """Read a reference-shaped CSV table. ``all_string=True`` mirrors the
    raw-layer contract (every column string); False lets Spark infer.

    ``multiLine`` restores quoted embedded newlines (Spark quotes rather
    than escapes them on write; the reference instead pre-escapes content
    with ``escape_control_chars`` — both contracts round-trip)."""
    reader = spark.read.options(**_OPTS).option("multiLine", "true")
    if all_string:
        return reader.option("inferSchema", "false").csv(path)
    return reader.option("inferSchema", "true").csv(path)


def write_csv_table(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write with the reference's escaping contract (K1)."""
    df.write.options(**_OPTS).mode(mode).csv(path)
