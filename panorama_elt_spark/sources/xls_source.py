"""XLS/XLSX source (reference: ``xls_datasource.py``) — each sheet is a
table, first row is the header, all columns string.

Excel parsing needs an engine library (openpyxl/xlrd) that may not be
installed; the import is gated and surfaces a clear error. Data volume
is driver-scale by nature (the reference caps at 10^6 rows/sheet,
``xls_datasource.py:111``), so pandas-on-driver → createDataFrame is
the appropriate plumbing, not a distributed read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ROW_CAP = 1_000_000  # reference hard cap, xls_datasource.py:111


class XlsUnavailable(RuntimeError):
    pass


def read_xls_tables(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """{sheet_name: all-string DataFrame} for every sheet."""
    try:
        import pandas as pd

        sheets = pd.read_excel(path, sheet_name=None, dtype=str, nrows=ROW_CAP)
    except ImportError as exc:
        raise XlsUnavailable(
            "reading .xls/.xlsx requires an excel engine (openpyxl/xlrd)"
        ) from exc
    out = {}
    for name, pdf in sheets.items():
        pdf = pdf.where(pdf.notna(), None)
        out[name] = spark.createDataFrame(pdf.astype("object"))
    return out
