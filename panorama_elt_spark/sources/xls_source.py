"""XLS/XLSX source (reference: ``xls_datasource.py``) — each sheet is a
table, first row is the header, all columns string.

Two engines: pandas' excel reader when an engine library (openpyxl/
xlrd) is installed, else stdlib parsers for BOTH formats — ``.xlsx``
via ``zipfile`` + ``ElementTree`` (spreadsheetml), legacy binary
``.xls`` via the BIFF8/CFB parser in ``xls_biff.py``. Both cover the
reference's contract (sheet enumeration, shared strings, inline
strings, numeric cells, all values surfaced as strings); ``.xls``
features outside the BIFF8 subset (encryption, BIFF5, CONTINUE-spanning
strings) stay gated with a precise reason.

Data volume is driver-scale by nature (the reference caps at 10^6
rows/sheet, ``xls_datasource.py:111``), so parse-on-driver →
createDataFrame is the appropriate plumbing, not a distributed read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

ROW_CAP = 1_000_000  # reference hard cap, xls_datasource.py:111

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"


class XlsUnavailable(RuntimeError):
    pass


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'BC12' → 54 (the column part of an A1-style ref)."""
    i = 0
    for ch in cell_ref:
        if ch.isdigit():
            break
        i = i * 26 + (ord(ch.upper()) - 64)
    return i - 1


def _read_xlsx_stdlib(path: str) -> dict[str, list[dict[int, str | None]]]:
    """{sheet_name: [{col_index: value}]} straight from the zip — no
    third-party engine."""
    import xml.etree.ElementTree as ET
    import zipfile

    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        rid_to_target = {r.get("Id"): r.get("Target") for r in rels}
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst.findall(f"{_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
        sheets: dict[str, list[dict[int, str | None]]] = {}
        sheets_el = wb.find(f"{_NS}sheets")
        for sh in sheets_el if sheets_el is not None else []:
            target = rid_to_target[sh.get(f"{_RNS}id")]
            member = target if target.startswith("xl/") else "xl/" + target.lstrip("/")
            root = ET.fromstring(z.read(member))
            rows: list[dict[int, str | None]] = []
            for row in root.iter(f"{_NS}row"):
                cells: dict[int, str | None] = {}
                next_ci = 0
                for c in row.findall(f"{_NS}c"):
                    ref = c.get("r")
                    ci = _col_index(ref) if ref else next_ci
                    next_ci = ci + 1
                    t = c.get("t")
                    if t == "s":
                        v = c.find(f"{_NS}v")
                        val = shared[int(v.text)] if v is not None else None
                    elif t == "inlineStr":
                        is_el = c.find(f"{_NS}is")
                        val = (
                            "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t"))
                            if is_el is not None
                            else None
                        )
                    else:  # numeric / str-formula / boolean — surface raw text
                        v = c.find(f"{_NS}v")
                        val = v.text if v is not None else None
                    cells[ci] = val
                rows.append(cells)
                if len(rows) > ROW_CAP:
                    break
            sheets[sh.get("name")] = rows
    return sheets


def read_xls_tables(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """{sheet_name: all-string DataFrame} for every sheet."""
    try:
        import pandas as pd

        sheets = pd.read_excel(path, sheet_name=None, dtype=str, nrows=ROW_CAP)
        out = {}
        for name, pdf in sheets.items():
            pdf = pdf.where(pdf.notna(), None)
            out[name] = spark.createDataFrame(pdf.astype("object"))
        return out
    except (ImportError, ValueError) as exc:
        # ImportError: engine named but absent; ValueError: pandas cannot
        # even pick an engine ("you must specify an engine manually").
        # Either way no third-party engine is usable here.
        engineless = isinstance(exc, ImportError) or "engine" in str(exc)
        if not engineless:
            raise
    if path.lower().endswith(".xlsx"):
        raw = _read_xlsx_stdlib(path)
    else:
        # legacy binary .xls: stdlib BIFF8/CFB parser (xls_biff.py); the
        # unsupported-feature subset (encryption, BIFF5, CONTINUE-spanning
        # strings) stays gated with a precise reason
        from .xls_biff import XlsBiffUnsupported, read_xls_biff

        try:
            with open(path, "rb") as fh:
                raw = read_xls_biff(fh.read())
        except XlsBiffUnsupported as exc:
            raise XlsUnavailable(
                f"legacy .xls feature outside the stdlib BIFF8 subset "
                f"({exc}); install xlrd for full coverage"
            ) from exc
    return _sheets_to_dataframes(spark, raw)


def _sheets_to_dataframes(
    spark: SparkSession, raw: dict[str, list[dict[int, str | None]]]
) -> dict[str, DataFrame]:
    out = {}
    for name, rows in raw.items():
        if not rows:
            continue  # headerless sheet: no table contract to honor
        # pandas-engine parity: column count is the widest row (data
        # wider than the header gets Unnamed columns, never truncated),
        # missing/empty headers become "Unnamed: {i}", duplicates get
        # ".1"-style suffixes — so both engines agree on the same file.
        n_cols = max(max(r, default=-1) for r in rows) + 1
        names = _dedupe_headers(rows[0], n_cols)
        schema = T.StructType([T.StructField(n, T.StringType()) for n in names])
        data = [
            tuple(r.get(i) for i in range(n_cols)) for r in rows[1 : ROW_CAP + 1]
        ]
        out[name] = spark.createDataFrame(data, schema)
    return out


def _dedupe_headers(header_cells: dict[int, str | None], n_cols: int) -> list[str]:
    """pandas-style header mangling: None/'' → ``Unnamed: {i}``,
    duplicates → ``name.1``, ``name.2`` … (the mangled name is itself
    kept collision-free)."""
    names: list[str] = []
    counts: dict[str, int] = {}
    taken: set[str] = set()
    for i in range(n_cols):
        base = header_cells.get(i)
        if base is None or base == "":
            base = f"Unnamed: {i}"
        name = base
        while name in taken:
            counts[base] = counts.get(base, 0) + 1
            name = f"{base}.{counts[base]}"
        taken.add(name)
        names.append(name)
    return names
