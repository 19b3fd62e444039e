"""Sources (CSV contract, JDBC scan options, XLS gating) and CLI."""

import json
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from panorama_elt_spark.sources.csv_source import read_csv_table, write_csv_table
from panorama_elt_spark.sources.jdbc_source import JdbcSource

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_csv_roundtrip_reference_contract(spark, tmp_path):
    """Backslash/CR/LF content and µs timestamps survive the escaped-CSV
    round trip (reference K1/F8/F9 semantics via reader/writer options)."""
    df = spark.createDataFrame(
        [(1, "a\\b", "line1\nline2", "2024-01-02 03:04:05.000006")],
        "id int, s1 string, s2 string, ts_str string",
    ).select(
        "id", "s1", "s2", F.to_timestamp("ts_str", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts")
    )
    path = str(tmp_path / "csv")
    write_csv_table(df, path)
    back = read_csv_table(spark, path, all_string=True)
    row = back.collect()[0]
    assert row["s1"] == "a\\b"
    assert row["s2"] == "line1\nline2"
    assert row["ts"] == "2024-01-02 03:04:05.000006"  # µs always 6 digits
    assert all(t == "string" for t in dict(back.dtypes).values())


def test_jdbc_scan_options_parallel_contract(spark):
    src = JdbcSource(spark, "jdbc:mysql://db:3306/edx", user="u", password="p")
    opts = src.scan_options(
        "courseware_studentmodule", partition_column="id",
        num_partitions=16, lower_bound=0, upper_bound=10**9,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["numPartitions"] == "16"
    assert opts["dbtable"] == "courseware_studentmodule"


def test_xls_gated(spark, tmp_path):
    from panorama_elt_spark.sources.xls_source import XlsUnavailable, read_xls_tables

    try:
        import openpyxl  # noqa: F401
        pytest.skip("excel engine present; gating path not reachable")
    except ImportError:
        pass
    # legacy binary .xls has no stdlib path and stays gated
    xls = tmp_path / "legacy.xls"
    xls.write_bytes(b"\xd0\xcf\x11\xe0 not a real xls")
    with pytest.raises(XlsUnavailable):
        read_xls_tables(spark, str(xls))


def _write_minimal_xlsx(path: str) -> None:
    """Hand-roll a two-sheet spreadsheetml zip: shared strings, inline
    strings, numeric cells, and a skipped (sparse) cell."""
    import zipfile

    wb = (
        '<?xml version="1.0"?><workbook '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="users" sheetId="1" r:id="rId1"/>'
        '<sheet name="empty" sheetId="2" r:id="rId2"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>'
        "</Relationships>"
    )
    sst = (
        '<?xml version="1.0"?><sst '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<si><t>id</t></si><si><t>name</t></si><si><t>alice</t></si></sst>"
    )
    sheet1 = (
        '<?xml version="1.0"?><worksheet '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2"><v>7</v></c><c r="B2" t="s"><v>2</v></c></row>'
        '<row r="3"><c r="B3" t="inlineStr"><is><t>bob</t></is></c></row>'
        "</sheetData></worksheet>"
    )
    sheet2 = (
        '<?xml version="1.0"?><worksheet '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData/></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_xlsx_stdlib_positive_path(spark, tmp_path):
    """S9 positive path: a real .xlsx round-trips through the stdlib
    parser — sheet map, header row, shared/inline/numeric cells as
    strings, sparse cells as nulls, headerless sheets skipped."""
    from panorama_elt_spark.sources.xls_source import _read_xlsx_stdlib, read_xls_tables

    path = str(tmp_path / "t.xlsx")
    _write_minimal_xlsx(path)
    raw = _read_xlsx_stdlib(path)  # engine-independent layer
    assert set(raw) == {"users", "empty"}
    tables = read_xls_tables(spark, path)
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        assert set(tables) == {"users"}  # stdlib path skips headerless sheets
    users = tables["users"]
    assert users.columns == ["id", "name"]
    assert all(t == "string" for t in dict(users.dtypes).values())
    rows = {tuple(r) for r in users.collect()}
    assert rows == {("7", "alice"), (None, "bob")}


def _run_cli(args, cwd):
    env = dict(os.environ, PYTHONPATH=REPO)
    return subprocess.run(
        [sys.executable, "-m", "panorama_elt_spark.cli", *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=300,
    )


def test_cli_end_to_end(tmp_path, spark):
    from panorama_elt_spark.cdc import ChangeLogSpec, generate_change_log

    generate_change_log(spark, ChangeLogSpec(n_events=500, n_keys=50)).write.parquet(
        str(tmp_path / "log")
    )
    schema_yaml = tmp_path / "schema.yaml"
    schema_yaml.write_text(
        "schema_version: 1\nkey_cols: [repo, path]\nn_buckets: 8\n"
        "fields:\n"
        "  - {id: 1, name: repo, type: string, nullable: false}\n"
        "  - {id: 2, name: path, type: string, nullable: false}\n"
        "  - {id: 3, name: commit, type: string}\n"
        "  - {id: 4, name: lang, type: string}\n"
        "  - {id: 5, name: content, type: string}\n"
    )
    cwd = str(tmp_path)
    r = _run_cli(["create-table", "--root", "T", "--schema", "schema.yaml"], cwd)
    assert r.returncode == 0, r.stderr[-500:]
    r = _run_cli(["replay", "--root", "T", "--log", "log", "--batch-size", "250"], cwd)
    assert r.returncode == 0, r.stderr[-500:]
    rep = json.loads(r.stdout.strip().splitlines()[-1])
    assert rep["batches_applied"] == 2 and rep["last_lsn"] == 499
    r = _run_cli(["table-info", "--root", "T"], cwd)
    info = json.loads(r.stdout)
    assert info["last_lsn"] == 499 and info["rows"] > 0
    r = _run_cli(["test-connections", "--root", "T", "--log", "log"], cwd)
    assert r.returncode == 0 and "table: OK" in r.stdout
    # S2/K8: schema introspection writes a loadable settings YAML
    r = _run_cli(
        ["set-tables-fields", "--parquet", "log", "--out", "introspected.yaml",
         "--key-cols", "repo,path"], cwd,
    )
    assert r.returncode == 0, r.stderr[-500:]
    import yaml

    doc = yaml.safe_load((tmp_path / "introspected.yaml").read_text())
    assert doc["key_cols"] == ["repo", "path"]
    assert {f["name"] for f in doc["fields"]} >= {"repo", "path", "op", "lsn"}
    # K8 writeback loop closes: the introspected YAML is itself a valid
    # settings file (same loader create-table uses)
    from panorama_elt_spark.cli import load_schema_yaml

    schema, key_cols, _ = load_schema_yaml(str(tmp_path / "introspected.yaml"))
    assert key_cols == ["repo", "path"]
    assert schema.field_by_name("content") is not None
    # vacuum: re-replay left orphan snapshots' files? at minimum it runs
    # and the table stays readable
    r = _run_cli(["vacuum", "--root", "T"], cwd)
    assert r.returncode == 0 and "orphan" in r.stdout
    r = _run_cli(["table-info", "--root", "T"], cwd)
    assert json.loads(r.stdout)["rows"] > 0
    # merge-on-read: replay into a fresh table as delta appends, compact
    r = _run_cli(["create-table", "--root", "T2", "--schema", "schema.yaml"], cwd)
    assert r.returncode == 0, r.stderr[-500:]
    r = _run_cli(["replay", "--root", "T2", "--log", "log", "--batch-size", "250",
                  "--strategy", "append_delta"], cwd)
    assert r.returncode == 0, r.stderr[-500:]
    r = _run_cli(["compact", "--root", "T2"], cwd)
    assert r.returncode == 0 and "compacted" in r.stdout
    r = _run_cli(["table-info", "--root", "T2"], cwd)
    rows_mor = json.loads(r.stdout)["rows"]
    r = _run_cli(["table-info", "--root", "T"], cwd)
    assert rows_mor == json.loads(r.stdout)["rows"]  # same state as CoW replay
    r = _run_cli(["drop-table", "--root", "T2"], cwd)
    assert r.returncode == 0
    # S3: list-tables discovers the table root (and only table roots)
    r = _run_cli(["list-tables", "--base-dir", "."], cwd)
    assert r.returncode == 0 and r.stdout.strip().splitlines() == ["./T"]
    # K6: drop-table removes it; list-tables then finds nothing
    r = _run_cli(["drop-table", "--root", "T"], cwd)
    assert r.returncode == 0, r.stderr[-500:]
    assert not os.path.exists(str(tmp_path / "T"))
    r = _run_cli(["list-tables", "--base-dir", "."], cwd)
    assert r.returncode == 0 and r.stdout.strip() == ""


def test_xlsx_stdlib_ragged_and_duplicate_headers(spark, tmp_path):
    """pandas-engine parity in the stdlib path: duplicate headers get .1
    suffixes, empty/missing headers become Unnamed: i, and data rows
    wider than the header are not truncated."""
    import zipfile

    from panorama_elt_spark.sources.xls_source import read_xls_tables

    wb = (
        '<?xml version="1.0"?><workbook '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        '<sheets><sheet name="ragged" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    rels = (
        '<?xml version="1.0"?><Relationships '
        'xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>'
        "</Relationships>"
    )
    # header: x, x (dup), <empty>; data row 2 has FOUR cells (wider than header)
    sheet1 = (
        '<?xml version="1.0"?><worksheet '
        'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="inlineStr"><is><t>x</t></is></c>'
        '<c r="B1" t="inlineStr"><is><t>x</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t></t></is></c>'
        "</row>"
        '<row r="2"><c r="A2"><v>1</v></c><c r="B2"><v>2</v></c>'
        '<c r="C2"><v>3</v></c><c r="D2"><v>4</v></c></row>'
        "</sheetData></worksheet>"
    )
    path = str(tmp_path / "ragged.xlsx")
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
    try:
        import openpyxl  # noqa: F401 — pandas engine takes over; stdlib path untested

        return
    except ImportError:
        pass
    t = read_xls_tables(spark, path)["ragged"]
    assert t.columns == ["x", "x.1", "Unnamed: 2", "Unnamed: 3"]
    assert [tuple(r) for r in t.collect()] == [("1", "2", "3", "4")]


def _xls_engine_is_stdlib() -> bool:
    try:
        import xlrd  # noqa: F401 — pandas engine takes over for .xls

        return False
    except ImportError:
        return True


def test_xls_biff_stdlib_minifat(spark, tmp_path):
    """S9 legacy binary .xls: a real BIFF8-in-CFB workbook (miniFAT
    storage — the natural layout for small files) parses with the
    stdlib reader: sheets, shared strings, RK ints, NUMBER doubles."""
    from biff_fixture import write_xls

    from panorama_elt_spark.sources.xls_source import read_xls_tables

    path = str(tmp_path / "t.xls")
    write_xls(path, {
        "users": [["id", "name"], [7, "alice"], [-3, "bob"], [2.5, None]],
        "extra": [["k"], ["v1"]],
    })
    if not _xls_engine_is_stdlib():
        return
    tables = read_xls_tables(spark, path)
    assert set(tables) == {"users", "extra"}
    users = tables["users"]
    assert users.columns == ["id", "name"]
    assert all(t == "string" for t in dict(users.dtypes).values())
    assert {tuple(r) for r in users.collect()} == {
        ("7", "alice"), ("-3", "bob"), ("2.5", None),
    }
    assert [tuple(r) for r in tables["extra"].collect()] == [("v1",)]


def test_xls_biff_stdlib_fat_storage(spark, tmp_path):
    """Same workbook stored through the main FAT (stream >= 4096 B)."""
    from biff_fixture import write_xls

    from panorama_elt_spark.sources.xls_source import read_xls_tables

    path = str(tmp_path / "big.xls")
    write_xls(path, {"users": [["id", "name"], [1, "x"], [2, "y"]]}, pad_to_fat=True)
    if not _xls_engine_is_stdlib():
        return
    users = read_xls_tables(spark, path)["users"]
    assert {tuple(r) for r in users.collect()} == {("1", "x"), ("2", "y")}


def test_xls_biff_gates_unsupported(spark, tmp_path):
    """Out-of-subset .xls features fail with the precise gated error,
    never a mis-parse."""
    import pytest as _pytest

    from panorama_elt_spark.sources.xls_source import XlsUnavailable, read_xls_tables

    path = str(tmp_path / "bad.xls")
    with open(path, "wb") as fh:
        fh.write(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\x00" * 504)
    if not _xls_engine_is_stdlib():
        return
    with _pytest.raises(XlsUnavailable):
        read_xls_tables(spark, path)


def test_xls_biff_gates_cfb_v4():
    """A CFB v4 container (4096-byte sectors) is reported as the
    explicit unsupported-version gate, not a garbled 'malformed
    structure' from mis-placed sector reads (parse-level, no Spark)."""
    import struct

    import pytest as _pytest

    from biff_fixture import cfb_container, workbook_stream
    from panorama_elt_spark.sources.xls_biff import XlsBiffUnsupported, read_xls_biff

    blob = bytearray(cfb_container(workbook_stream({"s": [["a"]]})))
    struct.pack_into("<H", blob, 26, 4)  # major version 4
    struct.pack_into("<H", blob, 30, 12)  # 4096-byte sector shift
    with _pytest.raises(XlsBiffUnsupported, match="CFB major version 4"):
        read_xls_biff(bytes(blob))


def test_xls_biff_roundtrip_property():
    """Property: any sheet of latin-1 strings / 30-bit ints / simple
    doubles survives the BIFF8 write→parse round trip cell-exactly
    (parse-level — no Spark needed, so hypothesis can afford examples)."""
    from hypothesis import given, settings, strategies as st

    from biff_fixture import write_xls, workbook_stream, cfb_container
    from panorama_elt_spark.sources.xls_biff import read_xls_biff

    text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=0, max_size=12
    )
    cell = st.one_of(
        st.none(),
        text,
        st.integers(min_value=-(2**29), max_value=2**29 - 1),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    )
    rows = st.lists(st.lists(cell, min_size=1, max_size=5), min_size=1, max_size=6)

    def expect(v):
        if v is None or isinstance(v, str):
            return v
        f = float(v)
        return str(int(f)) if f.is_integer() and abs(f) < 1e15 else repr(f)

    @settings(max_examples=40, deadline=None)
    @given(rows=rows)
    def roundtrip(rows):
        blob = cfb_container(workbook_stream({"s": rows}))
        parsed = read_xls_biff(blob)["s"]
        for r, row in enumerate(rows):
            got = parsed[r] if r < len(parsed) else {}
            for c, v in enumerate(row):
                assert got.get(c) == expect(v), (r, c, v, got.get(c))

    roundtrip()


def test_jdbc_table_discovery_dialect_dispatch(spark):
    """get_tables scopes the information_schema query per backend:
    DATABASE() for MySQL/MariaDB, current_schema() for Postgres, and an
    unscoped ANSI fallback elsewhere — discovery no longer silently
    assumes MySQL (the read itself stays gated by JdbcUnavailable)."""
    q = JdbcSource(spark, "jdbc:mysql://db:3306/edx").current_schema_query()
    assert "DATABASE()" in q
    q = JdbcSource(spark, "jdbc:postgresql://db:5432/edx").current_schema_query()
    assert "current_schema()" in q
    q = JdbcSource(spark, "jdbc:sqlserver://db;databaseName=edx").current_schema_query()
    assert "information_schema.tables" in q and "DATABASE()" not in q
