"""extract-and-load orchestration — the reference's flagship command.

``panorama_elt.py:101-146`` iterates a settings file over datasources
and tables: per table it extracts the rows, lands them in the lake as
an all-string raw layer, creates/updates the lake table, and (re)builds
the typed view (``mysql_datasource.py:226-311`` →
``panorama_datalake.py:313-343`` raw DDL + ``:372-415`` view DDL).

Spark-first recomposition: extraction is a declarative ``spark.read``
(CSV / XLSX sheets / JDBC — each already a first-class source module),
the landing is one atomic all-bucket snapshot swap
(``LakeTable.overwrite``), and the typed view is the K5 conversion
projection registered from the declared field-type map, which is stored
*in the snapshot* so any later session can rebuild the view without the
settings file.

Settings YAML (descendant of the reference settings file, SURVEY §1.3):

    datalake:
      base_dir: /lake
      n_buckets: 16
    datasources:
      - name: ops_csv
        type: csv                    # csv | xlsx | jdbc
        tables:
          - name: users
            location: /in/users.csv
            key_cols: [id]           # optional; default first column
            fields:                  # optional; declared types drive the
              - {name: id, type: INT}        # typed view (absent → all
              - {name: joined, type: DATETIME}  # string, NULLIF only)
      - name: finance_xlsx
        type: xlsx
        location: /in/book.xlsx      # one workbook, sheets are tables
        tables:
          - {name: budget}           # sheet name (or sheet: <name>)
      - name: prod_mysql
        type: jdbc                   # gated: needs a driver jar
        url: jdbc:mysql://host:3306/db
        tables:
          - {name: auth_user, partition_column: id}
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field as dc_field

from pyspark.sql import DataFrame, SparkSession

from .functions.typed_view import raw_string_columns
from .lakehouse import Field, LakeTable, TableSchema
from .sources.csv_source import read_csv_table
from .sources.jdbc_source import JdbcSource
from .sources.xls_source import read_xls_tables


@dataclass
class TableLoadResult:
    datasource: str
    table: str
    status: str  # loaded | failed | skipped
    root: str = ""
    rows: int = 0
    view: str = ""
    snapshot_version: int = -1
    error: str = ""

    def to_dict(self) -> dict:
        return asdict(self)


@dataclass
class ElTSettings:
    base_dir: str
    n_buckets: int = 16
    datasources: list[dict] = dc_field(default_factory=list)


def load_settings(path: str) -> ElTSettings:
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh)
    lake = doc.get("datalake") or {}
    if "base_dir" not in lake:
        raise ValueError("settings must declare datalake.base_dir")
    return ElTSettings(
        base_dir=lake["base_dir"],
        n_buckets=int(lake.get("n_buckets", 16)),
        datasources=doc.get("datasources") or [],
    )


def extract_table(spark: SparkSession, ds: dict, tbl: dict) -> DataFrame:
    """One table's extraction as a declarative scan (S1/S8/S9)."""
    kind = (ds.get("type") or "").lower()
    if kind == "csv":
        return read_csv_table(spark, tbl["location"], all_string=True)
    if kind in ("xlsx", "xls"):
        sheet = tbl.get("sheet", tbl["name"])
        sheets = read_xls_tables(spark, ds["location"])
        if sheet not in sheets:
            raise ValueError(
                f"sheet {sheet!r} not in workbook {ds['location']} "
                f"(has {sorted(sheets)})"
            )
        return sheets[sheet]
    if kind == "jdbc":
        src = JdbcSource(
            spark,
            url=ds["url"],
            user=ds.get("user", ""),
            password=ds.get("password", ""),
            properties=ds.get("properties") or {},
        )
        kwargs = {}
        if tbl.get("partition_column"):
            kwargs["partition_column"] = tbl["partition_column"]
        return src.read_table(tbl["name"], **kwargs)
    raise ValueError(f"unknown datasource type {kind!r} (csv | xlsx | jdbc)")


def land_table(
    spark: SparkSession,
    base_dir: str,
    name: str,
    df: DataFrame,
    *,
    key_cols: list[str] | None = None,
    n_buckets: int = 16,
    field_types: dict[str, str] | None = None,
) -> tuple[LakeTable, int]:
    """Raw-layer landing: every column string (the reference's raw-table
    contract, ``panorama_datalake.py:281-284``), one atomic all-bucket
    overwrite, declared field types recorded in the snapshot for the
    typed view. Re-running an extract replaces the previous load — the
    idempotent whole-table analogue of the reference's partition
    re-upload."""
    import os

    raw = df.select(raw_string_columns(df))
    cols = raw.columns
    keys = list(key_cols) if key_cols else [cols[0]]
    missing = [k for k in keys if k not in cols]
    if missing:
        raise ValueError(f"key columns not in extracted table {name}: {missing}")
    root = os.path.join(base_dir, name)
    schema = TableSchema(
        [Field(i + 1, c, "string", c not in keys) for i, c in enumerate(cols)],
        schema_version=1,
    )
    try:
        table = LakeTable.load(spark, root)
        if table.snapshot.schema.names != cols or table.snapshot.key_cols != keys:
            # source shape changed: re-create (the reference logs
            # "Creating or updating datalake table" and re-issues DDL)
            table.drop()
            table = LakeTable.create(spark, root, schema, keys, n_buckets=n_buckets)
    except FileNotFoundError:
        table = LakeTable.create(spark, root, schema, keys, n_buckets=n_buckets)
    snap = table.overwrite(
        raw, properties={"field_types": dict(field_types or {})}
    )
    return table, sum(f.rows for f in snap.files)


def extract_and_load(
    spark: SparkSession,
    settings: ElTSettings,
    *,
    only_datasource: str | None = None,
    only_table: str | None = None,
    fail_fast: bool = False,
) -> list[TableLoadResult]:
    """The flagship loop: for each (selected) datasource table — extract,
    land, register raw + typed views. Per-table failures are recorded
    and the loop continues (the reference's per-datasource try/except,
    ``panorama_elt.py:120-140``) unless ``fail_fast``."""
    results: list[TableLoadResult] = []
    for ds in settings.datasources:
        if only_datasource and ds.get("name") != only_datasource:
            continue
        for tbl in ds.get("tables") or []:
            name = tbl["name"]
            if only_table and name != only_table:
                continue
            res = TableLoadResult(datasource=ds.get("name", "?"), table=name, status="loaded")
            try:
                df = extract_table(spark, ds, tbl)
                field_types = {
                    f["name"]: f["type"] for f in (tbl.get("fields") or [])
                }
                table, rows = land_table(
                    spark,
                    settings.base_dir,
                    name,
                    df,
                    key_cols=tbl.get("key_cols"),
                    n_buckets=settings.n_buckets,
                    field_types=field_types,
                )
                table.register_view(f"{name}_raw")
                table.register_typed_view(name)
                res.root = table.root
                res.rows = rows
                res.view = name
                res.snapshot_version = table.snapshot.version
            except Exception as exc:
                res.status = "failed"
                res.error = f"{type(exc).__name__}: {exc}"
                if fail_fast:
                    results.append(res)
                    raise
            results.append(res)
    return results
