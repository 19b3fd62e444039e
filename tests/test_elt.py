"""extract-and-load e2e: settings YAML with N datasources → per-table
extract → raw lake landing → typed views (the reference's flagship
command, panorama_elt.py:101-146)."""

import json
import os
import subprocess
import sys

import yaml
from pyspark.sql import functions as F

from panorama_elt_spark.elt import extract_and_load, load_settings
from panorama_elt_spark.lakehouse import LakeTable
from panorama_elt_spark.lakehouse.table import list_tables

from test_sources_cli import _write_minimal_xlsx

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_fixtures(tmp_path) -> str:
    (tmp_path / "in").mkdir()
    (tmp_path / "in" / "people.csv").write_text(
        "id,name,joined\n"
        "1,alice,2024-01-02 03:04:05.000006\n"
        "2,bob,2024-02-03 04:05:06.000007\n"
        "3,NULL,2024-03-04 05:06:07.000008\n"
    )
    (tmp_path / "in" / "orders.csv").write_text(
        "oid,pid,amount\n10,1,12.5\n11,2,not-a-number\n12,1,7.25\n"
    )
    _write_minimal_xlsx(str(tmp_path / "in" / "book.xlsx"))
    settings = {
        "datalake": {"base_dir": str(tmp_path / "lake"), "n_buckets": 4},
        "datasources": [
            {
                "name": "ops_csv",
                "type": "csv",
                "tables": [
                    {
                        "name": "people",
                        "location": str(tmp_path / "in" / "people.csv"),
                        "key_cols": ["id"],
                        "fields": [
                            {"name": "id", "type": "INT"},
                            {"name": "name", "type": "VARCHAR"},
                            {"name": "joined", "type": "DATETIME"},
                        ],
                    },
                    {
                        "name": "orders",
                        "location": str(tmp_path / "in" / "orders.csv"),
                        "fields": [
                            {"name": "oid", "type": "BIGINT"},
                            {"name": "pid", "type": "INT"},
                            {"name": "amount", "type": "FLOAT"},
                        ],
                    },
                ],
            },
            {
                "name": "books",
                "type": "xlsx",
                "location": str(tmp_path / "in" / "book.xlsx"),
                "tables": [{"name": "users"}],
            },
        ],
    }
    path = str(tmp_path / "settings.yaml")
    with open(path, "w") as fh:
        yaml.safe_dump(settings, fh, sort_keys=False)
    return path


def test_extract_and_load_e2e(spark, tmp_path):
    settings_path = _write_fixtures(tmp_path)
    settings = load_settings(settings_path)
    results = extract_and_load(spark, settings)
    assert [(r.table, r.status) for r in results] == [
        ("people", "loaded"), ("orders", "loaded"), ("users", "loaded"),
    ]
    # lake roots exist and are loadable tables
    roots = list_tables(settings.base_dir)
    assert sorted(os.path.basename(r) for r in roots) == ["orders", "people", "users"]
    for root in roots:
        LakeTable.load(spark, root)

    # raw views: all-string contract
    raw = spark.table("people_raw")
    assert all(t == "string" for t in dict(raw.dtypes).values())

    # typed views: declared conversions (K5 classes)
    people = spark.table("people")
    types = dict(people.dtypes)
    assert types == {"id": "bigint", "name": "string", "joined": "timestamp"}
    rows = {r["id"]: r for r in people.collect()}
    assert rows[3]["name"] is None  # NULLIF(x, 'NULL')
    assert rows[1]["joined"].microsecond == 6
    orders = spark.table("orders")
    assert dict(orders.dtypes)["amount"] == "double"
    amounts = {r["oid"]: r["amount"] for r in orders.collect()}
    assert amounts[11] is None  # TRY_CAST failure → NULL
    assert amounts[10] == 12.5
    # xlsx sheet landed without declared fields: string columns, data intact
    users = spark.table("users")
    assert {tuple(r) for r in users.collect()} == {("7", "alice"), (None, "bob")}

    # re-running the extract is an idempotent replace, not an append
    v_before = {r: LakeTable.load(spark, r).snapshot.version for r in roots}
    results2 = extract_and_load(spark, settings)
    assert all(r.status == "loaded" for r in results2)
    for root in roots:
        t = LakeTable.load(spark, root)
        assert t.snapshot.version == v_before[root] + 1
    assert spark.table("people").count() == 3

    # a later session rebuilds the typed view from snapshot properties
    spark.catalog.dropTempView("people")
    t = LakeTable.load(spark, os.path.join(settings.base_dir, "people"))
    t.register_typed_view("people")
    assert dict(spark.table("people").dtypes)["joined"] == "timestamp"


def test_extract_and_load_legacy_xls(spark, tmp_path):
    """A legacy .xls datasource lands through the stdlib BIFF8 path."""
    try:
        import xlrd  # noqa: F401 — pandas engine takes over; stdlib path untested

        return
    except ImportError:
        pass
    from biff_fixture import write_xls

    xls_path = str(tmp_path / "legacy.xls")
    write_xls(xls_path, {"metrics": [["day", "count"], ["mon", 4], ["tue", 7]]})
    settings_doc = {
        "datalake": {"base_dir": str(tmp_path / "lake"), "n_buckets": 2},
        "datasources": [
            {"name": "old_books", "type": "xls", "location": xls_path,
             "tables": [{"name": "metrics",
                         "fields": [{"name": "day", "type": "VARCHAR"},
                                    {"name": "count", "type": "INT"}]}]},
        ],
    }
    spath = str(tmp_path / "s.yaml")
    with open(spath, "w") as fh:
        yaml.safe_dump(settings_doc, fh)
    results = extract_and_load(spark, load_settings(spath))
    assert [(r.table, r.status) for r in results] == [("metrics", "loaded")]
    typed = spark.table("metrics")
    assert dict(typed.dtypes) == {"day": "string", "count": "bigint"}
    assert {tuple(r) for r in typed.collect()} == {("mon", 4), ("tue", 7)}


def test_extract_and_load_gates_jdbc_and_continues(spark, tmp_path):
    settings_path = _write_fixtures(tmp_path)
    with open(settings_path) as fh:
        doc = yaml.safe_load(fh)
    doc["datasources"].insert(0, {
        "name": "prod_mysql",
        "type": "jdbc",
        "url": "jdbc:mysql://nowhere:3306/db",
        "tables": [{"name": "auth_user"}],
    })
    with open(settings_path, "w") as fh:
        yaml.safe_dump(doc, fh, sort_keys=False)
    results = extract_and_load(spark, load_settings(settings_path))
    by_table = {r.table: r for r in results}
    assert by_table["auth_user"].status == "failed"
    assert "JdbcUnavailable" in by_table["auth_user"].error
    assert all(
        r.status == "loaded" for t, r in by_table.items() if t != "auth_user"
    )


def test_extract_and_load_mongo_nested(spark, tmp_path):
    """A mongo-type datasource (the reference's course-structures shape,
    course_structures_datasource.py:143-197) lands its nested collection
    through filter_published → flatten_blocks → fill_parent_attrs into a
    lake table via the offline nested-parquet path."""
    from panorama_elt_spark.operators.nested import (
        fill_parent_attrs, filter_published, flatten_blocks, generate_course_docs,
    )

    docs_dir = str(tmp_path / "structures")
    generate_course_docs(spark, n_courses=12).write.parquet(docs_dir)
    settings_doc = {
        "datalake": {"base_dir": str(tmp_path / "lake"), "n_buckets": 4},
        "datasources": [
            {"name": "modulestore", "type": "mongo", "location": docs_dir,
             "tables": [{"name": "course_blocks",
                         "key_cols": ["course_id", "block_id"]}]},
        ],
    }
    spath = str(tmp_path / "s.yaml")
    with open(spath, "w") as fh:
        yaml.safe_dump(settings_doc, fh)
    results = extract_and_load(spark, load_settings(spath))
    assert [(r.table, r.status) for r in results] == [("course_blocks", "loaded")]
    blocks = spark.table("course_blocks")
    expected = fill_parent_attrs(
        flatten_blocks(filter_published(spark.read.parquet(docs_dir)))
    )
    got = {
        (r["course_id"], r["block_id"], r["level"], r["chapter_name"])
        for r in blocks.collect()
    }
    exp = {
        (r["course_id"], r["block_id"], str(r["level"]), r["chapter_name"])
        for r in expected.collect()
    }
    assert got == exp and len(got) > 0
    # S5 semantics survived the landing: unpublished courses are absent
    n_published = filter_published(spark.read.parquet(docs_dir)).count()
    assert 0 < n_published < 12
    assert blocks.select("course_id").distinct().count() == n_published


def test_extract_and_load_gates_mongo_live(spark, tmp_path):
    """Without a nested-parquet location the live connector path is
    gated with a precise MongoUnavailable (no connector jar here), and
    the loop continues — the JdbcUnavailable contract, mirrored."""
    settings_doc = {
        "datalake": {"base_dir": str(tmp_path / "lake"), "n_buckets": 2},
        "datasources": [
            {"name": "modulestore", "type": "mongo",
             "uri": "mongodb://nowhere:27017", "database": "edxapp",
             "collection": "modulestore.structures",
             "tables": [{"name": "course_blocks"}]},
        ],
    }
    spath = str(tmp_path / "s.yaml")
    with open(spath, "w") as fh:
        yaml.safe_dump(settings_doc, fh)
    results = extract_and_load(spark, load_settings(spath))
    assert [(r.table, r.status) for r in results] == [("course_blocks", "failed")]
    assert "MongoUnavailable" in results[0].error


def test_set_tables_updates_settings(spark, tmp_path):
    """set-tables (ref panorama_elt.py:346-407): discovery refreshes the
    settings tables: section in place — new workbook sheets appear as
    bare entries, an existing entry keeps its declared config, and the
    rewritten file round-trips load_settings → extract_and_load."""
    from panorama_elt_spark.elt import set_tables

    settings_path = _write_fixtures(tmp_path)
    with open(settings_path) as fh:
        doc = yaml.safe_load(fh)
    # the books datasource declares only one of the workbook's sheets,
    # with extra per-table config that must survive discovery
    books = next(d for d in doc["datasources"] if d["name"] == "books")
    books["tables"] = [{"name": "users", "key_cols": ["id"]}]
    with open(settings_path, "w") as fh:
        yaml.safe_dump(doc, fh, sort_keys=False)

    written = set_tables(spark, settings_path, only_datasource="books")
    with open(settings_path) as fh:
        after = yaml.safe_load(fh)
    books_after = next(d for d in after["datasources"] if d["name"] == "books")
    names = [t["name"] for t in books_after["tables"]]
    assert names == written["books"] and "users" in names
    users_entry = next(t for t in books_after["tables"] if t["name"] == "users")
    assert users_entry.get("key_cols") == ["id"]  # config preserved
    # untouched datasource keeps its section verbatim
    assert next(d for d in after["datasources"] if d["name"] == "ops_csv") == next(
        d for d in yaml.safe_load(open(settings_path).read())["datasources"]
        if d["name"] == "ops_csv"
    )
    results = extract_and_load(spark, load_settings(settings_path))
    assert all(r.status == "loaded" for r in results)


def test_create_views_fresh_session(spark, tmp_path):
    """create-views (ref create_table_views, panorama_elt.py:283-343):
    a brand-new session rebuilds raw + typed views for every table under
    the lake base_dir from snapshot-stored field types — one call, no
    settings file."""
    from panorama_elt_spark.elt import create_views

    settings_path = _write_fixtures(tmp_path)
    settings = load_settings(settings_path)
    extract_and_load(spark, settings)
    fresh = spark.newSession()  # temp views are per-session: starts empty
    assert not fresh.catalog.tableExists("people")
    views = create_views(fresh, settings.base_dir)
    assert sorted(views) == ["orders", "people", "users"]
    assert dict(fresh.table("people").dtypes) == {
        "id": "bigint", "name": "string", "joined": "timestamp"
    }
    assert all(t == "string" for t in dict(fresh.table("people_raw").dtypes).values())
    assert fresh.table("orders").count() == 3


def test_extract_and_load_cli_verb(tmp_path):
    """The CLI wiring end-to-end in a fresh process (spark-submit shape):
    exit code, JSON summary, durable lake roots."""
    settings_path = _write_fixtures(tmp_path)
    env = dict(os.environ, PYTHONPATH=REPO, SPARK_GRAFT_MASTER="local[2]")
    out = subprocess.run(
        [sys.executable, "-m", "panorama_elt_spark.cli", "extract-and-load",
         "--settings", settings_path, "--datasource", "ops_csv"],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    payload = json.loads(out.stdout[out.stdout.index("["):])
    assert {(r["table"], r["status"]) for r in payload} == {
        ("people", "loaded"), ("orders", "loaded"),
    }
    base = str(tmp_path / "lake")
    assert sorted(os.path.basename(r) for r in list_tables(base)) == ["orders", "people"]


def test_set_tables_safe_rewrite(spark, tmp_path, monkeypatch):
    """The settings rewrite is validate-then-swap: if the rewritten
    document fails load_settings, the user's original file survives
    byte-identical (no destroyed config, no temp litter); and a declared
    entry that discovery no longer reports warns before being dropped."""
    import warnings

    import panorama_elt_spark.elt as elt_mod
    from panorama_elt_spark.elt import set_tables

    settings_path = _write_fixtures(tmp_path)
    original = open(settings_path).read()

    # 1) validation failure → original untouched, temp file cleaned up
    def boom(path):
        raise ValueError("rejected by validator")

    monkeypatch.setattr(elt_mod, "load_settings", boom)
    try:
        set_tables(spark, settings_path, only_datasource="books")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
    assert open(settings_path).read() == original
    assert not os.path.exists(settings_path + ".set-tables.tmp")
    monkeypatch.undo()

    # 2) declared-but-undiscovered entry → warning names it
    with open(settings_path) as fh:
        doc = yaml.safe_load(fh)
    books = next(d for d in doc["datasources"] if d["name"] == "books")
    books["tables"] = [{"name": "renamed_sheet", "key_cols": ["id"]}]
    with open(settings_path, "w") as fh:
        yaml.safe_dump(doc, fh, sort_keys=False)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        set_tables(spark, settings_path, only_datasource="books")
    assert any("renamed_sheet" in str(w.message) for w in caught)
