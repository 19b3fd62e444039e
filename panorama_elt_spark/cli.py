"""CLI — the ``panorama.py`` command surface re-expressed for the Spark
engine (reference commands: ``panorama_elt.py:49-493``).

    python -m panorama_elt_spark.cli extract-and-load --settings s.yaml [--datasource D] [--table T]
    python -m panorama_elt_spark.cli create-table     --root T --schema s.yaml
    python -m panorama_elt_spark.cli replay           --root T --log DIR [--batch-size N]
    python -m panorama_elt_spark.cli stream           --root T --log DIR --checkpoint C
    python -m panorama_elt_spark.cli table-info       --root T
    python -m panorama_elt_spark.cli set-tables       --settings s.yaml [--datasource D] [--tables a,b]
    python -m panorama_elt_spark.cli set-tables-fields --parquet F --out s.yaml
    python -m panorama_elt_spark.cli create-views     --base-dir DIR
    python -m panorama_elt_spark.cli test-connections --root T [--log DIR]
    python -m panorama_elt_spark.cli vacuum           --root T
    python -m panorama_elt_spark.cli compact          --root T
    python -m panorama_elt_spark.cli expire-snapshots --root T [--keep-last N] [--vacuum]
    python -m panorama_elt_spark.cli drop-table       --root T
    python -m panorama_elt_spark.cli list-tables      --base-dir DIR

Packaged for ``spark-submit --py-files panorama_elt_spark.zip`` with
this module as the application (north rule packaging requirement).

Schema YAML (descendant of the reference settings file, §1.3):

    schema_version: 1
    key_cols: [repo, path]
    n_buckets: 64
    fields:
      - {id: 1, name: repo, type: string, nullable: false}
      - {id: 6, name: stars, type: int, default: 0}
"""

from __future__ import annotations

import argparse
import json
import sys

from .lakehouse import Field, LakeTable, TableSchema
from .session import get_spark


def load_schema_yaml(path: str) -> tuple[TableSchema, list[str], int]:
    import yaml

    with open(path) as fh:
        doc = yaml.safe_load(fh)
    schema = TableSchema(
        [
            Field(
                f["id"], f["name"], f["type"],
                f.get("nullable", True), f.get("default"),
            )
            for f in doc["fields"]
        ],
        doc.get("schema_version", 1),
    )
    return schema, doc["key_cols"], doc.get("n_buckets", 64)


def cmd_extract_and_load(args) -> int:
    """The reference's flagship verb (``panorama_elt.py:101-146``):
    settings YAML listing N datasources × tables → per-table extract →
    raw lake landing → typed view. Per-table failures are reported in
    the JSON summary; exit 1 if any failed."""
    from .elt import extract_and_load, load_settings

    spark = get_spark("panorama-extract-load")
    results = extract_and_load(
        spark,
        load_settings(args.settings),
        only_datasource=args.datasource,
        only_table=args.table,
        fail_fast=args.fail_fast,
    )
    print(json.dumps([r.to_dict() for r in results], indent=2))
    return 0 if all(r.status == "loaded" for r in results) else 1


def cmd_create_table(args) -> int:
    spark = get_spark("panorama-create")
    schema, key_cols, n_buckets = load_schema_yaml(args.schema)
    LakeTable.create(spark, args.root, schema, key_cols, n_buckets=n_buckets)
    print(f"created table at {args.root} (schema v{schema.schema_version}, "
          f"keys={key_cols}, buckets={n_buckets})")
    return 0


def cmd_replay(args) -> int:
    from .cdc import CdcEngine

    spark = get_spark("panorama-replay")
    table = LakeTable.load(spark, args.root)
    registry = None
    if args.schema_registry:
        registry = {}
        for p in args.schema_registry:
            schema, _, _ = load_schema_yaml(p)
            registry[schema.schema_version] = schema
    log = spark.read.parquet(args.log)
    engine = CdcEngine(table, schema_registry=registry, strategy=args.strategy)
    report = engine.replay(log, batch_size=args.batch_size)
    applied = [b for b in report.batches if not b.skipped]
    print(json.dumps({
        "batches_applied": len(applied),
        "batches_skipped": len(report.batches) - len(applied),
        "events_read": report.events_read,
        "wall_secs": round(report.wall_secs, 2),
        "events_per_sec": round(report.events_per_sec, 1),
        "last_lsn": table.snapshot.last_lsn,
        "snapshot_version": table.snapshot.version,
    }))
    return 0


def cmd_stream(args) -> int:
    from .streaming import stream_changelog_to_table

    spark = get_spark("panorama-stream")
    table = LakeTable.load(spark, args.root)
    q = stream_changelog_to_table(
        spark, args.log, table, args.checkpoint,
        trigger_available_now=not args.continuous,
    )
    q.awaitTermination()
    print(f"stream drained; table at snapshot v{table.snapshot.version}")
    return 0


def cmd_table_info(args) -> int:
    spark = get_spark("panorama-info")
    table = LakeTable.load(spark, args.root)
    snap = table.snapshot
    print(json.dumps({
        "version": snap.version,
        "schema_version": snap.schema.schema_version,
        "fields": [f.to_dict() for f in snap.schema.fields],
        "key_cols": snap.key_cols,
        "n_buckets": snap.n_buckets,
        "n_files": snap.total_files(),
        "rows": snap.total_rows(),
        "n_manifests": len(snap.manifests),
        "last_lsn": snap.last_lsn,
        "committed_batches": len(snap.committed_batches),
        "lineage_rows": len(snap.lineage),
    }, indent=2))
    return 0


def cmd_history(args) -> int:
    """Commit history, newest first (Delta DESCRIBE HISTORY analogue) —
    metadata-only, one snapshot document per row."""
    spark = get_spark("panorama-history")
    table = LakeTable.load(spark, args.root)
    rows = table.history(limit=args.limit).collect()
    print(json.dumps([
        {
            "version": r["version"],
            "committed_at": None if r["committed_at"] is None
            else r["committed_at"].isoformat(),
            "operation": r["operation"],
            "batch_id": r["batch_id"],
            "last_lsn": r["last_lsn"],
            "schema_version": r["schema_version"],
            "n_files": r["n_files"],
            "n_rows": r["n_rows"],
        }
        for r in rows
    ], indent=2))
    return 0


def cmd_set_tables_fields(args) -> int:
    """Schema introspection → YAML (reference ``set-tables-fields``,
    ``panorama_elt.py:438-470`` / ``mysql_datasource.py:150-170``)."""
    import yaml

    spark = get_spark("panorama-introspect")
    df = spark.read.parquet(args.parquet)
    fields = [
        {"id": i + 1, "name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        for i, f in enumerate(df.schema.fields)
    ]
    doc = {
        "schema_version": 1,
        "key_cols": args.key_cols.split(",") if args.key_cols else [fields[0]["name"]],
        "n_buckets": 64,
        "fields": fields,
    }
    with open(args.out, "w") as fh:
        yaml.safe_dump(doc, fh, sort_keys=False)
    print(f"wrote {args.out} ({len(fields)} fields)")
    return 0


def cmd_set_tables(args) -> int:
    """Update the settings file's ``tables:`` sections from datasource
    discovery (ref ``set-tables``, ``panorama_elt.py:346-407``)."""
    from .elt import set_tables

    spark = get_spark("panorama-set-tables")
    written = set_tables(
        spark,
        args.settings,
        only_datasource=args.datasource,
        only_tables=args.tables.split(",") if args.tables else None,
    )
    print(json.dumps(written, indent=2))
    print(f"{args.settings} updated")
    return 0


def cmd_create_views(args) -> int:
    """Rebuild raw + typed views for every lake table under a base dir
    (ref ``create-table-views``, ``panorama_elt.py:283-343``)."""
    from .elt import create_views

    spark = get_spark("panorama-create-views")
    views = create_views(spark, args.base_dir)
    for v in views:
        print(f"view {v} (+ {v}_raw)")
    if getattr(args, "persist", False):
        from .catalog import persist_catalog

        persist_catalog(args.base_dir)
        print(f"catalog document written to {args.base_dir}/_catalog.json")
    print(f"{len(views)} tables registered")
    return 0


def cmd_test_connections(args) -> int:
    """Smoke checks (reference ``test-connections``,
    ``panorama_elt.py:473-493``): Spark session, table readability,
    log readability."""
    ok = True
    spark = get_spark("panorama-test")
    print(f"spark: OK ({spark.version}, master={spark.sparkContext.master})")
    if args.root:
        try:
            t = LakeTable.load(spark, args.root)
            print(f"table: OK (v{t.snapshot.version}, {t.snapshot.total_files()} files)")
        except Exception as exc:
            ok = False
            print(f"table: FAIL ({exc})")
    if args.log:
        try:
            n = spark.read.parquet(args.log).limit(1).count()
            print(f"log: OK (readable, sample={n})")
        except Exception as exc:
            ok = False
            print(f"log: FAIL ({exc})")
    return 0 if ok else 1


def cmd_vacuum(args) -> int:
    spark = get_spark("panorama-vacuum")
    table = LakeTable.load(spark, args.root)
    removed = table.vacuum()
    print(f"removed {removed} orphan files")
    return 0


def cmd_compact(args) -> int:
    """Fold merge-on-read delta files into base files; with --sort-by
    it is a clustering rewrite (--layout zorder = Morton interleave so
    every sort column's zone maps prune — OPTIMIZE ZORDER BY)."""
    spark = get_spark("panorama-compact")
    table = LakeTable.load(spark, args.root)
    sort_by = args.sort_by.split(",") if args.sort_by else None
    n = table.compact(
        sort_by=sort_by,
        max_rows_per_file=args.max_rows_per_file,
        layout=args.layout,
    )
    print(f"compacted {n} buckets (snapshot v{table.snapshot.version})")
    return 0


def cmd_tag(args) -> int:
    """Create/move a named snapshot tag (pins the version against
    expire-snapshots; readable via read(ref=) / .option(\"ref\", ...))."""
    spark = get_spark("panorama-tag")
    table = LakeTable.load(spark, args.root)
    if args.drop:
        table.drop_tag(args.name)
        print(f"dropped tag {args.name}")
    else:
        v = table.tag(args.name, args.version)
        print(f"tag {args.name} -> v{v}")
    return 0


def cmd_refs(args) -> int:
    spark = get_spark("panorama-refs")
    table = LakeTable.load(spark, args.root)
    print(json.dumps(table.refs(), indent=2, sort_keys=True))
    return 0


def cmd_rebucket(args) -> int:
    """Change the table's bucket count (atomic full rewrite)."""
    spark = get_spark("panorama-rebucket")
    table = LakeTable.load(spark, args.root)
    before = table.snapshot.n_buckets
    snap = table.rebucket(args.n_buckets)
    print(
        f"rebucketed {before} -> {snap.n_buckets} buckets "
        f"(snapshot v{snap.version}, {snap.total_rows()} rows)"
    )
    return 0


def cmd_expire_snapshots(args) -> int:
    """Iceberg expire_snapshots analogue: bound the snapshot log, then
    vacuum the newly orphaned data files."""
    spark = get_spark("panorama-expire")
    table = LakeTable.load(spark, args.root)
    expired = table.expire_snapshots(keep_last=args.keep_last)
    orphans = table.vacuum() if args.vacuum else 0
    print(f"expired {expired} snapshots"
          + (f", removed {orphans} orphan files" if args.vacuum else ""))
    return 0


def cmd_drop_table(args) -> int:
    """K6 (ref ``panorama_elt.py:252-280`` drop-datalake-tables)."""
    spark = get_spark("panorama-drop")
    table = LakeTable.load(spark, args.root)  # refuses non-tables
    table.drop()
    print(f"dropped table at {args.root}")
    return 0


def cmd_list_tables(args) -> int:
    """S3 (ref ``mysql_datasource.py:126-135`` SHOW TABLES)."""
    from .lakehouse.table import list_tables

    for root in list_tables(args.base_dir):
        print(root)
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="panorama-elt-spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("extract-and-load")
    p.add_argument("--settings", required=True)
    p.add_argument("--datasource", default=None, help="only this datasource")
    p.add_argument("--table", default=None, help="only this table")
    p.add_argument("--fail-fast", action="store_true")
    p.set_defaults(fn=cmd_extract_and_load)

    p = sub.add_parser("create-table")
    p.add_argument("--root", required=True)
    p.add_argument("--schema", required=True)
    p.set_defaults(fn=cmd_create_table)

    p = sub.add_parser("replay")
    p.add_argument("--root", required=True)
    p.add_argument("--log", required=True)
    p.add_argument("--batch-size", type=int, default=100_000)
    p.add_argument("--schema-registry", nargs="*", default=None,
                   help="schema YAMLs, one per schema_version")
    p.add_argument("--strategy", default="auto",
                   help="merge strategy: auto | fused | bucket_local | "
                        "append_delta (merge-on-read; run compact periodically)")
    p.set_defaults(fn=cmd_replay)

    p = sub.add_parser("stream")
    p.add_argument("--root", required=True)
    p.add_argument("--log", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--continuous", action="store_true")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("table-info")
    p.add_argument("--root", required=True)
    p.set_defaults(fn=cmd_table_info)

    p = sub.add_parser("history")
    p.add_argument("--root", required=True)
    p.add_argument("--limit", type=int, default=None)
    p.set_defaults(fn=cmd_history)

    p = sub.add_parser("set-tables")
    p.add_argument("--settings", required=True)
    p.add_argument("--datasource", default=None, help="only this datasource")
    p.add_argument("--tables", default=None, help="comma-separated allow-list")
    p.set_defaults(fn=cmd_set_tables)

    p = sub.add_parser("create-views")
    p.add_argument("--base-dir", required=True)
    p.add_argument(
        "--persist",
        action="store_true",
        help="also write the lake's _catalog.json so later sessions "
        "rebuild this view surface with one attach_catalog call",
    )
    p.set_defaults(fn=cmd_create_views)

    p = sub.add_parser("set-tables-fields")
    p.add_argument("--parquet", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--key-cols", default=None)
    p.set_defaults(fn=cmd_set_tables_fields)

    p = sub.add_parser("test-connections")
    p.add_argument("--root", default=None)
    p.add_argument("--log", default=None)
    p.set_defaults(fn=cmd_test_connections)

    p = sub.add_parser("vacuum")
    p.add_argument("--root", required=True)
    p.set_defaults(fn=cmd_vacuum)

    p = sub.add_parser("compact")
    p.add_argument("--root", required=True)
    p.add_argument("--sort-by", default=None, dest="sort_by",
                   help="comma-separated clustering columns")
    p.add_argument("--max-rows-per-file", type=int, default=None,
                   dest="max_rows_per_file")
    p.add_argument("--layout", default="linear", choices=["linear", "zorder"])
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("rebucket")
    p.add_argument("--root", required=True)
    p.add_argument("--n-buckets", type=int, required=True, dest="n_buckets")
    p.set_defaults(fn=cmd_rebucket)

    p = sub.add_parser("tag")
    p.add_argument("--root", required=True)
    p.add_argument("--name", required=True)
    p.add_argument("--version", type=int, default=None)
    p.add_argument("--drop", action="store_true")
    p.set_defaults(fn=cmd_tag)

    p = sub.add_parser("refs")
    p.add_argument("--root", required=True)
    p.set_defaults(fn=cmd_refs)

    p = sub.add_parser("expire-snapshots")
    p.add_argument("--root", required=True)
    p.add_argument("--keep-last", type=int, default=10)
    p.add_argument("--vacuum", action="store_true",
                   help="also delete data files orphaned by the expiry")
    p.set_defaults(fn=cmd_expire_snapshots)

    p = sub.add_parser("drop-table")
    p.add_argument("--root", required=True)
    p.set_defaults(fn=cmd_drop_table)

    p = sub.add_parser("list-tables")
    p.add_argument("--base-dir", required=True)
    p.set_defaults(fn=cmd_list_tables)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
