"""history(): the Delta DESCRIBE HISTORY analogue — one metadata-only
row per commit, newest first, operation kind inferred from the diff
against the parent snapshot."""

import json
import subprocess
import sys

from pyspark.sql import functions as F

from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema

SCHEMA = TableSchema(
    [
        Field(1, "id", "bigint", False),
        Field(2, "ts", "timestamp"),
        Field(3, "val", "double"),
    ]
)


def _frame(spark, n=2000, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id"),
        F.expr(
            "cast('2026-01-01' as timestamp) + make_dt_interval(0,0,0,id)"
        ).alias("ts"),
        (F.col("id") * 1.0).alias("val"),
    )


def _make_history_table(spark, tmp_path):
    t = LakeTable.create(spark, str(tmp_path / "t"), SCHEMA, ["id"], n_buckets=2)  # v0
    t.append(_frame(spark))  # v1 append
    t.compact(sort_by=["ts"], max_rows_per_file=500)  # v2 rewrite
    t.alter_schema(
        TableSchema(SCHEMA.fields + [Field(4, "tag", "string")], schema_version=2)
    )  # v3 alter
    return t


def test_history_operations_and_order(spark, tmp_path):
    t = _make_history_table(spark, tmp_path)
    rows = t.history().collect()
    assert [r["version"] for r in rows] == [3, 2, 1, 0]
    assert [r["operation"] for r in rows] == ["alter", "rewrite", "append", "create"]
    assert all(r["committed_at"] is not None for r in rows)
    by_v = {r["version"]: r for r in rows}
    assert by_v[0]["n_rows"] == 0 and by_v[1]["n_rows"] == 2000
    assert by_v[2]["n_rows"] == 2000 and by_v[2]["n_files"] > by_v[1]["n_files"]
    assert by_v[3]["schema_version"] == 2
    assert t.history(limit=2).count() == 2


def test_history_merge_rows_carry_batch_id(spark, tmp_path):
    from panorama_elt_spark.cdc import CdcEngine, ChangeLogSpec, generate_change_log
    from tests.test_cdc_core import REPO_SCHEMA_V1 as CDC_SCHEMA

    t = LakeTable.create(
        spark, str(tmp_path / "m"), CDC_SCHEMA, ["repo", "path"], n_buckets=2
    )
    log = generate_change_log(spark, ChangeLogSpec(n_events=2000, n_keys=300))
    CdcEngine(t).replay(log, batch_size=1000)
    merges = [r for r in t.history().collect() if r["operation"] == "merge"]
    assert len(merges) >= 2
    assert all(r["batch_id"] and r["batch_id"].startswith("b") for r in merges)
    assert merges[0]["last_lsn"] > merges[-1]["last_lsn"]


def test_history_stops_at_expired_snapshots(spark, tmp_path):
    t = _make_history_table(spark, tmp_path)
    t.expire_snapshots(keep_last=2)
    rows = t.history().collect()
    assert [r["version"] for r in rows] == [3, 2]
    # v2's parent is expired: operation degrades to "other", never raises
    assert rows[1]["operation"] == "other"


def test_history_cli_smoke(spark, tmp_path):
    t = _make_history_table(spark, tmp_path)
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "panorama_elt_spark.cli",
            "history",
            "--root",
            t.root,
            "--limit",
            "3",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    doc = json.loads(out.stdout)
    assert [d["version"] for d in doc] == [3, 2, 1]
    assert doc[0]["operation"] == "alter"
