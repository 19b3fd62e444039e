"""spark-submit --py-files packaging (north rule: 'packaged for
spark-submit --py-files'): the package is zipped, shipped via
--py-files to a fresh spark-submit process with NO repo PYTHONPATH, and
a replay runs end-to-end from the zip — including the task-side Arrow
write kernel, whose closure resolves module globals through the
distributed zip on the executors."""

import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

DRIVER = '''
import sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from panorama_elt_spark.cdc import CdcEngine, ChangeLogSpec, generate_change_log
from panorama_elt_spark.lakehouse import Field, LakeTable, TableSchema

schema = TableSchema(
    [Field(1, "repo", "string"), Field(2, "path", "string"),
     Field(3, "commit", "string"), Field(4, "lang", "string"),
     Field(5, "content", "string")],
    schema_version=1,
)
log = generate_change_log(spark, ChangeLogSpec(n_events=5000, n_keys=500, seed=11))
t = LakeTable.create(spark, sys.argv[1], schema, ["repo", "path"], n_buckets=4)
rep = CdcEngine(t).replay(log.select("lsn","op","repo","path","commit","lang","content"), batch_size=2500)
assert len(rep.batches) == 2 and not any(b.skipped for b in rep.batches)
print("PKG-OK rows=%d version=%d" % (t.read().count(), t.snapshot.version), flush=True)
spark.stop()
'''


def test_spark_submit_py_files_packaging(tmp_path):
    pkg_zip = str(tmp_path / "panorama_elt_spark.zip")
    pkg_dir = os.path.join(REPO, "panorama_elt_spark")
    with zipfile.ZipFile(pkg_zip, "w") as z:
        for dirpath, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in dirpath:
                continue
            for name in files:
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                z.write(full, os.path.relpath(full, REPO))
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as fh:
        fh.write(DRIVER)

    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH",)  # the zip must be the ONLY package source
    }
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [spark_submit, "--master", "local[4]", "--py-files", pkg_zip,
         driver, str(tmp_path / "table")],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert r.returncode == 0, (r.stdout[-800:], r.stderr[-800:])
    assert "PKG-OK rows=" in r.stdout
