"""Standalone CDC replay benchmark — one parallelism level per process.

Invoked as a subprocess by bench.py (a fresh process per level is the
honest way to compare local[8] vs local[32]: separate JVMs, no warm
caches shared across levels). Prints one JSON line.

Methodology notes:
* Storage defaults to tmpfs (/dev/shm) when present: on a real cluster
  object-store bandwidth scales with executors, but this sandbox's
  single virtual disk does not — putting the log + table in RAM measures
  the engine's compute/shuffle scaling rather than one vda device.
* **Warmup is a full-size replay.** Measured on this host: the JVM keeps
  compiling well past the first full pass (per-batch merge wall on an
  8M-event log: 68 s → 29 s → 17 s → 10 s → 10 s across consecutive
  passes) — a 20 %-size warmup leaves the first "measured" run half
  cold, which is exactly the artifact that produced round-2's 57 s
  outlier and its bogus 0.198 efficiency reading. One full warmup pass
  plus best-of-N measured passes converges on the steady-state rate the
  level actually sustains.
* Both best and median of the measured passes are reported (plus every
  raw wall), so a single host hiccup is visible instead of silently
  polluting one level's number.
* ``--with-ceiling`` also measures the *minimal-shuffle ceiling*: the
  bare ``groupBy(keys).agg(max_by(payload, lsn))`` → noop job on the
  same log — the irreducible scan+dedup core any LWW CDC engine on this
  box must run, with no stats pass, no prefilter, no parquet write, no
  commit. Comparing the engine's N→4N efficiency against the ceiling's
  separates "the engine stops scaling" from "the box stops scaling"
  (single-box threads share one memory bus; the ≥0.8 criterion presumes
  executors that each bring their own bandwidth).

Usage: python -m panorama_elt_spark.bench_replay --cpus 8 \
          --events 1000000 --keys 100000 --batches 5 [--with-ceiling]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--no-warmup", action="store_true")
    ap.add_argument("--with-ceiling", action="store_true",
                    help="also measure the minimal-shuffle groupBy(max_by) "
                    "ceiling job on the same log (best of 3, warm JVM)")
    ap.add_argument(
        "--master",
        default=None,
        help="Spark master override, e.g. local-cluster[4,8,6144] for "
        "separate executor JVMs (real serialized shuffle fabric); "
        "default local[--cpus]",
    )
    ap.add_argument(
        "--strategy", default="auto", help="merge strategy (auto/fused/bucket_local)"
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from .cdc import CdcEngine, ChangeLogSpec, generate_change_log
    from .lakehouse import Field, LakeTable, TableSchema
    from .session import get_spark

    extra = {}
    if args.master and args.master.startswith("local-cluster"):
        # local-cluster workers read their budget from the master string,
        # but executors still launch with spark.executor.memory (1g
        # default) — size it from the worker spec minus headroom.
        worker_mb = int(args.master.rstrip("]").split(",")[-1])
        extra["spark.executor.memory"] = f"{max(worker_mb - 1024, 1024)}m"
    spark = get_spark(
        app_name=f"cdc-bench-{args.cpus}",
        master=args.master or f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus * 2, 16),
        extra_conf=extra,
    )
    schema = TableSchema(
        [
            Field(1, "repo", "string", False),
            Field(2, "path", "string", False),
            Field(3, "commit", "string"),
            Field(4, "lang", "string"),
            Field(5, "content", "string"),
        ],
        schema_version=1,
    )
    spec = ChangeLogSpec(n_events=args.events, n_keys=args.keys)
    base = os.environ.get(
        "SPARK_GRAFT_BENCH_DIR", "/dev/shm" if os.path.isdir("/dev/shm") else None
    )
    root = tempfile.mkdtemp(prefix=f"cdc_bench_{args.cpus}_", dir=base)
    try:
        # materialize the log once (the real shape: a stored WAL/binlog
        # tail on disk); replay then reads LSN ranges with parquet
        # min/max pushdown pruning the untouched row groups.
        log_path = root + "/log"
        generate_change_log(spark, spec).write.parquet(log_path)
        log = spark.read.parquet(log_path)

        def one_replay(tag: str) -> tuple[float, int]:
            table = LakeTable.create(
                spark, f"{root}/{tag}", schema, ["repo", "path"], n_buckets=args.n_buckets
            )
            engine = CdcEngine(table, strategy=args.strategy)
            t0 = time.monotonic()
            engine.replay(log, batch_size=args.events // args.batches)
            wall = time.monotonic() - t0
            rows = table.read().count()
            shutil.rmtree(f"{root}/{tag}", ignore_errors=True)
            return wall, rows

        if not args.no_warmup:
            one_replay("warmup")  # full-size: see module docstring

        walls, final_rows = [], 0
        for rep in range(args.repeats):
            wall, final_rows = one_replay(f"m{rep}")
            walls.append(wall)
        wall = min(walls)
        report = {
            "cpus": args.cpus,
            "events": args.events,
            "wall_secs": round(wall, 3),
            "wall_median": round(statistics.median(walls), 3),
            "all_walls": [round(w, 3) for w in walls],
            "events_per_sec": round(args.events / wall, 1),
            "events_per_sec_median": round(args.events / statistics.median(walls), 1),
            "batches": args.batches,
            "final_rows": final_rows,
        }

        if args.with_ceiling:
            payload = [c for c in schema.names if c not in ("repo", "path")]
            ceiling_df = (
                log.groupBy("repo", "path")
                .agg(F.max_by(F.struct(*payload, "op"), "lsn").alias("__w"))
                .filter(F.col("__w.op") != "D")
                .select("repo", "path", *[F.col(f"__w.{c}").alias(c) for c in payload])
            )
            c_walls = []
            for _ in range(3):
                t0 = time.monotonic()
                ceiling_df.write.format("noop").mode("overwrite").save()
                c_walls.append(time.monotonic() - t0)
            cw = min(c_walls)
            report["ceiling"] = {
                "wall_secs": round(cw, 3),
                "all_walls": [round(w, 3) for w in c_walls],
                "events_per_sec": round(args.events / cw, 1),
            }

        print(json.dumps(report))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
