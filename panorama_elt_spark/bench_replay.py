"""Standalone CDC replay benchmark — one parallelism level per process.

Invoked as a subprocess by bench.py (a fresh process per level is the
honest way to compare local[8] vs local[32]: separate JVMs, no warm
caches shared across levels). Prints one JSON line.

Methodology notes:
* Storage defaults to tmpfs (/dev/shm) when present: on a real cluster
  object-store bandwidth scales with executors, but this sandbox's
  single virtual disk does not — putting the log + table in RAM measures
  the engine's compute/shuffle scaling rather than one vda device.
* A warmup replay (20% of events, scratch table) runs first in the same
  JVM so JIT/codegen compilation is excluded from the measurement; the
  measured replay runs twice on fresh tables, best-of-2, to damp host
  noise.

Usage: python -m panorama_elt_spark.bench_replay --cpus 8 \
          --events 1000000 --keys 100000 --batches 5
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--keys", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=5)
    ap.add_argument("--n-buckets", type=int, default=64)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--no-warmup", action="store_true")
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

        def one_replay(tag: str, max_lsn: int | None) -> tuple[float, int]:
            table = LakeTable.create(
                spark, f"{root}/{tag}", schema, ["repo", "path"], n_buckets=args.n_buckets
            )
            engine = CdcEngine(table, strategy=args.strategy)
            t0 = time.monotonic()
            engine.replay(log, batch_size=args.events // args.batches, max_lsn=max_lsn)
            wall = time.monotonic() - t0
            rows = table.read().count()
            shutil.rmtree(f"{root}/{tag}", ignore_errors=True)
            return wall, rows

        if not args.no_warmup:
            one_replay("warmup", max_lsn=args.events // args.batches - 1)

        walls, final_rows = [], 0
        for rep in range(args.repeats):
            wall, final_rows = one_replay(f"m{rep}", None)
            walls.append(wall)
        wall = min(walls)
        print(
            json.dumps(
                {
                    "cpus": args.cpus,
                    "events": args.events,
                    "wall_secs": round(wall, 3),
                    "all_walls": [round(w, 3) for w in walls],
                    "events_per_sec": round(args.events / wall, 1),
                    "batches": args.batches,
                    "final_rows": final_rows,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
