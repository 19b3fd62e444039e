"""Extra benchmarks for the optimization rounds (guide §1).

``bench.py`` is frozen for measurement; this harness adds what the
optimization loop needs without touching it:

* run a SUBSET of the declared queries (``--queries a,b,c``), each with
  ``--repeats`` noop-sink passes (guide §1.4) and a per-query host-load
  probe, printing per-pass walls so host noise is visible;
* capture ``.explain("formatted")`` for each query to
  ``plans/r06/<query>_<tag>.txt`` (``--plans-tag before|after``) — the
  judge-checkable plan evidence;
* same session shape as bench.py (master local[$SPARK_GRAFT_CPUS],
  shuffle partitions 2*cpus, data dir $SPARK_GRAFT_SF_DIR).

Usage:
    python bench_extra.py --queries j1_left_join_chain --repeats 3
    python bench_extra.py --all --repeats 1 --plans-tag before
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO = os.path.dirname(os.path.abspath(__file__))


def micro_probe(spark) -> float:
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    (
        spark.range(8_000_000)
        .select(F.xxhash64("id").alias("h"))
        .agg(F.max("h"))
        .collect()
    )
    return round(time.monotonic() - t0, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--plans-tag", default="")
    ap.add_argument("--plans-dir", default=os.path.join(REPO, "plans", "r06"))
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from panorama_elt_spark import queries as Q
    from panorama_elt_spark.caching import persist_scope
    from panorama_elt_spark.session import get_spark

    registry = Q.queries()
    names = list(registry) if args.all else [q for q in args.queries.split(",") if q]
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(
        app_name="panorama-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 16),
    )
    micro_probe(spark)  # warm the probe plan
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name]
        walls, probes = [], []
        for rep in range(args.repeats):
            probes.append(micro_probe(spark))
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.monotonic()
            with persist_scope():
                df = fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        if args.plans_tag:
            import contextlib
            import io

            os.makedirs(args.plans_dir, exist_ok=True)
            buf = io.StringIO()
            with persist_scope():
                df = fn(spark, sf_dir)
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.plans_tag}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
        out[name] = {
            "walls": walls,
            "best": min(walls) if walls else None,
            "probes": probes,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(
        json.dumps({"summary": {k: v["best"] for k, v in out.items()}}), flush=True
    )
    spark.stop()


if __name__ == "__main__":
    main()
