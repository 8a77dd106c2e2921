#!/usr/bin/env python
"""r16 optimization-round measurement harness (not part of the bench).

Reproduces the bench session (same conf, cache, warmup) for a NAMED subset
of queries, at sf0.1 and/or the generated sf1 lane, timing the noop sink
min-of-N per query and optionally dumping .explain("formatted") to
plans/r16/<query>_<tag>.txt.

Usage:
  python plans/r16/measure.py --queries q01_pricing_summary,p111_bpe_merges \
      --lanes sf0.1,sf1 --iters 3 [--explain before|after] [--duckdb]

This is a measurement tool for OPTIMIZATION_r16.md evidence; the graded
bench protocol lives in bench.py unchanged.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--lanes", default="sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--explain", default=None, help="tag: dump plans/r16/<q>_<tag>.txt (sf0.1 plan)")
    ap.add_argument("--duckdb", action="store_true", help="also run the oracle SQL in a worker process")
    args = ap.parse_args()

    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    lanes = [s.strip() for s in args.lanes.split(",") if s.strip()]

    from duckdb_cloudflare_spark import queries as Q
    from duckdb_cloudflare_spark.session import get_spark

    conf = {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
        "spark.duckdb_cloudflare.assumeParallel": "true",
    }
    extra = os.environ.get("SPARK_GRAFT_BENCH_CONF")
    if extra:
        conf.update(json.loads(extra))
    spark = get_spark("measure_r16", extra_conf=conf)
    registry = Q.all_queries()
    oracles = Q.all_oracles()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # warm exactly like bench.py
    registry["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    registry["p02_text_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    registry["p05_knn_bruteforce"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(0, 64, 1, 32).select(_warm("id").alias("id")).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    lane_dirs = {}
    for lane in lanes:
        if lane == "sf0.1":
            lane_dirs[lane] = sf_dir
        elif lane == "sf1":
            import bench
            lane_dirs[lane] = bench._gen_sf1(sf_dir)
        else:
            raise SystemExit(f"unknown lane {lane}")

    worker = None
    if args.duckdb:
        import bench
        worker = bench._DuckWorker()

    out: dict[str, dict[str, float]] = {}
    for lane, d in lane_dirs.items():
        Q.cache_tables(spark, d)
        if lane == "sf1":
            Q.cache_tables(spark, d, tables=("embeddings",),
                           parallelism=spark.sparkContext.defaultParallelism)
        if worker:
            import bench
            tabs = bench._SF1_TABLES if lane == "sf1" else bench._BENCH_TABLES
            worker.init(d, tabs)
        for name in names:
            if name not in registry:
                print(f"!! {name} not in registry", file=sys.stderr)
                continue
            spark._jvm.System.gc()
            best = float("inf")
            first = None
            for _ in range(args.iters):
                t0 = time.perf_counter()
                spark.sparkContext.setJobDescription(f"measure:{name}:{lane}")
                registry[name](spark, d).write.format("noop").mode("overwrite").save()
                el = time.perf_counter() - t0
                first = first if first is not None else el
                best = min(best, el)
            row = out.setdefault(name, {})
            row[lane] = round(best, 4)
            row[f"{lane}_first"] = round(first, 4)
            if worker and name in oracles:
                b = worker.run(oracles[name], args.iters)
                if b is not None:
                    row[f"{lane}_duckdb"] = round(b, 4)
            if args.explain and lane == lanes[0]:
                plan = registry[name](spark, d)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                p = os.path.join(REPO, "plans", "r16", f"{name}_{args.explain}.txt")
                with open(p, "w") as f:
                    f.write(plan)
        Q.uncache_tables()
    if worker:
        worker.close()
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
