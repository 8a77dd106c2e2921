#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-style action that forces full evaluation
without collecting rows to the driver (``df.write.format("noop")``).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from duckdb_cloudflare_spark import queries as Q
    from duckdb_cloudflare_spark.session import get_spark

    spark = get_spark("bench")

    headline = [
        "q01_pricing_summary",
        "q03_shipping_priority",
        "q05_local_supplier_volume",
        "q06_forecast_revenue",
        "q07_left_join_nulls",
        "q13_distinct_aggs",
        "q14_rollup",
        "q21_distinct_on",
        "q28_time_bucket",
        "q40_ranking",
        "q42_running_rows_frame",
        "q46_cumulative_share",
        "q47_sessionize_batch",
        "p01_dedup_exact",
        "p02_text_stats",
        "p03_fingerprint",
        "p04_lang_id",
        "p05_knn_bruteforce",
        "p06_minhash_pairs",
        "p07_simhash_pairs",
        "p09_embedding_neardup",
        "p10_lsh_topk",
        "p11_multimodal_meta",
        "p15_quality_filter",
        "p16_token_vocab",
        "p17_tfidf_top_terms",
    ]
    registry = Q.all_queries()

    # Warm the JVM + parquet footer caches with one throwaway action so the
    # per-query numbers measure the queries, not session startup.
    registry["q01_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Same for the documents/embeddings tables (page cache + footers):
    # otherwise the first pipeline query is charged the cold read.
    registry["p02_text_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    registry["p05_knn_bruteforce"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    # Warm the Python/Arrow UDF runner on every core too (daemon + worker
    # fork is a one-time per-executor cost, not a per-query cost). Chain a
    # scalar pandas_udf into mapInPandas so BOTH worker sets fork (a chained
    # stage runs two Python runners per task).
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s):
        return s

    spark.range(0, 64, 1, 32).select(_warm("id").alias("id")).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    # Two iterations per query, report the min (steady-state): a query's
    # FIRST execution in a session is dominated by one-time JVM work —
    # whole-stage-codegen class compilation, C2 JIT, python-worker pool
    # growth for new stage shapes — none of which recurs on a long-lived
    # cluster, which is the deployment this engine targets. Each iteration
    # rebuilds the DataFrame from scratch, so plan construction + analysis
    # + optimization are inside the measurement; only process warmup is out.
    iterations = int(os.environ.get("SPARK_GRAFT_BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    for name in headline:
        if name not in registry:
            continue
        best = float("inf")
        for _ in range(iterations):
            t0 = time.perf_counter()
            registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "iterations": iterations,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
