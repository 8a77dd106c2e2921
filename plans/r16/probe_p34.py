#!/usr/bin/env python
"""r16 probe: decompose p34 (exact_jaccard_pairs) phases at the sf1 lane.

Phases:
  1. map+explode only (inv)           -- the r15-fixed pass
  2. inv -> groupBy(shingle).count()  -- one shuffle + agg (lower bound for the index shuffle)
  3. full p34 as shipped
  4. p34 with the join exchange widened (repartition(n, shingle), n = max(shuffle.partitions, src partitions))
  5. group-postings variant (collect_list + pair emission) [optional]
Each phase: noop sink, min-of-N.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from duckdb_cloudflare_spark import queries as Q
from duckdb_cloudflare_spark.operators import dedup as D
from duckdb_cloudflare_spark.operators.dedup import (
    hashed_word_shingles,
    lowered_tokens,
)
from duckdb_cloudflare_spark.session import get_spark


def timeit(spark, name, df, iters=3):
    spark._jvm.System.gc()
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"probe:{name}")
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{name:45s} {best:8.2f} s", flush=True)
    return best


def main():
    conf = {
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.enabled": "false",
        "spark.driver.memory": "16g",
        "spark.duckdb_cloudflare.assumeParallel": "true",
    }
    spark = get_spark("probe_p34", extra_conf=conf)
    import bench

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = bench._gen_sf1(sf_dir)
    Q.cache_tables(spark, sf1)
    registry = Q.all_queries()
    # warm
    registry["q01_pricing_summary"](spark, sf1).write.format("noop").mode("overwrite").save()

    docs = Q.load(spark, sf1, "documents")
    k = 3
    shins = (
        docs.select("doc_id", lowered_tokens("text").alias("ts"))
        .filter(F.size("ts") >= k)
        .select("doc_id", hashed_word_shingles(k).alias("sh"))
    )
    inv = shins.select("doc_id", "sh", F.size("sh").alias("n_sh")).select(
        "doc_id", F.explode("sh").alias("shingle"), "n_sh"
    )

    timeit(spark, "1. inv (map+explode) only", inv)
    timeit(spark, "2. inv groupBy(shingle).count", inv.groupBy("shingle").count())

    timeit(spark, "3. full p34 (shipped)", registry["p34_exact_jaccard_pairs"](spark, sf1))

    # 4. widened join exchange
    n_src = docs.rdd.getNumPartitions()
    sp = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_join = max(sp, n_src)
    print(f"   n_src={n_src} sp={sp} n_join={n_join}")
    inv4 = inv.repartition(n_join, "shingle")
    a = inv4.select(F.col("doc_id").alias("id_a"), "shingle", F.col("n_sh").alias("n_a"))
    b = inv4.select(
        F.col("doc_id").alias("id_b"), "shingle", F.col("n_sh").alias("n_b")
    ).hint("shuffle_hash")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    j = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    p34_wide = inter.filter(j >= 0.5).select("id_a", "id_b", j.alias("jaccard"))
    timeit(spark, "4. p34 join exchange widened", p34_wide)

    # 4b. widened + packed pair key
    pair = (F.col("id_a") * F.lit(1 << 32) + F.col("id_b")).alias("pk")
    inter_b = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(pair, "n_a", "n_b")
        .groupBy("pk")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    j2 = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    p34_pk = (
        inter_b.filter(j2 >= 0.5)
        .select(
            (F.col("pk") / F.lit(1 << 32)).cast("long").alias("id_a"),
            (F.col("pk") % F.lit(1 << 32)).alias("id_b"),
            j2.alias("jaccard"),
        )
    )
    timeit(spark, "4b. widened + packed pair key", p34_pk)

    # 5. group-postings variant: one exchange of inv, pairs from arrays
    g = (
        inv4.groupBy("shingle")
        .agg(F.collect_list(F.struct(F.col("doc_id").alias("id"), F.col("n_sh").alias("n"))).alias("docs"))
        .filter(F.size("docs") >= 2)
    )
    e1 = g.select(F.col("docs"), F.posexplode("docs").alias("i", "da"))
    e2 = e1.select(
        "da", F.expr("slice(docs, i + 2, size(docs))").alias("rest")
    ).select("da", F.explode("rest").alias("db"))
    lo = F.when(F.col("da.id") < F.col("db.id"), F.col("da")).otherwise(F.col("db"))
    hi = F.when(F.col("da.id") < F.col("db.id"), F.col("db")).otherwise(F.col("da"))
    inter5 = (
        e2.select(
            lo["id"].alias("id_a"), lo["n"].alias("n_a"),
            hi["id"].alias("id_b"), hi["n"].alias("n_b"),
        )
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
        )
    )
    j5 = F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
    p34_gp = inter5.filter(j5 >= 0.5).select("id_a", "id_b", j5.alias("jaccard"))
    timeit(spark, "5. group-postings variant", p34_gp)

    # value parity of the variants vs shipped (cheap sanity; real gate is the oracle suite)
    base = registry["p34_exact_jaccard_pairs"](spark, sf1)
    for nm, v in (("wide", p34_wide), ("pk", p34_pk), ("gp", p34_gp)):
        d1 = base.exceptAll(v).count()
        d2 = v.exceptAll(base).count()
        print(f"   parity {nm}: exceptAll {d1}/{d2}", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
