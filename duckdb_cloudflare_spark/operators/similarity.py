"""Similarity search over embedding columns: brute-force cosine top-k as the
exact baseline, and an LSH-bucketed approximate variant as the scale path.

Scale notes:
- brute_force_topk is a broadcast-join (queries side is small by contract)
  followed by a per-query top-k window — corpus never shuffles, the scan
  streams. That is the right plan at any corpus size as long as the query
  set fits in a broadcast (the usual ANN-serving shape).
- lsh_topk buckets both sides with a random-hyperplane sketch (with
  multi-probe on the query side) so each query only scores its bucket —
  the 1000-executor plan for corpus × corpus expansion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from duckdb_cloudflare_spark.operators.dedup import (
    _hyperplane_sketch,
    cosine_similarity,
    ensure_parallelism,
)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for every query vector.

    Returns (query_id, neighbor_id, cosine_sim, nn_rank), excluding self-matches.
    Deterministic tie-break on (sim DESC, neighbor_id ASC).
    """
    q = queries.select(F.col(query_id).alias("query_id"), F.col(query_vec).alias("qv"))
    c = ensure_parallelism(corpus).select(
        F.col(corpus_id).alias("neighbor_id"), F.col(corpus_vec).alias("cv")
    )
    scored = (
        c.join(broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "nn_rank")
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    seed: int = 42,
    query_id: str = "vec_id",
    query_vec: str = "embedding",
    corpus_id: str = "vec_id",
    corpus_vec: str = "embedding",
) -> DataFrame:
    """Approximate top-k: random-hyperplane bucket join + exact rescoring
    inside the bucket. Multi-probe: each query also probes the num_planes
    buckets at Hamming distance 1 from its own sketch, which recovers most
    boundary losses at the cost of (num_planes+1)× the query-side rows
    (queries are the small side — cheap)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    first = corpus.select(F.size(F.col(corpus_vec)).alias("d")).first()
    dim = first["d"] if first else 0
    planes = rng.standard_normal((num_planes, dim))

    c = ensure_parallelism(corpus).select(
        F.col(corpus_id).alias("neighbor_id"),
        F.col(corpus_vec).alias("cv"),
        _hyperplane_sketch(F.col(corpus_vec), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(query_vec).alias("qv"),
        _hyperplane_sketch(F.col(query_vec), planes).alias("sk"),
    )
    probes = F.array(
        F.col("sk"), *[F.col("sk").bitwiseXOR(F.lit(2**i).cast("bigint")) for i in range(num_planes)]
    )
    qp = q.select("query_id", "qv", F.explode(probes).alias("bucket"))
    scored = (
        c.join(broadcast(qp), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine_sim", F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("nn_rank", F.row_number().over(w))
        .filter(F.col("nn_rank") <= k)
        .select("query_id", "neighbor_id", "cosine_sim", "nn_rank")
    )
