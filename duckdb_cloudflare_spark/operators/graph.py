"""Link-graph operators: PageRank as an unrolled DataFrame loop.

The curation toolkit scores documents (p15/p53/p65) and domains (p71);
link ANALYSIS is the remaining quality signal a crawl pipeline uses —
domain authority for source weighting (the classic web-quality prior).
Like the other iterative operators (p42/p45 k-means, p65 logistic GD),
the LOOP is the operator: each power iteration is ONE partial-aggregated
pass over the edge table with the rank vector riding a broadcast.

Scale shape: the EDGE table is the corpus-scale side and is traversed
once per iteration, map-side joined against the BROADCAST rank/out-weight
tables (node-cardinality — domains, not pages; millions of rows
broadcast fine). The per-iteration shuffle is the groupBy(dst) partial
aggregate of contributions — node-cardinality output. Nothing
node-squared, no driver collect; ``iterations`` chained lazily.

Determinism: contribution sums are order-dependent floats, so each
iteration's rank vector is rounded to ``round_dp`` BEFORE feeding the
next iteration (the fit_logistic round_dp convention — an unrounded ulp
amplifies across iterations), letting an unrolled-CTE SQL oracle
reproduce the exact doubles.

Reference: Page et al. '99 (the PageRank paper); damping as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    weight: str = "w",
    iterations: int = 3,
    damping: float = 0.85,
    round_dp: int = 9,
) -> DataFrame:
    """``iterations`` unrolled weighted-PageRank power steps over an edge
    list (src, dst, weight). Returns (node, rank) for every node that
    appears as a source or destination.

    Update rule (weighted, dangling-free graphs):
        r'(v) = (1 − d)/N + d · Σ_{(u,v)} r(u) · w(u,v) / outw(u)
    Nodes with no incoming edges keep the (1 − d)/N teleport mass.
    Dangling nodes (no outgoing edges) lose their mass to the teleport
    term — acceptable for the domain-authority use and documented; feed a
    self-loop per dangling node if mass conservation matters.

    Each iteration's ranks are rounded to ``round_dp`` (cross-engine
    canonicalization — oracles must round their intermediate CTEs
    identically)."""
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("double").alias("w"),
    )
    nodes = e.select(F.col("src").alias("node")).union(
        e.select(F.col("dst").alias("node"))
    ).distinct()
    n = nodes.agg(F.count(F.lit(1)).cast("double").alias("n_nodes"))
    outw = e.groupBy("src").agg(F.sum("w").alias("outw"))
    # normalized edge fractions, computed ONCE (w/outw is iteration-free)
    frac = e.join(broadcast(outw), "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("frac")
    )
    teleport = (F.lit(1.0) - F.lit(damping)) / F.col("n_nodes")
    ranks = nodes.crossJoin(broadcast(n)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), round_dp).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            frac.join(
                broadcast(ranks.select(F.col("node").alias("src"), "rank")), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("frac") * F.col("rank")).alias("inbound"))
        )
        ranks = (
            nodes.join(contrib.select(F.col("dst").alias("node"), "inbound"), "node", "left")
            .crossJoin(broadcast(n))
            .select(
                "node",
                F.round(
                    teleport
                    + F.lit(damping) * F.coalesce(F.col("inbound"), F.lit(0.0)),
                    round_dp,
                ).alias("rank"),
            )
        )
    return ranks
