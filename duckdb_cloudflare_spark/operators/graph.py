"""Link-graph operators: PageRank as an unrolled DataFrame loop.

The curation toolkit scores documents (p15/p53/p65) and domains (p71);
link ANALYSIS is the remaining quality signal a crawl pipeline uses —
domain authority for source weighting (the classic web-quality prior).
Like the other iterative operators (p42/p45 k-means, p65 logistic GD),
the LOOP is the operator: each power iteration is ONE partial-aggregated
pass over the edge table with the rank vector riding a broadcast.

Scale shape: the EDGE table is the corpus-scale side and is traversed
once per iteration, equi-joined on ``src`` against the rank/out-weight
tables (node-cardinality). Those joins are NOT broadcast-hinted by
default (VERDICT r8: at web scale the eTLD+1 node set is 10^8+ rows —
past Spark's broadcast limits and the driver's memory; forcing the hint
ships the FULL rank vector every iteration). With no hint, AQE
broadcasts at runtime when the rank table measures small and falls back
to a hash-partitioned join when it doesn't — the right call at both
ends of the scale. A caller that KNOWS its node set is bounded (e.g. a
fixed domain whitelist) can pass ``nodes_hint`` to force the map-side
plan. The per-iteration shuffle is the groupBy(dst) partial aggregate
of contributions — node-cardinality output. Nothing node-squared, no
driver collect; ``iterations`` chained lazily.

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
    nodes_hint: int | None = None,
) -> DataFrame:
    """``iterations`` unrolled weighted-PageRank power steps over an edge
    list (src, dst, weight). Returns (node, rank) for every node that
    appears as a source or destination.

    ``nodes_hint``: caller-asserted node count. When given and small
    enough to broadcast safely (< 4M nodes ~ tens of MB), the
    node-cardinality rank/out-weight tables ride a broadcast hint onto
    the edge traversal; otherwise they join plainly (hash-partitioned,
    AQE still broadcasts at runtime when the measured size is small).
    The 1-row node-count aggregate is always broadcast.

    Update rule (weighted, dangling-free graphs):
        r'(v) = (1 − d)/N + d · Σ_{(u,v)} r(u) · w(u,v) / outw(u)
    Nodes with no incoming edges keep the (1 − d)/N teleport mass.
    Dangling nodes (no outgoing edges) lose their mass to the teleport
    term — acceptable for the domain-authority use and documented; feed a
    self-loop per dangling node if mass conservation matters.

    Each iteration's ranks are rounded to ``round_dp`` (cross-engine
    canonicalization — oracles must round their intermediate CTEs
    identically)."""
    node_side = (
        broadcast if (nodes_hint is not None and nodes_hint < 4_000_000)
        else (lambda df: df)
    )
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
    frac = e.join(node_side(outw), "src").select(
        "src", "dst", (F.col("w") / F.col("outw")).alias("frac")
    )
    teleport = (F.lit(1.0) - F.lit(damping)) / F.col("n_nodes")
    ranks = nodes.crossJoin(broadcast(n)).select(
        "node", F.round(F.lit(1.0) / F.col("n_nodes"), round_dp).alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            frac.join(
                node_side(ranks.select(F.col("node").alias("src"), "rank")), "src"
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
