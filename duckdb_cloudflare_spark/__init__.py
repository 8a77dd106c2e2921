"""duckdb_cloudflare_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference DuckDB extension
``midwork-finds-jobs/duckdb-cloudflare`` (studied read-only at /root/reference).

Architecture (Spark-first, not a port):

- ``session``     — SparkSession factory tuned for the workload (AQE, Arrow, UTC).
- ``queries``     — the declared relational + pipeline query inventory
                    (SURVEY.md §2 layer B + beyond-reference operators), each
                    paired with a DuckDB oracle SQL string.
- ``util``        — pure-Python ports of the reference's content utilities
                    (LIKE→regex, CDX timestamps, UTF-8 sanitize, gzip, WARC/HTTP
                    parsing) usable standalone and inside DataSource readers.
- ``sources``     — PySpark DataSource implementations of the reference's four
                    federated table-function families (common_crawl, wayback
                    machine, D1, R2 SQL) with projection/predicate pushdown.
- ``catalog``     — secrets registry, D1 attach (views), D1 batched transactions.
- ``operators``   — large-scale training-data pipeline operators (dedup families,
                    similarity search, text analysis, multimodal plumbing).
"""

from duckdb_cloudflare_spark.session import get_spark  # noqa: F401


def connect(*args, **kwargs):
    """Engine facade entry point (lazy import — see ``engine.connect``)."""
    from duckdb_cloudflare_spark.engine import connect as _connect

    return _connect(*args, **kwargs)

__version__ = "0.1.0"
