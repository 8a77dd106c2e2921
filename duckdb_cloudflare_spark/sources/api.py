"""Convenience reader API: the reference's LIMIT/DISTINCT-ON rewrites as an
explicit wrapper (SURVEY §4.1 option b).

The reference's optimizer hooks rewrite plan nodes the Python DataSource API
cannot see:

- LIMIT n  → deletes the plan's LIMIT and divides n across the crawl
  fan-out as the CDX ``&limit=`` parameter
  (/root/reference src/common_crawl_index.cpp:1474-1526, division at
  :1510-1513; src/internet_archive.cpp:1415-1475).
- DISTINCT ON (expr) → Wayback ``collapse=`` parameter
  (/root/reference src/internet_archive.cpp:1484-1893):

      DISTINCT ON (urlkey)               → collapse=urlkey
      DISTINCT ON (substr(urlkey, 1, N)) → collapse=urlkey:N
      DISTINCT ON (substr(timestamp,1,N))→ collapse=timestamp:N  (e.g. 4 → one
                                           capture per year, 6 → per month)

Spark's ``pushFilters`` receives only filters — a bare ``.limit(n)`` or
``.dropDuplicates()`` stays in the Spark plan and the reader over-fetches its
default ``max_results``. These wrappers close that usability gap: ``limit=``
sets the remote fetch cap (divided per crawl exactly like the reference) AND
applies the Spark-side limit; ``collapse=`` forwards the server-side dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from duckdb_cloudflare_spark.session import register_sources


def read_common_crawl(
    spark: SparkSession,
    url: str,
    *,
    limit: int | None = None,
    offset: int | None = None,
    crawl_id: str | None = None,
    fetch_response: bool = False,
    url_regex: str | None = None,
    **options: str,
) -> DataFrame:
    """``common_crawl`` scan with reference LIMIT semantics: ``limit=n`` is
    divided across the resolved crawls as the CDX fetch cap with CEILING
    division (one crawl gets ``ceil(n / n_crawls)``, min 1 —
    src/common_crawl_index.cpp:1510-1513, ``(limit + n - 1) / n``) and the
    exact ``n`` is enforced Spark-side by ``.limit(n)``. ``url_regex`` adds the reference's
    SIMILAR-TO pushdown (``~url:^regex$``, anchors added when missing —
    src/common_crawl_index.cpp:1163-1197); regexes never reach Spark's
    ``pushFilters``, so the named parameter is the only route. Extra
    ``options`` pass through to the reader (filter, from, to, debug,
    dry_run, timeout, ...)."""
    register_sources(spark)
    r = spark.read.format("common_crawl").option("url", url)
    if url_regex:
        rx = url_regex
        if not rx.startswith("^"):
            rx = "^" + rx
        if not rx.endswith("$"):
            rx = rx + "$"
        existing = options.pop("filter", "")
        options["filter"] = (existing + ";;" if existing else "") + f"~url:{rx}"
    if crawl_id:
        r = r.option("crawl_id", crawl_id)
    if limit is not None:
        r = r.option("max_results", str(int(limit)))
    if offset is not None:
        r = r.option("offset", str(int(offset)))
    if fetch_response:
        r = r.option("fetch_response", "true")
    for k, v in options.items():
        r = r.option(k, str(v))
    df = r.load()
    if limit is not None:
        df = df.limit(int(limit))
    return df


def read_wayback(
    spark: SparkSession,
    url: str,
    *,
    limit: int | None = None,
    offset: int | None = None,
    collapse: str | None = None,
    fast_latest: bool = False,
    fetch_response: bool = False,
    urlkey_regex: str | None = None,
    **options: str,
) -> DataFrame:
    """``wayback_machine`` scan with the reference's named-parameter surface:
    ``limit=n`` sets the CDX fetch cap and the Spark-side limit; ``collapse``
    takes the DISTINCT-ON mapping from the module docstring (repeatable via
    ';;'); ``fast_latest`` requests newest-first server ordering (negative
    CDX limit, src/internet_archive.cpp:1415-1475); ``urlkey_regex`` adds
    the reference's SIMILAR-TO pushdown as a ``urlkey:regex`` server filter
    (src/internet_archive.cpp:987-1005 — regexes never reach Spark's
    ``pushFilters``)."""
    register_sources(spark)
    r = spark.read.format("wayback_machine").option("url", url)
    if urlkey_regex:
        existing = options.pop("filter", "")
        options["filter"] = (
            (existing + ";;" if existing else "") + f"urlkey:{urlkey_regex}"
        )
    if limit is not None:
        r = r.option("max_results", str(int(limit)))
    if offset is not None:
        r = r.option("offset", str(int(offset)))
    if collapse:
        r = r.option("collapse", collapse)
    if fast_latest:
        r = r.option("fast_latest", "true")
    if fetch_response:
        r = r.option("fetch_response", "true")
    for k, v in options.items():
        r = r.option(k, str(v))
    df = r.load()
    if limit is not None:
        df = df.limit(int(limit))
    return df
