"""One-call entry point: the surface a user of the reference extension
switches to.

The reference is used as ``duckdb.connect()`` → ``CREATE SECRET`` →
``SELECT ... FROM common_crawl_index()/wayback_machine()/d1_scan(...)`` in
the DuckDB dialect. The equivalent here:

    from duckdb_cloudflare_spark.engine import connect

    eng = connect()                     # or Engine(existing_spark_session)
    eng.attach_parquet_dir("/data")     # local tables become SQL views
    eng.create_secret("cf", type="d1", account_id=..., api_token=...)
    df = eng.sql("SELECT ... QUALIFY row_number() OVER (...) <= 3")
    cc = eng.read_common_crawl("*.example.com/*", limit=100)
    wb = eng.read_wayback("example.com", distinct_on=("year", "month"))
    with eng.d1_transaction("cf") as tx:
        tx.execute("INSERT INTO t VALUES (1)")

``sql`` accepts the DuckDB dialect idioms the compat layer rewrites
(QUALIFY, SELECT * EXCLUDE, function-name aliases, direct
``'file.parquet'`` table references); the reference's content utilities
(sanitize_utf8, parse_warc, gzip, CDX timestamps) are registered as SQL
functions on connect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from duckdb_cloudflare_spark.session import get_spark, register_sources

_DEFAULT_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)


class Engine:
    """Facade over a SparkSession with every engine surface wired up:
    custom DataSources registered, content functions SQL-registered, and
    the DuckDB-dialect ``sql()`` entry point."""

    def __init__(self, spark: SparkSession):
        from duckdb_cloudflare_spark.functions.content import register_all
        from duckdb_cloudflare_spark.functions.table_functions import (
            register_table_functions,
        )

        from duckdb_cloudflare_spark.catalog.statements import StatementDispatcher

        self.spark = spark
        register_sources(spark)
        register_all(spark)
        # The reference's table-function call shape in SQL:
        # SELECT * FROM common_crawl_index(url := '...', ...) — ``:=`` is
        # rewritten to ``=>`` by duck_sql (compat.rewrite_named_args).
        register_table_functions(spark)
        # Statement surface (ATTACH / CREATE SECRET / BEGIN-COMMIT /
        # CALL d1_execute / COPY TO): session-scoped dispatcher holding the
        # attachment map and the open transaction buffer.
        self.statements = StatementDispatcher(spark)

    # -- SQL (DuckDB dialect accepted, statements included) --------------
    def sql(self, query: str) -> DataFrame:
        """One statement or query in the reference's DuckDB dialect.
        Control-plane statements (ATTACH, CREATE/DROP SECRET, BEGIN/COMMIT/
        ROLLBACK, CALL d1_execute, COPY TO) route to the Python APIs;
        queries go through the compat rewriters to spark.sql."""
        return self.statements.execute(query)

    def execute_script(self, script: str) -> DataFrame:
        """Run a whole ``;``-separated reference SQL script; returns the
        last statement's result."""
        return self.statements.execute_script(script)

    # -- local data -----------------------------------------------------
    def attach_parquet_dir(
        self, data_dir: str, tables: tuple[str, ...] | None = None
    ) -> list[str]:
        """Register ``<data_dir>/<t>.parquet`` as temp view ``t`` for every
        ``t`` in ``tables`` (default: the testdata star schema; missing
        files are skipped). Returns the view names registered."""
        from duckdb_cloudflare_spark.queries import load

        registered = []
        for t in tables or _DEFAULT_TABLES:
            if os.path.exists(os.path.join(data_dir, f"{t}.parquet")):
                load(self.spark, data_dir, t).createOrReplaceTempView(t)
                registered.append(t)
        return registered

    # -- curation pipeline ----------------------------------------------
    def curate(self, docs: DataFrame, **kwargs) -> DataFrame:
        """Full deterministic curation pass (quality gate → exact dedup →
        near-dup keep-best → temperature rebalance → epoch shuffle) over a
        document DataFrame; see ``operators.curation.curate`` for knobs.
        The composition is hash-verified end-to-end against DuckDB (p54)."""
        from duckdb_cloudflare_spark.operators.curation import curate

        return curate(docs, **kwargs)

    def corpus_diff(self, old: DataFrame, new: DataFrame, **kwargs) -> DataFrame:
        """Dataset-version diff: per-id added/removed/changed/unchanged by
        content fingerprint (hash-verified as p66); streaming twin in
        ``streaming.documents.diff_stream``."""
        from duckdb_cloudflare_spark.operators.curation import corpus_diff

        return corpus_diff(old, new, **kwargs)

    def canonicalize_urls(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """Add ``canonical_url`` (the crawl dedup key, hash-verified as p63)
        next to ``url_col``."""
        from pyspark.sql import functions as F

        from duckdb_cloudflare_spark.operators.web import canonicalize_url

        return df.withColumn("canonical_url", canonicalize_url(F.col(url_col)))

    def fit_quality_model(
        self, df: DataFrame, feature_cols: list, label_col: str, **kwargs
    ) -> DataFrame:
        """Batch-GD logistic-regression fit over corpus features (the
        quality-classifier training stage, hash-verified as p65)."""
        from duckdb_cloudflare_spark.operators.quality_model import fit_logistic

        return fit_logistic(df, feature_cols, label_col, **kwargs)

    # -- federated sources ----------------------------------------------
    def read_common_crawl(self, url: str, **kwargs) -> DataFrame:
        from duckdb_cloudflare_spark.sources.api import read_common_crawl

        return read_common_crawl(self.spark, url, **kwargs)

    def read_wayback(self, url: str, **kwargs) -> DataFrame:
        from duckdb_cloudflare_spark.sources.api import read_wayback

        return read_wayback(self.spark, url, **kwargs)

    # -- secrets / D1 control plane -------------------------------------
    def create_secret(self, name: str, **kv) -> None:
        from duckdb_cloudflare_spark.catalog.secrets import create_secret

        create_secret(name, **kv)

    def attach_d1(self, database: str, alias: str, secret: str = "", **opts):
        from duckdb_cloudflare_spark.catalog.d1_attach import d1_attach

        return d1_attach(self.spark, database, alias, secret=secret, **opts)

    def d1_transaction(self, secret: str = "", **opts):
        """Buffered D1 batch (reference transaction semantics: one POST on
        clean exit, rollback discards the unsent buffer)."""
        from duckdb_cloudflare_spark.catalog.d1_batch import D1Batch
        from duckdb_cloudflare_spark.sources.d1 import _client_from_options

        return D1Batch(_client_from_options({"secret": secret, **opts}))


def connect(
    master: str | None = None,
    data_dir: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> Engine:
    """Build the engine on a fresh (or existing) tuned SparkSession; when
    ``data_dir`` is given its parquet tables are attached as views."""
    eng = Engine(get_spark("duckdb_cloudflare_spark", master=master, extra_conf=extra_conf))
    if data_dir:
        eng.attach_parquet_dir(data_dir)
    return eng
