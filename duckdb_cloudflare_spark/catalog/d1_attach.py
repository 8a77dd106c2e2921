"""D1 ATTACH equivalent: expose a remote D1 database as a namespace of temp
views over the ``d1`` DataSource — parity with the reference's storage
extension (/root/reference src/d1_storage.cpp:70-164):

- secret resolution with default-name fallback (:116-127, via catalog.secrets)
- database name → UUID resolution with UUID-shape sniff (:75) falling back to
  a REST list lookup (src/d1_http.cpp:606-614)
- one view per remote table (CreateViewsForAllTables :70-95); view name
  ``{alias}_{table}`` (pure-PySpark equivalent of a catalog namespace)
- catalog DML is intentionally NOT supported — INSERT goes through
  d1_execute / D1Batch, mirroring PlanInsert/... throwing (:39-57)
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession

from duckdb_cloudflare_spark.catalog.secrets import global_registry
from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config, _client_from_options

_UUID_RE = re.compile(
    r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$", re.IGNORECASE
)


def resolve_database_id(client: D1Client, database: str) -> str:
    """UUID passthrough, else name→UUID via the REST database list."""
    if _UUID_RE.match(database):
        return database
    for db in client.list_databases():
        if db.get("name") == database:
            return str(db.get("uuid", ""))
    raise KeyError(f"D1 database '{database}' not found in account")


def d1_attach(
    spark: SparkSession,
    database: str,
    alias: str,
    secret: str = "",
    **opts,
) -> list[str]:
    """Attach: enumerate remote tables, create one temp view per table over
    the d1 DataSource. Returns the created view names."""
    client = _client_from_options({"secret": secret, "database": database, **opts})
    dbid = resolve_database_id(client, database)
    client = D1Client(
        D1Config(
            account_id=client.config.account_id,
            api_token=client.config.api_token,
            database_id=dbid,
            base_url=client.config.base_url,
        ),
        transport=client.transport,
    )
    views = []
    for table in client.list_tables():
        tname = str(table["name"])
        # Like the reference, views carry the secret NAME and resolve it at
        # scan-bind from the secret registry (src/d1_storage.cpp:92,105-124;
        # the registry spills to a 0600 file so DataSource worker processes
        # can resolve it) — no plaintext token lands in view options, query
        # plans, or the Spark UI SQL tab. Rotation contract: Spark caches
        # the DataSource instance inside an existing view's plan, so
        # rotating/dropping the secret takes effect on NEW attaches/loads,
        # not on views already attached (re-attach to pick up rotation).
        # Caller-supplied explicit account_id/api_token opts (the no-secret
        # path) pass through below unchanged — that exposure is the
        # caller's explicit choice, not a resolved secret.
        reader = (
            spark.read.format("d1")
            .option("table", tname)
            .option("database_id", dbid)
        )
        if secret:
            reader = reader.option("secret", secret)
        for k, v in opts.items():
            if k not in ("database_id", "database"):
                reader = reader.option(k, str(v))
        view_name = f"{alias}_{tname}"
        reader.load().createOrReplaceTempView(view_name)
        views.append(view_name)
    return views
