"""SQL *statement* surface of the reference extension, routed to the Python
control-plane APIs — completing script-level migration (a user's DuckDB
script runs verbatim through ``Engine.sql`` / ``execute_script``).

Reference statement syntax covered (citations into /root/reference):

- ``CREATE SECRET [name] (TYPE d1|r2_sql, ACCOUNT_ID '…', API_TOKEN '…')``
  → catalog.secrets.create_secret, with the reference's per-type parameter
  validation (unknown-param / missing-param errors: src/d1_secret.cpp:22-40,
  src/r2_secret.cpp:24-38). Unnamed secrets get DuckDB's default name
  ``__default_<type>`` (matching the fallback list src/d1_storage.cpp:116).
- ``DROP SECRET [IF EXISTS] name``.
- ``ATTACH 'db' [AS alias] (TYPE d1 [, SECRET 'name'] [, extra opts])``
  → catalog.d1_attach.d1_attach (src/d1_storage.cpp:101-143); one temp view
  per remote table. Alias defaults to the database name (info.path), as in
  the reference (``info.path.empty() ? name : info.path``).
- ``DETACH [DATABASE] [IF EXISTS] alias`` → drops the attached views.
- ``BEGIN [TRANSACTION] / COMMIT / ROLLBACK`` → the D1Batch buffer
  lifecycle (src/storage/d1_transaction.cpp:17-70): buffered ``d1_execute``
  statements flush as ONE batch POST on COMMIT; ROLLBACK discards the
  unsent buffer; reads always execute immediately (no read-your-writes).
- ``CALL d1_execute('sql' [, secret => '…', …])`` (and the reference's
  scalar spelling ``SELECT d1_execute('sql')`` — src/d1_functions.cpp:423-450):
  immediate execute returning ``changes``; buffered when a transaction is
  open.
- ``COPY (query) TO 'file'`` (the reference delegates to DuckDB COPY,
  README.md:163-167 / the "Export for heavy processing" tip) →
  ``df.write.parquet/csv/json`` by extension or FORMAT option.
- ``INSERT/UPDATE/DELETE`` against an attached D1 alias → the reference's
  honest error: catalog DML planning is intentionally unsupported there
  (PlanInsert/PlanUpdate/PlanDelete throw "use d1_execute()",
  src/d1_storage.cpp:39-57).

Queries referencing an attached alias as ``alias.table`` are rewritten to
the ``alias_table`` view names before reaching Spark (pure-PySpark stand-in
for a catalog namespace). Everything that is not one of these statements
falls through to ``compat.duck_sql`` (the DuckDB-dialect query migrator).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

from duckdb_cloudflare_spark.catalog.d1_batch import D1Batch
from duckdb_cloudflare_spark.catalog.secrets import global_registry

# Per-type allowed/required option keys for CREATE SECRET — exactly the
# reference's named_parameters (src/d1_secret.cpp:47-50, src/r2_secret.cpp:57-58).
_SECRET_PARAMS = {
    "d1": {"account_id", "api_token"},
    "r2_sql": {"account_id", "api_token"},
}

_CREATE_SECRET_RE = re.compile(
    r"^\s*CREATE\s+(?:OR\s+REPLACE\s+)?(?:PERSISTENT\s+|TEMPORARY\s+)?SECRET"
    r"\s+(?:IF\s+NOT\s+EXISTS\s+)?(?:(\w+)\s*)?\(",
    re.IGNORECASE,
)
_DROP_SECRET_RE = re.compile(
    r"^\s*DROP\s+SECRET\s+(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*$", re.IGNORECASE
)
_ATTACH_RE = re.compile(
    r"^\s*ATTACH\s+(?:DATABASE\s+)?'((?:[^']|'')*)'(?:\s+AS\s+(\w+))?\s*\((.*)\)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DETACH_RE = re.compile(
    r"^\s*DETACH\s+(?:DATABASE\s+)?(?:(IF\s+EXISTS)\s+)?(\w+)\s*;?\s*$", re.IGNORECASE
)
_BEGIN_RE = re.compile(r"^\s*BEGIN(?:\s+TRANSACTION)?\s*;?\s*$", re.IGNORECASE)
_COMMIT_RE = re.compile(r"^\s*COMMIT\s*;?\s*$", re.IGNORECASE)
_ROLLBACK_RE = re.compile(r"^\s*ROLLBACK\s*;?\s*$", re.IGNORECASE)
_D1_EXECUTE_RE = re.compile(
    r"^\s*(?:CALL|SELECT)\s+d1_execute\s*\(", re.IGNORECASE
)
_COPY_RE = re.compile(
    r"^\s*COPY\s*\((?P<query>.*)\)\s*TO\s*'(?P<path>(?:[^']|'')*)'"
    r"\s*(?:\((?P<opts>[^)]*)\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DML_HEAD_RE = re.compile(
    r"^\s*(INSERT\s+INTO|UPDATE|DELETE\s+FROM)\s+([A-Za-z_][\w.]*)", re.IGNORECASE
)


def split_statements(script: str) -> list[str]:
    """Split a SQL script on top-level semicolons (quote/comment-aware)."""
    from duckdb_cloudflare_spark.compat import _scan_top_level

    cuts = [i for i, c, d in _scan_top_level(script) if c == ";" and d == 0]
    out, start = [], 0
    for cut in [*cuts, len(script)]:
        stmt = script[start:cut].strip()
        if stmt:
            out.append(stmt)
        start = cut + 1
    return out


def _split_top_commas(s: str) -> list[str]:
    from duckdb_cloudflare_spark.compat import _scan_top_level

    cuts = [i for i, c, d in _scan_top_level(s) if c == "," and d == 0]
    parts, start = [], 0
    for cut in [*cuts, len(s)]:
        part = s[start:cut].strip()
        if part:
            parts.append(part)
        start = cut + 1
    return parts


def _unquote(v: str) -> str:
    v = v.strip()
    if len(v) >= 2 and v[0] == "'" and v[-1] == "'":
        return v[1:-1].replace("''", "'")
    return v


def _parse_options(body: str) -> dict[str, str]:
    """``TYPE d1, SECRET 'name', ACCOUNT_ID 'x'`` → lowercase-keyed dict.
    Accepts ``KEY value``, ``KEY 'value'``, and ``KEY = value`` spellings."""
    opts: dict[str, str] = {}
    for part in _split_top_commas(body):
        m = re.match(r"^(\w+)\s*(?:=\s*)?(.*)$", part, re.DOTALL)
        if not m or not m.group(2).strip():
            raise ValueError(f"cannot parse option: {part!r}")
        opts[m.group(1).lower()] = _unquote(m.group(2))
    return opts


def _status_df(spark: SparkSession, ok: bool = True) -> DataFrame:
    return spark.createDataFrame([(ok,)], "Success boolean")


class StatementDispatcher:
    """Session-scoped statement executor; owns the attachment map and the
    (at most one) open D1 transaction buffer."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.attachments: dict[str, list[str]] = {}  # alias -> view names
        self._txn: list[str] | None = None  # buffered d1_execute SQL
        self._txn_opts: dict[str, str] | None = None  # client opts of the txn

    # -- public entry points ------------------------------------------------
    def execute(self, sql: str) -> DataFrame:
        """Execute ONE statement; queries fall through to duck_sql."""
        handler = self._match(sql)
        if handler is not None:
            return handler
        from duckdb_cloudflare_spark.compat import duck_sql

        return duck_sql(self.spark, self._rewrite_attached_refs(sql))

    def execute_script(self, script: str) -> DataFrame:
        """Run every ``;``-separated statement; returns the LAST result."""
        result: DataFrame | None = None
        for stmt in split_statements(script):
            result = self.execute(stmt)
        if result is None:
            raise ValueError("empty script")
        return result

    # -- statement matching ---------------------------------------------------
    def _match(self, sql: str) -> DataFrame | None:
        if _CREATE_SECRET_RE.match(sql):
            return self._create_secret(sql)
        m = _DROP_SECRET_RE.match(sql)
        if m:
            return self._drop_secret(m.group(2), bool(m.group(1)))
        m = _ATTACH_RE.match(sql)
        if m:
            return self._attach(m)
        m = _DETACH_RE.match(sql)
        if m:
            return self._detach(m.group(2), bool(m.group(1)))
        if _BEGIN_RE.match(sql):
            return self._begin()
        if _COMMIT_RE.match(sql):
            return self._commit()
        if _ROLLBACK_RE.match(sql):
            return self._rollback()
        if _D1_EXECUTE_RE.match(sql):
            return self._d1_execute(sql)
        m = _COPY_RE.match(sql)
        if m:
            return self._copy(m)
        m = _DML_HEAD_RE.match(sql)
        if m and self._targets_attached(m.group(2)):
            # Honest mirror of the reference's unsupported catalog DML
            # (src/d1_storage.cpp:39-57).
            verb = m.group(1).split()[0].upper()
            raise NotImplementedError(
                f"{verb} on an attached D1 database is not supported "
                "(the reference throws the same); use d1_execute() / "
                "CALL d1_execute('…') or a D1 transaction block instead"
            )
        return None

    # -- handlers -------------------------------------------------------------
    def _create_secret(self, sql: str) -> DataFrame:
        m = _CREATE_SECRET_RE.match(sql)
        assert m is not None
        open_idx = m.end() - 1
        close_idx = _match_paren(sql, open_idx)
        opts = _parse_options(sql[open_idx + 1 : close_idx])
        stype = opts.pop("type", "").lower()
        if stype not in _SECRET_PARAMS:
            raise ValueError(
                f"Unknown secret type: '{stype}'. Expected: d1, r2_sql"
            )
        allowed = _SECRET_PARAMS[stype]
        for k in opts:
            if k not in allowed:
                raise ValueError(
                    f"Unknown parameter for {stype} secret: '{k}'. "
                    f"Expected: {', '.join(sorted(allowed))}"
                )
        for k in sorted(allowed):
            if k not in opts:
                raise ValueError(f"{stype} secret requires '{k}' parameter")
        name = m.group(1) or f"__default_{stype}"
        global_registry().create_secret(name, type=stype, **opts)
        return _status_df(self.spark)

    def _drop_secret(self, name: str, if_exists: bool) -> DataFrame:
        reg = global_registry()
        if not if_exists and all(s.name != name for s in reg.list_secrets()):
            raise KeyError(f"Secret '{name}' not found")
        reg.drop_secret(name)
        return _status_df(self.spark)

    def _attach(self, m: re.Match) -> DataFrame:
        from duckdb_cloudflare_spark.catalog.d1_attach import d1_attach

        database = m.group(1).replace("''", "'")
        opts = _parse_options(m.group(3))
        dtype = opts.pop("type", "").lower()
        if dtype != "d1":
            raise ValueError(
                f"ATTACH (TYPE {dtype or '<missing>'}) is not supported; "
                "only TYPE d1 (the reference's storage extension)"
            )
        secret = opts.pop("secret", "")
        # Reference: alias defaults to the database path/name
        # (src/d1_storage.cpp:138 — info.path.empty() ? name : info.path).
        alias = m.group(2) or re.sub(r"\W", "_", database)
        views = d1_attach(self.spark, database, alias, secret=secret, **opts)
        self.attachments[alias] = views
        return self.spark.createDataFrame([(v,) for v in views], "view string")

    def _detach(self, alias: str, if_exists: bool) -> DataFrame:
        views = self.attachments.pop(alias, None)
        if views is None:
            if if_exists:
                return _status_df(self.spark)
            raise KeyError(f"database '{alias}' is not attached")
        for v in views:
            self.spark.catalog.dropTempView(v)
        return _status_df(self.spark)

    def _begin(self) -> DataFrame:
        if self._txn is not None:
            raise RuntimeError("a transaction is already open")
        self._txn, self._txn_opts = [], None
        return _status_df(self.spark)

    def _commit(self) -> DataFrame:
        if self._txn is None:
            raise RuntimeError("no open transaction")
        stmts, opts = self._txn, self._txn_opts
        self._txn = self._txn_opts = None
        if stmts:
            from duckdb_cloudflare_spark.sources.d1 import _client_from_options

            batch = D1Batch(_client_from_options(opts or {}))
            for s in stmts:
                batch.execute(s)
            changes = batch.commit()
            return self.spark.createDataFrame(
                [(int(c),) for c in changes], "changes bigint"
            )
        return _status_df(self.spark)

    def _rollback(self) -> DataFrame:
        if self._txn is None:
            raise RuntimeError("no open transaction")
        self._txn = self._txn_opts = None
        return _status_df(self.spark)

    def _d1_execute(self, sql: str) -> DataFrame:
        m = _D1_EXECUTE_RE.match(sql)
        assert m is not None
        close_idx = _match_paren(sql, m.end() - 1)
        trailing = sql[close_idx + 1 :].strip().rstrip(";").strip()
        if trailing:
            # `SELECT d1_execute('…') AS c, other FROM t` must not silently
            # execute the call and drop the rest of the statement.
            raise ValueError(
                "d1_execute must be the entire statement "
                f"(unexpected trailing SQL: {trailing[:60]!r}); compose "
                "results in a follow-up query instead"
            )
        args = _split_top_commas(sql[m.end() : close_idx])
        if not args:
            raise ValueError("d1_execute requires a SQL string argument")
        stmt = _unquote(args[0])
        opts: dict[str, str] = {}
        for extra in args[1:]:
            km = re.match(r"^(\w+)\s*(?::=|=>)\s*(.*)$", extra, re.DOTALL)
            if not km:
                raise ValueError(f"cannot parse d1_execute argument: {extra!r}")
            opts[km.group(1).lower()] = _unquote(km.group(2))
        if self._txn is not None:
            if self._txn_opts is None:
                self._txn_opts = opts
            elif opts and opts != self._txn_opts:
                raise ValueError(
                    "d1_execute with different connection options inside one "
                    "transaction — one batch targets one database"
                )
            self._txn.append(stmt)
            return self.spark.createDataFrame([(True,)], "buffered boolean")
        from duckdb_cloudflare_spark.sources.d1 import _client_from_options

        changes = _client_from_options(opts).execute(stmt)
        return self.spark.createDataFrame([(int(changes),)], "changes bigint")

    def _copy(self, m: re.Match) -> DataFrame:
        from duckdb_cloudflare_spark.compat import duck_sql

        path = m.group("path").replace("''", "'")
        fmt = None
        if m.group("opts"):
            copy_opts = _parse_options(m.group("opts"))
            fmt = copy_opts.get("format", "").lower() or None
        if fmt is None:
            ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
            fmt = {"parquet": "parquet", "csv": "csv", "json": "json"}.get(ext)
        if fmt not in ("parquet", "csv", "json"):
            raise ValueError(f"COPY TO: unsupported format for '{path}'")
        df = duck_sql(self.spark, self._rewrite_attached_refs(m.group("query")))
        writer = df.write.mode("overwrite")
        if fmt == "csv":
            writer = writer.option("header", "true")
        getattr(writer, fmt)(path)
        # Count the rows actually WRITTEN, not a re-execution of the query:
        # df.count() would recompute the whole plan (re-reading remote
        # sources, where reads are not free, and doubling compute at scale)
        # and could disagree with the written rows for nondeterministic
        # queries. Reading the output back is a local metadata+scan of what
        # was just written.
        reader = self.spark.read
        if fmt == "csv":
            # multiLine: Spark's CSV writer quotes embedded newlines; a plain
            # read-back would count each physical line of such a value as a
            # row and over-report Count (ADVICE r6). Match the writer's quote
            # and escape defaults so the quoted field round-trips as one row.
            reader = (
                reader.option("header", "true")
                .option("multiLine", "true")
                .option("quote", '"')
                .option("escape", "\\")
            )
        n = getattr(reader, fmt)(path).count()
        return self.spark.createDataFrame([(n,)], "Count bigint")

    # -- attached-alias rewriting --------------------------------------------
    def _targets_attached(self, target: str) -> bool:
        alias = target.split(".")[0]
        return alias in self.attachments or target in {
            v for vs in self.attachments.values() for v in vs
        }

    def _rewrite_attached_refs(self, sql: str) -> str:
        """``alias.table`` → ``alias_table`` for every attached alias (the
        temp-view naming d1_attach uses), quote/comment-aware. A qualified
        name is rewritten ONLY when it resolves to one of the attachment's
        known views, so a query-local table alias that happens to equal an
        attached database name (``SELECT m.col FROM metrics m`` with a db
        attached as ``m``) is left untouched (ADVICE r5)."""
        if not self.attachments:
            return sql
        from duckdb_cloudflare_spark.compat import _scan_top_level

        real = {i for i, _, _ in _scan_top_level(sql)}
        out = list(sql)
        for alias, views in self.attachments.items():
            known = {v.lower() for v in views}
            for am in re.finditer(
                rf"\b{re.escape(alias)}\.(\w+)", sql, re.IGNORECASE
            ):
                if (
                    am.start() in real
                    and f"{alias}_{am.group(1)}".lower() in known
                ):
                    out[am.start() + len(alias)] = "_"
        return "".join(out)


def _match_paren(sql: str, open_idx: int) -> int:
    from duckdb_cloudflare_spark.compat import _match_paren as mp

    return mp(sql, open_idx)
