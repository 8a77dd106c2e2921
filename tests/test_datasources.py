"""Hermetic integration tests for the federated DataSources: canned CDX/WARC
payloads via FixtureTransport, a SQLite-backed D1 API stub, and dry-run
golden-URL assertions — the reference test suite's structure (SURVEY §5)
mapped to spark.read.format(...)."""

from __future__ import annotations

import gzip
import json
import sqlite3

import pytest

from duckdb_cloudflare_spark.sources.cdx import build_cc_cdx_url

CC_CRAWL = "CC-MAIN-2025-43"
CC_FIELDS = ["url", "timestamp", "mimetype", "statuscode", "digest", "filename", "offset", "length"]

WARC_RECORD = (
    b"WARC/1.0\r\n"
    b"WARC-Type: response\r\n"
    b"\r\n"
    b"HTTP/1.1 200 OK\r\n"
    b"Content-Type: text/html\r\n"
    b"\r\n"
    b"<html>fixture page</html>"
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """Build the B1-B3 fixtures: CDX ND-JSON + WARC blob + manifest."""
    d = tmp_path_factory.mktemp("cdx_fixtures")
    member = gzip.compress(WARC_RECORD)
    (d / "blob.warc.gz").write_bytes(member)

    cdx_rows = [
        {
            "url": "https://www.example.com/",
            "timestamp": "20251015120000",
            "mime": "text/html",
            "status": "200",
            "digest": "DIGESTAAAA",
            "filename": "crawl-data/seg/x.warc.gz",
            # offset 0 marks an INVALID record (reference common_crawl_index.cpp:212-214)
            "offset": "10",
            "length": str(len(member)),
        },
        {
            "url": "https://www.example.com/about",
            "timestamp": "20251016120000",
            "mime": "text/html",
            "status": "404",
            "digest": "DIGESTBBBB",
            "filename": "",
            "offset": "0",
            "length": "0",
        },
    ]
    ndjson = "\n".join(json.dumps(r) for r in cdx_rows)
    (d / "cc_cdx.ndjson").write_text(ndjson)

    wayback_csv = (
        "com,example)/ 20240601120000 http://example.com/ text/html 200 DIG1 1000\n"
        "com,example)/a 19990214000000 http://example.com/a text/plain 200 DIG2 2000\n"
        "com,example)/b 20251115000000 http://example.com/b - - DIG3 -\n"
    )
    (d / "ia_cdx.csv").write_text(wayback_csv)

    cc_url = build_cc_cdx_url(CC_CRAWL, "*.example.com/*", CC_FIELDS, max_results=100)
    from duckdb_cloudflare_spark.sources.cdx import build_wayback_cdx_url, WAYBACK_ORDERED_FIELDS

    wb_url = build_wayback_cdx_url(
        "example.com/*", fields_needed=list(WAYBACK_ORDERED_FIELDS), max_results=100
    )
    manifest = {
        cc_url: "cc_cdx.ndjson",
        f"https://data.commoncrawl.org/crawl-data/seg/x.warc.gz|Range:bytes=10-{10+len(member)-1}": "blob.warc.gz",
        wb_url: "ia_cdx.csv",
    }
    (d / "manifest.json").write_text(json.dumps(manifest))
    return str(d)


@pytest.fixture(scope="module")
def registered(spark):
    from duckdb_cloudflare_spark.session import register_sources

    register_sources(spark)
    return spark


class TestCommonCrawlSource:
    def test_schema_without_debug(self, registered, fixture_dir):
        df = (
            registered.read.format("common_crawl")
            .option("url", "*.example.com/*")
            .option("crawl_id", CC_CRAWL)
            .option("fixture_dir", fixture_dir)
            .load()
        )
        names = df.columns
        assert names[:9] == [
            "url", "timestamp", "mimetype", "statuscode", "digest",
            "filename", "offset", "length", "crawl_id",
        ]
        assert "cdx_url" not in names
        assert df.schema["warc"].dataType.simpleString() == (
            "struct<version:string,headers:map<string,string>>"
        )
        assert df.schema["response"].dataType.simpleString() == (
            "struct<body:binary,headers:map<string,string>,http_version:string,error:string>"
        )

    def test_debug_adds_cdx_url(self, registered, fixture_dir):
        df = (
            registered.read.format("common_crawl")
            .option("url", "x")
            .option("debug", "true")
            .option("dry_run", "true")
            .option("crawl_id", CC_CRAWL)
            .load()
        )
        assert "cdx_url" in df.columns

    def test_read_rows(self, registered, fixture_dir):
        rows = (
            registered.read.format("common_crawl")
            .option("url", "*.example.com/*")
            .option("crawl_id", CC_CRAWL)
            .option("fixture_dir", fixture_dir)
            .load()
            .collect()
        )
        assert len(rows) == 2
        r = {row["url"]: row for row in rows}
        a = r["https://www.example.com/"]
        assert a["statuscode"] == 200
        assert a["crawl_id"] == CC_CRAWL
        assert a["timestamp"].year == 2025
        assert r["https://www.example.com/about"]["statuscode"] == 404

    def test_content_fetch(self, registered, fixture_dir):
        rows = (
            registered.read.format("common_crawl")
            .option("url", "*.example.com/*")
            .option("crawl_id", CC_CRAWL)
            .option("fixture_dir", fixture_dir)
            .option("fetch_response", "true")
            .load()
            .collect()
        )
        r = {row["url"]: row for row in rows}
        good = r["https://www.example.com/"]
        assert good["warc"]["version"] == "1.0"
        assert good["warc"]["headers"]["WARC-Type"] == "response"
        assert bytes(good["response"]["body"]) == b"<html>fixture page</html>"
        assert good["response"]["headers"]["Content-Type"] == "text/html"
        assert good["response"]["http_version"] == "1.1"
        # invalid record (offset/length 0) → empty response struct, no error
        bad = r["https://www.example.com/about"]
        assert bad["response"]["body"] is None or bytes(bad["response"]["body"]) == b""

    def test_dry_run_golden_url(self, registered):
        row = (
            registered.read.format("common_crawl")
            .option("url", "*.example.com/*")
            .option("crawl_id", CC_CRAWL)
            .option("debug", "true")
            .option("dry_run", "true")
            .option("max_results", "50")
            .option("filter", "=status:200;;=mime:text/html")
            .load()
            .select("cdx_url")
            .collect()
        )
        url = row[0]["cdx_url"]
        assert url.startswith(f"https://index.commoncrawl.org/{CC_CRAWL}-index?url=*.example.com/*")
        assert "&limit=50" in url
        assert "&filter==status:200" in url and "&filter==mime:text/html" in url

    def test_missing_url_filter_raises(self, registered):
        with pytest.raises(Exception, match="URL filter"):
            (
                registered.read.format("common_crawl")
                .option("crawl_id", CC_CRAWL)
                .option("dry_run", "true")
                .load()
                .collect()
            )

    def test_many_crawl_fanout_ceiling_limit_division(self, registered):
        # Boundary pin for the reference's limit-division semantics
        # (src/common_crawl_index.cpp:1510-1513): a pushed LIMIT is divided
        # across crawls with CEILING division, one partition per crawl.
        # 25 crawls is well past any fixture default — guards against a
        # future refactor quietly capping the fan-out or flooring the
        # division (limit < n_crawls must still fetch 1 per crawl, not 0).
        crawls = [f"CC-MAIN-2024-{n:02d}" for n in range(1, 26)]

        def dry_rows(limit: int):
            return (
                registered.read.format("common_crawl")
                .option("url", "*.example.com/*")
                .option("crawl_id", ",".join(crawls))
                .option("debug", "true")
                .option("dry_run", "true")
                .option("max_results", str(limit))
                .load()
                .select("cdx_url")
                .collect()
            )

        # limit > n_crawls: ceil(100/25) = 4 per crawl
        rows = dry_rows(100)
        assert len(rows) == 25  # one partition per crawl, all fan out
        assert all("&limit=4" in r["cdx_url"] for r in rows)
        urls = sorted(r["cdx_url"] for r in rows)
        assert len(set(urls)) == 25
        for cid, u in zip(sorted(crawls), urls):
            assert u.startswith(f"https://index.commoncrawl.org/{cid}-index?")

        # limit < n_crawls: ceiling keeps 1 per crawl (floor would give 0
        # and under-fetch); union cap 25 >= limit 10, trimmed by the
        # consumer's LIMIT exactly as in the reference.
        rows = dry_rows(10)
        assert len(rows) == 25
        assert all("&limit=1" in r["cdx_url"] for r in rows)

        # non-divisible: ceil(30/25) = 2
        rows = dry_rows(30)
        assert all("&limit=2" in r["cdx_url"] for r in rows)


class TestWaybackSource:
    def test_read_rows_with_year_month(self, registered, fixture_dir):
        rows = (
            registered.read.format("wayback_machine")
            .option("url", "example.com/*")
            .option("fixture_dir", fixture_dir)
            .load()
            .collect()
        )
        assert len(rows) == 3
        by_key = {r["urlkey"]: r for r in rows}
        assert by_key["com,example)/"]["year"] == 2024
        assert by_key["com,example)/"]["month"] == 6
        assert by_key["com,example)/a"]["year"] == 1999
        assert by_key["com,example)/b"]["statuscode"] == 0  # '-' → 0
        assert by_key["com,example)/b"]["length"] == 0
        assert by_key["com,example)/"]["url"] == "http://example.com/"

    def test_dry_run_golden_url(self, registered):
        row = (
            registered.read.format("wayback_machine")
            .option("url", "example.com/*")
            .option("debug", "true")
            .option("dry_run", "true")
            .option("max_results", "10")
            .option("collapse", "urlkey;;timestamp:8")
            .option("fast_latest", "true")
            .option("from", "2024")
            .option("to", "2025")
            .load()
            .select("cdx_url")
            .collect()
        )
        url = row[0]["cdx_url"]
        assert url.startswith("https://web.archive.org/cdx/search/cdx?url=example.com/*")
        assert "&fastLatest=true&limit=-10" in url
        assert "&collapse=urlkey" in url and "&collapse=timestamp:8" in url
        assert "&from=2024" in url and "&to=2025" in url

    def test_fast_latest_results_descending(self, registered, tmp_path):
        # Batch twin of the reference's fast_latest ordering check
        # (test/sql/internet_archive_fast_latest.test:78-90): with
        # fastLatest=true the server returns newest-first; ORDER BY
        # timestamp DESC over the typed rows must have zero ascending
        # adjacent pairs (LEAD window probe), and the newest row first.
        import json as _json

        from duckdb_cloudflare_spark.sources.cdx import (
            WAYBACK_ORDERED_FIELDS,
            build_wayback_cdx_url,
        )

        csv = (
            "com,example)/ 20250501000000 http://example.com/ text/html 200 D5 500\n"
            "com,example)/ 20240301000000 http://example.com/ text/html 200 D4 400\n"
            "com,example)/ 20230201000000 http://example.com/ text/html 200 D3 300\n"
            "com,example)/ 20220101000000 http://example.com/ text/html 200 D2 200\n"
            "com,example)/ 19991231000000 http://example.com/ text/html 200 D1 100\n"
        )
        wb_url = build_wayback_cdx_url(
            "example.com",
            fields_needed=list(WAYBACK_ORDERED_FIELDS),
            max_results=5,
            fast_latest=True,
        )
        (tmp_path / "fl.csv").write_text(csv)
        (tmp_path / "manifest.json").write_text(_json.dumps({wb_url: "fl.csv"}))

        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        df = (
            registered.read.format("wayback_machine")
            .option("url", "example.com")
            .option("fast_latest", "true")
            .option("max_results", "5")
            .option("fixture_dir", str(tmp_path))
            .load()
            .orderBy(F.col("timestamp").desc())
        )
        rows = df.collect()
        assert len(rows) == 5
        assert rows[0]["digest"] == "D5"  # newest first
        probe = (
            df.select(
                "timestamp",
                F.lead("timestamp").over(
                    Window.orderBy(F.col("timestamp").desc())
                ).alias("next_ts"),
            )
            .filter(F.col("next_ts") > F.col("timestamp"))
            .count()
        )
        assert probe == 0

    def test_offset_pages_partitioning(self, registered, fixture_dir):
        from duckdb_cloudflare_spark.sources.wayback import WaybackReader

        reader = WaybackReader.__new__(WaybackReader)
        reader.__init__(
            schema=None.__class__ and __import__("pyspark.sql.types", fromlist=["StructType"]).StructType([]),
            options={"url": "example.com", "max_results": "25", "page_size": "10"},
        )
        parts = reader.partitions()
        assert [(p.offset, p.limit) for p in parts] == [(0, 10), (10, 10), (20, 5)]


@pytest.fixture(scope="module")
def d1_db(tmp_path_factory):
    d = tmp_path_factory.mktemp("d1")
    path = str(d / "fixture.sqlite")
    con = sqlite3.connect(path)
    con.executescript(
        """
        CREATE TABLE users (id INTEGER PRIMARY KEY, name TEXT, email TEXT, active BOOLEAN,
                            score REAL, created_at TIMESTAMP, avatar BLOB, notes CLOB);
        CREATE TABLE orders (id INTEGER PRIMARY KEY, user_id INTEGER, status TEXT,
                             amount DOUBLE, order_date DATE);
        CREATE TABLE _internal_meta (k TEXT);
        INSERT INTO users VALUES (1, 'alice', 'a@x.com', 1, 91.5, '2024-01-01 10:00:00', x'00ff', 'note-a');
        INSERT INTO users VALUES (2, 'bob', NULL, 0, 12.25, NULL, NULL, NULL);
        INSERT INTO users VALUES (3, 'carol', 'c@x.com', 1, 55.0, '2024-06-15 08:30:00', NULL, '');
        INSERT INTO orders VALUES (10, 1, 'shipped', 99.9, '2024-02-01');
        INSERT INTO orders VALUES (11, 2, 'pending', 5.0, '2024-03-01');
        """
    )
    con.commit()
    con.close()
    return path


def _d1_opts(d1_db):
    return {
        "account_id": "acct",
        "api_token": "tok",
        "database_id": "00000000-0000-0000-0000-000000000001",
        "d1_sqlite_stub": d1_db,
    }


class TestD1Source:
    def test_schema_affinity(self, registered, d1_db):
        df = registered.read.format("d1").options(table="users", **_d1_opts(d1_db)).load()
        assert dict((f.name, f.dataType.simpleString()) for f in df.schema.fields) == {
            "id": "bigint",
            "name": "string",
            "email": "string",
            "active": "boolean",
            "score": "double",
            # SQLite TIME affinity → naive timestamp (reference TIMESTAMP is tz-less)
            "created_at": "timestamp_ntz",
            "avatar": "binary",
            "notes": "string",
        }

    def test_values_and_nulls(self, registered, d1_db):
        rows = {
            r["id"]: r
            for r in registered.read.format("d1")
            .options(table="users", **_d1_opts(d1_db))
            .load()
            .collect()
        }
        assert rows[1]["active"] is True and rows[2]["active"] is False
        assert rows[1]["created_at"].year == 2024
        assert rows[2]["email"] is None and rows[2]["created_at"] is None
        assert rows[3]["notes"] is None  # empty string → NULL round-trip
        assert bytes(rows[1]["avatar"]) == b"\x00\xff"

    def test_filter_pushdown_executes_remotely(self, registered, d1_db):
        df = (
            registered.read.format("d1")
            .options(table="users", **_d1_opts(d1_db))
            .load()
            .filter("active = true AND score > 50")
        )
        ids = sorted(r["id"] for r in df.collect())
        assert ids == [1, 3]

    def test_limit_option(self, registered, d1_db):
        df = (
            registered.read.format("d1")
            .options(table="orders", limit="1", **_d1_opts(d1_db))
            .load()
        )
        assert df.count() == 1

    def test_d1_query_helper_all_varchar(self, registered, d1_db):
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config, d1_query
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        client = D1Client(
            D1Config("acct", "tok", "db"), transport=D1SqliteStubTransport(d1_db)
        )
        df = d1_query(registered, "SELECT id, name, active FROM users ORDER BY id", client=client)
        assert [f.dataType.simpleString() for f in df.schema.fields] == ["string"] * 3
        rows = df.collect()
        assert rows[0]["id"] == "1" and rows[0]["active"] == "1"

    def test_d1_tables_hides_internals(self, registered, d1_db):
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config, d1_tables
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        client = D1Client(
            D1Config("acct", "tok", "db"), transport=D1SqliteStubTransport(d1_db)
        )
        names = {r["name"] for r in d1_tables(registered, client=client).collect()}
        assert "users" in names and "orders" in names
        assert "_internal_meta" not in names and "sqlite_schema" not in names

    def test_d1_attach_creates_views(self, registered, d1_db):
        from duckdb_cloudflare_spark.catalog.d1_attach import d1_attach

        views = d1_attach(
            registered, "fixture-db", alias="mydb", **_d1_opts(d1_db)
        )
        assert set(views) >= {"mydb_users", "mydb_orders"}
        assert registered.sql("SELECT count(*) AS n FROM mydb_users").collect()[0]["n"] == 3

    def test_d1_batch_single_post(self, registered, d1_db):
        from duckdb_cloudflare_spark.catalog.d1_batch import D1Batch
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        client = D1Client(
            D1Config("acct", "tok", "db"), transport=D1SqliteStubTransport(d1_db)
        )
        with D1Batch(client) as tx:
            tx.execute("INSERT INTO orders VALUES (12, 3, 'new', 1.0, '2024-04-01')")
            tx.execute("INSERT INTO orders VALUES (13, 3, 'new', 2.0, '2024-04-02')")
            # reads are immediate → no read-your-writes
            n_before = len(tx.query("SELECT id FROM orders WHERE id >= 12"))
            assert n_before == 0
        assert len(client.query("SELECT id FROM orders WHERE id >= 12")) == 2

    def test_d1_batch_rollback_discards(self, d1_db):
        from duckdb_cloudflare_spark.catalog.d1_batch import D1Batch
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        client = D1Client(
            D1Config("acct", "tok", "db"), transport=D1SqliteStubTransport(d1_db)
        )
        try:
            with D1Batch(client) as tx:
                tx.execute("INSERT INTO orders VALUES (99, 9, 'x', 0, '2024-01-01')")
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert len(client.query("SELECT id FROM orders WHERE id = 99")) == 0


class TestSecrets:
    @pytest.fixture(autouse=True)
    def _isolated_spill(self, monkeypatch, tmp_path):
        # Each registry instance shares the cross-process spill file; point
        # it at a per-test path so unit tests don't see each other's writes.
        monkeypatch.setenv("SPARK_GRAFT_SECRET_FILE", str(tmp_path / "sec.json"))

    def test_create_and_redact(self):
        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        reg = SecretRegistry()
        s = reg.create_secret("d1", "d1", account_id="a", api_token="supersecret")
        assert "supersecret" not in repr(s) and "****" in repr(s)

    def test_default_name_fallback(self):
        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        reg = SecretRegistry()
        reg.create_secret("cloudflare", "d1", account_id="a", api_token="t")
        assert reg.get_secret("", type="d1").name == "cloudflare"

    def test_env_fallback(self, monkeypatch):
        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        monkeypatch.setenv("CLOUDFLARE_ACCOUNT_ID", "env-acct")
        monkeypatch.setenv("CLOUDFLARE_API_TOKEN", "env-tok")
        reg = SecretRegistry()
        s = reg.get_secret("", type="d1")
        assert s.get("account_id") == "env-acct"

    def test_missing_raises(self):
        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        import pytest as _pytest

        with _pytest.raises(KeyError):
            SecretRegistry().get_secret("nope")

    def test_spill_file_cross_registry_resolution(self, tmp_path):
        # The worker-process path: a FRESH registry (as in a DataSource
        # worker) resolves a name created by another instance via the spill
        # file; DROP revokes it there too.
        import os as _os

        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        driver = SecretRegistry()
        driver.create_secret("xproc", "d1", account_id="a", api_token="t")
        spill = tmp_path / "sec.json"
        assert spill.exists()
        assert _os.stat(spill).st_mode & 0o777 == 0o600
        worker = SecretRegistry()
        assert worker.get_secret("xproc").get("account_id") == "a"
        driver.drop_secret("xproc")
        import pytest as _pytest

        with _pytest.raises(KeyError):
            SecretRegistry().get_secret("xproc")

    def test_planted_loose_permission_file_ignored(self, tmp_path):
        # An attacker-pre-created (group/other-readable) file at the spill
        # path must never be parsed: no credential injection into scans.
        import os as _os

        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        spill = tmp_path / "sec.json"
        spill.write_text('{"evil": {"type": "d1", "values": {"api_token": "x"}}}')
        _os.chmod(spill, 0o666)
        with pytest.warns(UserWarning, match="group/other-readable"):
            with pytest.raises(KeyError):
                SecretRegistry().get_secret("evil")

    def test_planted_symlink_ignored(self, tmp_path):
        # A symlink at the spill path must not be followed on load, and a
        # write must replace the LINK (never its target).
        import os as _os

        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        target = tmp_path / "target.json"
        target.write_text('{"evil": {"type": "d1", "values": {"api_token": "x"}}}')
        _os.chmod(target, 0o600)
        spill = tmp_path / "sec.json"
        spill.symlink_to(target)
        with pytest.raises(KeyError):
            SecretRegistry().get_secret("evil")
        SecretRegistry().create_secret("mine", "d1", account_id="a", api_token="t")
        assert not spill.is_symlink()  # os.replace swapped the link out
        assert "evil" in target.read_text()  # target untouched

    def test_env_beats_stale_spill_for_default_name(self, tmp_path, monkeypatch):
        # A __default_d1 left on disk by an EARLIER session must not override
        # live CLOUDFLARE_* env credentials in a new session (ADVICE r6).
        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        stale = SecretRegistry()
        stale.create_secret("__default_d1", "d1", account_id="old", api_token="old")
        monkeypatch.setenv("CLOUDFLARE_ACCOUNT_ID", "env-acct")
        monkeypatch.setenv("CLOUDFLARE_API_TOKEN", "env-tok")
        fresh = SecretRegistry()  # new session: empty in-memory registry
        assert fresh.get_secret("", type="d1").get("account_id") == "env-acct"
        # explicit NAME lookups still resolve via the file (worker path)
        assert fresh.get_secret("__default_d1").get("account_id") == "old"

    def test_concurrent_drivers_merge_not_clobber(self):
        # Two registry instances sharing one spill path: the second driver's
        # create must not erase the first driver's secret (read-merge-write).
        from duckdb_cloudflare_spark.catalog.secrets import SecretRegistry

        a, b = SecretRegistry(), SecretRegistry()
        a.create_secret("from_a", "d1", account_id="a", api_token="t")
        b.create_secret("from_b", "d1", account_id="b", api_token="t")
        fresh = SecretRegistry()
        assert fresh.get_secret("from_a").get("account_id") == "a"
        assert fresh.get_secret("from_b").get("account_id") == "b"
        b.drop_secret("from_b")
        assert fresh.get_secret("from_a").get("account_id") == "a"
        with pytest.raises(KeyError):
            SecretRegistry().get_secret("from_b")

    def test_atexit_cleanup_removes_only_this_sessions_names(self, tmp_path):
        # Session secrets are scrubbed from the shared file at interpreter
        # exit; names owned by OTHER processes survive.
        import json as _json

        from duckdb_cloudflare_spark.catalog import secrets as S

        other = tmp_path / "sec.json"
        reg = S.SecretRegistry()
        reg.create_secret("mine", "d1", account_id="a", api_token="t")
        # simulate another process's entry landing in the same file
        data = _json.loads(other.read_text())
        data["theirs"] = {"type": "d1", "values": {"account_id": "o", "api_token": "t"}}
        S._atomic_write(str(other), data)
        S._cleanup_owned()
        left = _json.loads(other.read_text())
        assert "mine" not in left and "theirs" in left
        S._OWNED.pop((str(other), "mine"), None)  # don't leak into real atexit

    def test_atexit_cleanup_spares_recreated_name(self, tmp_path):
        # Another process re-created the SAME name with new credentials
        # after ours registered it: exit cleanup must leave the CURRENT
        # entry alone (delete-by-name would revoke a live secret).
        import json as _json

        from duckdb_cloudflare_spark.catalog import secrets as S

        spill = tmp_path / "sec.json"
        reg = S.SecretRegistry()
        reg.create_secret("prod", "d1", account_id="old", api_token="t")
        # "another process" re-creates the name (write the file directly —
        # _OWNED is process-global, so a second in-process registry would
        # update our ownership record and defeat the simulation)
        S._atomic_write(
            str(spill),
            {"prod": {"type": "d1", "values": {"account_id": "NEW", "api_token": "t2"}}},
        )
        S._cleanup_owned()
        left = _json.loads(spill.read_text())
        assert left["prod"]["values"]["account_id"] == "NEW"
        S._OWNED.pop((str(spill), "prod"), None)

    def test_default_spill_path_is_under_private_cache_dir(self, monkeypatch):
        import os as _os

        from duckdb_cloudflare_spark.catalog import secrets as S

        monkeypatch.delenv("SPARK_GRAFT_SECRET_FILE", raising=False)
        monkeypatch.setenv("XDG_CACHE_HOME", "/does/not/matter")
        p = S._spill_path()
        assert p == "/does/not/matter/spark_graft/secrets.json"
        assert _os.path.dirname(p).endswith("spark_graft")


class TestR2:
    def test_query_raw_parity(self, registered, tmp_path):
        from duckdb_cloudflare_spark.sources.r2 import r2_sql_query
        from duckdb_cloudflare_spark.util.http import FixtureTransport

        payload = {"results": [{"a": 1}], "metadata": {"rows": 1}}
        (tmp_path / "r2.json").write_text(json.dumps(payload))
        url = "https://api.sql.cloudflarestorage.com/api/v1/accounts/acct/r2-sql/query/bkt"
        (tmp_path / "manifest.json").write_text(json.dumps({f"POST {url}": "r2.json"}))
        df = r2_sql_query(
            registered, "", "bkt", "SELECT 1",
            account_id="acct", api_token="t", transport=FixtureTransport(str(tmp_path)),
        )
        assert df.columns == ["response"]
        assert json.loads(df.collect()[0]["response"])["results"] == [{"a": 1}]

    def test_invalid_response_raises(self, tmp_path):
        from duckdb_cloudflare_spark.sources.r2 import R2SQLConfig, R2SqlClient, R2SqlError
        from duckdb_cloudflare_spark.util.http import FixtureTransport

        url = "https://api.sql.cloudflarestorage.com/api/v1/accounts/acct/r2-sql/query/bkt"
        (tmp_path / "bad.json").write_text("{}")
        (tmp_path / "manifest.json").write_text(json.dumps({f"POST {url}": "bad.json"}))
        client = R2SqlClient(
            R2SQLConfig("acct", "t", "bkt"), transport=FixtureTransport(str(tmp_path))
        )
        with pytest.raises(R2SqlError):
            client.query_raw("SELECT 1")


class TestPushdownTranslation:
    """Unit-level pushFilters checks (the WHERE/param translation layer)."""

    def test_cc_filters(self):
        from pyspark.sql.datasource import EqualTo, In, Not
        from duckdb_cloudflare_spark.sources.pushdown import CdxQuerySpec, translate_cc_filter

        spec = CdxQuerySpec()
        translate_cc_filter(EqualTo(("url",), "example.com/x"), spec)
        translate_cc_filter(EqualTo(("statuscode",), 200), spec)
        translate_cc_filter(Not(EqualTo(("mimetype",), "application/pdf")), spec)
        translate_cc_filter(In(("crawl_id",), ("C1", "C2")), spec)
        assert spec.url_pattern == "example.com/x"
        assert "=status:200" in spec.cdx_filters
        assert "!mime:application/pdf" in spec.cdx_filters
        assert spec.crawl_ids == ["C1", "C2"]

    def test_cc_timestamp_range(self):
        from datetime import datetime
        from pyspark.sql.datasource import GreaterThan, LessThan
        from duckdb_cloudflare_spark.sources.pushdown import CdxQuerySpec, translate_cc_filter

        spec = CdxQuerySpec()
        translate_cc_filter(GreaterThan(("timestamp",), datetime(2024, 1, 1)), spec)
        translate_cc_filter(LessThan(("timestamp",), datetime(2025, 6, 1)), spec)
        assert spec.from_ts == "20240101" and spec.to_ts == "20250601"

    def test_wayback_filters(self):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            In,
            Not,
            StringEndsWith,
            StringStartsWith,
        )
        from duckdb_cloudflare_spark.sources.pushdown import (
            CdxQuerySpec,
            translate_wayback_filter,
        )

        spec = CdxQuerySpec()
        translate_wayback_filter(StringEndsWith(("url",), ".example.com"), spec)
        translate_wayback_filter(In(("statuscode",), (200, 301, 302)), spec)
        translate_wayback_filter(Not(EqualTo(("mimetype",), "application/pdf")), spec)
        translate_wayback_filter(GreaterThan(("year",), 2020), spec)
        translate_wayback_filter(StringStartsWith(("urlkey",), "com,example)/"), spec)
        assert spec.url_pattern == "*.example.com"
        assert "statuscode:(200|301|302)" in spec.cdx_filters
        assert "!mimetype:application/pdf" in spec.cdx_filters
        assert spec.from_ts == "2021"  # year > 2020 → from=2021
        assert "urlkey:^com,example)/.*" in spec.cdx_filters

    def test_wayback_regex_values_escaped(self):
        # Literal values embedded in filter= regexes must have metachars
        # escaped with %5C (EscapeRegex, internet_archive.cpp:723-740) —
        # otherwise 'application/vnd.ms-excel' matches a superset while the
        # predicate is absorbed out of the Spark plan.
        from pyspark.sql.datasource import EqualTo, In, Not, StringContains
        from duckdb_cloudflare_spark.sources.pushdown import (
            CdxQuerySpec,
            translate_wayback_filter,
        )

        spec = CdxQuerySpec()
        assert (
            translate_wayback_filter(
                EqualTo(("mimetype",), "application/vnd.ms-excel"), spec
            )
            == "absorbed"
        )
        assert "mimetype:application/vnd%5C.ms-excel" in spec.cdx_filters

        spec = CdxQuerySpec()
        translate_wayback_filter(
            In(("mimetype",), ("text/html", "application/vnd.ms-excel")), spec
        )
        assert "mimetype:(text/html|application/vnd%5C.ms-excel)" in spec.cdx_filters

        spec = CdxQuerySpec()
        translate_wayback_filter(Not(EqualTo(("mimetype",), "a+b.c")), spec)
        assert "!mimetype:a%5C+b%5C.c" in spec.cdx_filters

        spec = CdxQuerySpec()
        translate_wayback_filter(EqualTo(("urlkey",), "com,ex)/p?q=1"), spec)
        assert "urlkey:^com,ex)/p%5C?q=1$" in spec.cdx_filters

        # prefix/suffix/contains shapes too (the reference misses prefix —
        # we escape it anyway because the translation is absorbed)
        spec = CdxQuerySpec()
        translate_wayback_filter(StringContains(("urlkey",), "x.y"), spec)
        assert "urlkey:.*x%5C.y.*" in spec.cdx_filters

    def test_cc_not_url_pushdown(self):
        # url NOT LIKE shapes → negated anchored regex !~url:^...$
        # (src/common_crawl_index.cpp:1210-1250), absorbed from the plan.
        from pyspark.sql.datasource import (
            Not,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )
        from duckdb_cloudflare_spark.sources.pushdown import (
            CdxQuerySpec,
            translate_cc_filter,
        )

        spec = CdxQuerySpec()
        assert (
            translate_cc_filter(Not(StringStartsWith(("url",), "http://ads.")), spec)
            == "absorbed"
        )
        assert "!~url:^http://ads%5C..*$" in spec.cdx_filters

        spec = CdxQuerySpec()
        assert (
            translate_cc_filter(Not(StringEndsWith(("url",), ".jpg")), spec)
            == "absorbed"
        )
        assert "!~url:^.*%5C.jpg$" in spec.cdx_filters

        spec = CdxQuerySpec()
        assert (
            translate_cc_filter(Not(StringContains(("url",), "tracker")), spec)
            == "absorbed"
        )
        assert "!~url:^.*tracker.*$" in spec.cdx_filters

    def test_wayback_not_url_pushdown(self):
        # url NOT LIKE shapes → filter=!original:regex
        # (src/internet_archive.cpp:1009-1158; golden shape
        # internet_archive_pushdown.test:159-190 — NOT LIKE '%test%' →
        # filter=!original:.*test.*), absorbed from the plan.
        from pyspark.sql.datasource import (
            Not,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )
        from duckdb_cloudflare_spark.sources.pushdown import (
            CdxQuerySpec,
            translate_wayback_filter,
        )

        spec = CdxQuerySpec()
        assert (
            translate_wayback_filter(Not(StringContains(("url",), "test")), spec)
            == "absorbed"
        )
        assert "!original:.*test.*" in spec.cdx_filters

        spec = CdxQuerySpec()
        assert (
            translate_wayback_filter(
                Not(StringStartsWith(("url",), "example.com/ads")), spec
            )
            == "absorbed"
        )
        assert "!original:^example%5C.com/ads.*" in spec.cdx_filters

        spec = CdxQuerySpec()
        assert (
            translate_wayback_filter(Not(StringEndsWith(("url",), ".jpg")), spec)
            == "absorbed"
        )
        assert "!original:.*%5C.jpg$" in spec.cdx_filters

    def test_cc_regex_in_values_escaped(self):
        from pyspark.sql.datasource import In
        from duckdb_cloudflare_spark.sources.pushdown import (
            CdxQuerySpec,
            translate_cc_filter,
        )

        spec = CdxQuerySpec()
        translate_cc_filter(In(("mimetype",), ("text/html", "image/svg+xml")), spec)
        assert "~mime:(text/html|image/svg%5C+xml)" in spec.cdx_filters


class TestR2IcebergConf:
    def test_conf_shape(self):
        from duckdb_cloudflare_spark.sources.r2 import r2_iceberg_conf

        conf = r2_iceberg_conf(
            account_id="acct", api_token="tok", bucket_name="bkt", catalog_name="r2"
        )
        assert conf["spark.sql.catalog.r2"] == "org.apache.iceberg.spark.SparkCatalog"
        assert conf["spark.sql.catalog.r2.type"] == "rest"
        assert conf["spark.sql.catalog.r2.uri"] == (
            "https://catalog.cloudflarestorage.com/acct/bkt"
        )
        assert conf["spark.sql.catalog.r2.token"] == "tok"
        assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]

    def test_secret_fallback(self):
        from duckdb_cloudflare_spark.catalog.secrets import create_secret, global_registry
        from duckdb_cloudflare_spark.sources.r2 import r2_iceberg_conf

        create_secret("r2t", type="r2_sql", account_id="a2", api_token="t2", bucket_name="b2")
        try:
            conf = r2_iceberg_conf("r2t")
            assert conf["spark.sql.catalog.r2.uri"].endswith("/a2/b2")
        finally:
            global_registry().drop_secret("r2t")

    def test_rest_handshake_end_to_end_against_catalog_stub(self, tmp_path):
        """VERDICT r9 item 5: exercise the emitted conf against a local
        REST catalog serving the config/namespace/table handshake — the
        exact GET sequence + bearer auth Iceberg's RESTCatalog performs —
        with no runtime jar. A recording wrapper pins that the conf's
        token is what reaches the wire, and the server-provided `prefix`
        override reroutes the later paths (the R2 Data Catalog uses one)."""
        import json

        from duckdb_cloudflare_spark.sources.r2 import (
            iceberg_rest_handshake,
            r2_iceberg_conf,
        )
        from duckdb_cloudflare_spark.util.http import FixtureTransport

        conf = r2_iceberg_conf(
            account_id="acct", api_token="tok", bucket_name="bkt", catalog_name="r2"
        )
        base = "https://catalog.cloudflarestorage.com/acct/bkt"
        wh = base.replace(":", "%3A").replace("/", "%2F")
        fixtures = {
            f"{base}/v1/config?warehouse={wh}": {
                "defaults": {},
                "overrides": {"prefix": "acct_bkt"},
            },
            f"{base}/v1/acct_bkt/namespaces": {"namespaces": [["default"]]},
            f"{base}/v1/acct_bkt/namespaces/default/tables": {
                "identifiers": [{"namespace": ["default"], "name": "events"}]
            },
            f"{base}/v1/acct_bkt/namespaces/default/tables/events": {
                "metadata-location": "r2://bkt/events/metadata/v3.metadata.json",
                "metadata": {"format-version": 2},
            },
        }
        manifest = {}
        for i, (url, payload) in enumerate(fixtures.items()):
            name = f"f{i}.json"
            (tmp_path / name).write_text(json.dumps(payload))
            manifest[url] = name
        (tmp_path / "manifest.json").write_text(json.dumps(manifest))

        class Recording(FixtureTransport):
            calls: list = []

            def get(self, url, headers=None):
                Recording.calls.append((url, dict(headers or {})))
                return super().get(url, headers)

        got = iceberg_rest_handshake(
            conf, catalog_name="r2", transport=Recording(str(tmp_path))
        )
        assert got["namespaces"] == [["default"]]
        assert got["tables"] == ["events"]
        assert got["metadata_location"] == (
            "r2://bkt/events/metadata/v3.metadata.json"
        )
        assert len(Recording.calls) == 4
        # every wire request carried the conf's token as Bearer auth
        assert all(
            h.get("Authorization") == "Bearer tok" for _, h in Recording.calls
        )
        # the server prefix override rerouted everything after /v1/config
        assert all("/v1/acct_bkt/" in u for u, _ in Recording.calls[1:])

    def test_rest_handshake_defaults_prefix_and_quoted_table(self, tmp_path):
        """r10 review: a spec-conformant catalog may return `prefix` in
        the DEFAULTS block (merged, overrides win), and a table name with
        reserved characters must be percent-encoded into the loadTable
        path — '#' would otherwise truncate the URL as a fragment."""
        import json

        from duckdb_cloudflare_spark.sources.r2 import (
            iceberg_rest_handshake,
            r2_iceberg_conf,
        )
        from duckdb_cloudflare_spark.util.http import FixtureTransport

        conf = r2_iceberg_conf(
            account_id="acct", api_token="tok", bucket_name="bkt", catalog_name="r2"
        )
        base = "https://catalog.cloudflarestorage.com/acct/bkt"
        wh = base.replace(":", "%3A").replace("/", "%2F")
        fixtures = {
            f"{base}/v1/config?warehouse={wh}": {
                "defaults": {"prefix": "dflt"},
                "overrides": {},
            },
            f"{base}/v1/dflt/namespaces": {"namespaces": [["ns"]]},
            f"{base}/v1/dflt/namespaces/ns/tables": {
                "identifiers": [{"namespace": ["ns"], "name": "odd name#1"}]
            },
            f"{base}/v1/dflt/namespaces/ns/tables/odd%20name%231": {
                "metadata-location": "r2://bkt/odd/metadata/v1.metadata.json"
            },
        }
        manifest = {}
        for i, (url, payload) in enumerate(fixtures.items()):
            name = f"g{i}.json"
            (tmp_path / name).write_text(json.dumps(payload))
            manifest[url] = name
        (tmp_path / "manifest.json").write_text(json.dumps(manifest))
        got = iceberg_rest_handshake(
            conf, catalog_name="r2", transport=FixtureTransport(str(tmp_path))
        )
        assert got["tables"] == ["odd name#1"]
        assert got["metadata_location"] == (
            "r2://bkt/odd/metadata/v1.metadata.json"
        )


class TestD1InsertDf:
    def test_roundtrip_via_stub(self, registered, tmp_path):
        import sqlite3

        from duckdb_cloudflare_spark.catalog.d1_batch import d1_insert_df
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        db = str(tmp_path / "w.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE sink (id INTEGER, name TEXT, score REAL, ok BOOLEAN)")
        con.commit()
        con.close()

        df = registered.createDataFrame(
            [(i, f"it's {i}", i * 1.5, i % 2 == 0) for i in range(137)],
            "id long, name string, score double, ok boolean",
        )
        client = D1Client(
            D1Config(account_id="acct", api_token="t", database_id="db"),
            transport=D1SqliteStubTransport(db),
        )
        n = d1_insert_df(df, "sink", client, statements_per_batch=2, rows_per_statement=10)
        assert n == 137

        con = sqlite3.connect(db)
        assert con.execute("SELECT count(*) FROM sink").fetchone()[0] == 137
        # quote escaping survived
        assert con.execute("SELECT name FROM sink WHERE id = 7").fetchone()[0] == "it's 7"
        assert con.execute("SELECT ok FROM sink WHERE id = 4").fetchone()[0] == 1
        con.close()

    def test_distributed_roundtrip_multi_partition(self, registered, tmp_path):
        import sqlite3

        from duckdb_cloudflare_spark.catalog.d1_batch import d1_insert_df_distributed
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        db = str(tmp_path / "wd.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE sink (id INTEGER, name TEXT, score REAL)")
        con.commit()
        con.close()

        df = registered.createDataFrame(
            [(i, f"row {i}", i * 0.5) for i in range(211)],
            "id long, name string, score double",
        ).repartition(4)
        client = D1Client(
            D1Config(account_id="acct", api_token="t", database_id="db"),
            transport=D1SqliteStubTransport(db),
        )
        n = d1_insert_df_distributed(
            df, "sink", client, statements_per_batch=3, rows_per_statement=10
        )
        assert n == 211

        con = sqlite3.connect(db)
        assert con.execute("SELECT count(*) FROM sink").fetchone()[0] == 211
        assert con.execute("SELECT count(DISTINCT id) FROM sink").fetchone()[0] == 211
        con.close()

    def test_insert_or_replace_is_replay_idempotent(self, registered, tmp_path):
        # the documented mitigation for foreachPartition retry duplication:
        # a unique key + INSERT OR REPLACE makes a replayed partition
        # overwrite instead of duplicate.
        import sqlite3

        from duckdb_cloudflare_spark.catalog.d1_batch import d1_insert_df
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        db = str(tmp_path / "idem.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE sink (id INTEGER PRIMARY KEY, name TEXT)")
        con.commit()
        con.close()

        df = registered.createDataFrame(
            [(i, f"row {i}") for i in range(20)], "id long, name string"
        )
        client = D1Client(
            D1Config(account_id="acct", api_token="t", database_id="db"),
            transport=D1SqliteStubTransport(db),
        )
        for _ in range(2):  # simulate a task replay
            d1_insert_df(df, "sink", client, insert_verb="INSERT OR REPLACE")

        con = sqlite3.connect(db)
        assert con.execute("SELECT count(*) FROM sink").fetchone()[0] == 20
        con.close()

    def test_distributed_roundtrip_32_partitions(self, registered, tmp_path):
        # VERDICT r7 item 6: exercise the distributed write path at real
        # partition scale (every partition opens its own stub transport and
        # POSTs its own batches) — 32 partitions, no lost/duplicated rows.
        import sqlite3

        from duckdb_cloudflare_spark.catalog.d1_batch import d1_insert_df_distributed
        from duckdb_cloudflare_spark.sources.d1 import D1Client, D1Config
        from duckdb_cloudflare_spark.util.d1_stub import D1SqliteStubTransport

        db = str(tmp_path / "w32.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE sink (id INTEGER PRIMARY KEY, name TEXT)")
        # WAL + busy timeout: 32 concurrent writers against one SQLite file
        con.execute("PRAGMA journal_mode=WAL")
        con.commit()
        con.close()

        df = registered.createDataFrame(
            [(i, f"row {i}") for i in range(1000)], "id long, name string"
        ).repartition(32)
        assert df.rdd.getNumPartitions() == 32
        client = D1Client(
            D1Config(account_id="acct", api_token="t", database_id="db"),
            transport=D1SqliteStubTransport(db),
        )
        n = d1_insert_df_distributed(
            df, "sink", client, statements_per_batch=2, rows_per_statement=7
        )
        assert n == 1000
        con = sqlite3.connect(db)
        assert con.execute("SELECT count(*) FROM sink").fetchone()[0] == 1000
        assert con.execute("SELECT count(DISTINCT id) FROM sink").fetchone()[0] == 1000
        assert con.execute("SELECT min(id), max(id) FROM sink").fetchone() == (0, 999)
        con.close()

    def test_statement_byte_budget_splits_statements(self, tmp_path):
        # rows small enough individually but collectively over the budget
        # must split into multiple statements, each within the cap
        from duckdb_cloudflare_spark.catalog.d1_batch import _insert_rows

        class RecordingClient:
            def __init__(self):
                self.statements = []

            def batch(self, stmts):
                self.statements.extend(stmts)
                return [0] * len(stmts)

        client = RecordingClient()
        rows = [(i, "x" * 50) for i in range(40)]
        n = _insert_rows(
            rows, ["id", "t"], "sink", client,
            statements_per_batch=100, rows_per_statement=1000,
            max_statement_bytes=400,
        )
        assert n == 40
        assert len(client.statements) > 1
        for stmt in client.statements:
            assert len(stmt.encode("utf-8")) <= 400, stmt
        # nothing lost: every id appears exactly once across statements
        joined = " ".join(client.statements)
        assert all(f"({i}, " in joined for i in range(40))

    def test_oversized_single_row_raises_with_limit(self, tmp_path):
        # a single row whose SQL exceeds Cloudflare's ~100 KB cap must fail
        # FAST on the client side with the limit in the message, not fail
        # the remote batch mid-write (reference D1-ATTACH-SOLUTION.md:20-23)
        import pytest

        from duckdb_cloudflare_spark.catalog.d1_batch import (
            D1_MAX_STATEMENT_BYTES,
            _insert_rows,
        )

        big = "y" * (D1_MAX_STATEMENT_BYTES + 1)
        with pytest.raises(ValueError, match=str(D1_MAX_STATEMENT_BYTES)):
            _insert_rows(
                [(1, big)], ["id", "t"], "sink", None,
                statements_per_batch=50, rows_per_statement=50,
            )

    def test_bad_insert_verb_rejected(self):
        import pytest

        from duckdb_cloudflare_spark.catalog.d1_batch import _insert_rows

        with pytest.raises(ValueError, match="insert_verb"):
            _insert_rows([], ["a"], "t", None, 1, 1, "DELETE")

    def test_sql_literal_nonfinite_floats(self):
        from duckdb_cloudflare_spark.catalog.d1_batch import _sql_literal

        assert _sql_literal(float("nan")) == "NULL"
        assert _sql_literal(float("inf")) == "NULL"
        assert _sql_literal(float("-inf")) == "NULL"
        assert _sql_literal(1.5) == "1.5"


class TestD1ParallelScan:
    def _make_db(self, tmp_path, rows=97):
        import sqlite3

        db = str(tmp_path / "big.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE items (id INTEGER PRIMARY KEY, val TEXT)")
        con.executemany(
            "INSERT INTO items VALUES (?, ?)", [(i, f"v{i}") for i in range(1, rows + 1)]
        )
        con.commit()
        con.close()
        return db

    def test_rowid_range_partitions_same_result(self, registered, tmp_path):
        db = self._make_db(tmp_path)
        opts = {
            "account_id": "acct", "api_token": "tok",
            "database_id": "db", "d1_sqlite_stub": db,
        }
        single = (
            registered.read.format("d1").options(table="items", **opts).load()
        )
        split = (
            registered.read.format("d1")
            .options(table="items", partitions="4", **opts)
            .load()
        )
        assert split.rdd.getNumPartitions() == 4
        assert sorted(r["id"] for r in split.collect()) == sorted(
            r["id"] for r in single.collect()
        )

    def test_partitions_with_pushed_filter(self, registered, tmp_path):
        db = self._make_db(tmp_path)
        opts = {
            "account_id": "acct", "api_token": "tok",
            "database_id": "db", "d1_sqlite_stub": db,
        }
        df = (
            registered.read.format("d1")
            .options(table="items", partitions="3", **opts)
            .load()
            .filter("id > 50")
        )
        assert sorted(r["id"] for r in df.collect()) == list(range(51, 98))

    def test_limit_forces_single_partition(self, registered, tmp_path):
        db = self._make_db(tmp_path)
        opts = {
            "account_id": "acct", "api_token": "tok",
            "database_id": "db", "d1_sqlite_stub": db,
        }
        df = (
            registered.read.format("d1")
            .options(table="items", partitions="4", limit="5", **opts)
            .load()
        )
        assert df.count() == 5

    def test_empty_table_single_partition(self, registered, tmp_path):
        import sqlite3

        db = str(tmp_path / "empty.db")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE items (id INTEGER PRIMARY KEY, val TEXT)")
        con.commit()
        con.close()
        opts = {
            "account_id": "acct", "api_token": "tok",
            "database_id": "db", "d1_sqlite_stub": db,
        }
        df = (
            registered.read.format("d1")
            .options(table="items", partitions="8", **opts)
            .load()
        )
        assert df.count() == 0


def _iceberg_runtime_on_classpath() -> bool:
    import glob
    import os

    import pyspark

    return bool(
        glob.glob(os.path.join(os.path.dirname(pyspark.__file__), "jars", "*iceberg*"))
    )


@pytest.mark.skipif(
    not _iceberg_runtime_on_classpath(),
    reason=(
        "iceberg-spark-runtime jar not on the classpath and the sandbox has no "
        "network to fetch it (spark.jars.packages=org.apache.iceberg:"
        "iceberg-spark-runtime-4.0_2.13:<ver> in a connected env); the "
        "r2_iceberg_conf shape itself is asserted hermetically in "
        "TestR2IcebergConf"
    ),
)
def test_iceberg_catalog_conf_end_to_end(tmp_path):
    # With a runtime jar present, validate the catalog-conf mechanism against
    # a LOCAL hadoop-type warehouse (the R2 REST endpoint itself needs
    # network + credentials; the conf wiring is identical).
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-conf-check")
        .config(
            "spark.sql.extensions",
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
        )
        .config("spark.sql.catalog.localr2", "org.apache.iceberg.spark.SparkCatalog")
        .config("spark.sql.catalog.localr2.type", "hadoop")
        .config("spark.sql.catalog.localr2.warehouse", str(tmp_path / "wh"))
        .getOrCreate()
    )
    try:
        spark.sql("CREATE TABLE localr2.db.t (id BIGINT, v STRING) USING iceberg")
        spark.sql("INSERT INTO localr2.db.t VALUES (1, 'a'), (2, 'b')")
        assert spark.sql("SELECT count(*) AS n FROM localr2.db.t").collect()[0]["n"] == 2
    finally:
        spark.stop()


class TestUnknownOptionContract:
    """The reference rejects unknown named parameters at bind time
    (test/sql/common_crawl_errors.test:7-31); the DataSources mirror that
    instead of silently ignoring typos."""

    def test_cc_unknown_option_raises(self, registered):
        import pytest

        with pytest.raises(Exception, match="unknown option.*invalid_param"):
            (
                registered.read.format("common_crawl")
                .option("url", "example.com/*")
                .option("invalid_param", "1")
                .load()
                .schema
            )

    def test_wayback_unknown_option_raises(self, registered):
        import pytest

        with pytest.raises(Exception, match="unknown option.*collaps"):
            (
                registered.read.format("wayback_machine")
                .option("url", "example.com")
                .option("collaps", "urlkey")  # typo of collapse
                .load()
                .schema
            )

    def test_d1_unknown_option_raises(self, registered, d1_db):
        import pytest

        with pytest.raises(Exception, match="unknown option"):
            (
                registered.read.format("d1")
                .options(table="users", tabel="users", **_d1_opts(d1_db))
                .load()
                .schema
            )
