"""Golden-URL tests ported from the reference's sqllogictest suite
(test/sql/internet_archive_pushdown.test, test/sql/common_crawl_*.test,
URL_GENERATION_TESTS.md): the URL builders are pure, so query shapes map to
exact URL assertions with no network."""

from __future__ import annotations

import pytest

from duckdb_cloudflare_spark.sources.cdx import (
    build_cc_cdx_url,
    build_warc_url,
    build_wayback_cdx_url,
    build_wayback_page_url,
    parse_cc_ndjson,
    parse_wayback_csv,
)
from duckdb_cloudflare_spark.util.text import like_to_regex, to_cdx_timestamp


class TestWaybackUrls:
    def test_base_shape(self):
        url = build_wayback_cdx_url("example.com", fields_needed=["original", "timestamp"])
        assert url.startswith("https://web.archive.org/cdx/search/cdx?url=example.com&output=csv")

    def test_limit(self):
        url = build_wayback_cdx_url("example.com", max_results=5)
        assert "&limit=5" in url and "fastLatest" not in url

    def test_fl_ordered(self):
        url = build_wayback_cdx_url(
            "example.com",
            fields_needed=["length", "original", "urlkey", "timestamp"],
        )
        assert "&fl=urlkey,timestamp,original,length" in url

    def test_statuscode_filter(self):
        url = build_wayback_cdx_url("example.com", cdx_filters=["statuscode:200"])
        assert "&filter=statuscode:200" in url

    def test_negated_filter(self):
        url = build_wayback_cdx_url("example.com", cdx_filters=["!statuscode:404"])
        assert "&filter=!statuscode:404" in url

    def test_mimetype_filter(self):
        url = build_wayback_cdx_url("example.com", cdx_filters=["mimetype:text/html"])
        assert "&filter=mimetype:text/html" in url

    def test_from_to(self):
        url = build_wayback_cdx_url(
            "example.com",
            from_date=to_cdx_timestamp("2024-01-01 00:00:00"),
            to_date=to_cdx_timestamp("2025-01-01 00:00:00"),
        )
        assert "&from=20240101" in url and "&to=20250101" in url

    def test_match_type_domain(self):
        url = build_wayback_cdx_url("*.example.com", match_type="domain")
        assert "url=*.example.com" in url and "&matchType=domain" in url

    def test_match_type_exact_omitted(self):
        assert "matchType" not in build_wayback_cdx_url("example.com")

    def test_fast_latest_negative_limit(self):
        url = build_wayback_cdx_url("example.com", fast_latest=True, max_results=10)
        assert "&fastLatest=true&limit=-10" in url

    def test_offset(self):
        url = build_wayback_cdx_url("example.com", max_results=10, offset=50)
        assert "&offset=50" in url and "&limit=10" in url

    def test_offset_zero_omitted(self):
        assert "offset" not in build_wayback_cdx_url("example.com", offset=0)

    def test_collapse(self):
        url = build_wayback_cdx_url("example.com", collapses=["urlkey"])
        assert "&collapse=urlkey" in url

    def test_collapse_timestamp_prefix(self):
        url = build_wayback_cdx_url("example.com", collapses=["timestamp:8"])
        assert "&collapse=timestamp:8" in url

    def test_in_alternation(self):
        url = build_wayback_cdx_url("example.com", cdx_filters=["statuscode:(200|301|302)"])
        assert "&filter=statuscode:(200|301|302)" in url

    def test_urlkey_suffix_regex(self):
        url = build_wayback_cdx_url(
            "example.com/*", cdx_filters=[f"urlkey:{like_to_regex('%apply')}"]
        )
        assert "&filter=urlkey:.*apply$" in url

    def test_urlkey_paren_not_escaped(self):
        url = build_wayback_cdx_url(
            "example.com/*", cdx_filters=[f"!urlkey:{like_to_regex('com,example)/%/%')}"]
        )
        assert "&filter=!urlkey:^com,example)/.*/.*" in url

    def test_complex_combined(self):
        url = build_wayback_cdx_url(
            "example.com/*",
            fields_needed=["original", "timestamp"],
            cdx_filters=["statuscode:200", "mimetype:text/html", "!urlkey:.*%5C?.*"],
            from_date="2024",
            to_date="2025",
            max_results=10,
            collapses=["urlkey"],
        )
        for frag in (
            "https://web.archive.org/cdx/search/cdx?",
            "url=example.com/*",
            "&from=2024",
            "&to=2025",
            "&limit=10",
            "&filter=statuscode:200",
            "&filter=mimetype:text/html",
            "&filter=!urlkey:",
            "&collapse=urlkey",
        ):
            assert frag in url, frag

    def test_page_url_id_suffix(self):
        assert (
            build_wayback_page_url("20240601123456", "http://example.com/x")
            == "https://web.archive.org/web/20240601123456id_/http://example.com/x"
        )


class TestCommonCrawlUrls:
    def test_base_shape(self):
        url = build_cc_cdx_url(
            "CC-MAIN-2025-43", "example.com/*", ["url", "timestamp"], max_results=100
        )
        assert url.startswith(
            "https://index.commoncrawl.org/CC-MAIN-2025-43-index?url=example.com/*"
        )
        assert "&output=json" in url and "&limit=100" in url

    def test_field_mapping(self):
        # mimetype→mime, statuscode→status (common_crawl_index.cpp:73-80)
        url = build_cc_cdx_url("CC-MAIN-2025-43", "x.com", ["url", "mimetype", "statuscode"])
        assert "&fl=url,mime,status" in url

    def test_filters(self):
        url = build_cc_cdx_url(
            "CC-MAIN-2025-43", "x.com", ["url"], cdx_filters=["=status:200", "=mime:text/html"]
        )
        assert "&filter==status:200" in url and "&filter==mime:text/html" in url

    def test_from_to(self):
        url = build_cc_cdx_url(
            "CC-MAIN-2025-43", "x.com", ["url"], from_ts="20240101", to_ts="2025"
        )
        assert "&from=20240101" in url and "&to=2025" in url

    def test_warc_url(self):
        assert build_warc_url("crawl-data/CC-MAIN/x.warc.gz") == (
            "https://data.commoncrawl.org/crawl-data/CC-MAIN/x.warc.gz"
        )


class TestParsers:
    def test_cc_ndjson(self):
        data = (
            '{"url": "http://a.com/", "timestamp": "20240601000000", "mime": "text/html", '
            '"status": "200", "digest": "ABC", "filename": "f.warc.gz", "offset": "10", "length": "20"}\n'
            "garbage line\n"
            '{"timestamp": "20240601000001"}\n'  # no url → skipped
            '{"url": "http://b.com/", "timestamp": "20240602000000", "mime": "-", "status": ""}\n'
        )
        recs = parse_cc_ndjson(data, "CC-MAIN-2025-43", need_warc_fields=True)
        assert len(recs) == 2
        assert recs[0].url == "http://a.com/"
        assert recs[0].status_code == 200
        assert recs[0].offset == 10 and recs[0].length == 20
        assert recs[0].crawl_id == "CC-MAIN-2025-43"
        assert recs[1].status_code == 0  # empty status → 0

    def test_wayback_csv(self):
        data = (
            "com,example)/ 20240601000000 http://example.com/ text/html 200 DIGEST1 1234\n"
            "com,example)/a 20240602000000 http://example.com/a - - DIGEST2 -\n"
            "short line\n"
        )
        fields = ["urlkey", "timestamp", "original", "mimetype", "statuscode", "digest", "length"]
        recs = parse_wayback_csv(data, fields)
        assert len(recs) == 2
        assert recs[0].urlkey == "com,example)/"
        assert recs[0].status_code == 200 and recs[0].length == 1234
        assert recs[1].status_code == 0 and recs[1].length == 0  # '-' → 0


class TestFullPlanPushdownURLs:
    """End-to-end: WHERE clauses on the registered DataSource → pushFilters
    → translated CDX URL, observed via debug+dry_run (the reference's
    no-network golden-URL technique, SURVEY §5)."""

    @pytest.fixture(scope="class")
    def cc(self, spark):
        from duckdb_cloudflare_spark.session import register_sources

        register_sources(spark)

        def build(url_opt=None, **opts):
            r = spark.read.format("common_crawl").option("debug", "true").option(
                "dry_run", "true"
            ).option("crawl_id", "CC-MAIN-2025-43")
            if url_opt:
                r = r.option("url", url_opt)
            for k, v in opts.items():
                r = r.option(k, v)
            return r.load()

        return build

    def _url(self, df):
        [row] = df.select("cdx_url").collect()
        return row["cdx_url"]

    def test_where_url_startswith(self, cc):
        from pyspark.sql import functions as F

        df = cc().filter(F.col("url").startswith("https://example.com/"))
        assert "url=https://example.com/*" in self._url(df.select("cdx_url"))

    def test_where_statuscode_eq(self, cc):
        from pyspark.sql import functions as F

        df = cc("*.example.com/*").filter(F.col("statuscode") == 200)
        assert "filter==status:200" in self._url(df.select("cdx_url"))

    def test_where_statuscode_in(self, cc):
        from pyspark.sql import functions as F

        df = cc("*.example.com/*").filter(F.col("statuscode").isin(200, 301, 302))
        assert "filter=~status:(200|301|302)" in self._url(df.select("cdx_url"))

    def test_where_mimetype_not_equal_absorbed(self, cc):
        from pyspark.sql import functions as F

        # != arrives as Not(EqualTo) → negated filter param, absorbed (the
        # reference removes fully-translated filters from the plan)
        df = cc("*.example.com/*").filter(F.col("mimetype") != "text/html")
        assert "filter=!mime:text/html" in self._url(df.select("cdx_url"))

    def test_where_url_not_startswith_absorbed(self, cc):
        from pyspark.sql import functions as F

        # NOT url-prefix → "!~url:^...$" negated regex, value escaped,
        # absorbed from the plan (common_crawl_index.cpp:1210-1227; CC
        # analog of internet_archive_pushdown.test:159-190). The debug
        # synthetic row survives only because the predicate was absorbed.
        df = cc("*.example.com/*").filter(~F.col("url").startswith("http://ads."))
        assert "filter=!~url:^http://ads%5C..*$" in self._url(df.select("cdx_url"))

    def test_where_url_not_contains_absorbed(self, cc):
        from pyspark.sql import functions as F

        df = cc("*.example.com/*").filter(~F.col("url").contains("tracker"))
        assert "filter=!~url:^.*tracker.*$" in self._url(df.select("cdx_url"))

    @pytest.fixture(scope="class")
    def wb(self, spark):
        from duckdb_cloudflare_spark.session import register_sources

        register_sources(spark)

        def build(url_opt, **opts):
            r = (
                spark.read.format("wayback_machine")
                .option("debug", "true")
                .option("dry_run", "true")
                .option("url", url_opt)
            )
            for k, v in opts.items():
                r = r.option(k, v)
            return r.load()

        return build

    def test_wayback_where_url_not_contains_absorbed(self, wb):
        from pyspark.sql import functions as F

        # NOT url-contains → filter=!original:.*test.* (the CDX field for
        # the full URL is ``original`` — internet_archive.cpp:1009-1158,
        # golden shape internet_archive_pushdown.test:173-178). The debug
        # synthetic row survives only because the predicate was absorbed.
        df = wb("example.com/*").filter(~F.col("url").contains("test"))
        assert "filter=!original:.*test.*" in self._url(df.select("cdx_url"))

    def test_wayback_where_url_not_startswith_absorbed(self, wb):
        from pyspark.sql import functions as F

        df = wb("example.com/*").filter(~F.col("url").startswith("example.com/ads"))
        assert "filter=!original:^example%5C.com/ads.*" in self._url(
            df.select("cdx_url")
        )


class TestReadWrappers:
    """cc/wb `read(limit=n)` wrappers: the reference's LIMIT-division rewrite
    surfaced as an explicit API (SURVEY §4.1 option b)."""

    def test_cc_limit_divided_across_crawls(self, spark):
        from duckdb_cloudflare_spark.sources.api import read_common_crawl

        df = read_common_crawl(
            spark,
            "*.example.com/*",
            limit=50,
            crawl_id="CC-MAIN-2025-43,CC-MAIN-2025-38",
            debug="true",
            dry_run="true",
        )
        urls = [r["cdx_url"] for r in df.select("cdx_url").collect()]
        # two crawl partitions, each asked for ceil(50 / 2) = 25
        assert len(urls) == 2
        assert all("limit=25" in u for u in urls)
        assert {("CC-MAIN-2025-43" in u, "CC-MAIN-2025-38" in u) for u in urls} == {
            (True, False), (False, True)
        }

    def test_cc_limit_ceiling_division(self, spark):
        # reference uses CEILING division — (limit + n - 1) / n,
        # common_crawl_index.cpp:1511 — so limit=11 over 2 crawls fetches 6
        # per crawl (floor's 5+5=10 could return fewer than 11 matches).
        from duckdb_cloudflare_spark.sources.api import read_common_crawl

        df = read_common_crawl(
            spark,
            "*.example.com/*",
            limit=11,
            crawl_id="CC-MAIN-2025-43,CC-MAIN-2025-38",
            debug="true",
            dry_run="true",
        )
        urls = [r["cdx_url"] for r in df.select("cdx_url").collect()]
        assert len(urls) == 2
        assert all("limit=6" in u for u in urls)

    def test_cc_limit_10_over_3_crawls_is_4_per_crawl(self, spark):
        # VERDICT r8 item 7's acceptance case: ceil(10 / 3) = 4 per crawl
        # (reference PERFORMANCE.md:36 documents the same manual sizing)
        from duckdb_cloudflare_spark.sources.api import read_common_crawl

        df = read_common_crawl(
            spark,
            "*.example.com/*",
            limit=10,
            crawl_id="CC-MAIN-2025-43,CC-MAIN-2025-38,CC-MAIN-2025-33",
            debug="true",
            dry_run="true",
        )
        urls = [r["cdx_url"] for r in df.select("cdx_url").collect()]
        assert len(urls) == 3
        assert all("limit=4" in u for u in urls)

    def test_cc_limit_smaller_than_crawl_count(self, spark):
        from duckdb_cloudflare_spark.sources.api import read_common_crawl

        df = read_common_crawl(
            spark,
            "*.example.com/*",
            limit=1,
            crawl_id="CC-MAIN-2025-43,CC-MAIN-2025-38",
            debug="true",
            dry_run="true",
        )
        # per-crawl floor is 1 (reference max(1, ...)), Spark trims to limit
        rows = df.collect()
        assert len(rows) == 1
        assert "limit=1" in rows[0]["cdx_url"]

    def test_wayback_limit_and_collapse(self, spark):
        from duckdb_cloudflare_spark.sources.api import read_wayback

        df = read_wayback(
            spark,
            "example.com/*",
            limit=30,
            collapse="urlkey:6",
            debug="true",
            dry_run="true",
        )
        [row] = df.select("cdx_url").collect()
        assert "limit=30" in row["cdx_url"]
        assert "collapse=urlkey%3A6" in row["cdx_url"] or "collapse=urlkey:6" in row["cdx_url"]

    def test_wayback_fast_latest(self, spark):
        from duckdb_cloudflare_spark.sources.api import read_wayback

        df = read_wayback(
            spark,
            "example.com",
            limit=10,
            fast_latest=True,
            debug="true",
            dry_run="true",
        )
        [row] = df.select("cdx_url").collect()
        assert "limit=-10" in row["cdx_url"]

    def test_cc_url_regex_option(self, spark):
        from duckdb_cloudflare_spark.sources.api import read_common_crawl

        df = read_common_crawl(
            spark,
            "*.example.com/*",
            crawl_id="CC-MAIN-2025-43",
            url_regex="https?://[^/]+/blog/.*",
            debug="true",
            dry_run="true",
        )
        [row] = df.select("cdx_url").collect()
        # anchors added when missing (common_crawl_index.cpp:1163-1197)
        assert "filter=~url:^https?://[^/]+/blog/.*$" in row["cdx_url"]

    def test_wayback_urlkey_regex_option(self, spark):
        from duckdb_cloudflare_spark.sources.api import read_wayback

        df = read_wayback(
            spark,
            "example.com/*",
            urlkey_regex="^com,example)/blog/.*",
            debug="true",
            dry_run="true",
        )
        [row] = df.select("cdx_url").collect()
        # regex passes through verbatim — escaping is the caller's contract,
        # same as the reference's SIMILAR TO (internet_archive.cpp:987-1005)
        assert "filter=urlkey:^com,example)/blog/.*" in row["cdx_url"]


class TestDistinctOnCollapse:
    """DISTINCT ON → collapse= mapping parity with the reference's
    expression analysis (src/internet_archive.cpp:1484-1893)."""

    def test_bare_columns(self):
        from duckdb_cloudflare_spark.sources.api import distinct_on_to_collapse as m

        assert m("urlkey") == "urlkey"
        assert m("digest") == "digest"
        assert m("url") == "original"  # column→field rename
        assert m("timestamp") == "timestamp"

    def test_prefix_forms(self):
        from duckdb_cloudflare_spark.sources.api import distinct_on_to_collapse as m

        assert m("substr(urlkey, 1, 6)") == "urlkey:6"
        assert m("substring(urlkey, 1, 6)") == "urlkey:6"
        assert m("urlkey[:6]") == "urlkey:6"
        assert m("urlkey[1:6]") == "urlkey:6"
        assert m("substr(timestamp, 1, 4)") == "timestamp:4"
        # start != 1 is not a prefix → pushdown abandoned
        assert m("substr(urlkey, 2, 6)") is None

    def test_year_month_derived_columns(self):
        import pytest

        from duckdb_cloudflare_spark.sources.api import distinct_on_to_collapse as m

        assert m("year") == "timestamp:4"
        assert m("year", "month") == "timestamp:6"
        assert m("month", "year") == "timestamp:6"
        with pytest.raises(ValueError, match="DISTINCT ON\\(month\\)"):
            m("month")

    def test_multiple_targets_join(self):
        from duckdb_cloudflare_spark.sources.api import distinct_on_to_collapse as m

        assert m("year", "statuscode") == "timestamp:4;;statuscode"
        assert m("urlkey", "mimetype") == "urlkey;;mimetype"

    def test_non_collapsible_returns_none(self):
        from duckdb_cloudflare_spark.sources.api import distinct_on_to_collapse as m

        assert m("lang") is None
        assert m("upper(urlkey)") is None

    def test_read_wayback_distinct_on_builds_collapse_url(self, spark):
        from duckdb_cloudflare_spark.sources.api import read_wayback

        df = read_wayback(
            spark,
            "example.com",
            distinct_on=("year", "month"),
            debug="true",
            dry_run="true",
        )
        url = df.select("cdx_url").first()["cdx_url"]
        assert "&collapse=timestamp:6" in url

    def test_read_wayback_distinct_on_rejects_unpushable(self, spark):
        import pytest

        from duckdb_cloudflare_spark.sources.api import read_wayback

        with pytest.raises(ValueError, match="not collapse-expressible"):
            read_wayback(spark, "example.com", distinct_on=("lang",))


class TestLimitZeroAndBindErrors:
    """Reference error/limit contracts: LIMIT 0 never touches the network
    (test/sql/common_crawl_limit.test) and wrong-typed named parameters are
    bind-time errors (test/sql/common_crawl_errors.test)."""

    def test_limit_zero_runs_without_network(self, spark):
        # no fixture_dir and no network access: any attempted HTTP would
        # error loudly — limit 0 must short-circuit to an empty result
        from duckdb_cloudflare_spark.sources.api import read_common_crawl

        df = read_common_crawl(
            spark, "*.example.com/*", limit=0, crawl_id="CC-MAIN-2025-43"
        )
        assert df.count() == 0

    def test_bad_max_results_type_is_bind_error(self, spark):
        import pytest

        from duckdb_cloudflare_spark.session import register_sources

        register_sources(spark)
        with pytest.raises(Exception, match="invalid literal|max_results"):
            (
                spark.read.format("common_crawl")
                .option("url", "example.com/*")
                .option("max_results", "not_a_number")
                .option("dry_run", "true")
                .load()
                .collect()
            )
