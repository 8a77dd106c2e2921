"""duck_sql: DuckDB-dialect rewrites (EXCLUDE, QUALIFY) over spark.sql.
Native Spark 4.x acceptance of GROUP BY ALL / star EXCEPT is pinned too so
a Spark upgrade that regresses them is caught here."""

from __future__ import annotations

import pytest

from duckdb_cloudflare_spark.compat import duck_sql, rewrite_exclude, rewrite_qualify


@pytest.fixture(scope="module")
def t(spark):
    spark.range(12).selectExpr(
        "id", "id % 3 AS g", "CAST(id * 2 AS DOUBLE) AS v"
    ).createOrReplaceTempView("compat_t")
    return spark


class TestRewrites:
    def test_exclude_to_except(self):
        assert rewrite_exclude("SELECT * EXCLUDE (v) FROM t") == (
            "SELECT * EXCEPT (v) FROM t"
        )
        assert rewrite_exclude("SELECT a.* EXCLUDE (v), b.x FROM t") == (
            "SELECT a.* EXCEPT (v), b.x FROM t"
        )

    def test_exclude_in_string_untouched(self):
        sql = "SELECT '* EXCLUDE (v)' AS s FROM t"
        assert rewrite_exclude(sql) == sql

    def test_qualify_alias(self):
        out = rewrite_qualify(
            "SELECT g, row_number() OVER (ORDER BY v) AS rn FROM t QUALIFY rn <= 2"
        )
        assert out.startswith("SELECT * EXCEPT (__qualify) FROM ")
        assert "(rn <= 2) AS __qualify" in out

    def test_qualify_keeps_tail(self):
        out = rewrite_qualify("SELECT g FROM t QUALIFY g = 1 ORDER BY g LIMIT 3")
        assert out.endswith("WHERE __qualify ORDER BY g LIMIT 3")

    def test_no_qualify_passthrough(self):
        sql = "SELECT g FROM t WHERE g = 1"
        assert rewrite_qualify(sql) == sql

    def test_nested_qualify_in_subquery_untouched(self):
        # depth > 0 → left for the inner statement; no top-level rewrite
        sql = "SELECT * FROM (SELECT g FROM t WHERE g = 1) AS s"
        assert rewrite_qualify(sql) == sql

    def test_multiple_qualify_rejected(self):
        with pytest.raises(ValueError, match="multiple"):
            rewrite_qualify("SELECT g FROM t QUALIFY a QUALIFY b")


class TestExecution:
    def test_qualify_select_alias(self, t):
        rows = duck_sql(
            t,
            """
            SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v DESC) AS rn
            FROM compat_t QUALIFY rn = 1 ORDER BY g
            """,
        ).collect()
        assert [(r["g"], r["v"]) for r in rows] == [(0, 18.0), (1, 20.0), (2, 22.0)]
        assert "__qualify" not in rows[0].asDict()

    def test_qualify_inline_window(self, t):
        rows = duck_sql(
            t,
            "SELECT g, v FROM compat_t "
            "QUALIFY row_number() OVER (PARTITION BY g ORDER BY v) = 1 ORDER BY g",
        ).collect()
        assert [(r["g"], r["v"]) for r in rows] == [(0, 0.0), (1, 2.0), (2, 4.0)]

    def test_exclude_executes(self, t):
        df = duck_sql(t, "SELECT * EXCLUDE (v) FROM compat_t")
        assert df.columns == ["id", "g"]

    def test_native_duckisms_still_work(self, t):
        # GROUP BY ALL and star EXCEPT are native Spark 4.x — no rewrite
        assert duck_sql(t, "SELECT g, sum(v) AS s FROM compat_t GROUP BY ALL").count() == 3
        assert duck_sql(t, "SELECT * EXCEPT (v) FROM compat_t").columns == ["id", "g"]

    def test_qualify_with_cte(self, t):
        rows = duck_sql(
            t,
            "WITH w AS (SELECT g, v FROM compat_t WHERE g < 2) "
            "SELECT g, v, rank() OVER (PARTITION BY g ORDER BY v) AS rk FROM w "
            "QUALIFY rk <= 1",
        ).collect()
        assert sorted((r["g"], r["v"]) for r in rows) == [(0, 0.0), (1, 2.0)]

    def test_qualify_named_window(self, t):
        # SELECT ... WINDOW w AS (...) QUALIFY fn() OVER w — the hoisted
        # predicate must inline the window spec (ADVICE r2: previously the
        # OVER w reference moved out of the subquery that defined w).
        rows = duck_sql(
            t,
            "SELECT g, v FROM compat_t "
            "WINDOW w AS (PARTITION BY g ORDER BY v DESC) "
            "QUALIFY row_number() OVER w = 1 ORDER BY g",
        ).collect()
        assert [(r["g"], r["v"]) for r in rows] == [(0, 18.0), (1, 20.0), (2, 22.0)]

    def test_qualify_named_window_multiple(self, t):
        rows = duck_sql(
            t,
            "SELECT g, v FROM compat_t "
            "WINDOW wa AS (PARTITION BY g ORDER BY v), "
            "wb AS (PARTITION BY g ORDER BY v DESC) "
            "QUALIFY rank() OVER wb = 1 ORDER BY g",
        ).collect()
        assert [(r["g"], r["v"]) for r in rows] == [(0, 18.0), (1, 20.0), (2, 22.0)]

    def test_qualify_unknown_named_window_raises(self, t):
        import pytest

        with pytest.raises(ValueError, match="named window"):
            duck_sql(t, "SELECT g, v FROM compat_t QUALIFY row_number() OVER nope = 1")

    def test_qualify_chained_named_window_raises(self):
        import pytest

        from duckdb_cloudflare_spark.compat import rewrite_qualify

        with pytest.raises(ValueError, match="another named window"):
            rewrite_qualify(
                "SELECT g FROM t WINDOW w1 AS (PARTITION BY g), "
                "w2 AS (w1 ORDER BY v) QUALIFY rank() OVER w2 = 1"
            )
