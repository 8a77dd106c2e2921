"""Cross-implementation invariants for the r12 operators: the HTML
extraction chain is replayed with Python `re` (the third engine next to
the Spark-vs-DuckDB oracle gate — all three restrict themselves to the
Java/RE2/`re` common regex subset by contract), q61's z arithmetic is
replayed with plain Python floats over seeded random series, and the
streaming week-floor helper is checked against the datetime library."""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators.web import _HTML_ENTITIES


def _reference_html_to_text(html: str) -> str:
    """operators/web.py::html_to_text replayed with Python re (ASCII mode:
    Java and RE2 \\s are ASCII-only; the fragments below are ASCII)."""
    s = re.sub(r"(?is)<script[^>]*>.*?</script>", " ", html)
    s = re.sub(r"(?is)<style[^>]*>.*?</style>", " ", s)
    s = re.sub(r"(?s)<!--.*?-->", " ", s)
    s = re.sub(r"<[^>]*>", " ", s)
    for ent, repl in _HTML_ENTITIES:
        s = s.replace(ent, repl)
    return re.sub(r"\s+", " ", s, flags=re.ASCII).strip()


def _random_html(rng: random.Random) -> str:
    words = ["data", "spark", "scan", "row", "key", "&amp;", "&lt;b&gt;", "x<y"]
    frags = []
    for _ in range(rng.randint(1, 12)):
        kind = rng.randint(0, 7)
        body = " ".join(rng.choices(words, k=rng.randint(0, 5)))
        if kind == 0:
            frags.append(f"<script>{body}</script>")
        elif kind == 1:
            frags.append(f"<style a='{body}'>{body}</style>")
        elif kind == 2:
            frags.append(f"<!-- {body} -->")
        elif kind == 3:
            frags.append(f"<p class='{body}'>{body}</p>")
        elif kind == 4:
            frags.append(f"<a href='/{body}'>{body}</a>")
        elif kind == 5:
            frags.append(body)
        elif kind == 6:
            frags.append("<script>never closed " + body)  # unclosed subtree
        else:
            frags.append(f"<div >{body}</ div>")
    return "".join(frags)


def test_html_to_text_agrees_with_python_re(spark):
    from duckdb_cloudflare_spark.operators.web import html_to_text

    rng = random.Random(12012)
    rows = [(i, _random_html(rng)) for i in range(200)]
    df = spark.createDataFrame(rows, "i long, html string")
    got = {
        r["i"]: r["t"]
        for r in df.select("i", html_to_text(F.col("html")).alias("t")).collect()
    }
    for i, html in rows:
        assert got[i] == _reference_html_to_text(html), (i, html)


def _random_html_no_encoded_tags(rng: random.Random) -> str:
    """Like _random_html but without entity-encoded complete tags
    ('&lt;b&gt;'): those DECODE to literal tag-shaped text ('<b>') by
    design — the one class of input where a second extraction pass is not
    the identity (any entity-decoding extractor behaves this way)."""
    html = _random_html(rng)
    return html.replace("&lt;b&gt;", "&lt;b")


def test_html_to_text_idempotent_on_its_own_output(spark):
    """For inputs without entity-encoded complete tags, extraction output
    contains no decodable entities or complete tags, so a second pass must
    be the identity — the 'did we leave markup behind' invariant. (Bare
    '<' from decoded &lt; is fine: the following text never re-forms a
    complete tag in this corpus.)"""
    from duckdb_cloudflare_spark.operators.web import html_to_text

    rng = random.Random(34034)
    rows = [(i, _random_html_no_encoded_tags(rng)) for i in range(100)]
    df = spark.createDataFrame(rows, "i long, html string")
    once = df.select("i", html_to_text(F.col("html")).alias("t"))
    twice = once.select("i", html_to_text(F.col("t")).alias("t2"), "t")
    for r in twice.collect():
        assert r["t2"] == r["t"], r


def test_q61_z_arithmetic_agrees_with_python_floats(spark):
    """The exact-integer-sum z derivation replayed in plain Python over
    seeded random hourly series (several event_types in ONE job): flags
    and values must agree bit-for-bit."""
    import datetime as dt

    import duckdb_cloudflare_spark.queries as Qm
    from duckdb_cloudflare_spark.queries import all_queries

    rng = random.Random(61061)
    base = dt.datetime(2024, 6, 1)
    rows, series = [], {}
    eid = 0
    for t in ("a", "b", "c"):
        counts = [rng.randint(5, 15) for _ in range(40)]
        if t != "c":
            counts[33] = rng.randint(100, 400)  # planted spike
        series[t] = counts
        for h, n in enumerate(counts):
            for i in range(n):
                rows.append(
                    (eid, base + dt.timedelta(hours=h, seconds=i), 1, t, 0.0, "{}")
                )
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    key = "/t-prop-q61/events"
    Qm._TABLE_CACHE[key] = df
    try:
        got = {
            (r["event_type"], r["hour"]): (r["n"], r["trailing_mean"], r["zscore"])
            for r in all_queries()["q61_event_anomaly"](spark, "/t-prop-q61").collect()
        }
    finally:
        Qm._TABLE_CACHE.pop(key, None)

    want = {}
    for t, counts in series.items():
        for h in range(24, len(counts)):
            window = counts[h - 24 : h]
            s, sq, n = sum(window), sum(c * c for c in window), counts[h]
            var = (sq - s * s / 24.0) / 23.0
            if var > 0:
                mu = s / 24.0
                z = (n - mu) / var**0.5
                if abs(z) > 2.5:
                    want[(t, base + dt.timedelta(hours=h))] = (n, mu, z)
    assert got == want
    assert any(k[0] == "a" for k in got) and any(k[0] == "b" for k in got)


def test_week_floor_matches_datetime_reference():
    import datetime as dt

    from duckdb_cloudflare_spark.streaming.events import _week_floor_us

    rng = random.Random(77077)
    epoch = dt.datetime(1970, 1, 1)
    for _ in range(2000):
        t = epoch + dt.timedelta(seconds=rng.randint(0, 4_000_000_000))
        us = int((t - epoch).total_seconds()) * 1_000_000
        monday = (t - dt.timedelta(days=t.weekday())).replace(
            hour=0, minute=0, second=0, microsecond=0
        )
        want = int((monday - epoch).total_seconds()) * 1_000_000
        assert _week_floor_us(us) == want, t
