"""Cross-implementation and algebraic-invariant tests for the r10 hygiene
operators: the PII rules are cross-checked against Python's `re` over a
seeded 200-row fragment corpus (Spark's codegen regex and `re` implement
the same Java/PCRE-common subset the rules are restricted to by contract
— the third engine after the Spark-vs-DuckDB oracle gate), and the
decontamination / leakage operators get their invariants pinned."""

from __future__ import annotations

import re

from duckdb_cloudflare_spark.operators.text_analysis import PII_RULES

def _reference_scan(text: str):
    """The PII rule chain evaluated with Python's re — sequential redaction,
    counts on the previously-redacted text (the operator's contract)."""
    counts = {}
    cur = text
    for name, pat, token in PII_RULES:
        counts[name] = len(re.findall(pat, cur))
        cur = re.sub(pat, token, cur)
    return counts, cur


def test_pii_rules_agree_spark_vs_python_re(spark):
    """Spark's regexp engine vs Python re over a deterministic
    hypothesis-style corpus: counts and redacted text must agree row for
    row (PII_RULES are restricted to the common regex subset by contract)."""
    from duckdb_cloudflare_spark.operators.text_analysis import pii_scan

    import random

    rng = random.Random(0xC0FFEE)
    frags = [
        "a@b.co", "x.y+z@mail.example.org", "10.0.0.1", "999.1.2.3",
        "555-123-4567", "123-45-6789", "not-a-phone 12-34", "v1.2.3",
        "user@", "@host.com", "plain words", "a-b-c", "1.2", "..",
        "me@[1.2.3.4]", "a@b.c", "0.0.0.0 ", "12-345-6789", "123-456-789",
    ]
    rows = []
    for i in range(200):
        text = " ".join(rng.choice(frags) for _ in range(rng.randint(0, 8)))
        rows.append((i, text))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_scan(df).collect()}
    for i, text in rows:
        counts, redacted = _reference_scan(text)
        r = got[i]
        for name in ("email", "ipv4", "phone", "ssn"):
            assert r[f"n_{name}"] == counts[name], (text, name)
        assert r["redacted"] == redacted, text


def test_decontamination_identical_doc_fully_contaminated(spark):
    """A training doc that IS an eval doc verbatim has contamination 1.0;
    a doc sharing no vocabulary has 0.0."""
    from duckdb_cloudflare_spark.operators.dedup import decontamination_stats

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    tr = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, "one two three four five")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontamination_stats(tr, ev, k=3).collect()}
    assert got[1]["contamination"] == 1.0
    assert got[2]["contamination"] == 0.0


def test_decontamination_monotone_in_eval_set(spark):
    """Growing the eval corpus can only increase (never decrease) any
    document's contaminated count — the subset monotonicity the audit
    relies on when benchmarks are added."""
    from duckdb_cloudflare_spark.operators.dedup import decontamination_stats

    tr = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "p q r s t u")], "doc_id long, text string"
    )
    ev_small = spark.createDataFrame([(100, "a b c d")], "doc_id long, text string")
    ev_big = spark.createDataFrame(
        [(100, "a b c d"), (101, "e f g h"), (102, "q r s t")],
        "doc_id long, text string",
    )
    small = {r["doc_id"]: r["n_contaminated"]
             for r in decontamination_stats(tr, ev_small, k=3).collect()}
    big = {r["doc_id"]: r["n_contaminated"]
           for r in decontamination_stats(tr, ev_big, k=3).collect()}
    for k in small:
        assert big[k] >= small[k]


def test_cross_source_leakage_symmetric_under_source_rename(spark):
    """Leakage counts depend only on the fingerprint partition, not on
    source LABELS: renaming sources permutes rows but preserves the
    multiset of n_shared values."""
    from duckdb_cloudflare_spark.operators.dedup import cross_source_leakage

    rows = [
        (1, "A", "x y z"), (2, "B", "x y z"), (3, "C", "x y z"),
        (4, "A", "q r s"), (5, "C", "q r s"), (6, "B", "unique here"),
    ]
    df1 = spark.createDataFrame(rows, "doc_id long, source string, text string")
    ren = {"A": "Z9", "B": "M5", "C": "A0"}
    df2 = spark.createDataFrame(
        [(i, ren[s], t) for i, s, t in rows],
        "doc_id long, source string, text string",
    )
    m1 = sorted(r["n_shared"] for r in cross_source_leakage(df1).collect())
    m2 = sorted(r["n_shared"] for r in cross_source_leakage(df2).collect())
    assert m1 == m2 and len(m1) == 3


def test_pii_scan_is_streaming_compatible(spark, tmp_path):
    """pii_scan is a stateless projection, so it must run unchanged on a
    streaming DataFrame (the scrub-at-ingest shape)."""
    from duckdb_cloudflare_spark.operators.text_analysis import pii_scan

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, "mail bob@example.com now"), (2, "clean")], "doc_id long, text string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    out = pii_scan(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("pii_stream_t")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(60)
    got = {r["doc_id"]: r for r in spark.sql("SELECT * FROM pii_stream_t").collect()}
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["redacted"]
    assert got[2]["n_pii"] == 0
