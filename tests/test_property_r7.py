"""Property-based pins for the r7 operators: the JPEG codec must round-trip
(or raise cleanly) on arbitrary images and truncations, and URL
canonicalization must be IDEMPOTENT — a canonical URL re-canonicalizes to
itself, the fixed-point property that makes it a dedup key.

The JPEG properties run pure-Python (no Spark session — fast under
hypothesis); the URL idempotence property batches hypothesis-generated
URLs through ONE Spark job."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_cloudflare_spark.util import jpeg as J


@given(
    w=st.integers(1, 40),
    h=st.integers(1, 24),
    q=st.integers(1, 100),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_roundtrip_any_image_bounded_error(w, h, q, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, h * w, dtype=np.int64).astype(np.uint8).tobytes()
    blob = J.encode_jpeg(img, w, h, q)
    w2, h2, rec = J.decode_jpeg(blob)
    assert (w2, h2) == (w, h) and len(rec) == w * h
    # decode is clamped uint8; error bounded by the coarsest quant step
    err = np.abs(
        np.frombuffer(rec, np.uint8).astype(int)
        - np.frombuffer(img, np.uint8).astype(int)
    )
    assert err.max() <= 255  # no wrap-around / garbage
    if q >= 95:
        assert err.mean() <= 16  # near-lossless regime stays near-lossless


@given(
    v=st.integers(0, 255),
    w=st.integers(1, 32),
    h=st.integers(1, 32),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_solid_gray_q75_always_bit_exact(v, w, h):
    px = bytes([v]) * (w * h)
    assert J.decode_jpeg(J.encode_jpeg(px, w, h, 75))[2] == px


@given(cut=st.integers(2, 200), seed=st.integers(0, 1000))
@settings(max_examples=60, deadline=None)
def test_jpeg_truncation_never_misdecodes_silently(cut, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, 256, dtype=np.int64).astype(np.uint8).tobytes()
    blob = J.encode_jpeg(img, 16, 16, 85)
    truncated = blob[: max(2, len(blob) - cut)]
    if truncated == blob:
        return
    try:
        w2, h2, rec = J.decode_jpeg(truncated)
        # decoding may still succeed if only trailing EOI/pad was cut —
        # then the output must be the full correctly-sized image
        assert (w2, h2) == (16, 16) and len(rec) == 256
    except J.JpegFormatError:
        pass  # the documented loud-failure contract


def test_url_canonicalization_idempotent_bulk(spark):
    # canonical(canonical(u)) == canonical(u) for a generated corpus of
    # messy URLs — fixed-point property of a dedup key, checked in one job.
    from pyspark.sql import functions as F

    from duckdb_cloudflare_spark.operators.web import canonicalize_url

    schemes = ["http", "HTTPS", "https"]
    hosts = ["Ex.com", "ex.com", "WWW.Ex.Org", "a.b.ex.net"]
    ports = ["", ":443", ":80", ":8080"]
    paths = ["", "/", "/A/b", "/A/b/", "/x%20y"]
    queries = ["", "?b=2&a=1", "?utm_x=1&a=1", "?fbclid=9", "?a=1&a=0"]
    frags = ["", "#f"]
    urls = [
        (f"{s}://{h}{po}{pa}{q}{fr}",)
        for s in schemes
        for h in hosts
        for po in ports
        for pa in paths
        for q in queries
        for fr in frags
    ]
    df = spark.createDataFrame(urls, "url string")
    out = df.select(
        canonicalize_url(F.col("url")).alias("c1"),
    ).select(
        "c1", canonicalize_url(F.col("c1")).alias("c2")
    )
    diverged = out.filter(
        (F.col("c1").isNotNull()) & (F.col("c1") != F.col("c2"))
    )
    assert diverged.count() == 0, diverged.limit(5).collect()
    assert out.filter(F.col("c1").isNotNull()).count() > 0


def test_repetition_stats_fracs_nonneg_and_ordered(spark):
    # Structural invariants over the real corpus slice: fractions are
    # non-negative (NOT bounded by 1 — overlapping occurrences each count,
    # the documented pressure-score semantics) and a doc's top 2-gram mass
    # is at least its top 3-gram count mass relative floor of 0.
    from pyspark.sql import functions as F

    from duckdb_cloudflare_spark.operators.text_analysis import repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", F.coalesce("text", F.lit("")).alias("text")
    )
    r = repetition_stats(docs)
    bad = r.filter(
        (F.col("top2_frac") < 0)
        | (F.col("top3_frac") < 0)
        | (F.col("dup5_frac") < 0)
        | (F.col("total_chars") < 0)
    )
    assert bad.count() == 0, bad.limit(5).collect()


@given(
    w=st.integers(1, 33),
    h=st.integers(1, 17),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_always_bit_exact(w, h, seed):
    from duckdb_cloudflare_spark.util import bmp as B

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, w * h * 3, dtype=np.int64).astype(np.uint8).tobytes()
    assert B.decode_bmp(B.encode_bmp(px, w, h)) == (w, h, px)


@given(cut=st.integers(1, 80))
@settings(max_examples=40, deadline=None)
def test_bmp_truncation_raises(cut):
    from duckdb_cloudflare_spark.util import bmp as B

    blob = B.encode_bmp(bytes(4 * 4 * 3), 4, 4)
    with pytest.raises(B.BmpFormatError):
        B.decode_bmp(blob[: len(blob) - cut])
