"""Streaming sequence packing: the applyInPandasWithState packer must be
row-identical to the batch p26 window-cumsum plan when documents arrive in
doc_id order — including offsets that CROSS micro-batch boundaries (the
whole point of the keyed state)."""

from __future__ import annotations

import os
import time

import pytest

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def split_docs_dir(spark, tmp_path_factory):
    """The sf0.001 documents split into TWO parquet files by doc_id range,
    written oldest-first so the file stream delivers them as two ordered
    micro-batches per source."""
    d = tmp_path_factory.mktemp("docstream")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).first()[0]
    docs.filter(F.col("doc_id") <= mid).coalesce(1).write.parquet(str(d / "part1"))
    time.sleep(1.1)  # distinct mtimes → deterministic oldest-first order
    docs.filter(F.col("doc_id") > mid).coalesce(1).write.parquet(str(d / "part2"))
    flat = tmp_path_factory.mktemp("docstream_flat")
    n = 0
    for sub in ("part1", "part2"):
        for f in sorted(os.listdir(str(d / sub))):
            if f.endswith(".parquet"):
                src = str(d / sub / f)
                dst = str(flat / f"{n:02d}.parquet")
                os.rename(src, dst)
                os.utime(dst, (time.time() + n, time.time() + n))
                n += 1
    assert n == 2
    return str(flat)


def test_pack_stream_matches_batch_p26_across_batches(spark, split_docs_dir):
    from duckdb_cloudflare_spark import queries as Q
    from duckdb_cloudflare_spark.streaming.documents import (
        pack_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(pack_stream(stream), "pack_stream_out")
    stream_rows = {tuple(r) for r in got.collect()}

    batch_rows = {
        tuple(r)
        for r in Q.all_queries()["p26_sequence_pack"](spark, SF_DIR).collect()
    }
    assert stream_rows == batch_rows and len(stream_rows) > 0


def test_pack_stream_state_is_one_offset_per_source(spark, split_docs_dir):
    # State bound: the packer's state schema is a single long per source —
    # assert the declared schema (the contract that keeps state bounded).
    from duckdb_cloudflare_spark.streaming.documents import PACK_STATE_SCHEMA

    assert [f.dataType.simpleString() for f in PACK_STATE_SCHEMA.fields] == ["bigint"]


def test_decontaminate_stream_matches_batch_anti_join(spark, split_docs_dir):
    from duckdb_cloudflare_spark.operators.text_analysis import fingerprint
    from duckdb_cloudflare_spark.streaming.documents import (
        decontaminate_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    benchmark = docs.filter(F.col("doc_id") % 7 == 0).select("text")

    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(decontaminate_stream(stream, benchmark), "decon_out")
    stream_ids = {r["doc_id"] for r in got.select("doc_id").collect()}

    fps = benchmark.select(fingerprint(F.col("text")).alias("fp")).distinct()
    batch_ids = {
        r["doc_id"]
        for r in docs.withColumn("fp", fingerprint(F.col("text")))
        .join(fps, "fp", "left_anti")
        .select("doc_id")
        .collect()
    }
    n_docs = docs.count()
    assert stream_ids == batch_ids
    assert 0 < len(stream_ids) < n_docs  # something dropped, something kept


def test_chunk_dedup_stream_matches_batch_p44_across_batches(spark, split_docs_dir):
    # The digest-keyed state must carry first-occurrence memory ACROSS
    # micro-batches: a chunk first seen in batch 1 must mark its batch-2
    # copies as duplicates, and per-doc totals must equal the batch plan's.
    from duckdb_cloudflare_spark.operators.dedup import chunk_dedup_stats
    from duckdb_cloudflare_spark.streaming.documents import (
        chunk_dedup_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(chunk_dedup_stream(stream), "chunk_dedup_out")
    stream_stats = {
        (r["doc_id"], r["n_chunks"], r["dup_chunks"])
        for r in got.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.col("is_dup").cast("int")).cast("long").alias("dup_chunks"),
        )
        .collect()
    }
    batch_stats = {
        tuple(r)
        for r in chunk_dedup_stats(
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ).collect()
    }
    assert stream_stats == batch_stats and len(stream_stats) > 0


def test_chunk_dedup_stream_state_is_one_row_per_digest(spark):
    from duckdb_cloudflare_spark.streaming.documents import CHUNK_STATE_SCHEMA

    assert [f.dataType.simpleString() for f in CHUNK_STATE_SCHEMA.fields] == ["bigint"]


def test_quality_gate_composes_on_streams(spark, split_docs_dir):
    # The batch quality_gate is map-only, so the SAME operator must apply
    # to a readStream unchanged — ingest-time filtering without a separate
    # streaming implementation. Composed with decontaminate_stream this is
    # the gate -> decontaminate ingest front of the curation pipeline.
    from duckdb_cloudflare_spark.operators.curation import quality_gate
    from duckdb_cloudflare_spark.streaming.documents import (
        decontaminate_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    benchmark = docs.filter(F.col("doc_id") % 11 == 0).select("text")

    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(
        decontaminate_stream(quality_gate(stream), benchmark), "gated_ingest"
    )
    stream_ids = {r["doc_id"] for r in got.select("doc_id").collect()}

    from duckdb_cloudflare_spark.operators.text_analysis import fingerprint

    fps = benchmark.select(fingerprint(F.col("text")).alias("fp")).distinct()
    batch_ids = {
        r["doc_id"]
        for r in quality_gate(docs)
        .withColumn("fp", fingerprint(F.col("text")))
        .join(fps, "fp", "left_anti")
        .select("doc_id")
        .collect()
    }
    assert stream_ids == batch_ids and len(stream_ids) > 0


def test_ivf_cell_assignment_composes_on_streams(spark, tmp_path_factory):
    # Vector-ingest routing: fit the quantizer once on the static corpus,
    # then the SAME map-only assign_cells applies to a readStream of new
    # vectors unchanged — every streamed vector lands in the identical
    # cell the batch path assigns (index consistency at ingest time).
    import os
    import time

    from duckdb_cloudflare_spark.operators.similarity import (
        assign_cells,
        fit_ivf_centroids,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cents = fit_ivf_centroids(emb, n_centroids=8, seed=7)

    d = tmp_path_factory.mktemp("vecstream")
    emb.coalesce(1).write.parquet(str(d / "part"))
    flat = tmp_path_factory.mktemp("vecstream_flat")
    n = 0
    for f in sorted(os.listdir(str(d / "part"))):
        if f.endswith(".parquet"):
            os.rename(str(d / "part" / f), str(flat / f"{n:02d}.parquet"))
            n += 1
    stream = (
        spark.readStream.schema(emb.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    got = run_to_memory(
        assign_cells(stream.select("vec_id", "embedding"), cents).select(
            "vec_id", "cell"
        ),
        "vec_cells",
    )
    stream_cells = {(r["vec_id"], r["cell"]) for r in got.collect()}
    batch_cells = {
        (r["vec_id"], r["cell"])
        for r in assign_cells(emb.select("vec_id", "embedding"), cents)
        .select("vec_id", "cell")
        .collect()
    }
    assert stream_cells == batch_cells and len(stream_cells) > 0


def test_diff_stream_matches_batch_corpus_diff(spark, split_docs_dir):
    # Stream the "new" snapshot against a static "old" snapshot: per-doc
    # labels must equal batch corpus_diff minus 'removed' (a statement
    # about docs that never arrive — the documented streaming contract).
    from duckdb_cloudflare_spark.operators.curation import corpus_diff
    from duckdb_cloudflare_spark.streaming.documents import (
        diff_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old = docs.filter(F.col("doc_id") % 7 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.coalesce("text", F.lit("")), F.lit(" v1"))
        ).otherwise(F.col("text")).alias("text"),
    )
    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(
        diff_stream(stream, old).select("doc_id", "status"), "diff_stream_out"
    )
    stream_rows = {(r["doc_id"], r["status"]) for r in got.collect()}
    batch_rows = {
        (r["doc_id"], r["status"])
        for r in corpus_diff(old, docs).collect()
        if r["status"] != "removed"
    }
    assert stream_rows == batch_rows and len(stream_rows) > 0
    assert {s for _, s in stream_rows} == {"added", "changed", "unchanged"}


def test_hll_stream_final_estimates_match_batch_p79(spark, split_docs_dir):
    # The register state must carry ACROSS micro-batch boundaries: the
    # LAST emitted estimate per source (update mode, 2 batches) must equal
    # the batch hll_estimate over the whole corpus bit-for-bit — the
    # stream folds the identical (bucket, ρ) pairs into the identical
    # integer S* and applies the identical finalize arithmetic.
    from duckdb_cloudflare_spark.operators import dedup as D
    from duckdb_cloudflare_spark.operators.sketches import hll_estimate
    from duckdb_cloudflare_spark.streaming.documents import (
        hll_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(hll_stream(stream), "hll_stream_out")
    # update mode emits one row per (source, batch); keep the LAST (the
    # memory sink appends, so max n_buckets_used per source is the final
    # fold — registers only grow)
    import pandas as pd

    gpdf = got.toPandas()
    final = gpdf.loc[gpdf.groupby("source")["n_buckets_used"].idxmax()]
    stream_est = dict(zip(final["source"], final["hll_estimate"]))

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    inst = docs.select("source", F.explode(D.lowered_tokens()).alias("tok"))
    batch = {
        r["source"]: r["hll_estimate"]
        for r in hll_estimate(inst, "tok", group_cols=["source"]).collect()
    }
    assert set(stream_est) == set(batch)
    for s in batch:
        assert stream_est[s] == batch[s], (s, stream_est[s], batch[s])


def test_image_dedup_stream_matches_batch_p108_clusters(spark, tmp_path):
    """The hash-keyed first-occurrence state must carry ACROSS
    micro-batches: a brightness-shifted copy of a batch-1 image arriving
    in batch 2 must flag as duplicate; per-hash totals must equal batch
    p108's cluster table. Delivery is doc_id-ordered, so the streaming
    first-arrival keeper IS the batch min-id keeper here."""
    import numpy as np

    from duckdb_cloudflare_spark.operators.multimodal import image_dhash_dedup
    from duckdb_cloudflare_spark.streaming.documents import image_dedup_stream
    from duckdb_cloudflare_spark.streaming.events import run_to_memory
    from duckdb_cloudflare_spark.util import png

    rng = np.random.RandomState(21)
    pix_a = (rng.rand(8, 12) * 200).astype(np.uint8)
    pix_b = (rng.rand(8, 12) * 200).astype(np.uint8)
    blob_a = png.encode_png(pix_a.tobytes(), 12, 8, 1)
    bright_a = png.encode_png(
        (pix_a.astype(int) + 30).clip(0, 255).astype(np.uint8).tobytes(), 12, 8, 1
    )
    blob_b = png.encode_png(pix_b.tobytes(), 12, 8, 1)
    rows1 = [(1, blob_a), (2, blob_b), (3, None)]
    rows2 = [(4, bright_a), (5, b"junk")]  # batch-2 near-dup of batch-1's image
    schema = "doc_id long, asset binary"
    src = str(tmp_path / "img_stream")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1.parquet")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = {
        r["doc_id"]: r for r in run_to_memory(image_dedup_stream(stream), "img_dedup").collect()
    }
    # undecodables dropped; cross-batch near-dup flagged
    assert set(got) == {1, 2, 4}
    assert not got[1]["is_dup"] and not got[2]["is_dup"]
    assert got[4]["is_dup"] and got[4]["dhash"] == got[1]["dhash"]

    # cluster reconciliation against batch p108
    batch = spark.createDataFrame(rows1 + rows2, schema)
    clusters = {
        r["dhash"]: (r["cluster_size"], r["keep_id"])
        for r in image_dhash_dedup(batch).collect()
    }
    from collections import Counter

    stream_sizes = Counter(r["dhash"] for r in got.values())
    stream_keepers = {r["dhash"]: r["doc_id"] for r in got.values() if not r["is_dup"]}
    assert {h: c for h, c in stream_sizes.items()} == {
        h: c for h, (c, _) in clusters.items()
    }
    assert stream_keepers == {h: k for h, (_, k) in clusters.items()}


def test_quality_stream_matches_batch_p114_bit_for_bit(spark, split_docs_dir):
    """The ingest-time bigram-LM gate must reproduce batch bigram_xent
    EXACTLY on scored docs (the model ships the batch operator's own
    micro-int log-probs; per-doc sums are exact integers in both paths),
    and must stay TOTAL: sub-2-token docs pass through with NULL score."""
    from duckdb_cloudflare_spark.operators.text_analysis import (
        bigram_model,
        bigram_xent,
    )
    from duckdb_cloudflare_spark.streaming.documents import (
        quality_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    target = F.col("lang") == "en"
    pair_lp, ctx_lp, default_lp = bigram_model(docs, target)

    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(
        quality_stream(stream, pair_lp, ctx_lp, default_lp), "quality_out"
    )
    stream_scores = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_xent"])
        for r in got.select("doc_id", "n_bigrams", "bigram_xent").collect()
    }
    batch_scores = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_xent"])
        for r in bigram_xent(docs, target=target).collect()
    }
    # totality: every source doc came through the stream
    assert len(stream_scores) == docs.count()
    # bit-for-bit on every batch-scored doc
    for did, (n, x) in batch_scores.items():
        assert stream_scores[did] == (n, x), did
    # unscorable docs (if any) are NULL, not dropped / not fabricated
    for did, (n, x) in stream_scores.items():
        if did not in batch_scores:
            assert n is None and x is None


def test_quality_stream_whitespace_edges_bit_for_bit(spark, tmp_path):
    """The r13 advice fixture: the stream tokenizer must mirror Spark/Java
    semantics EXACTLY — a leading \\n yields an empty first token (F.trim
    strips only 0x20; Java split keeps the leading empty), U+00A0 does
    NOT split (Java \\s is the ASCII class), and a trailing \\t yields an
    empty last token (Spark split's limit=-1 keeps trailing empties)."""
    from duckdb_cloudflare_spark.operators.text_analysis import (
        bigram_model,
        bigram_xent,
    )
    from duckdb_cloudflare_spark.streaming.documents import (
        quality_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    rows = [
        (1, "\nalpha beta gamma", "en", "s", 16),
        (2, "alpha beta gamma\u00a0delta", "en", "s", 22),
        (3, "alpha beta\t", "en", "s", 11),
        (4, " plain alpha beta ", "en", "s", 18),
        (5, "\u00a0", "en", "s", 1),  # one NBSP "token" — sub-2, NULL score
    ]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    docs = spark.createDataFrame(rows, schema)
    docs.coalesce(1).write.parquet(str(tmp_path / "docs"))

    target = F.col("lang") == "en"
    pair_lp, ctx_lp, default_lp = bigram_model(docs, target)
    stream = read_document_stream(spark, str(tmp_path / "docs"))
    got = run_to_memory(
        quality_stream(stream, pair_lp, ctx_lp, default_lp), "quality_ws_out"
    )
    stream_scores = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_xent"])
        for r in got.select("doc_id", "n_bigrams", "bigram_xent").collect()
    }
    batch_scores = {
        r["doc_id"]: (r["n_bigrams"], r["bigram_xent"])
        for r in bigram_xent(docs, target=target).collect()
    }
    assert len(stream_scores) == len(rows)
    for did, (n, x) in batch_scores.items():
        assert stream_scores[did] == (n, x), did
    # doc 1: leading \n → empty first token → 3 bigrams not 2
    assert batch_scores[1][0] == 3
    # doc 2: NBSP does NOT split → 3 tokens → 2 bigrams
    assert batch_scores[2][0] == 2
    # doc 3: trailing \t → empty last token → 2 bigrams
    assert batch_scores[3][0] == 2
    # doc 5: single token in batch too → excluded there, NULL in stream
    assert 5 not in batch_scores
    assert stream_scores[5] == (None, None)


def test_mix_monitor_stream_totals_match_batch_plan(spark, split_docs_dir):
    """The per-source running token counts must equal mix_plan's
    tokens_available bit-for-bit once the whole corpus has streamed
    through (identical token expressions evaluated pre-fold), and
    progress_frac must be tokens_seen / target_tokens from the SAME
    plan the monitor was launched with."""
    from duckdb_cloudflare_spark.operators.curation import mix_plan
    from duckdb_cloudflare_spark.streaming.documents import (
        mix_monitor_stream,
        read_document_stream,
    )
    from duckdb_cloudflare_spark.streaming.events import run_to_memory

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = mix_plan(docs)
    plan_rows = {r["source"]: r for r in plan.collect()}

    stream = read_document_stream(spark, split_docs_dir)
    got = run_to_memory(mix_monitor_stream(stream, plan), "mix_monitor_out")
    # latest row per source = the final running state
    import pandas as pd

    pdf = got.toPandas()
    final = (
        pdf.groupby("source", as_index=False).last()
        if not pdf.empty
        else pdf
    )
    assert set(final["source"]) == set(plan_rows)
    for _, r in final.iterrows():
        p = plan_rows[r["source"]]
        assert r["tokens_seen"] == p["tokens_available"], r["source"]
        assert r["target_tokens"] == p["target_tokens"]
        assert r["progress_frac"] == r["tokens_seen"] / r["target_tokens"]
        # this corpus runs each source past its 50%-budget target
        assert bool(r["over_budget"]) == (r["tokens_seen"] > r["target_tokens"])
    # batch_tokens column sums to the full corpus total per source
    sums = pdf.groupby("source")["batch_tokens"].sum()
    for src, p in plan_rows.items():
        assert sums[src] == p["tokens_available"]
