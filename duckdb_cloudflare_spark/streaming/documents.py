"""Streaming document pipeline: sequence packing as a custom stateful
operator.

The batch twin (queries p26) assigns each document a (seq_id, seq_off)
from its running char offset per source via a window cumsum. In streaming,
documents arrive incrementally, so the running offset must SURVIVE across
micro-batches: classic keyed state, expressed with
``applyInPandasWithState`` — the state is one long (the source's next
write offset), each batch folds its documents in arrival order and emits
their pack assignments.

Determinism contract: assignments depend on arrival order per source. When
the stream delivers documents in doc_id order (as the file source does for
ordered input files), the output is row-identical to the batch p26 plan —
pinned by tests/test_streaming_pack.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

PACK_STATE_SCHEMA = StructType([StructField("offset", LongType())])
PACK_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("seq_id", LongType()),
        StructField("seq_off", LongType()),
    ]
)


def read_document_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over document parquet files (one file per
    micro-batch; ``availableNow`` drains it for tests/backfills)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("pathGlobFilter", "*.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(path)
    )


def _make_pack_fn(budget: int):
    def pack_fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (offset,) = state.get if state.exists else (0,)
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("doc_id")  # arrival order within the batch
            lens = pdf["n_chars"].to_numpy()
            starts = offset + lens.cumsum() - lens
            offset = int(offset + lens.sum())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "source": key[0],
                    "seq_id": starts // budget,
                    "seq_off": starts % budget,
                }
            )
        state.update((offset,))

    return pack_fn


def pack_stream(stream: DataFrame, budget: int = 2048) -> DataFrame:
    """Streaming sequence packing: per-source running char offset carried
    in keyed state; each document gets (seq_id, seq_off) exactly as the
    batch window-cumsum plan assigns them. State is ONE long per source —
    bounded by the number of sources, not the stream length."""
    return (
        stream.select("doc_id", "source", "n_chars")
        .groupBy("source")
        .applyInPandasWithState(
            _make_pack_fn(budget),
            outputStructType=PACK_OUT_SCHEMA,
            stateStructType=PACK_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def decontaminate_stream(stream: DataFrame, benchmark: DataFrame) -> DataFrame:
    """Streaming decontamination: drop stream documents whose normalized-
    text fingerprint appears in a STATIC benchmark table — the stream-static
    anti-join shape (the static side is re-broadcast per micro-batch, so
    benchmark updates between restarts are picked up automatically).

    This is the arrival-time form of the batch decontamination pass (p25):
    run it on the ingest stream so contaminated documents never land in the
    corpus, instead of sweeping them after the fact. The static side carries
    only 16-byte fingerprints — broadcastable far beyond any realistic
    benchmark-suite size.
    """
    from duckdb_cloudflare_spark.operators.text_analysis import fingerprint

    fps = benchmark.select(fingerprint(F.col("text")).alias("fp")).distinct()
    marked = stream.withColumn("fp", fingerprint(F.col("text")))
    return marked.join(F.broadcast(fps), "fp", "left_anti").drop("fp")


def diff_stream(
    stream: DataFrame,
    old: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Streaming corpus-version diff: label each ARRIVING document of the
    new snapshot ``added`` / ``changed`` / ``unchanged`` against a STATIC
    prior snapshot — the arrival-time form of the batch ``corpus_diff``
    operator (p66), sharing its md5-fingerprint semantics.

    ``removed`` is deliberately absent: it is a statement about documents
    that never arrive, which no per-record stream operator can emit —
    compute it batch-side as ``corpus_diff(old, new_materialized)`` after
    the stream lands (documented contract, same reasoning as the batch
    operator's totality).

    Scale shape: the static side reduces to (id, 16-byte fingerprint) and
    joins per micro-batch; stream text never shuffles (the join key is the
    id, the fingerprint comparison is a projected column)."""
    def _fp(c):
        # the batch corpus_diff fingerprint verbatim (raw md5, no text
        # normalization) so stream and batch labels agree byte-for-byte
        return F.md5(F.coalesce(c, F.lit("")))

    old_fp = old.select(
        F.col(id_col).alias("__id"), _fp(F.col(text_col)).alias("__old_fp")
    )
    marked = stream.withColumn("__id", F.col(id_col)).withColumn(
        "__new_fp", _fp(F.col(text_col))
    )
    return (
        marked.join(old_fp, "__id", "left")
        .withColumn(
            "status",
            F.when(F.col("__old_fp").isNull(), F.lit("added"))
            .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
            .otherwise(F.lit("unchanged")),
        )
        .drop("__id", "__old_fp", "__new_fp")
    )


CHUNK_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("chunk_idx", LongType()),
        StructField("h", StringType()),
        StructField("is_dup", BooleanType()),
    ]
)

CHUNK_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _chunk_dedup_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values(["doc_id", "chunk_idx"])
    seen = state.exists
    dup = [True] * len(rows)
    if not seen:
        dup[0] = False  # first arrival of this digest is the keeper
        state.update((1,))
    rows = rows.assign(is_dup=dup)
    yield rows[["doc_id", "chunk_idx", "h", "is_dup"]]


def chunk_dedup_stream(stream: DataFrame, chunk_tokens: int = 20) -> DataFrame:
    """Streaming chunk-level first-occurrence dedup (batch twin: p44 /
    ``dedup.chunk_dedup_stats``): each document is chunked map-side into
    ``chunk_tokens``-token md5 digests; keyed state per DIGEST remembers
    whether it has ever been seen, so the first arrival (ordered by
    (doc_id, chunk_idx) inside a batch, by arrival across batches) is the
    keeper and every later copy — including copies in LATER micro-batches —
    is marked ``is_dup``. That cross-batch memory is exactly what a
    stateless per-batch dropDuplicates cannot give.

    Determinism contract (same as ``pack_stream``): when the stream delivers
    documents in doc_id order, output is row-identical to the batch plan.
    State is one long per DISTINCT chunk digest — the same corpus-lifetime
    dedup domain the batch operator scans; at scale, bound it by routing
    only recent-window digests through state (watermark + state TTL) or by
    periodic state snapshots to a static side."""
    from duckdb_cloudflare_spark.operators.dedup import chunk_digests

    chunks = chunk_digests(stream, chunk_tokens)
    return chunks.groupBy("h").applyInPandasWithState(
        _chunk_dedup_fn,
        outputStructType=CHUNK_OUT_SCHEMA,
        stateStructType=CHUNK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HLL_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("hll_estimate", DoubleType()),
        StructField("n_buckets_used", LongType()),
    ]
)

HLL_STATE_SCHEMA = StructType([StructField("regs", StringType())])


def _hll_fold_fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
    # state: the m HLL registers, serialized as a hex string (2 chars per
    # register — M_j ≤ 51 fits a byte). String state keeps the schema
    # trivially Arrow-safe across Spark versions.
    from duckdb_cloudflare_spark.operators.sketches import hll_finalize

    m = 1 << 10
    regs = bytearray(bytes.fromhex(state.get[0]) if state.exists else bytes(m))
    for pdf in pdfs:
        for b, r in zip(pdf["b"], pdf["rho"]):
            b, r = int(b), int(r)
            if r > regs[b]:
                regs[b] = r
    state.update((bytes(regs).hex(),))
    used = sum(1 for r in regs if r > 0)
    yield pd.DataFrame(
        {
            "source": [key[0]],
            "hll_estimate": [hll_finalize(list(regs))],
            "n_buckets_used": [used],
        }
    )


def hll_stream(stream: DataFrame, value_col: str = "text") -> DataFrame:
    """Streaming per-source distinct-token monitor: the HyperLogLog
    registers (operators/sketches.py — deterministic md5 hashes, m=1024)
    live in keyed state per source and fold every arriving micro-batch,
    APPENDING the current estimate after each batch — the ingest-health
    dashboard number ("how much vocabulary is this source still adding?")
    that an exact distinct could only produce by reshuffling all history.

    The (bucket, ρ) derivation is the batch operator's own expressions
    (hll_bucket_rho) evaluated map-side BEFORE the stateful fold, so the
    state update is a pure per-bucket max and the final estimates equal
    the batch hll_estimate values exactly (pinned in
    test_streaming_pack.py). State per source is m bytes (hex-encoded) —
    constant, never grows with the stream."""
    from duckdb_cloudflare_spark.operators.dedup import lowered_tokens
    from duckdb_cloudflare_spark.operators.sketches import hll_bucket_rho

    # the batch p79 tokenization VERBATIM (lowered_tokens), so stream and
    # batch estimates fold identical (bucket, ρ) pairs
    bucket, rho = hll_bucket_rho(F.col("tok"))
    exploded = (
        stream.select("source", F.explode(lowered_tokens(value_col)).alias("tok"))
        .select("source", bucket.alias("b"), rho.alias("rho"))
    )
    return exploded.groupBy("source").applyInPandasWithState(
        _hll_fold_fn,
        outputStructType=HLL_OUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        # append: each batch APPENDS one fresh estimate row per source (a
        # monitoring time series; the latest row per source is "current")
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


IMAGE_DEDUP_OUT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("dhash", LongType()),
        StructField("is_dup", BooleanType()),
    ]
)

IMAGE_DEDUP_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _image_dedup_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    rows = pd.concat(list(pdfs)).sort_values("doc_id")
    dup = [True] * len(rows)
    if not state.exists:
        dup[0] = False  # first arrival of this perceptual hash keeps
        state.update((1,))
    rows = rows.assign(is_dup=dup)
    yield rows[["doc_id", "dhash", "is_dup"]]


def image_dedup_stream(
    stream: DataFrame, asset_col: str = "asset", id_col: str = "doc_id"
) -> DataFrame:
    """Streaming perceptual image dedup (batch twin: p108 /
    ``multimodal.image_dhash_dedup``): each arriving image decodes
    map-side to its 64-bit dHash (one Arrow stage — the same single-decode
    contract as batch); keyed state per HASH remembers whether any
    brightness/format-variant of the image has ever been seen, so later
    copies — including copies in LATER micro-batches — are marked
    ``is_dup`` at ingest, before they reach storage. Undecodable blobs
    drop (NULL hash), the upstream error-as-row contract.

    Survivor-rule divergence from batch, documented: batch p108 elects the
    global MIN-id exemplar per cluster; at ingest the future minimum is
    unknowable, so the FIRST ARRIVAL keeps (doc_id-ordered within a
    micro-batch — delivery in doc_id order makes output identical to the
    batch keeper). Same contract as ``chunk_dedup_stream``. State is one
    long per distinct perceptual hash — bounded by distinct image CONTENT,
    not stream length; TTL/watermark routing applies at scale as with
    chunk state."""
    from pyspark.sql.functions import pandas_udf

    from duckdb_cloudflare_spark.operators.multimodal import image_dhash_bytes

    @pandas_udf(LongType())
    def dhash(blobs: pd.Series) -> pd.Series:
        return pd.Series(
            [image_dhash_bytes(b) for b in blobs], dtype="object"
        ).astype("Int64")

    hashed = stream.select(
        F.col(id_col).alias("doc_id"), dhash(F.col(asset_col)).alias("dhash")
    ).filter(F.col("dhash").isNotNull())
    return hashed.groupBy("dhash").applyInPandasWithState(
        _image_dedup_fn,
        outputStructType=IMAGE_DEDUP_OUT_SCHEMA,
        stateStructType=IMAGE_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def quality_stream(
    stream: DataFrame,
    pair_lp: "DataFrame",
    ctx_lp: "DataFrame",
    default_lp_micro: int,
    text_col: str = "text",
    n_buckets: int = 256,
    round_dp: int = 6,
) -> DataFrame:
    """Streaming twin of batch p114 (``bigram_xent``): score ARRIVING
    documents against a pre-trained bigram LM — the CCNet gate applied
    at ingest, so off-domain documents are tagged (or dropped
    downstream) before they land in the corpus, instead of swept after.

    The model tables come from ``bigram_model`` and are BOUNDED BY
    CONSTRUCTION at B² + B rows (B=256 → ≤65,792), so collecting them
    to the driver here is the same bounded-by-contract collect as the
    ANN query side (similarity.py) — never corpus-scale. Scoring is
    then MAP-ONLY per micro-batch (an Arrow-batched pandas stage): no
    stream-side state, no shuffle, no watermark needed; model updates
    are picked up by restarting the query with a re-fit model
    (documented contract — the static-side-rebroadcast shape of
    decontaminate_stream does not apply because per-doc scoring is an
    aggregation over the doc's OWN bigrams, not a row-level join).

    Equality contract (pinned in tests/test_streaming_pack.py): the
    emitted (n_bigrams, bigram_xent) are BIT-FOR-BIT equal to batch
    ``bigram_xent`` on the same documents — the model ships the SAME
    micro-int log-probs the batch operator derives, per-doc sums are
    exact integer arithmetic in both paths, and the final division is
    the same two exact-integer doubles. Documents with fewer than two
    tokens (which the batch operator excludes) pass through with NULL
    score columns — an ingest stream must stay total."""
    import hashlib
    import re as _re

    pairs = {
        (r["h1"], r["h2"]): r["lp_micro"] for r in pair_lp.collect()
    }
    ctx = {r["h1"]: r["lp0_micro"] for r in ctx_lp.collect()}
    micro = float(10**round_dp)

    def _score(pdfs):
        for pdf in pdfs:
            n_out, x_out = [], []
            for text in pdf[text_col]:
                # mirror batch tokens() EXACTLY (the bit-for-bit contract):
                # F.trim strips only 0x20 → strip(' '); Java regex \s is the
                # ASCII class [ \t\n\x0B\f\r] (U+00A0 etc. do NOT split) and
                # Spark's split(limit=-1) keeps leading AND trailing empty
                # tokens — Python re.split keeps both too, so no filtering
                t = (text or "").strip(" ")
                toks = _re.split(r"[ \t\n\x0b\f\r]+", t) if t else []
                if len(toks) < 2:
                    n_out.append(None)
                    x_out.append(None)
                    continue
                bk = [
                    int(
                        hashlib.md5(w.lower().encode("utf-8")).hexdigest()[:8],
                        16,
                    )
                    % n_buckets
                    for w in toks
                ]
                s = 0
                for a, b in zip(bk, bk[1:]):
                    lp = pairs.get((a, b))
                    if lp is None:
                        lp = ctx.get(a, default_lp_micro)
                    s += lp
                n = len(bk) - 1
                n_out.append(n)
                x_out.append(-float(s) / (float(n) * micro))
            out = pdf.copy()
            out["n_bigrams"] = pd.Series(n_out, dtype="object")
            out["bigram_xent"] = pd.Series(x_out, dtype="object")
            yield out

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields
    )
    return stream.mapInPandas(
        _score, schema=f"{schema}, n_bigrams long, bigram_xent double"
    )


MIX_OUT_SCHEMA = StructType(
    [
        StructField("source", StringType()),
        StructField("batch_tokens", LongType()),
        StructField("tokens_seen", LongType()),
        StructField("target_tokens", LongType()),
        StructField("progress_frac", DoubleType()),
        StructField("over_budget", BooleanType()),
    ]
)

MIX_STATE_SCHEMA = StructType([StructField("seen", LongType())])


def _mix_monitor_fn(targets: dict):
    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        seen = state.get[0] if state.exists else 0
        batch = 0
        for pdf in pdfs:
            batch += int(pdf["n_tok"].sum())
        seen += batch
        state.update((seen,))
        tgt = targets.get(key[0])
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "batch_tokens": [batch],
                "tokens_seen": [seen],
                "target_tokens": [tgt],
                "progress_frac": [
                    (seen / tgt) if tgt else None
                ],
                "over_budget": [bool(tgt is not None and seen > tgt)],
            }
        )

    return fn


def mix_monitor_stream(stream: DataFrame, plan: DataFrame) -> DataFrame:
    """Streaming twin of the p118 mixture plan: as documents arrive, fold
    each source's running TOKEN count in keyed state and append its
    progress against the plan's ``target_tokens`` — the ingest dashboard
    that says which sources have filled their budget (stop sampling) and
    which still need data, without re-scanning landed data. Sources
    absent from the plan report NULL target/progress (monitored, not
    budgeted — they still count tokens).

    The plan side is ≤|sources| rows BY CONSTRUCTION (``mix_plan``
    collapses the corpus before anything leaves the fold), so collecting
    it here is the bounded-by-contract collect (the quality_stream /
    ANN-query precedent). Token counting is the batch operator's exact
    semantics (whitespace split of trimmed text; blank → 0), evaluated
    with Spark expressions BEFORE the stateful fold, so the stream's
    final per-source totals equal mix_plan's ``tokens_available``
    bit-for-bit (pinned in test_streaming_pack.py). State per source is
    ONE long — constant at any stream length."""
    from duckdb_cloudflare_spark.operators.dedup import lowered_tokens

    targets = {
        r["source"]: int(r["target_tokens"]) for r in plan.collect()
    }
    n_tok = F.when(
        F.length(F.trim(F.col("text"))) == 0, F.lit(0)
    ).otherwise(F.size(lowered_tokens("text"))).cast("long")
    counted = stream.filter(F.col("text").isNotNull()).select(
        "source", n_tok.alias("n_tok")
    )
    return counted.groupBy("source").applyInPandasWithState(
        _mix_monitor_fn(targets),
        outputStructType=MIX_OUT_SCHEMA,
        stateStructType=MIX_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
