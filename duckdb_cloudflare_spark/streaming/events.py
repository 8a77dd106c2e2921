"""Streaming event analytics: file-source stream over the events table,
watermarked windowed aggregation, streaming dedup, session windows, and a
custom stateful operator via ``applyInPandasWithState``.

Scale design:
- Watermarks bound state: every stateful operator here declares one, so
  state store size is (keys within watermark horizon), not (all keys ever).
- ``windowed_event_counts`` is the canonical incremental aggregation —
  partial aggregation per micro-batch, state keyed by (window, event_type).
- ``sessionize_with_state`` keys state by user_id; with GroupStateTimeout
  the state for idle users is reclaimed. At 100 TB/day this is the pattern
  that keeps a 1000-executor streaming job's state bounded.
- All sources are exactly-once replayable (file source tracks processed
  files; checkpointLocation persists offsets + state).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

def _event_schema(ts_type) -> StructType:
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )


def read_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet (one-file-at-a-time
    micro-batches with ``maxFilesPerTrigger``; ``availableNow`` triggers
    drain it for tests). The ts normalization mirrors the batch loader
    (queries.load) so streaming and batch plans see identical schemas —
    both the TIMESTAMP(NANOS) layout (read as long) and the timestamp[us]
    NTZ layout are handled."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Same UTC pin as the batch loader (queries.load): the NTZ→TimestampType
    # cast reads the session zone at execution time, so a non-UTC caller
    # session would shift instants and break batch/streaming equivalence.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ts_type = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    raw = (
        spark.readStream.schema(_event_schema(ts_type))
        .option("pathGlobFilter", "events.parquet")
        .option("maxFilesPerTrigger", "1")
        .parquet(sf_dir)
    )
    if isinstance(ts_type, LongType):
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling/sliding window counts+sums per event_type —
    the streaming twin of the batch q28_time_bucket query."""
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id within the watermark horizon —
    state stores only ids newer than the watermark (bounded), the streaming
    member of the dedup family in ``operators.dedup``."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dau_registers_stream(stream: DataFrame) -> DataFrame:
    """Streaming maintainer of the per-(day, bucket) HyperLogLog register
    table — the live half of the q59 DAU/WAU twin, and the operator that
    demonstrates WHY the register form wins at scale: the stream folds
    each arriving event into a per-bucket max (a built-in streaming
    aggregation — no custom state function needed, HLL inserts ARE
    max-merges), so state is ≤ days × 1024 tiny rows REGARDLESS of user
    count, and the sliding 1-/7-day estimates fold ON READ from that
    table via ``queries.pipeline_r11.sliding_users_from_registers`` —
    the exact code path batch q59 runs, so dashboard numbers served from
    the live register table equal a from-scratch batch recompute
    bit-for-bit (pinned in test_streaming.py). An exact distinct-user
    window would instead keep every (day, user) pair in state and
    reshuffle history on every merge.

    Null user_id rows are dropped up front (batch q59's own contract).
    No watermark: register rows are per calendar day and never retract,
    so the aggregation state is calendar-bounded, not event-bounded; run
    it in update mode (or complete, for small calendars / memory sinks).
    The (bucket, ρ) derivation is hll_bucket_rho over the DECIMAL string
    of user_id — the batch twin's expressions verbatim."""
    from duckdb_cloudflare_spark.operators.sketches import hll_bucket_rho

    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    return (
        stream.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), bucket.alias("b"), rho.alias("rho"))
        .groupBy("day", "b")
        .agg(F.max("rho").alias("M"))
    )


def session_windows(
    stream: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Declarative sessionization: built-in ``session_window`` with a gap —
    state merges adjacent windows per user and closes them at watermark."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )


SESSION_STATE_SCHEMA = StructType(
    [StructField("n_events", LongType()), StructField("total_value", DoubleType())]
)
SESSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _make_session_fn(timeout_ms: int):
    def _session_fn(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-user running (count, sum): the minimal custom stateful
        operator shape — read state, fold the batch, write state, emit an
        updated row; on timeout, flush and reclaim the state."""
        if state.hasTimedOut:
            (n, total) = state.get if state.exists else (0, 0.0)
            state.remove()
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )
            return
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, round(total, 6)))
        if timeout_ms:
            state.setTimeoutDuration(timeout_ms)
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return _session_fn


def sessionize_with_state(stream: DataFrame, timeout_ms: int = 0) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: running
    per-user aggregates. With ``timeout_ms`` > 0 a processing-time timeout
    reclaims idle users' state (the bounded-state production shape) — but
    note an ``availableNow`` drain never terminates while timeouts are
    pending, so tests/backfills use the default no-timeout mode."""
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )
    return stream.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(timeout_ms),
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=conf,
    )


def interval_join_stream(
    stream: DataFrame,
    left_type: str = "purchase",
    right_type: str = "click",
    interval: str = "60 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream time-interval join: every ``left_type`` event paired
    with the same user's ``right_type`` events in the preceding ``interval``
    — the streaming twin of the batch as-of/range joins (q49/q50). Both
    sides carry watermarks and the join condition bounds event time on both
    ends, so Spark derives a state-retention horizon and evicts buffered
    rows past the watermark: state stays bounded no matter how long the
    stream runs (a self-join of one source stream is fine — each side
    filters its own copy)."""
    left = (
        stream.filter(F.col("event_type") == left_type)
        .select(
            F.col("user_id").alias("l_user"),
            F.col("event_id").alias("left_id"),
            F.col("ts").alias("l_ts"),
            F.col("value").alias("left_value"),
        )
        .withWatermark("l_ts", watermark)
    )
    right = (
        stream.filter(F.col("event_type") == right_type)
        .select(
            F.col("user_id").alias("r_user"),
            F.col("event_id").alias("right_id"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", watermark)
    )
    return left.join(
        right,
        F.expr(
            f"l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL {interval} AND l_ts"
        ),
    ).select(
        F.col("l_user").alias("user_id"),
        "left_id", "l_ts", "left_value", "right_id", "r_ts",
    )


def run_to_memory(
    stream_df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Drain an availableNow trigger into an in-memory table and return the
    result as a batch DataFrame (test/dev harness)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


TRANSITION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
    ]
)
# state: the last event seen per user, as (epoch NANOSECONDS, event_id,
# type) — a long because state columns want flat scalar codecs. Nanos, not
# micros: the value written is pandas datetime64[ns].astype('int64'); only
# ordering is ever consumed, but anyone comparing this against an event-time
# watermark or a micros-based timeout must divide by 1000 first (ADVICE r10).
TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_ns", LongType()),
        StructField("last_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _transition_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user transition emitter: chain the stored last event in front of
    the batch's (ts, event_id)-sorted rows, emit one (from, to) row per
    consecutive pair, store the new last event. Rows at or before the
    stored last event are dropped as LATE (the bounded-state norm: a
    transition already emitted is never retracted); within a micro-batch
    ordering is exact, across micro-batches arrival is assumed
    time-ordered per user (the at-ingest contract; replays/backfills
    should use the batch q58 instead)."""
    pdf = pd.concat(list(batches), ignore_index=True)
    pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
    ns = (pdf["ts"].astype("int64")).tolist()  # epoch ns → monotone key
    ids = pdf["event_id"].tolist()
    types = pdf["event_type"].tolist()
    if state.exists:
        last_ns, last_id, last_type = state.get
    else:
        last_ns = last_id = None
        last_type = None
    froms, tos = [], []
    for n, i, t in zip(ns, ids, types):
        if last_ns is not None and (n, i) <= (last_ns, last_id):
            continue  # late row — already behind the emitted frontier
        if last_type is not None:
            froms.append(last_type)
            tos.append(t)
        last_ns, last_id, last_type = n, i, t
    if last_ns is not None:
        state.update((int(last_ns), int(last_id), last_type))
    yield pd.DataFrame(
        {
            "user_id": [key[0]] * len(froms),
            "from_type": froms,
            "to_type": tos,
        }
    )


def transition_stream(stream: DataFrame) -> DataFrame:
    """Streaming twin of batch q58: per-user first-order event transitions
    emitted incrementally (append mode — each transition exactly once, so
    any downstream count is a plain streaming aggregation). State is ONE
    row per user (the last seen event), the minimum possible for
    consecutive-pair semantics — bounded by the user population, not the
    stream length; add a ProcessingTimeTimeout in production to reclaim
    idle users (omitted here: availableNow drains never terminate with
    pending timeouts, the sessionize_with_state note).

    NULL-ts rows are dropped up front (a documented divergence from batch
    q58, which orders them NULLS LAST): "after everything" has no meaning
    against future arrivals — keeping such a row would either wedge the
    frontier or emit unordered pairs; pandas would also sort NaT last
    while its int64 frontier key reads as int64-min, silently disagreeing
    (r10 code-review find).

    NULL-event_id rows are dropped for the same class of reason (a second
    documented divergence from batch q58, whose NULLS-LAST ordering
    tolerates them): pandas promotes a null into the int64 event_id column
    as NaN (int64→float64), making the (ts, id) frontier tuple comparison
    unreliable and int(last_id) raise — killing the streaming query
    (ADVICE r10)."""
    return (
        stream.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_id").isNotNull()
        )
        .select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transition_fn,
            outputStructType=TRANSITION_OUT_SCHEMA,
            stateStructType=TRANSITION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
