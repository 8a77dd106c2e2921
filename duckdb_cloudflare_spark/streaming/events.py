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
    TimestampType,
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


ANOMALY_OUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        # TimestampType, not NTZ: batch q61 emits TIMESTAMP (date_trunc
        # over the UTC-pinned ts), and the documented twins must share one
        # output schema (ADVICE r12). The pandas values below are
        # tz-localized UTC, so the stored instant is session-tz-proof.
        StructField("hour", TimestampType()),
        StructField("n", LongType()),
        StructField("trailing_mean", DoubleType()),
        StructField("zscore", DoubleType()),
    ]
)

# trailing window of CLOSED observed hours (parallel arrays, ≤24 entries,
# epoch-us hour keys) + the currently-OPEN hour's accumulator
ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("hours", StringType()),  # csv epoch-us (≤24, tiny)
        StructField("counts", StringType()),  # csv counts, parallel
        StructField("cur_hour", LongType()),
        StructField("cur_n", LongType()),
    ]
)

_HOUR_US = 3_600_000_000


def _anomaly_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-event_type anomaly monitor: accumulate the OPEN hour's count;
    when arrivals move past it the hour CLOSES — score it against the 24
    stored trailing closed hours (exact integer sums, the same IEEE tree
    as batch q61) and slide it into the window. State is ≤24 (hour, n)
    pairs + one accumulator per event_type — constant per key, regardless
    of stream length or event rate."""
    pdf = pd.concat(list(batches), ignore_index=True)
    hours_us = (pdf["ts"].astype("int64") // 1000 // _HOUR_US) * _HOUR_US
    per_hour = hours_us.value_counts().sort_index()

    if state.exists:
        h_csv, c_csv, cur_hour, cur_n = state.get
        hs = [int(x) for x in h_csv.split(",")] if h_csv else []
        cs = [int(x) for x in c_csv.split(",")] if c_csv else []
    else:
        hs, cs, cur_hour, cur_n = [], [], None, None

    out_hour, out_n, out_mu, out_z = [], [], [], []

    def close_hour(h, n):
        # score against the stored trailing window, then slide
        if len(hs) == 24:
            s = sum(cs)
            sq = sum(c * c for c in cs)
            var = (sq - s * s / 24.0) / 23.0
            mu = s / 24.0
            if var > 0:
                z = (n - mu) / (var**0.5)
                if abs(z) > 2.5:
                    out_hour.append(h)
                    out_n.append(n)
                    out_mu.append(mu)
                    out_z.append(z)
        hs.append(h)
        cs.append(n)
        if len(hs) > 24:
            hs.pop(0)
            cs.pop(0)

    for h, n in per_hour.items():
        h, n = int(h), int(n)
        if cur_hour is not None and h < cur_hour:
            continue  # late hour behind the open frontier — dropped (doc'd)
        if cur_hour is None:
            cur_hour, cur_n = h, 0
        if h == cur_hour:
            cur_n += n
            continue
        close_hour(cur_hour, cur_n)
        cur_hour, cur_n = h, n

    state.update(
        (
            ",".join(str(x) for x in hs),
            ",".join(str(x) for x in cs),
            cur_hour if cur_hour is None else int(cur_hour),
            cur_n if cur_n is None else int(cur_n),
        )
    )
    yield pd.DataFrame(
        {
            "event_type": [key[0]] * len(out_hour),
            "hour": pd.to_datetime(
                pd.Series(out_hour, dtype="int64"), unit="us", utc=True
            ),
            "n": pd.Series(out_n, dtype="int64"),
            "trailing_mean": pd.Series(out_mu, dtype="float64"),
            "zscore": pd.Series(out_z, dtype="float64"),
        }
    )


def anomaly_stream(stream: DataFrame) -> DataFrame:
    """Streaming twin of batch q61: trailing-24h z-score anomaly flags per
    event_type, emitted incrementally as hours CLOSE (an hour closes when
    a later-hour event for the same type arrives — the at-ingest ordering
    contract, same as transition_stream; replays/backfills should use the
    batch q61). The final, still-open hour is never scored: its count is
    not yet total — batch equivalence therefore holds over closed hours.

    Scale shape: state per event_type is ≤24 (hour, count) pairs + one
    open-hour accumulator — CONSTANT per key no matter the event rate, the
    register-bounded property that makes this the dashboard-serving form
    (the batch q61 re-folds all history every run). Emission matches batch
    q61 bit-for-bit on the z arithmetic: exact integer sums into the
    identical IEEE expression tree.

    NULL-ts rows are dropped up front (batch q61 filters them too)."""
    return (
        stream.filter(F.col("ts").isNotNull())
        .select("event_type", F.col("ts").cast("timestamp_ntz").alias("ts"))
        .groupBy("event_type")
        .applyInPandasWithState(
            _anomaly_fn,
            outputStructType=ANOMALY_OUT_SCHEMA,
            stateStructType=ANOMALY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


CONVERSION_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        # TimestampType for the same twin-schema reason as ANOMALY_OUT_SCHEMA:
        # batch q62's cohort_week is date_trunc('week', ts) = TIMESTAMP
        StructField("cohort_week", TimestampType()),
        StructField("lag_us", LongType()),
    ]
)

CONVERSION_STATE_SCHEMA = StructType(
    [
        StructField("signup_us", LongType()),
        StructField("purchase_us", LongType()),
        StructField("emitted", LongType()),  # 0/1 (no BooleanType in state)
    ]
)


def _week_floor_us(us: int) -> int:
    """Monday-0:00 floor of an epoch-us instant (UTC) — the date_trunc
    ('week') twin. 1970-01-01 was a Thursday: shift by 3 days so the
    epoch of the modulo lands on a Monday."""
    week_us = 7 * 24 * 3_600_000_000
    day3 = 3 * 24 * 3_600_000_000
    return ((us + day3) // week_us) * week_us - day3


def _conversion_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user funnel state: earliest signup + earliest purchase seen so
    far; the first batch where both exist with purchase >= signup emits
    the conversion ONCE (exactly-once by the emitted flag), after which
    the row is immutable (no retraction — late earlier purchases refine
    nothing, the at-ingest contract)."""
    pdf = pd.concat(list(batches), ignore_index=True)
    us = pdf["ts"].astype("int64") // 1000
    s_min = us[pdf["event_type"] == "signup"].min()
    p_min = us[pdf["event_type"] == "purchase"].min()

    if state.exists:
        signup_us, purchase_us, emitted = state.get
    else:
        signup_us = purchase_us = None
        emitted = 0

    if not pd.isna(s_min):
        signup_us = int(s_min) if signup_us is None else min(signup_us, int(s_min))
    if not pd.isna(p_min):
        purchase_us = (
            int(p_min) if purchase_us is None else min(purchase_us, int(p_min))
        )

    out = {"user_id": [], "cohort_week": [], "lag_us": []}
    if (
        not emitted
        and signup_us is not None
        and purchase_us is not None
        and purchase_us >= signup_us
    ):
        emitted = 1
        out["user_id"].append(key[0])
        out["cohort_week"].append(_week_floor_us(signup_us))
        out["lag_us"].append(purchase_us - signup_us)

    state.update((signup_us, purchase_us, int(emitted)))
    yield pd.DataFrame(
        {
            "user_id": pd.Series(out["user_id"], dtype="int64"),
            "cohort_week": pd.to_datetime(
                pd.Series(out["cohort_week"], dtype="int64"), unit="us", utc=True
            ),
            "lag_us": pd.Series(out["lag_us"], dtype="int64"),
        }
    )


def conversion_stream(stream: DataFrame) -> DataFrame:
    """Streaming twin of the q62/q63 funnel core: emits each user's
    signup→first-purchase conversion EXACTLY ONCE, as soon as both ends
    of the funnel have been seen (purchase at-or-after signup). Downstream
    cohort aggregation (count, rate, lag quantiles) is then a plain
    streaming aggregation over an append-only stream — no retractions.

    State is THREE longs per user (earliest signup, earliest purchase,
    emitted flag) — constant per key; with a ProcessingTimeTimeout in
    production, idle never-converting users are reclaimed. Under per-user
    time-ordered arrival the emitted (cohort_week, lag_us) match batch
    q62's converted rows exactly (pinned in test_streaming.py); late
    earlier rows after emission refine nothing (documented no-retraction,
    same contract as transition_stream).

    Only signup/purchase rows with NULL-free (user_id, ts) participate;
    other event types are filtered before the state operator so state
    updates touch exactly the funnel rows."""
    return (
        stream.filter(
            F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("event_type").isin("signup", "purchase")
        )
        .select(
            "user_id",
            F.col("ts").cast("timestamp_ntz").alias("ts"),
            "event_type",
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _conversion_fn,
            outputStructType=CONVERSION_OUT_SCHEMA,
            stateStructType=CONVERSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
