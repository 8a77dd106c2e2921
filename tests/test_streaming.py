"""Structured Streaming tests: the streaming plans must agree with their
batch twins on the same (fully drained) data — availableNow triggers make
that an exact comparison, no timing games."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from duckdb_cloudflare_spark import streaming as S
from duckdb_cloudflare_spark.queries import load
from duckdb_cloudflare_spark.streaming.events import run_to_memory

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def batch_events(spark):
    return load(spark, SF_DIR, "events").cache()


def test_windowed_counts_match_batch(spark, batch_events):
    stream = S.read_event_stream(spark, SF_DIR)
    # complete mode: append would hold back the final windows (the
    # watermark never passes end-of-data), making an exact comparison
    # impossible; production use is append + watermark.
    got = run_to_memory(
        S.windowed_event_counts(stream, window="1 hour"), "win_counts", "complete"
    )
    expected = (
        batch_events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "total_value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))
    assert got.count() > 0


def test_dedup_stream_is_exact_on_drain(spark, batch_events):
    stream = S.read_event_stream(spark, SF_DIR)
    got = run_to_memory(S.dedup_stream(stream), "dedup_stream")
    assert got.count() == batch_events.select("event_id").distinct().count()


def test_session_windows_match_batch_session_window(spark, batch_events):
    stream = S.read_event_stream(spark, SF_DIR)
    got = run_to_memory(S.session_windows(stream, gap="10 minutes"), "sessions", "complete")
    expected = (
        batch_events.groupBy(F.session_window("ts", "10 minutes").alias("s"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "user_id",
            "n_events",
            "total_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expected.collect()))


def test_stateful_sessionize_totals(spark, batch_events):
    stream = S.read_event_stream(spark, SF_DIR)
    got = run_to_memory(S.sessionize_with_state(stream), "state_sessions", "update")
    # final per-user row (users may appear once per micro-batch; take last)
    final = (
        got.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"))
    )
    expected = batch_events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    assert sorted(map(tuple, final.collect())) == sorted(map(tuple, expected.collect()))


def test_interval_join_matches_batch(spark, batch_events):
    from duckdb_cloudflare_spark.streaming.events import interval_join_stream

    stream = S.read_event_stream(spark, SF_DIR)
    got = run_to_memory(
        interval_join_stream(stream, interval="60 minutes"), "interval_join"
    )

    e = batch_events
    left = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("l_user"),
        F.col("event_id").alias("left_id"),
        F.col("ts").alias("l_ts"),
        F.col("value").alias("left_value"),
    )
    right = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("r_user"),
        F.col("event_id").alias("right_id"),
        F.col("ts").alias("r_ts"),
    )
    want = left.join(
        right,
        F.expr("l_user = r_user AND r_ts BETWEEN l_ts - INTERVAL 60 minutes AND l_ts"),
    ).select(
        F.col("l_user").alias("user_id"),
        "left_id", "l_ts", "left_value", "right_id", "r_ts",
    )
    key = lambda rows: sorted(tuple(r) for r in rows)
    assert key(got.collect()) == key(want.collect())
    assert got.count() > 0  # the fixture data actually exercises the join


def test_transition_stream_matches_batch_q58_across_microbatches(
    spark, batch_events, tmp_path
):
    """Streaming transitions (state = last event per user) drained over
    one-file-at-a-time micro-batches must reproduce batch q58's transition
    counts exactly, INCLUDING the pairs that straddle the batch boundary.
    The split is by time (per-user arrival stays ordered — the operator's
    documented contract)."""
    from duckdb_cloudflare_spark.queries import all_queries

    src = str(tmp_path / "ev_split")
    # fixture sanity: the time split must cover every row (no null ts),
    # or the streaming side would lose rows the batch twin keeps
    assert batch_events.filter(F.col("ts").isNull()).count() == 0
    batch_events.filter(F.col("ts") < F.lit("2024-01-08")).coalesce(1).write.parquet(
        src + "/f1.parquet"
    )
    batch_events.filter(F.col("ts") >= F.lit("2024-01-08")).coalesce(1).write.parquet(
        src + "/f2.parquet"
    )
    schema = batch_events.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = run_to_memory(S.transition_stream(stream), "trans_stream")
    got_counts = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in got.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    # batch twin: the split covers every fixture row (asserted above), so
    # q58 on the original table IS the twin of the drained stream
    exp = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in all_queries()["q58_event_transitions"](spark, SF_DIR).collect()
    }
    assert got_counts == exp


def test_transition_stream_drops_late_rows_keeps_frontier(spark, tmp_path):
    """A row older than the stored frontier must be dropped (no retraction,
    no duplicate emission), and the frontier must survive it."""
    import datetime as dt

    import pandas as pd  # noqa: F401

    src = str(tmp_path / "ev_late")
    rows1 = [(1, dt.datetime(2024, 5, 1, 10), 7, "a", 0.0, "{}"),
             (2, dt.datetime(2024, 5, 1, 11), 7, "b", 0.0, "{}")]
    rows2 = [(3, dt.datetime(2024, 5, 1, 9), 7, "zz", 0.0, "{}"),   # late
             (4, dt.datetime(2024, 5, 1, 12), 7, "c", 0.0, "{}")]
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1.parquet")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = sorted(
        (r["from_type"], r["to_type"])
        for r in run_to_memory(S.transition_stream(stream), "trans_late").collect()
    )
    # a->b within batch 1; b->c across the boundary; the late 'zz' row is
    # dropped entirely (no zz transitions, no a->zz rewrite)
    assert got == [("a", "b"), ("b", "c")]


def test_dau_registers_stream_serves_batch_q59_bit_for_bit(
    spark, batch_events, tmp_path
):
    """The live register table (built-in streaming agg, state ≤ days×1024
    rows no matter the user count) drained across two micro-batches, then
    folded by the SAME derivation batch q59 uses, must equal the batch
    q59 output bit-for-bit — the mergeable-sketch serving contract: HLL
    inserts are max-merges, so micro-batch boundaries can never change
    the registers."""
    from duckdb_cloudflare_spark.queries import all_queries
    from duckdb_cloudflare_spark.queries.pipeline_r11 import (
        sliding_users_from_registers,
    )

    src = str(tmp_path / "ev_split_dau")
    assert batch_events.filter(F.col("ts").isNull()).count() == 0
    batch_events.filter(F.col("ts") < F.lit("2024-01-08")).coalesce(1).write.parquet(
        src + "/f1.parquet"
    )
    batch_events.filter(F.col("ts") >= F.lit("2024-01-08")).coalesce(1).write.parquet(
        src + "/f2.parquet"
    )
    stream = (
        spark.readStream.schema(batch_events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    # complete mode: the memory sink holds the CURRENT register table
    regs = run_to_memory(
        S.dau_registers_stream(stream), "dau_regs", output_mode="complete"
    )
    got = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in sliding_users_from_registers(regs).collect()
    }
    want = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in all_queries()["q59_sliding_distinct_users_hll"](
            spark, SF_DIR
        ).collect()
    }
    assert got == want and len(got) > 0


def test_dau_registers_stream_null_contract_matches_batch(spark, tmp_path):
    """Null user_id rows drop up front and null-ts events reach no
    calendar day — the batch q59 contract (pinned bit-exactly against the
    DuckDB twin in test_r11_ops) must hold through the STREAM too: drain
    a dirty two-file stream and fold; the estimates must equal batch q59
    over the same dirty data bit-for-bit."""
    from duckdb_cloudflare_spark.queries import all_queries
    from duckdb_cloudflare_spark.queries.pipeline_r11 import (
        sliding_users_from_registers,
    )

    ev = load(spark, SF_DIR, "events")
    dirty = ev.limit(40).selectExpr(
        "event_id + 1000000 AS event_id",
        "CAST(NULL AS TIMESTAMP) AS ts",
        "user_id", "event_type", "value", "props",
    ).unionByName(
        ev.limit(25).selectExpr(
            "event_id + 2000000 AS event_id", "ts",
            "CAST(NULL AS BIGINT) AS user_id", "event_type", "value", "props",
        )
    )
    src = str(tmp_path / "dirty_dau")
    ev.filter(F.col("ts") < F.lit("2024-01-08")).unionByName(dirty).coalesce(
        1
    ).write.parquet(src + "/f1.parquet")
    ev.filter(F.col("ts") >= F.lit("2024-01-08")).coalesce(1).write.parquet(
        src + "/f2.parquet"
    )
    batch_dir = str(tmp_path / "dirty_dau_batch")
    ev.unionByName(dirty).coalesce(1).write.parquet(
        batch_dir + "/events.parquet"
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    regs = run_to_memory(
        S.dau_registers_stream(stream), "dau_regs_dirty", output_mode="complete"
    )
    got = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in sliding_users_from_registers(regs).collect()
    }
    want = {
        r["day"]: (r["users_7d_hll"], r["users_1d_hll"])
        for r in all_queries()["q59_sliding_distinct_users_hll"](
            spark, batch_dir
        ).collect()
    }
    assert got == want and len(got) > 0


def test_anomaly_stream_matches_batch_q61_on_closed_hours(spark, tmp_path):
    """The stateful anomaly monitor drained over micro-batches (with a file
    boundary landing MID-hour, so the open-hour accumulator must carry
    partial counts across batches) reproduces batch q61 on every CLOSED
    hour; the final still-open hour is never scored."""
    import datetime as dt

    import duckdb_cloudflare_spark.queries as Qm
    from duckdb_cloudflare_spark.queries import all_queries

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(32):  # jittered baseline, spike at h=30, h=31 closes it
        n = 300 if h == 30 else (11 if h % 2 else 10)
        for i in range(n):
            rows.append(
                (eid, base + dt.timedelta(hours=h, seconds=i), 7, "click", 1.0, "{}")
            )
            eid += 1
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    # split MID-spike-hour: file 1 carries hours 0..29 + half the spike,
    # file 2 the rest of the spike + hour 31
    cut = next(
        i for i, r in enumerate(rows) if r[1] >= base + dt.timedelta(hours=30, seconds=150)
    )
    src = str(tmp_path / "ev_anom")
    spark.createDataFrame(rows[:cut], schema).coalesce(1).write.parquet(src + "/f1.parquet")
    spark.createDataFrame(rows[cut:], schema).coalesce(1).write.parquet(src + "/f2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    out_stream = S.anomaly_stream(stream)
    # twin-schema contract (ADVICE r12): hour is TIMESTAMP, exactly like
    # batch q61's date_trunc output — not NTZ
    assert out_stream.schema["hour"].dataType.typeName() == "timestamp"
    got = [
        (r["event_type"], r["hour"], r["n"], r["trailing_mean"], r["zscore"])
        for r in run_to_memory(out_stream, "anom_stream").collect()
    ]

    batch_df = spark.createDataFrame(rows, schema)
    key = "/t-anom-stream/events"
    Qm._TABLE_CACHE[key] = batch_df
    try:
        last_open = base + dt.timedelta(hours=31)
        expected = [
            (r["event_type"], r["hour"], r["n"], r["trailing_mean"], r["zscore"])
            for r in all_queries()["q61_event_anomaly"](spark, "/t-anom-stream").collect()
            if r["hour"] < last_open
        ]
    finally:
        Qm._TABLE_CACHE.pop(key, None)
    assert len(expected) == 1  # the planted spike
    assert got == expected  # bit-for-bit: same integer sums, same IEEE tree


def test_anomaly_stream_drops_late_hours_keeps_window(spark, tmp_path):
    """An hour arriving behind the open frontier is dropped (no rescore, no
    window corruption): the trailing window after the late row equals the
    in-order window."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    rows1 = [
        (i, base + dt.timedelta(hours=h), 1, "view", 0.0, "{}")
        for i, h in enumerate(range(3))
    ]
    rows2 = [
        (10, base + dt.timedelta(hours=0, minutes=30), 1, "view", 0.0, "{}"),  # late
        (11, base + dt.timedelta(hours=3), 1, "view", 0.0, "{}"),
    ]
    src = str(tmp_path / "ev_anom_late")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1.parquet")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    # too few hours for any score — the assertion is that the late row
    # neither crashes the state machine nor emits anything
    got = run_to_memory(S.anomaly_stream(stream), "anom_late").collect()
    assert got == []


def test_conversion_stream_matches_batch_q62_converted_set(spark, tmp_path):
    """Each converted user emits exactly once with the batch-identical
    (cohort_week, lag_us) — including the funnel split across a
    micro-batch boundary (signup in file 1, purchase in file 2) — and
    never-converting / purchase-before-signup users emit nothing."""
    import datetime as dt

    mon = dt.datetime(2024, 1, 1)  # a Monday
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    rows1 = [
        (0, mon + dt.timedelta(hours=1), 1, "signup", 0.0, "{}"),
        (1, mon + dt.timedelta(hours=1, seconds=100), 1, "purchase", 0.0, "{}"),
        (2, mon + dt.timedelta(hours=2), 2, "purchase", 0.0, "{}"),  # pre-signup
        (3, mon + dt.timedelta(hours=3), 2, "signup", 0.0, "{}"),
        (4, mon + dt.timedelta(days=8), 3, "signup", 0.0, "{}"),  # week 2
    ]
    rows2 = [
        (5, mon + dt.timedelta(days=8, seconds=250), 3, "purchase", 0.0, "{}"),
        (6, mon + dt.timedelta(hours=6), 4, "signup", 0.0, "{}"),  # never converts
        (7, mon + dt.timedelta(hours=1), 1, "view", 0.0, "{}"),  # non-funnel noise
    ]
    src = str(tmp_path / "ev_conv")
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(src + "/f1.parquet")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(src + "/f2.parquet")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/*")
    )
    got = sorted(
        (r["user_id"], r["cohort_week"], r["lag_us"])
        for r in run_to_memory(S.conversion_stream(stream), "conv_stream").collect()
    )
    assert got == [
        (1, mon, 100_000_000),
        (3, mon + dt.timedelta(days=7), 250_000_000),
    ]
