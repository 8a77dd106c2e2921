"""Window-function surface (SURVEY §2B: ROW_NUMBER/RANK/DENSE_RANK, LEAD/LAG,
FIRST/LAST, running aggregates, ROWS/RANGE frames — reference evidence at
test/sql/internet_archive_fast_latest.test:80-90 which uses LEAD(timestamp) OVER ()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from duckdb_cloudflare_spark.queries import load, register


@register(
    "q40_ranking",
    oracle="""
    SELECT c_custkey, c_nationkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    description="row_number / rank / dense_rank / ntile over a partitioned ordered window",
)
def q40_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q41_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           lag(o_orderdate)  OVER w                       AS prev_date,
           lead(o_orderdate) OVER w                       AS next_date,
           round(lead(o_totalprice, 2, -1.0) OVER w, 4)   AS price_in_2,
           CAST(date_diff('day', lag(o_orderdate) OVER w, o_orderdate) AS BIGINT) AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="LEAD/LAG with offsets and defaults + date arithmetic across rows "
    "(the reference's fast_latest test uses LEAD over timestamps)",
)
def q41_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev_date.alias("prev_date"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.round(F.lead("o_totalprice", 2, -1.0).over(w), 4).alias("price_in_2"),
        F.datediff(F.col("o_orderdate"), prev_date).cast("bigint").alias("days_since_prev"),
    )


@register(
    "q42_running_rows_frame",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_qty,
           round(avg(l_extendedprice) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                                            ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING), 4)    AS smoothed_price,
           count(*) OVER (PARTITION BY l_orderkey)                                           AS n_lines
    FROM lineitem
    WHERE l_orderkey % 50 = 0
    """,
    description="running SUM (unbounded preceding) + sliding AVG (rows frame) + partition count",
)
def q42_running_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 50 == 0)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).alias(
            "running_qty"
        ),
        F.round(F.avg("l_extendedprice").over(w.rowsBetween(-1, 1)), 4).alias("smoothed_price"),
        F.count(F.lit(1)).over(Window.partitionBy("l_orderkey")).alias("n_lines"),
    )


@register(
    "q43_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_similar_price
    FROM orders
    WHERE o_custkey % 10 = 0
    """,
    description="RANGE frame over a numeric ordering (value-based window)",
)
def q43_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 1000)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.count(F.lit(1)).over(w).alias("n_similar_price"),
    )


@register(
    "q44_first_last_value",
    oracle="""
    SELECT o_custkey, o_orderkey,
           first_value(o_orderdate) OVER w AS first_order_date,
           last_value(o_orderdate)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_order_date,
           nth_value(o_orderdate, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_order_date
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    description="FIRST_VALUE / LAST_VALUE / NTH_VALUE with full-partition frames",
)
def q44_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(wfull).alias("last_order_date"),
        F.nth_value("o_orderdate", 2).over(wfull).alias("second_order_date"),
    )


@register(
    "q45_window_dedup_latest",
    oracle="""
    SELECT user_id, event_id, ts, event_type
    FROM (
        SELECT user_id, event_id, ts, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    description="latest-row-per-key (the reference's fastLatest=true TopN pattern, "
    "internet_archive.cpp:1331-1412, expressed as a window dedup)",
)
def q45_window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "ts", "event_type")
    )


@register(
    "q46_cumulative_share",
    oracle="""
    SELECT l_returnflag, l_linestatus, round(grp_rev, 4) AS revenue,
           round(grp_rev / sum(grp_rev) OVER (), 6)      AS revenue_share,
           percent_rank() OVER (ORDER BY grp_rev) AS pct_rank,
           cume_dist() OVER (ORDER BY grp_rev)    AS cdist
    FROM (
        SELECT l_returnflag, l_linestatus,
               sum(l_extendedprice * (1 - l_discount)) AS grp_rev
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    """,
    description="aggregate → unpartitioned window (share-of-total, percent_rank, cume_dist)",
)
def q46_cumulative_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    grp = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("grp_rev")
    )
    w_all = Window.partitionBy()
    w_ord = Window.orderBy("grp_rev")
    return grp.select(
        "l_returnflag",
        "l_linestatus",
        F.round("grp_rev", 4).alias("revenue"),
        F.round(F.col("grp_rev") / F.sum("grp_rev").over(w_all), 6).alias("revenue_share"),
        F.percent_rank().over(w_ord).alias("pct_rank"),
        F.cume_dist().over(w_ord).alias("cdist"),
    )


@register(
    "q47_sessionize_batch",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 10 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ), numbered AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events, round(sum(value), 4) AS total_value
    FROM numbered
    GROUP BY user_id, session_id
    """,
    description="batch sessionization via gaps-and-islands (lag + running sum of "
    "session-break markers) — 10-minute inactivity gap; the batch twin of "
    "streaming.session_windows",
)
def q47_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    prev = F.lag("ts").over(w)
    # microsecond-exact gap comparison: casting to long would truncate
    # sub-second precision and disagree with the oracle's INTERVAL compare
    gap_us = F.unix_micros("ts") - F.unix_micros(prev)
    new_session = F.when(prev.isNull() | (gap_us > 600 * 1_000_000), 1).otherwise(0)
    marked = e.withColumn("new_session", new_session)
    numbered = marked.withColumn("session_id", F.sum("new_session").over(run))
    return numbered.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


@register(
    "q48_percent_rank_cume",
    oracle="""
    SELECT c_custkey, c_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    description="percent_rank and cume_dist distribution window functions. "
    "Deliberately UNROUNDED: both are single exact-integer divisions "
    "((r-1)/(n-1), k/n), so the doubles are bit-identical across engines — "
    "while round(x, 6) diverges exactly when a value lands on the half "
    "(Spark HALF_UP vs DuckDB HALF_EVEN; bit at sf0.1 where 205/3200 hits "
    "0.0640625).",
)
def q48_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "q49_asof_join",
    oracle="""
    WITH clicks AS (
        SELECT user_id, ts, max(event_id) AS click_id
        FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), purchases AS (
        SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, round(p.value, 4) AS value,
           c.ts AS click_ts, c.click_id
    FROM purchases p
    ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
    description="as-of join: each purchase matched to the user's most recent "
    "click at-or-before it (DuckDB native ASOF JOIN as the oracle). Spark has "
    "no ASOF operator, so it is composed as union + per-user window "
    "last-carry-forward: ONE shuffle on user_id, no range-condition join "
    "explosion — the composition the engine would use at 100 TB. Clicks are "
    "deduped to one per (user_id, ts) (max event_id) so ties are "
    "deterministic on both engines.",
)
def q49_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # No pre-dedup aggregation and no union: one conditional scan tags each
    # row's side, and the LOCF window orders by (ts, side, event_id) so the
    # carried-forward "last click" at any purchase row is automatically the
    # max-event_id click of the newest ts ≤ purchase ts — identical to the
    # oracle's groupBy-max + ASOF, with one pass over events and one
    # shuffle (the window's hash(user_id)) instead of two scans + two
    # shuffles.
    is_click = F.col("event_type") == "click"
    both = e.filter(is_click | (F.col("event_type") == "purchase")).select(
        "user_id", "ts",
        F.when(is_click, 0).otherwise(1).alias("side"),
        F.when(~is_click, F.col("event_id")).alias("event_id"),
        F.when(~is_click, F.col("value")).alias("value"),
        F.when(
            is_click,
            F.struct(
                F.col("ts").alias("click_ts"), F.col("event_id").alias("click_id")
            ),
        ).alias("click"),
        F.col("event_id").alias("order_id"),
    )
    # clicks sort BEFORE purchases at equal ts (side 0 < 1) → `c.ts <= p.ts`
    # inclusive semantics; last(ignorenulls) carries the newest click forward
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", "order_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        both.withColumn("last_click", F.last("click", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            "event_id", "user_id", "ts",
            F.round("value", 4).alias("value"),
            F.col("last_click.click_ts").alias("click_ts"),
            F.col("last_click.click_id").alias("click_id"),
        )
    )


@register(
    "q50_range_join_bucketed",
    oracle="""
    SELECT e.event_id, e.ts, count(c.event_id) AS n_clicks
    FROM events e LEFT JOIN events c
      ON c.event_type = 'click'
     AND c.ts BETWEEN e.ts - INTERVAL 60 SECOND AND e.ts
    WHERE e.event_type = 'error'
    GROUP BY e.event_id, e.ts
    """,
    description="pure range join (no equi key): clicks in the 60 s window "
    "before each error. DuckDB runs its IEJoin; Spark would fall back to a "
    "broadcast-nested-loop, so the plan buckets time into window-width "
    "epochs and equi-joins on the bucket — an error's window spans at most "
    "2 buckets (exploded), each click lives in exactly 1, so every match "
    "joins exactly once and the shuffle is an ordinary hash join that "
    "scales; the exact BETWEEN runs as a residual filter.",
)
def q50_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    W_US = 60_000_000  # 60 s in microseconds == the bucket width
    e = load(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        "event_id", "ts", F.unix_micros("ts").alias("ts_us")
    )
    clk = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.unix_micros("ts").alias("cts_us"),
        (F.unix_micros("ts") / W_US).cast("long").alias("b"),
    )
    err_b = err.withColumn(
        "b",
        F.explode(
            F.array_distinct(
                F.array(
                    ((F.col("ts_us") - W_US) / W_US).cast("long"),
                    (F.col("ts_us") / W_US).cast("long"),
                )
            )
        ),
    )
    # LEFT-join the candidates so an error whose buckets match nothing (or
    # only out-of-range clicks) still contributes its 1-2 bucket rows, then
    # count ONLY the in-range matches conditionally — zero-click errors fall
    # out of the same aggregation with n_clicks=0, no reattach join needed.
    in_range = F.col("cts_us").between(F.col("ts_us") - W_US, F.col("ts_us"))
    return (
        err_b.join(clk, "b", "left")
        .groupBy("event_id", "ts")
        .agg(F.count(F.when(in_range, F.col("cid"))).alias("n_clicks"))
    )
