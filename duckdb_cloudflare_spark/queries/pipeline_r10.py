"""r10 pipeline operators — the round-10 additions, every one
oracle-bearing:

- p91: MinHash ESTIMATED Jaccard over LSH-candidate pairs — the triage
  stage between p73 (signatures) and p34 (exact verification): banding
  proposes, the signature-agreement estimate ranks, only survivors hit
  the quadratic exact verifier (Broder '97 / MMDS ch.3).
- p92: per-source exact length-distribution report (discrete p50/p90/p99
  by integer-exact rank) — the table a curation run publishes before
  setting C4/Gopher length gates.
- q56: trailing-7-day distinct-user activity over the events stream —
  the sliding-window COUNT(DISTINCT) Spark windows can't express
  directly, recast as a map-side day explode + one distinct agg.

Conventions as ever: md5-for-oracle hashing (p19/p43/p57 trade), integer
ranks instead of floating ⌈q·n⌉, unrounded exact divisions (q48 rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators import dedup as D
from duckdb_cloudflare_spark.operators import text_analysis as T
from duckdb_cloudflare_spark.queries import load, register

_TOKS_CTE = r"""
    toks AS (
        SELECT doc_id,
               list_transform(string_split_regex(trim(text), '\s+'),
                              x -> lower(x)) AS ts
        FROM documents
    )
"""


@register(
    "p91_minhash_est_jaccard",
    oracle=rf"""
    WITH {_TOKS_CTE},
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                   i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))) AS s
        FROM toks WHERE len(ts) >= 3
    ), sig AS (
        SELECT doc_id,
               min(('0x' || substr(md5('0:' || s), 1, 15))::BIGINT) AS s0,
               min(('0x' || substr(md5('1:' || s), 1, 15))::BIGINT) AS s1,
               min(('0x' || substr(md5('2:' || s), 1, 15))::BIGINT) AS s2,
               min(('0x' || substr(md5('3:' || s), 1, 15))::BIGINT) AS s3,
               min(('0x' || substr(md5('4:' || s), 1, 15))::BIGINT) AS s4,
               min(('0x' || substr(md5('5:' || s), 1, 15))::BIGINT) AS s5,
               min(('0x' || substr(md5('6:' || s), 1, 15))::BIGINT) AS s6,
               min(('0x' || substr(md5('7:' || s), 1, 15))::BIGINT) AS s7
        FROM sh GROUP BY doc_id
    ), banded AS (
        SELECT doc_id, s0, s1, s2, s3, s4, s5, s6, s7, band_idx,
               CASE band_idx
                   WHEN 0 THEN md5(s0 || ',' || s1)
                   WHEN 1 THEN md5(s2 || ',' || s3)
                   WHEN 2 THEN md5(s4 || ',' || s5)
                   ELSE md5(s6 || ',' || s7)
               END AS band_key
        FROM sig, (SELECT unnest(range(4)) AS band_idx)
    ), pairs AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST((a.s0 = b.s0)::INT + (a.s1 = b.s1)::INT
                  + (a.s2 = b.s2)::INT + (a.s3 = b.s3)::INT
                  + (a.s4 = b.s4)::INT + (a.s5 = b.s5)::INT
                  + (a.s6 = b.s6)::INT + (a.s7 = b.s7)::INT AS BIGINT)
                   AS n_agree
        FROM banded a JOIN banded b
          ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, n_agree,
           CAST(n_agree AS DOUBLE) / 8.0 AS est_jaccard
    FROM pairs
    """,
    description="MinHash estimated Jaccard for every LSH-candidate pair — "
    "the triage stage between p73 signatures and p34 exact verification: "
    "pairs sharing a band bucket get the signature-agreement estimate "
    "agree/k (Broder '97). operators/dedup.py::minhash_est_jaccard_pairs. "
    "Deterministic: p73's md5 permutation scheme, integer agreement "
    "count, one exact division by k=8 (power of two — exact in binary). "
    "Scale shape: p73's one-explode/one-partial-agg signature plan, 4 "
    "map-side band rows per doc, ONE (band_idx, band_key) equi-shuffle "
    "self-join — bucket-bounded, never all-pairs — and a pair-keyed "
    "partial-agg collapse; signature arrays ride the join rows so no "
    "re-join against the signature table.",
)
def p91_minhash_est_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.minhash_est_jaccard_pairs(d, k=8, shingle_k=3, bands=4)


@register(
    "p93_shingle_df_histogram",
    oracle=rf"""
    WITH {_TOKS_CTE},
    sh AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(range(1, len(ts) - 1),
                   i -> hash(ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])))) AS s
        FROM toks WHERE len(ts) >= 3
    ), freq AS (
        SELECT s, count(*) AS df FROM sh GROUP BY s
    )
    SELECT CAST(length(bin(df)) - 1 AS INT) AS log2_df,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(df) AS BIGINT) AS n_instances,
           CAST(sum(df * (df - 1) // 2) AS BIGINT) AS pair_pressure
    FROM freq GROUP BY 1
    """,
    description="Doc-frequency histogram of word-3-shingles in log2 "
    "buckets — the profiling report that SIZES the r10 max_doc_freq "
    "stop-shingle cap and predicts the exact pair engines' fan-out: "
    "distinct shingles, exploded instances, and pair pressure "
    "df*(df-1)/2 per bucket. operators/dedup.py::shingle_df_histogram. "
    "NOTE the oracle buckets by doc frequency, which is HASH-FREE math "
    "(DuckDB's hash() differs from xxhash64, but df counts per DISTINCT "
    "shingle are hash-independent absent collisions — the same parity "
    "argument p34 makes). Determinism: all-integer; floor(log2) via bit "
    "length (length(bin(df))-1 / conv base-2), never floating log, "
    "which drifts at exact powers of two. Scale shape: one shingle "
    "explode -> one shingle-keyed partial agg -> one <=40-row bucket "
    "agg; linear, no joins, no pairs materialized; bucket sums "
    "decimal-accumulated (p90 overflow rule).",
)
def p93_shingle_df_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return D.shingle_df_histogram(d, k=3)


@register(
    "p92_length_report",
    oracle="""
    WITH r AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
               count(*) OVER (PARTITION BY source) AS n
        FROM documents
        WHERE n_chars IS NOT NULL AND source IS NOT NULL
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(n_chars) AS min_chars,
           min(CASE WHEN rn = (n * 50 + 99) // 100 THEN n_chars END)
               AS p50_chars,
           min(CASE WHEN rn = (n * 90 + 99) // 100 THEN n_chars END)
               AS p90_chars,
           min(CASE WHEN rn = (n * 99 + 99) // 100 THEN n_chars END)
               AS p99_chars,
           max(n_chars) AS max_chars,
           CAST(sum(n_chars) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               AS mean_chars
    FROM r GROUP BY source
    """,
    description="Per-source exact length-distribution report — n, min, "
    "discrete p50/p90/p99, max, unrounded mean — the table that sizes "
    "C4/Gopher length gates before anyone sets them. operators/"
    "text_analysis.py::length_report. Determinism: quantile rank is "
    "1-based ceil(q*n) computed in INTEGER arithmetic ((n*P + 99) div "
    "100), never floating 0.9*n (inexact binary; DuckDB's decimal "
    "literal and Spark's double diverge at exact multiples). Scale "
    "shape: one partition-keyed sort window (per-GROUP sorts, not "
    "global) + one partial-agg fold; the approx_percentile swap-in is "
    "documented for the many-group regime.",
)
def p92_length_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    return T.length_report(d, len_col="n_chars", group_col="source")


@register(
    "q56_sliding_distinct_users",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        WHERE user_id IS NOT NULL
    ), days AS (SELECT DISTINCT day FROM du)
    SELECT d.day AS day,
           CAST(count(DISTINCT u.user_id) AS BIGINT) AS users_7d,
           CAST(count(DISTINCT CASE WHEN u.day = d.day THEN u.user_id END)
                AS BIGINT) AS users_1d
    FROM days d JOIN du u
      ON u.day <= d.day AND u.day >= d.day - INTERVAL 6 DAY
    GROUP BY d.day
    """,
    description="Trailing-7-day distinct active users per day over the "
    "events stream — the DAU/WAU-style sliding COUNT(DISTINCT) that Spark "
    "window frames cannot express (no DISTINCT aggregates over RANGE "
    "frames). Recast Spark-side as: dedup to (day, user) pairs (one "
    "shuffle), EXPLODE each pair to the 7 target days it covers "
    "(map-side, fixed 7x on the deduped pairs — not on raw events), "
    "inner-join to observed days (broadcast — day cardinality is tiny), "
    "then ONE distinct agg keyed by day. The window never materializes "
    "per-day user sets; memory is bounded by the distinct agg's "
    "partial-dedup. Cross-engine determinism: all-integer counts, DATE "
    "keys (events.ts normalized by queries.load()).",
)
def q56_sliding_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    du = (
        e.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    covered = du.select(
        F.explode(F.sequence(F.col("day"), F.date_add("day", 6))).alias("day_t"),
        F.col("day").alias("day_src"),
        "user_id",
    )
    return (
        covered.join(
            F.broadcast(days.withColumnRenamed("day", "day_t")), "day_t"
        )
        .groupBy(F.col("day_t").alias("day"))
        .agg(
            F.countDistinct("user_id").alias("users_7d"),
            F.countDistinct(
                F.when(F.col("day_src") == F.col("day_t"), F.col("user_id"))
            ).alias("users_1d"),
        )
    )


@register(
    "q57_retention_cohorts",
    oracle="""
    WITH du AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
        WHERE user_id IS NOT NULL
    ), c AS (
        SELECT user_id, min(day) AS cohort_day FROM du GROUP BY user_id
    )
    SELECT c.cohort_day AS cohort_day,
           CAST(date_diff('day', c.cohort_day, du.day) AS BIGINT)
               AS offset_days,
           CAST(count(DISTINCT du.user_id) AS BIGINT) AS n_users
    FROM du JOIN c ON du.user_id = c.user_id
    WHERE date_diff('day', c.cohort_day, du.day) BETWEEN 0 AND 13
    GROUP BY 1, 2
    """,
    description="Day-0..13 retention-cohort matrix over the events "
    "stream: users grouped by first-seen day, distinct actives per "
    "(cohort, day-offset) cell — the standard cohort-retention table "
    "(offset 0 = cohort size by construction). Spark-side: dedup to "
    "(day, user) (one shuffle), min-day per user on the SAME user key "
    "(partial agg, no extra exchange class), a user-keyed equi-join of "
    "two co-partitioned derivatives of the same table, then one "
    "(cohort, offset)-keyed distinct agg. All-integer output; DATE "
    "cohort keys via queries.load()'s normalized events.ts.",
)
def q57_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    du = (
        e.filter(F.col("user_id").isNotNull())
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    cohort = du.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    offset = F.datediff(F.col("day"), F.col("cohort_day"))
    return (
        du.join(cohort, "user_id")
        .select("cohort_day", offset.alias("offset_days"), "user_id")
        .filter((F.col("offset_days") >= 0) & (F.col("offset_days") <= 13))
        .groupBy("cohort_day", F.col("offset_days").cast("long").alias("offset_days"))
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
