"""r11 pipeline operators — the at-scale APPROXIMATE twins of the events
distinct-agg family (VERDICT r10 item 2).

q56/q57/q58/q28 are the only headline rows DuckDB still wins at every
single-node scale: a single-process perfect-hash COUNT(DISTINCT) beats
Spark's partial-agg shuffles whenever the data fits one machine. The
plans are already the scalable shape, but the 100 TB story wants the
approximate path whose cost is REGISTER-bounded, not user-bounded:

- q59: trailing-7-day distinct active users via HyperLogLog register
  MERGE. The exact q56 carries per-user day-set state through a
  user-keyed shuffle (state ∝ active users); q59's only corpus-sized
  operation is ONE (day, bucket)-keyed partial agg whose output is
  ≤ days × 1024 rows REGARDLESS of user count — the sliding union then
  happens at register granularity (HLL registers merge by per-bucket
  max, Flajolet et al. '07 §4), so a 10-billion-user day costs exactly
  what a 10-thousand-user day costs downstream of the map side.
- q60: day-0..13 retention-cohort matrix with HLL cells. Cohort
  assignment (min first-seen day per user) is irreducibly user-keyed,
  but the cell counts become mergeable sketches: a (cohort, offset,
  bucket, M) table max-merges across independent partial scans or daily
  ingest increments without re-deduplicating user history — the
  incremental-maintenance form a 100 TB events store actually serves
  dashboards from.

Both are rows-only registry entries BY DESIGN (the q31→p79 precedent,
VERDICT r10 item 2): their exact oracle-bearing anchors are q56/q57
themselves, accuracy is pinned by pytest against those anchors at the
HLL error bound, and cross-engine determinism is pinned by a DuckDB twin
of the register derivation in tests/test_r11_ops.py (the estimates are
md5-deterministic, so the pin is bit-exact). Keeping them out of the
driver window preserves the r11 rotation (queries/__init__ note).

q59's streaming twin lives in streaming/events.py::dau_registers_stream:
the live register table is maintained by a BUILT-IN streaming
aggregation (HLL inserts are max-merges), and dashboards fold estimates
on read via ``sliding_users_from_registers`` below — the identical code
path this batch query runs, so served numbers equal a from-scratch
recompute bit-for-bit (pinned across micro-batch boundaries in
test_streaming.py).

Measured crossover (PERF.md r11): at 100M events / 1.5M users, q59 runs
8.7 s where exact q56 takes 51.2 s in Spark and 20.4 s in DuckDB — the
first row in this family where the Spark side wins the like-for-like
single-node absolute; the same derivation in DuckDB SQL beats DuckDB's
exact 6.6×, so the win is the algorithm, not the engine. At 1B events /
15M users the whole single-node trade inverts: Spark's exact q56
finishes in 153 s where DuckDB's exact formulation exceeds a 900 s cap,
and the register twin is the only sub-minute path in any engine
(DuckDB twin SQL 25.7 s; Spark q59 ties Spark's exact there because
~1B JVM md5 casts dominate the map side — the deliberate cross-engine
determinism contract — while the structural advantage lives in the
shuffle: registers vs 15M day-set rows).

Reference parity note: the reference engine exposes approx_count_distinct
through DuckDB's native HLL (duckdb/src/core_functions/aggregate/distributive
/approx_count.cpp); these twins are the Spark-first re-expression with a
deterministic hash so results are reproducible across engines and runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from duckdb_cloudflare_spark.operators.sketches import (
    hll_bucket_rho,
    hll_estimate_expr,
    hll_fold_registers,
    hll_register_agg_exprs,
)
from duckdb_cloudflare_spark.queries import load, register

# One deterministic user hash shared by both twins: bucket/ρ derive from
# the DECIMAL string of user_id under the p79 md5 scheme, so any engine
# (and the pytest DuckDB twin) rebuilds identical registers.
_LOG2M = 10


def _user_bucket_rho():
    return hll_bucket_rho(F.col("user_id").cast("string"), _LOG2M)


@register(
    "q59_sliding_distinct_users_hll",
    oracle=None,  # rows-only BY DESIGN: exact anchor is q56 (see module doc)
    description="Trailing-7-day and same-day distinct active users per "
    "day, estimated by deterministic HyperLogLog register merge — the "
    "at-scale twin of q56 (its exact oracle-bearing anchor). Events fold "
    "map-side into per-(day, bucket) registers (ONE corpus-sized partial "
    "agg, output ≤ days × 1024 rows no matter the user count); each "
    "day's registers then serve the 7 windows that cover it via a "
    "register-level explode + per-bucket max — the union-through-merge "
    "property exact distinct counting fundamentally lacks. Estimates "
    "use the p79 integer-exact fold (md5 60-bit hashes, m=1024, "
    "linear-counting small-range branch), so they are bit-identical "
    "across engines/runs; accuracy vs q56 is within the HLL bound "
    "(σ ≈ 1.04/√1024 ≈ 3.25%), pinned by pytest. Columns: day, "
    "users_7d_hll, users_1d_hll.",
)
def q59_sliding_distinct_users_hll(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    # ONE linear pipeline, ONE events scan, no joins (this Spark build
    # never fires ReuseExchange on shared DataFrame subtrees — measured —
    # so a d1/d7 branch-and-join would re-scan events per branch):
    #   events →(map)→ (day, bucket, ρ)
    #     →(shuffle 1: the ONLY corpus-sized one, map-side combined to
    #       ≤1024 rows/day/task)→ per-day registers
    #     →(register-level derivation, see sliding_users_from_registers)
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    bucket, rho = _user_bucket_rho()
    regs1d = (
        e.select(F.to_date("ts").alias("day"), bucket.alias("b"), rho.alias("rho"))
        .groupBy("day", "b")
        .agg(F.max("rho").alias("M"))
    )
    return sliding_users_from_registers(regs1d)


def sliding_users_from_registers(
    regs1d: DataFrame, window_days: int = 7
) -> DataFrame:
    """q59's register→estimate derivation, public so the STREAMING
    register maintainer (streaming/events.py::dau_registers_stream, whose
    state IS this (day, b, M) table) serves the identical dashboard query
    by construction — batch and stream fold the same registers through
    the same arithmetic, so estimates match bit-for-bit (pinned in
    test_streaming.py). ``window_days`` generalizes the trailing window
    (7 = the q59/WAU contract; 28/30 give MAU-style rollups from the SAME
    register table — no rescan, the point of keeping registers).

    Shape (everything register-bounded — the input is ≤ days×1024 rows):
    explode each day's registers to the ≤window_days windows it serves →
    per-(window, bucket) max (M7; the own-day row rides along as M1) →
    fused double fold → both estimates. Unobserved window days (calendar
    gaps) drop via used1 = 0 — the q56 observed-days contract without a
    day-list join."""
    if window_days < 2:
        # the same-day estimate is ALWAYS emitted as users_1d_hll; a
        # 1-day trailing window would duplicate that column (and value)
        raise ValueError(
            "window_days must be >= 2 (the 1-day estimate is every "
            "result's users_1d_hll column)"
        )
    covered = regs1d.select(
        F.explode(
            F.sequence(F.col("day"), F.date_add("day", window_days - 1))
        ).alias("wday"),
        "day",
        "b",
        "M",
    )
    regs = covered.groupBy("wday", "b").agg(
        F.max("M").alias("M7"),
        # (day, b) is unique upstream, so the own-day M survives intact
        F.max(F.when(F.col("wday") == F.col("day"), F.col("M"))).alias("M1"),
    )
    s7, u7 = hll_register_agg_exprs("M7", _LOG2M)
    s1, u1 = hll_register_agg_exprs("M1", _LOG2M)
    folded = regs.groupBy("wday").agg(
        s7.alias("s7"), u7.alias("u7"), s1.alias("s1"), u1.alias("u1")
    )
    return folded.filter(F.col("u1") > 0).select(
        F.col("wday").alias("day"),
        hll_estimate_expr(F.col("s7"), F.col("u7"), _LOG2M).alias(
            f"users_{window_days}d_hll"
        ),
        hll_estimate_expr(F.col("s1"), F.col("u1"), _LOG2M).alias(
            "users_1d_hll"
        ),
    )


@register(
    "q60_retention_cohorts_hll",
    oracle=None,  # rows-only BY DESIGN: exact anchor is q57 (see module doc)
    description="Day-0..13 retention-cohort matrix with HyperLogLog cell "
    "estimates — the mergeable-sketch twin of q57 (its exact "
    "oracle-bearing anchor). Cohort assignment keeps q57's proven shape "
    "(ONE user-keyed agg collecting the calendar-bounded day set; cohort "
    "and offsets derive map-side), but each (cohort, offset) cell "
    "accumulates an HLL register set over user hashes instead of a "
    "count, so the published matrix is a (cohort, offset, bucket, M) "
    "table that max-MERGES across daily ingest increments and "
    "independent partial scans without ever re-deduplicating user "
    "history — the incremental form an events store serves dashboards "
    "from at 100 TB. Deterministic md5 hashing (p79 fold), estimates "
    "bit-identical across engines; accuracy vs q57 pinned by pytest. "
    "Columns: cohort_day, offset_days, n_users_hll.",
)
def q60_retention_cohorts_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    per = e.groupBy("user_id").agg(
        F.collect_set(F.to_date("ts")).alias("days")
    )
    cohort = F.array_min("days")
    offs = F.filter(
        F.transform("days", lambda d: F.datediff(d, cohort)),
        lambda o: (o >= 0) & (o <= 13),
    )
    bucket, rho = _user_bucket_rho()
    # md5 bucket/ρ land in a Project BELOW the Generate (computed once per
    # USER row); selecting them alongside the explode would re-evaluate
    # the hash on every exploded offset row — up to 14× the md5 work
    # (A/B at 100M events: 14.3 → 13.4 s, values identical)
    pre = per.select(
        cohort.alias("cohort_day"),
        bucket.alias("b"),
        rho.alias("rho"),
        offs.alias("offs"),
    )
    cells = (
        pre.select("cohort_day", "b", "rho", F.explode("offs").alias("o"))
        .groupBy(
            "cohort_day", F.col("o").cast("long").alias("offset_days"), "b"
        )
        .agg(F.max("rho").alias("M"))
    )
    return hll_fold_registers(cells, ["cohort_day", "offset_days"], _LOG2M).select(
        "cohort_day",
        "offset_days",
        F.col("hll_estimate").alias("n_users_hll"),
    )
