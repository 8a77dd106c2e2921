"""Scale-out primitives: skew salting and bucketed co-located joins.

These are the two knobs the 100 TB plan reaches for when the default
shuffle strategy degrades:

- **Salting** spreads one hot key over N shuffle partitions. AQE's skew-join
  handling (on by default in ``session.get_spark``) covers sort-merge joins
  automatically; explicit salting is for aggregations with a dominant key
  and for broadcast-ineligible joins where AQE can't split (e.g. a hot key
  on BOTH sides).
- **Bucketing** pre-shuffles a table once at write time so every subsequent
  equi-join/aggregation on the bucket key runs with ZERO exchanges — the
  reference's "pushdown once, reuse forever" philosophy applied to layout.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation for skewed group keys: stage 1 aggregates on
    (key, random salt) — the hot key's rows spread over ``salt_buckets``
    partial groups — stage 2 merges partials on the bare key.

    ``aggs`` maps column → 'sum' | 'count' | 'min' | 'max' (the decomposable
    aggregates; avg = sum/count at the call site). Spark's partial
    aggregation already does map-side combine, but with a single dominant
    key ALL its partials still land in one reduce partition — the salt is
    what splits that final hotspot.
    """
    salted = df.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    stage1_exprs = []
    for col, how in aggs.items():
        if how == "count":
            stage1_exprs.append(F.count(col).alias(f"_{col}_partial"))
        else:
            stage1_exprs.append(getattr(F, how)(col).alias(f"_{col}_partial"))
    stage1 = salted.groupBy(*key_cols, "_salt").agg(*stage1_exprs)
    merge_exprs = []
    for col, how in aggs.items():
        merger = "sum" if how in ("count", "sum") else how
        merge_exprs.append(getattr(F, merger)(f"_{col}_partial").alias(f"{col}_{how}"))
    return stage1.groupBy(*key_cols).agg(*merge_exprs)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (large, skewed) left side with a random
    bucket, EXPLODE the right side once per bucket, join on (key, salt).

    The hot key's left rows spread across ``salt_buckets`` partitions; the
    right side is replicated ``salt_buckets``× (choose the smaller side as
    ``right``). This is the classic fallback when AQE skew-join can't help:
    both sides skewed, or a non-sort-merge plan.
    """
    l = left.withColumn("_salt", (F.rand(seed=42) * salt_buckets).cast("int"))
    r = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = l.join(r, on=[key, "_salt"], how=how).drop("_salt")
    return out


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table: one
    shuffle now, zero exchanges for every future equi-join / groupBy on the
    bucket key (and no sort for sort-merge joins when ``sort``)."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a location left by a previous session is invisible to this session's
    # in-memory catalog but still blocks saveAsTable — clear the orphan
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = f"{warehouse.removeprefix('file:')}/{table.split('.')[-1]}"
    shutil.rmtree(loc, ignore_errors=True)
    w = df.write.mode("overwrite").bucketBy(num_buckets, bucket_key)
    if sort:
        w = w.sortBy(bucket_key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — Catalyst sees the
    matching hash-distribution from the bucket spec and plans a sort-merge
    join with NO exchange on either side (verify with plans.shuffle_count)."""
    return spark.table(left_table).join(spark.table(right_table), on=key, how=how)


def _spread_bits16(x: Column) -> Column:
    """Spread a 16-bit value's bits into the even positions of a 32-bit
    word (magic-number interleave — the standard Morton-code construction,
    public-domain bit-twiddling). Pure bitwise/shift expressions, so both
    Spark codegen and any SQL engine compute it identically."""
    x = x.bitwiseAND(F.lit(0xFFFF))
    x = (x.bitwiseOR(F.shiftleft(x, 8))).bitwiseAND(F.lit(0x00FF00FF))
    x = (x.bitwiseOR(F.shiftleft(x, 4))).bitwiseAND(F.lit(0x0F0F0F0F))
    x = (x.bitwiseOR(F.shiftleft(x, 2))).bitwiseAND(F.lit(0x33333333))
    x = (x.bitwiseOR(F.shiftleft(x, 1))).bitwiseAND(F.lit(0x55555555))
    return x


def morton_key(a: Column, b: Column) -> Column:
    """Z-order (Morton) key interleaving two 16-bit dimension values —
    the multi-dimensional DATA LAYOUT primitive: sorting/range-partitioning
    by this key co-locates rows that are close in BOTH dimensions, so
    min/max file statistics prune scans for predicates on either column
    (the technique behind Delta/Iceberg Z-ORDER clustering). Inputs are
    masked to 16 bits; callers bucket real values into [0, 65535] first."""
    return _spread_bits16(a).bitwiseOR(F.shiftleft(_spread_bits16(b), 1))


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = 10) -> DataFrame:
    """The DIAGNOSTIC that drives the two knobs above: per-key frequency
    profile of a prospective join/aggregation key. Returns the ``top_n``
    heaviest keys with

    - ``cnt``: rows carrying the key,
    - ``share``: cnt / total rows (rounded 6 dp),
    - ``ratio_to_avg``: cnt / (total / n_distinct_keys) — the skew factor;
      a key with ratio_to_avg ≫ 1 is the one that makes a hash-partitioned
      shuffle straggle, and the threshold at which ``salted_aggregate`` /
      ``salted_join`` (or AQE skew-join) pays for itself,
    - ``rnk``: dense position by (cnt DESC, key) — deterministic under ties.

    Scale shape: one partial-aggregated groupBy (corpus → key-cardinality
    rows), a 1-row global-stats broadcast, then distributed top-k
    (orderBy + limit = TakeOrdered, no single-partition window over the
    full key set) and a window over only the ``top_n`` survivors."""
    from pyspark.sql import Window
    from pyspark.sql.functions import broadcast

    key = F.col(key_col)
    cnt = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = cnt.orderBy(F.col("cnt").desc(), F.col("key")).limit(top_n)
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    return (
        top.crossJoin(broadcast(tot))
        .select(
            F.row_number().over(w).cast("bigint").alias("rnk"),
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("total_rows"), 6).alias("share"),
            # cast FIRST: cnt * n_keys as long*long silently overflows
            # int64 at the corpus scale this profiler targets (cnt ~1e10,
            # n_keys ~1e9) — ADVICE r8
            F.round(
                F.col("cnt").cast("double") * F.col("n_keys") / F.col("total_rows"),
                6,
            ).alias("ratio_to_avg"),
        )
    )
