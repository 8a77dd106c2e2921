"""Write-path helpers for training-data pipelines.

The reference exports with DuckDB's ``COPY TO`` (single process, single
file); at cluster scale the write problem inverts — thousands of tasks each
writing files, and the failure mode is millions of kilobyte-sized parquet
files (or a handful of 10 GB ones) that wreck downstream scan parallelism.
``write_sized_parquet`` targets a file size the way a warehouse would:
sample the average serialized row width, derive rows-per-file, and let
every task roll files at that row count via ``maxRecordsPerFile`` — no
global repartition, no driver-side collect of data.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame


def estimate_row_bytes(df: DataFrame, sample_rows: int = 2_000) -> float:
    """Average parquet-encoded bytes per row, measured by writing a bounded
    sample through pyarrow in memory (same encoding family as the real
    write: dictionary + snappy). Driver memory is bounded by
    ``sample_rows``; the sample is taken without a full scan via limit()."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pdf = df.limit(sample_rows).toPandas()
    if len(pdf) == 0:
        return 1.0
    buf = io.BytesIO()
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False), buf)
    return max(1.0, buf.tell() / len(pdf))


def write_sized_parquet(
    df: DataFrame,
    path: str,
    target_file_mb: int = 256,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    sample_rows: int = 2_000,
) -> int:
    """Write ``df`` as parquet files of roughly ``target_file_mb`` each.

    Uses ``maxRecordsPerFile`` (per-task file rolling — no extra shuffle)
    with rows-per-file derived from a measured average row width. Returns
    the rows-per-file used. With ``partition_by``, files roll within each
    partition directory the same way.

    At 100 TB this is the difference between a dataset that scans with
    full parallelism and one that doesn't: ~256 MB files match a default
    ``spark.sql.files.maxPartitionBytes`` so each file is one clean scan
    task, and no single task buffers more than one file's rows."""
    row_bytes = estimate_row_bytes(df, sample_rows)
    rows_per_file = max(1, int(target_file_mb * 1024 * 1024 / row_bytes))
    writer = df.write.mode(mode).option("maxRecordsPerFile", rows_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return rows_per_file


def write_epoch_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard",
    order_col: str = "pos_in_shard",
    mode: str = "overwrite",
) -> None:
    """Materialize an epoch-shuffle assignment (p43/p54's ``(shard,
    pos_in_shard)`` columns) into one directory per shard whose parquet
    rows are PHYSICALLY in training order — the layout a sequential
    training reader consumes with zero sorting at read time.

    One repartition on the shard column co-locates each shard in a single
    task, ``sortWithinPartitions`` orders rows inside it (a per-shard
    sort, bounded by shard size — the shard COUNT is the lever that keeps
    this in memory at 100 TB), and ``partitionBy`` writes the directory
    tree. Readers that must re-verify order still can: the order column is
    retained in the files.
    """
    (
        df.repartition(shard_col)
        .sortWithinPartitions(shard_col, order_col)
        .write.mode(mode)
        .partitionBy(shard_col)
        .parquet(path)
    )


def read_epoch_shard(spark, path: str, shard: int, shard_col: str = "shard"):
    """One shard of an epoch-shuffled dataset, in stored (training) order.
    Partition pruning keeps the scan to the one shard directory."""
    from pyspark.sql import functions as F

    # Typed predicate (ADVICE r5): a Column comparison instead of an
    # f-string, so a non-integer ``shard`` can't inject into the filter.
    return spark.read.parquet(path).filter(F.col(shard_col) == int(shard))


def write_hash_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    size_col: str | None = "n_chars",
    num_shards: int = 64,
    mode: str = "overwrite",
) -> "DataFrame":
    """Manifest-verified sharded export — the write path of
    ``operators/curation.py::shard_manifest`` (p103): documents land in
    the shard directory their md5 hash assigns (``shard_id =
    md5_60('shard:'||id) % num_shards``), and the returned manifest
    DataFrame carries the per-shard doc counts, byte totals, id ranges,
    and order-independent content fingerprints a consumer recomputes from
    the files to verify the export byte-for-byte. Because the fingerprint
    is a commutative sum, verification never depends on file order within
    a shard — 1000 parallel writers, one checksum.

    One repartition on the computed shard id co-locates each shard's rows
    (num_shards is the parallelism lever; md5 keys are uniform so shards
    balance), ``partitionBy`` writes the directory tree, and readers get
    partition pruning on ``shard_id`` for free."""
    from pyspark.sql import functions as F

    from duckdb_cloudflare_spark.operators.curation import shard_manifest
    from duckdb_cloudflare_spark.operators.sketches import _md5_int60

    shard = _md5_int60(F.col(id_col), "shard:") % F.lit(num_shards)
    (
        df.withColumn("shard_id", shard)
        .repartition("shard_id")
        .write.mode(mode)
        .partitionBy("shard_id")
        .parquet(path)
    )
    return shard_manifest(
        df, id_col=id_col, text_col=text_col, size_col=size_col,
        num_shards=num_shards,
    )
