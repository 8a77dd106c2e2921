"""write_sized_parquet: file-size-targeted parquet output."""

from __future__ import annotations

import glob

from duckdb_cloudflare_spark.sources.write import estimate_row_bytes, write_sized_parquet


def test_row_width_estimate_positive(spark):
    df = spark.range(100).selectExpr("id", "repeat('x', 100) AS payload")
    w = estimate_row_bytes(df)
    assert w > 0


def test_files_roll_at_target_size(spark, tmp_path):
    # ~1 KB rows, 0.05 MB target → rows_per_file small → multiple files
    df = spark.range(2_000, numPartitions=2).selectExpr(
        "id", "repeat(uuid(), 20) AS payload"
    )
    out = str(tmp_path / "sized")
    rpf = write_sized_parquet(df, out, target_file_mb=1, sample_rows=500)
    files = glob.glob(out + "/*.parquet")
    assert rpf >= 1
    # each task rolls files at rows_per_file: with 2000 rows the writer
    # must produce at least ceil(2000 / rpf) files (tasks may add more)
    assert len(files) >= max(1, 2000 // max(rpf, 1))
    back = spark.read.parquet(out)
    assert back.count() == 2_000


def test_partitioned_write_rolls_within_partitions(spark, tmp_path):
    df = spark.range(1_000).selectExpr(
        "id", "CAST(id % 3 AS STRING) AS part", "repeat('y', 200) AS payload"
    )
    out = str(tmp_path / "parts")
    write_sized_parquet(df, out, target_file_mb=1, partition_by=["part"])
    assert sorted(
        p.rsplit("=", 1)[-1] for p in glob.glob(out + "/part=*")
    ) == ["0", "1", "2"]
    assert spark.read.parquet(out).count() == 1_000


def test_empty_frame(spark, tmp_path):
    df = spark.range(0).selectExpr("id")
    out = str(tmp_path / "empty")
    write_sized_parquet(df, out, target_file_mb=1)
    assert spark.read.parquet(out).count() == 0


class TestEpochShards:
    def test_roundtrip_order_and_pruning(self, spark, tmp_path):
        from duckdb_cloudflare_spark import queries as Q
        from duckdb_cloudflare_spark.sources.write import (
            read_epoch_shard,
            write_epoch_shards,
        )

        assigned = Q.all_queries()["p43_epoch_shuffle"](
            spark, "/root/testdata/sf0.001"
        )
        out = str(tmp_path / "epoch7")
        write_epoch_shards(assigned, out)

        expected = {tuple(r) for r in assigned.collect()}
        got = set()
        shards = sorted(r["shard"] for r in assigned.select("shard").distinct().collect())
        for s in shards:
            # read WITHOUT re-sorting: file order must already be training
            # order (the whole point of the writer's per-shard sort)
            rows = read_epoch_shard(spark, out, s).collect()
            positions = [r["pos_in_shard"] for r in rows]
            assert positions == sorted(positions), f"shard {s} not in stored order"
            got.update((r["doc_id"], r["shard"], r["pos_in_shard"]) for r in rows)
        assert got == expected and len(got) > 0

    def test_shard_read_prunes_partitions(self, spark, tmp_path):
        from duckdb_cloudflare_spark import queries as Q
        from duckdb_cloudflare_spark.sources.write import (
            read_epoch_shard,
            write_epoch_shards,
        )

        assigned = Q.all_queries()["p43_epoch_shuffle"](
            spark, "/root/testdata/sf0.001"
        )
        out = str(tmp_path / "epoch7b")
        write_epoch_shards(assigned, out)
        df = read_epoch_shard(spark, out, 3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # The filter must land in PartitionFilters (directory pruning), not
        # as a post-scan Filter — and DataFilters must stay empty, so the
        # scan reads ONLY shard=3's directory.
        import re

        m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
        assert m and "shard" in m.group(1) and "= 3" in m.group(1), plan
        dm = re.search(r"DataFilters: \[([^\]]*)\]", plan)
        assert dm is not None and dm.group(1).strip() == "", plan
        assert all(r["shard"] == 3 for r in df.collect())


def test_write_hash_shards_manifest_verifies_on_disk_content(spark, tmp_path):
    """The returned manifest must be recomputable from the written files:
    re-reading each shard directory and re-deriving (n_docs, fingerprint)
    with shard_manifest reproduces the manifest row-for-row — the
    consumer-side verification protocol the export publishes it for."""
    from pyspark.sql import functions as F

    from duckdb_cloudflare_spark.operators.curation import shard_manifest
    from duckdb_cloudflare_spark.sources.write import write_hash_shards

    df = spark.createDataFrame(
        [(i, f"document body {i}", 14 + (i % 5)) for i in range(300)],
        "doc_id long, text string, n_chars long",
    )
    out = str(tmp_path / "shards")
    manifest = {
        r["shard_id"]: r for r in write_hash_shards(df, out, num_shards=8).collect()
    }
    back = spark.read.parquet(out)
    # every doc landed in the shard its hash assigns (partition column
    # round-trips) and the manifest matches a from-files recompute
    recomputed = {
        r["shard_id"]: r
        for r in shard_manifest(back, num_shards=8).collect()
    }
    assert manifest.keys() == recomputed.keys()
    for k, m in manifest.items():
        r = recomputed[k]
        assert (m["n_docs"], m["n_chars"], m["fingerprint"]) == (
            r["n_docs"], r["n_chars"], r["fingerprint"]
        )
    # the directory layout is the manifest's shard ids (partition pruning)
    dirs = {p.name for p in (tmp_path / "shards").iterdir() if p.is_dir()}
    assert dirs == {f"shard_id={k}" for k in manifest}
    # and the on-disk shard column agrees with a recompute from doc_id
    mism = (
        back.withColumn(
            "expect",
            F.conv(F.substring(F.md5(F.concat(F.lit("shard:"),
                F.col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("long") % 8,
        )
        .filter(F.col("shard_id") != F.col("expect"))
        .count()
    )
    assert mism == 0
