"""Partitioned parquet sink — the scale-path writer.

Single-file CSV (``sinks.csv``) is reference parity; real output at
100 TB is parquet partitioned by a low-cardinality column so downstream
readers get partition pruning for free.  ``maxRecordsPerFile`` bounds
file sizes; sorting within partitions by a filter column adds row-group
min/max pruning on that column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    max_records_per_file: int | None = None,
    sort_within_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_by``."""
    if sort_within_by:
        df = df.sortWithinPartitions(*sort_within_by)
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_by).parquet(path)


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_rows_per_file: int,
) -> tuple[int, int]:
    """Rewrite a directory of parquet files as ⌈n/target⌉ right-sized
    files — the small-files compaction every streaming/landing pipeline
    needs (a 100 TB table accreted in per-trigger dribbles becomes
    millions of KB-files whose open/footer cost dominates every scan).

    The row count comes from parquet FOOTER metadata (Spark's
    count(*) over parquet never touches row data), the rewrite is ONE
    round-robin repartition to exactly the target file count — no key
    shuffle, no sort.  In production the same pass runs per partition
    directory with `target` derived from the table's row width; here
    row count is the deterministic stand-in for byte size.

    Returns (files_before, files_after) as counted on disk.
    """
    import math
    import os

    def _n_files(p: str) -> int:
        return sum(
            1
            for root, _, files in os.walk(p)
            for f in files
            if f.endswith(".parquet")
        )

    df = spark.read.parquet(src_path)
    n = df.count()
    n_out = max(1, math.ceil(n / target_rows_per_file))
    df.repartition(n_out).write.mode("overwrite").parquet(dst_path)
    return _n_files(src_path), _n_files(dst_path)


def write_zordered(
    df: DataFrame,
    path: str,
    zcol,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` clustered by a Z-order key expression.

    ``repartitionByRange`` on the key gives globally disjoint key
    ranges per file; the within-partition sort additionally tightens
    per-row-group min/max inside each file — the two levels parquet
    readers prune at.  The key column is layout-only and dropped
    before the write (filters run on the real columns; their
    statistics are what the clustering tightens).
    """
    (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a BUCKETED parquet table (hash-clustered files).

    Bucketing is the co-located-join primitive: each output file holds
    one hash bucket of ``bucket_by``, and the layout is recorded in the
    catalog.  Two tables bucketed by their join key with the same
    bucket count then join with ZERO Exchange on either side — at
    100 TB that turns the nightly fact⋈fact join from a full dual
    shuffle into a per-bucket merge.  ``sortBy`` the same key so the
    sort-merge join's per-bucket sort is also free on read.

    (``partitionBy`` splits by VALUE into directories — right for
    low-cardinality pruning; ``bucketBy`` splits by HASH into a fixed
    file count — right for high-cardinality join keys.)
    """
    # Repartition by the bucket key into exactly n_buckets tasks first:
    # repartition and bucketBy share the same Murmur3 hash, so each task
    # then holds exactly one bucket and writes ONE file.  Spark's scan
    # only reports a bucket as sorted when it is a single file — with
    # multiple files per bucket the sortBy is wasted and every SMJ
    # re-sorts each bucket at read time.
    (
        df.repartition(n_buckets, F.col(bucket_by))
        .write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, bucket_by)
        .sortBy(bucket_by)
        .format("parquet")
        .saveAsTable(table)
    )
