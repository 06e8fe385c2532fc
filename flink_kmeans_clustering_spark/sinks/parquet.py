"""Partitioned parquet sink — the scale-path writer.

Single-file CSV (``sinks.csv``) is reference parity; real output at
100 TB is parquet partitioned by a low-cardinality column so downstream
readers get partition pruning for free.  ``maxRecordsPerFile`` bounds
file sizes; sorting within partitions by a filter column adds row-group
min/max pruning on that column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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
