"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, key: str) -> DataFrame:
    """Rebalance a skinny scan before per-row heavy compute.

    A corpus packed into few parquet files yields few input partitions,
    which would serialize per-row hashing/tokenization onto a handful of
    cores (observed 20s+ single-task stages at bench scale).  If the
    scan has fewer partitions than the cluster has slots, hash-partition
    by ``key`` first — the shuffle moves only the raw input once, and
    every later stage keyed on it reuses the partitioning.  Inputs that
    already have enough splits (the 100 TB case) pass through untouched.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))
