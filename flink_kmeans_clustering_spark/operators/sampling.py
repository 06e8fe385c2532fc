"""Deterministic sampling and cardinality estimation.

Training-data pipelines need samples that are *reproducible across
engines and runs* — `rand()` seeds don't survive an engine swap, and
row-position sampling breaks under repartitioning.  Content-hash
sampling does: a row is in the sample iff a digest of its key falls in
a fixed bucket range.  md5 is available and bit-identical in Spark,
DuckDB, and every warehouse, so the same SQL reproduces the exact
sample anywhere, at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def hash_bucket(key: Column, buckets: int = 16) -> Column:
    """Stable bucket in [0, buckets) from the md5 of ``key``.

    ``buckets`` must divide 16**k for some small k; we use the first
    two hex chars (256 buckets) — enough resolution for percent-level
    rates while staying engine-portable (string ops only, no bigint
    hex parsing differences).
    """
    if not (1 <= buckets <= 256):
        raise ValueError("buckets must be in [1, 256]")
    b = F.conv(F.substring(F.md5(key), 1, 2), 16, 10).cast("int")
    return b % buckets


def deterministic_sample(
    df: DataFrame,
    key_col: str,
    rate: float = 1 / 16,
    buckets: int = 256,
) -> DataFrame:
    """Keep rows whose hash bucket < rate·buckets (narrow filter).

    The filter is a pure row-local expression — no shuffle, no RNG
    state, pushes through any plan, and two engines hashing the same
    keys produce byte-identical samples.
    """
    keep = int(rate * buckets)
    return df.filter(hash_bucket(F.col(key_col), buckets) < keep)


def approx_distinct(
    df: DataFrame, cols: list[str], group_by: list[str] | None = None, rsd: float = 0.05
) -> DataFrame:
    """HyperLogLog++ distinct-count estimate (``approx_count_distinct``).

    The constant-memory cardinality sketch for 100 TB scans where exact
    ``COUNT(DISTINCT)`` would shuffle every distinct value.  Estimates
    are sketch-implementation-specific (rows-only correctness check);
    accuracy is asserted against exact counts in unit tests.
    """
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"approx_{c}") for c in cols
    ]
    if group_by:
        return df.groupBy(*group_by).agg(*aggs)
    return df.agg(*aggs)
