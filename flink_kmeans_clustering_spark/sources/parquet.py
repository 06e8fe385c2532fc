"""Parquet scans over the driver testdata star schema (TESTDATA.md).

Columnar scans with Catalyst pushdown: callers filter/select on the
returned DataFrame and the parquet reader prunes columns and row groups
automatically — verify with ``.explain`` (``PushedFilters``/``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Scan one testdata table (lazy — no job until an action)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Scan every testdata table into a name → DataFrame map."""
    return {name: load_table(spark, name, sf_dir) for name in TABLES}
