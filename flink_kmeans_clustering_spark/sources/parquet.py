"""Parquet scans over the driver testdata star schema (TESTDATA.md).

Columnar scans with Catalyst pushdown: callers filter/select on the
returned DataFrame and the parquet reader prunes columns and row groups
automatically — verify with ``.explain`` (``PushedFilters``/``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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


def load_events(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Events scan with a proper TIMESTAMP ``ts`` column.

    The testdata writes ``ts`` as parquet INT64 TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects by default.  We read nanos as a
    raw long (``nanosAsLong``) and floor-divide to microseconds with
    integer arithmetic (``div`` — a double division would lose
    precision on ~1.7e18 nanosecond values), matching DuckDB's
    ``epoch_us`` truncation on the same file.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # formatted-date outputs (date_format/window starts) must not depend
    # on the host session's timezone — pin UTC like the DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, "events", sf_dir)
    return ev.withColumn(
        "ts", F.timestamp_micros(F.expr("ts div 1000"))
    )
