"""JSONL source/sink — the interchange format of training-data pipelines.

Every corpus exchange (Common Crawl derivatives, instruction sets,
eval suites) moves as newline-delimited JSON.  Two rules make it scan
around at 100 TB instead of choking:

* **Always pass an explicit schema on read.**  Schema inference is a
  FULL extra pass over the data before the real scan (Spark samples
  every file); on a 100 TB landing directory that doubles the job.  An
  explicit schema also pins types the inferencer would guess
  differently batch-to-batch (ints arriving as longs vs doubles).
* **JSONL is a line format → it splits.**  Unlike a multi-line JSON
  array, each line is one record, so a 1 GB file fans out across
  tasks on newline boundaries for free.  (Compressed, prefer many
  medium files over one giant gzip — gzip is unsplittable.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Write one JSON object per line (Spark's native json sink)."""
    df.write.mode(mode).json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    mode: str = "FAILFAST",
) -> DataFrame:
    """Schema'd JSONL scan.

    ``FAILFAST`` surfaces corrupt lines as job errors — the right
    default for a curated corpus (the alternative, ``PERMISSIVE``,
    silently NULLs malformed rows, turning data corruption into a
    quality-filter mystery three stages later).  Pass
    ``mode="PERMISSIVE"`` plus a ``_corrupt_record`` column when
    ingesting genuinely dirty crawl data.
    """
    return spark.read.schema(schema).option("mode", mode).json(path)
