"""Schema'd CSV scans for the reference's two input file shapes.

Reference behavior (SURVEY.md §1.2):

* points CSV: header ``X,Y``, one point per line — read with
  ``ignoreFirstLine``/``pojoType(Point, "x","y")`` (``KMeans.java:73-77``).
* centroids CSV: header ``Cluster,X,Y`` —
  ``pojoType(Centroid, "id","x","y")`` (``KMeans.java:138-142``).

Spark-first: explicit ``StructType`` + ``header=True`` — never schema
inference on correctness-checked paths.  Explicit schemas also let the
vectorized CSV reader skip the inference pass (one scan, not two).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

POINTS_SCHEMA = T.StructType(
    [
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
)

CENTROIDS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType(), False),
        T.StructField("x", T.DoubleType(), False),
        T.StructField("y", T.DoubleType(), False),
    ]
)


def read_points_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """S1: read an ``X,Y`` points CSV (``KMeans.java:73-77``)."""
    return spark.read.csv(path, schema=POINTS_SCHEMA, header=header, sep=",")


def read_centroids_csv(spark: SparkSession, path: str, header: bool = True) -> DataFrame:
    """S2: read a ``Cluster,X,Y`` centroids CSV (``KMeans.java:138-142``)."""
    return spark.read.csv(path, schema=CENTROIDS_SCHEMA, header=header, sep=",")
