"""Collection source: driver-side rows → DataFrame.

Mirrors ``env.fromCollection(randomCentroids)`` (``KMeans.java:120``, S3).
Used for small driver-generated state (k centroids); Spark serializes the
local rows into the plan — appropriate only for small collections.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession

from flink_kmeans_clustering_spark.sources.csv import CENTROIDS_SCHEMA


def centroids_from_collection(
    spark: SparkSession, rows: Iterable[tuple[int, float, float]]
) -> DataFrame:
    """Create a ``(id int, x double, y double)`` DataFrame from driver rows."""
    return spark.createDataFrame(list(rows), schema=CENTROIDS_SCHEMA)
