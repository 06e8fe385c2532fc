"""Sources: schema'd CSV/Parquet scans and collection sources.

Covers the reference's full source surface (SURVEY.md §2.1, S1-S3:
``KMeans.java:73-77`` points CSV, ``:138-142`` centroids CSV, ``:120``
collection source) and adds the Parquet scans the driver testdata uses.
"""

from flink_kmeans_clustering_spark.sources.csv import (
    CENTROIDS_SCHEMA,
    POINTS_SCHEMA,
    read_centroids_csv,
    read_points_csv,
)
from flink_kmeans_clustering_spark.sources.parquet import TABLES, load_table, load_tables
from flink_kmeans_clustering_spark.sources.collection import centroids_from_collection

__all__ = [
    "CENTROIDS_SCHEMA",
    "POINTS_SCHEMA",
    "read_centroids_csv",
    "read_points_csv",
    "TABLES",
    "load_table",
    "load_tables",
    "centroids_from_collection",
]
