"""Sinks: CSV writers matching the reference's output surface."""

from flink_kmeans_clustering_spark.sinks.csv import write_csv_single

__all__ = ["write_csv_single"]
