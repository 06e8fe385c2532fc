"""flink_kmeans_clustering_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query/data-processing
capabilities of ``thestarivore/flink-kmeans_clustering`` (a Flink 1.7
batch K-Means job, reference at ``KMeans.java``), extended with the
operators a large-scale LLM training-data pipeline needs: deduplication,
similarity search, multimodal columns, text analysis, and event windows.

Design rules (see SURVEY.md):

* DataFrame/SQL first — declare logical plans, let Catalyst/Tungsten pick
  physical strategy (whole-stage codegen, partial aggregation, broadcast).
* Small state (k centroids) lives on the driver and enters plans as
  literal expressions or broadcast joins — never a shuffle of the big side.
* Python UDFs only where column expressions genuinely cannot express the
  semantics, and then always Arrow-batched (pandas_udf / mapInPandas).
"""

from flink_kmeans_clustering_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
