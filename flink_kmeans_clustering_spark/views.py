"""Deterministic K-Means fixture views over the driver testdata.

FIXTURES.md §B: the 2-D ``points_v`` view projects the first two
embedding components; ``centroids_v`` is the first k=8 points by
``vec_id``, re-labeled 0..k-1 — seedless and reproducible identically
in Spark and in the DuckDB oracle (both engines' list/array access is
1-indexed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.operators.kmeans import Centroid

K_DEFAULT = 8


def points_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(point_id long, x double, y double) from embeddings[1:2]."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("point_id"),
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )


def centroids_v(spark: SparkSession, sf_dir: str, k: int = K_DEFAULT) -> list[Centroid]:
    """First k points by vec_id as centroids (id = rank-1), collected.

    k rows — driver-side by design: they re-enter plans as literals
    (see operators.kmeans.assign_points).
    """
    rows = points_v(spark, sf_dir).orderBy("point_id").limit(k).collect()
    return [(i, float(r["x"]), float(r["y"])) for i, r in enumerate(rows)]


# The identical fixture in DuckDB SQL, shared by every K-Means oracle query.
ORACLE_CTE = """
points_v AS (
  SELECT vec_id AS point_id,
         CAST(embedding[1] AS DOUBLE) AS x,
         CAST(embedding[2] AS DOUBLE) AS y
  FROM embeddings
),
centroids_v AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY point_id) - 1 AS INT) AS id, x, y
  FROM (SELECT * FROM points_v ORDER BY point_id LIMIT 8)
)
"""

# One assignment step in SQL: argmin over (dist2, id) — the reference's
# strict-< scan tie-break (KMeans.java:281) as ORDER BY dist2, id.
def oracle_assign_sql(points_cte: str, centroids_cte: str) -> str:
    return f"""
  SELECT point_id, x, y, cluster FROM (
    SELECT p.point_id, p.x, p.y, c.id AS cluster,
           ROW_NUMBER() OVER (
             PARTITION BY p.point_id
             ORDER BY (p.x-c.x)*(p.x-c.x) + (p.y-c.y)*(p.y-c.y), c.id
           ) AS rn
    FROM {points_cte} p CROSS JOIN {centroids_cte} c
  ) WHERE rn = 1
"""
