"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Float columns are rounded to 6 decimals on BOTH sides (FIXTURES.md
oracle-determinism rule) so partition-order summation differences
between engines can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.operators.kmeans import (
    assign_points,
    lloyd,
    moved_centroids,
    objective_from_assigned,
    update_centroids,
)
from flink_kmeans_clustering_spark.views import (
    ORACLE_CTE,
    centroids_v,
    oracle_assign_sql,
    points_v,
)

SF_SMOKE = "/root/testdata/sf0.001"

CONVERGENCE_EPS = 0.05
KMEANS_ITERS = 3


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full Lloyd K-Means (k=8, 5 iterations) on sf0.001.

    Returns the final per-point assignment with squared distance —
    exercises scan, narrow argmin map, k-key hash aggregation, the
    driver-loop bulk iteration, and the objective computation.
    """
    pts = points_v(spark, SF_SMOKE)
    init = centroids_v(spark, SF_SMOKE)
    res = lloyd(pts, init, max_iterations=5)
    return res.assignments


# ---------------------------------------------------------------------------
# queries(): (spark, sf_dir) -> DataFrame, one per implemented operator
# ---------------------------------------------------------------------------


def q_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/O7 nearest-centroid assignment (narrow literal-argmin map)."""
    pts = points_v(spark, sf_dir)
    cents = centroids_v(spark, sf_dir)
    return assign_points(pts, cents).select("point_id", "cluster")


def q_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/O4 grouped partial-sum + mean after one assignment step."""
    pts = points_v(spark, sf_dir)
    cents = centroids_v(spark, sf_dir)
    upd = update_centroids(assign_points(pts, cents))
    return upd.select(
        "id",
        F.round("x", 6).alias("x"),
        F.round("y", 6).alias("y"),
        "n",
    )


def q_objfun(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O9/O10 WCSS (Σ squared Euclidean) of one assignment step."""
    pts = points_v(spark, sf_dir)
    cents = centroids_v(spark, sf_dir)
    assigned = assign_points(pts, cents, dist2_col="dist2")
    return objective_from_assigned(assigned).select(F.round("wcss", 6).alias("wcss"))


def q_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O6 convergence set: centroids that moved > ε after one step."""
    pts = points_v(spark, sf_dir)
    cents = centroids_v(spark, sf_dir)
    old = spark.createDataFrame(cents, "id int, x double, y double")
    new = update_centroids(assign_points(pts, cents), count_col=None)
    mv = moved_centroids(new, old, epsilon=CONVERGENCE_EPS)
    return mv.select("id", F.round("moved", 6).alias("moved"))


def q_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5 bulk iteration: 3 full Lloyd supersteps, final centroids."""
    pts = points_v(spark, sf_dir)
    init = centroids_v(spark, sf_dir)
    res = lloyd(pts, init, max_iterations=KMEANS_ITERS)
    out = spark.createDataFrame(res.centroids, "id int, x double, y double")
    return out.select("id", F.round("x", 6).alias("x"), F.round("y", 6).alias("y"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "q_assign": q_assign,
        "q_update": q_update,
        "q_objfun": q_objfun,
        "q_convergence": q_convergence,
        "q_kmeans": q_kmeans,
    }


# ---------------------------------------------------------------------------
# oracle_sql(): DuckDB-runnable ANSI SQL equivalents
# ---------------------------------------------------------------------------


def _kmeans_loop_cte(iters: int) -> str:
    """Chained-CTE Lloyd loop: a{i} = assign vs c{i-1}; c{i} = means."""
    sql = f"WITH {ORACLE_CTE}, c0 AS (SELECT * FROM centroids_v)"
    for i in range(1, iters + 1):
        sql += f""",
a{i} AS ({oracle_assign_sql('points_v', f'c{i - 1}')}),
c{i} AS (
  SELECT cluster AS id, SUM(x)/COUNT(*) AS x, SUM(y)/COUNT(*) AS y
  FROM a{i} GROUP BY cluster
)"""
    return sql


def oracle_sql() -> dict[str, str]:
    assign = f"""
WITH {ORACLE_CTE}
SELECT point_id, cluster FROM ({oracle_assign_sql('points_v', 'centroids_v')})
"""
    update = f"""
WITH {ORACLE_CTE},
assigned AS ({oracle_assign_sql('points_v', 'centroids_v')})
SELECT cluster AS id,
       ROUND(SUM(x)/COUNT(*), 6) AS x,
       ROUND(SUM(y)/COUNT(*), 6) AS y,
       COUNT(*) AS n
FROM assigned GROUP BY cluster
"""
    objfun = f"""
WITH {ORACLE_CTE},
assigned AS ({oracle_assign_sql('points_v', 'centroids_v')})
SELECT ROUND(SUM((a.x-c.x)*(a.x-c.x) + (a.y-c.y)*(a.y-c.y)), 6) AS wcss
FROM assigned a JOIN centroids_v c ON a.cluster = c.id
"""
    convergence = f"""
WITH {ORACLE_CTE},
assigned AS ({oracle_assign_sql('points_v', 'centroids_v')}),
new_c AS (
  SELECT cluster AS id, SUM(x)/COUNT(*) AS x, SUM(y)/COUNT(*) AS y
  FROM assigned GROUP BY cluster
)
SELECT n.id, ROUND(SQRT((n.x-o.x)*(n.x-o.x) + (n.y-o.y)*(n.y-o.y)), 6) AS moved
FROM new_c n JOIN centroids_v o ON n.id = o.id
WHERE SQRT((n.x-o.x)*(n.x-o.x) + (n.y-o.y)*(n.y-o.y)) > {CONVERGENCE_EPS}
"""
    kmeans = (
        _kmeans_loop_cte(KMEANS_ITERS)
        + f"\nSELECT id, ROUND(x,6) AS x, ROUND(y,6) AS y FROM c{KMEANS_ITERS}"
    )
    return {
        "q_assign": assign,
        "q_update": update,
        "q_objfun": objfun,
        "q_convergence": convergence,
        "q_kmeans": kmeans,
    }
