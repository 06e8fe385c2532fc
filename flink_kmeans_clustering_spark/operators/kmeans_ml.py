"""Packaged K-Means path via pyspark.ml (MLlib DataFrame API).

SURVEY.md §7 step 5: expose MLlib's distributed KMeans (k-means|| init,
internal collect+treeAggregate iteration — the same driver-state pattern
our :func:`~flink_kmeans_clustering_spark.operators.kmeans.lloyd` uses)
behind the engine's API for the "just cluster it" path.

Semantic differences vs the reference (``KMeans.java``), deliberate:

* init: k-means|| (seeded) instead of uniform random / recompnearest —
  strictly better placement (SURVEY.md §2.3 D2).
* empty clusters: MLlib keeps the stale center; the reference drops it.
  Parity paths must use our Lloyd loop (SURVEY.md §3.4).
* ``tol`` compares centroid movement like the reference's epsilon, but
  MLlib has no initial-model parameter in the Python API — the
  given-centroids case is the Lloyd loop's job.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class MlKMeansResult:
    centroids: list[tuple[int, list[float]]]  # (cluster id, center vector)
    predictions: DataFrame  # input cols + `cluster`
    wcss: float  # training cost (Σ squared Euclidean)


def fit_kmeans_ml(
    df: DataFrame,
    k: int,
    features_col: str = "embedding",
    max_iter: int = 20,
    tol: float = 1e-4,
    seed: int = 42,
) -> MlKMeansResult:
    """Cluster an ``array<numeric>`` column with MLlib KMeans.

    The array column is converted to an ML vector JVM-side
    (``array_to_vector`` — no Python round trip).
    """
    from pyspark.ml.clustering import KMeans as MlKMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.withColumn(
        "_features", array_to_vector(F.col(features_col).cast("array<double>"))
    )
    model = MlKMeans(
        k=k, maxIter=max_iter, tol=tol, seed=seed, featuresCol="_features",
        predictionCol="cluster", initMode="k-means||",
    ).fit(feats)
    preds = model.transform(feats).drop("_features")
    cost = model.summary.trainingCost
    centroids = [(i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())]
    return MlKMeansResult(centroids=centroids, predictions=preds, wcss=float(cost))
