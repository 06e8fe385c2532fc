"""Sweep-driver (B1-B4) smoke + property tests."""

from __future__ import annotations

import pytest

from flink_kmeans_clustering_spark.operators.kmeans import lloyd, random_centroids
from scripts.sweeps import sweep_iterations, synthetic_points


def test_synthetic_points_deterministic(spark):
    a = synthetic_points(spark, 500, seed=3).collect()
    b = synthetic_points(spark, 500, seed=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    c = synthetic_points(spark, 500, seed=4).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_sweep_iterations_wcss_non_increasing(spark):
    pts = synthetic_points(spark, 2000, seed=5)
    init = random_centroids(4, seed=5)
    rows = list(sweep_iterations(pts, init, 4))
    wcss = [r["wcss"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(wcss, wcss[1:]))


def test_kmeans_recovers_blobs(spark):
    # 8 well-separated blobs, k=8 from random init: WCSS must approach
    # the within-blob noise floor, far below the one-cluster objective
    pts = synthetic_points(spark, 4000, seed=6)
    k1 = lloyd(pts, random_centroids(1, seed=6), max_iterations=3).wcss
    k8 = lloyd(pts, random_centroids(8, seed=6), max_iterations=15).wcss
    assert k8 < k1 / 10
