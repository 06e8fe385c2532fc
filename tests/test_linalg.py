"""Distributed XᵀX / covariance (operators.linalg)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_kmeans_clustering_spark.operators.linalg import (
    covariance_matrix,
    gram_matrix,
)


def _vec_df(spark, mat, extra_rows=()):
    rows = [([float(v) for v in row],) for row in mat] + [
        (list(r),) for r in extra_rows
    ]
    return spark.createDataFrame(rows, "embedding array<double>")


@pytest.fixture(scope="module")
def mat():
    rng = np.random.RandomState(3)
    return rng.standard_normal((40, 6))


def test_gram_matches_numpy(spark, mat):
    df = _vec_df(spark, mat).repartition(5)  # several GEMM partials
    got = {
        (r["i"], r["j"]): r["g"]
        for r in gram_matrix(df, dim=6, add_intercept=False).collect()
    }
    want = mat.T @ mat
    assert len(got) == 6 * 7 // 2  # upper triangle only
    for (i, j), g in got.items():
        assert i <= j
        assert g == pytest.approx(want[i, j], abs=1e-9)


def test_gram_intercept_carries_count_and_sums(spark, mat):
    df = _vec_df(spark, mat)
    got = {(r["i"], r["j"]): r["g"] for r in gram_matrix(df, dim=6).collect()}
    assert got[(6, 6)] == pytest.approx(len(mat))
    for i in range(6):
        assert got[(i, 6)] == pytest.approx(mat[:, i].sum(), abs=1e-9)


def test_covariance_matches_numpy_cov(spark, mat):
    df = _vec_df(spark, mat).repartition(3)
    got = {
        (r["i"], r["j"]): r["cov"]
        for r in covariance_matrix(df, dim=6, round_to=None).collect()
    }
    want = np.cov(mat, rowvar=False)  # sample covariance (n-1)
    for (i, j), c in got.items():
        assert c == pytest.approx(want[i, j], abs=1e-9)


def test_wrong_width_rows_excluded_not_truncated(spark, mat):
    # a 3-wide and an 8-wide stray row must not contribute anything
    clean = _vec_df(spark, mat)
    dirty = _vec_df(spark, mat, extra_rows=[(1.0, 2.0, 3.0), tuple([9.0] * 8)])
    a = {
        (r["i"], r["j"]): r["g"] for r in gram_matrix(clean, dim=6).collect()
    }
    b = {
        (r["i"], r["j"]): r["g"] for r in gram_matrix(dirty, dim=6).collect()
    }
    assert a == b


def test_gram_empty_input(spark):
    empty = spark.createDataFrame([], "embedding array<double>")
    assert gram_matrix(empty, dim=4).count() == 0
    assert covariance_matrix(empty, dim=4).count() == 0


def test_pca_projection_matches_numpy(spark, mat):
    from flink_kmeans_clustering_spark.operators.linalg import pca_project

    rows = [(i, [float(v) for v in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_project(df, n_components=2, dim=6, round_to=None).collect()
    }
    centered = mat - mat.mean(axis=0)
    vals, vecs = np.linalg.eigh(np.cov(mat, rowvar=False))
    comps = vecs[:, np.argsort(vals)[::-1][:2]]
    for k in range(2):
        j = int(np.argmax(np.abs(comps[:, k])))
        if comps[j, k] < 0:
            comps[:, k] = -comps[:, k]
    want = centered @ comps
    for i in range(len(mat)):
        assert got[i][0] == pytest.approx(want[i, 0], abs=1e-6)
        assert got[i][1] == pytest.approx(want[i, 1], abs=1e-6)
    # top component carries the most variance
    import numpy as _np

    p1 = _np.array([got[i][0] for i in range(len(mat))])
    p2 = _np.array([got[i][1] for i in range(len(mat))])
    assert p1.var() >= p2.var()


def test_pca_projection_is_narrow(spark, mat):
    from flink_kmeans_clustering_spark.operators.linalg import pca_project
    from flink_kmeans_clustering_spark.plans import shuffle_count

    rows = [(i, [float(v) for v in mat[i]]) for i in range(len(mat))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = pca_project(df, n_components=2, dim=6)
    assert shuffle_count(out) == 0  # projection itself never shuffles


def test_pca_requires_two_rows(spark):
    from flink_kmeans_clustering_spark.operators.linalg import pca_project

    one = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError):
        pca_project(one, n_components=1, dim=2)
