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


def test_plots_render_valid_svg(tmp_path):
    """B7 chart generation: tidy sweep CSV -> two-panel SVG, all marks
    inside the canvas."""
    import re
    import xml.dom.minidom

    from scripts.plots import H_PANEL, W, render_sweep_svg

    csv_path = tmp_path / "sweep.csv"
    csv_path.write_text(
        "k,rep,wcss,runtime_ms\n"
        "1,0,900.5,1500\n1,1,910.0,1480\n"
        "2,0,500.25,1600\n2,1,498.0,1633\n"
        "3,0,310.75,1702\n3,1,305.5,1750\n"
    )
    out = tmp_path / "sweep.svg"
    render_sweep_svg(str(csv_path), str(out))
    svg = out.read_text()
    xml.dom.minidom.parseString(svg)  # well-formed
    assert svg.count("<path") == 2  # one mean line per panel
    assert "WCSS vs k" in svg and "Runtime (ms) vs k" in svg
    # every mark inside the two-panel canvas
    for cx, cy in re.findall(r'cx="([\d.]+)" cy="([\d.]+)"', svg):
        assert 0 <= float(cx) <= W
        assert 0 <= float(cy) <= 2 * H_PANEL
    # per-point hover labels present (interaction layer)
    assert svg.count("<title>") == 6
