"""End-to-end CLI parity: the reference's command surface on Spark.

Drives ``cli.main`` in-process against the reference's deterministic
script_3 fixture and checks the output files have the reference layout
(single headerless CSV each) and the golden WCSS.
"""

from __future__ import annotations

import json
import os

import pytest

from flink_kmeans_clustering_spark import cli

FIXTURE_DIR = "/root/reference/script_results/script_3/input"
GOLDEN_WCSS_1ITER = 541541.461254493

pytestmark = pytest.mark.skipif(
    not os.path.exists(FIXTURE_DIR), reason="reference fixture not available"
)


def test_cli_file_centroids_writes_flink_layout(spark, tmp_path, capsys):
    pts_out = str(tmp_path / "new_points.csv")
    cent_out = str(tmp_path / "new_centroids.csv")
    obj_out = str(tmp_path / "objfun.csv")
    rc = cli.main(
        [
            "-points", f"{FIXTURE_DIR}/points.csv",
            "-centroids", f"{FIXTURE_DIR}/centroids.csv",
            "-iterations", "1",
            "-pointsout", pts_out,
            "-centroidsout", cent_out,
            "-objfunout", obj_out,
        ]
    )
    assert rc == 0
    # single files, headerless (reference layout: KMeans.java:231-233)
    with open(cent_out) as f:
        lines = f.read().strip().splitlines()
    # drop-semantics: clusters emptied in iteration 1 vanish (≤ 8 rows)
    assert 0 < len(lines) <= 8 and not lines[0].lower().startswith("cluster")
    assert all(len(line.split(",")) == 3 for line in lines)
    with open(obj_out) as f:
        wcss = float(f.read().strip())
    assert wcss == pytest.approx(GOLDEN_WCSS_1ITER, rel=1e-9)
    with open(pts_out) as f:
        n_points = sum(1 for _ in f)
    assert n_points == 100_000
    # machine-parsable runtime line (SURVEY.md §2.4 B3 lesson)
    last = capsys.readouterr().out.strip().splitlines()[-1]
    rec = json.loads(last)
    assert rec["unit"] == "ms" and rec["iterations"] == 1


def test_cli_generated_centroids_echoed(spark, tmp_path, capsys):
    echo = str(tmp_path / "gen_centroids.csv")
    rc = cli.main(
        [
            "-points", f"{FIXTURE_DIR}/points.csv",
            "-centroids", echo,
            "-numcentroids", "4",
            "-recompnearest", "2",
            "-iterations", "1",
            "--seed", "7",
        ]
    )
    assert rc == 0
    with open(echo) as f:
        lines = f.read().strip().splitlines()
    assert len(lines) == 4  # D3: generated set echoed for reuse


def test_cli_custconvergence_requires_epsilon(spark, capsys):
    rc = cli.main(
        [
            "-points", f"{FIXTURE_DIR}/points.csv",
            "-centroids", f"{FIXTURE_DIR}/centroids.csv",
            "-custconvergence", "true",
        ]
    )
    assert rc == 2


def test_cli_kmeansparallel_init(spark, tmp_path):
    """--init kmeansparallel runs scalable init end-to-end and lands a
    better-or-equal WCSS than blind random on the same budget."""
    import json

    from flink_kmeans_clustering_spark.cli import main

    pts = tmp_path / "pts.csv"
    rows = ["X,Y"]
    # two tight blobs far apart
    for i in range(50):
        rows.append(f"{0.0 + i * 0.01},{0.0}")
        rows.append(f"{10.0 + i * 0.01},{10.0}")
    pts.write_text("\n".join(rows) + "\n")

    import contextlib
    import io

    def run(extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(
                ["-points", str(pts), "-numcentroids", "2",
                 "-iterations", "3", "--seed", "5"] + extra
            )
        assert rc == 0
        last = buf.getvalue().strip().splitlines()[-1]
        return json.loads(last)

    scal = run(["--init", "kmeansparallel"])
    rand = run([])
    assert scal["k"] == 2
    assert scal["wcss"] <= rand["wcss"] * 1.001
