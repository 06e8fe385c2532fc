"""PageRank over pair graphs (operators.graph)."""

from __future__ import annotations


def test_pagerank_star_hub_ranks_highest(spark):
    from flink_kmeans_clustering_spark.operators.graph import pagerank

    # star: 0 is near-duplicated by 1..4 — the boilerplate-hub shape
    pairs = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "id_a long, id_b long"
    )
    ranks = {r["id"]: r["rank"] for r in pagerank(pairs, iterations=5).collect()}
    assert len(ranks) == 5
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0)
    leaves = [v for k, v in ranks.items() if k != 0]
    assert max(leaves) - min(leaves) < 1e-12  # symmetry


def test_pagerank_mass_conserved_each_iteration(spark):
    from flink_kmeans_clustering_spark.operators.graph import pagerank

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3)], "id_a long, id_b long"
    )
    for iters in (1, 3):
        total = sum(
            r["rank"]
            for r in pagerank(pairs, iterations=iters, round_to=None).collect()
        )
        # undirected graph: no dangling mass, total stays exactly 1
        assert abs(total - 1.0) < 1e-9


def test_pagerank_empty_graph(spark):
    from flink_kmeans_clustering_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert pagerank(empty).count() == 0


# --- triangle counting -------------------------------------------------------


def test_triangle_counts_known_graph(spark):
    from flink_kmeans_clustering_spark.operators.graph import triangle_counts

    # K4 minus edge (3,4): triangles (1,2,3) and (1,2,4)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4), (2, 4)], "id_a long, id_b long"
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(pairs).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_counts_ignore_duplicates_and_direction(spark):
    from flink_kmeans_clustering_spark.operators.graph import triangle_counts

    # same triangle listed with reversed and duplicated edges
    pairs = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1), (1, 3)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_star_has_none(spark):
    from flink_kmeans_clustering_spark.operators.graph import triangle_counts

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "id_a long, id_b long"
    )
    assert triangle_counts(star).count() == 0


def test_triangle_counts_empty(spark):
    from flink_kmeans_clustering_spark.operators.graph import triangle_counts

    empty = spark.createDataFrame([], "id_a long, id_b long")
    assert triangle_counts(empty).count() == 0


def test_cooccurrence_support_threshold(spark):
    from flink_kmeans_clustering_spark.operators.graph import cooccurrence_edges

    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20)], "g long, item long"
    )
    all_pairs = {
        (r["id_a"], r["id_b"])
        for r in cooccurrence_edges(df, "g", "item").collect()
    }
    assert all_pairs == {(10, 20), (10, 30), (20, 30)}
    sup2 = {
        (r["id_a"], r["id_b"])
        for r in cooccurrence_edges(df, "g", "item", min_support=2).collect()
    }
    assert sup2 == {(10, 20)}
