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
