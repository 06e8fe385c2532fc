"""Graph analytics over candidate-pair graphs.

The near-dup pipeline's pair lists are graphs; ``dedup.
connected_components`` answers "which docs are the same?", this module
answers "which docs are CENTRAL?" — e.g. PageRank over the similarity
graph surfaces template/boilerplate hubs (a page near-duplicated by
thousands of others) that plain pair counts miss.

Same execution discipline as the CC operator: the edge list is
materialized once, every superstep is one equi-join + one grouped sum
(both hash-partitioned on node id, so the exchange is reused), the
driver loop holds only loop control, and ``localCheckpoint`` truncates
lineage so step N's plan does not replay steps 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    pairs: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    id_a: str = "id_a",
    id_b: str = "id_b",
    node_col: str = "id",
    rank_col: str = "rank",
    round_to: int | None = 6,
) -> DataFrame:
    """PageRank over an UNDIRECTED pair graph, fixed iteration count.

    rank'(v) = (1−d)/N + d · Σ_{u∼v} rank(u)/deg(u), starting from the
    uniform 1/N.  An undirected pair graph has no dangling nodes (every
    node in a pair has degree ≥ 1), so no dangling-mass redistribution
    term is needed — the classic formulation is exact here.

    A FIXED iteration count (not a convergence test) keeps the result
    closed-form: an oracle can unroll the same ``iterations`` levels of
    join+sum SQL and match value-for-value (rounding only at the end;
    float noise after a handful of iterations is ~1e-15 relative, far
    inside a 1e-6 grid for ranks of magnitude 1/N).

    Output: (``node_col``, ``rank_col``) for every node in the graph.
    """
    p = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    p = p.localCheckpoint()
    edges = p.union(
        p.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).cache()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # contribution edge list: (src, dst, 1/deg) — deg is static, join once
    contrib = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("inv_deg")
    )
    contrib = contrib.localCheckpoint()
    n = deg.count()
    if n == 0:
        edges.unpersist()
        return pairs.sparkSession.createDataFrame(
            [], f"{node_col} long, {rank_col} double"
        )
    base = (1.0 - damping) / n
    ranks = deg.select("src", F.lit(1.0 / n).alias("r"))
    for _ in range(iterations):
        incoming = (
            contrib.join(ranks, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("r") * F.col("inv_deg")).alias("in_r"))
        )
        # every node has incoming mass in an undirected pair graph, so
        # the join-back is inner and total mass is conserved
        ranks = incoming.select(
            F.col("dst").alias("src"),
            (F.lit(base) + F.lit(damping) * F.col("in_r")).alias("r"),
        ).localCheckpoint()
    edges.unpersist()
    r = F.col("r")
    if round_to is not None:
        r = F.round(r, round_to)
    return ranks.select(
        F.col("src").alias(node_col), r.alias(rank_col)
    )
