"""Top-decade scaling evidence for the dedup/ANN families (VERDICT r06
item 3).

The per-round 100× growth tables (sf0.001→sf0.1) are flat because
job-scheduling floors dominate at those sizes — they prove "no
quadratic blow-up" but not the SLOPE.  This script is the analogue of
the K-Means N-sweep's 10M-point row: it synthesizes documents/
embeddings corpora at 1×, 3×, and 10× the sf0.1 size (the 10× point is
where the data term finally clears the ~1-2 s job floor on local[8])
and measures the headline dedup/ANN queries at each, so the growth
exponent is measured rather than argued.

The corpora mirror the sf0.1 testdata's shape — bag-of-words text from
a small vocabulary (~300 chars), a constant RATE of injected exact and
near duplicates, dim-64 embeddings in 10 isotropic label blocks — so
per-doc candidate density stays constant and a correct implementation
should grow ~linearly in corpus size.  Generation is deterministic
(fixed numpy PCG64 seeds).

Run:  python scripts/scale_bench.py [--sizes 1,3,10] [--runs 3]
Writes docs/SCALING.md and scripts/scale_bench_results.json.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 5_000  # sf0.1 documents rows
BASE_VECS = 2_000  # sf0.1 embeddings rows
DIM = 64
N_LABELS = 10
VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group agg filter query big key window row table stream merge "
    "data a the vector customer join".split()
)

QUERIES = (
    "q_dedup_ngram",
    "q_dedup_minhash",
    "q_dedup_prefix",
    "q_dedup_spans",
    "q_ann_pq",
    "q_ann_recall",
)


def synth_dir(mult: int, root: str = "/tmp/scale_bench") -> str:
    """Deterministic documents+embeddings parquet at ``mult``× sf0.1."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(root, f"x{mult}")
    if os.path.exists(os.path.join(d, "_DONE")):
        return d
    os.makedirs(d, exist_ok=True)

    n_docs = BASE_DOCS * mult
    rng = np.random.default_rng(20260815)
    lengths = rng.integers(8, 60, size=n_docs)  # words per doc (~300 chars)
    total = int(lengths.sum())
    # Zipf-ish vocabulary: ~30% of tokens from 30 hot words (their
    # shingles exceed the df cap — the guard SHOULD drop them), the
    # rest from a 20k-word tail (shingle df ~1, so the candidate pairs
    # that survive are exactly the injected duplicate groups — constant
    # per-doc candidate density at every scale, like a real corpus).
    hot = rng.integers(0, len(VOCAB), size=total)
    tail = rng.integers(0, 20_000, size=total)
    use_hot = rng.random(total) < 0.3
    toks = np.where(
        use_hot,
        np.array(VOCAB, dtype=object)[hot],
        np.char.add("t", tail.astype(str)).astype(object),
    )
    texts: list[str] = []
    off = 0
    for ln in lengths:
        texts.append(" ".join(toks[off : off + ln]))
        off += ln
    # constant-RATE duplicate injection (same density at every scale)
    for i in range(n_docs):
        if i % 100 == 7 and i >= 3:
            texts[i] = texts[i - 3]  # exact duplicate
        elif i % 41 == 13 and i >= 5:
            toks = texts[i - 5].split()  # near duplicate: tail edited
            texts[i] = " ".join(toks[:-3] + ["edited", "tail", "here"])
    langs = ["en", "de", "zh", "fr", "es"]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(
                    [langs[i % len(langs)] for i in range(n_docs)], pa.string()
                ),
                "source": pa.array(
                    [f"src{i % 20}" for i in range(n_docs)], pa.string()
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    n_vecs = BASE_VECS * mult
    vrng = np.random.default_rng(20260816)
    emb = vrng.standard_normal((n_vecs, DIM)).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), pa.int64()),
                "embedding": pa.array(list(emb), pa.list_(pa.float32())),
                "label": pa.array(
                    (vrng.integers(0, N_LABELS, size=n_vecs)).astype("int32"),
                    pa.int32(),
                ),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    # minimal lineitem (the 2 columns the graph family reads): 4 parts
    # per order drawn from an 8-part LOCAL window around a random base —
    # locality keeps pair-repeat probability (and so the ≥2-support
    # edge density and per-part degree) CONSTANT as both orders and the
    # part pool scale together; a uniform global draw would dilute
    # co-occurrence below the support threshold at larger mults (pair
    # space grows quadratically) and the graph would empty out instead
    # of growing linearly.
    n_orders = 1_000 * mult
    n_parts = 200 * mult
    lrng = np.random.default_rng(20260817)
    orderkeys = np.repeat(np.arange(n_orders, dtype=np.int64), 4)
    base = lrng.integers(0, n_parts, size=n_orders)
    offsets = lrng.integers(0, 8, size=(n_orders, 4))
    partkeys = ((base[:, None] + offsets) % n_parts).reshape(-1).astype(np.int64)
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(orderkeys, pa.int64()),
                "l_partkey": pa.array(partkeys, pa.int64()),
            }
        ),
        os.path.join(d, "lineitem.parquet"),
    )
    open(os.path.join(d, "_DONE"), "w").write("ok")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,3,10")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--queries",
        default=None,
        help="comma list restricting the query set; when set, results "
        "land in an 'Extended decades' appendix of SCALING.md (the "
        "main 1x/3x/10x table is left untouched) and in "
        "scale_bench_results_ext.json",
    )
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]
    queries = tuple(args.queries.split(",")) if args.queries else QUERIES

    import __spark_entry__ as entrymod
    from flink_kmeans_clustering_spark import get_spark

    spark = get_spark(app_name="scale-bench", shuffle_partitions=32)
    qs = entrymod.queries()
    results: dict[str, dict[str, float]] = {q: {} for q in queries}
    rowcounts: dict[str, dict[str, int]] = {q: {} for q in queries}
    for mult in sizes:
        d = synth_dir(mult)
        for q in queries:
            fn = qs[q]
            fn(spark, d).count()  # warm (codegen, broadcast, file listing)
            times = []
            for _ in range(args.runs):
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                times.append(time.perf_counter() - t0)
            results[q][f"x{mult}"] = round(statistics.median(times), 3)
            rowcounts[q][f"x{mult}"] = n
            print(f"x{mult} {q}: {results[q][f'x{mult}']} s ({n} rows)", flush=True)

    out = {"sizes": sizes, "runs": args.runs, "sec": results, "rows": rowcounts}
    here = os.path.dirname(os.path.abspath(__file__))
    res_name = (
        "scale_bench_results_ext.json" if args.queries
        else "scale_bench_results.json"
    )
    with open(os.path.join(here, res_name), "w") as f:
        json.dump(out, f, indent=1)

    lines = [
        "# SCALING — top-decade growth of the dedup/ANN families",
        "",
        "Measured by `scripts/scale_bench.py` on deterministic synthetic",
        f"corpora at 1×/3×/10× the sf0.1 size ({BASE_DOCS}/{BASE_VECS} base",
        "documents/embeddings rows, constant duplicate rate, isotropic",
        f"dim-{DIM} vectors), median of {args.runs} warm runs on local[*].",
        "The interesting number is the LAST growth ratio: a quadratic",
        "pair generator would show ≥9× time from 3×→10× data (≈3.3×",
        "rows); a scan-bound linear one shows ≈3×, less while the job",
        "floor still contributes.",
        "",
        "| query | " + " | ".join(f"x{m} rows" for m in sizes) + " | "
        + " | ".join(f"x{m} s" for m in sizes)
        + f" | growth x{sizes[-2]}→x{sizes[-1]}"
        + f" (data {sizes[-1] / sizes[-2]:.2f}×) |",
        "|---|" + "---|" * (2 * len(sizes) + 1),
    ]
    for q in queries:
        r = results[q]
        growth = (
            round(r[f"x{sizes[-1]}"] / r[f"x{sizes[-2]}"], 2)
            if len(sizes) >= 2 and r[f"x{sizes[-2]}"] > 0
            else float("nan")
        )
        lines.append(
            f"| {q} | "
            + " | ".join(str(rowcounts[q][f"x{m}"]) for m in sizes)
            + " | "
            + " | ".join(f"{r[f'x{m}']}" for m in sizes)
            + f" | {growth}× |"
        )
    doc = os.path.join(os.path.dirname(here), "docs", "SCALING.md")
    if args.queries:
        # restricted run -> refresh only the appendix section, keep the
        # committed main table untouched
        header = "## Extended decades"
        lines[0] = header
        lines[2:10] = [
            "Deeper growth points for the queries whose data term is",
            "visible past the job floor (VERDICT r07 item 8), same",
            "generator and medians as above; the last column is the",
            f"final step's time ratio vs its ≈{sizes[-1]/sizes[-2]:.2f}× data ratio.",
        ]
        body = open(doc).read().split("\n" + header)[0].rstrip()
        with open(doc, "w") as f:
            f.write(body + "\n\n" + "\n".join(lines) + "\n")
    else:
        with open(doc, "w") as f:
            f.write("\n".join(lines) + "\n")
    print(f"wrote {doc}", flush=True)


if __name__ == "__main__":
    main()
