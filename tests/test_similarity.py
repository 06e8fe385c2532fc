"""Similarity search operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.operators.similarity import (
    ann_search,
    cell_centroids,
    normalize_vectors,
    topk_cosine,
)


@pytest.fixture(scope="module")
def vectors(spark):
    return spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (1, [0.9, 0.1], 0),
            (2, [0.0, 1.0], 1),
            (3, [0.1, 0.9], 1),
            (4, [-1.0, 0.0], 2),
            (5, [1.0, 0.0], 0),  # same direction as query, higher id than 0
        ],
        "vec_id long, embedding array<double>, label int",
    )


def test_topk_ranking_and_tiebreak(spark, vectors):
    rows = topk_cosine(vectors, [1.0, 0.0], k=3).collect()
    # ids 0 and 5 both have cosine 1.0 -> tie broken by id asc
    assert [r["vec_id"] for r in rows] == [0, 5, 1]
    assert rows[0]["cosine"] == 1.0


def test_topk_k_bound(spark, vectors):
    assert topk_cosine(vectors, [1.0, 0.0], k=2).count() == 2


def test_topk_plan_uses_take_ordered(spark, vectors):
    # ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
    # top-k, no global sort) — the plan shape that scales
    plan = (
        topk_cosine(vectors, [1.0, 0.0], k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_cell_centroids_means(spark, vectors):
    rows = {r["cell"]: r for r in cell_centroids(vectors, "label").collect()}
    assert rows[0]["centroid"] == pytest.approx([29 / 30, 1 / 30])
    assert rows[0]["n"] == 3
    assert rows[1]["centroid"] == pytest.approx([0.05, 0.95])
    assert rows[2]["centroid"] == pytest.approx([-1.0, 0.0])


def test_ann_probe_restricts_then_matches_bruteforce_when_probing_all(spark, vectors):
    cents = [
        (r["cell"], list(r["centroid"]))
        for r in cell_centroids(vectors, "label").collect()
    ]
    # probing 1 cell: only label-0 vectors can appear
    got = ann_search(vectors, cents, [1.0, 0.0], k=5, n_probe=1)
    assert {r["vec_id"] for r in got.collect()} == {0, 1, 5}
    # probing all cells == exact brute force
    exact = [r["vec_id"] for r in topk_cosine(vectors, [1.0, 0.0], k=4).collect()]
    approx = [
        r["vec_id"]
        for r in ann_search(vectors, cents, [1.0, 0.0], k=4, n_probe=3).collect()
    ]
    assert exact == approx


def test_normalize_vectors(spark, vectors):
    withz = vectors.union(
        spark.createDataFrame([(9, [0.0, 0.0], 3)], vectors.schema)
    )
    out = {r["vec_id"]: r["embedding_norm"] for r in normalize_vectors(withz).collect()}
    assert out[1] == pytest.approx([0.9 / (0.81 + 0.01) ** 0.5, 0.1 / (0.82) ** 0.5])
    assert out[9] is None  # zero vector -> NULL, not NaN


def test_trained_ivf_full_probe_equals_bruteforce(spark):
    from flink_kmeans_clustering_spark.operators.similarity import (
        ann_search,
        ivf_index,
        topk_cosine,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    [q] = emb.filter("vec_id = 0").select("embedding").collect()
    qv = [float(v) for v in q["embedding"]]
    assigned, cents = ivf_index(emb, n_cells=4)
    full = ann_search(assigned, cents, qv, k=5, n_probe=4, cell_col="cell")
    brute = topk_cosine(emb, qv, k=5)
    assert [r["vec_id"] for r in full.collect()] == [
        r["vec_id"] for r in brute.collect()
    ]

    # probing fewer cells returns k rows from the probed subset only
    probed = ann_search(assigned, cents, qv, k=5, n_probe=1, cell_col="cell")
    assert probed.count() == 5


def test_ann_lsh_self_hit_and_determinism(spark):
    from flink_kmeans_clustering_spark.operators.similarity import ann_lsh

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    [q] = emb.filter("vec_id = 0").select("embedding").collect()
    qv = [float(v) for v in q["embedding"]]
    a = ann_lsh(emb, qv, k=10).collect()
    # the query vector is in its own bucket -> always a candidate, and
    # cosine(q, q) = 1.0 ranks first
    assert a[0]["vec_id"] == 0 and a[0]["cosine"] == 1.0
    # deterministic: seeded planes, fixed probe order
    b = ann_lsh(emb, qv, k=10).collect()
    assert [(r["vec_id"], r["cosine"]) for r in a] == [
        (r["vec_id"], r["cosine"]) for r in b
    ]


def test_ann_lsh_results_come_from_brute_force_ranking(spark):
    from flink_kmeans_clustering_spark.operators.similarity import ann_lsh, topk_cosine

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    [q] = emb.filter("vec_id = 0").select("embedding").collect()
    qv = [float(v) for v in q["embedding"]]
    exact = {
        r["vec_id"]: r["cosine"] for r in topk_cosine(emb, qv, k=500).collect()
    }
    approx = ann_lsh(emb, qv, k=10).collect()
    # every LSH hit carries the same cosine the exact path computes,
    # and approximate ranks are consistent with exact scores
    sims = [r["cosine"] for r in approx]
    assert sims == sorted(sims, reverse=True)
    for r in approx:
        assert exact[r["vec_id"]] == r["cosine"]


def test_ann_lsh_is_shuffle_free(spark):
    from flink_kmeans_clustering_spark.operators.similarity import ann_lsh
    from flink_kmeans_clustering_spark.plans import shuffle_count

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    [q] = emb.filter("vec_id = 0").select("embedding").collect()
    qv = [float(v) for v in q["embedding"]]
    # bucket assignment + probe filter are narrow; top-k is
    # TakeOrderedAndProject -> zero exchanges end to end
    assert shuffle_count(ann_lsh(emb, qv, k=10)) == 0


def test_ann_quantized_full_shortlist_equals_exact(spark, vectors):
    from flink_kmeans_clustering_spark.operators.similarity import ann_quantized

    q = [1.0, 0.0]
    exact = [(r["vec_id"], r["cosine"]) for r in topk_cosine(vectors, q, k=3).collect()]
    # shortlist covering every row -> the rerank stage IS brute force
    approx = [
        (r["vec_id"], r["cosine"])
        for r in ann_quantized(vectors, q, k=3, shortlist=100).collect()
    ]
    assert approx == exact


def test_ann_quantized_scores_are_bounded_and_close(spark):
    import numpy as np

    from flink_kmeans_clustering_spark.operators.similarity import ann_quantized

    rs = np.random.RandomState(3)
    vecs = rs.standard_normal((60, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    q = [float(x) for x in vecs[0]]
    rows = ann_quantized(df, q, k=10, shortlist=30).collect()
    assert len(rows) == 10
    assert rows[0]["vec_id"] == 0  # self-match survives quantization
    for r in rows:
        # int8 quantization error bound: scores stay within a few percent
        assert abs(r["approx_cosine"] - r["cosine"]) < 0.05
        assert -1.000001 <= r["cosine"] <= 1.000001


def test_ann_quantized_zero_vector_excluded(spark):
    from flink_kmeans_clustering_spark.operators.similarity import ann_quantized

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [0.5, 0.5])],
        "vec_id long, embedding array<double>",
    )
    ids = {r["vec_id"] for r in ann_quantized(df, [1.0, 0.0], k=5).collect()}
    assert 1 not in ids  # amax=0 row cannot be quantized; never a candidate
    assert {0, 2} == ids


def test_knn_join_matches_per_query_topk(spark):
    import numpy as np

    from flink_kmeans_clustering_spark.operators.similarity import (
        knn_join,
        topk_cosine,
    )

    rng = np.random.RandomState(5)
    vecs = rng.standard_normal((30, 4))
    df = spark.createDataFrame(
        [(i, [float(v) for v in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    corpus = df.filter("vec_id >= 3")
    queries = df.filter("vec_id < 3")
    got = knn_join(corpus, queries, k=4, query_id_col="vec_id").collect()
    assert len(got) == 3 * 4
    for qid in range(3):
        mine = [
            (r["neighbor_id"], r["cosine"], r["rnk"])
            for r in got
            if r["query_id"] == qid
        ]
        mine.sort(key=lambda t: t[2])
        want = topk_cosine(corpus, [float(v) for v in vecs[qid]], k=4).collect()
        assert [(m[0], m[1]) for m in mine] == [
            (w["vec_id"], w["cosine"]) for w in want
        ]


def test_knn_join_drops_zero_vectors(spark):
    from flink_kmeans_clustering_spark.operators.similarity import knn_join

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(0, [1.0, 1.0])], "vec_id long, embedding array<double>"
    )
    got = knn_join(corpus, queries, k=5, query_id_col="vec_id").collect()
    # the zero vector has NULL cosine: never ranked, never displaces
    assert sorted(r["neighbor_id"] for r in got) == [2, 3]


def test_pq_recall_and_exactness_of_rerank(spark):
    """PQ/ADC must surface most of the true top-k (recall ≥ 0.7 with
    16 codewords on this corpus) and its reranked distances must equal
    the exact distances for every id it returns."""
    from flink_kmeans_clustering_spark.operators.similarity import (
        ann_pq,
        pq_codebooks_first,
        topk_cosine,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    [q] = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qv = [float(v) for v in q["embedding"]]
    books = pq_codebooks_first(emb, m=8, k=16)
    # shortlist 100/500: the trainless 16-codeword books are crude by
    # design (the oracle contract); recall scales with the shortlist
    got = {
        r["vec_id"]: r["d2"]
        for r in ann_pq(emb, qv, books, k=10, shortlist=100).collect()
    }
    # exact top-10 by L2 == top-10 by cosine here only if normalized;
    # compute the exact L2 top-10 directly
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    d2 = F.aggregate(
        F.zip_with(vec, F.lit(qv), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    exact = {
        r["vec_id"]: r["d2"]
        for r in emb.select("vec_id", F.round(d2, 6).alias("d2"))
        .orderBy("d2", "vec_id")
        .limit(10)
        .collect()
    }
    overlap = set(got) & set(exact)
    assert len(overlap) >= 7, (sorted(got), sorted(exact))
    for vid in overlap:
        assert got[vid] == exact[vid]
    assert got[0] == 0.0  # the query vector itself


def test_pq_trained_codebooks_same_plumbing(spark):
    """The per-subspace k-means codebooks flow through the identical
    encode/ADC/rerank path and must also place the query vector first."""
    from flink_kmeans_clustering_spark.operators.similarity import (
        ann_pq,
        pq_codebooks_trained,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    [q] = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    qv = [float(v) for v in q["embedding"]]
    books = pq_codebooks_trained(emb, m=8, k=8, iters=2)
    rows = ann_pq(emb, qv, books, k=5).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["d2"] == 0.0
    assert len(rows) == 5


def test_pq_grouped_trainer_equals_per_subspace_lloyd(spark):
    """The grouped one-job-per-iteration PQ trainer must land on the
    same codebooks as m independent lloyd_nd runs (same init, same
    iteration count) — the scale path may not change the math.  Equal
    up to distributed-sum rounding (~1 ulp), hence allclose."""
    import numpy as np

    from flink_kmeans_clustering_spark.operators.similarity import (
        pq_codebooks_trained,
        pq_codebooks_trained_grouped,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = pq_codebooks_trained(emb, m=8, k=8, iters=2)
    b = pq_codebooks_trained_grouped(emb, m=8, k=8, iters=2)
    assert len(a) == len(b) == 8
    for s in range(8):
        assert len(a[s]) == len(b[s]), f"subspace {s} codeword count"
        assert np.allclose(np.array(a[s]), np.array(b[s]), atol=1e-9), s


def _synth64(spark, n=24):
    # deterministic 64-dim corpus with mixed signs
    rows = [
        (
            i,
            [
                (((i * 37 + j * 11) % 19) - 9) / 7.0
                for j in range(64)
            ],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ann_binary_codes_match_python_packing(spark):
    from flink_kmeans_clustering_spark.operators.similarity import (
        _sign_word,
        _sign_words_py,
    )

    df = _synth64(spark)
    got = {
        r["vec_id"]: (r["lo"], r["hi"])
        for r in df.select(
            "vec_id",
            _sign_word(F.col("embedding"), 0).alias("lo"),
            _sign_word(F.col("embedding"), 32).alias("hi"),
        ).collect()
    }
    for r in df.collect():
        assert got[r["vec_id"]] == _sign_words_py(r["embedding"])


def test_ann_binary_self_hit_and_full_shortlist_equals_exact(spark):
    from flink_kmeans_clustering_spark.operators.similarity import ann_binary

    df = _synth64(spark)
    [q] = df.filter(F.col("vec_id") == 0).collect()
    query = [float(x) for x in q["embedding"]]
    rows = ann_binary(df, query, k=5, shortlist=1000).collect()
    # query's own vector: hamming 0, cosine 1.0, ranked first
    assert rows[0]["vec_id"] == 0
    assert rows[0]["hamming"] == 0
    assert rows[0]["cosine"] == 1.0
    # shortlist covering the corpus -> rerank == exact brute force
    exact = topk_cosine(df, query, k=5).collect()
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in exact]
    assert [r["cosine"] for r in rows] == [r["cosine"] for r in exact]


def test_ann_binary_both_cuts_take_ordered(spark):
    from flink_kmeans_clustering_spark.operators.similarity import ann_binary

    df = _synth64(spark)
    [q] = df.filter(F.col("vec_id") == 0).collect()
    plan = (
        ann_binary(df, [float(x) for x in q["embedding"]], k=5, shortlist=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan  # no shuffle anywhere: narrow scan + 2 cuts


def test_ann_binary_requires_64_dims(spark, vectors):
    from flink_kmeans_clustering_spark.operators.similarity import ann_binary

    with pytest.raises(ValueError, match="64"):
        ann_binary(vectors, [1.0, 0.0], k=2)


def test_hard_negative_mining_band(spark):
    """The negative band excludes the anchor (rank 1, cosine 1.0) and
    the presumed-positive head, and returns exactly k rows per anchor
    with ranks in (skip, skip+k]."""
    from flink_kmeans_clustering_spark.operators.similarity import (
        hard_negative_mining,
        knn_join,
    )

    import math

    # 12 unit vectors on a 2-D fan: cosine to anchor 0 decreases with id
    rows = [
        (i, [math.cos(i * 0.1), math.sin(i * 0.1)]) for i in range(12)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    anchors = emb.filter("vec_id = 0")
    neg = hard_negative_mining(
        emb, anchors, k=3, skip=4, query_id_col="vec_id"
    ).collect()
    assert len(neg) == 3
    assert {r["rnk"] for r in neg} == {5, 6, 7}
    assert all(r["neighbor_id"] != 0 for r in neg)
    # the fan ordering makes rank == neighbor_id + 1 for anchor 0
    assert sorted(r["neighbor_id"] for r in neg) == [4, 5, 6]
    # consistency with knn_join's ranking on the same corpus
    deep = {
        r["neighbor_id"]: r["rnk"]
        for r in knn_join(emb, anchors, k=7, query_id_col="vec_id").collect()
    }
    for r in neg:
        assert deep[r["neighbor_id"]] == r["rnk"]


def test_filtered_knn_join_prefilters(spark):
    """Ranks are computed WITHIN the filtered corpus: excluded ids
    never appear, and the k results are the best among survivors (not
    a post-filtered global top-k, which could return < k rows)."""
    import math

    from flink_kmeans_clustering_spark.operators.similarity import (
        filtered_knn_join,
        knn_join,
    )

    rows = [(i, [math.cos(i * 0.1), math.sin(i * 0.1)]) for i in range(10)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    meta = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(10)],
        "doc_id long, lang string",
    )
    anchors = emb.filter("vec_id = 0")
    got = filtered_knn_join(
        emb, meta, anchors, F.col("lang") == "en", k=3, query_id_col="vec_id"
    ).collect()
    assert len(got) == 3
    assert all(r["neighbor_id"] % 2 == 0 for r in got)
    # equals knn_join over the manually filtered corpus
    want = knn_join(
        emb.filter("vec_id % 2 = 0"), anchors, k=3, query_id_col="vec_id"
    ).collect()
    assert sorted((r["neighbor_id"], r["rnk"]) for r in got) == sorted(
        (r["neighbor_id"], r["rnk"]) for r in want
    )


def test_pq_codes_sql_equals_column_form(spark):
    """_pq_codes_sql (the selectExpr-authored twin) must produce the
    same codes as the Column-built _pq_codes for a ragged codebook —
    the contract that let ann_pq move to one-py4j-call plan
    construction (VERDICT r10 item 4)."""
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.operators.similarity import (
        _pq_codes,
        _pq_codes_sql,
    )

    books = [
        [[0.0, 0.0], [1.0, 1.0], [2.5, -1.0]],
        [[5.0, 5.0], [-3.25, 0.5]],  # ragged: 3 vs 2 codewords
    ]
    df = spark.createDataFrame(
        [([0.1, 0.2, 4.9, 5.2],), ([2.4, -0.8, -3.0, 0.0],),
         ([1.0, 1.0, 5.0, 5.0],), ([9.0, -9.0, 9.0, -9.0],)],
        "embedding array<double>",
    )
    vec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    col_form = df.select(_pq_codes(vec, books).alias("codes")).collect()
    sql_form = df.selectExpr(
        _pq_codes_sql(
            "transform(embedding, x -> CAST(x AS DOUBLE))", books
        )
        + " AS codes"
    ).collect()
    assert [r["codes"] for r in col_form] == [r["codes"] for r in sql_form]
