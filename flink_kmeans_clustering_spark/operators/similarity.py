"""Similarity search over embedding columns (SURVEY.md §2.6).

Two paths, one semantics:

* :func:`topk_cosine` — exact brute-force top-k.  The ORDER BY + LIMIT
  plan compiles to ``TakeOrderedAndProject``: each partition keeps its
  own k best rows and only k·partitions rows ever reach the driver — no
  global sort, no shuffle of the scan.  This is the right baseline even
  at cluster scale (it's a single pass over the data).
* :func:`ann_search` — IVF-style approximate search: vectors are
  pre-assigned to coarse cells (k-means centroids at corpus scale —
  see :mod:`~flink_kmeans_clustering_spark.operators.kmeans_ml`); a
  query ranks the cell centroids driver-side, probes the best
  ``n_probe`` cells, and brute-forces only inside them.  With the table
  written partitioned-by-cell, the probe filter becomes partition
  pruning — the 100 TB scan shrinks to the probed cells' files.

All vector arithmetic is JVM-side (functions.vector); query vectors
enter the plan as literal arrays.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.operators.common import (
    array_lit,
    array_lit_sql,
)
from flink_kmeans_clustering_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
)


def _query_lit(query_vec: Sequence[float]):
    return F.array(*[F.lit(float(v)) for v in query_vec])


def topk_cosine(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k rows by cosine similarity to a literal query vector.

    Deterministic order: (similarity DESC, id ASC); ties at equal
    (rounded) similarity always resolve the same way.  ``round_to``
    rounds the similarity *before* ranking so an independent engine
    computing the same values in a different summation order ranks
    identically (oracle determinism, FIXTURES.md).

    Rows whose vector length differs from the query get NULL cosine
    (``zip_with`` null-pads) and sort last — they never displace a
    real result.
    """
    sim = cosine_similarity(F.col(vec_col).cast("array<double>"), _query_lit(query_vec))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = df.select(F.col(id_col), sim.alias("cosine"))
    return scored.orderBy(F.desc("cosine"), F.col(id_col)).limit(k)


def cell_centroids(
    df: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-cell mean vector: (cell, centroid array<double>, n).

    posexplode → (cell, dim) partial-sum aggregation → re-assemble via
    sorted collect_list.  The exploded shuffle is (rows × dim) but
    map-side combine collapses it to (cells × dim) before the exchange.
    """
    ex = df.select(
        F.col(cell_col).alias("cell"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    per_dim = ex.groupBy("cell", "pos").agg(
        F.avg("v").alias("mean_v"), F.count(F.lit(1)).alias("n")
    )
    return per_dim.groupBy("cell").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "mean_v"))),
            lambda s: s["mean_v"],
        ).alias("centroid"),
        F.first("n").alias("n"),
    )


def ann_search(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    cell_col: str = "label",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """IVF probe search: rank cells driver-side, scan only the best cells.

    ``centroids`` is the small driver-side cell → centroid list (from
    :func:`cell_centroids` ``.collect()`` or an MLlib k-means model).
    The ``isin(probed)`` filter is pushed into the scan; on a
    cell-partitioned table that is partition pruning.
    """
    import math

    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        return num / den if den else 0.0

    ranked = sorted(
        centroids, key=lambda c: (-cos(c[1], list(query_vec)), c[0])
    )
    probed = [c[0] for c in ranked[:n_probe]]
    pruned = df.filter(F.col(cell_col).isin(probed))
    return topk_cosine(
        pruned, query_vec, k=k, id_col=id_col, vec_col=vec_col, round_to=round_to
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """k-NN JOIN: top-k cosine neighbors per QUERY ROW (a batch of
    queries, not one literal vector — the retrieval shape of embedding
    pipelines: "for every eval prompt, its nearest training docs").

    Execution: the query side is broadcast (it is small by contract —
    a query batch, not a corpus), so the corpus is scanned ONCE with no
    shuffle for the join; the per-query ranking is a window
    ``row_number() ≤ k`` which Spark compiles to ``WindowGroupLimit`` —
    each input partition pre-filters to its own top-k per query BEFORE
    the single shuffle on query_id, so the exchange carries at most
    k·queries·partitions rows instead of queries×corpus.  At 100 TB
    this is the scan-bound plan: broadcast, narrow score, bounded
    exchange.

    Determinism (FIXTURES.md): cosine rounded to ``round_to`` BEFORE
    ranking, ties broken by neighbor id ascending; NULL cosines
    (zero vectors) are filtered, never ranked.

    Output: (query_id, neighbor_id, cosine, rnk), rnk in 1..k.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    sim = cosine_similarity(F.col("_v"), F.col("_qv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    scored = (
        c.join(F.broadcast(q))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def normalize_vectors(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Add ``<vec_col>_norm``: the L2-normalized vector (array<double>).

    Pre-normalizing once turns every later cosine into a plain dot
    product — the standard preparation pass for a similarity corpus.
    """
    v = F.col(vec_col).cast("array<double>")
    nrm = l2_norm(v)
    return df.withColumn(
        f"{vec_col}_norm",
        F.when(nrm != 0.0, F.transform(v, lambda x: x / nrm)),
    )


def ivf_index(
    df: DataFrame,
    n_cells: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    max_iter: int = 10,
):
    """Train a real IVF index: k-means cells learned from the data.

    Returns ``(assigned, centroids)``: the input with a ``cell`` column
    (MLlib k-means|| assignment) and the driver-side cell→centroid list
    for :func:`ann_search`.  On a production corpus the assigned table
    is written partitioned by ``cell`` so probe filters become partition
    pruning; cells should hold ~10³-10⁴ vectors (n_cells ≈ N/4096).
    """
    from flink_kmeans_clustering_spark.operators.kmeans_ml import fit_kmeans_ml

    res = fit_kmeans_ml(
        df, k=n_cells, features_col=vec_col, max_iter=max_iter, seed=seed
    )
    assigned = res.predictions.withColumnRenamed("cluster", "cell")
    return assigned, [(cid, vec) for cid, vec in res.centroids]


def random_hyperplanes(n_planes: int, dim: int, seed: int = 7) -> list[list[float]]:
    """Deterministic seeded Gaussian hyperplanes for sign-LSH.

    Generated driver-side (numpy PCG via RandomState for cross-version
    stability) and passed into plans / oracles as float64 literals, so
    any engine sharing the literals buckets identically.
    """
    import numpy as np

    rs = np.random.RandomState(seed)
    return [[float(v) for v in row] for row in rs.standard_normal((n_planes, dim))]


def lsh_bucket(vec, planes: list[list[float]]):
    """Sign-LSH bucket id of an array column: bit i = (vec · plane_i) > 0.

    A narrow in-scan expression — at corpus scale the bucket id is the
    column you write ``partitionBy``, making probe filters partition
    pruning exactly like IVF cells.
    """
    bits = [
        F.when(dot(vec, F.array(*[F.lit(v) for v in p])) > 0.0, F.lit(1 << i)).otherwise(
            F.lit(0)
        )
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def ann_lsh(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    n_planes: int = 4,
    seed: int = 7,
    max_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
):
    """LSH-bucketed ANN: sign-random-projection buckets, multi-probe.

    The scale path when no trained IVF index exists: bucket assignment
    is pure per-row arithmetic computed in-scan (no training job, no
    shuffle), and the query probes its own bucket plus all buckets
    within ``max_hamming`` bit flips — the standard multi-probe recall
    fix for near-boundary vectors.  The probe set is computed
    driver-side (2^n_planes is small by construction) and pushed as an
    ``isin`` filter → partition pruning on a bucket-partitioned table.

    Candidates are exactly re-ranked by :func:`topk_cosine`, so output
    columns and determinism rules match the exact path.
    """
    planes = random_hyperplanes(n_planes, len(query_vec), seed)
    qbits = [
        1 << i
        for i, p in enumerate(planes)
        if sum(x * y for x, y in zip(query_vec, p)) > 0.0
    ]
    qbucket = sum(qbits)
    probe = [qbucket]
    if max_hamming >= 1:
        probe += [qbucket ^ (1 << i) for i in range(n_planes)]
    # max_hamming > 1 not needed at these bucket counts; extend with
    # itertools.combinations over bit pairs if it ever is.
    bucketed = df.withColumn(
        "_bucket", lsh_bucket(F.col(vec_col).cast("array<double>"), planes)
    )
    pruned = bucketed.filter(F.col("_bucket").isin(probe)).drop("_bucket")
    return topk_cosine(
        pruned, query_vec, k=k, id_col=id_col, vec_col=vec_col, round_to=round_to
    )


def _quantize_query_int8(query_vec: Sequence[float]) -> list[int]:
    """Driver-side int8 quantization of the query vector.

    Half-away-from-zero rounding — the rule both Spark's ``F.round``
    and DuckDB's ``round`` apply to doubles — so the literal the plan
    embeds equals what either engine computes from the same values.
    """
    import math

    amax = max(abs(float(v)) for v in query_vec)
    if amax == 0.0:
        return [0 for _ in query_vec]
    scale = 127.0 / amax
    return [
        int(math.floor(abs(float(v)) * scale + 0.5)) * (1 if v >= 0 else -1)
        for v in query_vec
    ]


def ann_quantized(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Two-stage ANN over int8 scalar-quantized vectors.

    The memory-bound scale path: per-vector symmetric quantization
    (scale = 127 / max|x|) shrinks a float32 corpus 4× — at 100 TB
    that is the difference between spilling and RAM-resident scans —
    and the first-pass score is an integer dot product.  Every product
    |q| ≤ 127² and a 64-dim sum stays < 2²⁰, so the int arithmetic is
    EXACT in doubles and bit-identical across engines.  The shortlist
    (top ``shortlist`` by quantized cosine, id-tie-broken) is then
    re-ranked with the full-precision cosine — both stages compile to
    TakeOrderedAndProject, no global sort.

    Output: (vec_id, approx_cosine, cosine) — the quantized score is
    kept beside the exact one so recall loss is observable.
    """
    qq = _quantize_query_int8(query_vec)
    import math

    qn = math.sqrt(sum(x * x for x in qq))
    v = F.col(vec_col).cast("array<double>")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.lit(127.0) / amax
    qv = F.transform(v, lambda x: F.round(x * scale, 0))
    base = df.select(
        F.col(id_col),
        v.alias("_v"),
        F.when(amax > 0.0, qv).alias("_q"),
    ).filter(F.col("_q").isNotNull())
    qlit = F.array(*[F.lit(float(x)) for x in qq])
    qdot = dot(F.col("_q"), qlit)
    qrow_norm = l2_norm(F.col("_q"))
    approx = qdot / (qrow_norm * F.lit(qn))
    if round_to is not None:
        approx = F.round(approx, round_to)
    scored = base.select(
        F.col(id_col), "_v", approx.alias("approx_cosine")
    ).filter(F.col("approx_cosine").isNotNull())
    short = scored.orderBy(F.desc("approx_cosine"), F.col(id_col)).limit(shortlist)
    exact = cosine_similarity(F.col("_v"), _query_lit(query_vec))
    if round_to is not None:
        exact = F.round(exact, round_to)
    return (
        short.select(F.col(id_col), "approx_cosine", exact.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _sign_word(vec, offset: int, width: int = 32):
    """Pack ``width`` sign bits (v[offset+i] > 0 → bit i) into a long.

    The fold sums exact powers of two in doubles (every 2^i for
    i < 32 is exactly representable, and the sum < 2^32 < 2^53), then
    casts — pure built-in arithmetic, identical in any IEEE engine, no
    shift builtins whose signedness rules differ across engines.
    """
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(width - 1)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.when(
            F.element_at(vec, i + F.lit(offset + 1)) > 0.0,
            F.pow(F.lit(2.0), i.cast("double")),
        ).otherwise(F.lit(0.0)),
    ).cast("long")


def _sign_words_py(query_vec: Sequence[float]) -> tuple[int, int]:
    """Driver-side twin of :func:`_sign_word` for the query literal."""
    lo = sum(1 << i for i in range(32) if query_vec[i] > 0.0)
    hi = sum(1 << i for i in range(32) if query_vec[32 + i] > 0.0)
    return lo, hi


def ann_binary(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Two-stage ANN over 1-bit (sign-binarized) vectors.

    The extreme-compression scale path: each 64-dim float vector
    collapses to TWO 32-bit sign words — 32× smaller than float32, the
    representation that keeps a 100 TB embedding corpus's first-pass
    index in memory on a modest cluster.  The first-pass score is the
    Hamming distance to the query's code (``bit_count(xor)`` — integer
    ALU work inside whole-stage codegen, no float math at all); the
    ``shortlist`` best (Hamming ASC, id ASC — exact integer ordering,
    fully deterministic) are re-ranked by exact cosine.  Both cuts
    compile to TakeOrderedAndProject: no global sort, k·partitions
    rows to the driver.

    Unlike :func:`ann_lsh` (random hyperplanes → bucket pruning), the
    code here IS the data's own sign pattern — no projection matrix to
    ship, and distance is RANKED (graded recall) rather than
    bucket-thresholded.

    Output: (vec_id, hamming, cosine).
    """
    if len(query_vec) != 64:
        raise ValueError("ann_binary packs exactly 64 dims (2×32-bit words)")
    qlo, qhi = _sign_words_py(query_vec)
    v = F.col(vec_col).cast("array<double>")
    coded = df.filter(F.size(F.col(vec_col)) == 64).select(
        F.col(id_col),
        v.alias("_v"),
        _sign_word(v, 0).alias("_lo"),
        _sign_word(v, 32).alias("_hi"),
    )
    hamming = (
        F.bit_count(F.col("_lo").bitwiseXOR(F.lit(qlo)))
        + F.bit_count(F.col("_hi").bitwiseXOR(F.lit(qhi)))
    ).cast("int")
    short = (
        coded.select(F.col(id_col), "_v", hamming.alias("hamming"))
        .orderBy(F.col("hamming"), F.col(id_col))
        .limit(shortlist)
    )
    exact = cosine_similarity(F.col("_v"), _query_lit(query_vec))
    if round_to is not None:
        exact = F.round(exact, round_to)
    return (
        short.select(F.col(id_col), "hamming", exact.alias("cosine"))
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def pq_codebooks_first(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Data-derived PQ codebooks WITHOUT a training job: codeword c of
    subspace s is the s-th subvector of the (c+1)-th vector by id.

    The deterministic, any-engine-replayable codebook contract the
    CHECKED query uses (same family split as the md5 hash lanes);
    production trains each subspace with :func:`pq_codebooks_trained`
    — the encode/ADC/rerank plumbing is identical either way.
    Returns ``codebooks[s][c] = list[d/m floats]``.
    """
    rows = df.orderBy(id_col).limit(k).collect()
    vecs = [[float(v) for v in r[vec_col]] for r in rows]
    dim = len(vecs[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [[vec[s * d : (s + 1) * d] for vec in vecs] for s in range(m)]


def pq_codebooks_trained(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Production PQ codebooks: an independent distributed Lloyd
    (:func:`~flink_kmeans_clustering_spark.operators.kmeans.lloyd_nd`)
    per subspace over that subspace's subvectors.  Deterministic given
    the data — init is the first k subvectors BY ``id_col`` (a bare
    ``limit`` without a sort would be partition/file-order dependent),
    but 8 k-means jobs — the checked query keeps the trainless contract
    above."""
    from flink_kmeans_clustering_spark.operators.kmeans import lloyd_nd

    dim = len(df.select(vec_col).head()[vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    books = []
    for s in range(m):
        sub = df.select(
            F.slice(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                s * d + 1,
                d,
            ).alias("embedding")
        )
        init = [
            [float(v) for v in r[vec_col][s * d : s * d + d]]
            for r in init_rows
        ]
        cents, _, _ = lloyd_nd(sub, init, max_iterations=iters)
        books.append(cents)
    return books


def pq_codebooks_trained_grouped(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """All ``m`` subspace k-means trained in ONE grouped Lloyd — the
    scale-right PQ trainer.

    :func:`pq_codebooks_trained` runs m independent lloyd_nd jobs →
    m·iters corpus passes.  Here the corpus is exploded ONCE into
    (subspace, subvector) rows and every iteration is a single job:
    a narrow literal-argmin assignment (the m×k×d codebook matrix is
    one array literal; per-row cost is the same m·k distance evals the
    per-subspace form pays in aggregate) and ONE groupBy(s, code)
    per-dim mean — so the shuffle carries m·k rows and the corpus is
    scanned iters times instead of m·iters.  Codeword ids are
    PERSISTENT per subspace (an emptied cluster's id retires —
    lloyd_nd semantics), and the returned list orders codewords by
    surviving id, matching the replaying oracle's dense re-rank.

    Deterministic given the data: init = the first k vectors by
    ``id_col``, sliced per subspace.  Returns
    ``codebooks[s][c] = list[d/m floats]`` (possibly ragged).
    """
    init_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    dim = len(init_rows[0][vec_col])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    books = [
        [[float(v) for v in r[vec_col][s * d : (s + 1) * d]] for r in init_rows]
        for s in range(m)
    ]
    ids: list[list[int]] = [list(range(len(b))) for b in books]

    from flink_kmeans_clustering_spark.operators.common import spread

    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # _spread before the explode+cache (r14): a single-file corpus
    # otherwise leaves the cached subvector table on ONE partition and
    # every iteration's interpreted argmin runs serially (measured
    # 1.7 s single-task assignment stages at sf0.1); pass-through at
    # scale, and the trained books are partition-independent (grouped
    # sums) — re-hash-verified at 3 scales.
    sub = (
        spread(df, id_col).select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.struct(
                        s.cast("int").alias("s"),
                        F.slice(vec, s * d + 1, d).alias("sv"),
                    ),
                )
            ).alias("p")
        )
        .select(F.col("p.s").alias("s"), F.col("p.sv").alias("sv"))
        .cache()
    )
    # Per-iteration plan construction is selectExpr-authored (the
    # Lloyd-cut pattern, VERDICT r10 item 4): the Column-by-Column
    # assignment cost ~30 py4j round trips per iteration on top of the
    # two array-literal parses; one f-string parses JVM-side into the
    # SAME expression tree (zip_with/aggregate fold, struct argmin with
    # lowest-code ties), so the trained codebooks are bit-identical —
    # the CTE-replaying oracle's hashes are unchanged.  The
    # value-INdependent aggregation Columns are hoisted out of the loop.
    sums = [
        F.sum(F.element_at("sv", j + 1)).alias(f"_s{j}") for j in range(d)
    ]
    n_agg = F.count(F.lit(1)).alias("n")
    # Loop-local exchange sizing (the Lloyd pattern, kmeans.py): the
    # update shuffle carries ≤ m·k tiny rows, so 32 reduce tasks per
    # iteration is pure scheduling overhead — m partitions suffice and
    # AQE has nothing to re-plan on a k-row exchange.  Trained books
    # verified bit-identical at shuffle.partitions ∈ {1, 8, 32}
    # (measured ~0.55 s/call saved at sf0.1); conf restored in finally.
    conf = df.sparkSession.conf
    prev_aqe = conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = conf.get("spark.sql.shuffle.partitions", None)
    prev_cg = conf.get("spark.sql.codegen.wholeStage", "true")
    # fill the cache BEFORE the loop flips codegen off (r14): the
    # spread+explode+cast materialization is value-independent, so it
    # may as well run compiled — measured ~2.0 s as iteration 1's
    # interpreted side-effect vs ~0.4 s as its own codegen-on job; the
    # iterations then scan the same in-memory batches either way.
    sub.count()
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(max(1, m)))
        # every iteration's assignment parses FRESH codebook literals,
        # so whole-stage codegen Janino-compiles a new class per
        # iteration for a ≤16k-row job — interpreted eval skips that
        # (measured ~0.4 s/call warm at sf0.1; books verified
        # bit-identical on/off, and re-hash-matched at 3 scales)
        conf.set("spark.sql.codegen.wholeStage", "false")
        for _ in range(iters):
            cb = array_lit_sql(books)
            idl = array_lit_sql(ids, kind="int")
            assign = (
                f"array_min(transform(sequence(0, size(get({cb}, s)) - 1),"
                " c -> named_struct('dist2',"
                f" aggregate(zip_with(sv, get(get({cb}, s), c),"
                " (a, b) -> (a - b) * (a - b)), 0.0D, (acc, v) -> acc + v),"
                f" 'code', CAST(get(get({idl}, s), c) AS INT)))).code AS code"
            )
            assigned = sub.selectExpr("s", "sv", assign)
            rows = (
                assigned.groupBy("s", "code")
                .agg(*sums, n_agg)
                .collect()
            )
            books = [[] for _ in range(m)]
            ids = [[] for _ in range(m)]
            for r in sorted(rows, key=lambda r: (r["s"], r["code"])):
                ids[r["s"]].append(int(r["code"]))
                books[r["s"]].append(
                    [float(r[f"_s{j}"]) / r["n"] for j in range(d)]
                )
    finally:
        conf.set("spark.sql.adaptive.enabled", prev_aqe)
        conf.set("spark.sql.codegen.wholeStage", prev_cg)
        if prev_sp is not None:
            conf.set("spark.sql.shuffle.partitions", prev_sp)
        else:
            # never explicitly set before this call: unset instead of
            # leaking the loop-local max(1, m) value session-wide
            conf.unset("spark.sql.shuffle.partitions")
        sub.unpersist()
    return books


def _pq_codes(vec, codebooks: list[list[list[float]]]):
    """codes[s] = argmin_c ||subvector_s − codebook[s][c]||² (ties →
    lowest code), folded in index order — the column expression shared
    by encode and any future symmetric-distance scorer."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    cb = array_lit(codebooks)  # array<array<array<double>>> as ONE parsed expr

    def _code(s: int):
        # per-subspace codeword count: a trained codebook can lose an
        # emptied cluster, so subspaces may be ragged
        k = len(codebooks[s])
        sub = F.slice(vec, s * d + 1, d)
        cands = F.transform(
            F.sequence(F.lit(0), F.lit(k - 1)),
            lambda c: F.struct(
                F.aggregate(
                    F.zip_with(
                        sub,
                        F.get(F.get(cb, F.lit(s)), c),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ).alias("d2"),
                c.cast("int").alias("code"),
            ),
        )
        return F.array_min(cands)["code"]

    return F.array(*[_code(s) for s in range(m)])


def _pq_codes_sql(vec_sql: str, codebooks: list[list[list[float]]]) -> str:
    """SQL-text twin of :func:`_pq_codes` — same expression tree
    (zip_with/aggregate fold, struct argmin, lowest-code ties) authored
    as one string so a caller's whole projection parses JVM-side in a
    single py4j call (~1.4 s of measured Column-building per ann_pq
    call otherwise).  Value parity with the Column form is pinned by
    tests/test_similarity.py."""
    m = len(codebooks)
    d = len(codebooks[0][0])
    parts = []
    for s in range(m):
        k = len(codebooks[s])
        sub = f"slice({vec_sql}, {s * d + 1}, {d})"
        # embed only subspace s's k×d slice (r14 optimization): the old
        # form embedded the FULL m×k×d literal in every one of the m
        # parts — m copies of a ~15 KB text, ~1 s of parse+analyze per
        # ann_pq call at (8,16,8).  get(cb_s, c) reads the same doubles
        # as get(get(cb, s), c), so codes are bit-identical.
        cb_s = array_lit_sql(codebooks[s])
        parts.append(
            f"array_min(transform(sequence(0, {k - 1}), c -> named_struct("
            f"'d2', aggregate(zip_with({sub}, get({cb_s}, c),"
            " (a, b) -> (a - b) * (a - b)), 0.0D, (acc, v) -> acc + v),"
            " 'code', CAST(c AS INT)))).code"
        )
    return "array(" + ",".join(parts) + ")"


def ann_pq(
    df: DataFrame,
    query_vec: Sequence[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Product-quantization ANN (Jégou et al., TPAMI 2011): encode the
    corpus as m uint8 codes, score candidates with an asymmetric
    distance computation (ADC) lookup table, exact-L2 rerank the
    shortlist.

    Scale shape: the m×k LUT (distances from the query's subvectors to
    every codeword) is computed DRIVER-side and enters the plan as one
    literal — scoring a vector is m array lookups + an ordered fold,
    no join, no shuffle; both top-selections are
    TakeOrderedAndProject.  At 100 TB the encoded corpus is m bytes
    per vector instead of 4·dim — the memory-bound regime PQ exists
    for — and codes are computed once at ingest, not per query.

    Output: (vec_id, d2) — exact squared L2 of the top-k, ties to the
    lowest id at both the shortlist and final cut.
    """
    m = len(codebooks)
    d = len(codebooks[0][0])
    q = [float(v) for v in query_vec]
    # ADC lookup table, folded in subvector index order (j asc) so an
    # independent engine lands on the same doubles
    lut = [
        [
            sum((q[s * d + j] - c[j]) * (q[s * d + j] - c[j]) for j in range(d))
            for c in codebooks[s]
        ]
        for s in range(m)
    ]
    # Whole scoring projection authored as SQL text (VERDICT r10 item
    # 4 — the Lloyd-cut pattern): the Column-built form spent ~1.4 s
    # per call constructing the m-subspace argmin through py4j.  Same
    # expression trees, so d2 values and both tie-broken cuts are
    # bit-identical — oracle hashes unchanged.
    qid = "`" + id_col.replace("`", "``") + "`"
    qvec = "`" + vec_col.replace("`", "``") + "`"
    vec_sql = f"transform({qvec}, x -> CAST(x AS DOUBLE))"
    codes = _pq_codes_sql(vec_sql, codebooks)
    lut_sql = array_lit_sql(lut)
    score = (
        f"aggregate(zip_with({codes}, sequence(0, {m - 1}),"
        f" (code, s) -> get(get({lut_sql}, s), code)),"
        " 0.0D, (acc, v) -> acc + v)"
    )
    # _spread before the ADC scan (r14): the per-row scoring is an
    # interpreted m-subspace argmin (HOFs are not codegen'd), and a
    # single-file corpus otherwise scores on ONE task (measured a
    # 2.7 s single-task stage at sf0.1).  Pass-through at 100 TB where
    # the scan has splits — the shuffle-free ADC story is unchanged at
    # scale; the plan pin allows the one under-parallel rebalance.
    from flink_kmeans_clustering_spark.operators.common import spread

    short = (
        spread(df, id_col)
        .selectExpr(qid, qvec, f"{score} AS _score")
        .orderBy("_score", id_col)
        .limit(shortlist)
    )
    qlit = array_lit_sql(q)
    d2 = (
        f"aggregate(zip_with({vec_sql}, {qlit},"
        " (a, b) -> (a - b) * (a - b)), 0.0D, (acc, v) -> acc + v)"
    )
    out = (
        short.selectExpr(qid, f"{d2} AS d2")
        .orderBy("d2", id_col)
        .limit(k)
    )
    if round_to is not None:
        out = out.selectExpr(qid, f"round(d2, {round_to}) AS d2")
    return out


def ivf_knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Batch IVF ANN: per-query probed-cell top-k, fully distributed —
    the batch twin of :func:`ann_search` (which ranks cells driver-side
    for ONE query literal).  No driver loop anywhere: cell centroids,
    per-query cell ranking, the probe join, and the per-query top-k are
    all DataFrame ops, so the whole thing is one SQL-expressible plan.

    Execution shape at 100 TB: centroids are |cells| rows, the ranked
    (query, cell) probe list is |queries|·n_probe rows — both broadcast;
    the corpus is scanned ONCE and each row joins only the queries
    probing its cell (hash join on the cell key against the broadcast
    side, no corpus shuffle); the per-query ranking is a
    ``row_number() ≤ k`` window that compiles to ``WindowGroupLimit``
    (partition-local pre-filtering), so the only exchange carries at
    most k·|queries|·partitions candidate rows.  With the corpus
    written partitioned-by-cell, the probe join's cell set can instead
    prune partitions exactly like :func:`ann_search`.

    Determinism: cosine rounded BEFORE ranking, neighbor-id ascending
    tie-break; cell ranking ties break on cell id ascending — all
    replayable in any SQL engine (q_ann_recall's DuckDB oracle does).

    Output: (query_id, neighbor_id, cosine, rnk), rnk in 1..k.
    """
    from pyspark.sql import Window

    cents = cell_centroids(corpus, cell_col, vec_col).select("cell", "centroid")
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("_qv"),
    )
    csim = cosine_similarity(F.col("centroid"), F.col("_qv"))
    wq = Window.partitionBy("query_id").orderBy(F.desc("_csim"), F.col("cell"))
    probes = (
        q.join(F.broadcast(cents))
        .select("query_id", "_qv", "cell", csim.alias("_csim"))
        .withColumn("_crnk", F.row_number().over(wq))
        .filter(F.col("_crnk") <= n_probe)
        .select("query_id", "_qv", "cell")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(cell_col).alias("_cell"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    sim = cosine_similarity(F.col("_v"), F.col("_qv"))
    if round_to is not None:
        sim = F.round(sim, round_to)
    cand = (
        c.join(F.broadcast(probes), F.col("_cell") == F.col("cell"))
        .select("query_id", "neighbor_id", sim.alias("cosine"))
        .filter(F.col("cosine").isNotNull())
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


def ann_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k evaluation of the IVF index against exact search, as
    ONE distributed plan — the index-quality gate a 100 TB retrieval
    pipeline runs before trusting an index build (VERDICT r05: an index
    can be deterministic and low-recall; this measures it in-engine).

    Exact truth comes from :func:`knn_join` (broadcast query batch,
    single corpus scan, WindowGroupLimit), the approximate side from
    :func:`ivf_knn_join`; recall@k per query is the overlap of the two
    id sets over k.  Queries whose probed cells are empty still emit a
    row (recall 0) — the query batch is the output spine.

    Output: (query_id, n_hits, recall), recall = n_hits / k.
    """
    exact = knn_join(
        corpus, queries, k=k, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, query_vec_col=query_vec_col,
    ).select("query_id", "neighbor_id")
    approx = ivf_knn_join(
        corpus, queries, k=k, n_probe=n_probe, cell_col=cell_col,
        id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    spine = queries.select(F.col(query_id_col).alias("query_id")).distinct()
    return (
        spine.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6
            ).alias("recall"),
        )
    )


def matryoshka_recall(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dims_levels: Sequence[int] = (8, 16, 32, 64),
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-representation evaluation: exact top-k recall when
    embeddings are TRUNCATED to their first ``d`` dimensions, for each
    ``d`` in ``dims_levels`` — the measurement behind MRL-style
    (Kusupati et al., NeurIPS'22) tiered retrieval, where a 100 TB
    index stores d/8 prefixes for the coarse pass and full vectors only
    for re-ranking.  This answers "how many prefix dims does the coarse
    pass need" with data, not folklore.

    Execution is ONE corpus scan for ALL levels: the query batch is
    broadcast, every (corpus row × query) computes all level cosines in
    a single projection (prefix dot/norms via sliced folds, JVM-side),
    then one posexplode to (level, cosine) long form and ONE shuffle on
    (query_id, dims) for the per-level ranking — not a rescan per
    level.  Ranking follows the knn_join discipline: cosine rounded to
    6 before ranking, ties by neighbor id, NULL cosines (zero-norm
    prefixes) filtered, window row_number ≤ k compiles to
    WindowGroupLimit so each partition pre-trims before the exchange.

    Truth = the ranking at the LARGEST level (the full vector).
    Output: (dims, query_id, n_hits, recall), recall = overlap@k / k —
    the max-dims rows are the 1.0 sanity floor.
    """
    levels = sorted(set(int(d) for d in dims_levels))

    def _prefix_norms(vec: Column) -> Column:
        # per-ROW prefix norms, one array per vector: computed once per
        # corpus/query row instead of once per (row × query) pair —
        # HOF folds are interpreted per element, so moving them off
        # the pair product is the dominant cost lever here
        return F.array(
            *[F.sqrt(dot(F.slice(vec, 1, d), F.slice(vec, 1, d))) for d in levels]
        )

    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).cast("array<double>").alias("_qv"),
    ).withColumn("_qn", _prefix_norms(F.col("_qv")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    ).withColumn("_vn", _prefix_norms(F.col("_v")))

    # Per pair, the only remaining folds are over ONE shared
    # elementwise-product array.  The product is let-bound via a
    # single-element transform() so Catalyst's projection collapse
    # cannot re-inline the zip_with into every level's aggregate
    # (the q_multimodal_phash lesson — measured re-inlining costs).
    def _pair_cos_array() -> Column:
        prod = F.zip_with("_v", "_qv", lambda x, y: x * y)

        def _per_level(p: Column) -> Column:
            def _cos(i: int, d: int) -> Column:
                den = F.element_at("_vn", i + 1) * F.element_at(
                    "_qn", i + 1
                )
                num = F.aggregate(
                    F.slice(p, 1, d), F.lit(0.0), lambda a, x: a + x
                )
                return F.round(F.when(den > 0, num / den), 6)

            return F.array(*[_cos(i, d) for i, d in enumerate(levels)])

        return F.element_at(F.transform(F.array(prod), _per_level), 1)

    long = (
        c.join(F.broadcast(q))
        .select(
            "query_id",
            "neighbor_id",
            F.posexplode(_pair_cos_array()).alias("_lvl", "cosine"),
        )
        .filter(F.col("cosine").isNotNull())
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id", "_lvl").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    lvl_dims = F.element_at(
        F.array(*[F.lit(d) for d in levels]), F.col("_lvl") + 1
    )
    ranked = (
        long.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("query_id", "_lvl", lvl_dims.alias("dims"), "neighbor_id")
    )
    # Truth = the max-level rows of `ranked` itself.  Deriving the
    # overlap via a per-query window collect_set (k-bounded set)
    # instead of a ranked⋈ranked self-join keeps this ONE corpus pass
    # — a self-join would re-run the scan + ranking for each side.
    wq = Window.partitionBy("query_id")
    truth_set = F.collect_set(
        F.when(F.col("dims") == levels[-1], F.col("neighbor_id"))
    ).over(wq)
    hits = (
        ranked.withColumn("_truth", truth_set)
        .groupBy("dims", "query_id")
        .agg(
            F.sum(
                F.array_contains(F.col("_truth"), F.col("neighbor_id")).cast(
                    "long"
                )
            ).alias("n_hits")
        )
    )
    spine = (
        q.select("query_id")
        .distinct()
        .crossJoin(
            F.broadcast(
                corpus.sparkSession.createDataFrame(
                    [(d,) for d in levels], "dims int"
                )
            )
        )
    )
    return spine.join(hits, ["dims", "query_id"], "left").select(
        F.col("dims").cast("int").alias("dims"),
        "query_id",
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.round(
            F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k)), 6
        ).alias("recall"),
    )


def hard_negative_mining(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    skip: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Hard-negative mining — the contrastive-training companion of
    :func:`knn_join`: for every query (anchor), the rank band
    ``(skip, skip+k]`` of its cosine neighbors.  The top ``skip``
    neighbors are presumed positives/duplicates and excluded (as is
    the anchor itself); what remains is the "close but not a match"
    band that makes the best negatives for training retrievers and
    embedding models (in-batch-random negatives are too easy).

    Execution is knn_join's plan verbatim with a deeper group limit:
    broadcast query batch, ONE corpus scan, per-partition
    ``WindowGroupLimit`` heap of ``skip + k`` rows per query before the
    single bounded exchange — then the narrow ``rnk > skip`` cut.
    Determinism: cosine rounded before ranking, ties break to lowest
    neighbor id.

    Output: (query_id, neighbor_id, cosine, rnk), rnk in
    skip+1 .. skip+k.
    """
    deep = knn_join(
        corpus,
        queries,
        k=skip + k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        round_to=round_to,
    )
    return deep.filter(
        (F.col("rnk") > skip) & (F.col("neighbor_id") != F.col("query_id"))
    )


def filtered_knn_join(
    corpus: DataFrame,
    metadata: DataFrame,
    queries: DataFrame,
    predicate: Column,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta_id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """Metadata-filtered vector search — the production retrieval shape
    ("nearest ENGLISH docs over 500 chars"): a metadata predicate
    restricts the corpus BEFORE any similarity work, then the search is
    :func:`knn_join`'s plan over the survivors.

    Pre-filtering beats post-filtering top-k at every scale: filtering
    after rank can return < k rows (or force k' ≫ k oversearch), and
    the predicate pushes into the metadata scan (PushedFilters) so the
    id-join only moves matching ids.  The join is declared plainly and
    left to the planner: at toy scale AQE broadcasts the filtered id
    set; at corpus scale it degrades to a key-partitioned join — both
    correct, no hint needed.

    Output: knn_join's (query_id, neighbor_id, cosine, rnk), ranks
    computed WITHIN the filtered corpus.
    """
    ids = metadata.filter(predicate).select(
        F.col(meta_id_col).alias(id_col)
    )
    survivors = corpus.join(ids, id_col)
    return knn_join(
        survivors,
        queries,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
        round_to=round_to,
    )


def ann_mrr(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 2,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "embedding",
) -> DataFrame:
    """Mean-reciprocal-rank evaluation of the IVF index — the
    position-sensitive companion of :func:`ann_recall` (recall@k says
    the truth is SOMEWHERE in the top k; MRR says WHERE — rank 1 vs
    rank 10 matter very differently to a retrieval consumer).

    Self-matches are excluded on BOTH sides (the standard eval: a query
    trivially retrieving itself says nothing).  Exact truth is the
    top-1 non-self neighbor from :func:`knn_join` at k=2 (removing the
    ≤1 self row from a top-2 list always leaves the true non-self
    top-1); the approximate side is :func:`ivf_knn_join` at k+1
    re-ranked after self-exclusion — top-k of (top-(k+1) minus self) ==
    top-k of (all minus self).  Same broadcast/one-scan physics as the
    underlying joins; the re-rank window touches ≤ k+1 rows per query.

    Output: (query_id, truth_rank, rr) — truth_rank 0 and rr 0.0 when
    the exact top-1 is outside the approximate top-k.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.col("neighbor_id")
    )
    truth = (
        knn_join(
            corpus, queries, k=2, id_col=id_col, vec_col=vec_col,
            query_id_col=query_id_col, query_vec_col=query_vec_col,
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("query_id", "neighbor_id")
    )
    approx = (
        ivf_knn_join(
            corpus, queries, k=k + 1, n_probe=n_probe, cell_col=cell_col,
            id_col=id_col, vec_col=vec_col, query_id_col=query_id_col,
            query_vec_col=query_vec_col,
        )
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("arnk", F.row_number().over(w))
        .filter(F.col("arnk") <= k)
        .select("query_id", "neighbor_id", "arnk")
    )
    spine = queries.select(F.col(query_id_col).alias("query_id")).distinct()
    hit = truth.join(approx, ["query_id", "neighbor_id"], "left").select(
        "query_id", "arnk"
    )
    return spine.join(hit, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("arnk"), F.lit(0)).cast("long").alias("truth_rank"),
        F.round(
            F.when(F.col("arnk").isNotNull(), F.lit(1.0) / F.col("arnk"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("rr"),
    )


def quantization_error(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Int8 quantization-error report per group — the monitoring twin
    of :func:`ann_quantized`: before trusting a 4×-smaller index, a
    pipeline measures what the quantizer destroys.  Per vector, the
    symmetric int8 codec (scale 127/max|x|, round half-away, dequantize
    q/scale) is applied and the relative reconstruction error
    ``Σ(x−x̂)²/Σx²`` computed — all inside one scan with index-ordered
    ``aggregate`` folds, so a SQL oracle replays the float sequence
    exactly.  Per-group roll-up sums the 6-decimal-rounded per-vector
    errors in DECIMAL (engine- and partitioning-exact).

    Output: (label, n_vecs, avg_rel_err, max_rel_err).
    """
    v = f"CAST({vec_col} AS array<double>)"
    scale = f"(127.0D / array_max(transform({v}, x -> abs(x))))"
    xhat = f"transform({v}, x -> round(x * {scale}) / {scale})"
    num = (
        f"aggregate(zip_with({v}, {xhat}, (a, b) -> (a - b) * (a - b)), "
        "0.0D, (acc, e) -> acc + e)"
    )
    den = f"aggregate(transform({v}, x -> x * x), 0.0D, (acc, e) -> acc + e)"
    per_vec = df.filter(
        F.expr(f"array_max(transform({v}, x -> abs(x)))") > 0
    ).select(
        F.col(group_col),
        F.round(F.expr(num) / F.expr(den), 6).alias("_rel"),
    )
    return (
        per_vec.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.round(
                F.sum(F.col("_rel").cast("decimal(20,6)"))
                .cast("double") / F.count(F.lit(1)),
                6,
            ).alias("avg_rel_err"),
            F.max("_rel").alias("max_rel_err"),
        )
    )


def ivfpq_residual_codebooks(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
) -> list[list[list[float]]]:
    """Residual PQ codebooks WITHOUT a training job: codeword ``c`` of
    subspace ``s`` is the s-th subvector of the RESIDUAL (vector minus
    its own cell's centroid) of the (c+1)-th corpus vector by id.

    The residual twin of :func:`pq_codebooks_first` — the same
    deterministic, any-engine-replayable contract (production would
    train per-subspace k-means over residuals with
    :func:`pq_codebooks_trained_grouped`; the encode/ADC plumbing in
    :func:`ann_ivfpq` is identical either way).
    """
    cmap = {int(cell): [float(x) for x in cent] for cell, cent in centroids}
    rows = (
        df.orderBy(id_col).limit(k).select(id_col, cell_col, vec_col).collect()
    )
    res = [
        [float(v) - c for v, c in zip(r[vec_col], cmap[int(r[cell_col])])]
        for r in rows
    ]
    dim = len(res[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [[vec[s * d : (s + 1) * d] for vec in res] for s in range(m)]


def ann_ivfpq(
    df: DataFrame,
    query_vec: Sequence[float],
    centroids: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    k: int = 10,
    n_probe: int = 2,
    shortlist: int = 50,
    id_col: str = "vec_id",
    cell_col: str = "label",
    vec_col: str = "embedding",
    round_to: int | None = 6,
) -> DataFrame:
    """IVFADC — the canonical billion-scale ANN layout (Jégou et al.,
    TPAMI 2011 §IV; FAISS ``IVFxx,PQyy``): coarse cells prune the scan,
    residual product-quantization codes score the survivors, exact L2
    reranks the shortlist.

    Scale shape, stage by stage:

    1. **Probe** — cell centroids are a k-row driver-side list; the
       query ranks them (cosine, ties → lowest cell) and keeps
       ``n_probe``.  The ``isin`` filter pushes into the scan; on a
       cell-partitioned table that is partition pruning — the 100 TB
       corpus shrinks to the probed cells' files.
    2. **ADC over residuals** — within probed cells each vector's
       residual (v − centroid(cell)) is encoded as m codes
       (:func:`_pq_codes`); the query side is a PER-CELL lookup table
       (residual q − centroid(cell) against every codeword) computed
       driver-side and shipped as ONE map literal keyed by cell —
       scoring is m array lookups + an ordered fold, no join, no
       shuffle.  Residual coding is what separates IVFADC from
       plain IVF+PQ: quantizing v − centroid removes the coarse
       cell's offset so the same codebook budget spends its bits on
       the fine structure.
    3. **Rerank** — exact squared L2 against the ORIGINAL query for the
       shortlist; both cuts are TakeOrderedAndProject (per-partition
       heaps, no global sort).

    Output: (vec_id, d2) — ties to the lowest id at both cuts.
    """
    import math

    q = [float(v) for v in query_vec]
    m = len(codebooks)
    d = len(codebooks[0][0])

    def cos(a: Sequence[float], b: Sequence[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b)
        )
        return num / den if den else 0.0

    ranked = sorted(centroids, key=lambda c: (-cos(c[1], q), c[0]))
    probed = [(int(c), [float(x) for x in v]) for c, v in ranked[:n_probe]]
    probed_cells = [c for c, _ in probed]

    # Per-cell ADC lookup tables from the query's per-cell residual,
    # folded in (s asc, j asc) order so an independent engine lands on
    # the same doubles (same contract as ann_pq's single LUT).
    luts = []
    for _, cent in probed:
        rq = [q[i] - cent[i] for i in range(len(q))]
        luts.append(
            [
                [
                    sum(
                        (rq[s * d + j] - cw[j]) * (rq[s * d + j] - cw[j])
                        for j in range(d)
                    )
                    for cw in codebooks[s]
                ]
                for s in range(m)
            ]
        )

    cell = F.col(cell_col).cast("int")
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cent_lit = F.element_at(
        F.map_from_arrays(
            array_lit(probed_cells, kind="int"),
            array_lit([cent for _, cent in probed]),
        ),
        cell,
    )
    residual = F.zip_with(vec, cent_lit, lambda a, b: a - b)
    codes = _pq_codes(residual, codebooks)
    lut_cell = F.element_at(
        F.map_from_arrays(array_lit(probed_cells, kind="int"), array_lit(luts)),
        cell,
    )
    score = F.aggregate(
        F.zip_with(
            codes,
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda code, s: F.get(F.get(lut_cell, s), code),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    short = (
        df.filter(cell.isin(probed_cells))
        .select(F.col(id_col), F.col(vec_col), score.alias("_score"))
        .orderBy("_score", id_col)
        .limit(shortlist)
    )
    qlit = array_lit(q)
    d2 = F.aggregate(
        F.zip_with(vec, qlit, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    out = (
        short.select(F.col(id_col), d2.alias("d2"))
        .orderBy("d2", id_col)
        .limit(k)
    )
    if round_to is not None:
        out = out.select(id_col, F.round("d2", round_to).alias("d2"))
    return out
