"""K-Means dataflow operators, Spark-first (SURVEY.md §2.2, O1-O10).

The reference implements Lloyd's algorithm as a Flink bulk iteration over
2-D points with broadcast centroids (``KMeans.java:148-236``).  Here each
step is an independent, composable DataFrame operator:

* :func:`assign_points` — O1/O7 nearest-centroid assignment.  The k
  centroids are embedded as a literal array-of-structs and the argmin is
  ``array_min`` over ``(dist², id)`` structs: a *narrow* map with zero
  shuffle and full whole-stage codegen — the Spark analogue of Flink's
  map-with-broadcast (``KMeans.java:264-290``), and the plan that
  survives a 100 TB scan (no N×k materialization, no exchange).
* :func:`assign_points_param` — same semantics with the centroids as a
  broadcast one-row DataFrame instead of literals: the generated stage
  code carries no centroid values, so iterative callers compile the
  stage once and reuse it every superstep (plan-stable form).
* :func:`assign_points_join` — same semantics via an explicit broadcast
  join + per-key min, for when the centroid side is too large to inline.
* :func:`update_centroids` — O3/O4 grouped partial-sum + mean
  (``KMeans.java:311-336``): one hash-partition exchange on the cluster
  id with map-side partial aggregation (Catalyst's HashAggregate
  partial→final mirrors Flink's combiner insertion).
* :func:`objective_from_assigned` / :func:`objective` — O9/O10 WCSS.
* :func:`moved_centroids` — O6 convergence join+filter
  (``KMeans.java:169-181``).
* :func:`lloyd` — O5 bulk iteration as a driver loop: the k-row centroid
  state collects to the driver each superstep and re-enters the next
  round as a broadcast one-row DataFrame (exactly MLlib's internal
  collect+broadcast pattern, in plan-stable form).

Semantic fine print preserved from the reference (SURVEY.md §3.4):

* Tie-break: strict ``<`` scan (``KMeans.java:281``) ⇒ lowest centroid id
  wins ties.  ``(dist², id)`` struct ordering reproduces this (argmin over
  d² equals argmin over d).
* Empty clusters vanish from the next round (groupBy emits no row —
  drop-semantics, unlike MLlib which keeps the stale center).
* Assignment against an empty centroid set yields cluster ``-1``
  (``KMeans.java:277-287``).
* WCSS sums *squared* Euclidean distance (``KMeans.java:357``); the
  convergence epsilon compares *plain* Euclidean distance
  (``KMeans.java:179``).
"""

from __future__ import annotations

import math
import random
from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.operators.common import array_lit

Centroid = tuple[int, float, float]  # (id, x, y)


# ---------------------------------------------------------------------------
# O1 / O7 — nearest-centroid assignment
# ---------------------------------------------------------------------------


def squared_distance(x: Column, y: Column, cx: float, cy: float) -> Column:
    """Squared Euclidean distance from (x, y) to a constant (cx, cy)."""
    dx = x - F.lit(float(cx))
    dy = y - F.lit(float(cy))
    return dx * dx + dy * dy


def assign_points(
    points: DataFrame,
    centroids: Sequence[Centroid],
    x: str = "x",
    y: str = "y",
    cluster_col: str = "cluster",
    dist2_col: str | None = None,
) -> DataFrame:
    """Assign each point to its nearest centroid (O1/O7).

    Centroids enter the plan as a literal array of ``(dist², id)``
    structs; ``array_min``'s lexicographic struct ordering gives the
    argmin with the reference's lowest-id tie-break.  Narrow map — no
    join, no shuffle, whole-stage codegen.

    An empty centroid sequence assigns cluster ``-1`` to every point
    (``KMeans.java:277-287``).
    """
    out_cols = [F.col(c) for c in points.columns]
    if not centroids:
        out = points.select(*out_cols, F.lit(-1).alias(cluster_col))
        if dist2_col:
            out = out.withColumn(dist2_col, F.lit(None).cast("double"))
        return out

    candidates = F.array(
        *[
            F.struct(
                squared_distance(F.col(x), F.col(y), cx, cy).alias("dist2"),
                F.lit(int(cid)).alias("cluster"),
            )
            for cid, cx, cy in centroids
        ]
    )
    best = F.array_min(candidates)
    cols = [*out_cols, best["cluster"].alias(cluster_col)]
    if dist2_col:
        cols.append(best["dist2"].alias(dist2_col))
    return points.select(*cols)


def assign_points_param(
    points: DataFrame,
    centroids: Sequence[Centroid],
    x: str = "x",
    y: str = "y",
    cluster_col: str = "cluster",
    dist2_col: str | None = None,
) -> DataFrame:
    """O1/O7 assignment with a *plan-stable* parameterized centroid set.

    Same semantics as :func:`assign_points`, different physics: the
    centroid coordinates enter the plan as three **array literals**
    (ids/xs/ys) consumed by a higher-order ``transform`` over the index
    range.  Array literals live in the codegen ``references`` table, not
    in the generated Java source, so the stage source is byte-identical
    across Lloyd supersteps — Janino compiles it once and every later
    superstep hits the codegen cache.  The literal-unrolled
    :func:`assign_points` recompiles each superstep because primitive
    double literals are inlined into the source (~0.2 s/superstep;
    docs/STATUS.md round 1).

    The HOF lambda evaluates interpreted (CodegenFallback), but it is k
    struct constructions per row — measured ~25% cheaper per superstep
    than the literal form once recompilation is gone.  Still a narrow
    map: no join, no shuffle.  Use this in iterative loops;
    :func:`assign_points` remains the best one-shot form (fully
    codegen'd arithmetic).
    """
    if not centroids:
        return assign_points(points, centroids, x=x, y=y,
                             cluster_col=cluster_col, dist2_col=dist2_col)
    k = len(centroids)
    ids = array_lit([int(c[0]) for c in centroids], kind="int")
    xs = array_lit([float(c[1]) for c in centroids])
    ys = array_lit([float(c[2]) for c in centroids])
    idx = F.sequence(F.lit(0), F.lit(k - 1))

    def _cand(i: Column) -> Column:
        dx = F.col(x) - F.get(xs, i)
        dy = F.col(y) - F.get(ys, i)
        return F.struct((dx * dx + dy * dy).alias("dist2"), F.get(ids, i).alias("cluster"))

    best = F.array_min(F.transform(idx, _cand))
    out_cols = [F.col(c) for c in points.columns]
    cols = [*out_cols, best["cluster"].alias(cluster_col)]
    if dist2_col:
        cols.append(best["dist2"].alias(dist2_col))
    return points.select(*cols)


def assign_points_join(
    points: DataFrame,
    centroids: DataFrame,
    point_id: str = "point_id",
    x: str = "x",
    y: str = "y",
    centroid_id: str = "id",
    cluster_col: str = "cluster",
    dist2_col: str | None = None,
) -> DataFrame:
    """O1 via explicit broadcast cross-join + per-point min-struct agg.

    Same semantics as :func:`assign_points` for callers whose centroid
    set is a DataFrame (or too large to inline as literals).  The big
    side streams through a BroadcastNestedLoopJoin; the per-point argmin
    is ``min(struct(dist², id))`` — a hash aggregation, no sort.
    """
    cdf = F.broadcast(
        centroids.select(
            F.col(centroid_id).alias("_cid"),
            F.col(x).alias("_cx"),
            F.col(y).alias("_cy"),
        )
    )
    dx = F.col(x) - F.col("_cx")
    dy = F.col(y) - F.col("_cy")
    scored = points.crossJoin(cdf).withColumn(
        "_cand", F.struct((dx * dx + dy * dy).alias("dist2"), F.col("_cid").alias("cluster"))
    )
    keep = [c for c in points.columns if c != point_id]
    agg = scored.groupBy(point_id).agg(
        *[F.first(c).alias(c) for c in keep], F.min("_cand").alias("_best")
    )
    cols = [F.col(point_id), *[F.col(c) for c in keep], F.col("_best.cluster").alias(cluster_col)]
    if dist2_col:
        cols.append(F.col("_best.dist2").alias(dist2_col))
    return agg.select(*cols)


# ---------------------------------------------------------------------------
# O3 / O4 — grouped partial-sum + mean projection
# ---------------------------------------------------------------------------


def update_centroids(
    assigned: DataFrame,
    cluster_col: str = "cluster",
    x: str = "x",
    y: str = "y",
    count_col: str | None = "n",
) -> DataFrame:
    """Recompute centroids as per-cluster means (O2+O3+O4).

    ``groupBy(cluster).agg(sum, sum, count)`` then the mean projection
    ``Σ/n`` (``KMeans.java:311-336``).  Catalyst plans this as partial →
    exchange(hash by cluster) → final HashAggregate — the map-side
    combine Flink gets from its combinable ReduceFunction, for free.
    Clusters with zero assigned points emit no row (drop-semantics).
    """
    agg = assigned.groupBy(F.col(cluster_col).alias("id")).agg(
        F.sum(x).alias("_sx"), F.sum(y).alias("_sy"), F.count(F.lit(1)).alias("_n")
    )
    cols = [
        F.col("id"),
        (F.col("_sx") / F.col("_n")).alias(x),
        (F.col("_sy") / F.col("_n")).alias(y),
    ]
    if count_col:
        cols.append(F.col("_n").alias(count_col))
    return agg.select(*cols)


def update_centroids_observe(
    assigned: DataFrame,
    centroid_ids: Sequence[int],
    cluster_col: str = "cluster",
    x: str = "x",
    y: str = "y",
) -> list[Centroid]:
    """O2+O3+O4 via ``df.observe`` accumulator metrics: the k×(Σx, Σy,
    n) sums ride the assignment scan as AggregatingAccumulators — ONE
    stage, ZERO exchange, no separate reduce tasks, no collect job.

    :func:`update_centroids` (groupBy → k-row exchange) is the
    canonical declarative form and the oracle surface; this variant
    collapses the superstep's map+reduce stage pair to a single map
    stage whose task-completion messages carry the merged sums.
    MEASURED VERDICT (round 6, 100k/k=8 fixture, 5-run medians per
    config): observe LOSES to the exchange at every partitioning
    (2.08 vs 1.75 s @8 parts, 1.93 vs 1.53 @16, 1.95 vs 2.00 @32) —
    CollectMetrics aggregates evaluate as interpreted
    AggregatingAccumulators outside whole-stage codegen, and 3k
    interpreted conditional sums per row cost more than the tiny
    k-row exchange saves.  Kept as the measured alternative (and the
    accumulator-harvest pattern reference); :func:`lloyd` defaults to
    the exchange.  At cluster scale the accumulator payload is k×3
    doubles per task — driver merge O(tasks·k), trivial at any N.

    Determinism class is identical to the exchange path: per-partition
    partial sums merged in arrival order (both are ±ulp of each other,
    the same tolerance the WCSS golden assert already absorbs).

    The conditional-sum expressions reference cluster ids through ONE
    array literal (codegen ``references`` table), so the generated
    stage source is byte-identical across supersteps while k is stable
    — same Janino-cache discipline as :func:`assign_points_param`.

    Empty clusters yield n=0 and are dropped (reference semantics).
    Returns the new centroid list sorted by id.
    """
    from pyspark.sql import Observation

    ids = [int(i) for i in centroid_ids]
    ids_lit = array_lit(ids, kind="int")
    aggs = []
    for j in range(len(ids)):
        cond = F.col(cluster_col) == F.get(ids_lit, F.lit(j))
        aggs += [
            F.sum(F.when(cond, F.col(x))).alias(f"_sx{j}"),
            F.sum(F.when(cond, F.col(y))).alias(f"_sy{j}"),
            F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).alias(f"_n{j}"),
        ]
    obs = Observation()
    assigned.observe(obs, *aggs).write.format("noop").mode("overwrite").save()
    m = obs.get
    out: list[Centroid] = []
    for j, cid in enumerate(ids):
        n = m[f"_n{j}"]
        if n:
            out.append((cid, float(m[f"_sx{j}"]) / n, float(m[f"_sy{j}"]) / n))
    out.sort(key=lambda c: c[0])
    return out


# ---------------------------------------------------------------------------
# O9 / O10 — objective function (WCSS)
# ---------------------------------------------------------------------------


def objective_from_assigned(assigned: DataFrame, dist2_col: str = "dist2") -> DataFrame:
    """Global Σ d² over an assignment that already carries d² (O10)."""
    return assigned.agg(F.sum(dist2_col).alias("wcss"))


def objective(
    assigned: DataFrame,
    centroids: Sequence[Centroid],
    cluster_col: str = "cluster",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """WCSS from scratch: look up each point's centroid, Σ d² (O9+O10).

    The reference scans the broadcast centroid list per record
    (``KMeans.java:343-362``); here the k-case expression is a literal
    ``CASE`` over the cluster id — still narrow, still codegen'd.
    """
    if not centroids:
        return assigned.select(F.lit(0.0).alias("wcss")).limit(1)
    expr = None
    for cid, cx, cy in centroids:
        d2 = squared_distance(F.col(x), F.col(y), cx, cy)
        expr = (
            F.when(F.col(cluster_col) == int(cid), d2)
            if expr is None
            else expr.when(F.col(cluster_col) == int(cid), d2)
        )
    return assigned.select(expr.alias("_d2")).agg(F.sum("_d2").alias("wcss"))


# ---------------------------------------------------------------------------
# O6 — convergence join + filter
# ---------------------------------------------------------------------------


def moved_centroids(
    new: DataFrame,
    old: DataFrame,
    epsilon: float,
    centroid_id: str = "id",
    x: str = "x",
    y: str = "y",
) -> DataFrame:
    """Centroids that moved more than ``epsilon`` (plain Euclidean, O6).

    Inner join new↔old on id + distance filter (``KMeans.java:169-181``).
    Both sides are k rows — Catalyst broadcasts.  The Lloyd iteration
    stops when this set is empty; a centroid absent from ``new`` (empty
    cluster) cannot keep the iteration alive.
    """
    o = old.select(
        F.col(centroid_id).alias("_oid"), F.col(x).alias("_ox"), F.col(y).alias("_oy")
    )
    dx = F.col(x) - F.col("_ox")
    dy = F.col(y) - F.col("_oy")
    return (
        new.join(F.broadcast(o), F.col(centroid_id) == F.col("_oid"))
        .withColumn("moved", F.sqrt(dx * dx + dy * dy))
        .filter(F.col("moved") > float(epsilon))
        .select(centroid_id, x, y, "moved")
    )


# ---------------------------------------------------------------------------
# O5 — bulk iteration (driver loop) + D1/D2 init
# ---------------------------------------------------------------------------


@dataclass
class LloydResult:
    centroids: list[Centroid]  # final centroids (empty clusters dropped)
    iterations: int  # supersteps actually run
    assignments: DataFrame  # final re-assignment (O7) with dist2
    wcss: float  # Σ squared Euclidean distance (O9/O10)


def lloyd(
    points: DataFrame,
    init_centroids: Sequence[Centroid],
    max_iterations: int = 100,
    epsilon: float | None = None,
    x: str = "x",
    y: str = "y",
    cache: bool = True,
    update: str = "exchange",
) -> LloydResult:
    """Lloyd's K-Means as a driver-side bulk iteration (O5).

    Per superstep: assign (narrow map) → update (one k-key shuffle) →
    collect k rows to the driver → optional epsilon convergence check
    computed driver-side on those k rows (exact O6 semantics: join new
    ↔ old on id, plain-Euclidean move > ε keeps iterating;
    ``epsilon=None`` reproduces the reference's fixed-iteration mode,
    ``closeWith(newCentroids)`` at ``KMeans.java:185``).

    The points DataFrame is cached once and re-scanned each superstep —
    Spark's substitute for Flink's native feedback edge; with k-row
    driver state the per-iteration cost is one job over the cached scan.
    Assignment uses :func:`assign_points_param` so the generated stage
    code is identical every superstep (one Janino compile per loop, not
    one per iteration).

    ``update`` selects the superstep's reduce physics: ``"exchange"``
    (default) is the groupBy k-row shuffle + collect
    (:func:`update_centroids`); ``"observe"`` harvests the k×3 sums as
    accumulator metrics riding the assignment scan — one stage per
    superstep, zero exchange, but MEASURED SLOWER (interpreted
    CollectMetrics; see :func:`update_centroids_observe`).  Equality
    of the two paths is pinned in tests.

    For the duration of the loop the session runs with AQE disabled and
    ``spark.sql.shuffle.partitions`` pinned to k (restored afterwards):
    each superstep's shuffle carries at most k rows per map partition,
    so adaptive re-planning is pure per-job overhead here (~0.4 s/job
    measured) and the k-key exchange needs no more than k reducers —
    true at any input scale, since the shuffled data is the k-row
    partial-aggregate, not the points.
    """
    conf = points.sparkSession.conf
    prev_aqe = conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = conf.get("spark.sql.shuffle.partitions", None)
    if cache:
        # a single-file CSV/parquet source yields one partition — every
        # superstep's map would run on one core.  Round-robin rebalance
        # before caching (one extra pass, amortized over all
        # iterations); well-split inputs pass through.  Width is sized
        # to the DATA (4 partitions per input split, i.e. ≥ ~32 MB
        # each), capped at the cluster's slot count: padding a small
        # input out to core count just multiplies per-superstep task
        # scheduling — measured 3.1 s → 2.4 s on the 10-iteration
        # 100k-point fixture going from 32 partitions to 8.  File count
        # is a free proxy for the scan's split count (no plan-to-RDD
        # conversion); non-file sources fall back to the exact
        # partition count.
        target = points.sparkSession.sparkContext.defaultParallelism
        try:
            n_splits = len(points.inputFiles())
        except Exception:
            n_splits = 0
        if n_splits == 0:
            n_splits = points.rdd.getNumPartitions()
        if n_splits < target:
            points = points.repartition(min(target, 4 * n_splits))
        points = points.cache()
    current: list[Centroid] = [(int(i), float(px), float(py)) for i, px, py in init_centroids]
    iterations = 0
    # Superstep plan construction cost (exchange mode): building
    # assign_points_param + update_centroids Column-by-Column is ~40
    # py4j round trips per superstep (~0.07 s at k=8 — a third of the
    # whole superstep on the 100k fixture).  Instead the assignment is
    # ONE selectExpr f-string (parsed JVM-side; codegen-value-
    # independent like the param form — pinned by test) and the
    # value-INdependent update aggregation Columns are hoisted out of
    # the loop.  Same arithmetic term-for-term ((x−cx)²+(y−cy)², struct
    # argmin with lowest-id ties, SUM/SUM/COUNT then Σ/n), so values
    # are bit-identical — pinned by tests/test_kmeans_ops.py::
    # test_lloyd_selectexpr_superstep_equals_column_form.  NOT a single
    # spark.sql() with GROUP BY over the argmin alias: measured, the
    # grouping key inlines the HOF into the aggregate (the projection-
    # collapse trap) and each executed plan left the interpreted-eval
    # path ~2× slower for the rest of the session.  The explicit
    # selectExpr Project keeps the argmin in its own codegen stage.
    def _assign_expr(cents: list) -> str:
        # Same literal-safety contract as common.array_lit (ADVICE r10):
        # a NaN/inf coordinate would render as unparseable SQL ('nanD'),
        # so reject it eagerly with the same error shape; and the x/y
        # identifiers are backtick-quoted so column names that need
        # quoting parse instead of breaking the f-string plan.
        for c in cents:
            for v in (float(c[1]), float(c[2])):
                if not math.isfinite(v):
                    raise ValueError(f"non-finite literal {v!r}")
        qx = "`" + x.replace("`", "``") + "`"
        qy = "`" + y.replace("`", "``") + "`"
        ids = ",".join(str(int(c[0])) for c in cents)
        xs = ",".join(repr(float(c[1])) + "D" for c in cents)
        ys = ",".join(repr(float(c[2])) + "D" for c in cents)
        k = len(cents)
        return (
            f"array_min(transform(sequence(0, {k - 1}), i -> named_struct("
            f"'dist2', ({qx} - get(array({xs}), i)) * ({qx} - get(array({xs}), i))"
            f" + ({qy} - get(array({ys}), i)) * ({qy} - get(array({ys}), i)),"
            f"'cluster', get(array({ids}), i)))).cluster AS cluster"
        )

    _gid = F.col("cluster").alias("id")
    _aggs = [
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.count(F.lit(1)).alias("_n"),
    ]
    _outs = [
        F.col("id"),
        (F.col("_sx") / F.col("_n")).alias(x),
        (F.col("_sy") / F.col("_n")).alias(y),
    ]
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.shuffle.partitions", str(max(1, len(current))))
        for _ in range(max_iterations):
            if update == "observe":
                assigned = assign_points_param(points, current, x=x, y=y)
                new = update_centroids_observe(
                    assigned, [c[0] for c in current], x=x, y=y
                )
            else:
                new_rows = (
                    points.selectExpr(
                        "`" + x.replace("`", "``") + "`",
                        "`" + y.replace("`", "``") + "`",
                        _assign_expr(current),
                    )
                    .groupBy(_gid)
                    .agg(*_aggs)
                    .select(*_outs)
                    .collect()
                )
                new = [(int(r["id"]), float(r[x]), float(r[y])) for r in new_rows]
                new.sort(key=lambda c: c[0])
            iterations += 1
            if epsilon is not None:
                old_by_id = {c[0]: c for c in current}
                alive = any(
                    math.dist(old_by_id[cid][1:], (nx, ny)) > epsilon
                    for cid, nx, ny in new
                    if cid in old_by_id
                )
                current = new
                if not alive:
                    break
            else:
                current = new

        assignments = assign_points_param(points, current, x=x, y=y, dist2_col="dist2")
        row = objective_from_assigned(assignments).collect()[0]
        wcss = float(row["wcss"]) if row["wcss"] is not None else 0.0
    finally:
        conf.set("spark.sql.adaptive.enabled", prev_aqe)
        if prev_sp is not None:
            conf.set("spark.sql.shuffle.partitions", prev_sp)
        else:
            # never explicitly set before this call: unset instead of
            # leaking the loop-local k-row value session-wide
            conf.unset("spark.sql.shuffle.partitions")
    return LloydResult(centroids=current, iterations=iterations, assignments=assignments, wcss=wcss)


def random_centroids(
    k: int,
    min_coord: float = -15.0,
    max_coord: float = 15.0,
    seed: int | None = None,
) -> list[Centroid]:
    """D1: k uniform random centroids in [min, max]², ids 0..k-1.

    The reference uses an unseeded ``new Random()`` (``KMeans.java:88``);
    we take an explicit seed for reproducibility.
    """
    rng = random.Random(seed)
    return [
        (i, rng.uniform(min_coord, max_coord), rng.uniform(min_coord, max_coord))
        for i in range(k)
    ]


def recompute_nearest(
    centroids: Sequence[Centroid],
    repeats: int,
    min_coord: float = -15.0,
    max_coord: float = 15.0,
    seed: int | None = None,
) -> list[Centroid]:
    """D2: the reference's ``recompnearest`` init heuristic.

    Repeat ``repeats`` times: find the globally closest *pair* of
    centroids (O(k²) scan, ``KMeans.java:101-113``) and re-randomize the
    second member of the pair (``:114-116``).  Kept for parity; MLlib's
    k-means|| init is the recommended replacement (SURVEY.md §2.3 D2).
    """
    out = [(int(i), float(cx), float(cy)) for i, cx, cy in centroids]
    rng = random.Random(seed)
    for _ in range(repeats):
        if len(out) < 2:
            break
        best_j, best_d = None, float("inf")
        for i in range(len(out)):
            for j in range(len(out)):
                if i == j:
                    continue
                d = math.dist(out[i][1:], out[j][1:])
                if d < best_d:
                    best_d, best_j = d, j
        cid = out[best_j][0]
        out[best_j] = (
            cid,
            rng.uniform(min_coord, max_coord),
            rng.uniform(min_coord, max_coord),
        )
    return out


def scalable_init(
    points: DataFrame,
    k: int,
    l: int | None = None,
    rounds: int = 5,
    seed: int = 0,
    x: str = "x",
    y: str = "y",
    id_col: str = "point_id",
    draw_fn: str = "xxhash64",
) -> list[Centroid]:
    """k-means|| initialization (Bahmani et al., "Scalable K-Means++",
    VLDB 2012) — the distributed replacement for both the reference's
    random init (KMeans.java:88) and its ``recompnearest`` heuristic
    (KMeans.java:101-116), and for sequential k-means++ (k dependent
    passes): ``rounds`` passes each sample ~``l`` candidates in
    PARALLEL with probability ∝ distance², then the O(l·rounds)
    candidate set is reclustered driver-side.

    Distributed physics per round: one narrow assignment pass against
    the current candidate literals (:func:`assign_points_param` — no
    join, no shuffle), a scalar Σd² reduce, and a Bernoulli sample
    whose uniform comes from ``xxhash64(id, round, seed)`` — hash-
    derived, so the draw is reproducible under any partitioning /
    re-execution (``rand(seed)`` is partition-layout-dependent).  Per
    round the driver collects only the ~l sampled rows.

    The final weighted k-means++ + Lloyd refinement runs driver-side
    over ≤ l·rounds+1 candidates (weights = points per candidate, one
    more distributed count) — same cost argument as MLlib's
    ``KMeans||`` implementation, which reclusters candidates locally.

    Returns k centroids with ids 0..k-1 (fewer iff the input has fewer
    distinct candidates).

    ``draw_fn`` picks the uniform-draw family, the same split as
    :func:`~flink_kmeans_clustering_spark.operators.dedup.minhash_lsh_pairs`:
    ``"xxhash64"`` (default — fastest, JVM-only) or ``"md5"`` — every
    draw and every order-sensitive reduction becomes replayable by an
    independent SQL engine: uniforms are the first 8 md5-hex chars of
    ``"tag:seed[:round]:point_id"`` over 2³², Σd² and the local
    recluster's weighted sums accumulate in DECIMAL(38,12) (associative
    → partition-order-independent), and the driver-side k-means++ uses
    hash-derived picks instead of ``random.Random``.  The md5 path
    requires ``id_col``.  q_kmeans_scalable's DuckDB oracle replays the
    whole pipeline — rounds, candidate ids, weights, picks, local
    refinement — from the same parquet.
    """
    l = l if l is not None else 2 * k
    u53 = float(1 << 53)

    if draw_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown draw_fn: {draw_fn!r}")
    if draw_fn == "md5" and id_col not in points.columns:
        raise ValueError("draw_fn='md5' needs an id column (engine replay)")

    # Draw key: the id column when the input has one, else the
    # coordinates themselves (the reference's X,Y CSVs carry no id) —
    # still partitioning-independent; exactly-coincident points then
    # share draws, which only nudges the oversampling rate.
    key_cols = (
        [F.col(id_col)] if id_col in points.columns else [F.col(x), F.col(y)]
    )

    # first center: seeded hash-order pick (the paper's uniform point)
    if draw_fn == "md5":
        first_key = F.md5(
            F.concat(F.lit(f"k0:{seed}:"), F.col(id_col).cast("string"))
        )
        first = points.orderBy(first_key).limit(1).collect()
    else:
        first = (
            points.orderBy(F.xxhash64(*key_cols, F.lit(seed)), *key_cols)
            .limit(1)
            .collect()
        )
    if not first:
        return []
    cand: list[tuple[float, float]] = [(float(first[0][x]), float(first[0][y]))]

    for r in range(rounds):
        lits = [(i, cx, cy) for i, (cx, cy) in enumerate(cand)]
        a = assign_points_param(points, lits, x=x, y=y, dist2_col="_d2")
        if draw_fn == "md5":
            # associative-exact Σd²: any engine summing the same
            # DECIMAL(38,12) terms gets the same phi, in any order
            [row] = a.agg(
                F.sum(F.col("_d2").cast("decimal(38,12)")).alias("phi")
            ).collect()
        else:
            [row] = a.agg(F.sum("_d2").alias("phi")).collect()
        phi = float(row["phi"]) if row["phi"] else 0.0
        if phi <= 0.0:
            break  # every point coincides with a candidate
        if draw_fn == "md5":
            u = (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"kr:{seed}:{r}:"),
                                F.col(id_col).cast("string"),
                            )
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("double")
                / F.lit(4294967296.0)
            )
            new_df = a.filter(u * phi < F.lit(float(l)) * F.col("_d2"))
            # collect in id order: candidate ids must be reproducible,
            # not an artifact of partition-collect order
            new = new_df.select(id_col, x, y).orderBy(id_col).collect()
        else:
            u = (
                F.pmod(
                    F.xxhash64(*key_cols, F.lit(r), F.lit(seed)), F.lit(1 << 53)
                ).cast("double")
                / u53
            )
            new = (
                a.filter(u * phi < F.lit(float(l)) * F.col("_d2"))
                .select(x, y)
                .collect()
            )
        cand.extend((float(p[x]), float(p[y])) for p in new)
        # dedup exact coincidences (re-sampled points add no information)
        cand = list(dict.fromkeys(cand))

    # weights: points per nearest candidate (one distributed count)
    lits = [(i, cx, cy) for i, (cx, cy) in enumerate(cand)]
    counts = {
        int(r["cluster"]): int(r["n"])
        for r in assign_points_param(points, lits, x=x, y=y)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    weights = [float(counts.get(i, 0)) for i in range(len(cand))]

    if len(cand) <= k:
        return [(i, cx, cy) for i, (cx, cy) in enumerate(cand)]
    if draw_fn == "md5":
        picked = _weighted_kmeanspp_hash(cand, weights, k, seed)
        refined = _weighted_lloyd_local_exact(cand, weights, picked, iters=5)
    else:
        picked = _weighted_kmeanspp(cand, weights, k, seed)
        refined = _weighted_lloyd_local(cand, weights, picked, iters=5)
    return [(i, cx, cy) for i, (cx, cy) in enumerate(refined)]


def _weighted_kmeanspp(
    cand: list[tuple[float, float]],
    w: list[float],
    k: int,
    seed: int,
) -> list[tuple[float, float]]:
    """Sequential weighted k-means++ over the (small) candidate set."""
    rng = random.Random(seed)
    # first pick ∝ weight (fall back to uniform if all weights are 0)
    total = sum(w)
    probs = [wi / total for wi in w] if total > 0 else None
    centers = [cand[_draw(rng, probs, len(cand))]]
    d2 = [math.dist(c, centers[0]) ** 2 for c in cand]
    while len(centers) < k:
        mass = [wi * di for wi, di in zip(w, d2)]
        tot = sum(mass)
        if tot <= 0.0:
            # all remaining mass is zero: top up with unpicked candidates
            for c in cand:
                if c not in centers:
                    centers.append(c)
                    if len(centers) == k:
                        break
            break
        nxt = cand[_draw(rng, [m / tot for m in mass], len(cand))]
        centers.append(nxt)
        d2 = [min(di, math.dist(c, nxt) ** 2) for c, di in zip(cand, d2)]
    return centers


def _md5_u32(s: str) -> float:
    """Uniform in [0,1): first 8 md5-hex chars over 2³² (the repo-wide
    cross-engine hash contract — any SQL engine reproduces it)."""
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) / 4294967296.0


def _weighted_kmeanspp_hash(
    cand: list[tuple[float, float]],
    w: list[float],
    k: int,
    seed: int,
) -> list[tuple[float, float]]:
    """Weighted k-means++ with md5-derived picks and DECIMAL-exact
    cumulative sums — the engine-replayable twin of
    :func:`_weighted_kmeanspp`.

    Pick j crosses the cumulative (weight·d²) mass at the uniform
    ``md5_u32("pp:seed:j")``: cum and total accumulate as quantized
    Decimals (order-exact), comparisons happen on their nearest
    doubles — precisely ``CAST(SUM(CAST(mass AS DECIMAL(38,12))) OVER
    (ORDER BY cid) AS DOUBLE) > u * CAST(total AS DOUBLE)`` in SQL.
    Distances are the naive ``dx²+dy²`` (NOT ``math.dist``, whose
    scaled evaluation differs from SQL arithmetic by an ulp).
    """
    from decimal import Decimal

    q12 = Decimal("1e-12")

    def _cross(mass: list[Decimal], u: float) -> int:
        total = Decimal(0)
        for m in mass:
            total += m
        target = u * float(total)
        acc = Decimal(0)
        for i, m in enumerate(mass):
            acc += m
            if float(acc) > target:
                return i
        return len(mass) - 1

    w_mass = [Decimal(wi).quantize(q12) for wi in w]
    if sum(w_mass) <= 0:
        w_mass = [Decimal(1)] * len(cand)  # degenerate: uniform
    centers = [cand[_cross(w_mass, _md5_u32(f"pp:{seed}:0"))]]
    d2 = [
        (cx - centers[0][0]) ** 2 + (cy - centers[0][1]) ** 2
        for cx, cy in cand
    ]
    while len(centers) < k:
        mass = [Decimal(wi * di).quantize(q12) for wi, di in zip(w, d2)]
        if sum(mass) <= 0:
            # all remaining mass is zero: top up with unpicked candidates
            for c in cand:
                if c not in centers:
                    centers.append(c)
                    if len(centers) == k:
                        break
            break
        j = len(centers)
        nxt = cand[_cross(mass, _md5_u32(f"pp:{seed}:{j}"))]
        centers.append(nxt)
        d2 = [
            min(di, (cx - nxt[0]) ** 2 + (cy - nxt[1]) ** 2)
            for (cx, cy), di in zip(cand, d2)
        ]
    return centers


def _weighted_lloyd_local_exact(
    cand: list[tuple[float, float]],
    w: list[float],
    centers: list[tuple[float, float]],
    iters: int,
) -> list[tuple[float, float]]:
    """:func:`_weighted_lloyd_local` with DECIMAL-exact weighted sums —
    each term ``w·x`` quantizes to 12 decimal places and accumulates
    exactly, so an engine summing the same terms in ANY order (SQL
    ``SUM(CAST(w*x AS DECIMAL(38,12)))``) lands on the same mean.
    Assignment ties break to the lowest center index (= ``ORDER BY
    d2, pid`` in the replay)."""
    from decimal import Decimal

    q12 = Decimal("1e-12")
    cur = list(centers)
    for _ in range(iters):
        zero = Decimal(0)
        sums = [[zero, zero, zero] for _ in cur]
        for (cx, cy), wi in zip(cand, w):
            if wi <= 0.0:
                continue
            j = min(
                range(len(cur)),
                key=lambda i: ((cx - cur[i][0]) ** 2 + (cy - cur[i][1]) ** 2, i),
            )
            sums[j][0] += Decimal(wi * cx).quantize(q12)
            sums[j][1] += Decimal(wi * cy).quantize(q12)
            sums[j][2] += Decimal(wi).quantize(q12)
        nxt = [
            (float(sx) / float(sw), float(sy) / float(sw)) if sw > 0 else cur[i]
            for i, (sx, sy, sw) in enumerate(sums)
        ]
        if nxt == cur:
            break
        cur = nxt
    return cur


def _draw(rng: random.Random, probs: list[float] | None, n: int) -> int:
    if probs is None:
        return rng.randrange(n)
    r = rng.random()
    acc = 0.0
    for i, p in enumerate(probs):
        acc += p
        if r < acc:
            return i
    return n - 1


def _weighted_lloyd_local(
    cand: list[tuple[float, float]],
    w: list[float],
    centers: list[tuple[float, float]],
    iters: int,
) -> list[tuple[float, float]]:
    """A few weighted Lloyd steps over the candidate set (driver-side)."""
    cur = list(centers)
    for _ in range(iters):
        sums = [[0.0, 0.0, 0.0] for _ in cur]  # Σwx, Σwy, Σw
        for (cx, cy), wi in zip(cand, w):
            if wi <= 0.0:
                continue
            j = min(
                range(len(cur)),
                key=lambda i: (cx - cur[i][0]) ** 2 + (cy - cur[i][1]) ** 2,
            )
            sums[j][0] += wi * cx
            sums[j][1] += wi * cy
            sums[j][2] += wi
        nxt = [
            (sx / sw, sy / sw) if sw > 0 else cur[i]
            for i, (sx, sy, sw) in enumerate(sums)
        ]
        if nxt == cur:
            break
        cur = nxt
    return cur


# ---------------------------------------------------------------------------
# n-dimensional vector-column generalization (SURVEY §1.3)
# ---------------------------------------------------------------------------


def assign_points_nd(
    vectors: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
    dist2_col: str | None = None,
    centroid_ids: Sequence[int] | None = None,
) -> DataFrame:
    """O1/O7 assignment generalized from (x, y) to a vector column —
    the reference hardcodes 2-D; the Spark-native data model is
    ``array<double>`` (SURVEY §1.3), and the same literal-argmin shape
    carries over: the k×d centroid matrix enters the plan as ONE
    array-of-arrays literal, dist² folds ``zip_with`` squared diffs
    left-to-right (index order — an independent engine summing the
    same 32 doubles in the same order lands on the same double), and
    ``array_min`` over (dist², id) structs keeps the strict-<
    lowest-id tie-break.  A narrow map: no join, no shuffle, any dim.

    ``centroid_ids`` (default: positions) are the labels EMITTED — pass
    the surviving original ids in an iterative loop so labels stay
    persistent when a cluster empties (the 2-D :func:`assign_points_param`
    semantics; the min-struct tie-break then runs on the original id).
    """
    if not centroids:
        return vectors.select(
            "*", F.lit(-1).alias(cluster_col),
            *([F.lit(None).cast("double").alias(dist2_col)] if dist2_col else []),
        )
    if centroid_ids is None:
        centroid_ids = range(len(centroids))
    mat = array_lit([[float(v) for v in c] for c in centroids])
    ids = array_lit([int(i) for i in centroid_ids], kind="int")
    vec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    idx = F.sequence(F.lit(0), F.lit(len(centroids) - 1))

    def _cand(v: Column, i: Column) -> Column:
        diff2 = F.zip_with(v, F.get(mat, i), lambda a, b: (a - b) * (a - b))
        d2 = F.aggregate(diff2, F.lit(0.0), lambda acc, v_: acc + v_)
        return F.struct(
            d2.alias("dist2"), F.get(ids, i).cast("int").alias("cluster")
        )

    # let-bind the cast vector: referencing `vec` directly inside the
    # per-candidate lambda would re-inline the O(dim) cast+alloc k
    # times per row (the HOF projection-collapse pitfall, in argmin
    # position this time)
    best = F.element_at(
        F.transform(
            F.array(vec),
            lambda v: F.array_min(
                F.transform(idx, lambda i: _cand(v, i))
            ),
        ),
        1,
    )
    cols = [*vectors.columns, best["cluster"].alias(cluster_col)]
    if dist2_col:
        cols.append(best["dist2"].alias(dist2_col))
    return vectors.select(*cols)


def assign_points_nd_sql(
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    centroid_ids: Sequence[int] | None = None,
) -> str:
    """SQL-text twin of :func:`assign_points_nd`'s argmin struct — the
    whole (dist², cluster) expression as ONE string, for iterative
    callers that author their per-iteration job as a single
    ``spark.sql`` parse (the r14 SimHash treatment: composing the same
    tree from Column objects costs ~0.25 s of py4j round-trips per
    iteration at k=8, d=64; the parse is ~2 ms and bit-identical —
    same zip_with/aggregate fold order, same strict-< struct argmin,
    1-based ``element_at`` in place of 0-based ``get`` on the same
    positions).  Equality with the Column form is pinned in
    tests/test_r15_ops.py.  Field access: ``(expr).cluster`` /
    ``(expr).dist2``."""
    from flink_kmeans_clustering_spark.operators.common import (
        array_lit_sql,
    )

    if centroid_ids is None:
        centroid_ids = range(len(centroids))
    mat = array_lit_sql([[float(v) for v in c] for c in centroids])
    ids = array_lit_sql([int(i) for i in centroid_ids], kind="int")
    k = len(centroids)
    return (
        f"element_at(transform(array(transform({vec_col}, "
        "x -> CAST(x AS DOUBLE))), "
        f"v -> array_min(transform(sequence(0, {k - 1}), "
        "i -> named_struct("
        f"'dist2', aggregate(zip_with(v, element_at({mat}, i + 1), "
        "(a, b) -> (a - b) * (a - b)), 0.0D, (acc, x) -> acc + x), "
        f"'cluster', CAST(element_at({ids}, i + 1) AS INT))))), 1)"
    )


def update_centroids_nd(
    assigned: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    cluster_col: str = "cluster",
) -> DataFrame:
    """O3/O4 mean update for vector columns WITHOUT exploding: each of
    the ``dim`` components is its own SUM column in one HashAggregate,
    so the shuffle carries k rows × (dim+1) doubles — not the N×dim
    row blowup a posexplode would ship.  Returns (id, centroid
    array<double>, n).

    Each SUM input is ``element_at(col, j).cast(double)`` — casting
    the ELEMENT, not the array: a whole-array ``transform`` cast here
    would be re-inlined into all ``dim`` aggregate inputs (O(dim²)
    interpreted work per row and a dim× bigger codegen unit); the
    per-element cast is bit-identical (float→double is exact)."""
    sums, centroid = _nd_update_exprs(dim, vec_col)
    agg = assigned.groupBy(F.col(cluster_col).alias("id")).agg(
        *sums, F.count(F.lit(1)).alias("n")
    )
    return agg.select("id", centroid.alias("centroid"), "n")


def _nd_update_exprs(
    dim: int, vec_col: str
) -> tuple[list[Column], Column]:
    """(per-dim SUM columns, mean-array expr) for the nd mean update.

    Built ONCE per training call and reused across iterations: the
    Column objects are unresolved expressions independent of any
    DataFrame, and constructing ~3·dim of them costs ~1.2 s of py4j
    round-trips per call at dim=64 — the measured per-iteration floor
    of the driver loop before hoisting (1.2 s → 0.2 s)."""
    sums = [
        F.sum(F.element_at(F.col(vec_col), j + 1).cast("double")).alias(
            f"_s{j}"
        )
        for j in range(dim)
    ]
    centroid = F.array(*[F.col(f"_s{j}") / F.col("n") for j in range(dim)])
    return sums, centroid


def lloyd_nd(
    vectors: DataFrame,
    init_centroids: Sequence[Sequence[float]],
    max_iterations: int = 10,
    vec_col: str = "embedding",
    cache: bool = True,
) -> tuple[list[list[float]], float, list[int]]:
    """O5 bulk iteration over a vector column: the driver loop of
    :func:`lloyd` with the n-dim assign/update pair.  Returns (final
    centroids ordered by id, final WCSS scalar, surviving centroid
    ids).  Empty clusters drop — reference semantics — and ids stay
    PERSISTENT across iterations (an emptied cluster's id is retired,
    not recycled by position), matching the 2-D :func:`lloyd` and the
    DuckDB oracle's id-carrying CTE chain."""
    if cache:
        vectors = vectors.cache()
    spark = vectors.sparkSession
    dim = len(init_centroids[0])
    current = [list(map(float, c)) for c in init_centroids]
    ids = list(range(len(current)))
    conf = spark.conf
    prev_aqe = conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = conf.get("spark.sql.shuffle.partitions", "200")
    # one temp view for the whole training call: each iteration is then
    # ONE spark.sql parse instead of ~0.25 s of py4j Column composition
    # (r15, the SimHash SQL-text treatment; equality pinned in
    # tests/test_r15_ops.py).  The view resolves to the same analyzed
    # plan every round, so the cache() above still serves every scan.
    import uuid as _uuid

    view = f"_lloyd_nd_{_uuid.uuid4().hex[:12]}"
    vectors.createOrReplaceTempView(view)
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        # the per-iteration exchange carries ≤k rows — scheduling 32
        # reduce tasks for 8 rows is pure job-floor; map-side width is
        # unaffected, so this is scale-neutral
        conf.set(
            "spark.sql.shuffle.partitions", str(max(1, len(current)))
        )
        # per-dim mean-update SUMs, authored once as SQL text: raw
        # double sums of float32-exact values — identical to the
        # hoisted Column form (_nd_update_exprs) they replace
        sum_sql = ", ".join(
            f"sum(CAST(element_at({vec_col}, {j + 1}) AS DOUBLE))"
            f" AS _s{j}"
            for j in range(dim)
        )
        for _ in range(max_iterations):
            assign = assign_points_nd_sql(
                current, vec_col=vec_col, centroid_ids=ids
            )
            rows = spark.sql(
                f"SELECT cluster AS id, {sum_sql}, count(1) AS n "
                f"FROM (SELECT ({assign}).cluster AS cluster, {vec_col} "
                f"FROM {view}) GROUP BY cluster"
            ).collect()
            rows.sort(key=lambda r: r["id"])
            ids = [int(r["id"]) for r in rows]
            # driver-side mean: float(_sj) / n is the same IEEE double
            # division the engine-side array(_s0/n, ...) performed
            current = [
                [float(r[f"_s{j}"]) / r["n"] for j in range(dim)]
                for r in rows
            ]
        assign = assign_points_nd_sql(
            current, vec_col=vec_col, centroid_ids=ids
        )
        [row] = spark.sql(
            f"SELECT sum(({assign}).dist2) AS wcss FROM {view}"
        ).collect()
    finally:
        conf.set("spark.sql.adaptive.enabled", prev_aqe)
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.catalog.dropTempView(view)
        if cache:
            vectors.unpersist()
    return current, float(row["wcss"] or 0.0), ids


def normalize_unit_nd(
    vectors: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Project a vector column onto the unit sphere (zero-norm rows
    dropped): the preprocessing step of spherical K-Means.  The norm is
    let-bound through a single-element ``transform`` so it is computed
    ONCE per row, not re-inlined per component (the projection-collapse
    lesson); the fold order (index-sequential) matches any engine's
    left-fold ``list_sum``, so normalized values are bit-identical
    across engines."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    nrm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        vectors.withColumn("_nrm", nrm)
        .filter(F.col("_nrm") > 0)
        .withColumn(
            vec_col,
            F.element_at(
                F.transform(
                    F.array(F.col("_nrm")),
                    lambda nn: F.transform(
                        F.transform(
                            F.col(vec_col), lambda x: x.cast("double")
                        ),
                        lambda x: x / nn,
                    ),
                ),
                1,
            ),
        )
        .drop("_nrm")
    )


def spherical_kmeans_nd(
    vectors: DataFrame,
    init_centroids: Sequence[Sequence[float]],
    max_iterations: int = 3,
    vec_col: str = "embedding",
    cache: bool = True,
) -> tuple[list[list[float]], list[int]]:
    """Spherical K-Means (Dhillon & Modha, Mach. Learn. 2001): Lloyd
    on the unit sphere — inputs L2-normalized once, and each mean
    re-projected onto the sphere after the update, so the objective is
    cosine similarity rather than raw Euclidean distance.  This is the
    K-Means an embedding corpus wants (IVF cells for cosine ANN,
    semantic-dedup blocks): without the renormalization, long documents
    would drag centroids off the shell and cosine cells skew.

    Engine-replayable by construction: assignment reuses
    :func:`assign_points_nd` (argmin of index-ordered dist² folds on
    unit vectors — monotone in cosine); per-dim mean sums accumulate in
    DECIMAL(25,8) (normalized components are full-mantissa doubles, so
    plain double SUMs would be partition-order-dependent — the float32
    exactness that lets :func:`lloyd_nd` use raw sums does NOT carry
    over); renormalization happens driver-side on the k collected
    means with a sequential left-fold, matching an oracle's list_sum.
    Clusters that empty OR whose mean is exactly zero drop (reference
    drop-semantics extended with the spherical degeneracy).

    Returns (unit centroids ordered by id, surviving centroid ids).
    """
    unit = normalize_unit_nd(
        vectors.select("*"), vec_col=vec_col
    )
    if cache:
        unit = unit.cache()
    dim = len(init_centroids[0])

    def _unitize(c: Sequence[float]) -> list[float] | None:
        s = 0.0
        for x in c:  # sequential fold — list_sum order
            s += x * x
        if s <= 0:
            return None
        n = math.sqrt(s)
        return [float(x) / n for x in c]

    current = [u for u in (_unitize(c) for c in init_centroids) if u]
    ids = list(range(len(current)))
    spark = vectors.sparkSession
    conf = spark.conf
    prev_aqe = conf.get("spark.sql.adaptive.enabled", "true")
    prev_sp = conf.get("spark.sql.shuffle.partitions", "200")
    # one temp view + one spark.sql parse per iteration — see lloyd_nd
    # (r15; equality pinned in tests/test_r15_ops.py)
    import uuid as _uuid

    view = f"_spherical_{_uuid.uuid4().hex[:12]}"
    unit.createOrReplaceTempView(view)
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        # k-row exchanges — see lloyd_nd
        conf.set(
            "spark.sql.shuffle.partitions", str(max(1, len(current)))
        )
        # element-wise cast, not a whole-array transform: the HOF
        # would be re-inlined into all dim aggregate inputs (see
        # update_centroids_nd); vec_col is already array<double> after
        # normalize_unit_nd, so the double cast is a no-op and the
        # decimal cast sees identical values.
        sum_sql = ", ".join(
            f"sum(CAST(CAST(element_at({vec_col}, {j + 1}) AS DOUBLE)"
            f" AS DECIMAL(25,8))) AS _s{j}"
            for j in range(dim)
        )
        for _ in range(max_iterations):
            assign = assign_points_nd_sql(
                current, vec_col=vec_col, centroid_ids=ids
            )
            rows = spark.sql(
                f"SELECT cluster AS id, {sum_sql}, count(1) AS n "
                f"FROM (SELECT ({assign}).cluster AS cluster, {vec_col} "
                f"FROM {view}) GROUP BY cluster"
            ).collect()
            rows.sort(key=lambda r: r["id"])
            nxt_ids, nxt = [], []
            for r in rows:
                mu = [float(r[f"_s{j}"]) / r["n"] for j in range(dim)]
                u = _unitize(mu)
                if u is not None:
                    nxt_ids.append(int(r["id"]))
                    nxt.append(u)
            ids, current = nxt_ids, nxt
    finally:
        conf.set("spark.sql.adaptive.enabled", prev_aqe)
        conf.set("spark.sql.shuffle.partitions", prev_sp)
        spark.catalog.dropTempView(view)
        if cache:
            unit.unpersist()
    return current, ids
