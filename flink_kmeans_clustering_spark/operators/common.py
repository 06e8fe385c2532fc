"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, key: str) -> DataFrame:
    """Rebalance a skinny scan before per-row heavy compute.

    A corpus packed into few parquet files yields few input partitions,
    which would serialize per-row hashing/tokenization onto a handful of
    cores (observed 20s+ single-task stages at bench scale).  If the
    scan has fewer partitions than the cluster has slots, hash-partition
    by ``key`` first — the shuffle moves only the raw input once, and
    every later stage keyed on it reuses the partitioning.  Inputs that
    already have enough splits (the 100 TB case) pass through untouched.

    Parallelism probe (r14 optimization): ``df.rdd.getNumPartitions()``
    converts the plan to an RDD — a full analyze+physical-plan pass per
    call (~0.1-0.4 s of driver time on the bigger lineages, paid by
    EVERY spread site in a query).  ``inputFiles()`` answers the same
    under-parallel question from the scan's file listing (the lloyd
    file-count proxy): at 100 TB any multi-file input passes through on
    the cheap path; the exact RDD probe only runs for single-file or
    non-file frames, where the plan is small and the answer matters.
    Either branch is performance-only — results are partition-
    independent by operator contract.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))


def array_lit(nested, kind: str = "double"):
    """Nested array literal as ONE parsed SQL expression.

    ``F.lit(nested_list)`` recurses in Python and makes a py4j call per
    LEAF — an 8×16×8 codebook literal costs ~1 s of driver round-trips,
    and an iterative trainer pays it EVERY iteration (measured: the
    bulk of q_ann_pq_trained's local floor).  Rendering the same values
    as one ``array(array(...))`` SQL string and parsing it JVM-side is
    ~3 ms and bit-identical: ``repr(float)`` is the shortest
    round-tripping decimal form and both Python and the JVM parse such
    forms to the same IEEE-754 double (correctly-rounded semantics).

    ``kind``: "double" (default) suffixes leaves with ``D``; "int" /
    "long" render integer leaves (``L`` for long).  NaN/±Inf are
    rejected — they have no portable SQL literal form and no operator
    here ships them.
    """
    return F.expr(array_lit_sql(nested, kind=kind))


def array_lit_sql(nested, kind: str = "double") -> str:
    """The SQL-text form of :func:`array_lit`, for callers that author
    whole expressions as f-strings (the selectExpr plan-construction
    pattern — see docs/TUNING.md): embedding the literal INSIDE a
    larger string keeps the entire projection at ONE py4j call instead
    of composing Columns around a parsed literal."""
    import math

    def render(x) -> str:
        if isinstance(x, (list, tuple)):
            return "array(" + ",".join(render(v) for v in x) + ")"
        if kind == "double":
            v = float(x)
            if math.isnan(v) or math.isinf(v):
                raise ValueError(f"non-finite literal {v!r}")
            return repr(v) + "D"
        if kind == "long":
            return str(int(x)) + "L"
        return str(int(x))

    return render(nested)
