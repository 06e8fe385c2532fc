"""Sequence packing: lay a document corpus out into fixed-size training
context windows (the GPT-style "concatenate everything, chunk every
``max_tokens``" layout).

For each document (in deterministic ``doc_id`` order) this computes its
global token offset and which context windows it lands in.  The core is
a corpus-wide *prefix sum* of token counts — the textbook distributed
version: per-bucket partial sums are collected to the driver (one small
row per bucket), the exclusive bucket offsets are computed there, and
each bucket's rows then need only a *bucket-local* window cumsum plus
their bucket's offset.  No global single-partition window ever exists;
the only full-width window is partitioned by bucket, whose size the
caller controls.

A driver-side collect of #buckets rows is the same k-row state pattern
as ``operators.kmeans.lloyd`` — legitimate because its size is
independent of corpus size (buckets = id-range / bucket_size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.functions.text import tokenize


def pack_offsets(
    df: DataFrame,
    max_tokens: int = 256,
    bucket_size: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document packing layout: global token offset + window span.

    Output (one row per document, ``doc_id`` order defines the pack
    order): ``n_tokens``, ``start_offset`` (exclusive prefix sum),
    ``first_seq`` / ``last_seq`` (context-window ids the document's
    tokens fall into; documents straddle boundaries exactly as the
    concat-and-chunk layout does), ``n_seqs`` spanned.  Token-less
    documents occupy zero width: their ``first_seq``/``last_seq`` is
    the window their offset points into (NULL-free; they emit no
    tokens there).

    ``bucket_size`` is the id-range per prefix-sum bucket — at corpus
    scale pick it so one bucket's rows fit a task comfortably (1M doc
    rows ≈ tens of MB of (id, count) pairs).
    """
    counts = df.select(
        F.col(id_col),
        (F.col(id_col) / bucket_size).cast("long").alias("_bucket"),
        F.size(tokenize(F.col(text_col))).alias("n_tokens"),
    )
    # level 1: one partial sum per bucket, driver-side exclusive cumsum
    bucket_rows = (
        counts.groupBy("_bucket")
        .agg(F.sum("n_tokens").alias("_bsum"))
        .collect()
    )
    offsets: dict[int, int] = {}
    running = 0
    for r in sorted(bucket_rows, key=lambda r: r["_bucket"]):
        offsets[r["_bucket"]] = running
        running += r["_bsum"]
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(b, o) for b, o in offsets.items()], "_bucket long, _boff long"
        )
    )
    # level 2: bucket-local exclusive cumsum + broadcast bucket offset
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = counts.withColumn(
        "_local", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    )
    start = F.col("_boff") + F.col("_local")
    end_incl = start + F.greatest(F.col("n_tokens") - 1, F.lit(0))
    first_seq = (start / max_tokens).cast("long")
    last_seq = (end_incl / max_tokens).cast("long")
    return (
        local.join(off_df, "_bucket")
        .select(
            F.col(id_col),
            F.col("n_tokens"),
            start.alias("start_offset"),
            first_seq.alias("first_seq"),
            last_seq.alias("last_seq"),
            (last_seq - first_seq + 1).alias("n_seqs"),
        )
    )
