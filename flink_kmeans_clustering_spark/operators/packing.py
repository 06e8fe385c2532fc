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
    return _offsets_from_counts(counts, max_tokens, id_col)


def _offsets_from_counts(counts: DataFrame, max_tokens: int, id_col: str) -> DataFrame:
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
        counts.sparkSession.createDataFrame(
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


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 256,
    bucket_size: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Materialize the packed context windows themselves.

    :func:`pack_offsets` answers "where does each document land?";
    this op emits the training windows: every document's token array is
    sliced into the windows it straddles (a narrow per-row explode of
    at most ``n_seqs`` pieces), and one shuffle on the window id
    reassembles each window from its pieces — per-group state is
    bounded by ``max_tokens`` regardless of corpus size, and no global
    sort exists (the struct array_sort orders the ≤ a-few pieces
    INSIDE one window).

    Output: (seq_id, n_tokens, digest) — the window's token count and
    the md5 of its space-joined tokens, so an oracle reproducing the
    concat-and-chunk layout must match token-for-token without hauling
    whole windows through the comparison.  Every window except possibly
    the last has exactly ``max_tokens`` tokens.
    """
    off = pack_offsets(
        df, max_tokens=max_tokens, bucket_size=bucket_size,
        id_col=id_col, text_col=text_col,
    )
    toks = df.select(F.col(id_col), tokenize(F.col(text_col)).alias("_toks"))
    j = toks.join(off, id_col).filter(F.col("n_tokens") > 0)
    seq = F.col("seq_id")
    win_start = seq * max_tokens
    # the doc's token positions inside THIS window, 1-indexed for slice
    from_tok = F.greatest(win_start - F.col("start_offset"), F.lit(0))
    upto_tok = F.least(
        F.col("n_tokens").cast("long"),
        win_start + max_tokens - F.col("start_offset"),
    )
    pieces = (
        j.withColumn(
            "seq_id", F.explode(F.sequence("first_seq", "last_seq"))
        )
        .select(
            "seq_id",
            # position of this piece inside the window orders reassembly
            (F.col("start_offset") + from_tok - win_start).alias("_pos"),
            F.slice(
                "_toks", (from_tok + 1).cast("int"),
                (upto_tok - from_tok).cast("int"),
            ).alias("_piece"),
        )
    )
    assembled = pieces.groupBy("seq_id").agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_piece"))),
                lambda s: s["_piece"],
            )
        ).alias("_win")
    )
    return assembled.select(
        "seq_id",
        F.size("_win").alias("n_tokens"),
        F.md5(F.concat_ws(" ", F.col("_win"))).alias("digest"),
    )
