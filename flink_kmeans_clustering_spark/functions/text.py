"""Text primitives shared by dedup and text-analysis operators.

Tokenization is defined once so every operator (and every DuckDB oracle)
agrees on it: lowercase, split on runs of non-alphanumerics, drop empty
tokens.  Oracle equivalent:
``regexp_split_to_array(lower(text), '[^a-z0-9]+')`` filtered non-empty.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize(text: Column) -> Column:
    """lower → split on non-alphanumerics → drop empties (array<string>)."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE), lambda t: t != ""
    )


def ngram_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a token array (array<string>).

    Built with a higher-order ``transform`` over the valid start offsets
    — JVM-side, no UDF.  A document shorter than ``n`` tokens yields its
    full token sequence as one shingle so it still participates in
    similarity (rather than silently dropping out); a document with NO
    tokens yields an empty shingle array (not a junk ""-shingle that
    would make all empty documents spuriously identical).
    """
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(tokens) - F.lit(n - 1), F.lit(1))
    )
    return F.when(F.size(tokens) == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(starts, lambda i: F.concat_ws(" ", F.slice(tokens, i, n)))
        )
    )


def exploded_shingles(
    df,
    id_col: str = "id",
    text_col: str = "text",
    n: int = 3,
    with_size: bool = False,
):
    """Exploded word n-gram shingle stream: (id, sh) or (id, sz, sh).

    Codegen-safe replacement for ``explode(ngram_shingles(...))`` on a
    corpus: under a Generate node the optimizer re-inlines the token
    regex into the shingle lambda (observed 4 copies of
    ``regexp_split``, one evaluated per shingle position — ~10× the
    stage).  Here the TOKENS explode once (single generator-child
    evaluation per row) and shingles assemble from window leads over
    (id, pos) — plain codegen'd expressions, no nested HOF.

    Shingle values are identical to :func:`ngram_shingles`:
    ``concat_ws`` skips the NULL leads of the ``pos = 0`` row, which
    reproduces the shorter-than-``n`` full-sequence shingle, and
    zero-token documents emit no rows.  ``with_size=True`` adds the
    per-document DISTINCT shingle-set size and dedups the stream (the
    Jaccard contract); without it duplicates pass through (fine under
    MIN/Jaccard-free consumers).

    Partitioning: the window needs hash partitioning by id — callers
    that already ``spread`` by id pay no extra exchange, and the
    following ``groupBy(id)`` reuses it too.
    """
    from pyspark.sql import Window

    if n < 2:
        raise ValueError("use tokenize() directly for 1-gram shingles")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos")
    leads = [F.lead("tok", j).over(w).alias(f"_t{j}") for j in range(1, n)]
    g = toks.select("id", "pos", "tok", *leads)
    last = F.col(f"_t{n - 1}")
    # pos 0 is kept unconditionally: when the last lead is NULL there,
    # the document has < n tokens and concat_ws's NULL-skipping yields
    # the full-sequence shingle ngram_shingles defines for that case
    keep = last.isNotNull() | (F.col("pos") == 0)
    sh = g.filter(keep).select(
        "id",
        F.concat_ws(" ", "tok", *[f"_t{j}" for j in range(1, n)]).alias("sh"),
    )
    if not with_size:
        return sh
    sets = sh.groupBy("id").agg(F.collect_set("sh").alias("_set"))
    return sets.select(
        "id", F.size("_set").alias("sz"), F.explode("_set").alias("sh")
    )
