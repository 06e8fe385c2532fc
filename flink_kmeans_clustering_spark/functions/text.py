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
