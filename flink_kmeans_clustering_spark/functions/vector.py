"""Vector math over ``array<numeric>`` columns, pure column expressions.

``zip_with`` + ``aggregate`` keep the arithmetic in Tungsten (SURVEY.md
§7 hard part d): no Arrow transfer, no Python, codegen-friendly — this
is what makes 64-dim cosine over 100 TB of embeddings a scan-bound
problem instead of a serialization-bound one.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length array columns (double)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    """Euclidean norm of an array column."""
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def squared_l2_distance(a: Column, b: Column) -> Column:
    """Σ (aᵢ-bᵢ)² between two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; null-safe for zero vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0.0, dot(a, b) / denom)
