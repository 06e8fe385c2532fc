"""Deterministic hashing primitives: MinHash signatures and SimHash.

All hashing runs JVM-side on ``xxhash64`` (a Catalyst expression), so
signatures are computed inside codegen during the scan — the shape that
holds up when the shingle sets are petabyte-scale.  Hash family i is
``xxhash64(i, value)``: seeding by prepending the function index.

Hash-function counts / band widths are compile-time constants, so the
per-lane expressions are unrolled into literal arrays — Catalyst folds
the constants and codegen fuses the lanes.

These produce engine-specific hash values (DuckDB has no xxhash64), so
operators built on them take the driver's rows-only correctness check;
their *semantics* are covered by unit tests with known-similar inputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# The md5-based lane family (for DuckDB-reproducible MinHash/SimHash)
# lives inline in operators.dedup: lanes are 60-bit md5 hex slices
# (chars 1-15 / 16-30 of a seeded digest) and SimHash bit lanes are the
# two 32-bit md5 halves.  Every intermediate fits a signed 64-bit int in
# both engines, so there are no overflow semantics to reconcile; the
# digests are materialized in a projection before aggregation so each is
# computed exactly once.  ~2-3× xxhash64's cost — verification surface,
# not the production default.


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature (array<bigint>, length ``num_hashes``).

    sig[i] = min over shingles s of xxhash64(i, s).  Empty shingle sets
    get NULL entries (array_min of empty) — callers should filter empty
    documents first.
    """
    return F.array(
        *[
            F.array_min(
                F.transform(shingles, lambda s, i=i: F.xxhash64(F.lit(i), s))
            )
            for i in range(num_hashes)
        ]
    )


def signature_similarity(sig_a: Column, sig_b: Column) -> Column:
    """Estimated Jaccard: fraction of equal MinHash signature positions."""
    eq = F.zip_with(sig_a, sig_b, lambda a, b: F.when(a == b, 1).otherwise(0))
    return F.aggregate(eq, F.lit(0), lambda acc, v: acc + v) / F.size(sig_a)


def band_hashes(sig: Column, bands: int, rows_per_band: int) -> Column:
    """LSH band digests: array of ``bands`` structs (band, digest).

    Band j hashes signature positions [j·r, (j+1)·r) into one bigint;
    two documents collide on a band iff that slice is identical —
    the classic banding amplification for Jaccard LSH.
    """
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.xxhash64(
                    F.lit(j), F.slice(sig, j * rows_per_band + 1, rows_per_band)
                ).alias("digest"),
            )
            for j in range(bands)
        ]
    )


def _token_bit_votes(t: Column) -> Column:
    """±1 vote per bit lane from one token's xxhash64 (array<int>, len 64)."""
    h = F.xxhash64(t)
    return F.array(
        *[
            F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("int") * 2 - 1
            for b in range(64)
        ]
    )


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array, as bigint.

    Per token, xxhash64 supplies 64 bits; each bit votes ±1 into its
    lane; the final bit is the vote's sign.  Everything is a
    higher-order expression over (token × bit-lane) — JVM-side only.
    """
    votes = F.aggregate(
        tokens,
        F.array_repeat(F.lit(0), 64),
        lambda acc, t: F.zip_with(acc, _token_bit_votes(t), lambda a, v: a + v),
    )
    terms = [
        F.when(F.element_at(votes, b + 1) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for b in range(63)
    ]
    # bit 63 would overflow 1<<63 as a positive long; use the sign bit value
    terms.append(
        F.when(
            F.element_at(votes, 64) > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two bigint bit-vectors via bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_chunks(sim: Column, chunks: int = 4) -> Column:
    """Split a 64-bit simhash into ``chunks`` equal bit slices (structs).

    Pigeonhole banding for Hamming-distance LSH: two hashes within
    distance < ``chunks`` must agree on at least one chunk.
    """
    width = 64 // chunks
    mask = (1 << width) - 1
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("chunk"),
                F.shiftrightunsigned(sim, j * width)
                .bitwiseAND(F.lit(mask))
                .alias("bits"),
            )
            for j in range(chunks)
        ]
    )
