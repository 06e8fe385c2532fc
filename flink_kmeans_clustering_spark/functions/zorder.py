"""Z-order (Morton) keys — multi-dimensional data clustering.

A table sorted by one column prunes scans on THAT column only; a 100 TB
events table queried by user AND by time needs both.  Interleaving the
bits of the two dimensions into one Morton key and range-sorting the
write by it places rows close in EITHER dimension into the same files
and row groups, so parquet min/max statistics prune box queries on any
participating column — the technique behind Delta/Iceberg Z-ORDER,
built here from plain column expressions (shift/mask/or are all
whole-stage codegen).

Keys are built from non-negative ints (callers bucket/offset their
columns first — epoch-hour, id, quantized value).  ``bits`` caps the
per-dimension range at 2^bits; values are clamped, which only degrades
clustering at the extreme, never correctness (the key orders the
LAYOUT; filters still evaluate on the real columns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton-interleave ``cols`` (non-negative int expressions).

    Bit b of dimension d lands at position ``b·D + d`` — dimension 0
    owns the least-significant lane.  2 dims × 16 bits = a 32-bit key;
    the expression tree is ``D·bits`` shift-and-masks, all codegen.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if len(cols) * bits > 63:
        raise ValueError("interleaved key must fit in a signed 64-bit long")
    d = len(cols)
    cap = F.lit((1 << bits) - 1)
    out = F.lit(0).cast("long")
    for di, c in enumerate(cols):
        v = F.least(c.cast("long"), cap)  # clamp, layout-only
        for b in range(bits):
            out = out.bitwiseOR(
                F.shiftleft(F.shiftright(v, b).bitwiseAND(F.lit(1)), b * d + di)
            )
    return out
