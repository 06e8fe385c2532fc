"""Streaming deduplication.

``dropDuplicates`` on a stream keeps per-key state forever (exact,
unbounded); ``dropDuplicatesWithinWatermark`` bounds state to the
watermark horizon — the scale-safe variant when duplicates only arrive
within a known lateness window (the common case for at-least-once
ingestion retries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    stream: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Emit each distinct ``keys`` combination once.

    With ``ts_col`` set, uses watermark-bounded dedup state
    (``dropDuplicatesWithinWatermark``); otherwise exact unbounded
    dedup — fine for bounded backfills, a state leak on true streams.
    """
    if ts_col is not None:
        return stream.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(keys)
    return stream.dropDuplicates(keys)
