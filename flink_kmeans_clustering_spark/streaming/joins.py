"""Stream-stream interval join.

Both sides are unbounded; matches must satisfy a key equality plus an
event-time range (``right.ts`` within a window before ``left.ts``).
Watermarks on both sides let Spark expire join state: a buffered right
row can be dropped once the left watermark passes ``right.ts + upper``,
so state is O(events within the interval + delay), not O(stream).

The watermark delay trades completeness for state: rows later than the
delay can miss matches.  Bounded drains in tests use a delay larger
than the data's time span, making the result exactly the batch range
join (the oracle); production picks the delay from observed lateness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "1 hour",
    watermark_delay: str = "30 days",
    ts_col: str = "ts",
) -> DataFrame:
    """Join left events to right events of the same key that occurred in
    ``(left.ts - interval, left.ts]``.

    Output: left event id/ts, matched right event id/ts, gap in µs.
    """
    l = left.withWatermark(ts_col, watermark_delay).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.withWatermark(ts_col, watermark_delay).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") > F.col("l_ts") - F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond).select(
        F.col("l_key").alias(key),
        "l_id",
        F.unix_micros("l_ts").alias("l_ts_us"),
        "r_id",
        F.unix_micros("r_ts").alias("r_ts_us"),
        (F.unix_micros("l_ts") - F.unix_micros("r_ts")).alias("gap_us"),
    )


def interval_join_streams_outer(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    interval: str = "1 hour",
    watermark_delay: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """LEFT OUTER stream-stream interval join: every left event is
    emitted — matched rows as they pair up, unmatched rows NULL-padded
    once the watermark proves no future right row can still match
    (``wm > l_ts + delay``, the state-expiry bound the time-range
    condition gives Spark).

    This is the "did a click precede this purchase?" shape where
    ABSENCE is the signal; an inner join silently drops exactly the
    rows you wanted to see.  Unlike the inner variant, the unmatched
    output only materializes when the watermark ADVANCES past the left
    row — a bounded drain must push a flush sentinel through BOTH
    streams (the global watermark is the min across inputs), same
    contract as sessionize's flush-on-drain.

    ``watermark_delay`` cuts the OPPOSITE way from the inner variant's
    generous 30-day default: a larger delay here postpones NULL-pad
    emission by the same amount (flush needs ``wm > l_ts + delay``), so
    the sentinel must advance past ``interval + delay``.  The 1-hour
    default assumes the caller drains everything in one availableNow
    pass with such a sentinel (as q_stream_outer_join does); a caller
    trickling input via ``maxFilesPerTrigger`` WITHOUT sentinel
    coverage must raise the delay above the data's real lateness or
    late matches arrive after their left row was already NULL-padded.

    Output: left id/ts, nullable right id/ts, nullable gap in µs.
    """
    l = left.withWatermark(ts_col, watermark_delay).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_id"),
        F.col(ts_col).alias("l_ts"),
    )
    r = right.withWatermark(ts_col, watermark_delay).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_id"),
        F.col(ts_col).alias("r_ts"),
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") > F.col("l_ts") - F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond, "leftOuter").select(
        F.col("l_key").alias(key),
        "l_id",
        F.unix_micros("l_ts").alias("l_ts_us"),
        "r_id",
        F.unix_micros("r_ts").alias("r_ts_us"),
        (F.unix_micros("l_ts") - F.unix_micros("r_ts")).alias("gap_us"),
    )
