"""Watermarked tumbling-window aggregation (streaming twin of
``operators.events.tumbling_window_agg``).

The watermark bounds state: windows older than ``max(event_time) -
delay`` are finalized and their state dropped, so state size is
O(active windows × types), not O(stream length) — the property that
matters at 100 TB/day event volume.  Late rows inside the delay are
merged into their window; later ones are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.operators.events import TS_FMT


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-(window, event_type) count + value sum with a watermark.

    Output schema matches the batch ``tumbling_window_agg`` exactly so
    one DuckDB oracle covers both paths.
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", TS_FMT).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
