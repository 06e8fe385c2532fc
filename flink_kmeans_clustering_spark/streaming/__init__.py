"""Structured Streaming surface of the engine.

The reference has **no** streaming path — its Kafka connector dependency
is commented out (``pom.xml:70-80``) and ``flink-streaming-java`` is an
unused provided-scope dep (SURVEY.md §2.1 note).  This package supplies
the streaming capabilities a Spark-first engine is expected to have:

* file-based streaming sources over the testdata tables (``sources``),
* watermarked tumbling-window aggregation (``windowed``) — the
  streaming twin of ``operators.events.tumbling_window_agg``,
* arbitrary stateful processing via ``applyInPandasWithState``
  (``stateful``): running per-key totals and gap sessionization,
* streaming deduplication (``dedup``),
* an ``availableNow`` micro-batch runner (``run``) that drains a
  bounded stream to a memory sink so streaming results can be compared
  bit-for-bit with their batch/DuckDB oracles.

Everything here is micro-batch Structured Streaming: on a real cluster
the same code runs continuously against Kafka/object-store sources by
swapping the reader and the trigger.
"""

from flink_kmeans_clustering_spark.streaming.dedup import dedup_stream
from flink_kmeans_clustering_spark.streaming.kmeans import streaming_kmeans
from flink_kmeans_clustering_spark.streaming.run import run_available_now
from flink_kmeans_clustering_spark.streaming.sources import (
    flush_sentinel_stream,
    stream_events,
    stream_table,
)
from flink_kmeans_clustering_spark.streaming.stateful import (
    attribution_state,
    attribution_state_ooo,
    funnel_state,
    running_user_totals,
    sessionize_stream,
)
from flink_kmeans_clustering_spark.streaming.windowed import windowed_event_counts

__all__ = [
    "attribution_state",
    "attribution_state_ooo",
    "dedup_stream",
    "flush_sentinel_stream",
    "funnel_state",
    "run_available_now",
    "running_user_totals",
    "sessionize_stream",
    "stream_events",
    "stream_table",
    "streaming_kmeans",
    "windowed_event_counts",
]
