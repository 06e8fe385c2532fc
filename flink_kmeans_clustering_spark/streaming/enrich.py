"""Stream-static enrichment join.

The canonical streaming-ETL shape: an unbounded fact stream joined to a
bounded dimension.  Spark broadcasts the static side into every
micro-batch — no state, no watermark needed, and the dimension can be
swapped between restarts.  At scale the static side must stay
broadcast-sized (use a stream-stream join with watermarks otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_with_static(
    stream: DataFrame, dim: DataFrame, key: str, how: str = "inner"
) -> DataFrame:
    """Join a streaming DataFrame to a static dimension on ``key``."""
    return stream.join(F.broadcast(dim), key, how)
