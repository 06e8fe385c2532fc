"""Streaming sources over the testdata tables.

Streaming reads require an explicit schema (no inference pass exists on
an unbounded source).  We take it from the parquet footer via a batch
reader handle — a metadata-only operation, no data scan — so the
streaming schema can never drift from the batch one.

At cluster scale the same call works against a directory that data is
continuously landed into; ``maxFilesPerTrigger`` bounds per-micro-batch
work so one giant backlog drain can't blow executor memory.
"""

from __future__ import annotations

import os
from flink_kmeans_clustering_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.sources.parquet import TABLES

_STAGE_ROOT: str | None = None

# Sentinel machinery memoization: the events file is immutable for the
# life of a session, so its max event time (a full-column scan) and the
# staged one-row sentinel parquet are computed once per (path, advance)
# and reused by every subsequent flush-on-drain query in the process.
_MAX_US_CACHE: dict[str, int] = {}
_SENTINEL_DIR_CACHE: dict[tuple[str, int], str] = {}
# Schema memoization (r15): the streaming reader needs an explicit
# schema, taken from the parquet footer via a batch handle — a
# metadata-only read, but still a fresh relation resolution per call,
# and queries like the stream-stream joins build FOUR readers each.
# Testdata tables are immutable per process, so one footer read per
# path suffices.
_SCHEMA_CACHE: dict[str, "object"] = {}


def _as_stream_dir(path: str) -> str:
    """Stage a single parquet *file* behind a directory of symlinks.

    Spark's FileStreamSource pins ``basePath`` to the source path and
    requires it to be a directory; the testdata tables are bare files.
    A symlink directory is metadata-only (no bytes copied) and keeps
    the same layout a production stream would use (a landing dir files
    are appended into).
    """
    global _STAGE_ROOT
    if os.path.isdir(path):
        return path
    if _STAGE_ROOT is None:
        _STAGE_ROOT = scratch_dir("stream_stage_")
    key = path.strip("/").replace("/", "__")
    d = os.path.join(_STAGE_ROOT, key)
    if not os.path.isdir(d):
        os.makedirs(d, exist_ok=True)
        os.symlink(path, os.path.join(d, os.path.basename(path)))
    return d


def stream_table(
    spark: SparkSession,
    name: str,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``readStream`` over one testdata parquet table (unbounded handle)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # tolerate INT64 TIMESTAMP(NANOS) testdata generations — read as raw
    # longs, same as sources.parquet.load_events (see normalize_event_ts).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = _as_stream_dir(os.path.join(sf_dir, f"{name}.parquet"))
    if path not in _SCHEMA_CACHE:
        _SCHEMA_CACHE[path] = spark.read.parquet(path).schema
    reader = spark.readStream.schema(_SCHEMA_CACHE[path])
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_events(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming events scan with a proper TIMESTAMP ``ts`` column.

    Streaming twin of ``sources.parquet.load_events``: the same
    ``normalize_event_ts`` coercion (nanos-long floor-div or NTZ cast)
    so the value matches DuckDB's ``epoch_us`` on the same file.
    """
    from flink_kmeans_clustering_spark.sources.parquet import normalize_event_ts

    ev = stream_table(spark, "events", sf_dir, max_files_per_trigger)
    return normalize_event_ts(ev)


def flush_sentinel_stream(
    spark: SparkSession,
    sf_dir: str,
    advance_minutes: int,
) -> DataFrame:
    """One far-future sentinel event (``user_id = -1``) as a stream.

    Unioned into an event stream before a bounded drain, the sentinel
    pushes the final watermark ``advance_minutes`` past the real data's
    max event time, so every event-time timeout whose deadline falls
    within that margin fires before the drain ends (flush-on-drain).
    Callers filter ``user_id >= 0`` afterwards; the sentinel's own state
    row never times out and never reaches the sink.

    The max-timestamp lookup is a batch scan of the bounded source —
    fine for a drain, meaningless on a real 24/7 stream, where the
    producer injects the sentinel (or you accept open state surviving;
    both contracts are pinned in tests/test_streaming.py).

    Columns: ``user_id, event_id, ts, value`` — the sessionization
    input surface.
    """
    # max(ts) as integer micros, read from the parquet FOOTER statistics
    # (metadata-only — no data scan; every writer that produced this
    # testdata records int64/timestamp min-max per row group, and max of
    # row-group maxes is the column max).  For a nanos-long generation
    # the footer stat is an int (ns→us floor-div commutes with max
    # because div is monotone); for a timestamp generation it's a
    # datetime at micro precision.  Falls back to an engine-side scan
    # only when stats are absent.  Rounds 1-2 paid a full events pass
    # per query here; now it's one footer read per process.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = os.path.join(sf_dir, "events.parquet")
    if events_path not in _MAX_US_CACHE:
        _MAX_US_CACHE[events_path] = _max_event_us(spark, events_path)
    sentinel_us = _MAX_US_CACHE[events_path] + advance_minutes * 60_000_000
    schema = (
        "user_id bigint, event_id bigint, ts timestamp, value double"
    )
    key = (events_path, advance_minutes)
    if key not in _SENTINEL_DIR_CACHE:
        # one row, written driver-side with pyarrow: a Spark write of the
        # same row costs seconds of first-write committer/codec spin-up
        # per session for a 4-value file.
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = scratch_dir("flush_sentinel_")
        tbl = pa.table(
            {
                "user_id": pa.array([-1], pa.int64()),
                "event_id": pa.array([-1], pa.int64()),
                "ts": pa.array([sentinel_us], pa.timestamp("us")),
                "value": pa.array([0.0], pa.float64()),
            }
        )
        pq.write_table(tbl, os.path.join(d, "part-00000.parquet"))
        _SENTINEL_DIR_CACHE[key] = d
    return spark.readStream.schema(schema).parquet(_SENTINEL_DIR_CACHE[key])


def _max_event_us(spark: SparkSession, events_path: str) -> int:
    """Column max of ``ts`` in integer micros, preferring footer stats."""
    import datetime

    try:
        import pyarrow.parquet as pq

        md = pq.ParquetFile(events_path).metadata
        ts_idx = next(
            i
            for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "ts"
        )
        maxes = []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ts_idx).statistics
            if st is None or not st.has_min_max:
                raise ValueError("row group without ts min/max stats")
            maxes.append(st.max)
        if not maxes:  # zero-row file: any sentinel time flushes nothing
            return 0
        if isinstance(maxes[0], datetime.datetime):
            epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
            return max(
                int(
                    (m.replace(tzinfo=datetime.timezone.utc) - epoch)
                    / datetime.timedelta(microseconds=1)
                )
                for m in maxes
            )
        return max(int(m) for m in maxes) // 1000  # int64 nanos generation
    except Exception:
        # stats unavailable (encrypted/ancient writer): one engine scan
        raw = spark.read.parquet(events_path)
        if dict(raw.dtypes)["ts"] == "bigint":
            us = F.expr("ts div 1000")
        else:
            us = F.unix_micros(F.col("ts").cast("timestamp"))
        [row] = raw.agg(F.max(us).alias("m")).collect()
        return int(row["m"]) if row["m"] is not None else 0
