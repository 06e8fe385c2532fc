"""Single-file CSV sink (S4 parity).

The reference writes each output as exactly one CSV file:
``writeAsCsv(path, "\\n", ",", OVERWRITE).setParallelism(1)``
(``KMeans.java:132,231-233``), headerless.

Spark's native writer emits a *directory* of part files; for parity we
``coalesce(1)``, write to a scratch dir, and move the single part file
to the requested path.  This is a driver-side rename of one file — fine
for the k-row/assignment outputs this sink exists for.  Large-scale
outputs should use the plain directory writer (``df.write.csv``) —
single-file output is inherently a parallelism-1 bottleneck, exactly as
it was in the reference.
"""

from __future__ import annotations

import glob
import os
import shutil
from flink_kmeans_clustering_spark.scratch import scratch_dir

from pyspark.sql import DataFrame


def write_csv_single(
    df: DataFrame,
    path: str,
    header: bool = True,
    flink_compat: bool = False,
) -> str:
    """Write ``df`` as ONE csv file at ``path`` (overwrite).

    ``flink_compat=True`` reproduces the reference's exact layout:
    no header row, ``,`` field / ``\\n`` line delimiters.
    """
    if flink_compat:
        header = False
    scratch = scratch_dir("csv_sink_")
    out_dir = os.path.join(scratch, "out")
    df.coalesce(1).write.mode("overwrite").option("header", header).csv(out_dir)
    [part] = glob.glob(os.path.join(out_dir, "part-*.csv"))
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    shutil.move(part, path)
    shutil.rmtree(scratch, ignore_errors=True)
    return path
