"""Incremental materialized-view maintenance over a stream.

``run_available_now`` + a state-store aggregation keeps running totals
INSIDE the engine; this module is the other production pattern: the
view lives OUTSIDE the stream as a queryable table, and every
micro-batch folds its delta in through ``foreachBatch`` — the
"streaming upsert into the serving table" shape (JDBC/MERGE INTO in a
warehouse, parquet versions here).

Merge math: the view stores (count, decimal sum) per key.  Both are
associative and commutative, so folding per-batch partial aggregates
is EXACTLY the batch aggregate over all data seen — decimal sums make
that independent of batch boundaries and partition order (the same
FIXTURES.md rule the batch oracles rely on).

State versioning: epoch ``e`` writes ``v{e}`` built from the previous
version — never overwriting a file a concurrent reader (or this job's
own lineage) may still be scanning, and re-delivery of an epoch after
a crash rewrites the same ``v{e}`` deterministically (idempotent
exactly-once on top of foreachBatch's at-least-once contract).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.streaming.run import run_foreach_batch

_SUM_T = "decimal(30,8)"


def _latest_version(state_root: str, below: int | None = None) -> str | None:
    """Path of the highest-epoch ``v{e}`` under ``state_root`` (with
    ``e < below`` when given), or None.  Recovery reads THIS, never an
    in-memory pointer: after a crash the resumed run must fold its
    first redelivered batch into the last version a COMMITTED epoch
    wrote — and a redelivered epoch ``e`` must rebuild ``v{e}`` from
    the version strictly below ``e`` (its own half-written ``v{e}``
    from the crashed attempt is rewritten, not compounded)."""
    if not os.path.isdir(state_root):
        return None
    best: int | None = None
    for name in os.listdir(state_root):
        if name.startswith("v") and name[1:].isdigit():
            e = int(name[1:])
            if below is not None and e >= below:
                continue
            if best is None or e > best:
                best = e
    return None if best is None else os.path.join(state_root, f"v{best}")


def maintain_user_totals(
    stream_df: DataFrame,
    state_root: str,
    key_col: str = "user_id",
    value_col: str = "value",
    timeout_sec: int = 300,
    checkpoint: str | None = None,
) -> DataFrame:
    """Drain ``stream_df`` maintaining a per-key (n_events, sum) view.

    Returns the final view as a batch DataFrame:
    (key, n_events long, sum decimal).

    Restart contract (pinned in tests/test_streaming.py): pass the same
    ``checkpoint`` and ``state_root`` to resume — committed epochs are
    skipped by the checkpoint, the first new epoch folds into the
    latest on-disk version, and a redelivered (uncommitted) epoch
    rewrites its own version deterministically from the one below it.
    """
    spark = stream_df.sparkSession
    # epochs THIS drain wrote: the final view must come from this run's
    # own output, not whatever stale v{e} a prior run with a different
    # checkpoint left at a higher epoch number under the same state_root
    written: list[int] = []

    def merge(batch: DataFrame, epoch_id: int) -> None:
        delta = batch.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(25,8)"))
            .cast(_SUM_T)
            .alias("sum_v"),
        )
        prev = _latest_version(state_root, below=int(epoch_id))
        if prev is not None:
            merged = (
                spark.read.parquet(prev)
                .unionByName(delta)
                .groupBy(key_col)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_v").cast(_SUM_T).alias("sum_v"),
                )
            )
        else:
            merged = delta
        new = os.path.join(state_root, f"v{epoch_id}")
        merged.write.mode("overwrite").parquet(new)
        written.append(int(epoch_id))

    run_foreach_batch(
        stream_df, merge, timeout_sec=timeout_sec, checkpoint=checkpoint
    )
    # This drain's result is the highest epoch IT wrote.  Only when the
    # drain delivered nothing (fully-committed checkpoint resume) is the
    # on-disk maximum the right answer — then it IS this lineage's last
    # committed version.  A global max would instead return a stale
    # higher-numbered v{e} when a fresh checkpoint (epochs restarting at
    # 0) reuses a dirty state_root.
    if written:
        final = os.path.join(state_root, f"v{max(written)}")
    else:
        final = _latest_version(state_root)
    if final is None:  # empty source: an empty, typed view
        return spark.createDataFrame(
            [], f"{key_col} long, n_events long, sum_v {_SUM_T}"
        )
    return spark.read.parquet(final)
