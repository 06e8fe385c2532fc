"""Arbitrary stateful streaming via ``applyInPandasWithState``.

Two operators:

* ``running_user_totals`` — per-key running aggregate in update mode.
  State is two numbers per user; each micro-batch emits the updated
  cumulative row for every user seen in that batch.  The *final*
  emission per user equals the batch ``groupBy(user).agg`` result,
  which is what the oracle checks (take the row with max n_events).
* ``sessionize_stream`` — event-time gap sessionization with
  ``EventTimeTimeout``: a session closes when the watermark passes its
  last event + gap; closed sessions are emitted and their state freed.
  Sessions still open when the bounded drain ends stay in state (same
  contract as a real 24/7 stream), so tests compare only sessions that
  are provably closed under the final watermark.

Both keep state per user_id — hash-partitioned by key, no skew beyond
the key distribution itself, state size O(distinct active keys).
Arrow-batched pandas transfer, never row-at-a-time Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Cumulative (n_events, sum_value) per user, updated every batch."""

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, n_events bigint, sum_value double",
        stateStructType="n bigint, s double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_stream(stream: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Emit closed gap-sessions (start/end epoch-us, count, Σvalue).

    Buffers each user's open sessions in state; events are folded in
    event-time order per batch.  A session is emitted when a later
    event opens a new one (gap exceeded) or when the event-time timeout
    fires (watermark passed last_ts + gap).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            start, end, n, s = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start],
                    "session_end_us": [end],
                    "n_events": [n],
                    "sum_value": [s],
                }
            )
            return

        rows = pd.concat(list(pdfs), ignore_index=True)
        # pandas datetime64[ns] → epoch micros (integer floor-div, same
        # truncation as unix_micros / DuckDB epoch_us)
        rows["ts_us"] = rows["ts"].astype("int64") // 1000
        rows = rows.sort_values(["ts_us", "event_id"])

        open_sess = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int, float]] = []
        for ts_us, value in zip(rows["ts_us"], rows["value"]):
            ts_us = int(ts_us)
            if open_sess is None:
                open_sess = [ts_us, ts_us, 0, 0.0]
            elif ts_us - open_sess[1] > gap_us:
                closed.append(tuple(open_sess))
                open_sess = [ts_us, ts_us, 0, 0.0]
            open_sess[1] = ts_us
            open_sess[2] += 1
            open_sess[3] += float(value)

        state.update(tuple(open_sess))
        # close when the watermark passes last_ts + gap (event-time).
        state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(closed),
                    "session_start_us": [c[0] for c in closed],
                    "session_end_us": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                    "sum_value": [c[3] for c in closed],
                }
            )

    return (
        stream.withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            fold,
            outputStructType=(
                "user_id bigint, session_start_us bigint, "
                "session_end_us bigint, n_events bigint, sum_value double"
            ),
            stateStructType=(
                "start_us bigint, end_us bigint, n bigint, s double"
            ),
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
