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
from pyspark.sql import functions as F
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
        open_sess = list(state.get) if state.exists else None
        if len(rows) == 0:
            # Arrow batching can hand a key an empty pdf (no data, no
            # timeout): no-op, but re-arm state + timeout so the open
            # session still closes when the watermark passes it.
            if open_sess is not None:
                state.update(tuple(open_sess))
                state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
            return
        # pandas datetime64[ns] → epoch micros (integer floor-div, same
        # truncation as unix_micros / DuckDB epoch_us)
        rows["ts_us"] = rows["ts"].astype("int64") // 1000
        rows = rows.sort_values(["ts_us", "event_id"])

        import numpy as np

        ts = rows["ts_us"].to_numpy(dtype="int64")
        vals = rows["value"].to_numpy(dtype="float64")
        # Vectorized session split (a Python per-event loop is the batch
        # bottleneck at 10⁵ events/key·batch): boundary i starts a new
        # session iff ts[i] − previous event's ts > gap; event 0 compares
        # against the open session's end when one exists.
        prev0 = open_sess[1] if open_sess is not None else ts[0] - gap_us - 1
        prev = np.concatenate(([prev0], ts[:-1]))
        newflag = (ts - prev) > gap_us
        gid = np.cumsum(newflag)  # 0 = continuation of the open session
        # per-session aggregates; ts sorted so first/last are min/max
        idx_first = np.flatnonzero(np.concatenate(([True], gid[1:] != gid[:-1])))
        idx_last = np.concatenate((idx_first[1:] - 1, [len(ts) - 1]))
        starts = ts[idx_first]
        ends = ts[idx_last]
        # per-segment sums via reduceat — error stays at the segment-sum
        # ulp (~1e-13 here), unlike a cumsum-difference whose cancellation
        # error scales with the GLOBAL running total and could cross the
        # round-6 grid the oracle comparison uses
        counts = idx_last - idx_first + 1
        if open_sess is not None and gid[0] == 0:
            # continuation: prepend the carried sum as a synthetic first
            # element so the fold order is ((s+v0)+v1)+… — identical to a
            # per-event accumulation, so the result can't drift an ulp
            # from a single-batch run of the same events
            sums = np.add.reduceat(
                np.concatenate(([open_sess[3]], vals)),
                np.concatenate(([0], idx_first[1:] + 1)),
            )
            starts[0] = open_sess[0]
            counts[0] += open_sess[2]
        elif open_sess is not None:
            sums = np.add.reduceat(vals, idx_first)
            starts = np.concatenate(([open_sess[0]], starts))
            ends = np.concatenate(([open_sess[1]], ends))
            counts = np.concatenate(([open_sess[2]], counts))
            sums = np.concatenate(([open_sess[3]], sums))
        else:
            sums = np.add.reduceat(vals, idx_first)
        closed = list(
            zip(
                starts[:-1].tolist(),
                ends[:-1].tolist(),
                counts[:-1].tolist(),
                sums[:-1].tolist(),
            )
        )
        open_sess = [
            int(starts[-1]),
            int(ends[-1]),
            int(counts[-1]),
            float(sums[-1]),
        ]

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


def cdc_latest_state(stream: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Streaming CDC materialization: per-key latest (ts, seq) change
    plus op/delete audit counts, maintained incrementally in update
    mode — the stream twin of ``operators.events.cdc_apply`` (the
    Debezium-feed → snapshot loop, state = ONE small tuple per key).

    Expects columns (key, ts_us long, event_id long, value double,
    op string) — op and epoch-us derive JVM-side before the groupBy so
    the Python fold only compares/counts.  Per batch the winner is the
    max (ts_us, event_id) row (vectorized idxmax on a lexicographic
    key, no per-row loop); counts accumulate monotonically, so the
    final emission per key (max n_ops) IS the final state — the same
    convention running_user_totals' oracle uses.
    """

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts0, seq0, val0, op0, n, d = state.get
        else:
            ts0, seq0, val0, op0, n, d = (-1, -1, 0.0, "U", 0, 0)
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            n += len(pdf)
            d += int((pdf["op"] == "D").sum())
            best = pdf.sort_values(["ts_us", "event_id"]).iloc[-1]
            if (int(best["ts_us"]), int(best["event_id"])) > (ts0, seq0):
                ts0 = int(best["ts_us"])
                seq0 = int(best["event_id"])
                val0 = float(best["value"])
                op0 = str(best["op"])
        state.update((ts0, seq0, val0, op0, n, d))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "ts_us": [ts0],
                "last_value": [val0],
                "op": [op0],
                "n_ops": [n],
                "n_deletes": [d],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=(
            f"{key_col} bigint, ts_us bigint, last_value double, "
            "op string, n_ops bigint, n_deletes bigint"
        ),
        stateStructType=(
            "ts_us bigint, seq bigint, val double, op string, "
            "n bigint, d bigint"
        ),
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_state(
    stream: DataFrame,
    convert_type: str = "purchase",
    touch_type: str = "click",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming last-touch attribution — the stream twin of
    ``operators.events.last_touch_attribution``: per-key state is ONE
    (ts, id) tuple (the latest touch seen), each conversion emits an
    attribution row the moment it arrives.

    Within a micro-batch ALL Arrow chunks for the key are concatenated
    before the single (ts_us, event_id) sort — ``applyInPandasWithState``
    splits one key's batch into multiple unordered chunks past
    ``maxRecordsPerBatch``, so chunk-at-a-time processing would miss
    touches landing in a later chunk (same concat-first discipline as
    ``sessionize_stream``).  The latest-strictly-prior touch resolves by
    a vectorized forward-fill seeded from the carried state — no per-row
    Python loop; touch ids/timestamps stay int64 throughout (sentinel
    -1, never a NaN-float round-trip that would corrupt ids > 2^53).
    Across batches the carried touch seeds the next batch, which is
    exact under per-key in-order delivery (the per-user Kafka-partition
    contract this operator targets); out-of-order input needs the
    watermark-buffered variant ``attribution_state_ooo``.

    Expects (key, ts_us long, event_id long, event_type string).
    Emits (key, event_id, conv_ts_us, touch_event_id, touch_ts_us) per
    conversion, append mode; touch columns are null when no touch
    preceded.
    """
    import numpy as np

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lts, lid = state.get
        else:
            lts, lid = (-1, -1)
        # Concat ALL chunks, then sort ONCE: chunks of one key's batch
        # arrive unordered, so per-chunk ffill would miss cross-chunk
        # touches and could regress the carried state to an older touch.
        # pd.concat raises on an EMPTY iterator (zero chunks is possible
        # if a timeout variant is ever enabled) — guard it.
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame()
        )
        if len(pdf) > 0:
            pdf = pdf.sort_values(["ts_us", "event_id"])
            ts = pdf["ts_us"].to_numpy(dtype="int64")
            eid = pdf["event_id"].to_numpy(dtype="int64")
            is_touch = (pdf["event_type"] == touch_type).to_numpy()
            # int64 forward-fill with -1 sentinel (no float64 round-trip:
            # ids above 2^53 stay exact)
            idx = np.where(is_touch, np.arange(len(ts)), -1)
            np.maximum.accumulate(idx, out=idx)
            ct = np.where(idx >= 0, ts[np.maximum(idx, 0)], lts)
            ci = np.where(idx >= 0, eid[np.maximum(idx, 0)], lid)
            conv = (pdf["event_type"] == convert_type).to_numpy()
            if conv.any():
                yield pd.DataFrame(
                    {
                        key_col: pd.array(
                            [key[0]] * int(conv.sum()), dtype="Int64"
                        ),
                        "event_id": pd.array(eid[conv], dtype="Int64"),
                        "conv_ts_us": pd.array(ts[conv], dtype="Int64"),
                        "touch_event_id": pd.array(
                            [None if v < 0 else int(v) for v in ci[conv]],
                            dtype="Int64",
                        ),
                        "touch_ts_us": pd.array(
                            [None if v < 0 else int(v) for v in ct[conv]],
                            dtype="Int64",
                        ),
                    }
                )
            if is_touch.any():
                lts = int(ts[is_touch][-1])
                lid = int(eid[is_touch][-1])
        state.update((lts, lid))

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=(
            f"{key_col} bigint, event_id bigint, conv_ts_us bigint, "
            "touch_event_id bigint, touch_ts_us bigint"
        ),
        stateStructType="ts_us bigint, seq bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def attribution_state_ooo(
    stream: DataFrame,
    delay: str = "31 days",
    convert_type: str = "purchase",
    touch_type: str = "click",
    key_col: str = "user_id",
) -> DataFrame:
    """Watermark-buffered last-touch attribution for OUT-OF-ORDER input.

    ``attribution_state`` is exact only under per-key in-order delivery:
    it resolves each conversion the moment it arrives, so a touch whose
    event time PRECEDES an already-emitted conversion but which arrives
    in a later micro-batch is silently missed.  This variant makes the
    classic watermark trade instead — hold every conversion in state
    until the watermark passes its event time (at which point no
    earlier-timestamped touch can still arrive: rows at/below the
    watermark are filtered at arrival — Spark leaves late-row handling
    to the user function in flatMapGroupsWithState, fixture-pinned),
    then resolve it against the COMPLETE touch history and emit.
    Exactness for rows within ``delay`` of the stream head; rows later
    than that are dropped (the DROP side is fixture-pinned in tests).

    Per-key state is a bounded buffer of the not-yet-mature touches and
    conversions (everything newer than the watermark — size is
    O(events within the watermark horizon), the same bound every
    watermarked stream-stream join carries) plus the single carried
    latest mature touch; mature touches compact into that one tuple as
    the watermark advances, so state never grows with total history.
    An ``EventTimeTimeout`` re-arms at the oldest pending conversion so
    buffered conversions drain even when the key receives no further
    events (flush via ``flush_sentinel_stream`` on bounded drains).

    Expects (key, ts timestamp, event_id long, event_type string); the
    watermark is applied here on ``ts``.  Emits the same append-mode
    schema as ``attribution_state``.
    """
    import numpy as np

    def resolve(
        key: tuple[Any, ...],
        state: GroupState,
        lts: int,
        lid: int,
        bts: list[int],
        bid: list[int],
        btouch: list[bool],
    ) -> Iterator[pd.DataFrame]:
        wm_us = state.getCurrentWatermarkMs() * 1000
        n = len(bts)
        if n:
            order = sorted(range(n), key=lambda i: (bts[i], bid[i]))
            ts = np.array([bts[i] for i in order], dtype=np.int64)
            eid = np.array([bid[i] for i in order], dtype=np.int64)
            istouch = np.array([btouch[i] for i in order], dtype=bool)
            idx = np.where(istouch, np.arange(n), -1)
            np.maximum.accumulate(idx, out=idx)
            ct = np.where(idx >= 0, ts[np.maximum(idx, 0)], lts)
            ci = np.where(idx >= 0, eid[np.maximum(idx, 0)], lid)
            ripe = (~istouch) & (ts <= wm_us)
            if ripe.any():
                yield pd.DataFrame(
                    {
                        key_col: pd.array(
                            [key[0]] * int(ripe.sum()), dtype="Int64"
                        ),
                        "event_id": pd.array(eid[ripe], dtype="Int64"),
                        "conv_ts_us": pd.array(ts[ripe], dtype="Int64"),
                        "touch_event_id": pd.array(
                            [None if v < 0 else int(v) for v in ci[ripe]],
                            dtype="Int64",
                        ),
                        "touch_ts_us": pd.array(
                            [None if v < 0 else int(v) for v in ct[ripe]],
                            dtype="Int64",
                        ),
                    }
                )
            mature_touch = istouch & (ts <= wm_us)
            if mature_touch.any():
                # monotone compaction: a LATE touch (Spark does not
                # pre-filter late rows for this operator — fixture-pinned)
                # older than the carried touch must not regress it
                j = int(np.flatnonzero(mature_touch)[-1])
                if (int(ts[j]), int(eid[j])) > (lts, lid):
                    lts, lid = int(ts[j]), int(eid[j])
            pend = ts > wm_us
            bts = ts[pend].tolist()
            bid = eid[pend].tolist()
            btouch = istouch[pend].tolist()
        else:
            bts, bid, btouch = [], [], []
        state.update((lts, lid, bts, bid, btouch))
        pend_conv = [t for t, c in zip(bts, btouch) if not c]
        if pend_conv:
            # wake when the watermark passes the oldest pending
            # conversion; must be strictly above the current watermark
            state.setTimeoutTimestamp(
                max(wm_us // 1000 + 1, min(pend_conv) // 1000 + 1)
            )

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            lts, lid, bts, bid, btouch = state.get
            bts = list(bts or [])
            bid = list(bid or [])
            btouch = list(btouch or [])
        else:
            lts, lid, bts, bid, btouch = -1, -1, [], [], []
        if not state.hasTimedOut:
            chunks = list(pdfs)
            pdf = (
                pd.concat(chunks, ignore_index=True)
                if chunks
                else pd.DataFrame()
            )
            if len(pdf):
                # Spark does NOT pre-filter late rows for this operator
                # (flatMapGroupsWithState contract: late handling is the
                # user function's job) — drop rows at/below the watermark
                # here.  This keeps the invariant that every buffered row
                # is event-time-newer than every compacted touch, which
                # is what makes resolution exact for on-time rows.
                wm_arrival_us = state.getCurrentWatermarkMs() * 1000
                pdf = pdf[
                    pdf["event_type"].isin([touch_type, convert_type])
                    & (pdf["ts_us"].astype("int64") > wm_arrival_us)
                ]
                bts += pdf["ts_us"].astype("int64").tolist()
                bid += pdf["event_id"].astype("int64").tolist()
                btouch += (pdf["event_type"] == touch_type).tolist()
        yield from resolve(key, state, lts, lid, bts, bid, btouch)

    # the watermarked column itself must survive into the grouped plan
    # (event-time timeout is rejected otherwise); fold ignores it and
    # reads the integer twin ts_us
    keyed = stream.withWatermark("ts", delay).select(
        F.col(key_col),
        F.col("ts"),
        F.unix_micros("ts").alias("ts_us"),
        "event_id",
        "event_type",
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=(
            f"{key_col} bigint, event_id bigint, conv_ts_us bigint, "
            "touch_event_id bigint, touch_ts_us bigint"
        ),
        stateStructType=(
            "lts bigint, lid bigint, buf_ts array<bigint>, "
            "buf_id array<bigint>, buf_touch array<boolean>"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def funnel_state(
    stream: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    within_minutes: int = 24 * 60,
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming time-constrained funnel — the stream twin of
    ``operators.events.windowed_funnel``: per-key state is the pair
    (stage reached, its event time); each event that advances the
    funnel emits an advance row the moment it arrives (append mode).

    Within a micro-batch ALL Arrow chunks concat before one
    (ts_us, event_id) sort (the attribution_state discipline); the fold
    is a per-key Python loop over the handful of that key's batch rows
    — the state machine is inherently sequential, and the rows/key/batch
    term is tiny next to the Arrow transfer.  Exact under per-key
    in-order delivery, the same contract (and the same watermark-buffer
    upgrade path) as ``attribution_state``.

    Under in-order delivery each stage advances at its MINIMUM
    qualifying event time, which is exactly the batch operator's
    frontier — so the drained advance rows aggregate to the batch
    funnel counts.

    Expects (key, ts_us long, event_id long, event_type string); emits
    (key, stage, event_type, ts_us) per advance — stage is 1-indexed.
    """
    within_us = within_minutes * 60 * 1_000_000
    idx = {s: i for i, s in enumerate(stages)}

    def fold(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        stage, sts = state.get if state.exists else (0, -1)
        chunks = list(pdfs)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if chunks
            else pd.DataFrame()
        )
        out = []
        if len(pdf):
            pdf = pdf[pdf["event_type"].isin(list(stages))]
            pdf = pdf.sort_values(["ts_us", "event_id"])
            for ts, et in zip(
                pdf["ts_us"].astype("int64"), pdf["event_type"]
            ):
                if stage >= len(stages) or idx[et] != stage:
                    continue
                if stage > 0 and not (sts < ts <= sts + within_us):
                    continue
                stage += 1
                sts = int(ts)
                out.append((key[0], stage, et, int(ts)))
        state.update((stage, sts))
        if out:
            yield pd.DataFrame(
                {
                    key_col: pd.array([o[0] for o in out], dtype="Int64"),
                    "stage": pd.array([o[1] for o in out], dtype="Int32"),
                    "event_type": [o[2] for o in out],
                    "ts_us": pd.array([o[3] for o in out], dtype="Int64"),
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        fold,
        outputStructType=(
            f"{key_col} bigint, stage int, event_type string, ts_us bigint"
        ),
        stateStructType="stage int, sts bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
