"""Structured Streaming ops vs their batch twins on sf0.001.

Every streaming pipeline is drained with ``trigger(availableNow=True)``
into a memory sink and compared against the equivalent batch DataFrame
result — the streaming analogue of the DuckDB oracle strategy.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from flink_kmeans_clustering_spark.sources.parquet import load_events
from flink_kmeans_clustering_spark.operators.events import (
    sessionize,
    tumbling_window_agg,
)
from flink_kmeans_clustering_spark.streaming import (
    stream_events,
    dedup_stream,
    run_available_now,
    running_user_totals,
    sessionize_stream,
    stream_table,
    windowed_event_counts,
)

SF = "/root/testdata/sf0.001"


def _sorted_pdf(df, keys):
    return (
        df.toPandas()
        .sort_values(keys)
        .reset_index(drop=True)
    )


def test_stream_is_streaming_handle(spark):
    assert stream_events(spark, SF).isStreaming


def test_windowed_counts_match_batch(spark):
    stream = stream_events(spark, SF)
    # complete mode: every finalized window value is the full aggregate,
    # identical to the batch tumbling window.
    got = run_available_now(
        windowed_event_counts(stream), output_mode="complete"
    )
    want = tumbling_window_agg(load_events(spark, SF))
    keys = ["window_start", "event_type"]
    pd.testing.assert_frame_equal(_sorted_pdf(got, keys), _sorted_pdf(want, keys))


def test_dedup_stream_matches_distinct(spark):
    stream = dedup_stream(stream_table(spark, "documents", SF), ["text"])
    got = run_available_now(stream.select(F.md5("text").alias("digest")))
    want = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.md5("text").alias("digest"))
        .distinct()
    )
    pd.testing.assert_frame_equal(
        _sorted_pdf(got, ["digest"]), _sorted_pdf(want, ["digest"])
    )


def test_running_totals_final_state_matches_batch(spark):
    stream = stream_events(spark, SF)
    out = run_available_now(running_user_totals(stream), output_mode="update")
    # update mode re-emits a user's cumulative row each batch; the final
    # (max n_events) row per user is the complete aggregate.
    final = out.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("sum_value", "n_events").alias("sum_value"),
    )
    want = (
        load_events(spark, SF)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    g = _sorted_pdf(final, ["user_id"])
    w = _sorted_pdf(want, ["user_id"])
    pd.testing.assert_frame_equal(g, w, check_exact=False, rtol=1e-9)


def test_sessionize_stream_emits_closed_sessions(spark):
    stream = stream_events(spark, SF)
    got = run_available_now(sessionize_stream(stream, gap_minutes=30)).toPandas()
    batch = sessionize(load_events(spark, SF), gap_minutes=30).toPandas()

    # Streamed sessions must be a subset of batch sessions, keyed by
    # (user, start, end, n, Σvalue); open-at-drain-end sessions remain
    # in state by design.
    def keyset(pdf):
        return {
            (
                int(r.user_id),
                int(r.session_start_us),
                int(r.session_end_us),
                int(r.n_events),
                round(float(r.sum_value), 6),
            )
            for r in pdf.itertuples()
        }

    batch_keys = {
        (k[0], k[1], k[2], k[3], k[4])
        for k in (
            (
                int(r.user_id),
                int(r.session_start_us),
                int(r.session_end_us),
                int(r.n_events),
                round(float(r.sum_value), 6),
            )
            for r in batch.itertuples()
        )
    }
    got_keys = keyset(got)
    assert got_keys <= batch_keys
    # with a 0s watermark delay every session except each user's last
    # closes; demand substantial coverage so the operator can't pass
    # by emitting nothing.
    n_users = batch["user_id"].nunique()
    assert len(got_keys) >= len(batch_keys) - n_users


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from flink_kmeans_clustering_spark.streaming.run import run_foreach_batch

    out = str(tmp_path / "events_out")
    epochs = []

    def write_batch(batch_df, epoch_id):
        epochs.append(epoch_id)
        batch_df.write.mode("append").parquet(out)

    run_foreach_batch(stream_events(spark, SF), write_batch)
    assert len(epochs) >= 1
    back = spark.read.parquet(out)
    src = load_events(spark, SF)
    assert back.count() == src.count()
    assert set(back.columns) == set(src.columns)


def test_checkpoint_restart_processes_each_file_once(spark, tmp_path):
    """Exactly-once across restarts: two availableNow drains sharing one
    checkpoint must process each source file exactly once — the second
    drain picks up ONLY files landed after the first (the restart
    contract a production stream relies on; STATUS.md round 2)."""
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    spark.range(10).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        q = (
            spark.readStream.schema(schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 10

    spark.range(100, 105).selectExpr("id", "id * 2 AS v").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()
    got = spark.read.parquet(out)
    # 15 rows, not 25: the first file was NOT reprocessed
    assert got.count() == 15
    assert got.filter("id >= 100").count() == 5


def test_streaming_kmeans_single_batch_equals_batch_update(spark):
    """α=1 over a one-file drain must reproduce update_centroids exactly."""
    from flink_kmeans_clustering_spark.operators.kmeans import (
        assign_points,
        update_centroids,
    )
    from flink_kmeans_clustering_spark.streaming.kmeans import streaming_kmeans
    from flink_kmeans_clustering_spark.streaming.sources import stream_table
    from flink_kmeans_clustering_spark.views import centroids_v, points_v
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    init = centroids_v(spark, SF_SMOKE)
    pts = stream_table(spark, "embeddings", SF_SMOKE).select(
        F.col("vec_id").alias("point_id"),
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    got = {
        cid: (cx, cy, w)
        for cid, cx, cy, w in streaming_kmeans(pts, init, decay=1.0)
        if w > 0
    }
    want = {
        int(r["id"]): (float(r["x"]), float(r["y"]), float(r["n"]))
        for r in update_centroids(
            assign_points(points_v(spark, SF_SMOKE), init)
        ).collect()
    }
    assert got == want  # bit-exact, not approximately


def test_streaming_kmeans_decay_forgets_old_batches(spark, tmp_path):
    """Two ordered micro-batches with α=0.5: old mass halves."""
    import os
    import time as _time

    from flink_kmeans_clustering_spark.streaming.kmeans import streaming_kmeans

    d = str(tmp_path / "pts")
    # batch 1: two points at x=0; batch 2: one point at x=10 (y fixed)
    b1 = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 0.0)], "point_id long, x double, y double"
    )
    b2 = spark.createDataFrame(
        [(3, 10.0, 0.0)], "point_id long, x double, y double"
    )
    b1.coalesce(1).write.parquet(d + "/f0")
    _time.sleep(1.1)  # file-source batch order follows mtime
    b2.coalesce(1).write.parquet(d + "/f1")
    stream = (
        spark.readStream.schema("point_id long, x double, y double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    [(cid, cx, cy, w)] = streaming_kmeans(
        stream, [(0, 5.0, 0.0)], decay=0.5
    )
    # after b1: Σx=0, w=2 ; after b2: Σx=0*.5+10=10, w=2*.5+1=2
    assert (cid, cy) == (0, 0.0)
    assert w == 2.0 and cx == 5.0


def test_streaming_kmeans_empty_cluster_keeps_init(spark):
    from flink_kmeans_clustering_spark.streaming.kmeans import streaming_kmeans
    from flink_kmeans_clustering_spark.streaming.sources import stream_table
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    pts = stream_table(spark, "embeddings", SF_SMOKE).select(
        F.col("vec_id").alias("point_id"),
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    # one absurdly remote centroid never wins a point -> weight 0, kept
    init = [(0, 0.0, 0.0), (1, 1e9, 1e9)]
    out = dict(
        (cid, (cx, cy, w)) for cid, cx, cy, w in streaming_kmeans(pts, init)
    )
    assert out[1] == (1e9, 1e9, 0.0)
    assert out[0][2] > 0


def test_dedup_within_watermark_drops_late_duplicate(spark, tmp_path):
    """A duplicate key arriving in a later micro-batch inside the
    watermark horizon is dropped (state-bounded exactly-once)."""
    import datetime as dt
    import time as _time

    from flink_kmeans_clustering_spark.streaming.dedup import dedup_stream
    from flink_kmeans_clustering_spark.streaming.run import run_available_now

    d = str(tmp_path / "dup_ev")
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    b1 = spark.createDataFrame(
        [(1, t0, 1.0), (2, t0, 2.0)], "event_id long, ts timestamp, value double"
    )
    # batch 2: event 1 retransmitted 5 min later (inside the 1h horizon)
    b2 = spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=5), 1.0), (3, t0, 3.0)],
        "event_id long, ts timestamp, value double",
    )
    b1.coalesce(1).write.parquet(d + "/f0")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(d + "/f1")
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = run_available_now(
        dedup_stream(stream, ["event_id"], ts_col="ts", watermark_delay="1 hour")
    )
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]  # the retransmission emitted nothing new


def test_dedup_watermark_drops_late_rows_and_evicts_state(spark, tmp_path):
    """Watermark-lateness spec (VERDICT r05 item 8), pinned against the
    MEASURED dropDuplicatesWithinWatermark contract (validated with
    per-batch watermark progress on this Spark):

    1. a row older than the current watermark is dropped as LATE input
       (the 12:05 retransmission under a 13:55 watermark emits nothing);
    2. the watermark also EVICTS state — an on-time retransmission
       (14:10 > watermark) of a key whose horizon passed is re-emitted.

    Together these are why the operator is scale-safe: state never
    outgrows the horizon, and the price is exactly-once only WITHIN it.
    """
    import datetime as dt
    import time as _time

    from flink_kmeans_clustering_spark.streaming.dedup import dedup_stream
    from flink_kmeans_clustering_spark.streaming.run import run_available_now

    d = str(tmp_path / "late_ev")
    t0 = dt.datetime(2024, 1, 1, 12, 0)
    schema = "event_id long, ts timestamp, value double"
    spark.createDataFrame(
        [(1, t0, 1.0), (2, t0, 2.0)], schema
    ).coalesce(1).write.parquet(d + "/f0")
    _time.sleep(1.1)
    # advances the watermark to 13:50 for the NEXT batch
    spark.createDataFrame(
        [(98, t0 + dt.timedelta(hours=2), 9.0)], schema
    ).coalesce(1).write.parquet(d + "/f1")
    _time.sleep(1.1)
    spark.createDataFrame(
        [(99, t0 + dt.timedelta(hours=2, minutes=5), 9.5)], schema
    ).coalesce(1).write.parquet(d + "/f2")
    _time.sleep(1.1)
    # key 1 retransmitted at 12:05 — BELOW the 13:55 watermark: late,
    # dropped entirely
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(minutes=5), 1.0)], schema
    ).coalesce(1).write.parquet(d + "/f3")
    _time.sleep(1.1)
    # key 1 retransmitted ON TIME at 14:10 — its state (horizon 12:10)
    # was evicted long ago, so it re-emits
    spark.createDataFrame(
        [(1, t0 + dt.timedelta(hours=2, minutes=10), 1.0)], schema
    ).coalesce(1).write.parquet(d + "/f4")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = run_available_now(
        dedup_stream(stream, ["event_id"], ts_col="ts", watermark_delay="10 minutes")
    )
    rows = sorted(
        (r["event_id"], r["ts"]) for r in out.collect()
    )
    ids = [i for i, _ in rows]
    assert ids == [1, 1, 2, 98, 99]
    # the re-emitted key 1 is the ON-TIME retransmission, not the late one
    assert rows[1][1] == t0 + dt.timedelta(hours=2, minutes=10)


def test_native_session_lateness_merge_while_open_drop_after_close(spark, tmp_path):
    """Native session windows under lateness — BOTH phases of the
    measured contract (validated with per-batch watermark progress):

    Phase 1 (session still in state): a late event (12:15, below the
    14:00 watermark) still MERGES into its not-yet-finalized session —
    the watermark gates finalization, not admission to open state.

    Phase 2 (session finalized): once the watermark passed the session
    end and it was EMITTED, a late event for the same user produces
    NOTHING — no new session, no mutation of the emitted row (append
    mode is immutable).

    A batch replay over all events merges the late row (n=3), proving
    the phase-2 drop is streaming lateness semantics, not the
    expression."""
    import datetime as dt
    import time as _time

    from flink_kmeans_clustering_spark.operators.events import session_window_agg
    from flink_kmeans_clustering_spark.streaming.run import run_available_now

    t0 = dt.datetime(2024, 1, 1, 12, 0)
    schema = "user_id long, event_id long, ts timestamp, value double"
    on_time = [
        (7, 1, t0, 1.0),
        (7, 2, t0 + dt.timedelta(minutes=10), 2.0),
    ]
    adv1 = [(8, 3, t0 + dt.timedelta(hours=3), 0.0)]
    adv2 = [(8, 4, t0 + dt.timedelta(hours=3, minutes=5), 0.0)]
    late = [(7, 5, t0 + dt.timedelta(minutes=15), 4.0)]

    def drain(subdir, batches):
        d = str(tmp_path / subdir)
        for i, b in enumerate(batches):
            if i:
                _time.sleep(1.1)
            spark.createDataFrame(b, schema).coalesce(1).write.parquet(
                f"{d}/f{i}"
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/*")
            .withWatermark("ts", "1 hour")
        )
        return run_available_now(session_window_agg(stream)).collect()

    # Phase 1: late row arrives while the session is still open —
    # merged (n=3, end extended to 12:45)
    [r] = drain("open", [on_time, adv1, late])
    assert r["user_id"] == 7 and r["n_events"] == 3
    assert r["session_end_us"] == int(
        (t0 + dt.timedelta(minutes=45)).timestamp() * 1_000_000
    )

    # Phase 2: session finalized in the adv2 batch (watermark 14:00 >
    # 12:40) BEFORE the late row arrives — emitted with its on-time
    # shape, late row dropped entirely
    rows = drain("closed", [on_time, adv1, adv2, late])
    assert len(rows) == 1
    [r] = rows
    assert r["user_id"] == 7 and r["n_events"] == 2
    assert r["session_end_us"] == int(
        (t0 + dt.timedelta(minutes=40)).timestamp() * 1_000_000
    )

    # batch replay (the oracle's view) merges the late event
    batch = spark.createDataFrame(on_time + adv1 + adv2 + late, schema)
    [b7] = [
        r for r in session_window_agg(batch).collect() if r["user_id"] == 7
    ]
    assert b7["n_events"] == 3


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    """Exactly-once restart: a second availableNow drain from the SAME
    checkpoint skips everything the first drain committed — the
    recovery contract every streaming docstring here leans on."""
    import time as _time

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    seen: list[int] = []

    def drain():
        stream = spark.readStream.schema("id long").parquet(src + "/*")
        q = (
            stream.writeStream.foreachBatch(
                lambda b, _e: seen.extend(r["id"] for r in b.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    spark.createDataFrame([(1,), (2,)], "id long").coalesce(1).write.parquet(
        src + "/f0"
    )
    drain()
    assert sorted(seen) == [1, 2]
    _time.sleep(1.1)
    spark.createDataFrame([(3,)], "id long").coalesce(1).write.parquet(
        src + "/f1"
    )
    drain()  # same checkpoint: f0 must NOT be reprocessed
    assert sorted(seen) == [1, 2, 3]


def test_outer_interval_join_equals_batch_left_join(spark):
    """The LEFT OUTER stream-stream join, drained with flush sentinels
    in BOTH streams, must equal the batch left range join — including
    the NULL-padded unmatched left rows (the rows an inner join eats)."""
    import __spark_entry__ as em
    from tests.conftest import SF_SMOKE
    from flink_kmeans_clustering_spark.sources.parquet import load_events
    from pyspark.sql import functions as F

    got = {
        (r["l_id"], r["r_id"])
        for r in em.q_stream_outer_join(spark, SF_SMOKE).collect()
    }
    ev = load_events(spark, SF_SMOKE)
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.col("event_id").alias("l_id"),
        F.col("ts").alias("l_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("vk"),
        F.col("event_id").alias("r_id"),
        F.col("ts").alias("r_ts"),
    )
    cond = (
        (p["k"] == v["vk"])
        & (v["r_ts"] <= p["l_ts"])
        & (v["r_ts"] > p["l_ts"] - F.expr("INTERVAL 30 minutes"))
    )
    want = {
        (r["l_id"], r["r_id"])
        for r in p.join(v, cond, "leftOuter").collect()
    }
    assert got == want
    assert any(r_id is None for _, r_id in got)  # unmatched rows flushed


def test_mview_multi_batch_equals_batch_and_is_incremental(spark, tmp_path):
    """The maintained view must equal the batch aggregate regardless of
    micro-batch chopping, AND the state directory must show one version
    per epoch (proof the maintenance was actually incremental)."""
    import os

    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.sources.parquet import load_events
    from flink_kmeans_clustering_spark.streaming.mview import (
        maintain_user_totals,
    )
    from tests.conftest import SF_SMOKE

    ev = load_events(spark, SF_SMOKE).select("event_id", "user_id", "value")
    landing = str(tmp_path / "landing")
    ev.repartition(6).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(landing)
    )
    state = str(tmp_path / "state")
    view = maintain_user_totals(stream, state)
    got = {
        r["user_id"]: (r["n_events"], r["sum_v"])
        for r in view.collect()
    }
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(25,8)"))
            .cast("decimal(30,8)")
            .alias("s"),
        )
        .collect()
    }
    assert got == want
    versions = [d for d in os.listdir(state) if d.startswith("v")]
    assert len(versions) == 3  # 6 files / 2 per trigger


def test_mview_empty_source(spark, tmp_path):
    from flink_kmeans_clustering_spark.streaming.mview import (
        maintain_user_totals,
    )

    landing = str(tmp_path / "landing")
    spark.createDataFrame(
        [], "event_id long, user_id long, value double"
    ).write.parquet(landing)
    schema = spark.read.parquet(landing).schema
    stream = spark.readStream.schema(schema).parquet(landing)
    view = maintain_user_totals(stream, str(tmp_path / "state"))
    assert view.count() == 0
    assert set(view.columns) == {"user_id", "n_events", "sum_v"}


def test_mview_restart_resumes_from_on_disk_state(spark, tmp_path):
    """Kill-and-resume for the epoch-versioned materialized view: a
    second drain sharing the checkpoint AND state_root must fold only
    the new files into the on-disk state, landing on exactly the batch
    aggregate over everything — and a stale half-written version of an
    upcoming epoch must be rebuilt from the version below it, not
    compounded."""
    import time as _time
    from decimal import Decimal
    from flink_kmeans_clustering_spark.streaming.mview import (
        _latest_version,
        maintain_user_totals,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")

    def land(rows, name):
        spark.createDataFrame(
            rows, "user_id long, value double"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    def drain():
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src + "/*")
        )
        return maintain_user_totals(
            stream, state, timeout_sec=120, checkpoint=ckpt
        )

    land([(1, 10.0), (2, 5.0)], "f0")
    land([(1, 2.5)], "f1")
    v1 = {r["user_id"]: (r["n_events"], r["sum_v"]) for r in drain().collect()}
    assert v1 == {1: (2, Decimal("12.5")), 2: (1, Decimal("5.0"))}

    _time.sleep(1.1)
    land([(2, 1.0), (3, 7.0)], "f2")
    v2 = {r["user_id"]: (r["n_events"], r["sum_v"]) for r in drain().collect()}
    assert v2 == {
        1: (2, Decimal("12.5")),
        2: (2, Decimal("6.0")),
        3: (1, Decimal("7.0")),
    }

    # resume with NO new files: the view must simply be re-read, intact
    v3 = {r["user_id"]: (r["n_events"], r["sum_v"]) for r in drain().collect()}
    assert v3 == v2

    # redelivery rule: the version preceding an epoch wins, the epoch's
    # own (possibly half-written) version is ignored as merge input
    assert _latest_version(state, below=1) == f"{state}/v0"
    assert _latest_version(state, below=0) is None


def test_mview_fresh_checkpoint_ignores_stale_state_versions(spark, tmp_path):
    """A FRESH checkpoint restarts epochs at 0.  If state_root is dirty
    with a prior run's higher-numbered versions, the drain must return
    ITS OWN final version — not the stale global-max v{e} (which epoch
    0's below-filter correctly refused to fold, so returning it would be
    silently wrong data)."""
    from decimal import Decimal

    from flink_kmeans_clustering_spark.streaming.mview import (
        maintain_user_totals,
    )

    src = str(tmp_path / "src")
    state = str(tmp_path / "state")
    spark.createDataFrame(
        [(1, 10.0), (2, 5.0)], "user_id long, value double"
    ).coalesce(1).write.parquet(f"{src}/f0")

    # stale state from a "prior run": v9 with totals this run never saw
    spark.createDataFrame(
        [(99, 7, Decimal("777.0"))],
        "user_id long, n_events long, sum_v decimal(30,8)",
    ).write.parquet(f"{state}/v9")

    stream = spark.readStream.schema("user_id long, value double").parquet(
        src + "/*"
    )
    # fresh (default tmp) checkpoint: epochs restart at 0
    view = maintain_user_totals(stream, state, timeout_sec=120)
    got = {r["user_id"]: (r["n_events"], r["sum_v"]) for r in view.collect()}
    assert got == {1: (1, Decimal("10.0")), 2: (1, Decimal("5.0"))}


def test_stream_cdc_equals_batch_apply(spark):
    import __spark_entry__ as entrymod
    from flink_kmeans_clustering_spark.operators.events import cdc_apply
    from flink_kmeans_clustering_spark.sources.parquet import load_events

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["last_value"], r["last_ts"], r["n_ops"], r["n_deletes"])
        for r in entrymod.q_stream_cdc(spark, sf).collect()
    }
    want = {
        r["user_id"]: (r["last_value"], r["last_ts"], r["n_ops"], r["n_deletes"])
        for r in cdc_apply(load_events(spark, sf)).collect()
    }
    assert got == want and len(got) > 0


def test_stream_attribution_state_carries_across_batches(spark, tmp_path):
    """The carried (latest-click) state seeds the NEXT micro-batch: a
    purchase arriving in batch 2 attributes to a click from batch 1;
    a batch-2 purchase before any click ever, on another user, stays
    unattributed."""
    import time as _time

    from flink_kmeans_clustering_spark.streaming.run import run_available_now
    from flink_kmeans_clustering_spark.streaming.stateful import (
        attribution_state,
    )

    d = str(tmp_path / "ev")
    schema = "user_id long, ts_us long, event_id long, event_type string"
    us = 1_000_000
    b1 = spark.createDataFrame(
        [(1, 100 * us, 1, "click"), (1, 200 * us, 2, "view")], schema
    )
    b2 = spark.createDataFrame(
        [
            (1, 300 * us, 3, "purchase"),  # click 1 carried from batch 1
            (2, 300 * us, 4, "purchase"),  # user 2 never clicked
            (1, 400 * us, 5, "click"),
            (1, 500 * us, 6, "purchase"),  # in-batch click 5 wins
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(d + "/f0")
    _time.sleep(1.1)  # file-source batch order follows mtime
    b2.coalesce(1).write.parquet(d + "/f1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = {
        r["event_id"]: r
        for r in run_available_now(
            attribution_state(stream), output_mode="append"
        ).collect()
    }
    assert set(out) == {3, 4, 6}
    assert out[3]["touch_event_id"] == 1 and out[3]["touch_ts_us"] == 100 * us
    assert out[4]["touch_event_id"] is None
    assert out[6]["touch_event_id"] == 5


def test_stream_attribution_concats_chunks_before_resolving(spark, tmp_path):
    """Regression (ADVICE r06 high): applyInPandasWithState splits one
    key's micro-batch into multiple Arrow chunks past
    maxRecordsPerBatch — the old per-chunk forward-fill missed touches
    landing in a later chunk and could regress carried state to an
    older touch.  With maxRecordsPerBatch=1 and rows written
    conversion-FIRST, every attribution below requires the cross-chunk
    concat+sort."""
    import time as _time

    from flink_kmeans_clustering_spark.streaming.run import run_available_now
    from flink_kmeans_clustering_spark.streaming.stateful import (
        attribution_state,
    )

    d = str(tmp_path / "ev")
    schema = "user_id long, ts_us long, event_id long, event_type string"
    us = 1_000_000
    # physical row order is deliberately NOT event-time order: the
    # purchase at ts=500 lands in an earlier Arrow chunk than the
    # click at ts=400 that must win its attribution
    b1 = spark.createDataFrame(
        [
            (1, 500 * us, 6, "purchase"),
            (1, 100 * us, 1, "click"),
            (1, 400 * us, 5, "click"),
            (1, 300 * us, 3, "purchase"),
        ],
        schema,
    )
    b2 = spark.createDataFrame([(1, 600 * us, 7, "purchase")], schema)
    b1.coalesce(1).write.parquet(d + "/f0")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(d + "/f1")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/*")
        )
        out = {
            r["event_id"]: r
            for r in run_available_now(
                attribution_state(stream), output_mode="append"
            ).collect()
        }
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert set(out) == {3, 6, 7}
    assert out[3]["touch_event_id"] == 1  # click in a LATER chunk
    assert out[6]["touch_event_id"] == 5
    # carried state must be the max-(ts,id) touch, not the last chunk's
    assert out[7]["touch_event_id"] == 5 and out[7]["touch_ts_us"] == 400 * us


def test_stream_attribution_snowflake_ids_stay_exact(spark, tmp_path):
    """Touch ids/timestamps never round-trip through float64: a
    snowflake-style id above 2^53 (odd, so any float64 pass corrupts
    it) must come back bit-exact in touch_event_id."""
    from flink_kmeans_clustering_spark.streaming.run import run_available_now
    from flink_kmeans_clustering_spark.streaming.stateful import (
        attribution_state,
    )

    d = str(tmp_path / "ev")
    schema = "user_id long, ts_us long, event_id long, event_type string"
    big = (1 << 53) + 1
    spark.createDataFrame(
        [(1, 100, big, "click"), (1, 200, 2, "purchase")], schema
    ).coalesce(1).write.parquet(d + "/f0")
    stream = spark.readStream.schema(schema).parquet(d + "/*")
    out = run_available_now(
        attribution_state(stream), output_mode="append"
    ).collect()
    assert len(out) == 1 and out[0]["touch_event_id"] == big


def _write_batches(spark, root, batches, schema):
    """Write micro-batch files whose mtime order fixes delivery order."""
    import time as _time

    for i, rows in enumerate(batches):
        if i:
            _time.sleep(1.1)  # file-source batch order follows mtime
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            f"{root}/f{i}"
        )


def test_stream_attribution_ooo_resolves_cross_batch_late_touch(
    spark, tmp_path
):
    """Out-of-order delivery: a click whose EVENT time precedes an
    already-buffered conversion arrives one micro-batch later.  The
    watermark-buffered variant must attribute the conversion to that
    late-arriving click; the in-order variant on the same delivery
    provably attributes to the older click (the exact failure mode
    attribution_state documents)."""
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.streaming.run import run_available_now
    from flink_kmeans_clustering_spark.streaming.stateful import (
        attribution_state,
        attribution_state_ooo,
    )

    d = str(tmp_path / "ev")
    schema = "user_id long, ts timestamp, event_id long, event_type string"

    def t(sec):
        import datetime

        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)

    _write_batches(
        spark,
        d,
        [
            [(1, t(100), 1, "click"), (1, t(300), 3, "purchase")],
            # click id2 at ts=250 arrives AFTER the ts=300 purchase
            [(1, t(250), 2, "click"), (2, t(1000), 9, "view")],
            # watermark mover: wm = 2000 - 150 = 1850s > 300s
            [(2, t(2000), 10, "view")],
        ],
        schema,
    )

    def read():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(d + "/*")
        )

    ooo = {
        r["event_id"]: r
        for r in run_available_now(
            attribution_state_ooo(read(), delay="150 seconds"),
            output_mode="append",
        ).collect()
    }
    assert set(ooo) == {3}
    base_us = 1704067200 * 10**6  # 2024-01-01 epoch micros
    assert ooo[3]["touch_event_id"] == 2
    assert ooo[3]["touch_ts_us"] == base_us + 250 * 10**6

    in_order = {
        r["event_id"]: r
        for r in run_available_now(
            attribution_state(
                read().select(
                    "user_id",
                    F.unix_micros("ts").alias("ts_us"),
                    "event_id",
                    "event_type",
                )
            ),
            output_mode="append",
        ).collect()
    }
    # same delivery, wrong touch: the in-order variant resolved the
    # purchase in batch 1, before click 2 ever arrived
    assert in_order[3]["touch_event_id"] == 1


def test_stream_attribution_ooo_drops_rows_below_watermark(spark, tmp_path):
    """The DROP side of the watermark trade, fixture-pinned: a touch
    arriving BELOW the current watermark is filtered as late input and
    never participates in attribution — a conversion resolving later
    uses the older on-time click instead."""
    import datetime

    from flink_kmeans_clustering_spark.streaming.run import run_available_now
    from flink_kmeans_clustering_spark.streaming.stateful import (
        attribution_state_ooo,
    )

    d = str(tmp_path / "ev")
    schema = "user_id long, ts timestamp, event_id long, event_type string"

    def t(sec):
        return datetime.datetime(2024, 1, 1) + datetime.timedelta(seconds=sec)

    _write_batches(
        spark,
        d,
        [
            # wm after this batch: 900 - 150 = 750s
            [(1, t(100), 1, "click"), (1, t(900), 11, "purchase")],
            # click@500 arrives when wm=750 -> LATE, dropped
            [(1, t(500), 8, "click"), (2, t(2000), 10, "view")],
            # wm -> 1850s: the purchase resolves
            [(2, t(3000), 12, "view")],
        ],
        schema,
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = {
        r["event_id"]: r
        for r in run_available_now(
            attribution_state_ooo(stream, delay="150 seconds"),
            output_mode="append",
        ).collect()
    }
    assert set(out) == {11}
    # click 8 (event time 500 < conversion 900) was DROPPED as late —
    # the on-time click 1 wins despite being older
    assert out[11]["touch_event_id"] == 1


def test_stream_funnel_carries_stage_across_batches(spark, tmp_path):
    """The funnel state machine survives micro-batch boundaries: a
    view in batch 1 lets a click in batch 2 advance (in-window) while
    an out-of-window click on another user does not."""
    import time as _time

    from flink_kmeans_clustering_spark.streaming.run import run_available_now
    from flink_kmeans_clustering_spark.streaming.stateful import funnel_state

    d = str(tmp_path / "ev")
    schema = "user_id long, ts_us long, event_id long, event_type string"
    m = 60 * 1_000_000
    b1 = spark.createDataFrame(
        [(1, 0 * m, 1, "view"), (2, 0 * m, 2, "view")], schema
    )
    b2 = spark.createDataFrame(
        [
            (1, 10 * m, 3, "click"),      # in window -> stage 2
            (2, 2000 * m, 4, "click"),    # outside 24h -> stays stage 1
            (1, 20 * m, 5, "purchase"),   # stage 3
            (1, 25 * m, 6, "purchase"),   # already complete: no emission
        ],
        schema,
    )
    b1.coalesce(1).write.parquet(d + "/f0")
    _time.sleep(1.1)
    b2.coalesce(1).write.parquet(d + "/f1")
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    out = [
        (r["user_id"], r["stage"], r["event_type"], r["ts_us"])
        for r in run_available_now(
            funnel_state(stream, within_minutes=24 * 60), output_mode="append"
        ).collect()
    ]
    assert sorted(out) == [
        (1, 1, "view", 0),
        (1, 2, "click", 10 * m),
        (1, 3, "purchase", 20 * m),
        (2, 1, "view", 0),
    ]
