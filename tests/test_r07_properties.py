"""Property-based invariants (hypothesis) for the round-7 operators —
each checked against a brute-force Python model over arbitrary small
inputs, not hand-picked fixtures."""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = datetime.datetime(2024, 1, 1)


# (user, minute-offset) event sets; offsets bounded so interval math
# stays easy to brute-force
events_strategy = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 500)),
    min_size=1,
    max_size=25,
)


@SLOW
@given(events_strategy)
def test_covered_time_matches_brute_force_union(spark, evs):
    from flink_kmeans_clustering_spark.operators.events import covered_time

    hold_min = 30
    rows = [
        (u, BASE + datetime.timedelta(minutes=m), i)
        for i, (u, m) in enumerate(evs)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    got = {
        r["user_id"]: (r["n_intervals"], r["covered_secs"])
        for r in covered_time(df, hold_minutes=hold_min).collect()
    }

    # brute force: merge closed intervals [s, s+hold]
    want = {}
    for u in {u for u, _ in evs}:
        starts = sorted(m * 60 for uu, m in evs if uu == u)
        ivals = []
        for s in starts:
            e = s + hold_min * 60
            if ivals and s <= ivals[-1][1]:
                ivals[-1][1] = max(ivals[-1][1], e)
            else:
                ivals.append([s, e])
        want[u] = (len(ivals), sum(e - s for s, e in ivals))
    assert got == want


funnel_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),
        st.integers(0, 100),
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=20,
)


@SLOW
@given(funnel_strategy)
def test_windowed_funnel_matches_brute_force(spark, evs):
    from flink_kmeans_clustering_spark.operators.events import windowed_funnel

    win_min = 30
    rows = [
        (u, BASE + datetime.timedelta(minutes=m), t) for u, m, t in evs
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["stage"]: r["users"]
        for r in windowed_funnel(
            df, stages=("view", "click", "purchase"), within_minutes=win_min
        ).collect()
    }

    def brute(u):
        mine = sorted((m, t) for uu, m, t in evs if uu == u)
        stage_t = None
        reached = 0
        for want_t in ("view", "click", "purchase"):
            cand = [
                m
                for m, t in mine
                if t == want_t
                and (
                    stage_t is None
                    if reached == 0
                    else (m > stage_t and m <= stage_t + win_min)
                )
            ]
            if reached == 0:
                cand = [m for m, t in mine if t == want_t]
            if not cand:
                break
            stage_t = min(cand)
            reached += 1
        return reached

    users = {u for u, _, _ in evs}
    for stage in (1, 2, 3):
        assert got[stage] == sum(1 for u in users if brute(u) >= stage), stage


token_strategy = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
    min_size=8,
    max_size=30,
)


@SLOW
@given(token_strategy, token_strategy, st.integers(0, 3))
def test_winnowing_guarantee_on_random_shared_runs(spark, a_pad, b_pad, cut):
    """Inject the SAME ≥ k+w−1-token run into two otherwise random
    documents: they must share a fingerprint (the winnowing paper's
    guarantee), for any surrounding context."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    k, w = 4, 5
    shared = ["s%d" % i for i in range(k + w - 1 + cut)]  # unique tokens
    doc_a = " ".join(a_pad + shared)
    doc_b = " ".join(shared + b_pad)
    docs = spark.createDataFrame(
        [(1, doc_a), (2, doc_b)], "doc_id long, text string"
    )
    fps = winnowing_fingerprints(docs, k=k, window=w).collect()
    by_doc: dict[int, set] = {1: set(), 2: set()}
    for r in fps:
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2]


values_strategy = st.lists(
    st.floats(min_value=-1000, max_value=1000, allow_nan=False, width=32),
    min_size=5,
    max_size=30,
)


@SLOW
@given(values_strategy)
def test_mad_outliers_match_brute_force(spark, vals):
    import statistics

    from flink_kmeans_clustering_spark.operators.events import mad_outliers

    rows = [(i, "t", float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    got = {r["event_id"] for r in mad_outliers(df).collect()}

    med = statistics.median(vals)
    mad = statistics.median(abs(v - med) for v in vals)
    if mad == 0:
        # degenerate group: zero scale estimate — the operator flags
        # nothing (pinned), it must NOT divide by zero
        assert got == set()
        return
    want = {
        i
        for i, v in enumerate(vals)
        if abs(round(0.6745 * (v - med) / mad, 6)) >= 3.5
    }
    assert got == want


attr_events = st.lists(
    st.tuples(
        st.integers(0, 2),                      # user
        st.integers(0, 200),                    # ts minute
        st.sampled_from(["click", "purchase"]),
        st.integers(0, 3),                      # micro-batch assignment
    ),
    min_size=1,
    max_size=15,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(attr_events)
def test_attribution_ooo_exact_under_arbitrary_delivery(
    spark, tmp_path_factory, evs
):
    """THE watermark-buffer guarantee, property-tested: for ANY
    assignment of events to micro-batches (arbitrary cross-batch
    reordering) with a delay exceeding the event-time span (no late
    drops), the drained output equals the batch last-touch model
    exactly — every conversion, every touch id."""
    import os

    from flink_kmeans_clustering_spark.streaming.run import run_available_now
    from flink_kmeans_clustering_spark.streaming.stateful import (
        attribution_state_ooo,
    )

    d = str(tmp_path_factory.mktemp("ooo_prop"))
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    rows = [
        (u, BASE + datetime.timedelta(minutes=m), i, t)
        for i, (u, m, t, _) in enumerate(evs)
    ]
    batches = [[r for r, (_, _, _, b) in zip(rows, evs) if b == bi]
               for bi in range(4)]
    # far-future watermark mover so every buffered conversion drains
    batches.append([(99, BASE + datetime.timedelta(minutes=10_000), 9999, "view")])
    now = 1_700_000_000
    nfiles = 0
    for bi, batch in enumerate(batches):
        if not batch:
            continue
        path = f"{d}/f{bi}"
        spark.createDataFrame(batch, schema).coalesce(1).write.parquet(path)
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (now + bi, now + bi))
        os.utime(path, (now + bi, now + bi))
        nfiles += 1
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/*")
    )
    got = {
        r["event_id"]: (r["touch_event_id"], r["touch_ts_us"])
        for r in run_available_now(
            attribution_state_ooo(stream, delay="300 minutes"),
            output_mode="append",
        ).collect()
        if r["user_id"] >= 0 and r["user_id"] != 99
    }

    # batch model: latest strictly-prior click by (ts, event_id)
    want = {}
    for i, (u, m, t, _) in enumerate(evs):
        if t != "purchase":
            continue
        prior = [
            (mm, j)
            for j, (uu, mm, tt, _) in enumerate(evs)
            if uu == u and tt == "click" and (mm, j) < (m, i)
        ]
        ts_us = int(
            (BASE + datetime.timedelta(minutes=m)).timestamp() * 1_000_000
        )
        if prior:
            bm, bj = max(prior)
            bt_us = int(
                (BASE + datetime.timedelta(minutes=bm)).timestamp() * 1_000_000
            )
            want[i] = (bj, bt_us)
        else:
            want[i] = (None, None)
    assert got == want
