"""Hand-fixture tests for the round-7 operators (each also has a
DuckDB oracle via __spark_entry__; these pin the SEMANTICS on inputs
small enough to verify by hand)."""

import math

import pytest
from pyspark.sql import functions as F


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_windowed_funnel_enforces_conversion_window(spark):
    """User 1 converts inside the window at every stage; user 2's click
    is 3 days after the view (outside a 1-day window) so they stop at
    stage 1; user 3 clicks in-window but purchases out-of-window."""
    import datetime

    from flink_kmeans_clustering_spark.operators.events import windowed_funnel

    def t(day, hour=0):
        return datetime.datetime(2024, 1, day, hour)

    ev = _ts(
        spark,
        [
            (1, t(1), "view"), (1, t(1, 5), "click"), (1, t(2, 1), "purchase"),
            (2, t(1), "view"), (2, t(4), "click"),
            (3, t(1), "view"), (3, t(1, 2), "click"), (3, t(5), "purchase"),
        ],
        "user_id long, ts timestamp, event_type string",
    )
    got = {
        r["stage"]: (r["event_type"], r["users"])
        for r in windowed_funnel(ev, within_minutes=24 * 60).collect()
    }
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_windowed_funnel_tighter_than_unbounded(spark):
    """On the real events table the windowed funnel can never exceed
    the unbounded one, stage by stage."""
    import __spark_entry__ as entrymod
    from flink_kmeans_clustering_spark.operators.events import funnel_counts
    from flink_kmeans_clustering_spark.sources.parquet import load_events

    sf = "/root/testdata/sf0.001"
    wind = {
        r["stage"]: r["users"]
        for r in entrymod.q_events_funnel_windowed(spark, sf).collect()
    }
    unb = {
        r["stage"]: r["users"]
        for r in funnel_counts(load_events(spark, sf)).collect()
    }
    assert set(wind) == set(unb) and all(wind[s] <= unb[s] for s in unb)


def test_covered_time_merges_overlaps(spark):
    """Three events: two overlapping 30-min leases (0 min and 10 min)
    merge into one 40-min interval; a third at +2 h stands alone."""
    import datetime

    from flink_kmeans_clustering_spark.operators.events import covered_time

    base = datetime.datetime(2024, 1, 1)

    def t(minutes):
        return base + datetime.timedelta(minutes=minutes)

    ev = _ts(
        spark,
        [(1, t(0), 1), (1, t(10), 2), (1, t(120), 3), (2, t(0), 4)],
        "user_id long, ts timestamp, event_id long",
    )
    got = {
        r["user_id"]: (r["n_intervals"], r["covered_secs"])
        for r in covered_time(ev, hold_minutes=30).collect()
    }
    assert got == {1: (2, (40 + 30) * 60), 2: (1, 30 * 60)}


def test_covered_time_touching_intervals_merge(spark):
    """An event starting exactly at the previous lease's end merges
    (closed-interval union), pinning the > (not >=) boundary."""
    import datetime

    from flink_kmeans_clustering_spark.operators.events import covered_time

    base = datetime.datetime(2024, 1, 1)
    ev = _ts(
        spark,
        [(1, base, 1), (1, base + datetime.timedelta(minutes=30), 2)],
        "user_id long, ts timestamp, event_id long",
    )
    [row] = covered_time(ev, hold_minutes=30).collect()
    assert (row["n_intervals"], row["covered_secs"]) == (1, 60 * 60)


def test_mad_outliers_resist_masking(spark):
    """A burst of extreme values inflates mean/std enough to mask
    itself from the z-score but not from median/MAD: 20 values at 10,
    20 at 12, and 8 at 1000 — MAD flags all eight 1000s."""
    from flink_kmeans_clustering_spark.operators.events import (
        mad_outliers,
        value_anomalies,
    )

    burst = {200 + i for i in range(8)}
    rows = (
        [(i, "a", 10.0) for i in range(20)]
        + [(100 + i, "a", 12.0) for i in range(20)]
        + [(i, "a", 1000.0) for i in sorted(burst)]
    )
    ev = _ts(spark, rows, "event_id long, event_type string, value double")
    mad_ids = {r["event_id"] for r in mad_outliers(ev).collect()}
    assert mad_ids == burst
    z_ids = {r["event_id"] for r in value_anomalies(ev).collect()}
    assert not z_ids & burst  # z-score masked the burst (z ~ 2.2 < 3)


def test_ann_mrr_excludes_self_and_ranks_truth(spark):
    """Two identical vectors are each other's exact top-1; with one
    cell (n_probe covers everything) the approximate list is exact, so
    rr = 1.0 for both; a third orthogonal-ish vector's truth also lands
    rank 1 by construction."""
    from flink_kmeans_clustering_spark.operators.similarity import ann_mrr

    emb = _ts(
        spark,
        [
            (0, [1.0, 0.0], 0),
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding")
    got = {
        r["query_id"]: (r["truth_rank"], r["rr"])
        for r in ann_mrr(emb, queries, k=2, n_probe=1).collect()
    }
    assert got[0] == (1, 1.0) and got[1] == (1, 1.0)
    assert got[2][0] in (1, 2) and got[2][1] > 0


def test_quantization_error_known_vector(spark):
    """[1.0, 0.5]: scale = 127, q = [127, 64], x̂ = [1.0, 64/127];
    rel err = (0.5 − 64/127)² / 1.25 — hand-computable."""
    from flink_kmeans_clustering_spark.operators.similarity import (
        quantization_error,
    )

    emb = _ts(
        spark,
        [(0, [1.0, 0.5], 3)],
        "vec_id long, embedding array<float>, label int",
    )
    [row] = quantization_error(emb).collect()
    want = round((0.5 - 64 / 127) ** 2 / 1.25, 6)
    assert row["label"] == 3 and row["n_vecs"] == 1
    assert row["avg_rel_err"] == pytest.approx(want, abs=1e-6)
    assert row["max_rel_err"] == pytest.approx(want, abs=1e-6)


def test_quantization_error_skips_zero_vectors(spark):
    from flink_kmeans_clustering_spark.operators.similarity import (
        quantization_error,
    )

    emb = _ts(
        spark,
        [(0, [0.0, 0.0], 1), (1, [1.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    [row] = quantization_error(emb).collect()
    assert row["n_vecs"] == 1  # the zero vector has no scale; excluded


def test_token_jsd_bounds_and_identical_slice(spark):
    """A slice distributed exactly like the corpus has JSD 0; any slice
    stays within [0, ln 2]."""
    from flink_kmeans_clustering_spark.operators.textstats import token_jsd

    docs = _ts(
        spark,
        [
            (1, "a b", "s1"),
            (2, "a b", "s2"),
            (3, "c c c c", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r["jsd"] for r in token_jsd(docs).collect()}
    # s1 and s2 are identical slices of each other but NOT of the
    # corpus (which also has c's) — both positive, equal, bounded
    assert got["s1"] == got["s2"] and 0 < got["s1"] <= math.log(2) + 1e-9
    assert 0 < got["s3"] <= math.log(2) + 1e-9
    one = _ts(spark, [(1, "a b a", "s")], "doc_id long, text string, source string")
    assert token_jsd(one).collect()[0]["jsd"] == 0.0


def test_winnowing_shared_substring_guarantee(spark):
    """Two documents sharing a run of >= k+w-1 tokens must share at
    least one fingerprint (the winnowing guarantee, k=4 w=5 -> 8);
    documents with nothing in common share none."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    shared = "one two three four five six seven eight"  # 8 tokens
    docs = _ts(
        spark,
        [
            (1, "aaa bbb " + shared + " ccc ddd eee", None, None, 0),
            (2, shared + " zzz yyy xxx www vvv uuu", None, None, 0),
            (3, "p q r s t u v w x y z p q r s t", None, None, 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    fps = winnowing_fingerprints(docs, k=4, window=5).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[1] & by_doc[2], "shared 8-token run must share a fingerprint"
    assert not (by_doc[3] & by_doc[1]) and not (by_doc[3] & by_doc[2])


def test_winnowing_density(spark):
    """Selected fingerprints are sparse: ~2/(w+1) of the k-gram count,
    never more than the number of full windows."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        winnowing_fingerprints,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    k, w = 4, 5
    n_grams = (
        docs.select(
            F.greatest(
                F.size(F.split(F.lower("text"), r"[^a-z0-9]+")) - k + 1,
                F.lit(0),
            ).alias("g")
        )
        .agg(F.sum("g"))
        .collect()[0][0]
    )
    n_sel = winnowing_fingerprints(docs, k=k, window=w).count()
    assert n_sel < 0.6 * n_grams  # dense rolling fp would be ~1.0


def test_standardize_embeddings_zero_mean_unit_var(spark):
    """Standardizing then re-measuring must give per-dim mean 0 and
    population variance 1 (on the full output, not just the panel)."""
    from flink_kmeans_clustering_spark.operators.linalg import (
        standardize_embeddings,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    z = standardize_embeddings(emb, panel_max_id=10**9)  # full corpus
    stats = (
        z.groupBy("pos")
        .agg(F.avg("z").alias("m"), F.var_pop("z").alias("v"))
        .collect()
    )
    assert len(stats) == 64
    for r in stats:
        assert abs(r["m"]) < 1e-4 and abs(r["v"] - 1.0) < 1e-3


def test_hourly_seasonality_hand_counts(spark):
    import datetime

    from flink_kmeans_clustering_spark.operators.events import (
        hourly_seasonality,
    )

    ev = _ts(
        spark,
        [
            ("a", datetime.datetime(2024, 1, 1, 9, 5), 10.0),
            ("a", datetime.datetime(2024, 1, 2, 9, 55), 20.0),
            ("a", datetime.datetime(2024, 1, 1, 23, 0), 7.0),
        ],
        "event_type string, ts timestamp, value double",
    )
    got = {
        (r["event_type"], r["hour"]): (r["n_events"], r["avg_value"])
        for r in hourly_seasonality(ev).collect()
    }
    assert got == {("a", 9): (2, 15.0), ("a", 23): (1, 7.0)}


def test_length_histogram_integer_exact_buckets(spark):
    """Powers of two land in THEIR bucket (n=256 -> bucket 8), the
    boundary float log2 gets wrong; zero-length -> bucket -1."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        length_histogram,
    )

    docs = _ts(
        spark,
        [(i, "s", n) for i, n in enumerate([0, 1, 2, 3, 4, 255, 256, 257])],
        "doc_id long, source string, n_chars long",
    )
    got = {
        r["bucket"]: (r["lo"], r["n_docs"])
        for r in length_histogram(docs).collect()
    }
    assert got == {
        -1: (0, 1),   # n=0
        0: (1, 1),    # n=1
        1: (2, 2),    # n=2,3
        2: (4, 1),    # n=4
        7: (128, 1),  # n=255
        8: (256, 2),  # n=256,257 — 256 must NOT fall in bucket 7
    }


def test_pair_degree_histogram_hand_graph(spark):
    """Path 1-2-3 plus isolated pair (4,5): degrees 1,2,1,1,1 ->
    histogram {1: 4, 2: 1}."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        pair_degree_histogram,
    )

    pairs = _ts(
        spark,
        [(1, 2), (2, 3), (4, 5)],
        "id_a long, id_b long",
    )
    got = {
        r["degree"]: r["n_nodes"]
        for r in pair_degree_histogram(pairs).collect()
    }
    assert got == {1: 4, 2: 1}


def test_zipf_profile_hand_corpus(spark):
    """9 a's, 3 b's, 1 c: slope of ln f on ln r over ranks 1..3 is
    hand-computable; top1 = 'a' with share 9/13."""
    from flink_kmeans_clustering_spark.operators.textstats import zipf_profile

    docs = _ts(
        spark,
        [(1, "a a a a a a a a a b b b c")],
        "doc_id long, text string",
    )
    [row] = zipf_profile(docs, top_n=3).collect()
    assert (row["n_tokens"], row["vocab_size"]) == (13, 3)
    assert row["top1_token"] == "a"
    assert row["top1_share"] == round(9 / 13, 6)
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (9, 3, 1)]
    n = 3
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
    assert row["zipf_slope"] == want


def test_zipf_top1_tie_breaks_to_lexicographic(spark):
    from flink_kmeans_clustering_spark.operators.textstats import zipf_profile

    docs = _ts(spark, [(1, "zz aa zz aa")], "doc_id long, text string")
    [row] = zipf_profile(docs, top_n=2).collect()
    assert row["top1_token"] == "aa"


def test_phash_identical_bytes_hamming_zero(spark):
    """Identical blobs -> hamming 0; a blob with a few flipped sampled
    bytes -> small positive hamming; unrelated content excluded."""
    from flink_kmeans_clustering_spark.operators.multimodal import (
        phash_pairs,
    )

    base = ("hello world this is a doc " * 4).encode()
    tweaked = bytearray(base)
    tweaked[0] = 1  # letter (above mean) -> byte 1 (far below): bit flips
    other = ("completely different words entirely " * 4).encode()
    assets = spark.createDataFrame(
        [
            (1, bytearray(base)),
            (2, bytearray(base)),
            (3, bytearray(tweaked)),
            (4, bytearray(other)),
        ],
        "asset_id long, content binary",
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in phash_pairs(assets, max_block=None).collect()
    }
    assert got[(1, 2)] == 0
    assert 1 <= got.get((1, 3), 99) <= 3 and got[(1, 3)] == got[(2, 3)]
    assert not any(4 in k for k in got)


def test_phash_hot_block_cap_drops_boilerplate(spark):
    """Forty identical blobs exceed a max_block of 10: every chunk
    block is hot, so the guard drops ALL pairs (the documented df-cap
    trade); with the cap off the pairs come back."""
    from flink_kmeans_clustering_spark.operators.multimodal import (
        phash_pairs,
    )

    blob = bytearray(("spam " * 20).encode())
    assets = spark.createDataFrame(
        [(i, blob) for i in range(40)], "asset_id long, content binary"
    )
    assert phash_pairs(assets, max_block=10).count() == 0
    assert phash_pairs(assets, max_block=None).count() == 40 * 39 // 2


def test_isotropy_profile_detects_anisotropy(spark):
    """A clustered (anisotropic) corpus must show mean |cos| far above
    the 1/sqrt(d) floor; an orthogonal corpus shows ~0."""
    import numpy as np

    from flink_kmeans_clustering_spark.operators.linalg import (
        isotropy_profile,
    )

    rng = np.random.default_rng(7)
    base = rng.standard_normal(16)
    cone = [
        (i, [float(x) for x in base + 0.05 * rng.standard_normal(16)], 0)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        cone, "vec_id long, embedding array<float>, label int"
    )
    [row] = isotropy_profile(df, panel_buckets=1).collect()
    assert row["iso_floor"] == round(1 / 4, 6)  # d=16
    assert row["mean_abs_cos"] > 0.9  # cone: everything nearly parallel
    ortho = [(i, [1.0 if j == i else 0.0 for j in range(16)], 0) for i in range(16)]
    df2 = spark.createDataFrame(
        ortho, "vec_id long, embedding array<float>, label int"
    )
    [row2] = isotropy_profile(df2, panel_buckets=1).collect()
    assert row2["mean_abs_cos"] == 0.0 and row2["n_pairs"] == 16 * 15 // 2
