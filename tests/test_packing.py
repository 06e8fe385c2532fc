"""Sequence-packing layout: distributed prefix sum + window spans."""

from __future__ import annotations

from flink_kmeans_clustering_spark.operators.packing import pack_offsets


def test_pack_offsets_hand_checked(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c"),        # 3 tokens, offset 0
            (2, "d e"),          # 2 tokens, offset 3
            (3, ""),             # 0 tokens, offset 5 (zero width)
            (4, "f g h i j"),    # 5 tokens, offset 5 -> crosses the 8-boundary
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pack_offsets(docs, max_tokens=8).collect()}
    assert (rows[1]["start_offset"], rows[1]["first_seq"], rows[1]["last_seq"]) == (0, 0, 0)
    assert rows[2]["start_offset"] == 3
    assert (rows[3]["n_tokens"], rows[3]["start_offset"], rows[3]["n_seqs"]) == (0, 5, 1)
    # doc 4: tokens at offsets 5..9 -> windows 0 and 1
    assert (rows[4]["first_seq"], rows[4]["last_seq"], rows[4]["n_seqs"]) == (0, 1, 2)


def test_pack_offsets_invariant_to_bucketing(spark):
    """The two-level prefix sum must give the same layout for ANY
    bucket_size — bucketing is an execution detail, not a semantic."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(
        (r["doc_id"], r["start_offset"], r["first_seq"], r["last_seq"])
        for r in pack_offsets(docs, max_tokens=256, bucket_size=7).collect()
    )
    b = sorted(
        (r["doc_id"], r["start_offset"], r["first_seq"], r["last_seq"])
        for r in pack_offsets(docs, max_tokens=256, bucket_size=10**9).collect()
    )
    assert a == b


def test_pack_offsets_contiguous(spark):
    """Offsets tile the token stream exactly: each doc starts where the
    previous one ended."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        pack_offsets(docs, max_tokens=128, bucket_size=13).collect(),
        key=lambda r: r["doc_id"],
    )
    expect = 0
    for r in rows:
        assert r["start_offset"] == expect
        expect += r["n_tokens"]


def test_pack_sequences_window_sizes_and_bucket_invariance(spark):
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.operators.packing import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    seqs = pack_sequences(docs, max_tokens=64, bucket_size=10).collect()
    assert len(seqs) > 1
    last = max(r["seq_id"] for r in seqs)
    for r in seqs:
        if r["seq_id"] != last:
            assert r["n_tokens"] == 64
        else:
            assert 1 <= r["n_tokens"] <= 64
    # window contents cannot depend on the prefix-sum bucketing
    again = pack_sequences(docs, max_tokens=64, bucket_size=1000).collect()
    assert {(r["seq_id"], r["digest"]) for r in seqs} == {
        (r["seq_id"], r["digest"]) for r in again
    }


def test_pack_sequences_straddling_doc_reassembles_in_order(spark):
    from flink_kmeans_clustering_spark.operators.packing import pack_sequences

    # 3 docs of 3 tokens each, windows of 4: w0 = [a0 a1 a2 b0],
    # w1 = [b1 b2 c0 c1], w2 = [c2]
    docs = spark.createDataFrame(
        [(0, "a0 a1 a2"), (1, "b0 b1 b2"), (2, "c0 c1 c2")],
        "doc_id long, text string",
    )
    import hashlib

    got = {
        r["seq_id"]: (r["n_tokens"], r["digest"])
        for r in pack_sequences(docs, max_tokens=4).collect()
    }
    want_windows = {0: "a0 a1 a2 b0", 1: "b1 b2 c0 c1", 2: "c2"}
    want = {
        s: (len(w.split()), hashlib.md5(w.encode()).hexdigest())
        for s, w in want_windows.items()
    }
    assert got == want
