"""Unit tests for round-11 operators: BPE merge-table learning,
trained quality classifier, cross-modal joint dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

# --- bpe_learn_merges --------------------------------------------------------


def test_bpe_learn_merges_known_sequence(spark):
    """Hand-computed merge trajectory on a 3-word corpus, including a
    tie round: round 2 has 'an a' and 'b an' both at freq 4 — the
    pair-ASC tie-break must pick 'an a'."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [
            (1, "banana banana banana"),
            (2, "bandana"),
            (3, "an an an an"),
        ],
        "doc_id long, text string",
    )
    got = [
        (r["merge_round"], r["lhs"], r["rhs"], r["merged"], r["freq"])
        for r in bpe_learn_merges(docs, rounds=4)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == [
        (1, "a", "n", "an", 12),
        (2, "an", "a", "ana", 4),
        (3, "b", "an", "ban", 4),
        (4, "ban", "ana", "banana", 3),
    ]


def test_bpe_learn_merges_greedy_and_early_stop(spark):
    """'aaaa' under merge (a,a) must segment leftmost-first to
    [aa, aa] (never [a, aa, a]), and once a word is one symbol the
    trainer stops early instead of emitting empty rounds."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_learn_merges,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa")], "doc_id long, text string"
    )
    got = [
        (r["merge_round"], r["lhs"], r["rhs"], r["merged"], r["freq"])
        for r in bpe_learn_merges(docs, rounds=4)
        .orderBy("merge_round")
        .collect()
    ]
    # round 1: 3 'a a' pairs per word x 2 words; round 2: [aa, aa];
    # round 3: every word is a single symbol -> no pairs -> stop
    assert got == [
        (1, "a", "a", "aa", 6),
        (2, "aa", "aa", "aaaa", 2),
    ]


def test_bpe_learn_merges_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_learn_merges,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = bpe_learn_merges(empty, rounds=3)
    assert out.count() == 0
    assert out.columns == ["merge_round", "lhs", "rhs", "merged", "freq"]
