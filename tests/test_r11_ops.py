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


# --- quality_classifier_train --------------------------------------------------


def test_quality_train_learns_separating_weights(spark):
    """On a corpus where English docs are stopword-rich and the rest
    stopword-free, gradient descent must push the stop_ratio weight
    positive and reach high training accuracy — the distillation
    actually learns, not just replays the prior."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier_train,
    )

    en = "the and of to in is that with " * 6
    xx = "zork blap qux vemb trill " * 8
    rows = [(i, en, "en", "web") for i in range(12)] + [
        (100 + i, xx, "xx", "web") for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["feature"]: r for r in quality_classifier_train(docs).collect()}
    assert set(out) == {
        "bias",
        "stop_ratio",
        "len_norm",
        "punct_ratio",
        "digit_ratio",
        "upper_ratio",
        "mwl_norm",
    }
    assert out["stop_ratio"]["weight"] > 0.0
    assert out["bias"]["n_docs"] == 24
    assert out["bias"]["train_acc"] >= 0.9
    # scalar metrics are identical on every feature row
    accs = {r["train_acc"] for r in out.values()}
    assert len(accs) == 1


def test_quality_train_balanced_uninformative_stays_at_prior(spark):
    """Identical texts with a 50/50 label split: no feature separates
    the classes, so weights stay (numerically) near zero and accuracy
    is the 0.5 coin-flip — the learner must not hallucinate signal."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier_train,
    )

    text = "alpha beta gamma delta epsilon"
    rows = [(i, text, "en" if i % 2 == 0 else "xx", "web") for i in range(16)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = {r["feature"]: r for r in quality_classifier_train(docs).collect()}
    # p = 0.5 for every doc each round -> gradient components cancel
    assert abs(out["bias"]["weight"]) < 1e-9
    assert out["bias"]["train_acc"] == 0.5


def test_quality_train_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier_train,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    out = quality_classifier_train(empty)
    assert out.count() == 0
    assert out.columns == ["feature", "weight", "n_docs", "train_acc"]


# --- crossmodal_dedup_pairs ----------------------------------------------------


def _docs_with_nchars(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    return df.withColumn("n_chars", F.length("text").cast("long"))


def test_crossmodal_classifies_all_three_kinds(spark):
    """An exact re-post pairs as 'both'; a small in-place word swap
    keeps the byte grid (aHash) but changes the token set →
    'recaptioned'; the same token set rendered as a very different
    byte stream keeps the caption fingerprint but breaks the image
    hash → 'reencoded'.  An unrelated doc pairs with nothing."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_dedup_pairs,
    )

    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "today " * 4
    )
    recap = base.replace("dog", "cat")
    reenc = " ".join(sorted(set(base.split())) * 9)
    docs = _docs_with_nchars(
        spark,
        [
            (1, base, "en", "web"),
            (2, base, "en", "web"),
            (3, recap, "en", "web"),
            (4, reenc, "en", "web"),
            (5, "zebra unrelated words entirely different content here",
             "en", "web"),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): (r["kind"], r["hamming"])
        for r in crossmodal_dedup_pairs(docs).collect()
    }
    assert got[(1, 2)] == ("both", 0)
    assert got[(1, 3)][0] == "recaptioned"
    assert got[(2, 3)][0] == "recaptioned"
    assert got[(1, 4)] == ("reencoded", None)
    assert got[(2, 4)] == ("reencoded", None)
    assert not any(5 in k for k in got)
    assert (3, 4) not in got  # different token sets, different grids


def test_crossmodal_hot_caption_group_capped(spark):
    """A caption shared by more docs than max_caption_group is template
    boilerplate: it must produce NO caption pairs (the blocking-cap
    contract every dedup family op carries)."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_dedup_pairs,
    )

    rows = [(i, "boiler plate navigation footer", "en", "web")
            for i in range(6)]
    docs = _docs_with_nchars(spark, rows)
    out = crossmodal_dedup_pairs(docs, max_caption_group=5).collect()
    assert all(r["kind"] != "reencoded" for r in out)


def test_crossmodal_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_dedup_pairs,
    )

    empty = _docs_with_nchars(spark, [])
    out = crossmodal_dedup_pairs(empty)
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "kind", "hamming"]
