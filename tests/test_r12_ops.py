"""Unit tests for round-12 operators: BPE tokenizer application
(encode), trained-classifier calibration / reliability curve, and
incremental cross-modal delta dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

# --- bpe_encode ---------------------------------------------------------------


def test_bpe_encode_known_vocabulary(spark):
    """Hand-computed encode on a 2-doc corpus (rounds=2): training
    learns (t,h) then — via the freq-3 tie between 'a t' and 'th e',
    broken pair-ASC — (a,t); the encoded subword table follows, with
    the 1-char word 'a' passing through untouched."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_encode,
    )

    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "the thin cat a")],
        "doc_id long, text string",
    )
    got = [
        (r["token"], r["freq"], r["token_len"], r["is_merge"])
        for r in bpe_encode(docs, rounds=2, top_n=50).collect()
    ]
    # the->[th,e], cat->[c,at], hat->[h,at], thin->[th,i,n], a->[a]
    assert got == [
        ("th", 4, 2, True),
        ("at", 3, 2, True),
        ("e", 3, 1, False),
        ("c", 2, 1, False),
        ("a", 1, 1, False),
        ("h", 1, 1, False),
        ("i", 1, 1, False),
        ("n", 1, 1, False),
    ]


def test_bpe_encode_early_stop_full_merge(spark):
    """When training stops early (every word one symbol), encode must
    still apply the merges that WERE learned: 'aaaa' becomes the
    single token aaaa, not a broken partial segmentation."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_encode,
    )

    docs = spark.createDataFrame(
        [(1, "aaaa"), (2, "aaaa")], "doc_id long, text string"
    )
    got = [
        (r["token"], r["freq"], r["token_len"], r["is_merge"])
        for r in bpe_encode(docs, rounds=4, top_n=10).collect()
    ]
    assert got == [("aaaa", 2, 4, True)]


def test_bpe_encode_top_n_is_total_order(spark):
    """top_n truncation follows the (freq DESC, token ASC) total
    order — the same corpus with top_n=3 is exactly the head of the
    full table."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_encode,
    )

    docs = spark.createDataFrame(
        [(1, "the cat the hat"), (2, "the thin cat a")],
        "doc_id long, text string",
    )
    full = [r["token"] for r in bpe_encode(docs, rounds=2, top_n=50).collect()]
    head = [r["token"] for r in bpe_encode(docs, rounds=2, top_n=3).collect()]
    assert head == full[:3]


def test_bpe_encode_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_encode,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = bpe_encode(empty, rounds=3)
    assert out.count() == 0
    assert out.columns == ["token", "freq", "token_len", "is_merge"]


# --- quality_classifier_calibration --------------------------------------------


def test_calibration_uninformative_is_perfectly_calibrated(spark):
    """Identical texts, 50/50 labels: weights stay at the zero prior,
    every doc scores exactly 0.5 → ONE bin-5 row whose mean prediction
    equals its label rate — abs_gap and ece_term exactly 0.0."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier_calibration,
    )

    text = "alpha beta gamma delta epsilon"
    rows = [(i, text, "en" if i % 2 == 0 else "xx", "web") for i in range(16)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = quality_classifier_calibration(docs).collect()
    assert len(got) == 1
    r = got[0]
    assert (
        r["bin"],
        r["bin_lo"],
        r["n_docs"],
        r["avg_pred"],
        r["frac_pos"],
        r["abs_gap"],
        r["ece_term"],
    ) == (5, 0.5, 16, 0.5, 0.5, 0.0, 0.0)


def test_calibration_separating_corpus_two_pure_bins(spark):
    """The r11 separating corpus (stopword-rich en vs stopword-free
    xx) trains to ≥0.9 accuracy, so the two score values straddle
    0.5: exactly two bins, each label-pure, one each side of bin 5."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier_calibration,
    )

    en = "the and of to in is that with " * 6
    xx = "zork blap qux vemb trill " * 8
    rows = [(i, en, "en", "web") for i in range(12)] + [
        (100 + i, xx, "xx", "web") for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = sorted(
        quality_classifier_calibration(docs).collect(), key=lambda r: r["bin"]
    )
    assert len(got) == 2
    lo, hi = got
    assert lo["bin"] <= 4 and lo["frac_pos"] == 0.0 and lo["n_docs"] == 12
    assert hi["bin"] >= 5 and hi["frac_pos"] == 1.0 and hi["n_docs"] == 12
    for r in got:
        assert 0.0 <= r["avg_pred"] <= 1.0
        assert abs(r["abs_gap"] - abs(r["avg_pred"] - r["frac_pos"])) < 2e-6
        # bin membership: the mean of scores in a bin lies in the bin
        assert r["bin_lo"] - 1e-9 <= r["avg_pred"] <= r["bin_lo"] + 0.1 + 1e-9
        assert r["ece_term"] <= r["abs_gap"] + 1e-9


def test_calibration_null_labels_count_as_negatives(spark):
    """ADVICE r11: NULL lang must train and evaluate as y=0 (the
    oracle's ELSE 0), not silently drop out — a balanced en/NULL
    corpus over identical text stays at the 0.5 prior with ALL docs
    counted."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier_calibration,
    )

    text = "alpha beta gamma delta epsilon"
    rows = [
        (i, text, "en" if i % 2 == 0 else None, "web") for i in range(16)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = quality_classifier_calibration(docs).collect()
    assert len(got) == 1
    assert got[0]["n_docs"] == 16
    assert got[0]["frac_pos"] == 0.5
    assert got[0]["abs_gap"] == 0.0


def test_calibration_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier_calibration,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    out = quality_classifier_calibration(empty)
    assert out.count() == 0
    assert out.columns == [
        "bin",
        "bin_lo",
        "n_docs",
        "avg_pred",
        "frac_pos",
        "abs_gap",
        "ece_term",
    ]


# --- crossmodal_delta_pairs -----------------------------------------------------


def _docs_with_nchars(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    return df.withColumn("n_chars", F.length("text").cast("long"))


def _delta_fixture(spark):
    """The r11 three-kinds corpus, spread across the snapshot lane
    (doc_id % 10 == 7 is today's drop): 1,2 old re-posts, 3 old
    recaption, 7,17 new re-posts, 27 new re-encode, 5 old unrelated."""
    base = (
        "the quick brown fox jumps over the lazy dog and runs far away "
        "today " * 4
    )
    recap = base.replace("dog", "cat")
    reenc = " ".join(sorted(set(base.split())) * 9)
    return _docs_with_nchars(
        spark,
        [
            (1, base, "en", "web"),
            (2, base, "en", "web"),
            (3, recap, "en", "web"),
            (5, "zebra unrelated words entirely different content here",
             "en", "web"),
            (7, base, "en", "web"),
            (17, base, "en", "web"),
            (27, reenc, "en", "web"),
        ],
    )


def test_crossmodal_delta_only_new_touching_pairs(spark):
    """Old×old pairs (1,2)/(1,3)/(2,3) are the stored index's own
    business and must NOT appear; every emitted pair touches the new
    lane, with kind classified exactly as the full pass would and
    against_index marking index hits vs within-batch dups."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_delta_pairs,
    )

    got = {
        (r["id_a"], r["id_b"]): (r["kind"], r["against_index"])
        for r in crossmodal_delta_pairs(_delta_fixture(spark)).collect()
    }
    assert got[(1, 7)] == ("both", True)
    assert got[(2, 7)] == ("both", True)
    assert got[(1, 17)] == ("both", True)
    assert got[(2, 17)] == ("both", True)
    assert got[(7, 17)] == ("both", False)
    assert got[(3, 7)][0] == "recaptioned"
    assert got[(3, 17)][0] == "recaptioned"
    assert got[(1, 27)] == ("reencoded", True)
    assert got[(2, 27)] == ("reencoded", True)
    assert got[(7, 27)] == ("reencoded", False)
    assert got[(17, 27)] == ("reencoded", False)
    # nothing old×old, nothing touching the unrelated doc
    assert (1, 2) not in got and (1, 3) not in got and (2, 3) not in got
    assert not any(5 in k for k in got)
    assert all(a < b for a, b in got)


def test_crossmodal_delta_equals_filtered_full_pass(spark):
    """The delta pass is DEFINED as the full pass restricted to pairs
    touching the new lane (caps identical because block/group stats
    come from the full corpus in both): check set equality of
    (id_a, id_b, kind, hamming) on the fixture."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_dedup_pairs,
        crossmodal_delta_pairs,
    )

    docs = _delta_fixture(spark)
    full = {
        (r["id_a"], r["id_b"], r["kind"], r["hamming"])
        for r in crossmodal_dedup_pairs(docs).collect()
        if r["id_a"] % 10 == 7 or r["id_b"] % 10 == 7
    }
    delta = {
        (r["id_a"], r["id_b"], r["kind"], r["hamming"])
        for r in crossmodal_delta_pairs(docs).collect()
    }
    assert delta == full


def test_crossmodal_delta_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_delta_pairs,
    )

    empty = _docs_with_nchars(spark, [])
    out = crossmodal_delta_pairs(empty)
    assert out.count() == 0
    assert out.columns == [
        "id_a",
        "id_b",
        "kind",
        "hamming",
        "against_index",
    ]
