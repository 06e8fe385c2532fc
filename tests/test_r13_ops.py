"""Unit tests for round-13 operators: tokenizer fertility/compression
eval, the known-signal calibration probe slice, the calibrated corpus
gate, and the cross-modal ingest keep-set report."""

from __future__ import annotations

from pyspark.sql import functions as F

# --- bpe_fertility ------------------------------------------------------------


def test_bpe_fertility_hand_computed(spark):
    """The r12 encode corpus with the docs split across two sources
    (rounds=2 learns (t,h) then (a,t); the->[th,e], cat->[c,at],
    hat->[h,at], thin->[th,i,n], a->[a]): per-source integer sums and
    the two ratios are hand-checkable."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_fertility,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat the hat", "srcA"),
            (2, "the thin cat a", "srcB"),
        ],
        "doc_id long, text string, source string",
    )
    got = [
        (
            r["source"],
            r["n_words"],
            r["n_tokens"],
            r["n_chars"],
            r["tokens_per_word"],
            r["chars_per_token"],
        )
        for r in bpe_fertility(docs, rounds=2).collect()
    ]
    # srcA: the(2 toks)x2, cat(2), hat(2) -> 4 words, 8 tokens, 12 chars
    # srcB: the(2), thin(3), cat(2), a(1) -> 4 words, 8 tokens, 11 chars
    assert got == [
        ("srcA", 4, 8, 12, 2.0, 1.5),
        ("srcB", 4, 8, 11, 2.0, 1.375),
    ]


def test_bpe_fertility_totals_match_encode_vocabulary(spark):
    """Σ_source n_tokens must equal the total frequency mass of the
    encoded subword vocabulary (same merges, same segmentation — two
    independent paths to the same integer)."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_encode,
        bpe_fertility,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat the hat", "srcA"),
            (2, "the thin cat a", "srcB"),
            (3, "a thin hat", "srcC"),
        ],
        "doc_id long, text string, source string",
    )
    fert = bpe_fertility(docs, rounds=2)
    total_tokens = fert.agg(F.sum("n_tokens")).collect()[0][0]
    enc_total = (
        bpe_encode(docs, rounds=2, top_n=10**6)
        .agg(F.sum("freq"))
        .collect()[0][0]
    )
    assert total_tokens == enc_total


def test_bpe_fertility_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_fertility,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert bpe_fertility(empty, rounds=2).collect() == []


# --- quality_probe_frame ------------------------------------------------------


def test_probe_frame_lane_construction(spark):
    """Positive-label docs repeat QUALITY_PROBE_REPEAT times in the
    probe lane, negative-label docs truncate to QUALITY_PROBE_TRUNC
    chars, ids offset by QUALITY_PROBE_ID_OFFSET, NULL text
    coalesces to '' in BOTH lanes."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        QUALITY_PROBE_ID_OFFSET,
        QUALITY_PROBE_REPEAT,
        QUALITY_PROBE_TRUNC,
        quality_probe_frame,
    )

    long_text = "x" * 100
    docs = spark.createDataFrame(
        [
            (1, long_text, "en", "web"),
            (2, long_text, "xx", "web"),
            (3, None, "en", "cc"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    rows = {r["doc_id"]: r for r in quality_probe_frame(docs).collect()}
    assert len(rows) == 6
    # raw lane untouched (NULL -> '')
    assert rows[1]["text"] == long_text
    assert rows[3]["text"] == ""
    # probe lane: en repeats (text + ' ') x REPEAT, non-en truncates
    p1 = rows[1 + QUALITY_PROBE_ID_OFFSET]
    assert p1["text"] == (long_text + " ") * QUALITY_PROBE_REPEAT
    p2 = rows[2 + QUALITY_PROBE_ID_OFFSET]
    assert p2["text"] == long_text[:QUALITY_PROBE_TRUNC]
    p3 = rows[3 + QUALITY_PROBE_ID_OFFSET]
    assert p3["text"] == " " * QUALITY_PROBE_REPEAT  # '' + ' ' repeated
    # labels and sources ride along
    assert p1["lang"] == "en" and p1["source"] == "web"
    assert p3["source"] == "cc"


# --- quality_gate_report ------------------------------------------------------


def test_gate_separating_corpus_keeps_positive_source(spark):
    """Stopword-rich en docs (source web) vs stopword-free xx docs
    (source cc): the head separates, every bin above the threshold is
    label-pure, so the 0.9-precision gate keeps all of web and none
    of cc — and the reported threshold splits the two score values."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_report,
    )

    en = "the and of to in is that with " * 6
    xx = "zork blap qux vemb trill " * 8
    rows = [(i, en, "en", "web") for i in range(12)] + [
        (100 + i, xx, "xx", "cc") for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {r["source"]: r for r in quality_gate_report(docs).collect()}
    assert set(got) == {"web", "cc"}
    web, cc = got["web"], got["cc"]
    assert (web["n_docs"], web["n_kept"], web["n_dropped"]) == (12, 12, 0)
    assert (cc["n_docs"], cc["n_kept"], cc["n_dropped"]) == (12, 0, 12)
    assert web["kept_frac"] == 1.0 and cc["kept_frac"] == 0.0
    assert web["threshold"] == cc["threshold"] > 0.0
    # token economics: en docs have 48 words each, xx docs 40
    assert web["kept_tokens"] == 12 * 48 and web["dropped_tokens"] == 0
    assert cc["kept_tokens"] == 0 and cc["dropped_tokens"] == 12 * 40


def test_gate_no_qualifying_bin_keeps_nothing(spark):
    """All-negative corpus: no bin can reach the precision target, so
    the gate falls back to threshold 1.0 and keeps nothing — a head
    that never meets the bar must not open the gate."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_report,
    )

    rows = [(i, "alpha beta gamma delta", "xx", "web") for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = quality_gate_report(docs).collect()
    assert len(got) == 1
    r = got[0]
    assert r["threshold"] == 1.0
    assert r["n_kept"] == 0 and r["kept_tokens"] == 0
    assert r["n_dropped"] == 10 and r["kept_frac"] == 0.0


def test_gate_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_report,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    assert quality_gate_report(empty).collect() == []


# --- crossmodal_keepset -------------------------------------------------------


def test_keepset_all_four_decisions(spark):
    """A drop with one re-ingest of stored content (7 matches old 3),
    one within-batch duplicate pair (17/27), and one unique doc (37):
    all four decisions fire with hand-checkable canonicals and the
    'both' kind evidence for identical texts."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_keepset,
    )

    rows = [
        (3, "alpha beta gamma", "web"),
        (7, "alpha beta gamma", "web"),
        (17, "delta epsilon zeta", "cc"),
        (27, "delta epsilon zeta", "cc"),
        (37, "unique content entirely different words", "web"),
    ]
    docs = spark.createDataFrame(
        [(i, t, s2, len(t)) for i, t, s2 in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r
        for r in crossmodal_keepset(docs, max_hamming=0).collect()
    }
    assert set(got) == {7, 17, 27, 37}
    assert got[7]["decision"] == "drop_known"
    assert got[7]["canonical_id"] == 3
    assert got[7]["kinds"] == "both"
    assert (got[7]["n_index_pairs"], got[7]["n_batch_pairs"]) == (1, 0)
    assert got[17]["decision"] == "keep_canonical"
    assert got[17]["canonical_id"] == 17
    assert (got[17]["n_index_pairs"], got[17]["n_batch_pairs"]) == (0, 1)
    assert got[27]["decision"] == "drop_in_batch"
    assert got[27]["canonical_id"] == 17
    assert got[37]["decision"] == "keep_new"
    assert got[37]["canonical_id"] == 37
    assert got[37]["kinds"] == ""
    assert (got[37]["n_index_pairs"], got[37]["n_batch_pairs"]) == (0, 0)
    # token economics ride along
    assert got[7]["n_tokens"] == 3 and got[37]["n_tokens"] == 5


def test_keepset_drop_known_beats_drop_in_batch(spark):
    """A doc that both re-ingests stored content AND repeats within
    the drop is drop_known (the index already has it) and its
    canonical is the index doc, not the batch partner."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_keepset,
    )

    rows = [
        (5, "alpha beta gamma", "web"),
        (17, "alpha beta gamma", "web"),
        (27, "alpha beta gamma", "web"),
    ]
    docs = spark.createDataFrame(
        [(i, t, s2, len(t)) for i, t, s2 in rows],
        "doc_id long, text string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: r
        for r in crossmodal_keepset(docs, max_hamming=0).collect()
    }
    assert got[27]["decision"] == "drop_known"
    assert got[27]["canonical_id"] == 5
    assert got[27]["n_index_pairs"] == 1 and got[27]["n_batch_pairs"] == 1
    assert got[17]["decision"] == "drop_known"
    assert got[17]["canonical_id"] == 5


def test_keepset_consistent_with_delta_pairs(spark):
    """On the sf0.001 corpus the report must agree with the pair list
    it derives from: drop_known == docs with an against_index pair,
    within-batch-only docs split keep_canonical/drop_in_batch by the
    min-id rule, unpaired lane docs are keep_new, and every lane doc
    appears exactly once."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_delta_pairs,
        crossmodal_keepset,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pairs = crossmodal_delta_pairs(docs).collect()
    rep = {r["doc_id"]: r for r in crossmodal_keepset(docs).collect()}
    lane = {
        r["doc_id"]
        for r in docs.filter(F.col("doc_id") % 10 == 7)
        .select("doc_id")
        .collect()
    }
    assert set(rep) == lane
    idx_hit: dict[int, list[int]] = {}
    batch_lt: dict[int, list[int]] = {}
    batch_touch: set[int] = set()
    for p in pairs:
        a, b, ai = p["id_a"], p["id_b"], p["against_index"]
        for doc, other in ((a, b), (b, a)):
            if doc not in lane:
                continue
            if ai:
                idx_hit.setdefault(doc, []).append(other)
            else:
                batch_touch.add(doc)
                if other < doc:
                    batch_lt.setdefault(doc, []).append(other)
    for d, r in rep.items():
        if d in idx_hit:
            assert r["decision"] == "drop_known"
            assert r["canonical_id"] == min(idx_hit[d])
        elif d in batch_lt:
            assert r["decision"] == "drop_in_batch"
            assert r["canonical_id"] == min(batch_lt[d])
        elif d in batch_touch:
            assert r["decision"] == "keep_canonical"
            assert r["canonical_id"] == d
        else:
            assert r["decision"] == "keep_new"
            assert r["canonical_id"] == d


def test_keepset_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_keepset,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_chars long"
    )
    assert crossmodal_keepset(empty).collect() == []


# --- cross-cutting invariants ---------------------------------------------------


def test_gate_monotone_in_target_precision(spark):
    """Raising the precision target can only raise the threshold and
    shrink the kept set — checked on a mixed corpus where the head
    actually separates (per-source kept counts non-increasing as the
    target sweeps up)."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_report,
    )

    en = "the and of to in is that with " * 6
    xx = "zork blap qux vemb trill " * 8
    mixed = "the and zork blap of to qux " * 6
    rows = (
        [(i, en, "en", "web") for i in range(8)]
        + [(100 + i, xx, "xx", "web") for i in range(8)]
        + [(200 + i, mixed, "en" if i % 2 else "xx", "web") for i in range(8)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    prev_kept, prev_thr = None, None
    for tp in (0.5, 0.7, 0.9, 1.0):
        r = quality_gate_report(docs, target_precision=tp).collect()[0]
        if prev_kept is not None:
            assert r["n_kept"] <= prev_kept
            assert r["threshold"] >= prev_thr
        prev_kept, prev_thr = r["n_kept"], r["threshold"]


def test_fertility_ratio_bounds_on_testdata(spark):
    """On the sf0.001 corpus: every word is ≥1 token and every token
    ≥1 char, so n_words ≤ n_tokens ≤ n_chars per source and both
    ratios are ≥ 1."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_fertility,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = bpe_fertility(docs, rounds=4).collect()
    assert len(rows) > 1
    for r in rows:
        assert 1 <= r["n_words"] <= r["n_tokens"] <= r["n_chars"]
        assert r["tokens_per_word"] >= 1.0
        assert r["chars_per_token"] >= 1.0
