"""Hand-checked unit tests for the text-analysis operators.

Oracle-vs-Spark parity at sf0.01 is covered automatically by
tests/test_oracle_parity.py once the q_text_* entries exist; these
tests pin the semantics on tiny inputs a human can verify.
"""

from __future__ import annotations

import pytest

from flink_kmeans_clustering_spark.operators.textstats import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_counts,
    token_frequencies,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_counts_basic(spark):
    df = _docs(
        spark,
        [
            (1, "hello world"),
            (2, ""),
            (3, "  a  b "),
            (4, "abc123,def!"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in token_counts(df).collect()}
    assert got[1]["n_ws_tokens"] == 2
    assert got[2]["n_ws_tokens"] == 0
    assert got[3]["n_ws_tokens"] == 2
    # "abc123,def!" lowered -> abc / 123 / , / def / ! = 5 BPE-ish tokens
    assert got[4]["n_bpe_tokens"] == 5
    assert got[4]["n_chars_actual"] == 11


def test_language_id_and_tiebreak(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog is in that house with food"),
            (2, "der hund und die katze ist nicht hier"),
            (3, "xyzzy qwerty plugh"),  # no stopword hits anywhere
            (4, "la de"),  # es hits la+de=2, fr hits le? no: la=1... tie case below
        ],
    )
    got = {r["doc_id"]: r["pred_lang"] for r in language_id(df).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "und"


def test_language_id_alphabetical_tiebreak(spark):
    # "die la" -> de hits {die}=1, es hits {la}=1, fr hits {la}=1 -> 'de' wins
    df = _docs(spark, [(1, "die la")])
    [r] = language_id(df).collect()
    assert r["pred_lang"] == "de"
    assert r["score"] == 1


def test_quality_score_bounds_and_empty(spark):
    df = _docs(
        spark,
        [
            (1, "the cat and the dog is in that house with plenty of food today"),
            (2, ""),
            (3, "!!! ??? ***"),
        ],
    )
    got = {r["doc_id"]: r.asDict() for r in quality_score(df).collect()}
    for d in got.values():
        assert 0.0 <= d["quality"] <= 1.0
    # pure punctuation: no words, max punct penalty -> only 0 components
    assert got[3]["n_words"] == 0
    assert got[3]["quality"] == 0.0
    assert got[1]["quality"] > got[3]["quality"]


def test_fingerprint_order_sensitive(spark):
    a = _docs(spark, [(1, "alpha beta")])
    b = _docs(spark, [(1, "beta alpha")])
    e = _docs(spark, [(1, "")])
    fa = doc_fingerprint(a).collect()[0]["fingerprint"]
    fb = doc_fingerprint(b).collect()[0]["fingerprint"]
    fe = doc_fingerprint(e).collect()[0]["fingerprint"]
    # hand-check: ascii('a')=97, len=5 -> 97*31+5=3012; ascii('b')=98, len=4
    # -> 98*31+4=3042;  "alpha beta" = 1*3012 + 2*3042 = 9096
    assert fa == 9096
    assert fb == 1 * 3042 + 2 * 3012
    assert fa != fb
    assert fe == 0


def test_token_frequencies_topn_deterministic(spark):
    df = _docs(spark, [(1, "a b b c c"), (2, "c d")])
    rows = [tuple(r) for r in token_frequencies(df, top_n=3).collect()]
    # freq DESC then token ASC: c=3, b=2, a=1 (a before d at freq 1)
    assert rows == [("c", 3), ("b", 2), ("a", 1)]


def test_repetition_stats_fractions_and_tiebreak(spark):
    from flink_kmeans_clustering_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # bigrams: "a b","b a","a b","b a" — all dup
            (2, "x"),           # short-doc rule: one unigram "x"
            (3, ""),            # empty: 0 grams, NULL fractions
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(docs, n=2).collect()}
    r1 = rows[1]
    assert (r1["n_ngrams"], r1["n_distinct"]) == (4, 2)
    assert r1["dup_ngram_frac"] == 1.0
    # count tie between "a b" and "b a" -> lexicographically smallest
    assert (r1["top_ngram"], r1["top_ngram_ct"], r1["top_ngram_frac"]) == ("a b", 2, 0.5)
    r2 = rows[2]
    assert (r2["n_ngrams"], r2["n_distinct"], r2["dup_ngram_frac"]) == (1, 1, 0.0)
    assert (r2["top_ngram"], r2["top_ngram_ct"], r2["top_ngram_frac"]) == ("x", 1, 1.0)
    r3 = rows[3]
    assert (r3["n_ngrams"], r3["n_distinct"]) == (0, 0)
    assert r3["dup_ngram_frac"] is None and r3["top_ngram"] is None


def test_tfidf_top_terms_hand_computed(spark):
    import math

    from flink_kmeans_clustering_spark.operators.textstats import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    rows = {(r["doc_id"], r["token"]): r for r in tfidf_top_terms(docs, k=5).collect()}
    idf_rare = math.log(3.0 / 2.0) + 1.0   # df=1, N=2
    assert rows[(1, "a")]["tfidf"] == round(2 * idf_rare, 6)
    assert rows[(1, "b")]["tfidf"] == 1.0  # df=2: ln(3/3)+1 = 1
    assert rows[(1, "a")]["rk"] == 1 and rows[(1, "b")]["rk"] == 2
    assert rows[(2, "c")]["rk"] == 1 and rows[(2, "b")]["rk"] == 2
    assert rows[(2, "c")]["df_ct"] == 1 and rows[(2, "b")]["df_ct"] == 2


def test_document_gate_rules_and_reasons(spark):
    from flink_kmeans_clustering_spark.operators.textstats import document_gate

    docs = spark.createDataFrame(
        [
            # long, clean, stopword-rich, varied -> keep
            (1, "the quick brown fox and the lazy dog is that with of to in "
                "every word once more again never twice alike here there now"),
            # 3 words -> too_short (and low_quality from length term)
            (2, "tiny doc here"),
            # massively repetitive -> repetitive
            (3, "spam ham " * 30),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in document_gate(docs).collect()}
    assert rows[1]["keep"] is True and rows[1]["reasons"] == ""
    assert "too_short" in rows[2]["reasons"] and rows[2]["keep"] is False
    assert "repetitive" in rows[3]["reasons"] and rows[3]["keep"] is False


def test_document_gate_agrees_with_signal_queries(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        document_gate,
        quality_score,
        repetition_stats,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    gate = {r["doc_id"]: r for r in document_gate(docs).collect()}
    qual = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    rep = {
        r["doc_id"]: r["dup_ngram_frac"] for r in repetition_stats(docs, n=2).collect()
    }
    for d, r in gate.items():
        assert r["quality"] == qual[d]
        assert r["dup_bigram_frac"] == rep[d]


def test_lm_unigram_scores_hand_checked(spark):
    import math

    from flink_kmeans_clustering_spark.operators.textstats import lm_unigram_scores

    df = spark.createDataFrame(
        [(0, "a a b"), (1, "b c"), (2, "")],
        "doc_id long, text string",
    )
    # corpus counts: a=2, b=2, c=1, n=5
    rows = {r["doc_id"]: r for r in lm_unigram_scores(df).collect()}
    assert set(rows) == {0, 1}  # empty doc excluded
    p = {"a": 2 / 5, "b": 2 / 5, "c": 1 / 5}
    want0 = (2 * -math.log(p["a"]) + 1 * -math.log(p["b"])) / 3
    want1 = (-math.log(p["b"]) - math.log(p["c"])) / 2
    assert abs(rows[0]["nll"] - want0) < 1e-6 and rows[0]["n_tokens"] == 3
    assert abs(rows[1]["nll"] - want1) < 1e-6 and rows[1]["n_tokens"] == 2
    # rarer tokens -> higher NLL
    assert rows[1]["nll"] > rows[0]["nll"]


def test_chunk_documents_window_rule(spark):
    """Starts at 0, stride, … while start < max(n-overlap, 1): every
    token covered, consecutive chunks share `overlap` tokens, no chunk
    fully contained in its predecessor, short docs -> one chunk."""
    from flink_kmeans_clustering_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"w{i}" for i in range(10))),  # 10 toks, 2 chunks
            (1, "one two three"),                        # < window -> 1 chunk
            (2, ""),                                     # empty -> none
            (3, " ".join(f"w{i}" for i in range(17))),  # boundary: 17 toks
        ],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["chunk_id"])

    # doc 0: stride 6 -> starts 0, 6 (n-overlap = 8 -> start<8)
    c0 = by_doc[0]
    assert [r["chunk_id"] for r in c0] == [0, 1]
    assert c0[0]["chunk_text"].split() == [f"w{i}" for i in range(8)]
    assert c0[1]["chunk_text"].split() == [f"w{i}" for i in range(6, 10)]
    assert c0[1]["n_tokens"] == 4
    # overlap tokens shared between consecutive chunks
    assert set(c0[0]["chunk_text"].split()) & set(c0[1]["chunk_text"].split()) == {"w6", "w7"}
    # doc 1: single short chunk
    assert len(by_doc[1]) == 1 and by_doc[1][0]["n_tokens"] == 3
    # doc 2: no chunks
    assert 2 not in by_doc
    # doc 3: n=17, starts 0,6,12 (start<15); union covers all 17 tokens
    c3 = by_doc[3]
    assert [r["chunk_id"] for r in c3] == [0, 1, 2]
    covered = set()
    for r in c3:
        covered.update(r["chunk_text"].split())
    assert covered == {f"w{i}" for i in range(17)}
    # every chunk adds at least one new token vs its predecessor
    seen = set()
    for r in c3:
        toks = set(r["chunk_text"].split())
        assert toks - seen
        seen |= toks


def test_chunk_documents_rejects_bad_overlap(spark):
    from flink_kmeans_clustering_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=8, overlap=8)


def test_chunk_documents_no_shuffle(spark):
    """Chunking must stay a narrow map: zero exchanges in the plan."""
    from flink_kmeans_clustering_spark.operators.textstats import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_source_token_drift_zero_for_identical_slice(spark):
    import math

    from flink_kmeans_clustering_spark.operators.textstats import (
        source_token_drift,
    )

    docs = spark.createDataFrame(
        [
            (0, "a", "a b"),
            (1, "a", "a b"),
            (2, "b", "a a a b"),  # skewed slice: drift > 0
        ],
        "doc_id long, source string, text string",
    )
    rows = {r["source"]: r["kl_vs_corpus"] for r in source_token_drift(docs).collect()}
    # corpus: a=5/8, b=3/8.  slice 'a': a=1/2, b=1/2
    exp_a = 0.5 * math.log(0.5 / (5 / 8)) + 0.5 * math.log(0.5 / (3 / 8))
    exp_b = 0.75 * math.log(0.75 / (5 / 8)) + 0.25 * math.log(0.25 / (3 / 8))
    assert abs(rows["a"] - round(exp_a, 6)) < 2e-6
    assert abs(rows["b"] - round(exp_b, 6)) < 2e-6
    assert rows["b"] > 0 and rows["a"] > 0  # KL >= 0, both slices skewed


def test_chunking_udtf_matches_hof_form(spark):
    """The Python-UDTF chunker must be row-for-row identical to the
    JVM HOF chunk_documents (same tokenizer, same window rule)."""
    from flink_kmeans_clustering_spark.functions.udtf import chunking_udtf
    from flink_kmeans_clustering_spark.operators.textstats import chunk_documents

    docs = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),
            (2, "short"),
            (3, ""),
            (4, "a-b,c  d!e"),  # punctuation-split tokenization
        ],
        "doc_id long, text string",
    )
    hof = chunk_documents(docs, chunk_tokens=3, overlap=1).collect()
    spark.udtf.register("chunk_t3o1", chunking_udtf(3, 1))
    docs.createOrReplaceTempView("_udtf_docs")
    udtf_rows = spark.sql(
        "SELECT f.* FROM _udtf_docs, LATERAL chunk_t3o1(doc_id, text) f"
    ).collect()
    key = lambda r: (r["doc_id"], r["chunk_id"])
    assert sorted(map(tuple, hof), key=lambda t: (t[0], t[1])) == sorted(
        map(tuple, udtf_rows), key=lambda t: (t[0], t[1])
    )


def test_chunking_udtf_rejects_bad_overlap():
    import pytest

    from flink_kmeans_clustering_spark.functions.udtf import chunking_udtf

    with pytest.raises(ValueError):
        chunking_udtf(4, 4)


def test_bm25_matches_hand_computation(spark):
    import math

    from flink_kmeans_clustering_spark.operators.textstats import bm25_scores

    docs = [
        (0, "spark join spark window"),
        (1, "merge sort table"),
        (2, "spark spark spark spark"),
        (3, "row scan filter value"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["bm25"], r["n_hits"])
        for r in bm25_scores(df, ["spark", "merge"], top_n=10).collect()
    }
    # hand replication
    toks = {i: t.split() for i, t in docs}
    n, avglen = 4.0, sum(len(v) for v in toks.values()) / 4.0
    dfreq = {"spark": 2.0, "merge": 1.0}
    k1, b = 1.2, 0.75
    want = {}
    for i, t in toks.items():
        s, hits = 0.0, 0
        for term in ("spark", "merge"):
            tf = t.count(term)
            if tf == 0:
                continue
            hits += 1
            idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avglen))
        if hits:
            want[i] = (round(s, 6), hits)
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1]
        assert abs(got[i][0] - want[i][0]) < 1e-9


def test_bm25_rare_term_outranks_common_at_equal_tf(spark):
    from flink_kmeans_clustering_spark.operators.textstats import bm25_scores

    # 'rare' appears in 1 of 6 docs, 'common' in 5 of 6 — equal tf and
    # equal doc length, so the rare-term doc must score higher
    docs = [(0, "rare pad")] + [(i, "common pad") for i in range(1, 6)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["rare", "common"], top_n=10).collect()
    }
    assert got[0] > max(v for k, v in got.items() if k != 0)


def test_token_entropy_known_values(spark):
    import math

    from flink_kmeans_clustering_spark.operators.textstats import token_entropy

    docs = [
        (0, "a a a a"),          # one distinct token -> 0.0
        (1, "a b a b"),          # uniform over 2 -> ln 2
        (2, "a a a b"),          # 3/4, 1/4
        (3, ""),                 # empty -> excluded
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct"], r["entropy"])
        for r in token_entropy(df).collect()
    }
    assert set(got) == {0, 1, 2}
    assert got[0] == (4, 1, 0.0)
    import struct

    # one-token-class entropy is +0.0, never -0.0 (hash determinism)
    assert struct.pack("<d", got[0][2]) == struct.pack("<d", 0.0)
    assert got[1][2] == round(math.log(2), 6)
    h = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert got[2] == (4, 2, round(h, 6))


def test_token_entropy_is_narrow(spark):
    from flink_kmeans_clustering_spark.operators.textstats import token_entropy
    from flink_kmeans_clustering_spark.plans import shuffle_count

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert shuffle_count(token_entropy(docs)) == 0


def test_quality_classifier_separates_prose_from_noise(spark):
    """The frozen-logistic classifier must rank fluent prose above
    symbol noise and keep/drop accordingly — the semantic contract of
    the model-based filter stage (cross-engine replay is the oracle's
    job; this pins that the weights actually discriminate)."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier,
    )

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox and the lazy dog were walking through "
                "the quiet forest while it was raining softly over the hills"),
            (1, "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) !!! ??? ~~~ ``` |||"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in quality_classifier(docs).collect()}
    assert rows[0]["p_keep"] > rows[1]["p_keep"]
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False
    assert 0.0 <= rows[2]["p_keep"] <= 1.0


def test_quality_classifier_is_narrow_codegen(spark):
    """The classifier is per-row scan arithmetic: no shuffle, no
    Python hop — the 100 TB shape for a quality model."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_classifier,
    )
    from flink_kmeans_clustering_spark.plans import explain_str, shuffle_count

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = quality_classifier(docs)
    assert shuffle_count(out) == 0
    plan = explain_str(out)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shingle_novelty_semantics(spark):
    """Exact dup -> novelty 0 for both copies; a fully unique doc ->
    novelty 1; an embedded doc's shared shingles count as non-novel."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        shingle_novelty,
    )

    a = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (0, a),
            (1, a),  # exact dup of 0
            (2, "completely different words entirely here now"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in shingle_novelty(docs).collect()}
    assert rows[0]["novelty"] == 0.0 and rows[1]["novelty"] == 0.0
    assert rows[2]["novelty"] == 1.0
    assert rows[0]["n_shingles"] == 4  # 6 tokens -> 4 distinct 3-grams


def test_keeper_dual_criterion_is_superset_of_jaccard_only(spark):
    """Monotonicity: adding the containment criterion can only REMOVE
    more docs — the dual keeper's kept set is a subset of the
    Jaccard-only kept set on any corpus."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        connected_components,
        dedup_corpus,
        ngram_jaccard_pairs,
        ngram_overlap_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    jac = ngram_jaccard_pairs(docs, n=3, threshold=0.5)
    dual = ngram_overlap_pairs(
        docs, n=3, jaccard_threshold=0.5, containment_threshold=0.8
    )
    kept_j = {
        r["doc_id"]
        for r in dedup_corpus(
            docs, connected_components(jac, node_col="doc_id")
        ).collect()
    }
    kept_d = {
        r["doc_id"]
        for r in dedup_corpus(
            docs, connected_components(dual, node_col="doc_id")
        ).collect()
    }
    assert kept_d <= kept_j


def test_segment_boilerplate_removal_semantics(spark):
    """A 10-token banner shared by two docs is dropped from BOTH; each
    doc's unique tail survives in order; a doc made entirely of the
    banner retains nothing (digest of empty string)."""
    import hashlib

    from flink_kmeans_clustering_spark.operators.textstats import (
        segment_boilerplate_removal,
    )

    banner = "copyright acme corp all rights reserved terms apply here now"
    tail0 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    tail1 = "one two three four five six seven eight nine ten"
    docs = spark.createDataFrame(
        [
            (0, f"{banner} {tail0}"),
            (1, f"{banner} {tail1}"),
            (2, banner),
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in segment_boilerplate_removal(docs, seg_tokens=10).collect()
    }
    for i, tail in ((0, tail0), (1, tail1)):
        assert rows[i]["n_segments"] == 2
        assert rows[i]["n_dropped"] == 1
        assert rows[i]["n_tokens_retained"] == 10
        assert rows[i]["retained_digest"] == hashlib.md5(
            tail.encode()
        ).hexdigest()
    assert rows[2]["n_dropped"] == 1 and rows[2]["n_tokens_retained"] == 0
    assert rows[2]["retained_digest"] == hashlib.md5(b"").hexdigest()


def test_pii_redact_fixture_and_cross_engine(spark):
    """Fixture with real PII: counts and the redacted digest must
    match a hand-redaction AND DuckDB's RE2 replay of the same
    patterns (the Java-regex vs RE2 agreement the oracle relies on,
    exercised on text that actually matches)."""
    import hashlib

    import duckdb

    from flink_kmeans_clustering_spark.operators.textstats import (
        PII_EMAIL_RE,
        PII_IP_RE,
        PII_PHONE_RE,
        pii_redact,
    )

    raw = (
        "contact jane.doe+spam@example.co.uk or call 555-123-4567; "
        "server at 10.0.255.1 logged admin@test.io twice 555.9999 "
        "and 123-4567-8901 ends"
    )
    want_red = (
        "contact <EMAIL> or call <PHONE>; "
        "server at <IP> logged <EMAIL> twice 555.9999 "
        "and 123-4567-<PHONE> ends"
    )
    # hand-check: 2 emails, 1 ip; phones: 555-123-4567 and 4567-8901?
    # PII_PHONE_RE needs ddd[-.]ddd(d)?[-.]dddd: '555-123-4567' yes;
    # '123-4567-8901' -> '123-4567' fails (4 then boundary)… compute
    # ground truth from Python re instead of guessing:
    import re

    n_e = len(re.findall(PII_EMAIL_RE, raw))
    n_p = len(re.findall(PII_PHONE_RE, raw))
    n_i = len(re.findall(PII_IP_RE, raw))
    red = re.sub(PII_EMAIL_RE, "<EMAIL>", raw)
    red = re.sub(PII_IP_RE, "<IP>", red)
    red = re.sub(PII_PHONE_RE, "<PHONE>", red)
    assert n_e == 2 and n_i == 1 and n_p >= 1

    df = spark.createDataFrame([(0, raw)], "doc_id long, text string")
    [row] = pii_redact(df).collect()
    assert (row["n_emails"], row["n_phones"], row["n_ips"]) == (n_e, n_p, n_i)
    assert row["redacted_digest"] == hashlib.md5(red.encode()).hexdigest()

    [(dk_digest,)] = duckdb.sql(
        f"""SELECT md5(regexp_replace(regexp_replace(regexp_replace(?,
              '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
              '{PII_IP_RE}', '<IP>', 'g'),
              '{PII_PHONE_RE}', '<PHONE>', 'g'))""",
        params=[raw],
    ).fetchall()
    assert dk_digest == row["redacted_digest"]


def test_vocab_coverage_semantics(spark):
    """Hand-checkable corpus: 'a'×6 'b'×3 'c'×1 → total 10; 60%
    coverage needs 1 token, 90% needs 2, 100% needs 3; monotone in
    the target."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        vocab_coverage,
    )

    docs = spark.createDataFrame(
        [(0, "a a a a a a"), (1, "b b b c")], "doc_id long, text string"
    )
    rows = {
        r["coverage"]: r["vocab_size"]
        for r in vocab_coverage(docs, coverages=(0.6, 0.9, 1.0)).collect()
    }
    assert rows == {0.6: 1, 0.9: 2, 1.0: 3}


def test_vocab_coverage_monotone_in_target(spark):
    """vocab_size must be nondecreasing in the coverage target, and
    reach the full vocabulary at 1.0."""
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.operators.textstats import (
        vocab_coverage,
    )
    from flink_kmeans_clustering_spark.functions.text import tokenize

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = sorted(
        (r["coverage"], r["vocab_size"])
        for r in vocab_coverage(
            docs, coverages=(0.5, 0.8, 0.95, 1.0)
        ).collect()
    )
    sizes = [v for _, v in rows]
    assert sizes == sorted(sizes)
    n_vocab = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("t"))
        .select("t")
        .distinct()
        .count()
    )
    assert sizes[-1] == n_vocab


def test_bpe_pair_counts_and_tiebreak(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_pair_frequencies,
    )

    docs = spark.createDataFrame(
        [(0, "aba ab"), (1, "ba")], "doc_id long, text string"
    )
    # tokens: aba -> (ab, ba); ab -> (ab); ba -> (ba)  => ab:2, ba:2
    rows = bpe_pair_frequencies(docs, top_n=10).collect()
    assert [(r["pair"], r["freq"]) for r in rows] == [("ab", 2), ("ba", 2)]
    top1 = bpe_pair_frequencies(docs, top_n=1).collect()
    assert [(r["pair"], r["freq"]) for r in top1] == [("ab", 2)]


def test_bpe_single_char_words_excluded(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_pair_frequencies,
    )

    docs = spark.createDataFrame([(0, "a b cd!")], "doc_id long, text string")
    rows = bpe_pair_frequencies(docs, top_n=10).collect()
    assert [(r["pair"], r["freq"]) for r in rows] == [("cd", 1)]


def test_lm_bigram_hand_computed(spark):
    import math

    from flink_kmeans_clustering_spark.operators.textstats import (
        lm_bigram_scores,
    )

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "b a")], "doc_id long, text string"
    )
    # corpus: c(a b)=2, c(b a)=2; c(a ·)=2, c(b ·)=2; V=2
    # every bigram: P = (2+1)/(2+2) = 0.75 -> nll = -ln 0.75 for both docs
    want = round(-math.log(0.75), 6)
    got = {r["doc_id"]: (r["n_bigrams"], r["nll"]) for r in lm_bigram_scores(docs).collect()}
    assert got == {0: (3, want), 1: (1, want)}


def test_lm_bigram_short_docs_produce_no_row(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        lm_bigram_scores,
    )

    docs = spark.createDataFrame(
        [(0, "hello"), (1, ""), (2, "two tokens")], "doc_id long, text string"
    )
    assert [r["doc_id"] for r in lm_bigram_scores(docs).collect()] == [2]


def test_perplexity_buckets_partition_and_mass(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        perplexity_buckets,
    )

    docs = spark.createDataFrame(
        [(i, ("common words here " * 3) if i % 3 else "rare zyx qqq") for i in range(30)],
        "doc_id long, text string",
    )
    rows = perplexity_buckets(docs, rate=1.0).collect()
    got = {r["bucket"]: r["n_docs"] for r in rows}
    # every doc lands in exactly one bucket
    assert sum(got.values()) == 30
    assert set(got) <= {"head", "middle", "tail"}
    # the repeated common-word docs score lower nll -> head;
    # the rare-token docs must NOT be in head
    assert got["head"] >= 10


def test_source_datacard_semantics(spark):
    """Top-lang mode ties break to the ascending lang; dup pressure
    counts hash groups WITHIN a source (a cross-source identical text
    is not an in-source dup); token stats come off the shared
    tokenizer."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        source_datacard,
    )

    rows = [
        (0, "s1", "en", "hello world"),          # 2 tokens
        (1, "s1", "de", "gut morgen heute"),     # 3 tokens
        (2, "s1", "en", "same text"),
        (3, "s1", "fr", "same text"),            # dup of 2 within s1
        (4, "s2", "en", "same text"),            # NOT a dup (other source)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, source string, lang string, text string"
    )
    out = {r["source"]: r for r in source_datacard(df).collect()}
    s1, s2 = out["s1"], out["s2"]
    assert s1["n_docs"] == 4 and s1["total_tokens"] == 9
    assert s1["n_langs"] == 3
    # lang counts in s1: en=2, de=1, fr=1 -> top is en outright
    assert s1["top_lang"] == "en"
    assert s1["n_dup_docs"] == 2 and s1["dup_frac"] == 0.5
    assert s2["n_dup_docs"] == 0 and s2["top_lang"] == "en"
    # tie case: two langs at count 1 -> ascending lang wins
    tie = spark.createDataFrame(
        [(0, "t", "fr", "x y"), (1, "t", "de", "z w")],
        "doc_id long, source string, lang string, text string",
    )
    [r] = source_datacard(tie).collect()
    assert r["top_lang"] == "de" and r["n_langs"] == 2
