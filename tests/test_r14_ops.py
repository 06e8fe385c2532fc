"""Unit tests for round-14 operators: the tokenizer vocabulary-size
sweep, the gate threshold-sensitivity / PR curve, the keep-set
compaction delta, and the r13-ADVICE probe-id collision guard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"

# --- bpe_vocab_sweep ----------------------------------------------------------


def test_vocab_sweep_hand_computed(spark):
    """The r13 fertility corpus at budgets (1, 2): round 1 learns
    (t,h), round 2 adds (a,t).  After 1 merge: the->[th,e](2),
    cat->[c,a,t](3), hat->[h,a,t](3), thin->[th,i,n](3), a->[a](1);
    after 2: the->[th,e], cat->[c,at], hat->[h,at], thin->[th,i,n],
    a->[a] — the hand-checked fertility rows at both budgets."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_vocab_sweep,
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
            r["n_merges"],
            r["source"],
            r["n_words"],
            r["n_tokens"],
            r["n_chars"],
            r["tokens_per_word"],
            r["chars_per_token"],
        )
        for r in bpe_vocab_sweep(docs, rounds_list=(1, 2)).collect()
    ]
    # budget 1: srcA the(2)x2+cat(3)+hat(3)=10 toks; srcB the(2)+
    # thin(3)+cat(3)+a(1)=9
    # budget 2: srcA 2+2+2+2=8; srcB 2+3+2+1=8
    assert got == [
        (1, "srcA", 4, 10, 12, 2.5, 1.2),
        (1, "srcB", 4, 9, 11, 2.25, 1.222222),
        (2, "srcA", 4, 8, 12, 2.0, 1.5),
        (2, "srcB", 4, 8, 11, 2.0, 1.375),
    ]


def test_vocab_sweep_largest_budget_matches_fertility(spark):
    """The sweep's largest-budget rows must equal bpe_fertility at the
    same rounds — one training pass, same merges, same integers."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_fertility,
        bpe_vocab_sweep,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sweep = {
        r["source"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in bpe_vocab_sweep(docs, rounds_list=(2, 4))
        .filter(F.col("n_merges") == 4)
        .collect()
    }
    fert = {
        r["source"]: (r["n_words"], r["n_tokens"], r["n_chars"])
        for r in bpe_fertility(docs, rounds=4).collect()
    }
    assert sweep == fert


def test_vocab_sweep_monotone_in_budget(spark):
    """More merges can only shrink the token count: per source,
    n_tokens is non-increasing in n_merges (n_words/n_chars fixed), so
    fertility falls and compression rises along the curve."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_vocab_sweep,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = bpe_vocab_sweep(docs, rounds_list=(2, 4, 8)).collect()
    by_src: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["n_merges"])):
        by_src.setdefault(r["source"], []).append(r)
    assert len(by_src) > 1
    for src, pts in by_src.items():
        assert [p["n_merges"] for p in pts] == [2, 4, 8]
        assert len({p["n_words"] for p in pts}) == 1
        assert len({p["n_chars"] for p in pts}) == 1
        toks = [p["n_tokens"] for p in pts]
        assert toks == sorted(toks, reverse=True), src


def test_vocab_sweep_budget_past_merge_supply(spark):
    """A corpus whose pair supply dries up early: budgets past the
    supply report the fully-merged segmentation (identity rounds), so
    the curve flattens instead of erroring.  'aa aa' learns (a,a) and
    then has no pairs left."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_vocab_sweep,
    )

    docs = spark.createDataFrame(
        [(1, "aa aa", "s")], "doc_id long, text string, source string"
    )
    got = {
        r["n_merges"]: r["n_tokens"]
        for r in bpe_vocab_sweep(docs, rounds_list=(1, 3)).collect()
    }
    assert got == {1: 2, 3: 2}


def test_vocab_sweep_empty_and_bad_args(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_vocab_sweep,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string"
    )
    assert bpe_vocab_sweep(empty, rounds_list=(1, 2)).collect() == []
    with pytest.raises(ValueError):
        bpe_vocab_sweep(empty, rounds_list=())
    with pytest.raises(ValueError):
        bpe_vocab_sweep(empty, rounds_list=(0, 2))


# --- quality_gate_pr_curve ----------------------------------------------------


def test_pr_curve_separating_corpus(spark):
    """Stopword-rich en docs vs stopword-free xx docs: the head
    separates, so the curve has a pure top edge (precision 1.0 at the
    highest bin) and a full-recall bottom edge (the lowest populated
    bin keeps everything)."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_pr_curve,
    )

    en = "the and of to in is that with " * 6
    xx = "zork blap qux vemb trill " * 8
    rows = [(i, en, "en", "web") for i in range(12)] + [
        (100 + i, xx, "xx", "cc") for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    curve = quality_gate_pr_curve(docs).collect()
    assert len(curve) >= 2
    bins = [r["bin"] for r in curve]
    assert bins == sorted(bins)
    top, bottom = curve[-1], curve[0]
    assert top["precision"] == 1.0
    assert top["cum_docs"] == 12 and top["cum_pos"] == 12
    assert top["recall"] == 1.0
    assert top["cum_tokens"] == 12 * 48
    assert bottom["cum_docs"] == 24 and bottom["kept_frac"] == 1.0
    assert bottom["recall"] == 1.0 and bottom["precision"] == 0.5
    assert bottom["cum_tokens"] == 12 * 48 + 12 * 40
    # thresholds are the bin lower edges
    for r in curve:
        assert r["threshold"] == round(r["bin"] / 10, 6)


def test_pr_curve_cumulative_is_suffix_sum(spark):
    """cum_* columns are exact suffix sums of the per-bin columns, and
    kept_frac/precision/recall are their ratios — re-derived in
    Python."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_pr_curve,
        quality_probe_frame,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    curve = quality_gate_pr_curve(
        quality_probe_frame(docs), lr=2.0, rounds=10
    ).collect()
    assert curve, "probe slice must populate bins"
    n = {r["bin"]: r["n_docs"] for r in curve}
    p = {r["bin"]: r["n_pos"] for r in curve}
    big_n = sum(n.values())
    big_p = sum(p.values())
    for r in curve:
        cd = sum(v for b, v in n.items() if b >= r["bin"])
        cp = sum(v for b, v in p.items() if b >= r["bin"])
        assert r["cum_docs"] == cd
        assert r["cum_pos"] == cp
        assert r["precision"] == round(cp / cd, 6)
        assert r["recall"] == round(cp / big_p, 6)
        assert r["kept_frac"] == round(cd / big_n, 6)


def test_pr_curve_contains_gate_operating_point(spark):
    """The gate's chosen threshold must appear on the curve with a
    realized precision >= the target — the curve is the gate's own
    justification."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_pr_curve,
        quality_gate_report,
        quality_probe_frame,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    probe = quality_probe_frame(docs)
    gate = quality_gate_report(probe, lr=2.0, rounds=10).collect()
    curve = quality_gate_pr_curve(probe, lr=2.0, rounds=10).collect()
    thr = gate[0]["threshold"]
    assert all(r["threshold"] == thr for r in gate)
    pts = {r["threshold"]: r for r in curve}
    if thr in pts:  # threshold 1.0 = "nothing kept" has no curve row
        assert pts[thr]["precision"] >= 0.9
    # and every curve edge BELOW the pick must miss the target
    for t, r in pts.items():
        if t < thr:
            assert r["precision"] < 0.9


def test_pr_curve_no_positives_recall_null(spark):
    """All-negative corpus: precision/kept_frac still defined, recall
    is NULL (0/0) on every row."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_pr_curve,
    )

    rows = [(i, "alpha beta gamma delta", "xx", "web") for i in range(10)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    curve = quality_gate_pr_curve(docs).collect()
    assert curve
    for r in curve:
        assert r["recall"] is None
        assert r["precision"] == 0.0


def test_pr_curve_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.textstats import (
        quality_gate_pr_curve,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    assert quality_gate_pr_curve(empty).collect() == []


# --- crossmodal_keepset_compaction --------------------------------------------


def test_compaction_hand_computed(spark):
    """The r13 keepset fixture: index docs 3 (srcA) and stored rows,
    lane docs 7/17/27/37 — drop_known(7), keep_canonical(17),
    drop_in_batch(27), keep_new(37).  Per-source ledger rows are
    hand-checkable, including after = before + kept."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_keepset_compaction,
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
        r["source"]: r
        for r in crossmodal_keepset_compaction(docs, max_hamming=0).collect()
    }
    assert set(got) == {"web", "cc"}
    web, cc = got["web"], got["cc"]
    # web: index holds doc 3 (3 tokens); ingested 7 (drop_known) and
    # 37 (keep_new, 5 tokens)
    assert (web["idx_docs_before"], web["idx_tokens_before"]) == (1, 3)
    assert web["n_ingested"] == 2
    assert (web["n_dropped_known"], web["n_kept_new"]) == (1, 1)
    assert (web["n_dropped_in_batch"], web["n_kept_canonical"]) == (0, 0)
    assert (web["added_docs"], web["added_tokens"]) == (1, 5)
    assert (web["idx_docs_after"], web["idx_tokens_after"]) == (2, 8)
    assert web["ingest_kept_frac"] == 0.5
    # cc: empty index; 17 keep_canonical (3 tokens), 27 drop_in_batch
    assert (cc["idx_docs_before"], cc["idx_tokens_before"]) == (0, 0)
    assert cc["n_ingested"] == 2
    assert (cc["n_kept_canonical"], cc["n_dropped_in_batch"]) == (1, 1)
    assert (cc["added_docs"], cc["added_tokens"]) == (1, 3)
    assert (cc["idx_docs_after"], cc["idx_tokens_after"]) == (1, 3)
    assert cc["ingest_kept_frac"] == 0.5


def test_compaction_consistent_with_keepset(spark):
    """On the sf0.001 corpus the ledger must re-derive exactly from
    the keep-set report + an index-lane count: per-decision sums,
    added tokens, and after = before + kept, per source."""
    from flink_kmeans_clustering_spark.functions.text import tokenize
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_keepset,
        crossmodal_keepset_compaction,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ks = crossmodal_keepset(docs).collect()
    led = {
        r["source"]: r
        for r in crossmodal_keepset_compaction(docs).collect()
    }
    old = {
        r["source"]: (r["n"], r["t"])
        for r in docs.filter(F.col("doc_id") % 10 != 7)
        .select(
            "source",
            F.size(tokenize(F.coalesce(F.col("text"), F.lit("")))).alias(
                "tk"
            ),
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("tk").alias("t"))
        .collect()
    }
    assert set(led) == set(old) | {r["source"] for r in ks}
    for src, r in led.items():
        ob, ot = old.get(src, (0, 0))
        assert (r["idx_docs_before"], r["idx_tokens_before"]) == (ob, ot)
        mine = [k for k in ks if k["source"] == src]
        assert r["n_ingested"] == len(mine)
        by_dec = {
            d: sum(1 for k in mine if k["decision"] == d)
            for d in (
                "drop_known",
                "drop_in_batch",
                "keep_canonical",
                "keep_new",
            )
        }
        assert r["n_dropped_known"] == by_dec["drop_known"]
        assert r["n_dropped_in_batch"] == by_dec["drop_in_batch"]
        assert r["n_kept_canonical"] == by_dec["keep_canonical"]
        assert r["n_kept_new"] == by_dec["keep_new"]
        kept_toks = sum(
            k["n_tokens"]
            for k in mine
            if k["decision"] in ("keep_canonical", "keep_new")
        )
        assert r["added_tokens"] == kept_toks
        assert r["idx_docs_after"] == ob + r["added_docs"]
        assert r["idx_tokens_after"] == ot + kept_toks


def test_compaction_empty_input(spark):
    from flink_kmeans_clustering_spark.operators.dedup import (
        crossmodal_keepset_compaction,
    )

    empty = spark.createDataFrame(
        [], "doc_id long, text string, source string, n_chars long"
    )
    assert crossmodal_keepset_compaction(empty).collect() == []


# --- probe-id collision guard (ADVICE r13) ------------------------------------


def test_probe_frame_raises_on_id_collision(spark):
    """A doc_id at or above QUALITY_PROBE_ID_OFFSET would alias a
    probe row onto a real row — the probe lane must fail loudly
    instead of silently diverging from the oracle."""
    from pyspark.errors import SparkRuntimeException

    from flink_kmeans_clustering_spark.operators.textstats import (
        QUALITY_PROBE_ID_OFFSET,
        quality_probe_frame,
    )

    docs = spark.createDataFrame(
        [(QUALITY_PROBE_ID_OFFSET, "some text", "en", "web")],
        "doc_id long, text string, lang string, source string",
    )
    with pytest.raises(SparkRuntimeException, match="QUALITY_PROBE_ID_OFFSET"):
        quality_probe_frame(docs).collect()


def test_probe_frame_ok_below_offset(spark):
    """Ids strictly below the offset pass the guard untouched."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        QUALITY_PROBE_ID_OFFSET,
        quality_probe_frame,
    )

    docs = spark.createDataFrame(
        [(QUALITY_PROBE_ID_OFFSET - 1, "some text", "en", "web")],
        "doc_id long, text string, lang string, source string",
    )
    rows = quality_probe_frame(docs).collect()
    assert len(rows) == 2
    assert {r["doc_id"] for r in rows} == {
        QUALITY_PROBE_ID_OFFSET - 1,
        2 * QUALITY_PROBE_ID_OFFSET - 1,
    }


# --- r14 optimization equivalences --------------------------------------------
#
# The optimization round rewrote several per-row expressions into
# cheaper codegen forms.  Results must be BIT-identical — these pins
# re-derive each rewritten count/row from the original (slower) form
# over real testdata plus adversarial edge rows and assert equality.

EDGE_TEXTS = [
    "",
    " ",
    "\t\n\x0b\x0c\r",
    "abc",
    "ABC abc 123",
    "the and of to in is that with",
    "THE theater other,and;of",
    "a,,b  c!!d",
    "héllo wörld Ünïcode ß",
    "100% of $5.99!",
    "the" * 50,
    ("The quick brown fox 42! " * 40),
    None,
]


def test_quality_features_translate_equals_regexp_forms(spark):
    """quality_feature_frame's translate()-based counts (r14) equal the
    original regexp_count / HOF-fold forms row-for-row, on testdata and
    on edge rows (empty, whitespace-only, unicode, NULL)."""
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.functions.text import tokenize

    UP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
    LO = UP.lower()
    DIG = "0123456789"
    WS = " \t\n\x0b\x0c\r"
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    edge = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")
    frame = docs.unionAll(edge).select(
        F.coalesce(F.col("text"), F.lit("")).alias("text")
    )
    t = F.col("text")
    lowered = F.lower(t)
    toks = tokenize(t)
    bad = frame.select(
        (
            F.regexp_count(t, F.lit(r"[^a-zA-Z0-9\s]"))
            == F.length(F.translate(t, LO + UP + DIG + WS, ""))
        ).alias("punct"),
        (
            F.regexp_count(t, F.lit(r"[0-9]"))
            == (F.length(t) - F.length(F.translate(t, DIG, "")))
        ).alias("digit"),
        (
            F.regexp_count(t, F.lit(r"[A-Z]"))
            == (F.length(t) - F.length(F.translate(t, UP, "")))
        ).alias("upper"),
        (
            F.aggregate(
                F.transform(toks, lambda x: F.length(x)),
                F.lit(0),
                lambda a, b: a + b,
            )
            == (
                F.length(lowered)
                - F.length(F.translate(lowered, LO + DIG, ""))
            )
        ).alias("tokchars"),
    ).selectExpr(
        "sum(CAST(NOT punct AS INT)) AS p",
        "sum(CAST(NOT digit AS INT)) AS d",
        "sum(CAST(NOT upper AS INT)) AS u",
        "sum(CAST(NOT tokchars AS INT)) AS tc",
    ).head()
    assert (bad["p"], bad["d"], bad["u"], bad["tc"]) == (0, 0, 0, 0), bad


def test_caption_rlike_filter_equals_tokenize_nonempty(spark):
    """caption_fingerprints' has-a-token predicate (r14:
    lower(text) rlike '[a-z0-9]') keeps exactly the rows the original
    size(tokenize(text)) > 0 filter kept — including NULL text, which
    both forms drop."""
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.functions.text import tokenize

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("text")
    edge = spark.createDataFrame([(t,) for t in EDGE_TEXTS], "text string")
    frame = docs.unionAll(edge)
    mism = frame.select(
        (
            F.coalesce(F.lower(F.col("text")).rlike("[a-z0-9]"), F.lit(False))
            == F.coalesce(
                F.size(tokenize(F.col("text"))) > 0, F.lit(False)
            )
        ).alias("same")
    ).selectExpr("sum(CAST(NOT same AS INT)) AS bad").head()
    assert mism["bad"] == 0


def test_ahash_inline_rows_equal_two_step_form(spark):
    """ahash_chunks' single-inline row emission (r14) produces exactly
    the rows of the original two-step form (alias the chunk array, then
    posexplode + element_at) — re-derived here from the shipped chunk
    table itself: within each asset the 4 (chunk_idx, chunk_val) rows
    must agree with the carried c0..c3 columns, and chunk_val at index
    j must equal cj."""
    from pyspark.sql import functions as F

    from flink_kmeans_clustering_spark.operators.multimodal import (
        ahash_chunks,
        synthesize_assets,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    h = ahash_chunks(synthesize_assets(docs))
    rows = h.collect()
    assert rows, "chunk table must not be empty"
    per_asset = {}
    for r in rows:
        per_asset.setdefault(r["asset_id"], []).append(r)
    for aid, rs in per_asset.items():
        assert sorted(x["chunk_idx"] for x in rs) == [0, 1, 2, 3], aid
        carried = {(x["c0"], x["c1"], x["c2"], x["c3"]) for x in rs}
        assert len(carried) == 1, aid  # c0..c3 identical across the 4 rows
        cvec = carried.pop()
        for x in rs:
            assert x["chunk_val"] == cvec[x["chunk_idx"]], (aid, x)
