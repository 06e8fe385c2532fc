"""Unit tests for round-10 operators: DoReMi domain-weight learning,
CLIP-style image-text agreement filtering, crawl-snapshot delta-dedup."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

# --- doremi_domain_weights ----------------------------------------------------


def test_doremi_upweights_divergent_domain(spark):
    """Multiplicative weights on KL(p_d || q_mix): the domain whose
    token distribution diverges from everyone else must end ABOVE the
    uniform 1/K weight, and the near-identical majority domains below
    it (the paper's point: the mixture shifts toward underserved
    domains)."""
    from flink_kmeans_clustering_spark.operators.sampling import (
        doremi_domain_weights,
    )

    common = "alpha beta gamma delta " * 8
    rows = (
        [(i, common, "en", "web") for i in range(4)]
        + [(10 + i, common, "en", "news") for i in range(4)]
        + [(20 + i, "zeta " * 32, "en", "code") for i in range(4)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {r["source"]: r for r in doremi_domain_weights(docs).collect()}
    assert set(got) == {"web", "news", "code"}
    third = 1.0 / 3.0
    assert got["code"]["doremi_weight"] > third
    assert got["web"]["doremi_weight"] < third
    assert got["news"]["doremi_weight"] < third
    # identical domains get identical weights and KLs
    assert got["web"]["doremi_weight"] == got["news"]["doremi_weight"]
    assert got["web"]["kl"] == got["news"]["kl"]
    assert got["code"]["kl"] > got["web"]["kl"] >= 0.0
    # weights sum to 1 up to output rounding
    assert abs(sum(r["doremi_weight"] for r in got.values()) - 1.0) < 1e-5


def test_doremi_uniform_corpus_stays_uniform(spark):
    """Identical domain distributions → KL ≈ 0 for every domain → the
    update is (numerically) the identity and weights stay at 1/K."""
    from flink_kmeans_clustering_spark.operators.sampling import (
        doremi_domain_weights,
    )

    text = "one two three four five"
    rows = [(i, text, "en", f"s{i % 4}") for i in range(16)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    out = doremi_domain_weights(docs).collect()
    assert len(out) == 4
    for r in out:
        assert abs(r["doremi_weight"] - 0.25) < 1e-6
        assert r["kl"] == 0.0
    # ordered by domain name
    assert [r["source"] for r in out] == sorted(r["source"] for r in out)


def test_doremi_empty_and_tokenless_inputs(spark):
    from flink_kmeans_clustering_spark.operators.sampling import (
        doremi_domain_weights,
    )

    schema = "doc_id long, text string, lang string, source string"
    empty = spark.createDataFrame([], schema)
    out = doremi_domain_weights(empty)
    assert out.count() == 0
    assert out.columns == [
        "source",
        "n_docs",
        "n_tokens",
        "token_share",
        "doremi_weight",
        "kl",
    ]
    # a domain with zero tokens still appears (docs counted, LM is the
    # add-1 uniform) and cannot crash the iteration
    docs = spark.createDataFrame(
        [(0, "alpha beta", "en", "a"), (1, "!!! ...", "en", "b")], schema
    )
    got = {r["source"]: r for r in doremi_domain_weights(docs).collect()}
    assert got["b"]["n_tokens"] == 0 and got["b"]["n_docs"] == 1
    assert abs(sum(r["doremi_weight"] for r in got.values()) - 1.0) < 1e-5


def test_doremi_matches_pure_python_iteration(spark):
    """The driver-loop state machine replayed independently: same
    counts → same weights, pinning the fixed-point discipline (9dp KL
    before exp, 12dp alpha after smoothing, bucket-then-domain fold
    order) that the DuckDB oracle also follows."""
    from flink_kmeans_clustering_spark.operators.sampling import (
        DOREMI_BUCKETS,
        doremi_domain_weights,
    )

    rows = [
        (0, "red green blue", "en", "a"),
        (1, "red red red red", "en", "b"),
        (2, "blue cyan teal navy", "en", "c"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    got = {r["source"]: r["doremi_weight"] for r in doremi_domain_weights(docs).collect()}

    B, T, eta, c = DOREMI_BUCKETS, 5, 1.0, 0.01

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % B

    def rnd(x, d):
        s = 10.0 ** d
        return math.floor(x * s + 0.5) / s

    corpora = {
        "a": ["red", "green", "blue"],
        "b": ["red"] * 4,
        "c": ["blue", "cyan", "teal", "navy"],
    }
    doms = sorted(corpora)
    counts = {d: [0] * B for d in doms}
    for d, toks in corpora.items():
        for t in toks:
            counts[d][bucket(t)] += 1
    p = [
        [(counts[d][b] + 1.0) / (sum(counts[d]) + B) for b in range(B)]
        for d in doms
    ]
    k = len(doms)
    alpha = [1.0 / k] * k
    for _ in range(T):
        q = [sum(alpha[d] * p[d][b] for d in range(k)) for b in range(B)]
        kl = [
            rnd(sum(p[d][b] * math.log(p[d][b] / q[b]) for b in range(B)), 9)
            for d in range(k)
        ]
        raw = [alpha[d] * math.exp(eta * kl[d]) for d in range(k)]
        z = sum(raw)
        alpha = [rnd((1 - c) * raw[d] / z + c / k, 12) for d in range(k)]
    for i, d in enumerate(doms):
        assert got[d] == rnd(alpha[i], 6), d


# --- clip_agreement_filter ----------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def test_clip_head_weights_deterministic_shape_and_range():
    from flink_kmeans_clustering_spark.operators.multimodal import (
        clip_head_weights,
    )

    w1, w2 = clip_head_weights("img"), clip_head_weights("img")
    assert w1 == w2
    assert len(w1) == 8 and all(len(r) == 16 for r in w1)
    assert all(-1.0 < v < 1.0 for r in w1 for v in r)
    assert clip_head_weights("txt") != w1


def test_clip_agreement_matches_hand_computation(spark):
    """Replicate both towers + heads in pure Python for one doc and
    pin the exact rounded cosine."""
    from flink_kmeans_clustering_spark.operators.multimodal import (
        clip_agreement_filter,
        clip_head_weights,
    )

    text = "the quick brown fox jumps over the lazy dog"
    out = clip_agreement_filter(_docs(spark, [(0, text), (1, "x"), (2, "y")])).collect()
    # only doc_id % 3 == 0 survives the modality cut
    assert [r["doc_id"] for r in out] == [0]

    def rnd6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    data = text.encode()
    hi = [0] * 16
    for b in data:
        hi[b // 16] += 1
    hi = [rnd6(c / len(data)) for c in hi]
    toks = [t for t in "".join(ch if ch.isalnum() else " " for ch in text.lower()).split() if t]
    ht = [0] * 16
    for t in toks:
        ht[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 16] += 1
    ht = [rnd6(c / len(toks)) for c in ht]
    wi, wt = clip_head_weights("img"), clip_head_weights("txt")
    zi = [sum(wi[j][i] * hi[i] for i in range(16)) for j in range(8)]
    zt = [sum(wt[j][i] * ht[i] for i in range(16)) for j in range(8)]
    ni = math.sqrt(sum(v * v for v in zi))
    nt = math.sqrt(sum(v * v for v in zt))
    dot = sum(a * b for a, b in zip(zi, zt))
    assert out[0]["agreement"] == rnd6(dot / (ni * nt))


def test_clip_agreement_bounds_and_keep_flag(spark):
    from flink_kmeans_clustering_spark.operators.multimodal import (
        CLIP_TAU,
        clip_agreement_filter,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = clip_agreement_filter(docs).collect()
    assert out, "image slice must be non-empty"
    for r in out:
        assert r["doc_id"] % 3 == 0
        if r["agreement"] is not None:
            assert -1.0 - 1e-9 <= r["agreement"] <= 1.0 + 1e-9
            assert r["keep"] == (r["agreement"] >= CLIP_TAU)
        else:
            assert r["keep"] is False
    ids = [r["doc_id"] for r in out]
    assert ids == sorted(ids)


def test_clip_agreement_degenerate_towers_are_null_not_kept(spark):
    """No alphanumeric tokens → zero text tower; empty text → zero
    image tower.  Both must yield NULL agreement and keep=false, not a
    spurious cosine."""
    from flink_kmeans_clustering_spark.operators.multimodal import (
        clip_agreement_filter,
    )

    out = {
        r["doc_id"]: r
        for r in clip_agreement_filter(
            _docs(spark, [(0, "!!! ??? ..."), (3, ""), (6, "normal words here")])
        ).collect()
    }
    assert out[0]["agreement"] is None and out[0]["keep"] is False
    assert out[3]["agreement"] is None and out[3]["keep"] is False
    assert out[6]["agreement"] is not None


# --- snapshot_delta_dedup -----------------------------------------------------


def _snapshot_parity(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:2], 16) % 2


def _ids_by_parity(n=200):
    old = [i for i in range(n) if _snapshot_parity(i) == 0]
    new = [i for i in range(n) if _snapshot_parity(i) == 1]
    return old, new


def test_delta_exact_recrawl_dedups_fully(spark):
    """A NEW doc that is byte-identical to an OLD doc re-chunks to the
    exact same digests, so every one of its bytes is already stored:
    dedup_ratio == 1."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        snapshot_delta_dedup,
    )

    old_ids, new_ids = _ids_by_parity()
    text = "the contents of a page that did not change between crawls " * 4
    docs = spark.createDataFrame(
        [
            (old_ids[0], text, "en", "web", len(text)),
            (new_ids[0], text, "en", "web", len(text)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = snapshot_delta_dedup(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["source"] == "web"
    assert r["n_new_docs"] == 1
    assert r["new_bytes"] == len(text)
    assert r["dup_bytes"] == len(text)  # chunks tile the text exactly
    assert r["dedup_ratio"] == 1.0


def test_delta_prefix_insertion_still_mostly_dedups(spark):
    """Content-defined cuts re-align after a prefix edit: an insertion
    at the head must NOT cascade — the bulk of the doc's bytes still
    match old-snapshot chunks (a fixed-offset chunker would drop to
    ~0)."""
    from flink_kmeans_clustering_spark.operators.dedup import (
        snapshot_delta_dedup,
    )

    old_ids, new_ids = _ids_by_parity()
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
    ) * 6
    edited = "BREAKING UPDATE: " + base
    docs = spark.createDataFrame(
        [
            (old_ids[0], base, "en", "web", len(base)),
            (new_ids[0], edited, "en", "web", len(edited)),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    r = snapshot_delta_dedup(docs).collect()[0]
    assert r["dup_bytes"] > 0.7 * r["new_bytes"], (
        r["dup_bytes"],
        r["new_bytes"],
    )


def test_delta_bounds_and_empty_inputs(spark):
    from flink_kmeans_clustering_spark.operators.dedup import (
        snapshot_delta_dedup,
    )

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    assert snapshot_delta_dedup(spark.createDataFrame([], schema)).count() == 0
    # all-OLD corpus: no new docs, so no rows at all
    old_ids, _ = _ids_by_parity()
    all_old = spark.createDataFrame(
        [(old_ids[i], "some text here", "en", "w", 14) for i in range(3)], schema
    )
    assert snapshot_delta_dedup(all_old).count() == 0
    # real corpus: per-group invariants
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for r in snapshot_delta_dedup(docs).collect():
        assert 0 <= r["dup_bytes"] <= r["new_bytes"]
        assert 0.0 <= r["dedup_ratio"] <= 1.0
        assert r["n_new_docs"] > 0
