"""Property-based invariants (hypothesis) for the round-11 operators —
each checked against a brute-force Python model over arbitrary small
inputs, not hand-picked fixtures."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# BPE merge learning vs a pure-Python reference trainer
# ---------------------------------------------------------------------------


def _py_bpe(texts: list[str], rounds: int):
    """Brute-force reference: tokenize like functions.text.tokenize,
    then the classic greedy leftmost-first BPE trainer on the
    word-frequency table."""
    import re
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if len(w) >= 2:
                vocab[w] += 1
    segs = {w: list(w) for w in vocab}
    merges = []
    for _ in range(rounds):
        pairs: Counter = Counter()
        for w, seg in segs.items():
            for i in range(len(seg) - 1):
                pairs[(seg[i], seg[i + 1])] += vocab[w]
        if not pairs:
            break
        # (freq DESC, pair ASC) — pair compares as the joined string
        # "x y" exactly like the engine's concat key
        best = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (x, y), freq = best
        merges.append((x, y, x + y, freq))
        for w, seg in segs.items():
            out: list = []
            i = 0
            while i < len(seg):
                if i + 1 < len(seg) and seg[i] == x and seg[i + 1] == y:
                    out.append(x + y)
                    i += 2
                else:
                    out.append(seg[i])
                    i += 1
            segs[w] = out
    return merges


words_strategy = st.lists(
    st.text(alphabet="ab1", min_size=1, max_size=6),
    min_size=1,
    max_size=12,
)


@SLOW
@given(words_strategy, st.integers(1, 4))
def test_bpe_learn_merges_matches_python_reference(spark, words, rounds):
    """The distributed trainer's merge table equals the brute-force
    greedy trainer's on arbitrary tiny corpora — same argmax, same
    tie-break, same leftmost-first re-segmentation, same early stop.
    A 3-char alphabet forces heavy ties, exercising the (freq DESC,
    pair ASC) ordering hard."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        bpe_learn_merges,
    )

    texts = [" ".join(words)]
    docs = spark.createDataFrame(
        [(1, texts[0])], "doc_id long, text string"
    )
    got = [
        (r["lhs"], r["rhs"], r["merged"], r["freq"])
        for r in bpe_learn_merges(docs, rounds=rounds)
        .orderBy("merge_round")
        .collect()
    ]
    assert got == _py_bpe(texts, rounds)


# ---------------------------------------------------------------------------
# Trained quality classifier vs a pure-Python gradient replay
# ---------------------------------------------------------------------------


def _r(x: float, digits: int) -> float:
    # half-AWAY-FROM-ZERO — the tie direction of Spark round(double,d)
    # (BigDecimal HALF_UP), DuckDB round(), and the engine's
    # round_half_away (ADVICE r11).  The old floor(x·s + 0.5) form
    # rounded negative ties toward +inf, and hypothesis DID find a
    # negative 12-dp tie on adversarial inputs — kept independent of
    # the operator code on purpose (this is the reference model).
    s = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * s + 0.5), x) / s


def _py_quality_train(rows, lr, rounds):
    """Replays quality_classifier_train's exact arithmetic: the same
    feature doubles, per-doc 12-dp-rounded gradient terms summed
    exactly (Fraction-free: scaled-integer decimal sum), 12-dp weight
    rounding."""
    import re
    from decimal import Decimal

    from flink_kmeans_clustering_spark.operators.textstats import (
        ENGLISH_STOPWORDS as STOP,
    )

    feats = []
    for _doc_id, text, lang in rows:
        text = text or ""
        toks = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
        n_words = len(toks)
        stop_hits = sum(1 for t in toks if t in STOP)
        n_punct = len(re.findall(r"[^a-zA-Z0-9\s]", text))
        n_digit = len(re.findall(r"[0-9]", text))
        n_upper = len(re.findall(r"[A-Z]", text))
        tok_chars = sum(len(t) for t in toks)
        n_chars = len(text)
        x = [
            1.0,
            stop_hits / n_words if n_words > 0 else 0.0,
            min(n_words / 500.0, 1.0),
            n_punct / n_chars if n_chars > 0 else 0.0,
            n_digit / n_chars if n_chars > 0 else 0.0,
            n_upper / n_chars if n_chars > 0 else 0.0,
            (tok_chars / n_words if n_words > 0 else 0.0) / 10.0,
        ]
        feats.append((x, 1 if lang == "en" else 0))
    if not feats:
        return None
    k = 7
    w = [0.0] * k
    n = len(feats)
    for _ in range(rounds):
        g = []
        for j in range(k):
            acc = Decimal(0)
            for x, y in feats:
                z = 0.0
                for kk in range(k):
                    z = z + w[kk] * x[kk]
                p = 1.0 / (1.0 + math.exp(-z))
                acc += Decimal(repr(_r(x[j] * (p - y), 12)))
            g.append(float(acc))
        w = [_r(w[j] - lr * g[j] / n, 12) for j in range(k)]
    correct = 0
    for x, y in feats:
        z = 0.0
        for kk in range(k):
            z = z + w[kk] * x[kk]
        p = 1.0 / (1.0 + math.exp(-z))
        correct += int((_r(p, 6) >= 0.5) == (y == 1))
    return w, n, _r(correct / n, 6)


doc_strategy = st.lists(
    st.tuples(
        st.text(
            alphabet="the and ofZ9.!x ",
            min_size=0,
            max_size=40,
        ),
        st.sampled_from(["en", "xx"]),
    ),
    min_size=1,
    max_size=8,
)


@SLOW
@given(doc_strategy, st.integers(1, 3))
def test_quality_train_matches_python_replay(spark, docs_in, rounds):
    """Weights, doc count, and train accuracy equal a pure-Python
    replay of the identical fixed-point arithmetic on arbitrary small
    corpora (mixed stopwords/punctuation/digits/uppercase, empty
    texts included)."""
    from flink_kmeans_clustering_spark.operators.textstats import (
        QUALITY_TRAIN_FEATURES,
        quality_classifier_train,
    )

    rows = [(i, t, lang) for i, (t, lang) in enumerate(docs_in)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = quality_classifier_train(df, lr=0.5, rounds=rounds).collect()
    exp = _py_quality_train(rows, 0.5, rounds)
    got_w = {r["feature"]: r["weight"] for r in out}
    exp_w, exp_n, exp_acc = exp
    assert [got_w[f] for f in QUALITY_TRAIN_FEATURES] == exp_w
    assert all(r["n_docs"] == exp_n for r in out)
    assert all(r["train_acc"] == exp_acc for r in out)
