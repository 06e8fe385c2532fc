"""Property-based invariants (hypothesis) for the round-8 operators —
brute-force Python models over arbitrary small inputs, not hand-picked
fixtures.  The PNG properties run codec-only (no Spark session), so
they afford many more examples."""

from __future__ import annotations

import hashlib

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
FAST = settings(max_examples=100, deadline=None)


# --- PNG codec (pure Python, no Spark) --------------------------------------


@FAST
@given(st.binary(min_size=0, max_size=2048), st.sampled_from([8, 16, 32]))
def test_png_roundtrip_any_bytes(payload, width):
    """encode(px) then strict-decode yields exactly the padded pixel
    array's segment means, for ANY byte content and scanline width —
    all five filter types participate whenever height ≥ 5."""
    from flink_kmeans_clustering_spark.operators.multimodal import (
        _png_encode,
        png_decoder,
    )

    b = np.frombuffer(payload, dtype=np.uint8)
    h = max(1, -(-b.size // width))
    px = np.zeros(h * width, dtype=np.uint8)
    px[: b.size] = b
    feat = png_decoder(16)(_png_encode(px, width))
    n = px.size
    seg = (np.arange(n) * 16) // n
    sums = np.bincount(seg, weights=px.astype(float), minlength=16)
    cnts = np.bincount(seg, minlength=16)
    exp = sums / (np.maximum(cnts, 1) * 256.0)
    exp = (np.floor(exp * 1e6 + 0.5) / 1e6).astype(np.float32)
    assert np.array_equal(feat, exp)


@FAST
@given(st.binary(min_size=200, max_size=1200), st.integers(0, 199))
def test_png_single_byte_corruption_never_silently_wrong(payload, flip_at):
    """Flipping any byte inside the chunked region either leaves the
    blob undecodable (raises) or — never — changes the features while
    still decoding.  (CRC covers type+data of every chunk; the 8-byte
    signature and chunk-length fields fail structurally.)"""
    from flink_kmeans_clustering_spark.operators.multimodal import (
        _png_encode,
        png_decoder,
    )

    b = np.frombuffer(payload, dtype=np.uint8)
    h = max(1, -(-b.size // 32))
    px = np.zeros(h * 32, dtype=np.uint8)
    px[: b.size] = b
    blob = _png_encode(px, 32)
    truth = png_decoder(16)(blob)
    pos = 8 + (flip_at % (len(blob) - 8))  # anywhere past the signature
    bad = bytearray(blob)
    bad[pos] ^= 0xFF
    try:
        got = png_decoder(16)(bytes(bad))
    except Exception:
        return  # rejected — the desired outcome for corruption
    # decoding succeeded: only acceptable if the flip landed in a
    # CRC-covered region yet produced identical output (impossible for
    # the data bytes, as CRC would have caught it) — i.e. never.
    raise AssertionError(
        f"corrupt blob decoded silently at offset {pos}: "
        f"{got[:4]} vs {truth[:4]}"
    )


# --- Bloom prefilter: no false negatives, ever ------------------------------


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 9),  # doc id seed
            st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6),
        ),
        min_size=2,
        max_size=10,
    )
)
def test_bloom_never_false_negative(spark, raw):
    """For arbitrary tiny corpora and a deliberately tiny filter
    (collisions guaranteed), every exactly-shared shingle bloom-hits:
    bloom_hits >= exact_hits per group, and with m large the two
    converge from above."""
    from flink_kmeans_clustering_spark.operators.dedup import bloom_prefilter

    docs = [
        (i, " ".join(words), "s" + str(i % 2))
        for i, (seed, words) in enumerate(raw)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    bench = df.filter("doc_id % 3 = 0")
    probe = df.filter("doc_id % 3 != 0")
    if probe.count() == 0 or bench.count() == 0:
        return
    for m in (16, 1 << 16):
        for r in bloom_prefilter(probe, bench, n=1, m=m).collect():
            assert r["bloom_hits"] >= r["exact_hits"], (m, r)
            assert r["false_pos"] >= 0


# --- Cross-source overlap vs brute force ------------------------------------


@SLOW
@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 4)),
        min_size=1,
        max_size=16,
    )
)
def test_cross_source_overlap_matches_brute_force(spark, raw):
    from flink_kmeans_clustering_spark.operators.dedup import (
        cross_source_overlap,
    )

    docs = [(i, f"text {t}", src) for i, (src, t) in enumerate(raw)]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): (r["n_a"], r["n_b"], r["n_shared"])
        for r in cross_source_overlap(df).collect()
    }
    sets: dict[str, set[str]] = {}
    for _i, (src, t) in enumerate(raw):
        sets.setdefault(src, set()).add(
            hashlib.md5(f"text {t}".encode()).hexdigest()
        )
    srcs = sorted(sets)
    expected = {
        (x, y): (len(sets[x]), len(sets[y]), len(sets[x] & sets[y]))
        for i, x in enumerate(srcs)
        for y in srcs[i + 1 :]
    }
    assert got == expected
